"""Dump `.explain("formatted")` for named queries to plans/<dir>/.

Usage: python tools/dump_plans.py <outdir-under-plans> <suffix> name...
e.g.   python tools/dump_plans.py r14 before jaccard_pairs dedup_clusters
writes plans/r14/jaccard_pairs_before.txt etc. Built (not executed) at
the bench SF so the plan matches what the bench runs
($SPARK_GRAFT_SF_DIR, default sf0.1).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from dotnetvectorsearch_spark.session import get_spark


def main() -> None:
    outdir = Path(__file__).resolve().parent.parent / "plans" / sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        (outdir / f"{n}_{suffix}.txt").write_text(plan)
        print(f"wrote {n}_{suffix}.txt ({len(plan.splitlines())} lines)",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
