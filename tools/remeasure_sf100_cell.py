"""Standalone quiet-host re-measure of ONE sf100 spot-decade cell
(VERDICT r11 #1): `curated_corpus_fixed_eval`, whose committed sf100
ratio (14.9x/decade) was noise-bounded by inference from its strict
superset `training_shards_fixed_eval` (11.6x measured in the same
run) rather than measured directly.

Protocol matches tools/bench_scaling.py --sf100 exactly (compile
warm-up at sf0.001, cold+warm rep per tier, best = min, transient
release between reps) but runs ONLY this query, standalone, so no
preceding 75 GB semdedup spill or DuckDB DNF can poison the cell.
Adds a third rep for a tighter best. Prints one JSON line; the result
is folded into SCALING.md / SCALING.json by hand (annotated as the
standalone re-measure).

Run:  python tools/remeasure_sf100_cell.py [query_name]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import __spark_entry__ as entrymod  # noqa: E402
from dotnetvectorsearch_spark.caching import release_transient
from dotnetvectorsearch_spark.session import get_spark

from bench_scaling import SF100_TIERS  # noqa: E402  (sibling tool)

QUERIES = entrymod.queries()


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 \
        else "curated_corpus_fixed_eval"
    fn = QUERIES[name]
    spark = get_spark("remeasure-sf100-cell")
    spark.sparkContext.setLogLevel("ERROR")
    fn(spark, "/root/testdata/sf0.001").count()   # compile warm-up
    release_transient()
    out: dict[str, dict] = {"query": name, "reps": 3,
                            "mode": "standalone"}
    for tier, path, _mult in SF100_TIERS:
        reps = []
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, path).count()
            reps.append(round(time.perf_counter() - t0, 3))
            release_transient()
        out[tier] = {"cold": reps[0], "warm": reps[1],
                     "best": min(reps), "all": reps, "rows": rows}
    t10, t100 = out["sf10"]["best"], out["sf100"]["best"]
    out["ratio_sf100_over_sf10"] = round(t100 / t10, 2)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
