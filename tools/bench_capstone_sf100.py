"""sf100 spot-decade cells for the incremental-ingest capstone
(VERDICT r12 #4): extend the two-decade trend to the daily-ingest
pipeline, on BOTH layouts.

Measured cells (3 reps each, best-of; `release_transient` between
reps; compile warm-up at sf0.001 first; protocol matches
tools/bench_scaling.py --sf100 / remeasure_sf100_cell.py):

* `incremental_corpus_update_fixed_eval` — the registry row (plain
  snapshot layout, eval suite pinned at the fixed 500k cap, same as
  the other *_fixed_eval decade twins).
* the SAME fixed-eval manifest on doc_id-BUCKETED snapshot tables —
  the deployment layout whose CDC full-outer join plans with ZERO
  Exchange (tests/test_bucketing.py), so this cell is the "standing
  corpus never shuffled" claim measured at the 5M-doc tier. The
  one-time bucketed-write staging cost is reported separately (it is
  the ingest shuffle the layout amortizes), and rep timings exclude
  it (tables staged before the reps).
* `incremental_corpus_update` (growing synthetic eval) at sf100 —
  run once to RECORD the designed candidate-guard refusal (the same
  `guarded` outcome bench_scaling records for the other growing-eval
  capstones; a 2.5M-doc eval suite is a twin artifact, not a
  deployment shape).

Prints one JSON line; folded into SCALING.md §sf100 by hand with the
protocol noted.

Run:  python tools/bench_capstone_sf100.py        # ~10-20 min
Sweep /tmp/blockmgr-* /tmp/spark-* first (post-DNF noise gotcha).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import pyspark.sql.functions as F

import __spark_entry__ as entrymod  # noqa: E402
from bench_scaling import SF100_TIERS  # noqa: E402  (sibling tool)
from dotnetvectorsearch_spark.caching import release_transient
from dotnetvectorsearch_spark.operators.dedup import (
    incremental_update_manifest)
from dotnetvectorsearch_spark.session import get_spark
from dotnetvectorsearch_spark.sources.io import write_bucketed

REPS = 3
N_BUCKETS = 32
QUERIES = entrymod.queries()


def _snapshots(docs):
    old = (docs.filter(F.col("doc_id") % 7 != 0)
           .select("doc_id", "text"))
    new = (docs.filter(F.col("doc_id") % 5 != 0)
           .withColumn(
               "text",
               F.when(F.col("doc_id") % 11 == 0,
                      F.concat(F.col("text"), F.lit(" edited v2")))
               .otherwise(F.col("text")))
           .select("doc_id", "text"))
    return old, new


def _capped_eval(docs):
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    return docs.filter((src_num % 2 == 1)
                       & (F.col("doc_id")
                          < entrymod._FIXED_EVAL_CAP))


def _time_reps(fn) -> dict:
    reps, rows = [], 0
    for _ in range(REPS):
        t0 = time.perf_counter()
        rows = fn().count()
        reps.append(round(time.perf_counter() - t0, 3))
        release_transient()
    return {"cold": reps[0], "warm": reps[1], "best": min(reps),
            "all": reps, "rows": rows}


def main() -> int:
    spark = get_spark("bench-capstone-sf100")
    spark.sparkContext.setLogLevel("ERROR")
    fixed = QUERIES["incremental_corpus_update_fixed_eval"]
    fixed(spark, "/root/testdata/sf0.001").count()   # compile warm-up
    release_transient()

    out: dict = {"reps": REPS, "n_buckets": N_BUCKETS,
                 "mode": "standalone"}
    wh = Path(tempfile.mkdtemp(prefix="cap100_"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS c100 LOCATION '{wh}/c100'")
    try:
        for tier, path, _mult in SF100_TIERS:
            docs = spark.read.parquet(f"{path}/documents.parquet")
            eval_docs = _capped_eval(docs)
            plain = _time_reps(lambda: fixed(spark, path))

            old, new = _snapshots(docs)
            t0 = time.perf_counter()
            write_bucketed(old, "c100.snap_old", "doc_id",
                           n_buckets=N_BUCKETS, sort_col="doc_id")
            write_bucketed(new, "c100.snap_new", "doc_id",
                           n_buckets=N_BUCKETS, sort_col="doc_id")
            stage_sec = round(time.perf_counter() - t0, 3)
            b_old = spark.table("c100.snap_old")
            b_new = spark.table("c100.snap_new")
            bucketed = _time_reps(
                lambda: incremental_update_manifest(
                    b_old, b_new, eval_docs,
                    shingle_n=3, min_overlap=0.2))
            assert bucketed["rows"] == plain["rows"], \
                (tier, bucketed["rows"], plain["rows"])
            out[tier] = {"plain": plain, "bucketed": bucketed,
                         "bucketed_stage_once_sec": stage_sec,
                         "bucketed_speedup_best": round(
                             plain["best"] / bucketed["best"], 2)}
        for layout in ("plain", "bucketed"):
            t10 = out["sf10"][layout]["best"]
            t100 = out["sf100"][layout]["best"]
            out[f"ratio_sf100_over_sf10_{layout}"] = round(t100 / t10, 2)

        # growing-eval capstone at sf100: record the designed guard
        grow = QUERIES["incremental_corpus_update"]
        sf100_path = SF100_TIERS[-1][1]
        try:
            t0 = time.perf_counter()
            n = grow(spark, sf100_path).count()
            out["growing_eval_sf100"] = {
                "rows": n, "sec": round(time.perf_counter() - t0, 3)}
        except Exception as exc:  # noqa: BLE001
            msg = f"{type(exc).__name__}: {exc}"[:300]
            designed = ("candidate rows" in str(exc)
                        or "too large to broadcast" in str(exc)
                        or type(exc).__name__ == "DeconBudgetExceeded")
            kind = "guarded" if designed else "error"
            out["growing_eval_sf100"] = {kind: msg}
        finally:
            release_transient()
        print(json.dumps(out), flush=True)
        return 0
    finally:
        spark.sql("DROP TABLE IF EXISTS c100.snap_old")
        spark.sql("DROP TABLE IF EXISTS c100.snap_new")
        spark.sql("DROP DATABASE IF EXISTS c100")
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
