"""Measured plain-vs-bucketed layout comparison for the
incremental-ingest capstone (VERDICT r11 #3).

`incremental_corpus_update` against unbucketed snapshots pays id-keyed
exchanges for the CDC full-outer join every run; on doc_id-bucketed
snapshot layouts the CDC stage plans with ZERO Exchange (pinned in
tests/test_bucketing.py::test_incremental_manifest_bucketed_snapshots)
— this tool puts a NUMBER next to the plan pin at the sf1 tier
(50k-doc snapshots), same protocol as the corpus_diff bucketed
measurement in SCALING_SF1_ORACLE.md: one warm-up run to populate the
decontamination-index memo + JIT (shared by both layouts — the eval
index is layout-independent), then alternating reps, best-of reported,
plus the one-time bucketed-write ingest cost the layout amortizes.

Run:  python tools/bench_bucketed_manifest.py
Prints one JSON line; folded into PERF_R12.md by hand.
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

import pyspark.sql.functions as F

from dotnetvectorsearch_spark.caching import release_transient
from dotnetvectorsearch_spark.operators.dedup import (
    incremental_update_manifest)
from dotnetvectorsearch_spark.session import get_spark
from dotnetvectorsearch_spark.sources.io import write_bucketed

SF_DIR = str(ROOT / ".scaletier" / "sf1")
N_BUCKETS = 32
REPS = 3


def _snapshots(docs):
    old = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    new = (docs.filter(F.col("doc_id") % 5 != 0)
           .withColumn(
               "text",
               F.when(F.col("doc_id") % 11 == 0,
                      F.concat(F.col("text"), F.lit(" edited v2")))
               .otherwise(F.col("text")))
           .select("doc_id", "text"))
    return old, new


def _time_manifest(old, new, eval_docs):
    t0 = time.perf_counter()
    n = incremental_update_manifest(old, new, eval_docs,
                                    shingle_n=3,
                                    min_overlap=0.2).count()
    dt = time.perf_counter() - t0
    release_transient()
    return round(dt, 3), n


def main() -> int:
    spark = get_spark("bench-bucketed-manifest")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    eval_docs = docs.filter(src_num % 2 == 1)
    old, new = _snapshots(docs)

    wh = Path(tempfile.mkdtemp(prefix="bmanifest_"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bmf LOCATION '{wh}/bmf'")
    try:
        t0 = time.perf_counter()
        write_bucketed(old, "bmf.snap_old", "doc_id",
                       n_buckets=N_BUCKETS, sort_col="doc_id")
        write_bucketed(new, "bmf.snap_new", "doc_id",
                       n_buckets=N_BUCKETS, sort_col="doc_id")
        write_cost = round(time.perf_counter() - t0, 3)
        b_old = spark.table("bmf.snap_old")
        b_new = spark.table("bmf.snap_new")

        # warm-up: populates the (layout-independent) decon-index memo
        # and JIT so neither layout pays it inside a timed rep
        _time_manifest(old, new, eval_docs)
        plain, bucketed = [], []
        rows = 0
        for _ in range(REPS):
            dt, rows = _time_manifest(old, new, eval_docs)
            plain.append(dt)
            dt, rows_b = _time_manifest(b_old, b_new, eval_docs)
            bucketed.append(dt)
            assert rows_b == rows, (rows_b, rows)
        out = {"query": "incremental_corpus_update", "tier": "sf1",
               "rows": rows, "n_buckets": N_BUCKETS, "reps": REPS,
               "plain_sec": plain, "bucketed_sec": bucketed,
               "plain_best": min(plain), "bucketed_best": min(bucketed),
               "bucketed_write_once_sec": write_cost,
               "speedup_best": round(min(plain) / min(bucketed), 2)}
        print(json.dumps(out), flush=True)
        return 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bmf.snap_old")
        spark.sql("DROP TABLE IF EXISTS bmf.snap_new")
        spark.sql("DROP DATABASE IF EXISTS bmf")
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
