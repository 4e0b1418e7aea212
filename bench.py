"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count-consumed) after a warm-up of
the input caches, timing the full plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from dotnetvectorsearch_spark.session import get_spark

BENCH_QUERIES = [
    "search_topk",
    "search_threshold",
    "vector_norms",
    "token_stats",
    "quality_scores",
    "lang_id",
    "fingerprint_dedup",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "top_orders_window",
    "events_hourly",
    "sessionize",
    "jaccard_pairs",
    "minhash_pairs",
    "embedding_neardup",
    "ann_ivf_topk",
    "topk_batch",
    "rollup_revenue",
    "asof_click_purchase",
    "winnow_fingerprints",
    "media_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in qs]

    # JVM/codegen warm-up on a cheap query (excluded from timing)
    qs["doc_count"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
