"""Within-session A/B for the _spread partition target on the CPU-heavy
shingle/self-join family (VERDICT r13 item 1).

Interleaves, in ONE Spark session, each affected bench query under:
  A = stock _spread (bytes-derived target, r13 shipped form)
  B = target forced to defaultParallelism (the r12 behavior the
      regressed family wants back)
best-of-N wall times with the bench's own action (.count()) and
release_transient() between runs. Usage:

  python tools/ab_spread.py [reps] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from dotnetvectorsearch_spark.caching import release_transient
from dotnetvectorsearch_spark.session import get_spark

QUERIES = [
    "jaccard_pairs",
    "dedup_clusters",
    "winnow_fingerprints",
    "winnow_fingerprints_md5",
    "leakage_safe_splits",
    "embedding_neardup",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-spread")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    import dotnetvectorsearch_spark.operators.dedup as dd
    stock = dd._spread

    def forced(df, key, amp=1):
        tgt = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < tgt:
            return df.repartition(tgt, key)
        return df

    # Warm up plans + caches once per query at the smallest SF.
    for n in names:
        qs[n](spark, "/root/testdata/sf0.001").count()
        release_transient()

    results = {}
    for n in names:
        times = {"A": [], "B": []}
        for _ in range(reps):
            for label, fn in (("A", stock), ("B", forced)):
                dd._spread = fn
                spark.sparkContext.setJobDescription(f"{n} [{label}]")
                t0 = time.perf_counter()
                qs[n](spark, sf_dir).count()
                times[label].append(time.perf_counter() - t0)
                release_transient()
        dd._spread = stock
        a, b = min(times["A"]), min(times["B"])
        results[n] = (a, b)
        print(f"{n:28s}  stock={a:.3f}s  forced32={b:.3f}s  "
              f"speedup={a / b:.2f}x  (all A={['%.2f' % t for t in times['A']]}"
              f" B={['%.2f' % t for t in times['B']]})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
