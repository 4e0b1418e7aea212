"""DuckDB twin of bench.py: times the oracle SQL of every benched query
that has one, on the same parquet files, same machine. This produces the
"measured baseline" side of BASELINE.md — the reference publishes no
numbers, so the 2x gate is anchored to DuckDB running identical semantics.

Run:  python tools/bench_duckdb.py [sf_dir]      (default /root/testdata/sf0.1)
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES
from dotnetvectorsearch_spark.sources.io import TPCH_TABLES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").split("sf")[-1]
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = entrymod.oracle_sql()
    names = [n for n in BENCH_QUERIES if n in oracles]
    skipped = [n for n in BENCH_QUERIES if n not in oracles]

    for name in names:                      # warm-up: OS page cache + plans
        con.sql(oracles[name]).fetchall()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            con.sql(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "duckdb_oracle_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "skipped_no_oracle": skipped,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
