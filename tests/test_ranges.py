from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.ranges import interval_join


def _fixtures(spark):
    points = spark.createDataFrame(
        [Row(pid=i, v=float(v)) for i, v in
         enumerate([0.0, 5.0, 10.0, 24.9, 25.0, 59.9, 200.0])])
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 25.0), ("c", 20.0, 60.0)],
        "name string, lo double, hi double")
    return points, intervals


def test_interval_join_matches_naive(spark):
    points, intervals = _fixtures(spark)
    bucketed = {(r.pid, r.name) for r in
                interval_join(points, intervals, "v", "lo", "hi",
                              bucket_width=15.0).collect()}
    naive = {(r.pid, r.name) for r in
             points.crossJoin(intervals)
             .filter((F.col("v") >= F.col("lo"))
                     & (F.col("v") <= F.col("hi"))).collect()}
    assert bucketed == naive
    assert ("2", "a") not in bucketed  # sanity: pid type is int


def test_interval_join_boundaries_inclusive(spark):
    points, intervals = _fixtures(spark)
    out = interval_join(points, intervals, "v", "lo", "hi", bucket_width=10.0)
    got = {(r.pid, r.name) for r in out.collect()}
    assert (2, "a") in got and (2, "b") in got   # v=10 hits both edges
    assert (6, "a") not in got                    # out of all ranges
    assert not any(pid == 6 for pid, _ in got)


def test_interval_join_bucket_width_invariance(spark):
    points, intervals = _fixtures(spark)
    results = []
    for w in (5.0, 25.0, 100.0):
        out = interval_join(points, intervals, "v", "lo", "hi",
                            bucket_width=w)
        results.append(sorted((r.pid, r.name) for r in out.collect()))
    assert results[0] == results[1] == results[2]


def test_interval_join_domain_clamp_open_ended(spark):
    points = spark.createDataFrame(
        [Row(pid=0, v=5.0), Row(pid=1, v=95.0)])
    intervals = spark.createDataFrame(
        [("all", 0.0, 1e12)], "name string, lo double, hi double")
    # without the clamp this would try to explode 1e12/10 bucket rows
    out = interval_join(points, intervals, "v", "lo", "hi",
                        bucket_width=10.0, domain=(0.0, 100.0))
    assert {r.pid for r in out.collect()} == {0, 1}


def test_rollup_merge_equals_from_scratch_any_split_order(spark, sf_dir):
    from dotnetvectorsearch_spark.operators.rollup import (
        merge_rollups, rollup_batch, rollup_read)
    from dotnetvectorsearch_spark.sources.io import load_table
    from pyspark.sql import functions as F
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate"))
    keys = ["yr", "o_orderstatus"]
    full = rollup_read(rollup_batch(orders, keys, "o_totalprice"))
    parts = [orders.filter(F.col("o_orderkey") % 3 == i)
             for i in range(3)]
    rollups = [rollup_batch(p, keys, "o_totalprice") for p in parts]
    for order in ([0, 1, 2], [2, 0, 1]):
        merged = rollup_read(merge_rollups(*[rollups[i] for i in order]))
        a = sorted(map(tuple, full.collect()))
        b = sorted(map(tuple, merged.collect()))
        assert a == b
    # pairwise associativity: (a+b)+c
    ab = merge_rollups(rollups[0], rollups[1])
    abc = rollup_read(merge_rollups(ab, rollups[2]))
    assert sorted(map(tuple, abc.collect())) \
        == sorted(map(tuple, full.collect()))
    import pytest
    with pytest.raises(ValueError):
        merge_rollups()
