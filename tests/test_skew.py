from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_frames(spark):
    # key 1 is the heavy hitter (100 rows); keys 2-4 have one row each
    big = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(100)]
        + [Row(k=j, v=j) for j in (2, 3, 4)])
    dim = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="a"), Row(k=5, name="unused")])
    return big, dim


def test_salted_inner_matches_plain_join(spark, skewed_frames):
    big, dim = skewed_frames
    plain = sorted((r.k, r.v, r.name) for r in
                   big.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.name) for r in
                    salted_join(big, dim, "k", salt_buckets=4).collect())
    assert salted == plain
    assert len(salted) == 101          # 100 hot matches + key 2


def test_salted_left_keeps_unmatched(spark, skewed_frames):
    big, dim = skewed_frames
    out = salted_join(big, dim, "k", salt_buckets=4, how="left")
    assert out.count() == big.count()
    unmatched = out.filter(F.col("name").isNull()).select("k").distinct()
    assert {r.k for r in unmatched.collect()} == {3, 4}


def test_salt_spreads_hot_key(spark, skewed_frames):
    big, _ = skewed_frames
    salted = big.withColumn(
        "__salt", F.floor(F.rand(42) * 4).cast("int"))
    n_salts = (salted.filter(F.col("k") == 1)
               .select("__salt").distinct().count())
    assert n_salts > 1                 # hot key really spreads


def test_rejects_unsupported_how(spark, skewed_frames):
    big, dim = skewed_frames
    with pytest.raises(ValueError):
        salted_join(big, dim, "k", how="full")


def test_key_skew_stats_shares_and_ratio_exact(spark):
    from dotnetvectorsearch_spark.operators.skew import key_skew_stats
    rows = [(k,) for k in
            ["hot"] * 6 + ["warm"] * 3 + ["a"] * 1 + ["b"] * 2]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_stats(df, "k", top_n=3).collect()
    assert [(r.key, r.n) for r in out] == [("hot", 6), ("warm", 3),
                                           ("b", 2)]
    assert out[0].share == 0.5                       # 6/12
    assert out[0].max_over_mean == 2.0               # 6 / (12/4)
    assert all(r.max_over_mean == 2.0 for r in out)  # global figure
