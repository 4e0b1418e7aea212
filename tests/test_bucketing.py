"""Bucketed-table co-located joins: the pay-the-shuffle-once-at-ingest
pattern for repeated fact-fact joins at scale. The assertion that matters
is plan-level — NO Exchange on either side of the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.sources.io import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select(F.col("l_orderkey").alias("okey"), "l_quantity"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select(F.col("o_orderkey").alias("okey"), "o_totalprice"))
    write_bucketed(li, "bdb.li_b", "okey", n_buckets=8, sort_col="okey")
    write_bucketed(orders, "bdb.ord_b", "okey", n_buckets=8, sort_col="okey")
    yield "bdb.li_b", "bdb.ord_b"
    spark.sql("DROP TABLE IF EXISTS bdb.li_b")
    spark.sql("DROP TABLE IF EXISTS bdb.ord_b")
    spark.sql("DROP DATABASE IF EXISTS bdb")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the test exercises the bucketed (SMJ) path the
    # way a real fact-fact join would — neither side fits in memory at scale
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, left, right, "okey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan          # both sides co-partitioned
        assert "SortMergeJoin" in plan
        # sortBy at write time also removes the per-task Sort before SMJ
        n = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    expected = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                .join(spark.read.parquet(f"{sf_dir}/orders.parquet"),
                      F.col("l_orderkey") == F.col("o_orderkey")).count())
    assert n == expected


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    left, _right = bucketed_tables
    agg = (spark.table(left).groupBy("okey")
           .agg(F.sum("l_quantity").alias("q")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key == bucket key: no shuffle
    assert agg.count() > 0
