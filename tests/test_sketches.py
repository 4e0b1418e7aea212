"""Sketch-aggregation accuracy: the approximate answers must sit within
their documented error bounds of the exact ones (the property the
rows-only driver check can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.sources.io import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r.event_type: r.n for r in
              ev.groupBy("event_type")
              .agg(F.approx_count_distinct("user_id", rsd=0.02)
                   .alias("n")).collect()}
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex <= 0.06  # 3x rsd

def test_approx_percentile_brackets_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.expr("percentile(value, 0.5)").alias("p50")).collect()[0]
    approx = ev.agg(F.percentile_approx("value", 0.5, 10000)
                    .alias("p50")).collect()[0]
    spread = ev.agg((F.max("value") - F.min("value")).alias("s")) \
        .collect()[0].s
    assert abs(approx.p50 - exact.p50) <= 0.01 * spread


def test_sketch_merges_partial(spark, sf_dir):
    """The HLL aggregate must plan a partial_ (map-side) phase — the
    scale property that makes it shuffle sketches, not keys."""
    ev = load_table(spark, sf_dir, "events")
    plan = (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_approx_count_distinct" in plan
