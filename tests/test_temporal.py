from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.temporal import (
    asof_join,
    prior_event_attribution,
)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c"), (3, 7, "d")],
        "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 6, 300.0)],
        "k long, rt long, rv double")
    out = {r.lv: (r.rt_asof, r.rv_asof)
           for r in asof_join(left, right, "k", "t", "rt").collect()}
    assert out["a"] == (10, 100.0)    # tie: right at same ts visible
    assert out["b"] == (20, 200.0)    # latest prior
    assert out["c"] == (None, None)   # right only after left
    assert out["d"] == (None, None)   # key has no right rows


def test_asof_join_multiple_right_same_key(spark):
    left = spark.createDataFrame([(1, 100, "x")], "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 50, 2.0), (1, 99, 3.0), (1, 101, 4.0)],
        "k long, rt long, rv double")
    row = asof_join(left, right, "k", "t", "rt").collect()[0]
    assert (row.rt_asof, row.rv_asof) == (99, 3.0)


def test_prior_event_attribution(spark):
    ev = spark.createDataFrame(
        [(1, 1, 10, "click"), (2, 1, 20, "purchase"), (3, 1, 30, "purchase"),
         (4, 2, 5, "purchase"), (5, 2, 6, "click")],
        "event_id long, user_id long, sec long, event_type string")
    out = prior_event_attribution(ev, "user_id", "sec",
                                  out_prefix="last_click")
    got = {r.event_id: r.last_click_ts for r in out.collect()}
    assert got == {2: 10, 3: 10, 4: None}


def test_prior_event_attribution_tie_inclusive(spark):
    ev = spark.createDataFrame(
        [(1, 1, 10, "click"), (2, 1, 10, "purchase")],
        "event_id long, user_id long, sec long, event_type string")
    out = prior_event_attribution(ev, "user_id", "sec",
                                  out_prefix="last_click")
    assert out.collect()[0].last_click_ts == 10
