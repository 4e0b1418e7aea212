from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.temporal import (
    asof_join,
    prior_event_attribution,
    rolling_window_features,
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


def test_rolling_window_features_trailing_range(spark):
    # User 1: events at t=0, 100, 3700 with values 1, 2, 4. The trailing
    # 3600s frame at t=3700 contains t=100 and t=3700 but NOT t=0
    # (3700-3600=100 inclusive). User 2 ties at the same timestamp: RANGE
    # peers must both see both rows.
    ev = spark.createDataFrame(
        [(1, 1, 0, 1.0), (2, 1, 100, 2.0), (3, 1, 3700, 4.0),
         (4, 2, 50, 10.0), (5, 2, 50, 20.0)],
        "event_id long, user_id long, sec long, value double")
    out = {r.event_id: (r.n_trailing, r.sum_trailing)
           for r in rolling_window_features(ev, "user_id", "sec",
                                            "value").collect()}
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)
    assert out[3] == (2, 6.0)          # t=0 aged out, t=100 inside
    assert out[4] == (2, 30.0) and out[5] == (2, 30.0)  # tie peers
