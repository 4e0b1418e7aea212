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


def test_funnel_steps_strict_order_and_gap(spark):
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.operators.temporal import funnel_steps
    E = lambda u, t, s: Row(user_id=u, ts=t * 1_000_000_000,  # noqa: E731
                            event_type=s)
    rows = [
        # u1 converts fully in order
        E(1, 100, "view"), E(1, 200, "click"), E(1, 300, "purchase"),
        # u2: click BEFORE view -> stops at view
        E(2, 100, "click"), E(2, 200, "view"), E(2, 50, "purchase"),
        # u3: view+click, purchase before click -> stops at click
        E(3, 10, "view"), E(3, 20, "click"), E(3, 15, "purchase"),
        # u4: never views
        E(4, 5, "click"), E(4, 6, "purchase"),
        # u5: full order but purchase outside the 100s gap
        E(5, 0, "view"), E(5, 50, "click"), E(5, 500, "purchase"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.event_type: r for r in
           funnel_steps(df, ["view", "click", "purchase"],
                        max_step_gap_sec=100).collect()}
    assert out["view"].users == 4          # u1 u2 u3 u5
    assert out["click"].users == 3         # u1 u3 u5
    assert out["purchase"].users == 1      # u1 only
    assert out["view"].conv_from_prev == 1.0
    assert out["click"].conv_from_first == 0.75
    assert abs(out["purchase"].conv_from_prev - 0.333333) < 1e-6
    import pytest
    with pytest.raises(ValueError):
        funnel_steps(df, ["view"])


def test_funnel_steps_no_gap_only_requires_order(spark):
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.operators.temporal import funnel_steps
    df = spark.createDataFrame([
        Row(user_id=1, ts=1_000_000_000, event_type="view"),
        Row(user_id=1, ts=999_999_000_000_000_000, event_type="click"),
    ])
    out = {r.event_type: r.users
           for r in funnel_steps(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_debounce_anchor_semantics_exact(spark):
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.operators.temporal import (
        debounce_events)
    S = 1_000_000_000  # ns per... (bigint ns input path)
    rows = [Row(user_id=1, event_id=i, ts=t * S)
            for i, t in enumerate([0, 3, 6, 9])]          # burst
    rows += [Row(user_id=2, event_id=10, ts=0),
             Row(user_id=2, event_id=11, ts=20 * S)]      # far apart
    df = spark.createDataFrame(rows)
    out = debounce_events(df, ["user_id"], "ts", min_gap_sec=5,
                          tiebreak_col="event_id")
    got = sorted((r.user_id, r.event_id) for r in out.collect())
    # anchor semantics: u1 keeps t=0 then t=6 (6-0 >= 5); 3 and 9 drop.
    # A lag()-based debounce would keep ONLY t=0 for u1 (every seen-gap
    # is 3 < 5) — the contract counterexample.
    assert got == [(1, 0), (1, 2), (2, 10), (2, 11)]


def test_debounce_deterministic_ties_and_zero_gap(spark):
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.operators.temporal import (
        debounce_events)
    df = spark.createDataFrame([
        Row(user_id=1, event_id=5, ts=1_000_000_000),
        Row(user_id=1, event_id=3, ts=1_000_000_000),   # same ts
    ])
    out = debounce_events(df, ["user_id"], "ts", min_gap_sec=5,
                          tiebreak_col="event_id").collect()
    assert [(r.event_id) for r in out] == [3]           # lowest id wins
    all_kept = debounce_events(df, ["user_id"], "ts", min_gap_sec=0,
                               tiebreak_col="event_id").count()
    assert all_kept == 2                                # gap 0 keeps all


def test_keyed_trends_match_numpy_least_squares(spark):
    import numpy as np
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.operators.temporal import keyed_trends
    base = 1_704_067_200
    rows = []
    series = {
        1: [(0, 1.0), (86400, 3.0), (172800, 5.0)],       # slope 2/day
        2: [(0, 7.5), (43200, 7.5), (86400, 7.5)],        # flat
        3: [(0, 2.0)],                                    # n=1 -> nulls
        4: [(0, 1.0), (10_000, 4.0), (50_000, 2.0), (80_000, 9.0)],
    }
    for uid, pts in series.items():
        for off, v in pts:
            rows.append(Row(user_id=uid,
                            ts=(base + off) * 1_000_000_000, value=v))
    out = {r.user_id: r for r in
           keyed_trends(spark.createDataFrame(rows), "user_id")
           .collect()}
    assert abs(out[1].slope_per_day - 2.0) < 1e-9
    assert abs(out[1].r2 - 1.0) < 1e-9
    assert out[2].slope_per_day == 0.0 and out[2].r2 is None  # vy == 0
    assert out[3].slope_per_day is None and out[3].r2 is None
    x = np.array([p[0] for p in series[4]], dtype=float)
    y = np.array([p[1] for p in series[4]], dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(out[4].slope_per_day - slope * 86400) < 1e-4
    assert abs(out[4].intercept - intercept) < 1e-4


def test_funnel_emits_zero_rows_for_absent_steps(spark):
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.operators.temporal import funnel_steps
    df = spark.createDataFrame([
        Row(user_id=1, ts=1_000_000_000, event_type="view"),
        Row(user_id=2, ts=2_000_000_000, event_type="view"),
    ])
    out = {r.event_type: r for r in
           funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out["view"].users == 2
    assert out["click"].users == 0 and out["purchase"].users == 0
    assert out["click"].conv_from_prev == 0.0
    # purchase's previous step has 0 users -> rate defined as 0, not NaN
    assert out["purchase"].conv_from_prev == 0.0


def test_debounce_empty_and_single_row_frames(spark):
    from dotnetvectorsearch_spark.operators.temporal import (
        debounce_events)
    df = spark.createDataFrame([], "user_id long, event_id long, ts long")
    assert debounce_events(df, ["user_id"], "ts", min_gap_sec=5,
                           tiebreak_col="event_id").count() == 0
    one = spark.createDataFrame([(1, 7, 5_000_000_000)],
                                "user_id long, event_id long, ts long")
    got = debounce_events(one, ["user_id"], "ts", min_gap_sec=5,
                          tiebreak_col="event_id").collect()
    assert [(r.user_id, r.event_id) for r in got] == [(1, 7)]
