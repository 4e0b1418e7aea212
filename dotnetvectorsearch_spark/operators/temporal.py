"""Temporal / ordered-sequence operators (beyond-reference; the reference
is request/response only, SURVEY.md §2.5). The shapes a training-data or
event pipeline needs: as-of joins and prior-event attribution, built so the
only shuffle is the hash exchange on the join key.

An as-of join in Spark is NOT a range join (which explodes to O(N*M)
candidates before filtering): both sides are unioned, sorted once per key,
and resolved with a last-non-null window — one shuffle, one sort, linear
scan. This is the standard distributed merge_asof formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` for the same key (backward as-of, inclusive).

    Implementation: tag and union both sides, sort per key by
    (ts, side[right first]), and carry the last non-null right payload
    forward with ``last(..., ignorenulls=True)``. Ties on ts resolve
    right-before-left, and among right rows at the same ts the one latest
    in (ts, tiebreak) order wins — deterministic.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(F.col(right_ts).alias("__ts"),
                       *[F.col(c) for c in right_cols])
    r = right.select(F.col(on), F.col(right_ts).alias("__t"),
                     F.lit(0).alias("__side"), payload.alias("__p"))
    left_payload = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(F.col(on), F.col(left_ts).alias("__t"),
                    F.lit(1).alias("__side"),
                    F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
                    left_payload.alias("__l"))
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    both = r.unionByName(l)
    w = (Window.partitionBy(on).orderBy(F.asc("__t"), F.asc("__side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    resolved = (both.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
                .filter(F.col("__side") == 1))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__ts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return resolved.select(*out_cols)


def rolling_window_features(events: DataFrame, key: str,
                            time_col: str, value_col: str,
                            trailing_sec: int = 3600) -> DataFrame:
    """Trailing-time-window feature columns per event row: the count and
    exact (decimal-accumulated) sum of the key's events inside
    ``[t - trailing_sec, t]`` — the standard online-feature backfill
    shape ("events in the last hour", "spend in the last day").

    A bounded RANGE frame, not ROWS: peers at the same timestamp all see
    the same frame, so results are deterministic under ties and engine-
    portable. One hash exchange on ``key`` + one per-partition sort;
    Spark evaluates the sliding frame incrementally (add/remove at the
    frame edges), so cost is O(n log n) per key for the sort, not
    O(n * frame). At 100 TB this is the same single-shuffle contract as
    every other keyed window here.

    ``time_col`` must be numeric epoch seconds (see
    :mod:`functions.time` for the dtype-robust extraction).
    """
    w = (Window.partitionBy(key).orderBy(time_col)
         .rangeBetween(-trailing_sec, Window.currentRow))
    return events.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.round(F.sum(F.col(value_col).cast("decimal(18,6)")).over(w)
                .cast("double"), 6).alias("sum_trailing"))


def prior_event_attribution(events: DataFrame, key: str, ts: Column | str,
                            event_type_col: str = "event_type",
                            target_type: str = "purchase",
                            source_type: str = "click",
                            out_prefix: str = "last_source") -> DataFrame:
    """For each `target_type` event, the timestamp of the most recent
    `source_type` event by the same key at-or-before it (funnel/attribution
    as-of within one stream). Single-table special case of `asof_join` that
    needs no union: a conditional running max over a value-range window.

    `ts` must be numeric (e.g. epoch seconds); RANGE frames give the
    inclusive at-or-before semantics deterministically under ties.
    """
    tcol = F.col(ts) if isinstance(ts, str) else ts
    base = events.withColumn("__ts", tcol)
    w = (Window.partitionBy(key).orderBy("__ts")
         .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    src_ts = F.max(F.when(F.col(event_type_col) == source_type,
                          F.col("__ts"))).over(w)
    return (base.withColumn(f"{out_prefix}_ts", src_ts)
            .filter(F.col(event_type_col) == target_type))


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts", max_step_gap_sec: int | None = None,
                 round_digits: int = 6) -> DataFrame:
    """Ordered-funnel conversion: for each step k, the number of users
    who completed steps 1..k IN TEMPORAL ORDER (step k's event strictly
    after the user's step-(k-1) completion time, earliest qualifying
    event wins), plus conversion rates from the first step and from the
    previous step. The product-analytics staple (view -> click ->
    purchase) the reference's event surface has no answer to. With
    ``max_step_gap_sec`` set, each step must also land within that many
    seconds of the previous step's completion (the "converted within an
    hour" variant).

    Plan shape: ONE hash exchange on ``user_col``, then a chain of
    ``len(steps)`` Window mins over that same partitioning (Catalyst
    plans them without re-exchanging — pinned in test_plans), a
    per-user collapse (again same key, no exchange), and a final
    single-row aggregate unpivoted to one row per step. No self-joins,
    no N-pass scans: cost is one shuffle of the event stream regardless
    of funnel depth.

    Timestamps go through ``event_epoch_micros`` so TIMESTAMP,
    TIMESTAMP_NTZ, and raw long-nanos event tables all funnel
    identically (see functions/time.py for the dtype trap).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    from dotnetvectorsearch_spark.functions.time import event_epoch_micros
    w = Window.partitionBy(user_col)
    df = events.select(F.col(user_col), F.col(type_col),
                       event_epoch_micros(events, ts_col).alias("__us"))
    prev = None
    tcols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() \
                & (F.col("__us") > F.col(prev))
            if max_step_gap_sec is not None:
                cond = cond & (F.col("__us") <= F.col(prev)
                               + max_step_gap_sec * 1_000_000)
        tcol = f"__t{i}"
        df = df.withColumn(tcol, F.min(F.when(cond, F.col("__us"))).over(w))
        tcols.append(tcol)
        prev = tcol
    per_user = df.groupBy(user_col).agg(
        *[F.first(t).alias(t) for t in tcols])
    counts = per_user.agg(
        *[F.count(t).alias(f"__u{i}") for i, t in enumerate(tcols)])
    stack_args = ", ".join(
        f"{i + 1}, '{s}', __u{i}" for i, s in enumerate(steps))
    long_form = counts.select(F.expr(
        f"stack({len(steps)}, {stack_args}) AS (step, event_type, users)"))
    first_u = F.first("users").over(
        Window.orderBy("step").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow))
    prev_u = F.lag("users").over(Window.orderBy("step"))
    safe = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den, round_digits)) \
        .otherwise(F.lit(0.0))
    return (long_form
            .withColumn("conv_from_first", safe(F.col("users"), first_u))
            .withColumn("conv_from_prev",
                        F.when(prev_u.isNull(), F.lit(1.0))
                        .otherwise(safe(F.col("users"), prev_u))))


def debounce_events(events: DataFrame, key_cols: list[str],
                    ts_col: str = "ts",
                    min_gap_sec: int = 5,
                    tiebreak_col: str | None = None) -> DataFrame:
    """Event debounce: drop any event that follows the previous KEPT
    event of the same key within ``min_gap_sec`` — the duplicate-click /
    double-fire / at-least-once-delivery cleanup every event pipeline
    runs before analytics. The first event of each burst survives;
    bursts longer than the gap re-emit one event per gap window's first
    firing (anchor semantics: the gap measures from the last KEPT
    event, not the last seen).

    That anchor semantics is a sequential scan per key. The plan is ONE
    hash exchange on the key + a per-partition sort + a single
    `mapInPandas` linear pass: keys are co-located and contiguous after
    the sort, so a dict of per-key anchors carried across Arrow batches
    resolves every key in one pass — one Python call per BATCH.
    (A groupBy().applyInPandas formulation is semantically identical
    but pays per-GROUP invocation overhead — measured ~23ms/group on
    local[32], 30s for 750 tiny groups vs <1s for this shape. A lag()
    window would measure gaps from the previous SEEN event and
    over-drop inside long bursts; kept in the tests as the contract
    counterexample.)

    Ordering ties on ``ts_col`` break by ``tiebreak_col`` (pass the
    event id — the key columns alone can't break a tie) so output is
    deterministic. Timestamps go through ``event_epoch_micros``.
    """
    import pandas as pd

    from dotnetvectorsearch_spark.functions.time import event_epoch_micros
    gap_us = min_gap_sec * 1_000_000
    tiebreak = tiebreak_col or ts_col
    base = events.withColumn("__us", event_epoch_micros(events, ts_col))
    out_schema = base.schema
    repart = (base.repartition(*key_cols)
              .sortWithinPartitions(*key_cols, "__us", tiebreak))

    def scan(batches):
        last_kept: dict = {}
        for pdf in batches:
            if pdf.empty:      # empty bool mask would column-select
                continue
            keys = list(zip(*(pdf[k] for k in key_cols)))
            us = pdf["__us"].to_numpy()
            keep = []
            for i, kt in enumerate(keys):
                lk = last_kept.get(kt)
                if lk is None or us[i] - lk >= gap_us:
                    keep.append(True)
                    last_kept[kt] = us[i]
                else:
                    keep.append(False)
            yield pdf[pd.Series(keep, index=pdf.index, dtype=bool)]

    return repart.mapInPandas(scan, out_schema).drop("__us")


def keyed_trends(events: DataFrame, key: str, ts_col: str = "ts",
                 value_col: str = "value",
                 epoch_offset_sec: int = 1_704_067_200,
                 round_digits: int = 6) -> DataFrame:
    """Per-key least-squares trend of ``value_col`` over event time —
    slope/intercept/r² from the closed-form OLS sums, the per-entity
    drift signal (user spend trending up? source quality decaying?)
    computed for EVERY key in one aggregate pass.

    Engine-portable determinism, same doctrine as every decimal-summed
    query here: the five moment sums (Σx, Σy, Σx², Σxy, Σy²) accumulate
    in DECIMAL (exact, order-independent), and only the per-key SCALAR
    closed-form arithmetic runs in doubles — identical FP ops on
    identical inputs in any engine. x is integer seconds from a fixed
    epoch offset (keys' absolute dates don't inflate the squares);
    slope is reported per DAY. Keys need n >= 2 and nonzero variance
    for a slope; degenerate keys return nulls rather than dropping.

    One map-side-combined aggregate: the exchange carries 6 partials
    per (task, key). At 100 TB this is the cheapest possible shape —
    strictly less traffic than sorting any key's events.
    """
    from dotnetvectorsearch_spark.functions.time import (
        event_epoch_seconds_long)
    x = (event_epoch_seconds_long(events, ts_col)
         - F.lit(epoch_offset_sec)).cast("decimal(20,0)")
    y = F.col(value_col).cast("decimal(27,6)")
    agg = (events.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy")))
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_sec = F.when(vx > 0, cov / vx)
    r2 = F.when((vx > 0) & (vy > 0), (cov * cov) / (vx * vy))
    return agg.select(
        key, "n",
        F.round(slope_sec * 86400.0, round_digits).alias("slope_per_day"),
        F.round((F.col("sy") - slope_sec * F.col("sx")) / n,
                round_digits).alias("intercept"),
        F.round(r2, round_digits).alias("r2"))
