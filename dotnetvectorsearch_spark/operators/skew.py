"""Skew mitigation for joins (beyond-reference scale tooling).

AQE's skew-join handling (on in session.py) splits oversized sort-merge
partitions at runtime; explicit salting is the complementary static tool
for the pathological case AQE can't fix — a broadcast-ineligible join
where a handful of keys dominate (e.g. joining events to a per-user dim
when a few bot users hold 10% of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                salt_buckets: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join robust to heavy-hitter keys on the `skewed` side.

    The skewed side gets a per-row salt in [0, salt_buckets); the other
    side is replicated across every salt value (cost: other × buckets —
    pick buckets so this stays small). The join key becomes (key, salt),
    so one hot key spreads over `salt_buckets` shuffle partitions instead
    of hammering one reducer.

    Result equals a plain ``skewed.join(other, on, how)`` for 'inner' and
    'left' joins (every skewed row keeps exactly its original matches).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted = skewed.withColumn(
        "__salt", F.floor(F.rand(seed) * salt_buckets).cast("int"))
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = salted.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_stats(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Pre-join skew diagnosis: per-key row counts summarized as the
    corpus-wide max/mean ratio plus each of the ``top_n`` heaviest keys'
    share — the measurement that decides BETWEEN the mitigation tools
    here (a handful of dominant keys -> `salted_join`; broad moderate
    skew -> leave it to AQE's skew-join split; one key owning the table
    -> filter/handle it out of band).

    One map-side-combined count aggregate (exchange carries per-task
    partial counts, never rows), one tiny top-N merge, the global
    moments folded in via a broadcast 1-row frame — safe to run on the
    100 TB fact table before committing to a join strategy. Returns
    ``top_n`` rows: (key string, n, share, max_over_mean) ordered by n
    desc then key asc; ``share``/``max_over_mean`` repeat the global
    figures so the frame is self-contained.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key")) \
        .agg(F.count(F.lit(1)).alias("n"))
    totals = F.broadcast(counts.agg(
        F.sum("n").alias("__total"),
        F.max("n").alias("__max"),
        F.count(F.lit(1)).alias("__keys")))
    return (counts.crossJoin(totals)
            .select(
                "key", "n",
                F.round(F.col("n") / F.col("__total"), 6).alias("share"),
                F.round(F.col("__max")
                        / (F.col("__total") / F.col("__keys")), 6)
                .alias("max_over_mean"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(top_n))
