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
