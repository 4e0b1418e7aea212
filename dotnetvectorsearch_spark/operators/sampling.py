"""Sampling operators for training-data pipelines (beyond-reference).

Deterministic (seeded) samplers built on Spark's native Bernoulli sampling
— no shuffle, no driver collection; each executor samples its partitions
independently, which is exactly the shape that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sample (`sampleBy`): fractions maps stratum
    value -> keep probability. Strata absent from the map are dropped.
    Narrow operation; deterministic for a fixed seed and partitioning."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def proportional_downsample(df: DataFrame, strata_col: str,
                            target_per_stratum: int,
                            seed: int = 42) -> DataFrame:
    """Cap every stratum at ~target rows: one count pass to size the
    per-stratum fractions, then a narrow Bernoulli sample. The count is a
    map-side-combined aggregate (tiny result), so the total cost is two
    scans and zero wide shuffles — the scalable way to balance a skewed
    corpus (e.g. per-language caps for training mixes)."""
    counts = {r[strata_col]: r["n"]
              for r in df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    fractions = {k: min(1.0, target_per_stratum / n)
                 for k, n in counts.items() if n > 0}
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "sample-v1") -> DataFrame:
    """Deterministic content-hash Bernoulli sample: keep a row iff the
    first 8 hex chars of md5(key || salt) fall below fraction * 16^8.

    Unlike ``sampleBy``/``sample`` (whose XORShift draw depends on the
    row's partition and position, so results change under repartitioning),
    the kept set here is a pure function of (key, salt) — stable across
    runs, partitionings, engines, and incremental re-ingests, which is
    what makes a 100 TB sample reproducible and auditable. Narrow
    codegen'd filter, no shuffle, pushes past any partitioning.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(fraction * 16 ** 8)
    h = F.conv(F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long")
    return df.filter(h < F.lit(bound))


def hash_split(df: DataFrame, key_col: str,
               weights: dict[str, float],
               salt: str = "split-v1",
               out: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by content hash: the split
    a row lands in depends only on (key, salt), so it is stable across
    runs, machines, partitionings, and incremental re-ingests — the
    property random `randomSplit` does NOT have (its assignment changes
    with partitioning). Weights need not sum to 1; they are normalized.

    Mechanism: the first 8 hex chars of md5(key || salt) uniformly cover
    [0, 16^8); cumulative weight thresholds carve the range. A narrow,
    codegen'd projection — no shuffle, no state, trivially parallel at
    any scale, and exactly reproducible in any engine with md5 (hence
    oracle-checkable).
    """
    total = sum(weights.values())
    bound = 16 ** 8
    h = F.conv(F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long")
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = h < F.lit(int(acc * bound))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out, expr)
