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
