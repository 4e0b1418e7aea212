"""Corpus profiling (beyond-reference).

One-pass corpus summary — the "data card" numbers every training-data
pipeline reports before a run: volume, language/source spread, length
distribution, token total, short-doc fraction. The reference exposes
only a bare row count (`WebAPI/Services/VectorSearchService.cs:203`);
this is the batch analogue at engine level.

Scale shape: a single map-side-combined `HashAggregate` over one scan —
the exchange carries one partial-aggregate row per task regardless of
corpus size. Distinct counts ride the same pass as exact
`count(DISTINCT)` (Catalyst expands to a two-stage aggregate); swap in
`approx_count_distinct` when cardinalities stop being small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_profile(docs: DataFrame, text_col: str = "text",
                   lang_col: str = "lang", source_col: str = "source",
                   chars_col: str = "n_chars",
                   short_doc_chars: int = 20) -> DataFrame:
    """Single-row corpus summary: counts, cardinalities, length stats,
    whitespace-token total, and the under-`short_doc_chars` fraction."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.countDistinct(source_col).alias("n_sources"),
        F.min(chars_col).cast("long").alias("min_chars"),
        F.max(chars_col).cast("long").alias("max_chars"),
        F.round(F.avg(F.col(chars_col).cast("double")), 6)
        .alias("avg_chars"),
        F.sum(n_tokens).cast("long").alias("total_tokens"),
        F.round(F.avg(F.when(F.col(chars_col) < short_doc_chars, 1.0)
                      .otherwise(0.0).cast("double")), 6)
        .alias("short_doc_frac"),
    )
