"""Pluggable embedding backend contract (SURVEY.md §2.3).

Mirrors the reference's ``IEmbeddingService``
(``Core/Embeddings/IEmbeddingService.cs:5-24``: single embed, batch embed,
tokenize) but as a Spark-native contract: a backend produces an
Arrow-batched pandas UDF that maps a string column to an array<float>
column. The reference's task-level concurrency (``Task.WhenAll`` of
batch-size-1 inferences, ``EmbeddingService.cs:26-30``) is replaced by real
tensor batching inside a scalar-iterator UDF + Spark task parallelism.
"""

from __future__ import annotations

import abc

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.functions.text import with_task_prefix


class EmbeddingBackend(abc.ABC):
    """A source of text embeddings usable as a DataFrame transformation."""

    #: embedding dimensionality this backend produces
    dim: int

    @abc.abstractmethod
    def udf(self):
        """Return a pandas UDF: Column[str] -> Column[array<float>]."""

    def embed_column(self, text: Column | str, kind: str | None = None) -> Column:
        """Embedding expression for a text column, optionally applying the
        E5 task prefix first ('query' | 'passage')."""
        col = F.col(text) if isinstance(text, str) else text
        if kind is not None:
            col = with_task_prefix(col, kind)
        return self.udf()(col)

    def embed_documents(self, df: DataFrame, text_col: str = "combined_text",
                        out: str = "embedding") -> DataFrame:
        """Index-time embedding: 'passage: ' prefix (Prepare/Program.cs:56)."""
        return df.withColumn(out, self.embed_column(text_col, kind="passage"))

    def embed_queries(self, df: DataFrame, text_col: str = "query_text",
                      out: str = "query_embedding") -> DataFrame:
        """Query-time embedding: 'query: ' prefix (VectorSearchService.cs:183)."""
        return df.withColumn(out, self.embed_column(text_col, kind="query"))
