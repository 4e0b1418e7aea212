"""Prepare pipeline — batch ingest parity (SURVEY.md §3.2).

The reference's offline pipeline (``Prepare/Program.cs:19-68``) is a
sequential per-row loop: parse CSV line -> ``combined_text = "{q} : {a}"``
-> embed ``"passage: " + combined`` -> single-row INSERT with a
JSON-serialized vector. Here the whole thing is ONE declarative job:

    csv scan -> project(combined_text) -> embed (Arrow-batched UDF)
    -> metadata columns -> parquet overwrite

which Catalyst executes as a single distributed stage with no shuffle at
all (narrow transformations end-to-end; the embed UDF is the only Python
hop and it is Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.embeddings.base import EmbeddingBackend
from dotnetvectorsearch_spark.functions.text import combined_text, non_blank
from dotnetvectorsearch_spark.sources.io import read_documents_csv, write_corpus


def prepare_documents(df: DataFrame, embedder: EmbeddingBackend) -> DataFrame:
    """CSV rows (id, question, answer) -> full documents-table rows."""
    prepped = (
        df.filter(non_blank("question") & non_blank("answer"))
        .withColumn("combined_text", combined_text("question", "answer"))
    )
    embedded = embedder.embed_documents(prepped, text_col="combined_text")
    return (
        embedded
        .withColumn("embedding_dimensions", F.size("embedding"))
        .withColumn("created_at", F.current_timestamp())
        .select("id", "question", "answer", "combined_text", "embedding",
                "embedding_dimensions", "created_at")
    )


def run_prepare(spark: SparkSession, csv_path: str, out_path: str,
                embedder: EmbeddingBackend,
                target_partitions: int | None = None) -> None:
    """End-to-end ingest job: CSV -> prep -> embed -> Parquet overwrite
    (overwrite == the reference's delete-and-recreate, Prepare/Program.cs:83-87)."""
    raw = read_documents_csv(spark, csv_path)
    docs = prepare_documents(raw, embedder)
    write_corpus(docs, out_path, mode="overwrite",
                 target_partitions=target_partitions)
