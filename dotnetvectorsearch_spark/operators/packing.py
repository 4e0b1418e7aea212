"""Sequence packing for training-batch assembly (beyond-reference).

Packing concatenates documents into fixed token-budget rows (the standard
LLM pretraining batch shape). Two variants:

- `pack_sequential`: budget-quantized running-sum assignment — pure window
  arithmetic (one shuffle on the shard key, one sorted pass). Pack k holds
  the docs whose EXCLUSIVE running total falls in [k*budget, (k+1)*budget);
  a pack can overflow by at most one document. Fully SQL-expressible, so it
  is the oracle-checked variant.
- `pack_greedy`: exact first-fit-sequential packing (never exceeds budget
  unless a single doc alone does) — sequential per shard, implemented as an
  Arrow-batched `applyInPandas` over shards. The custom-stateful-operator
  escape hatch the built-ins can't express.

Both are deterministic: shards are explicit, order within a shard is an
explicit column. At scale, shard count ~ cluster cores x k keeps every
sequential pass small while the shuffle stays a single hash exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequential(docs: DataFrame, token_col: str, budget: int,
                    shard_col: str, order_col: str,
                    out: str = "pack_id") -> DataFrame:
    """Budget-quantized packing via exclusive running sum (window cumsum)."""
    w = (Window.partitionBy(shard_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.withColumn(out, F.floor(cum_prev / budget).cast("long"))


def chunk_documents(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    stride: int = 48) -> DataFrame:
    """Overlapping token-window chunking (context-window prep: RAG
    passage splitting / long-doc training samples).

    Chunk i covers whitespace-token positions [i*stride, i*stride +
    chunk_tokens); stride < chunk_tokens gives the overlap that keeps
    boundary-spanning content inside some chunk. Output one row per
    chunk: (id, chunk_id, n_tokens, chunk_text).

    Shape: tokenize -> posexplode(sequence of starts) -> slice + join.
    One narrow pass, no shuffle; the token array is re-evaluated per
    chunk row (docs are chunks x tokens work anyway — same complexity,
    and it keeps the plan in codegen instead of caching wide arrays).
    Empty/blank docs produce a single empty chunk (chunk_id 0), so every
    document survives into the chunked corpus."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    with_tok = docs.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0,
               F.array().cast("array<string>"))
        .otherwise(toks).alias("__toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__toks") - 1, F.lit(0)),
        F.lit(stride))
    exploded = with_tok.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"))
    chunk = F.slice("__toks", F.col("__start") + 1, chunk_tokens)
    return (exploded
            .select(F.col(id_col),
                    F.col("chunk_id"),
                    F.size(chunk).alias("n_tokens"),
                    F.array_join(chunk, " ").alias("chunk_text")))


def pack_greedy(docs: DataFrame, token_col: str, budget: int,
                shard_col: str, order_col: str,
                out: str = "pack_id") -> DataFrame:
    """Exact first-fit-sequential packing per shard (applyInPandas)."""
    import pandas as pd

    cols = docs.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in docs.schema.fields) + f", {out} long"

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        packs, pack, used = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                pack, used = pack + 1, 0
            packs.append(pack)
            used += t
        pdf = pdf.copy()
        pdf[out] = packs
        return pdf

    return (docs.repartition(shard_col)
            .groupBy(shard_col).applyInPandas(pack_one, schema)
            .select(*cols, out))
