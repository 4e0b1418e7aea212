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
