"""Global id assignment for training-data sharding.

`row_number() OVER (ORDER BY key)` is the textbook way to hand every row a
contiguous id — and a scale trap: an empty OVER partition collapses the
whole dataset into ONE task. `monotonically_increasing_id()` distributes
but leaves ~2^33-sized gaps between partitions, which breaks consumers
that want dense [0, N) ids (sequence packing, shard addressing, sample
indexing).

`contiguous_ids` is the scalable dense form (beyond-reference; the
reference's only id is the CSV-supplied primary key,
DotNetVectorSearch.Prepare/Program.cs:48):

1. range-repartition + sort within partitions on the order key — the same
   shuffle a global sort pays, but no single-task merge;
2. one tiny per-partition count aggregate, collected to the driver
   (numPartitions rows) and turned into cumulative offsets;
3. one narrow mapInPandas pass stamping offset + local position.

Total: one wide shuffle + one O(P) collect + one narrow pass — the id
assignment itself never funnels through a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contiguous_ids(df: DataFrame, order_col: str,
                   out: str = "seq_id",
                   num_partitions: int | None = None) -> DataFrame:
    """Assign dense ids 0..N-1 in ``order_col`` order, distributed.

    The order key should be unique (ties get an arbitrary but stable
    order within their range partition). Output schema = input schema +
    ``out`` (long).
    """
    n = (num_partitions
         or df.sparkSession.sparkContext.defaultParallelism)
    part = (df.repartitionByRange(n, F.col(order_col))
            .sortWithinPartitions(order_col)
            .withColumn("__pid", F.spark_partition_id())
            .persist())
    # O(numPartitions) rows: the only driver-side state.
    counts = {r["__pid"]: r["n"]
              for r in part.groupBy("__pid")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):  # RangePartitioning: pid order == key order
        offsets[pid] = acc
        acc += counts[pid]

    # fresh StructType: .add() would mutate the DataFrame's cached schema
    # object, desyncing the python-side column list from the JVM plan
    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType(list(part.schema.fields)
                        + [StructField(out, LongType())])

    def stamp(batches):
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = offsets[int(pdf["__pid"].iloc[0])]
            pdf[out] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return part.mapInPandas(stamp, schema).drop("__pid")
