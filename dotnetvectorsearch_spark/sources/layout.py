"""Data-layout utilities for 100 TB corpora (beyond-reference; the
reference's only layout decision is three unused SQLite indexes,
Prepare/Program.cs:103-105).

Parquet pruning at scale is a *layout* property: row groups are skipped
via their min/max stats, and stats are only selective if the writer
clustered the data. Two tools:

- **Z-order write** (`zorder_value`, `write_zordered`): interleave the
  bits of several columns into one sort key so that sorting by it
  clusters ALL those columns at once — a filter on any of them then
  skips most row groups. The classic multi-dimensional-pruning layout
  (Delta/Iceberg OPTIMIZE ZORDER does the same); implemented here with
  pure built-in expressions (width_bucket + shiftleft + bitwise OR), no
  UDF, so the z-value computation is whole-stage-codegen'd.
- **Compaction** (`compact`): rewrite a directory of too-many small
  files into size-targeted files. Small files are the #1 silent killer
  of 100 TB scans (driver-side listing, per-file open cost, tiny row
  groups with useless stats).

Scale notes: the z-value uses per-column min/max from one aggregate over
the input (a single pass); for append-only production data feed known
domain bounds instead via ``bounds=`` to skip that pass. Sorting by
z-value is a full shuffle — pay it once at write time, like bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _interleave_bits(quantized: list[Column], bits: int) -> Column:
    """Bit-interleave k quantized columns (each in [0, 2^bits)) into one
    long z-value: result bit (i*k + j) = bit i of column j."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(quantized) + j))
    return z


def zorder_value(cols: list[str], bounds: dict[str, tuple[float, float]],
                 bits: int = 12) -> Column:
    """Z-value expression over numeric columns with known [lo, hi] bounds.

    Each column is linearly quantized to ``bits`` bits, then interleaved.
    ``bits * len(cols)`` must stay <= 63 (long z-value)."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    max_q = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1.0
        scaled = ((F.col(c).cast("double") - F.lit(float(lo)))
                  / F.lit(float(span)) * max_q)
        q = F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)),
                    F.lit(max_q))
        quantized.append(q)
    return _interleave_bits(quantized, bits)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 12, n_files: int | None = None,
                   bounds: dict[str, tuple[float, float]] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` clustered on the z-order curve of ``cols``.

    ``repartitionByRange`` on the z-value gives globally disjoint file
    ranges (better than a local sort for pruning), then each task sorts
    its range so row groups inside a file are tight too."""
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}
    z = zorder_value(cols, bounds, bits).alias("__z")
    with_z = df.withColumn("__z", z)
    parts = n_files or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")
    (with_z.repartitionByRange(int(parts), "__z")
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))


def compact(spark: SparkSession, path: str, out_path: str,
            target_mb: int = 512, sort_by: str | None = None) -> int:
    """Rewrite a parquet directory into ~target_mb-sized files; returns
    the output file count. ``sort_by`` re-sorts during compaction to
    restore min/max selectivity that tiny appends destroyed."""
    df = spark.read.parquet(path)
    total_bytes = sum(int(f.length) for f in _list_files(spark, path))
    n = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n, sort_by).sortWithinPartitions(sort_by)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(out_path)
    return n


def _list_files(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    for status in fs.listStatus(p):
        if status.isFile() and not status.getPath().getName().startswith("_"):
            yield _FileInfo(status.getPath().toString(), status.getLen())


class _FileInfo:
    def __init__(self, path: str, length: int):
        self.path = path
        self.length = length
