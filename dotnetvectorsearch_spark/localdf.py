"""Fast DataFrame construction for small DRIVER-LOCAL row lists.

``spark.createDataFrame(rows, schema)`` parallelizes the rows into
``defaultParallelism`` slices (32 on the bench host). For the tiny
frames the engine builds constantly — a 1-row query vector, an 8-row
centroid table, a recall scalar — that means a 32-task job where one
task would do, and every slice evaluation pays a Python-runner
handshake. Worse, the common ``.coalesce(1)`` before a write makes ONE
task replay all 32 pickled slices SEQUENTIALLY through the Python
runner: measured ~7s per 8-row centroid write on the bench host vs
~0.4s for the same rows parallelized into one slice (guide §4 — the
JVM<->Python boundary is the cost; cross it once, not 32 times).

:func:`local_df` is a drop-in replacement that parallelizes driver-local
rows into as few slices as their size warrants (one, for everything the
engine builds today). Row values, schema handling and the resulting
DataFrame are identical to ``createDataFrame`` — only the slice count
changes, which no correct query can observe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# One slice comfortably holds ~100k small rows (driver-local data was
# never going to be big — anything near this bound should be a real
# distributed frame instead).
_ROWS_PER_SLICE = 100_000


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the 32-slice tax.

    ``rows`` is a driver-local list (possibly empty) of tuples/Rows;
    ``schema`` a DDL string or StructType. The rows land in
    ``1 + len(rows) // _ROWS_PER_SLICE`` slices instead of
    ``defaultParallelism`` — same values, same schema, same nullability,
    one Python-runner round instead of 32.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    n_slices = 1 + len(rows) // _ROWS_PER_SLICE
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema)
