"""Dtype-robust epoch extraction for event timestamps.

The test tables' ``events.ts`` is written as parquet TIMESTAMP(NANOS).
How Spark surfaces that column varies by runtime: some builds honor
``spark.sql.legacy.parquet.nanosAsLong`` and produce a ``bigint`` of
epoch nanoseconds, while Spark 4.1 ignores the flag and reads it as
``timestamp_ntz`` (microsecond precision, nanos truncated — the same
truncation DuckDB applies, so oracle parity is preserved either way).

Never branch on a session flag for this: branch on the column's actual
dtype.  The session timezone is pinned to UTC (session.py), so casting
``timestamp_ntz`` to ``timestamp`` is wall-clock identity and
``unix_micros`` yields the same epoch DuckDB's ``epoch_ms``/``epoch``
compute on the naive value.

All helpers return Catalyst ``Column`` expressions — integer arithmetic
inside whole-stage codegen, no UDFs, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NS_PER_US = 1_000
_US_PER_SEC = 1_000_000


def event_epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds ``Column`` for an event-time column, robust to
    the runtime's parquet TIMESTAMP(NANOS) representation (long nanos,
    ``timestamp`` or ``timestamp_ntz``)."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"column {col!r} not found in {df.columns}")
    if dt == "bigint":
        # nanosAsLong honored: integer nanos -> floor to micros
        return F.expr(f"CAST({col} AS LONG) DIV {_NS_PER_US}")
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp"))
    raise TypeError(f"column {col!r} has unsupported event-time dtype {dt}")


def event_epoch_seconds_long(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-seconds floored to LONG — the sessionize/as-of bucket."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.expr(f"CAST({col} AS LONG) DIV {_NS_PER_US * _US_PER_SEC}")
    return F.expr(
        f"unix_micros(CAST({col} AS TIMESTAMP)) DIV {_US_PER_SEC}")


def event_bucket_seconds(df: DataFrame, bucket_sec: int,
                         col: str = "ts") -> Column:
    """Tumbling-bucket start (epoch seconds, LONG) of width
    ``bucket_sec`` — integer floor division, timezone-proof, identical
    to DuckDB ``date_trunc`` for hour/day widths."""
    micros_per_bucket = bucket_sec * _US_PER_SEC
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        nanos_per_bucket = micros_per_bucket * _NS_PER_US
        base = F.expr(f"CAST({col} AS LONG) DIV {nanos_per_bucket}")
    else:
        base = F.expr(
            f"unix_micros(CAST({col} AS TIMESTAMP)) DIV {micros_per_bucket}")
    return (base * F.lit(bucket_sec)).cast("long")
