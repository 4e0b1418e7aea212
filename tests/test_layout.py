"""Layout tests: z-order clustering actually enables multi-column
pruning (measured on real parquet min/max stats), compaction reduces
file counts without losing rows."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.sources.io import load_table
from dotnetvectorsearch_spark.sources.layout import (
    compact,
    write_zordered,
    zorder_value,
)


def _overlap_fraction(path: str, col_a: str, a_lo, a_hi,
                      col_b: str, b_lo, b_hi) -> float:
    """Fraction of row groups whose [min,max] box overlaps the query box
    on BOTH columns — i.e. the fraction a stats-pruning scan must read."""
    total, hit = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name
                        for i in range(meta.num_columns)]
        ia, ib = schema_names.index(col_a), schema_names.index(col_b)
        for rg in range(meta.num_row_groups):
            total += 1
            sa = meta.row_group(rg).column(ia).statistics
            sb = meta.row_group(rg).column(ib).statistics
            if (sa.min <= a_hi and sa.max >= a_lo
                    and sb.min <= b_hi and sb.max >= b_lo):
                hit += 1
    assert total > 0
    return hit / total


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "z")
    ev.repartition(16).write.parquet(plain)
    write_zordered(ev, zpath, ["user_id", "value"], n_files=16)

    stats = ev.agg(F.min("user_id"), F.max("user_id"),
                   F.min("value"), F.max("value")).collect()[0]
    u_lo, u_hi, v_lo, v_hi = stats
    # a box covering ~25% of each dimension (~6% of the plane)
    u_q = (u_lo, u_lo + (u_hi - u_lo) * 0.25)
    v_q = (v_lo, v_lo + (v_hi - v_lo) * 0.25)

    frac_plain = _overlap_fraction(plain, "user_id", *u_q, "value", *v_q)
    frac_z = _overlap_fraction(zpath, "user_id", *u_q, "value", *v_q)
    # random layout: every row group spans the domain -> reads ~all of
    # them; z-order must skip a clear majority
    assert frac_plain > 0.9
    assert frac_z < 0.5
    # and the data round-trips exactly
    assert spark.read.parquet(zpath).count() == ev.count()


def test_zorder_single_dim_still_sorted(spark, sf_dir, tmp_path):
    """Z-order on one column degenerates to a range-sorted write."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    path = str(tmp_path / "z1")
    write_zordered(ev, path, ["event_id"], n_files=4)
    files = sorted(glob.glob(f"{path}/*.parquet"))
    ranges = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        s = meta.row_group(0).column(0).statistics
        ranges.append((s.min, s.max))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next  # globally disjoint file ranges


def test_zorder_value_validates_width():
    with pytest.raises(ValueError, match="<= 63"):
        zorder_value(["a", "b"], {"a": (0, 1), "b": (0, 1)}, bits=32)


def test_compact_reduces_files(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    ev.repartition(40).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 40
    out = str(tmp_path / "compacted")
    compact(spark, frag, out, target_mb=512, sort_by="event_id")
    out_files = glob.glob(f"{out}/*.parquet")
    assert len(out_files) < 40
    assert spark.read.parquet(out).count() == ev.count()
