"""contiguous_ids: dense [0, N) ids in key order, assigned distributed."""

from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.ids import contiguous_ids
from dotnetvectorsearch_spark.sources.io import load_table


def test_contiguous_ids_dense_and_ordered(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = contiguous_ids(docs, "doc_id", num_partitions=8)
    rows = out.select("doc_id", "seq_id").collect()
    n = len(rows)
    assert sorted(r.seq_id for r in rows) == list(range(n))
    by_key = sorted(rows, key=lambda r: r.doc_id)
    assert [r.seq_id for r in by_key] == list(range(n))


def test_contiguous_ids_no_single_partition_exchange(spark, sf_dir):
    # the whole point: the plan must not contain SinglePartition
    docs = load_table(spark, sf_dir, "documents")
    plan = (contiguous_ids(docs, "doc_id", num_partitions=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_contiguous_ids_keeps_all_columns(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = contiguous_ids(docs, "doc_id", num_partitions=4)
    assert set(out.columns) == set(docs.columns) | {"seq_id"}
    assert out.count() == docs.count()
