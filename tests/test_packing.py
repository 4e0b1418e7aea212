from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.packing import (
    pack_greedy,
    pack_sequential,
)


def _docs(spark):
    rows = [Row(doc_id=i, shard=s, n_tok=t)
            for i, (s, t) in enumerate([
                ("a", 700), ("a", 500), ("a", 900), ("a", 100), ("a", 1200),
                ("b", 2500), ("b", 10), ("b", 2048),
            ])]
    return spark.createDataFrame(rows)


def test_pack_greedy_never_overflows(spark):
    out = pack_greedy(_docs(spark), "n_tok", budget=2048,
                      shard_col="shard", order_col="doc_id")
    sums = (out.groupBy("shard", "pack_id")
            .agg(F.sum("n_tok").alias("tot"), F.count("*").alias("n"))
            .collect())
    for r in sums:
        assert r.tot <= 2048 or r.n == 1   # only a solo oversize doc exceeds


def test_pack_greedy_matches_python_reference(spark):
    out = {r.doc_id: r.pack_id
           for r in pack_greedy(_docs(spark), "n_tok", budget=2048,
                                shard_col="shard",
                                order_col="doc_id").collect()}
    # shard a: 700+500 fit; 900+100 fit; 1200 alone
    assert out[0] == out[1] == 0
    assert out[2] == out[3] == 1
    assert out[4] == 2
    # shard b: 2500 alone (oversize), 10 next, 2048 exactly fills pack 2
    assert (out[5], out[6], out[7]) == (0, 1, 2)


def test_pack_sequential_is_ordered_quantization(spark):
    out = pack_sequential(_docs(spark), "n_tok", budget=2048,
                          shard_col="shard", order_col="doc_id")
    rows = {r.doc_id: r.pack_id for r in out.collect()}
    # exclusive cumsum for shard a: 0,700,1200,2100,2200 -> //2048
    assert [rows[i] for i in range(5)] == [0, 0, 0, 1, 1]


def test_pack_ids_monotone_within_shard(spark):
    out = pack_greedy(_docs(spark), "n_tok", budget=2048,
                      shard_col="shard", order_col="doc_id").collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_shard.setdefault(r.shard, []).append(r.pack_id)
    for packs in by_shard.values():
        assert packs == sorted(packs)


def test_chunk_documents_overlap_and_edges(spark):
    from dotnetvectorsearch_spark.operators.packing import chunk_documents
    from pyspark.sql import Row
    docs = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10))),  # 1 chunk
        Row(doc_id=2, text=" ".join(f"w{i}" for i in range(130))),  # 3 chunks
        Row(doc_id=3, text="   "),                                  # blank
    ])
    out = chunk_documents(docs, "text", "doc_id",
                          chunk_tokens=64, stride=48)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: 10 tokens -> one chunk with all of them
    assert rows[(1, 0)].n_tokens == 10
    # doc 2: starts at 0, 48, 96 -> 64, 64, 34 tokens
    assert [rows[(2, i)].n_tokens for i in range(3)] == [64, 64, 34]
    # overlap: chunk 1 starts at token 48, inside chunk 0's range
    assert rows[(2, 1)].chunk_text.startswith("w48 ")
    assert "w48" in rows[(2, 0)].chunk_text
    # blank doc survives as a single empty chunk
    assert rows[(3, 0)].n_tokens == 0 and rows[(3, 0)].chunk_text == ""
    assert len(rows) == 5
