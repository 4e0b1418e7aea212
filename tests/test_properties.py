"""Property tests (SURVEY.md §5.3): ranking-contract invariants checked on
the real test corpus with one Spark job per property."""

from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.functions import vector as V
from dotnetvectorsearch_spark.operators import search as S
from dotnetvectorsearch_spark.sources.io import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id",
                                                          "embedding")


def _query(spark, sf_dir):
    return (load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 0)
            .select(F.col("embedding").alias("query_embedding")))


def test_topk_nested_in_topk_plus_one(spark, sf_dir):
    emb, q = _emb(spark, sf_dir), _query(spark, sf_dir)
    ids = lambda k: [r.vec_id for r in  # noqa: E731
                     S.top_k_similar(emb, q, top_k=k, id_col="vec_id",
                                     round_digits=6).collect()]
    k5, k6 = ids(5), ids(6)
    assert k5 == k6[:5]                      # deterministic prefix property


def test_threshold_is_postfilter_of_unfiltered(spark, sf_dir):
    emb, q = _emb(spark, sf_dir), _query(spark, sf_dir)
    full = S.top_k_similar(emb, q, top_k=50, id_col="vec_id",
                           round_digits=6).collect()
    thr = S.top_k_similar(emb, q, top_k=50, id_col="vec_id",
                          threshold=0.2, round_digits=6).collect()
    expected = [(r.vec_id, r.similarity) for r in full if r.similarity >= 0.2]
    assert [(r.vec_id, r.similarity) for r in thr] == expected


def test_cosine_symmetric_and_bounded_on_corpus(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = emb.limit(20).select(F.col("vec_id").alias("ia"),
                             F.col("embedding").alias("ea"))
    b = emb.limit(20).select(F.col("vec_id").alias("ib"),
                             F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).select(
        "ia", "ib",
        F.round(V.cosine_similarity("ea", "eb"), 9).alias("ab"),
        F.round(V.cosine_similarity("eb", "ea"), 9).alias("ba"))
    rows = pairs.collect()
    assert all(r.ab == r.ba for r in rows)               # symmetry
    assert all(-1.0 - 1e-9 <= r.ab <= 1.0 + 1e-9 for r in rows)  # bounds
    assert all(abs(r.ab - 1.0) < 1e-6 for r in rows if r.ia == r.ib)


def test_normalize_idempotent_on_corpus(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    once = V.l2_normalize("embedding", keep_float=False)
    twice = V.l2_normalize(once, keep_float=False)
    diff = F.aggregate(
        F.zip_with(once, twice, lambda x, y: F.abs(x - y)),
        F.lit(0.0), lambda acc, x: F.greatest(acc, x))
    max_diff = emb.select(F.max(diff).alias("m")).first().m
    assert max_diff < 1e-12
