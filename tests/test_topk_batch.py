from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.search import topk_per_query
from dotnetvectorsearch_spark.sources.io import load_table


def _run(spark, sf_dir, prefilter):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = (load_table(spark, sf_dir, "embeddings")
          .filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("qvec")))
    out = topk_per_query(emb, qs, k=4, round_digits=6,
                         local_prefilter=prefilter)
    return sorted((r.qid, r.rank, r.vec_id, r.similarity)
                  for r in out.collect())


def test_topk_per_query_basic(spark, sf_dir):
    rows = _run(spark, sf_dir, prefilter=True)
    assert len(rows) == 12  # 3 queries x k=4
    # self-similarity is rank 1 with score 1.0 for every query
    top1 = {(q, v): s for (q, r, v, s) in rows if r == 1}
    for q in (0, 1, 2):
        assert top1[(q, q)] == 1.0


def test_topk_prefilter_matches_full_window(spark, sf_dir):
    assert _run(spark, sf_dir, True) == _run(spark, sf_dir, False)


def test_arrow_batch_matches_window_path(spark, sf_dir):
    from dotnetvectorsearch_spark.operators.search import topk_per_query_arrow
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = (load_table(spark, sf_dir, "embeddings")
          .filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect())
    qvecs = [(r.vec_id, list(r.embedding)) for r in qs]
    arrow = sorted((r.qid, r.rank, r.vec_id, r.similarity)
                   for r in topk_per_query_arrow(emb, qvecs, k=4,
                                                 round_digits=6).collect())
    assert arrow == _run(spark, sf_dir, prefilter=True)
