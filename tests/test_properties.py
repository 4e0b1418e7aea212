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


def test_quantize_error_bound_on_corpus(spark, sf_dir):
    """Quantization error per component is bounded by scale/2 = max|x|/254
    for every vector in the corpus (the int8 round guarantee)."""
    emb = load_table(spark, sf_dir, "embeddings")
    scale = V.quantize_scale("embedding")
    deq = V.dequantize(V.quantize_int8("embedding", scale), scale)
    max_err = F.array_max(F.zip_with(
        "embedding", deq,
        lambda a, b: F.abs(a.cast("double") - b.cast("double"))))
    bad = (emb.select(max_err.alias("e"), scale.alias("s"))
           .filter(F.col("e") > F.col("s") / 2 + 1e-7).count())
    assert bad == 0


def test_chunks_cover_every_token(spark, sf_dir):
    """Chunking coverage: concatenating each doc's stride-aligned chunk
    prefixes reconstructs the doc's full token sequence (no token is
    dropped at chunk boundaries)."""
    from dotnetvectorsearch_spark.operators.packing import chunk_documents
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    total = (docs.filter(F.length(F.trim("text")) > 0)
             .agg(F.sum(n_tok)).first()[0])
    chunks = chunk_documents(docs, "text", "doc_id",
                             chunk_tokens=64, stride=48)
    # stride-aligned prefix = first 48 tokens of each chunk; the final
    # (short) chunk contributes all of its tokens
    covered = (chunks.agg(F.sum(F.least(F.col("n_tokens"), F.lit(48))))
               .first()[0])
    assert covered == total


def test_funnel_users_monotone_and_gap_monotone(spark, sf_dir):
    """Funnel invariants on the real event stream: step-k users are
    non-increasing in k, and widening the per-step gap can only grow
    every step's count (gap=None is the upper bound)."""
    from dotnetvectorsearch_spark.operators.temporal import funnel_steps
    events = load_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]

    def users(gap):
        rows = funnel_steps(events, steps, max_step_gap_sec=gap).collect()
        return [r.users for r in sorted(rows, key=lambda r: r.step)]

    tight, wide, unbounded = users(3600), users(86400), users(None)
    for seq in (tight, wide, unbounded):
        assert seq == sorted(seq, reverse=True)         # funnel narrows
    for a, b in zip(tight, wide):
        assert a <= b
    for a, b in zip(wide, unbounded):
        assert a <= b


def test_rollup_merge_is_idempotent_free_and_count_exact(spark, sf_dir):
    """Merging a rollup with an EMPTY batch is the identity; total n
    always equals the source row count regardless of split."""
    from pyspark.sql import functions as F

    from dotnetvectorsearch_spark.operators.rollup import (
        merge_rollups, rollup_batch, rollup_read)
    orders = load_table(spark, sf_dir, "orders")
    keys = ["o_orderstatus"]
    r = rollup_batch(orders, keys, "o_totalprice")
    empty = rollup_batch(orders.filter(F.lit(False)), keys,
                         "o_totalprice")
    merged = rollup_read(merge_rollups(r, empty))
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, rollup_read(r).collect()))
    assert (sum(x.n for x in merged.collect())
            == orders.count())
