"""HashedProjectionEmbedder: determinism, norm, and the semantic
property the hash-of-text test embedder cannot give — lexical overlap
drives cosine similarity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from dotnetvectorsearch_spark.embeddings import HashedProjectionEmbedder


def _embed(spark, texts, **kw):
    emb = HashedProjectionEmbedder(**kw)
    df = spark.createDataFrame([Row(t=t) for t in texts])
    rows = df.withColumn("e", emb.embed_column("t")).collect()
    return [np.asarray(r.e, dtype=np.float64) for r in rows]


def test_deterministic_and_unit_norm(spark):
    a1, b1 = _embed(spark, ["the quick brown fox", "lazy dogs sleep"])
    a2, b2 = _embed(spark, ["the quick brown fox", "lazy dogs sleep"])
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    assert abs(np.linalg.norm(a1) - 1.0) < 1e-5
    assert abs(np.linalg.norm(b1) - 1.0) < 1e-5


def test_lexical_overlap_drives_similarity(spark):
    base = "the hotel booking cancellation policy allows refunds"
    near = "the hotel booking cancellation policy requires notice"
    far = "quantum chromodynamics lattice simulation results"
    e_base, e_near, e_far = _embed(spark, [base, near, far])
    assert e_base @ e_near > e_base @ e_far + 0.2


def test_duplicate_texts_identical(spark):
    a, b = _embed(spark, ["same words here", "same words here"])
    assert np.array_equal(a, b)


def test_empty_text_is_zero_vector(spark):
    (e,) = _embed(spark, ["   "])
    assert np.linalg.norm(e) == 0.0


def test_prefix_sensitivity(spark):
    """The E5 task prefix adds a token, shifting the embedding — the
    asymmetric-prefix contract the reference relies on."""
    emb = HashedProjectionEmbedder()
    df = spark.createDataFrame([Row(t="hello world")])
    out = df.select(
        emb.embed_column("t", kind="query").alias("q"),
        emb.embed_column("t", kind="passage").alias("p")).collect()[0]
    q = np.asarray(out.q, dtype=np.float64)
    p = np.asarray(out.p, dtype=np.float64)
    assert not np.array_equal(q, p)
    assert q @ p > 0.5  # but they stay close (shared tokens dominate)


def test_prepare_pipeline_with_hashed_projection(spark, tmp_path):
    """The backend plugs into the same prepare pipeline as the others
    (the IEmbeddingService-swap the reference contract promises)."""
    from dotnetvectorsearch_spark.pipeline.prepare import prepare_documents
    raw = spark.createDataFrame(
        [Row(id=1, question="cancel booking", answer="use the portal"),
         Row(id=2, question="refund policy", answer="within 30 days")])
    docs = prepare_documents(raw, HashedProjectionEmbedder(dim=32))
    rows = docs.collect()
    assert {r.id for r in rows} == {1, 2}
    assert all(len(r.embedding) == 32 for r in rows)
    assert all(r.embedding_dimensions == 32 for r in rows)
