from __future__ import annotations

import pytest

from dotnetvectorsearch_spark.api import VectorSearchEngine
from dotnetvectorsearch_spark.embeddings import DeterministicEmbedder
from dotnetvectorsearch_spark.pipeline.prepare import prepare_documents


@pytest.fixture(scope="module")
def engine(spark):
    raw = spark.createDataFrame(
        [(1, "How do I cancel my booking?", "Use the portal."),
         (2, "What is the refund policy?", "Refunds within 30 days."),
         (3, "How do I cancel my booking?", "Use the portal."),
         (4, "Where is check-in?", "Front desk, level 1.")],
        "id long, question string, answer string")
    emb = DeterministicEmbedder(dim=32)
    corpus = prepare_documents(raw, emb)
    return VectorSearchEngine(spark, corpus, emb)


def test_health(engine):
    h = engine.health()
    assert h["status"] == "healthy"
    assert h["total_documents"] == 4
    assert h["embedding_dimensions"] == 32


def test_get_embedding_no_prefix(engine):
    r = engine.get_embedding("hello world")
    assert r["dimensions"] == 32
    # raw text embedding differs from the query-prefixed one
    q = engine._embed_texts(["hello world"], prefix="query: ")[0]
    assert r["embedding"] != q


def test_get_embedding_rejects_blank(engine):
    with pytest.raises(ValueError):
        engine.get_embedding("   ")


def test_batch_preserves_order(engine):
    texts = ["alpha", "beta", "gamma"]
    out = engine.get_embeddings_batch(texts)
    assert out["count"] == 3
    singles = [engine.get_embedding(t)["embedding"] for t in texts]
    assert [r["embedding"] for r in out["results"]] == singles


def test_similarity_symmetric_and_self(engine):
    ab = engine.calculate_similarity("same text", "other text")
    ba = engine.calculate_similarity("other text", "same text")
    assert ab["similarity"] == ba["similarity"]
    self_sim = engine.calculate_similarity("same text", "same text")
    assert self_sim["similarity"] == pytest.approx(1.0, abs=1e-6)


def test_search_scores_duplicates_identically(engine):
    # Docs 1 and 3 have identical text -> identical embeddings -> identical
    # similarity, and the deterministic id tiebreak orders 1 before 3.
    # (The hash embedder has no cross-prefix semantics, so we assert the
    # ranking contract, not relevance.)
    out = engine.search("How do I cancel my booking? : Use the portal.",
                        top_k=4)
    assert out["total_documents"] == 4
    assert out["result_count"] == 4
    by_id = {r["id"]: r["similarity"] for r in out["results"]}
    assert by_id[1] == by_id[3]
    pos = [r["id"] for r in out["results"]]
    assert pos.index(1) + 1 == pos.index(3)


def test_search_validates_topk(engine):
    with pytest.raises(ValueError):
        engine.search("x", top_k=51)


def test_search_threshold_subset(engine):
    full = engine.search("refund policy", top_k=4)
    thr = engine.search("refund policy", top_k=4, threshold=0.5)
    full_ids = [r["id"] for r in full["results"]]
    thr_ids = [r["id"] for r in thr["results"]]
    assert set(thr_ids) <= set(full_ids)
    assert all(r["similarity"] >= 0.5 for r in thr["results"])


def test_list_documents_projection_toggle(engine):
    with_e = engine.list_documents(include_embeddings=True)
    without = engine.list_documents()
    assert [d["id"] for d in without["documents"]] == [1, 2, 3, 4]
    assert "embedding" in with_e["documents"][0]
    assert "embedding" not in without["documents"][0]


def test_search_method_selection(spark):
    """Every ANN method plugs into the same search call. With a semantic
    (lexical-overlap) embedder, the duplicated cancel-booking docs must
    top the exact ranking, and the candidate-scanning approximations
    (ivf: nprobe covers all 4 cells; pq: rescored shortlist covers the
    corpus) must agree. LSH may legitimately return fewer than k on a
    4-doc corpus (empty probe buckets) — only its ranking is checked."""
    from dotnetvectorsearch_spark.embeddings import HashedProjectionEmbedder
    raw = spark.createDataFrame(
        [(1, "How do I cancel my booking?", "Use the portal."),
         (2, "What is the refund policy?", "Refunds within 30 days."),
         (3, "How do I cancel my booking?", "Use the portal."),
         (4, "Where is check-in?", "Front desk, level 1.")],
        "id long, question string, answer string")
    emb = HashedProjectionEmbedder(dim=32)
    eng = VectorSearchEngine(spark, prepare_documents(raw, emb), emb)

    brute = eng.search("cancel my booking", top_k=2)
    assert brute["method"] == "brute"
    assert {r["id"] for r in brute["results"]} == {1, 3}
    for method in ("ivf", "pq", "ivfpq"):
        out = eng.search("cancel my booking", top_k=2, method=method)
        assert out["method"] == method
        assert {r["id"] for r in out["results"]} == {1, 3}, method
    lsh = eng.search("cancel my booking", top_k=2, method="lsh")
    hit_ids = {r["id"] for r in lsh["results"]}
    assert hit_ids <= {1, 2, 3, 4} and len(hit_ids) <= 2


def test_search_unknown_method_rejected(engine):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown search method"):
        engine.search("anything", method="hnsw")
