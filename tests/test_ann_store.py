"""Build-once / serve-many ANN index store (operators/ann_store.py).

Pins the serve contract: serving a PERSISTED index returns the same
top-k as the fit-in-query path (deterministic seeded fit), a fresh
store is a no-op, and a changed corpus or params fingerprint triggers
a rebuild instead of silently serving a stale index."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from dotnetvectorsearch_spark.operators import ann_store
from dotnetvectorsearch_spark.operators.ann import (
    IVFIndex, IVFPQIndex, PQIndex)
from dotnetvectorsearch_spark.sources.io import load_table


@pytest.fixture(scope="module")
def store_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ann_index"))


@pytest.fixture(scope="module")
def qv(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter("vec_id = 0").collect()[0].embedding


def _ids(df):
    return [r.vec_id for r in df.collect()]


def test_build_then_noop(spark, sf_dir, store_root):
    path, built = ann_store.ensure_index(spark, sf_dir, "ivf",
                                         root=store_root)
    assert built
    assert (Path(path) / "_fingerprint.json").exists()
    path2, built2 = ann_store.ensure_index(spark, sf_dir, "ivf",
                                           root=store_root)
    assert path2 == path and not built2


def test_stale_marker_rebuilds(spark, sf_dir, store_root):
    path, _ = ann_store.ensure_index(spark, sf_dir, "ivf",
                                     root=store_root)
    marker = Path(path) / "_fingerprint.json"
    stamp = json.loads(marker.read_text())
    stamp["fingerprint"] = "deadbeef"
    marker.write_text(json.dumps(stamp))
    _, built = ann_store.ensure_index(spark, sf_dir, "ivf",
                                      root=store_root)
    assert built  # fingerprint mismatch -> rebuild


def test_unknown_kind_raises(spark, sf_dir, store_root):
    with pytest.raises(ValueError, match="unknown index kind"):
        ann_store.ensure_index(spark, sf_dir, "hnsw", root=store_root)


def test_serve_ivf_matches_fit_in_query(spark, sf_dir, store_root, qv):
    emb = load_table(spark, sf_dir, "embeddings")
    p = ann_store.INDEX_PARAMS["ivf"]
    fresh = IVFIndex(n_cells=p["n_cells"], nprobe=p["nprobe"]).fit(
        emb, max_sample=p["max_sample"])
    expect = _ids(fresh.search(fresh.transform(emb), qv, k=10))
    got = _ids(ann_store.serve_topk(spark, sf_dir, "ivf", qv, k=10,
                                    root=store_root))
    assert got == expect and len(got) == 10


def test_serve_pq_matches_fit_in_query(spark, sf_dir, store_root, qv):
    emb = load_table(spark, sf_dir, "embeddings")
    p = ann_store.INDEX_PARAMS["pq"]
    fresh = PQIndex(m=p["m"], n_codes=p["n_codes"]).fit(
        emb, max_sample=p["max_sample"])
    expect = _ids(fresh.search(fresh.transform(emb), qv, 10,
                               rescore=emb, shortlist=200))
    got = _ids(ann_store.serve_topk(spark, sf_dir, "pq", qv, k=10,
                                    shortlist=200, root=store_root))
    assert got == expect and len(got) == 10


def test_serve_ivfpq_matches_fit_in_query(spark, sf_dir, store_root, qv):
    emb = load_table(spark, sf_dir, "embeddings")
    p = ann_store.INDEX_PARAMS["ivfpq"]
    fresh = IVFPQIndex(n_cells=p["n_cells"], nprobe=p["nprobe"],
                       m=p["m"], n_codes=p["n_codes"]).fit(
        emb, max_sample=p["max_sample"])
    expect = _ids(fresh.search(fresh.transform(emb), qv, 10,
                               rescore=emb, shortlist=200))
    got = _ids(ann_store.serve_topk(spark, sf_dir, "ivfpq", qv, k=10,
                                    shortlist=200, root=store_root))
    assert got == expect and len(got) == 10


def test_registry_serve_queries(spark, sf_dir, store_root, monkeypatch):
    """The ann_*_serve registry entries run and agree with their
    fit-in-query cousins at the same (spark, sf_dir)."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_ROOT", store_root)
    import __spark_entry__ as entry
    qs = entry.queries()
    for serve, topk in [("ann_ivf_serve", "ann_ivf_topk"),
                        ("ann_pq_serve", "ann_pq_topk"),
                        ("ann_ivfpq_serve", "ann_ivfpq_topk")]:
        got = _ids(qs[serve](spark, sf_dir))
        expect = _ids(qs[topk](spark, sf_dir))
        assert got == expect, (serve, got, expect)
