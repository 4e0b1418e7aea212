"""Persisted ANN index store: build-once / serve-many.

The in-registry ANN queries (`ann_ivf_topk`, `ann_pq_topk`,
`ann_ivfpq_topk`) pay their k-means / codebook fit inside the query —
the honest-cold discipline for a one-shot analytic. But the number a
100 TB capacity plan needs is the AMORTIZED serve cost: fit + write
once (an index build job), then every query reads only the persisted
index. The reference has no index at all — it rescans and re-parses
every row per query (`VectorSearchService.cs:142-161,186-196`); this
module is the scale path a switching user gains.

Split measured here:
  * ``ensure_index(spark, sf_dir, kind)`` — the build job. Fits with
    the SAME hyperparameters as the in-registry queries (so serve
    results are bit-identical to the fit-in-query results), writes the
    index via the ``write()`` persistence contract of
    :mod:`dotnetvectorsearch_spark.operators.ann`, and stamps a
    fingerprint of the input files so a changed corpus triggers a
    rebuild instead of silently serving a stale index.
  * ``serve_topk(spark, sf_dir, kind, qv)`` — the serve path. Reads
    the persisted index (centroids/codebooks are a few KB; the codes
    table is m bytes/row; the IVF variants prune to nprobe/n_cells of
    the partitions BEFORE the scan) and searches. No fit, no full
    float-vector scan.

At 100 TB the build is a scheduled pipeline stage whose cost amortizes
over every query; the serve path's scan volume is
~(nprobe/n_cells) x (m bytes/row) + shortlist float rows — independent
of how the corpus got there. ``bench.py`` reports the two sides
separately (``ann_build_sec`` vs the ``ann_*_serve`` query rows).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table
from .ann import IVFIndex, IVFPQIndex, PQIndex
from .dedup import _input_fingerprint

# Hyperparameters MUST stay in lockstep with the fit-in-query registry
# entries (_q_ann_ivf_topk / _fitted_pq / _fitted_ivfpq in
# __spark_entry__.py): the serve-path tests pin serve == fit-in-query
# results, which holds only because the seeded fit is deterministic for
# identical (params, sample).
INDEX_PARAMS: dict[str, dict] = {
    "ivf": {"n_cells": 16, "nprobe": 4, "max_sample": 100_000},
    "pq": {"m": 16, "n_codes": 64, "max_sample": 20_000},
    "ivfpq": {"n_cells": 16, "nprobe": 4, "m": 16, "n_codes": 64,
              "max_sample": 20_000},
}

_MARKER = "_fingerprint.json"


def default_root() -> str:
    """Index store root: $SPARK_GRAFT_INDEX_ROOT or <repo>/.ann_index."""
    env = os.environ.get("SPARK_GRAFT_INDEX_ROOT")
    if env:
        return env
    return str(Path(__file__).resolve().parents[2] / ".ann_index")


def index_path(sf_dir: str, kind: str, root: str | None = None) -> str:
    tag = Path(sf_dir.rstrip("/")).name or "default"
    return str(Path(root or default_root()) / tag / kind)


def _fingerprint(emb: DataFrame, kind: str) -> str:
    """Identity of (input files, index params): any change rebuilds."""
    sig = _input_fingerprint(emb)
    payload = json.dumps(
        {"files": repr(sig), "params": INDEX_PARAMS[kind]}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()


def _is_fresh(path: str, fp: str) -> bool:
    marker = Path(path) / _MARKER
    try:
        return json.loads(marker.read_text())["fingerprint"] == fp
    except (OSError, ValueError, KeyError):
        return False


def _build(spark: SparkSession, emb: DataFrame, kind: str,
           path: str) -> None:
    p = INDEX_PARAMS[kind]
    if kind == "ivf":
        idx = IVFIndex(n_cells=p["n_cells"], nprobe=p["nprobe"]).fit(
            emb, max_sample=p["max_sample"])
        idx.write(emb, path)
    elif kind == "pq":
        idx = PQIndex(m=p["m"], n_codes=p["n_codes"]).fit(
            emb, max_sample=p["max_sample"])
        idx.write(emb, path)
    elif kind == "ivfpq":
        idx = IVFPQIndex(n_cells=p["n_cells"], nprobe=p["nprobe"],
                         m=p["m"], n_codes=p["n_codes"]).fit(
            emb, max_sample=p["max_sample"])
        idx.write(emb, path)
    else:
        raise ValueError(f"unknown index kind {kind!r}; "
                         f"expected one of {sorted(INDEX_PARAMS)}")


def ensure_index(spark: SparkSession, sf_dir: str, kind: str,
                 root: str | None = None,
                 force: bool = False) -> tuple[str, bool]:
    """Build the persisted ``kind`` index for ``sf_dir`` iff missing or
    stale (input files or params changed). Returns (path, built)."""
    if kind not in INDEX_PARAMS:
        raise ValueError(f"unknown index kind {kind!r}; "
                         f"expected one of {sorted(INDEX_PARAMS)}")
    emb = load_table(spark, sf_dir, "embeddings")
    fp = _fingerprint(emb, kind)
    path = index_path(sf_dir, kind, root)
    if not force and _is_fresh(path, fp):
        return path, False
    _build(spark, emb, kind, path)
    # Stamp AFTER a successful write: a failed build leaves no marker,
    # so the next ensure_index retries instead of serving half an index.
    (Path(path) / _MARKER).write_text(json.dumps(
        {"fingerprint": fp, "kind": kind, "params": INDEX_PARAMS[kind]}))
    return path, True


def serve_topk(spark: SparkSession, sf_dir: str, kind: str,
               query_vec: list[float], k: int = 10,
               shortlist: int = 200,
               root: str | None = None) -> DataFrame:
    """Search the PERSISTED index — the amortized serve path.

    Reads trained state + codes/cells from disk; for pq/ivfpq the
    float-vector table is touched only for the broadcast-semi-join
    rescore of the ``shortlist`` ids. Builds the index first iff it is
    missing or stale (idempotent; a fresh store makes this a no-op)."""
    path, _ = ensure_index(spark, sf_dir, kind, root)
    if kind == "ivf":
        idx, rows = IVFIndex.read(spark, path)
        return idx.search(rows, query_vec, k=k)
    emb = load_table(spark, sf_dir, "embeddings")
    if kind == "pq":
        idx, codes = PQIndex.read(spark, path)
        return idx.search(codes, query_vec, k, rescore=emb,
                          shortlist=shortlist)
    idx, rows = IVFPQIndex.read(spark, path)
    return idx.search(rows, query_vec, k, rescore=emb,
                      shortlist=shortlist)
