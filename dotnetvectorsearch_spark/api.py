"""Engine facade with the reference's full request surface.

One method per reference HTTP endpoint (``WebAPI/Program.cs:78-304``), so a
user of the reference can switch by calling these instead of the REST API.
The HTTP layer itself is out of engine scope (SURVEY.md §2.1 S8) — any
driver-side web framework can wrap this class 1:1.

Endpoint -> method map (semantics notes cite the reference):

- ``GET  /health``               -> :meth:`health`
- ``POST /api/embeddings``       -> :meth:`get_embedding` — RAW text, no
  task prefix (``VectorSearchService.cs:37``)
- ``POST /api/embeddings/batch`` -> :meth:`get_embeddings_batch` — raw text
  (``:67``); the reference's Task.WhenAll fan-out becomes one Spark job
- ``POST /api/similarity``       -> :meth:`calculate_similarity` — BOTH
  sides get the ``"query: "`` prefix (``:103-104``)
- ``POST /api/search``           -> :meth:`search` — query side gets
  ``"query: "`` (``:183``); brute-force cosine, sort desc (id tiebreak),
  top-k 1-50 default 5 (``ApiModels.cs:67-68``); ``threshold`` honors the
  README-declared-but-unimplemented filter (README.md:130-140)
- ``GET  /api/documents``        -> :meth:`list_documents` — ORDER BY id
  with the include-embeddings projection toggle (``:131-171``)

The corpus DataFrame is cached on construction: the reference re-scans
SQLite and re-JSON-parses every vector per request
(``VectorSearchService.cs:142-161``); decoding once and serving from the
cached columnar frame strictly dominates that design.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.embeddings.base import EmbeddingBackend
from dotnetvectorsearch_spark.functions.text import QUERY_PREFIX
from dotnetvectorsearch_spark.functions.vector import cosine_similarity
from dotnetvectorsearch_spark.operators.search import (
    MAX_TOP_K,
    ordered_listing,
    top_k_similar,
    validate_top_k,
)


class VectorSearchEngine:
    """Batch/offline serving facade over a prepared documents corpus."""

    def __init__(self, spark: SparkSession, corpus: DataFrame,
                 embedder: EmbeddingBackend, id_col: str = "id",
                 cache: bool = True):
        self.spark = spark
        self.corpus = corpus.cache() if cache else corpus
        self.embedder = embedder
        self.id_col = id_col

    # ----------------------------------------------------------- embeddings

    def _embed_texts(self, texts: list[str], prefix: str = "") -> list[list[float]]:
        """One Spark job embedding all texts (replaces Task.WhenAll of
        batch-1 inferences, EmbeddingService.cs:26-30)."""
        for t in texts:
            if t is None or not t.strip():
                raise ValueError("Text cannot be null or empty")
        from dotnetvectorsearch_spark.localdf import local_df
        df = local_df(self.spark,
                      [(i, prefix + t) for i, t in enumerate(texts)],
                      "i long, t string")
        rows = (df.withColumn("e", self.embedder.embed_column("t"))
                .select("i", "e").collect())
        by_i = {r.i: list(r.e) for r in rows}
        return [by_i[i] for i in range(len(texts))]

    def get_embedding(self, text: str) -> dict[str, Any]:
        """POST /api/embeddings — raw text, no prefix."""
        vec = self._embed_texts([text])[0]
        return {"text": text, "embedding": vec, "dimensions": len(vec)}

    def get_embeddings_batch(self, texts: list[str]) -> dict[str, Any]:
        """POST /api/embeddings/batch."""
        vecs = self._embed_texts(texts)
        return {
            "results": [
                {"text": t, "embedding": v, "dimensions": len(v)}
                for t, v in zip(texts, vecs)
            ],
            "count": len(vecs),
        }

    # ----------------------------------------------------------- similarity

    def calculate_similarity(self, text1: str, text2: str,
                             include_embeddings: bool = False) -> dict[str, Any]:
        """POST /api/similarity — symmetric 'query: ' prefixes."""
        e1, e2 = self._embed_texts([text1, text2], prefix=QUERY_PREFIX)
        from dotnetvectorsearch_spark.localdf import local_df
        pair = local_df(self.spark, [(e1, e2)],
                        "a array<float>, b array<float>")
        sim = pair.select(
            F.round(cosine_similarity("a", "b"), 6).alias("s")).first().s
        out: dict[str, Any] = {"text1": text1, "text2": text2,
                               "similarity": float(sim)}
        if include_embeddings:
            out["embedding1"], out["embedding2"] = e1, e2
        return out

    # --------------------------------------------------------------- search

    def search(self, query_text: str, top_k: int = 5,
               include_embeddings: bool = False,
               threshold: float | None = None,
               method: str = "brute") -> dict[str, Any]:
        """POST /api/search — cosine top-k over the corpus.

        ``method`` selects the physical strategy (reference parity is
        ``"brute"``; the rest are the beyond-reference scale paths):
        ``"brute"`` exact scan, ``"ivf"`` partition-pruned nprobe search,
        ``"lsh"`` multi-probe hyperplane buckets, ``"pq"`` ADC over
        compressed codes + exact rescore, ``"ivfpq"`` the composed
        three-stage funnel (probe pruning x ADC x rescore). ANN indexes
        are built lazily on first use and cached on the engine
        (build-time artifacts)."""
        validate_top_k(top_k)
        qvec = self._embed_texts([query_text], prefix=QUERY_PREFIX)[0]
        if method == "brute":
            from dotnetvectorsearch_spark.localdf import local_df
            query = local_df(self.spark, [(qvec,)],
                             "query_embedding array<float>")
            hits_df = top_k_similar(
                self.corpus, query, top_k=top_k, id_col=self.id_col,
                threshold=threshold, include_embeddings=include_embeddings,
                round_digits=6)
        else:
            hits_df = self._ann_search(method, qvec, top_k)
            if threshold is not None:
                score = ("similarity" if "similarity" in hits_df.columns
                         else "approx_similarity")
                hits_df = hits_df.filter(F.col(score) >= threshold)
        hits = hits_df.collect()
        total = self.corpus.count()
        return {
            "query": query_text,
            "results": [r.asDict() for r in hits],
            "result_count": len(hits),
            "total_documents": total,
            "method": method,
        }

    def _ann_search(self, method: str, qvec: list[float], top_k: int):
        from dotnetvectorsearch_spark.operators.ann import (
            HyperplaneLSH,
            IVFIndex,
            PQIndex,
        )
        if not hasattr(self, "_ann"):
            self._ann: dict[str, Any] = {}
        vecs = self.corpus.select(self.id_col, "embedding")
        if method == "ivf":
            if "ivf" not in self._ann:
                idx = IVFIndex(n_cells=16, nprobe=4).fit(vecs)
                self._ann["ivf"] = (idx, idx.transform(vecs).persist())
            idx, indexed = self._ann["ivf"]
            return idx.search(indexed, qvec, top_k, id_col=self.id_col)
        if method == "lsh":
            if "lsh" not in self._ann:
                idx = HyperplaneLSH(num_planes=12).fit(dim=len(qvec))
                self._ann["lsh"] = (idx, idx.transform(vecs).persist())
            idx, bucketed = self._ann["lsh"]
            return idx.search(bucketed, qvec, top_k, id_col=self.id_col)
        if method == "pq":
            if "pq" not in self._ann:
                idx = PQIndex(m=16, n_codes=64).fit(vecs)
                self._ann["pq"] = (idx, idx.transform(vecs).persist())
            idx, encoded = self._ann["pq"]
            return idx.search(encoded, qvec, top_k, id_col=self.id_col,
                              rescore=vecs, shortlist=max(10 * top_k, 50))
        if method == "ivfpq":
            from dotnetvectorsearch_spark.operators.ann import IVFPQIndex
            if "ivfpq" not in self._ann:
                idx = IVFPQIndex(n_cells=16, nprobe=4, m=16,
                                 n_codes=64).fit(vecs)
                self._ann["ivfpq"] = (idx, idx.transform(vecs).persist())
            idx, indexed = self._ann["ivfpq"]
            return idx.search(indexed, qvec, top_k, id_col=self.id_col,
                              rescore=vecs, shortlist=max(10 * top_k, 50))
        raise ValueError(f"unknown search method: {method!r}")

    # ------------------------------------------------------------ documents

    def list_documents(self, include_embeddings: bool = False) -> dict[str, Any]:
        """GET /api/documents — full listing ORDER BY id."""
        rows = ordered_listing(self.corpus, id_col=self.id_col,
                               include_embeddings=include_embeddings).collect()
        return {"documents": [r.asDict() for r in rows], "count": len(rows)}

    # ---------------------------------------------------------------- misc

    def health(self) -> dict[str, Any]:
        """GET /health."""
        return {
            "status": "healthy",
            "embedding_dimensions": self.embedder.dim,
            "total_documents": self.corpus.count(),
            "max_top_k": MAX_TOP_K,
        }
