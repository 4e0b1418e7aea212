"""Approximate nearest-neighbor search over embedding columns.

Three physical strategies with one logical contract (top-k by cosine):

- **Brute force** (`brute_force_topk`): the exact baseline — broadcast
  query + full scan + per-partition heap top-k (TakeOrderedAndProject).
  O(N*d) but embarrassingly parallel; correct at any scale, optimal up to
  ~10^8 rows (SURVEY.md §4 scale analysis).
- **IVF** (`IVFIndex`): k-means cells trained on a driver-side sample
  (centroid quality needs only a sample — at 100 TB you train on
  ~10^5-10^6 sampled vectors, never the corpus). Corpus assignment is one
  narrow Arrow-batched matmul; the index is written
  ``partitionBy("cell")`` so a query's `nprobe` cells become *partition
  pruning* at the Parquet scan — the physical win: a 64-cell index with
  nprobe=4 reads ~6% of the corpus per query.
- **Random-hyperplane LSH** (`HyperplaneLSH`): sign-bit buckets; queries
  probe the exact bucket plus hamming-1 neighbors (multi-probe) and
  brute-force inside.

The assignment step is the one deliberate Python hop (vectorized numpy
matmul over Arrow batches) — at 384-d a literal-expression dot product per
centroid would blow up the Catalyst expression tree; a batched matmul is
both faster and cleaner. Everything after assignment is built-in exprs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dotnetvectorsearch_spark.operators.search import top_k_similar


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    spark = emb.sparkSession
    q = spark.createDataFrame([([float(x) for x in query_vec],)],
                              f"query_embedding array<float>")
    return top_k_similar(emb.select(id_col, vec_col), q, top_k=k,
                         id_col=id_col, doc_vec=vec_col, round_digits=6)


def _kmeans_fit(sample: np.ndarray, n_cells: int, seed: int,
                iters: int = 15) -> np.ndarray:
    """Seeded k-means++ on a driver-side sample; unit-normalized centroids
    (so cell assignment by max dot == max cosine)."""
    rng = np.random.RandomState(seed)
    x = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n = len(x)
    centroids = [x[rng.randint(n)]]
    for _ in range(1, n_cells):
        d2 = np.min(
            [np.sum((x - c) ** 2, axis=1) for c in centroids], axis=0)
        probs = d2 / max(d2.sum(), 1e-12)
        centroids.append(x[rng.choice(n, p=probs)])
    cent = np.stack(centroids)
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_cells):
            mask = assign == c
            if mask.any():
                m = x[mask].mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent.astype(np.float32)


class IVFIndex:
    """Inverted-file ANN index: k-means cells + partition-pruned probe."""

    def __init__(self, n_cells: int = 64, nprobe: int = 4, seed: int = 42):
        self.n_cells = n_cells
        self.nprobe = nprobe
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, emb: DataFrame, vec_col: str = "embedding",
            max_sample: int = 100_000) -> IVFIndex:
        n = emb.count()
        fraction = min(1.0, max_sample / max(n, 1))
        sample = (emb.sample(fraction=fraction, seed=self.seed)
                  .select(vec_col).toPandas()[vec_col])
        self.centroids = _kmeans_fit(
            np.stack(sample.to_numpy()), self.n_cells, self.seed)
        return self

    def assign_udf(self):
        cent = self.centroids

        @pandas_udf("int")
        def cell_of(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy()).astype(np.float32)
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax((m / norms) @ cent.T, axis=1)
                             .astype(np.int32))

        return cell_of

    def transform(self, emb: DataFrame, vec_col: str = "embedding",
                  out: str = "cell") -> DataFrame:
        """Attach the cell id — a narrow (shuffle-free) Arrow-batched matmul."""
        return emb.withColumn(out, self.assign_udf()(F.col(vec_col)))

    def write(self, emb: DataFrame, path: str,
              vec_col: str = "embedding") -> None:
        """Materialize the index partitioned by cell: a query's probe set
        becomes Parquet partition pruning (reads nprobe/n_cells of data)."""
        self.transform(emb, vec_col).write.mode("overwrite") \
            .partitionBy("cell").parquet(path)

    def probe_cells(self, query_vec: list[float]) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float32)
        q = q / max(np.linalg.norm(q), 1e-12)
        scores = self.centroids @ q
        return [int(i) for i in np.argsort(-scores)[: self.nprobe]]

    def search(self, indexed: DataFrame, query_vec: list[float], k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cell_col: str = "cell") -> DataFrame:
        """Top-k within the nprobe best cells. On a partitionBy(cell) index
        the isin() filter prunes partitions before the scan."""
        cells = self.probe_cells(query_vec)
        cand = indexed.filter(F.col(cell_col).isin(cells))
        return brute_force_topk(cand, query_vec, k, id_col, vec_col)


class HyperplaneLSH:
    """Sign-random-projection LSH: bucket = bit pattern of sign(V @ planes)."""

    def __init__(self, num_planes: int = 12, seed: int = 42):
        self.num_planes = num_planes
        self.seed = seed
        self.planes: np.ndarray | None = None

    def fit(self, dim: int) -> HyperplaneLSH:
        rng = np.random.RandomState(self.seed)
        planes = rng.standard_normal((self.num_planes, dim))
        self.planes = (planes / np.linalg.norm(planes, axis=1, keepdims=True)
                       ).astype(np.float32)
        return self

    def bucket_udf(self):
        planes = self.planes
        weights = (1 << np.arange(self.num_planes)).astype(np.int64)

        @pandas_udf("long")
        def bucket_of(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy()).astype(np.float32)
            bits = (m @ planes.T) > 0
            return pd.Series(bits @ weights)

        return bucket_of

    def transform(self, emb: DataFrame, vec_col: str = "embedding",
                  out: str = "bucket") -> DataFrame:
        return emb.withColumn(out, self.bucket_udf()(F.col(vec_col)))

    def probe_buckets(self, query_vec: list[float],
                      multiprobe_bits: int = 1) -> list[int]:
        """Exact bucket + all buckets within `multiprobe_bits` bit flips."""
        q = np.asarray(query_vec, dtype=np.float32)
        bits = (self.planes @ q) > 0
        base = int((1 << np.arange(self.num_planes))[bits].sum())
        buckets = {base}
        if multiprobe_bits >= 1:
            for i in range(self.num_planes):
                buckets.add(base ^ (1 << i))
        if multiprobe_bits >= 2:
            for i in range(self.num_planes):
                for j in range(i + 1, self.num_planes):
                    buckets.add(base ^ (1 << i) ^ (1 << j))
        return sorted(buckets)

    def search(self, bucketed: DataFrame, query_vec: list[float], k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               bucket_col: str = "bucket",
               multiprobe_bits: int = 1) -> DataFrame:
        cand = bucketed.filter(
            F.col(bucket_col).isin(self.probe_buckets(query_vec,
                                                      multiprobe_bits)))
        return brute_force_topk(cand, query_vec, k, id_col, vec_col)
