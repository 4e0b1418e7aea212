from dotnetvectorsearch_spark.embeddings.base import EmbeddingBackend  # noqa: F401
from dotnetvectorsearch_spark.embeddings.deterministic import (  # noqa: F401
    DeterministicEmbedder,
)
