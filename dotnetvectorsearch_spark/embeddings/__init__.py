from dotnetvectorsearch_spark.embeddings.base import EmbeddingBackend  # noqa: F401
from dotnetvectorsearch_spark.embeddings.deterministic import (  # noqa: F401
    DeterministicEmbedder,
)
from dotnetvectorsearch_spark.embeddings.hashed_projection import (  # noqa: F401
    HashedProjectionEmbedder,
)
