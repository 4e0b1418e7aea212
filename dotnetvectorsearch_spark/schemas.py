"""Explicit schemas for every table the engine reads or writes.

The engine never uses ``inferSchema`` — schemas are fixed/explicit, matching
the reference's statically-declared model (DDL at reference
``DotNetVectorSearch.Prepare/Program.cs:92-106``, C# POCOs at
``WebAPI/Services/VectorSearchService.cs:274-299``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Default embedding dimensionality. The reference uses 384
# (intfloat/multilingual-e5-small, reference WebAPI/Program.cs:121); the
# driver's synthetic `embeddings` table uses 64. Dim is data-driven
# everywhere; this constant is only a default for generators.
DEFAULT_EMBEDDING_DIM = 384

# The reference's one persistent table (Prepare/Program.cs:92-106), with the
# JSON-TEXT vector column upgraded to a native array<float>. `id` widened
# int->long for scale.
DOCUMENTS_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("question", StringType(), False),
    StructField("answer", StringType(), False),
    StructField("combined_text", StringType(), False),
    StructField("embedding", ArrayType(FloatType()), False),
    StructField("embedding_dimensions", IntegerType(), False),
    StructField("created_at", TimestampType(), False),
])

# Raw CSV input schema: header `id,question,answer`
# (reference Prepare/dataset.csv:1, positional bind Prepare/Program.cs:45-50).
RAW_CSV_SCHEMA = StructType([
    StructField("id", LongType(), True),
    StructField("question", StringType(), True),
    StructField("answer", StringType(), True),
])

# Multimodal asset table (beyond-reference): opaque binary payload + typed
# metadata. Decode/feature-extraction runs as Arrow-batched mapInPandas.
from pyspark.sql.types import BinaryType, MapType  # noqa: E402

MEDIA_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("mime_type", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])
