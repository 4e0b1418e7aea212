"""dotnetvectorsearch_spark — a PySpark-native vector-search / analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system PatrickChoDev/DotNetVectorSearch (a .NET semantic
vector-search stack: E5 embeddings -> SQLite store -> brute-force cosine
top-k), re-expressed Spark-first:

- the reference's *semantic contract* (embed -> L2-normalize -> cosine ->
  top-k, asymmetric "query: "/"passage: " prefixes, the ``documents``
  schema) is preserved exactly;
- its *architecture* (per-request SQLite rescans, row-at-a-time loops,
  JSON-text vectors) is replaced with columnar Parquet, cached decoded
  corpora, Catalyst-optimized declarative plans, and distributed top-k
  (``TakeOrderedAndProject``);
- large-scale training-data-pipeline operators (dedup, ANN search, text
  analysis, multimodal plumbing) are added as first-class components.

All vector/text math in the hot path is built from Spark SQL higher-order
functions (``aggregate``/``zip_with``/``transform``) so it stays JVM-side
inside whole-stage codegen; Python appears only in embedding UDFs (Arrow
batched) and multimodal decode stubs.
"""

from dotnetvectorsearch_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
