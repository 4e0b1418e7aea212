"""Scale smoke: the flagship search path on a 1M-vector synthetic corpus
generated JVM-side (no fixture IO, no Python in the hot path). Verifies
the plan stays TakeOrderedAndProject + broadcast and that exact top-k
finds the planted self-match — the property that must hold at any N."""

from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.search import top_k_similar

N = 1_000_000
DIM = 16
TARGET = 123_457


def _corpus(spark):
    # hash-based components: no structural near-duplicates (a sin(id*i)
    # generator creates near-parallel vectors every ~710 ids)
    return spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (F.xxhash64(F.col("id"), i) % 997).cast("float"))
        .alias("embedding"))


def test_search_1m_vectors_exact_topk(spark):
    emb = _corpus(spark)
    q = (emb.filter(F.col("vec_id") == TARGET)
         .select(F.col("embedding").alias("query_embedding")))
    res = top_k_similar(emb, q, top_k=5, id_col="vec_id", round_digits=6)
    plan = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    rows = res.collect()
    assert rows[0].vec_id == TARGET
    assert abs(rows[0].similarity - 1.0) < 1e-6
    assert rows[1].similarity < 0.999        # random vectors: no near-dups
    assert len(rows) == 5


def test_connected_components_300k_chain_clusters(spark):
    # 50k chains of 6 nodes each (chains, not stars: forces pointer
    # jumping to do real work). At 100x this is the same plan with more
    # partitions — per-round shuffle is linear in |E|.
    from pyspark.sql import functions as F
    from dotnetvectorsearch_spark.operators.dedup import connected_components
    edges = (spark.range(0, 300_000, 1, 16)
             .filter((F.col("id") % 6) != 5)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b")))
    comp = connected_components(edges)
    agg = comp.agg(
        F.countDistinct("component").alias("n_comp"),
        F.sum(F.when(F.col("component")
                     == (F.col("node") - F.col("node") % 6), 0)
              .otherwise(1)).alias("n_wrong")).collect()[0]
    assert agg.n_comp == 50_000
    assert agg.n_wrong == 0
