"""Unit + property tests for the vector expression library.

Covers the reference-parity edge cases (SURVEY.md §5.3-5.4): the 1e-12
normalize pass-through, the cosine zero-guard, bounds/symmetry properties,
and dimension-mismatch detection.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.functions import vector as V


def _one(df):
    return df.collect()[0][0]


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        Row(a=[3.0, 4.0], b=[4.0, 3.0]),
    ]
    return spark.createDataFrame(rows, "a array<float>, b array<float>")


def test_l2_norm(spark, vec_df):
    assert _one(vec_df.select(V.l2_norm("a"))) == pytest.approx(5.0)


def test_dot(spark, vec_df):
    assert _one(vec_df.select(V.dot("a", "b"))) == pytest.approx(24.0)


def test_cosine(spark, vec_df):
    assert _one(vec_df.select(V.cosine_similarity("a", "b"))) == pytest.approx(
        24.0 / 25.0)


def test_cosine_self_is_one(spark, vec_df):
    assert _one(vec_df.select(V.cosine_similarity("a", "a"))) == pytest.approx(1.0)


def test_cosine_symmetry(spark, vec_df):
    ab = _one(vec_df.select(V.cosine_similarity("a", "b")))
    ba = _one(vec_df.select(V.cosine_similarity("b", "a")))
    assert ab == ba


def test_cosine_zero_guard(spark):
    """Reference VectorSearchService.cs:238-239 — zero magnitude -> 0.0."""
    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 0.0])],
                               "a array<float>, b array<float>")
    assert _one(df.select(V.cosine_similarity("a", "b"))) == 0.0


def test_normalize_unit_norm(spark, vec_df):
    out = _one(vec_df.select(V.l2_normalize("a")))
    assert math.isclose(sum(x * x for x in out) ** 0.5, 1.0, rel_tol=1e-6)
    assert out[0] == pytest.approx(0.6)


def test_normalize_epsilon_passthrough(spark):
    """Reference E5MultilingualEmbeddings.cs:177 — norm <= 1e-12 passes the
    vector through UNnormalized."""
    tiny = [1e-20, 0.0]
    df = spark.createDataFrame([Row(a=tiny)], "a array<float>")
    out = _one(df.select(V.l2_normalize("a")))
    assert list(out) == pytest.approx(tiny)


def test_normalize_idempotent(spark, vec_df):
    once = vec_df.select(V.l2_normalize("a").alias("n"))
    twice = once.select(V.l2_normalize("n"))
    assert list(_one(twice)) == pytest.approx(list(_one(once)), rel=1e-6)


def test_dims_match_guard(spark):
    df = spark.createDataFrame([Row(a=[1.0, 2.0], b=[1.0])],
                               "a array<float>, b array<float>")
    assert _one(df.select(V.dims_match("a", "b"))) is False
    with pytest.raises(Exception, match="same dimensions"):
        df.select(V.assert_dims_match("a", "b")).collect()


def test_sql_macros(spark):
    V.register_sql_functions(spark)
    row = spark.sql(
        "SELECT vs_dot(array(3.0F, 4.0F), array(4.0F, 3.0F)) AS d, "
        "vs_l2norm(array(3.0F, 4.0F)) AS n, "
        "vs_cosine(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS c"
    ).collect()[0]
    assert row.d == pytest.approx(24.0)
    assert row.n == pytest.approx(5.0)
    assert row.c == pytest.approx(1.0)


def test_quantize_roundtrip_fidelity(spark, sf_dir):
    """int8 quantization keeps cosine(original, dequantized) >= 0.999 and
    all codes within [-127, 127]."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.withColumn("scale", V.quantize_scale("embedding"))
    emb = emb.withColumn("q", V.quantize_int8("embedding", F.col("scale")))
    emb = emb.withColumn("deq", V.dequantize("q", F.col("scale")))
    stats = emb.select(
        F.min(V.cosine_similarity("embedding", "deq")).alias("min_cos"),
        F.max(F.array_max("q")).alias("max_q"),
        F.min(F.array_min("q")).alias("min_q")).collect()[0]
    assert stats.min_cos >= 0.999
    assert -127 <= stats.min_q and stats.max_q <= 127


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], "v array<float>")
    df = df.withColumn("scale", V.quantize_scale("v"))
    df = df.withColumn("q", V.quantize_int8("v", F.col("scale")))
    r = df.withColumn("deq", V.dequantize("q", F.col("scale"))).collect()[0]
    assert r.scale == 0.0 and r.q == [0, 0, 0] and r.deq == [0.0, 0.0, 0.0]


# ------------------------------------------------------- sign-bit packing

def test_pack_signs_bit_layout(spark):
    # 40-d vector -> 2 words; component j sets bit (j % 32) of word j//32.
    vec = [1.0 if j in (0, 5, 31, 32, 39) else -1.0 for j in range(40)]
    df = spark.createDataFrame([Row(v=vec)], "v array<float>")
    words = _one(df.select(V.pack_signs("v")))
    assert len(words) == 2
    assert words[0] == (1 << 0) | (1 << 5) | (1 << 31)
    assert words[1] == (1 << 0) | (1 << 7)


def test_pack_signs_zero_and_negative_are_unset(spark):
    df = spark.createDataFrame([Row(v=[0.0, -2.0, 3.0])], "v array<float>")
    assert _one(df.select(V.pack_signs("v"))) == [1 << 2]


def test_hamming_distance_counts_sign_flips(spark):
    rows = [Row(a=[1.0, -1.0, 1.0, -1.0], b=[1.0, 1.0, -1.0, -1.0])]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    packed = df.select(V.pack_signs("a").alias("pa"),
                       V.pack_signs("b").alias("pb"))
    assert _one(packed.select(V.hamming_distance("pa", "pb"))) == 2
    assert _one(packed.select(V.hamming_distance("pa", "pa"))) == 0


def test_hamming_matches_numpy_on_corpus(spark, sf_dir):
    import numpy as np

    from dotnetvectorsearch_spark.sources.io import load_table
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = emb.select("vec_id", "embedding").collect()
    q = np.asarray(rows[0].embedding) > 0
    packed = emb.select("vec_id", V.pack_signs("embedding").alias("c"))
    qdf = (emb.filter(F.col("vec_id") == rows[0].vec_id)
           .select(V.pack_signs("embedding").alias("qc")))
    got = {r.vec_id: r.h for r in packed.crossJoin(qdf).select(
        "vec_id", V.hamming_distance("c", "qc").alias("h")).collect()}
    for r in rows:
        expect = int(np.sum((np.asarray(r.embedding) > 0) != q))
        assert got[r.vec_id] == expect


def test_matryoshka_truncate_slices_and_renormalizes(spark, sf_dir):
    from dotnetvectorsearch_spark.functions.vector import (
        l2_norm,
        matryoshka_truncate,
    )
    from dotnetvectorsearch_spark.sources.io import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    t = emb.select(
        F.size(matryoshka_truncate("embedding", 16)).alias("d"),
        l2_norm(matryoshka_truncate("embedding", 16, renormalize=True))
        .alias("n"))
    rows = t.collect()
    assert all(r.d == 16 for r in rows)
    assert all(abs(r.n - 1.0) < 1e-5 for r in rows)


def test_matryoshka_ranking_invariant_under_renormalize(spark, sf_dir):
    # cosine is scale-invariant: ranking on the raw slice equals ranking
    # on the renormalized slice
    from dotnetvectorsearch_spark.functions.vector import (
        cosine_similarity,
        matryoshka_truncate,
    )
    from dotnetvectorsearch_spark.sources.io import load_table
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"))
    for renorm in (False, True):
        s = (emb.crossJoin(F.broadcast(q))
             .select("vec_id", cosine_similarity(
                 matryoshka_truncate("embedding", 16, renormalize=renorm),
                 matryoshka_truncate("qv", 16, renormalize=renorm))
                 .alias("sim"))
             .orderBy(F.desc("sim"), F.asc("vec_id")).limit(10))
        ids = [r.vec_id for r in s.collect()]
        if renorm:
            assert ids == base_ids
        else:
            base_ids = ids
