"""Generate an sf1-equivalent data tier for the scaling curve.

The driver ships sf0.001/0.01/0.1; the 100x-scale claim needs at least
one measured 10x step above the bench tier (VERDICT r3, next-round #1).
This generator synthesizes `documents`, `embeddings`, and `events` —
the only tables the 10 most expensive bench queries read; the TPC-H
queries were already shown flat across sf0.01 -> 0.1 in BASELINE.md —
at an arbitrary multiple of the sf0.1 shape, distribution-matched to
the driver's tables (measured 2026-08, see SCALING.md):

- documents: 31-word vocab (the driver's exact vocab), uniform word
  draw, 10-100 words/doc, lang mix en 41% / zh,es,fr ~15% / de 14%,
  20 uniform sources, ~0.16% exact duplicates (8 per 5000) and 5%
  near-duplicates (a 10%-word-flip perturbation of the previous doc:
  3-shingle survival ~0.9^3 = 0.73 -> jaccard ~0.57, above the 0.5
  verify threshold — matching the driver tiers' measured ~5%
  verified-pair-per-doc density so dedup work scales linearly).
- embeddings: 64-d unit vectors with NO label/cluster structure
  (measured: within-label avg cosine 0.0008 vs across 0.0000), 10
  uniform labels, list<float>, int32 label.
- events: 5 uniform event types over 10x the users (~67 events/user
  preserved), exp(mean 50) values, 30-day Jan-2024 window, JSON props.

Everything derives from xxhash64(column-seeds) — no Python RNG, no
Date.now, fully deterministic and DISTRIBUTED (generation itself is a
Spark job; a 100x tier would generate the same way on a cluster).

Run:  python tools/gen_scale_tier.py [multiple] [outdir]
Defaults: multiple=10 (sf1), outdir=/root/repo/.scaletier/sf1
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from dotnetvectorsearch_spark.session import get_spark

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
LANG_CUTS = [("en", 41), ("zh", 56), ("es", 71), ("fr", 86), ("de", 101)]

BASE_DOCS, BASE_VECS, BASE_EVENTS, BASE_USERS = 5000, 2000, 100_000, 1500


def _h(*cols):
    """Non-negative xxhash64 of the args (mod-ready)."""
    return F.abs(F.xxhash64(*cols))


def gen_documents(spark, n: int):
    df = spark.range(0, n, 1, 64).withColumnRenamed("id", "doc_id")
    # every 625th doc is an EXACT copy of its predecessor, every 20th a
    # 10%-word-flip NEAR copy (disjoint residues: 624 % 20 == 4)
    is_exact = (F.col("doc_id") % 625 == 624) & (F.col("doc_id") > 0)
    is_near = (F.col("doc_id") % 20 == 19) & (F.col("doc_id") > 0)
    base = F.when(is_exact | is_near,
                  F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    df = df.withColumn("__base", base).withColumn("__near", is_near)
    wc = (F.lit(10) + _h(F.col("__base"), F.lit("wc")) % 91)
    df = df.withColumn("__wc", wc)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    # word j of a near-dup re-rolls from the COPY's id on a 1-in-10
    # hash, otherwise from the base id — j is the lambda arg, so
    # per-word hashes don't re-evaluate any captured computed array
    def word(j):
        flip = F.col("__near") & (_h(F.col("doc_id"), j, F.lit("f")) % 10
                                  == 0)
        seed = F.when(flip, F.col("doc_id")).otherwise(F.col("__base"))
        return F.element_at(vocab, (_h(seed, j, F.lit("w"))
                                    % len(VOCAB) + 1).cast("int"))
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.col("__wc")), word), " ")
    df = df.withColumn("text", text)
    lang = F.lit("de")
    pct = _h(F.col("doc_id"), F.lit("lang")) % 100
    for name, cut in reversed(LANG_CUTS[:-1]):
        lang = F.when(pct < cut, F.lit(name)).otherwise(lang)
    return df.select(
        "doc_id", "text", lang.alias("lang"),
        F.concat(F.lit("src"),
                 _h(F.col("doc_id"), F.lit("src")) % 20).alias("source"),
        F.length("text").alias("n_chars"))


# Per-word flip percentages for the planted mid-jaccard tier. A copy
# mutated at per-word rate r keeps ~(1-r)^3 of its word-3-shingles, so
# exact jaccard ~ s/(2-s): the ladder below lands pairs at roughly
# J ~ 0.94 / 0.75 / 0.57 / 0.38 / 0.21 — one pair population per
# TWIN_FIDELITY bucket, including the [0.1,0.9) s-curve region the
# driver tiers leave empty (their dups are all near-identical;
# VERDICT r5 missing #2).
MUTATION_LADDER = [1, 5, 10, 18, 30]


def gen_documents_mutated(spark, n: int):
    """Documents tier with MUTATION-RATE-CONTROLLED duplicates: every
    odd doc is a copy of its predecessor with per-word flip rate drawn
    from ``MUTATION_LADDER`` (hash of the pair, so each rate covers
    ~n/10 pairs). 30-70 words/doc keeps per-pair jaccard concentrated
    near its ladder target. Same schema as the driver's documents
    table; deterministic xxhash64 arithmetic, fully distributed."""
    df = spark.range(0, n, 1, 64).withColumnRenamed("id", "doc_id")
    is_copy = (F.col("doc_id") % 2 == 1)
    base = F.when(is_copy, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    df = df.withColumn("__base", base).withColumn("__copy", is_copy)
    rate = F.element_at(
        F.array(*[F.lit(r) for r in MUTATION_LADDER]),
        (_h(F.col("__base"), F.lit("mr")) % len(MUTATION_LADDER) + 1)
        .cast("int"))
    wc = (F.lit(30) + _h(F.col("__base"), F.lit("wc")) % 41)
    df = df.withColumn("__wc", wc).withColumn("__rate", rate)
    vocab = F.array(*[F.lit(w) for w in VOCAB])

    def word(j):
        flip = F.col("__copy") & (
            _h(F.col("doc_id"), j, F.lit("f")) % 100 < F.col("__rate"))
        seed = F.when(flip, F.col("doc_id")).otherwise(F.col("__base"))
        return F.element_at(vocab, (_h(seed, j, F.lit("w"))
                                    % len(VOCAB) + 1).cast("int"))

    text = F.array_join(
        F.transform(F.sequence(F.lit(1), F.col("__wc")), word), " ")
    df = df.withColumn("text", text)
    return df.select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.concat(F.lit("src"),
                 _h(F.col("doc_id"), F.lit("src")) % 20).alias("source"),
        F.length("text").alias("n_chars"))


def gen_embeddings(spark, n: int, dim: int = 64):
    df = spark.range(0, n, 1, 32).withColumnRenamed("id", "vec_id")
    comps = F.array(*[
        ((_h(F.col("vec_id"), F.lit(j)) % 1_000_000).cast("double")
         / 1_000_000.0 - 0.5)
        for j in range(dim)
    ])
    df = df.withColumn("__raw", comps)
    norm = F.sqrt(F.aggregate("__raw", F.lit(0.0),
                              lambda acc, x: acc + x * x))
    df = df.withColumn("__n", norm)
    unit = F.transform("__raw",
                       lambda x: (x / F.col("__n")).cast("float"))
    return df.select(
        "vec_id", unit.alias("embedding"),
        (_h(F.col("vec_id"), F.lit("lbl")) % 10).cast("int").alias("label"))


def gen_embeddings_clustered(spark, n: int, dim: int = 64,
                             n_clusters: int = 16,
                             noise_amp: float = 0.42):
    """Mixture-of-Gaussians-ish embeddings: vec = centroid(label) +
    uniform noise, L2-normalized. With the defaults, within-cluster
    cosine ~ ||c||^2/(||c||^2+||n||^2) ~ 0.85 and across-cluster ~ 0 —
    the clustered regime where IVF cells capture real neighborhoods and
    LSH recovers near-dup structure (ANN_CURVE.md / TWIN_FIDELITY.md
    honestly flag that the uniform tier undersells both). Same schema
    as the driver's embeddings table; ``label`` IS the planted cluster.
    Deterministic xxhash64 arithmetic, fully distributed (no RNG)."""
    df = spark.range(0, n, 1, 32).withColumnRenamed("id", "vec_id")
    df = df.withColumn(
        "__c", (_h(F.col("vec_id"), F.lit("cl")) % n_clusters).cast("int"))
    comps = F.array(*[
        (((_h(F.col("__c"), F.lit(f"cent{j}")) % 1_000_000)
          .cast("double") / 1_000_000.0 - 0.5)
         + noise_amp * ((_h(F.col("vec_id"), F.lit(f"nz{j}"))
                         % 1_000_000).cast("double") / 1_000_000.0 - 0.5))
        for j in range(dim)
    ])
    df = df.withColumn("__raw", comps)
    norm = F.sqrt(F.aggregate("__raw", F.lit(0.0),
                              lambda acc, x: acc + x * x))
    df = df.withColumn("__n", norm)
    unit = F.transform("__raw",
                       lambda x: (x / F.col("__n")).cast("float"))
    return df.select("vec_id", unit.alias("embedding"),
                     F.col("__c").alias("label"))


def gen_events(spark, n: int, n_users: int):
    df = spark.range(0, n, 1, 64).withColumnRenamed("id", "event_id")
    start_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    span_us = 30 * 86_400 * 1_000_000
    ts = F.timestamp_micros(
        (F.lit(start_us) + _h(F.col("event_id"), F.lit("ts")) % span_us))
    u = ((_h(F.col("event_id"), F.lit("v")) % 1_000_000).cast("double")
         / 1_000_000.0)
    value = F.round(-50.0 * F.log(F.lit(1.0) - u + 1e-9), 2)
    etype = F.element_at(
        F.array(*[F.lit(t) for t in EVENT_TYPES]),
        (_h(F.col("event_id"), F.lit("et")) % 5 + 1).cast("int"))
    return df.select(
        "event_id", ts.alias("ts"),
        (_h(F.col("event_id"), F.lit("u")) % n_users).alias("user_id"),
        etype.alias("event_type"), value.alias("value"),
        F.concat(F.lit('{"k": '),
                 _h(F.col("event_id"), F.lit("k")) % 100,
                 F.lit("}")).alias("props"))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        # clustered-embeddings-only tier (ANN / semdedup evidence):
        #   python tools/gen_scale_tier.py --clustered [n] [outdir]
        n = int(sys.argv[2]) if len(sys.argv) > 2 else BASE_VECS
        out = Path(sys.argv[3]) if len(sys.argv) > 3 else (
            Path(__file__).resolve().parent.parent / ".scaletier"
            / "clustered")
        spark = get_spark("gen-clustered-tier")
        spark.sparkContext.setLogLevel("ERROR")
        out.mkdir(parents=True, exist_ok=True)
        gen_embeddings_clustered(spark, n).coalesce(1) \
            .write.mode("overwrite") \
            .parquet(str(out / "embeddings.parquet"))
        got = spark.read.parquet(str(out / "embeddings.parquet")).count()
        print(f"embeddings (clustered): {got} rows -> {out}")
        spark.stop()
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--mutated":
        # documents-only planted mid-jaccard tier (TWIN_FIDELITY):
        #   python tools/gen_scale_tier.py --mutated [n] [outdir]
        n = int(sys.argv[2]) if len(sys.argv) > 2 else BASE_DOCS
        out = Path(sys.argv[3]) if len(sys.argv) > 3 else (
            Path(__file__).resolve().parent.parent / ".scaletier"
            / "mutated")
        spark = get_spark("gen-mutated-tier")
        spark.sparkContext.setLogLevel("ERROR")
        out.mkdir(parents=True, exist_ok=True)
        gen_documents_mutated(spark, n).coalesce(1) \
            .write.mode("overwrite") \
            .parquet(str(out / "documents.parquet"))
        got = spark.read.parquet(str(out / "documents.parquet")).count()
        print(f"documents (mutated): {got} rows -> {out}")
        spark.stop()
        return 0
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        Path(__file__).resolve().parent.parent / ".scaletier"
        / f"sf{mult / 10:g}")
    spark = get_spark("gen-scale-tier")
    spark.sparkContext.setLogLevel("ERROR")
    out.mkdir(parents=True, exist_ok=True)
    gen_documents(spark, BASE_DOCS * mult).coalesce(max(1, mult)) \
        .write.mode("overwrite").parquet(str(out / "documents.parquet"))
    gen_embeddings(spark, BASE_VECS * mult).coalesce(max(1, mult)) \
        .write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    gen_events(spark, BASE_EVENTS * mult, BASE_USERS * mult) \
        .coalesce(max(1, mult)) \
        .write.mode("overwrite").parquet(str(out / "events.parquet"))
    for t in ["documents", "embeddings", "events"]:
        n = spark.read.parquet(str(out / f"{t}.parquet")).count()
        print(f"{t}: {n} rows -> {out / t}.parquet")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
