from __future__ import annotations

from pyspark.sql import functions as F

from dotnetvectorsearch_spark.operators.sampling import (
    proportional_downsample,
    stratified_sample,
)
from dotnetvectorsearch_spark.sources.io import load_table


def test_stratified_sample_deterministic_and_filtered(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep = {langs[0]: 0.5}
    a = stratified_sample(docs, "lang", keep).select("doc_id").collect()
    b = stratified_sample(docs, "lang", keep).select("doc_id").collect()
    assert sorted(a) == sorted(b)                      # seeded -> repeatable
    got_langs = {r.lang for r in
                 stratified_sample(docs, "lang", keep).select("lang")
                 .distinct().collect()}
    assert got_langs <= {langs[0]}                     # other strata dropped


def test_proportional_downsample_caps_strata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    target = 10
    out = proportional_downsample(docs, "lang", target)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # Bernoulli sampling is approximate; allow 3x headroom over the target
    assert counts and all(n <= 3 * target for n in counts.values())
