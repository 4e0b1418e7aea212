"""Text-function tests: reference-quirk regressions + analysis ops."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.functions import text as T


def _one(df):
    return df.collect()[0][0]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [Row(q="How do I cancel?", a="Call the desk.")])


def test_combined_text_exact_separator(spark, tdf):
    """Reference Prepare/Program.cs:55 — separator is ' : ' exactly."""
    assert _one(tdf.select(T.combined_text("q", "a"))) == \
        "How do I cancel? : Call the desk."


def test_task_prefixes(spark, tdf):
    assert _one(tdf.select(T.with_task_prefix("q", "passage"))) == \
        "passage: How do I cancel?"
    assert _one(tdf.select(T.with_task_prefix("q", "query"))) == \
        "query: How do I cancel?"


def test_non_blank(spark):
    df = spark.createDataFrame(
        [Row(t="x"), Row(t="   "), Row(t=None)], "t string")
    assert df.filter(T.non_blank("t")).count() == 1


def test_token_counts(spark):
    df = spark.createDataFrame([Row(t="hello world, 42 times!")])
    assert _one(df.select(T.ws_token_count("t"))) == 4
    # hello | world | , | 42 | times | !
    assert _one(df.select(T.bpe_ish_token_count("t"))) == 6
    blank = spark.createDataFrame([Row(t="  ")])
    assert _one(blank.select(T.ws_token_count("t"))) == 0


def test_lang_id(spark):
    df = spark.createDataFrame([
        Row(t="the cat and the dog of the house"),
        Row(t="el perro y la casa de los gatos"),
        Row(t="le chat est dans la maison pour les chiens"),
        Row(t="der hund ist nicht das problem mit der katze"),
        Row(t="你好世界"),
        Row(t="zzz qqq xxx"),
    ])
    out = [r[0] for r in df.select(T.lang_id("t")).collect()]
    assert out == ["en", "es", "fr", "de", "zh", "und"]


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame([Row(a="Hello   World", b="hello world")])
    r = df.select(T.fingerprint("a").alias("fa"),
                  T.fingerprint("b").alias("fb")).collect()[0]
    assert r.fa == r.fb


def test_word_shingles(spark):
    df = spark.createDataFrame([Row(t="a b c d")])
    assert _one(df.select(T.word_shingles("t", 3))) == ["a b c", "b c d"]
    short = spark.createDataFrame([Row(t="a b")])
    assert _one(short.select(T.word_shingles("t", 3))) == []


def test_char_shingles(spark):
    df = spark.createDataFrame([Row(t="abcdef")])
    assert _one(df.select(T.char_shingles("t", 5))) == ["abcde", "bcdef"]


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(T.quality_score("text").alias("q")) \
        .agg(F.min("q"), F.max("q")).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_clean_text_strips_boilerplate(spark):
    df = spark.createDataFrame([Row(
        t='<div id="a">Hello</div> visit https://x.io/p?q=1 or '
          'www.y.org/z now\x00\x1f  done')])
    r = df.select(T.clean_text("t").alias("c")).collect()[0]
    assert r.c == "Hello visit or now done"


def test_clean_text_preserves_plain_text(spark):
    df = spark.createDataFrame([Row(t="already clean text")])
    assert df.select(T.clean_text("t")).collect()[0][0] == \
        "already clean text"


def test_redact_pii_all_shapes(spark):
    from dotnetvectorsearch_spark.functions.text import redact_pii
    df = spark.createDataFrame(
        [("mail a.b+c@ex-ample.co.uk, call 555-123-4567 or +1 (212) 555-0199, "
          "card 4111 1111 1111 1111, host 10.0.0.1",)], "t string")
    out = df.select(redact_pii("t").alias("r")).first().r
    assert "<EMAIL>" in out and "@" not in out
    assert "<CARD>" in out and "4111" not in out
    assert "<IP>" in out and "10.0.0.1" not in out
    assert "<PHONE>" in out and "555-123-4567" not in out
    assert "+" not in out  # the plus of "+1 (212)..." is consumed too
    # clean text passes through untouched
    clean = spark.createDataFrame([("just words, 版本 7 here",)], "t string")
    assert clean.select(redact_pii("t").alias("r")).first().r \
        == "just words, 版本 7 here"


def test_repetition_stats_known_values(spark):
    from dotnetvectorsearch_spark.functions.text import repetition_stats
    df = spark.createDataFrame(
        [(1, "spam spam spam eggs"), (2, "all unique tokens here")],
        "id long, t string")
    stats = repetition_stats("t")
    rows = {r.id: r for r in df.select(
        "id", *[c.alias(n) for n, c in stats.items()]).collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].distinct_ratio == 0.5
    assert rows[1].top_token_share == 0.75
    assert rows[2].distinct_ratio == 1.0
    assert rows[2].top_token_share == 0.25


def test_gopher_quality_flags_rules(spark):
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.functions.text import (
        gopher_quality_flags,
    )
    good = ("the quick brown fox jumps over the lazy dog and runs off "
            "to be with all of that pack that have come along")
    rows = [
        Row(id=1, text=good),                          # passes everything
        Row(id=2, text="short text"),                  # word-count floor
        Row(id=3, text=("# # # # # # # # # # # # # # # # # # # # "
                        "the cat to be of and that have with them")),
        Row(id=4, text=("12 34 56 78 90 11 22 33 44 55 66 77 88 99 00 "
                        "the to be of and that have with one two")),
        Row(id=5, text=" ".join(["pneumonoultramicroscopic"] * 25)),
    ]
    df = spark.createDataFrame(rows)
    flags = gopher_quality_flags("text")
    out = {r.id: r for r in df.select(
        "id", *(v.alias(k) for k, v in flags.items())).collect()}
    assert out[1].keep
    assert not out[2].flag_word_count and not out[2].keep
    assert not out[3].flag_symbol_ratio and not out[3].keep
    assert not out[4].flag_alpha_words and not out[4].keep
    assert not out[5].flag_mean_word_len and not out[5].flag_stopwords
    assert out[1].stop_distinct >= 2 and out[2].word_count == 2
