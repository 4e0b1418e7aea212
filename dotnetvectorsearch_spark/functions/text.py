"""Text-prep and text-analysis expressions — all pure Catalyst built-ins.

Reference-parity functions:
- ``combined_text``: the exact ``"{question} : {answer}"`` concatenation
  (separator is space-colon-space) from reference ``Prepare/Program.cs:55``.
  The exact string matters for embedding parity.
- ``with_task_prefix``: E5 asymmetric task prefixes — ``"passage: "`` at
  index time (``Prepare/Program.cs:56``), ``"query: "`` at query time
  (``WebAPI/Services/VectorSearchService.cs:183``; pairwise similarity uses
  ``"query: "`` on BOTH sides, ``VectorSearchService.cs:103-104``).
- ``non_blank``: the reference rejects null/whitespace text
  (``VectorSearchService.cs:31-32,97-98,175-176``).

Beyond-reference text analytics (LLM-training-data pipeline ops): token
counting, quality scoring, language ID, document fingerprinting. Every one
is a deterministic built-in-expression composition, so it is (a) JVM-side /
codegen-friendly at 100 TB scale and (b) ANSI-SQL-oracle checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PASSAGE_PREFIX = "passage: "
QUERY_PREFIX = "query: "

# Word-level tokenizer pattern shared by token counting / shingling.
WS_PATTERN = r"\s+"
# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol
# (the GPT-2-family pre-tokenization shape, minus unicode categories).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[,.!?;:]"

# Tiny per-language stopword signals for the n-gram/stopword language-ID
# heuristic. Deliberately small + regex-portable (same semantics in Spark's
# Java regex and DuckDB's RE2).
LANG_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|for)\b",
    "es": r"\b(el|la|de|que|y|los|del|las|por|un)\b",
    "fr": r"\b(le|la|les|des|est|une|dans|pour|que|sur)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein|mit|sich|auf)\b",
    "zh": r"[一-鿿]",
}
# Deterministic priority order for argmax ties.
LANG_ORDER = ["en", "es", "fr", "de", "zh"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- reference
def combined_text(question: Column | str, answer: Column | str) -> Column:
    """`"{q} : {a}"` — reference Prepare/Program.cs:55 (P1)."""
    return F.concat_ws(" : ", _c(question), _c(answer))


def with_task_prefix(text: Column | str, kind: str = "query") -> Column:
    """Prepend the E5 task prefix (P2). kind in {"query", "passage"}."""
    prefix = {"query": QUERY_PREFIX, "passage": PASSAGE_PREFIX}[kind]
    return F.concat(F.lit(prefix), _c(text))


def non_blank(text: Column | str) -> Column:
    """True where text is non-null and not whitespace-only (P10)."""
    t = _c(text)
    return t.isNotNull() & (F.length(F.trim(t)) > 0)


# ------------------------------------------------------------ text analysis
def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count (empty/blank text counts 0)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, WS_PATTERN))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Token count under a BPE-style pre-tokenization regex."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_count(text: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(text), F.lit(PUNCT_PATTERN), F.lit(0)))


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    return F.size(
        F.regexp_extract_all(F.lower(_c(text)), F.lit(LANG_STOPWORDS[lang]), F.lit(0))
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation/stopword
    ratios, mean word length. Returns name -> Column (caller aliases)."""
    t = _c(text)
    n_chars = F.length(t)
    n_tokens = ws_token_count(t)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_word_len": F.round(
            F.when(n_tokens > 0,
                   (n_chars - n_tokens + 1).cast("double") / n_tokens
                   ).otherwise(F.lit(0.0)), 6),
        "punct_ratio": F.round(
            F.when(n_chars > 0,
                   punct_count(t).cast("double") / n_chars
                   ).otherwise(F.lit(0.0)), 6),
        "stopword_ratio": F.round(
            F.when(n_tokens > 0,
                   stopword_count(t, "en").cast("double") / n_tokens
                   ).otherwise(F.lit(0.0)), 6),
    }


# Gopher rule-set stopwords (Rae et al. 2021, §A1.1 "MassiveWeb
# filters"): a doc must contain >= `stop_hits` DISTINCT words of this
# list. Word-boundary regexes shared verbatim by Java regex and RE2.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(text: Column | str,
                         min_words: int = 20,
                         max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         min_alpha_word_frac: float = 0.8,
                         stop_hits: int = 2) -> dict[str, Column]:
    """The Gopher rule-based quality filters (Rae et al. 2021, §A1.1),
    each as a named boolean flag plus the features behind them — the
    standard first-pass web-corpus gate. Returns name -> Column; `keep`
    is the conjunction. Thresholds are parameters; the word-count floor
    defaults to 20 (the paper's 50 assumes full web pages).

    All features are single-pass Catalyst expressions over the text
    column (regex counts + a higher-order filter) — no shuffle, no UDF;
    at 100 TB this is a narrow map fused into the scan, and the flags
    are exactly the columns a curation pipeline partitions its
    keep/drop decision on.
    """
    t = F.trim(_c(text))
    words = F.split(t, WS_PATTERN)
    wc = ws_token_count(t)
    n_chars = F.length(t)
    # Mean word length from the split words themselves, not
    # (n_chars - wc + 1)/wc — that shortcut assumes exactly one
    # whitespace char between words and inflates the mean on
    # newline/indent-heavy web text, wrongly tripping the Gopher
    # mean-word-length gate.
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w))
    mean_wl = F.round(
        F.when(wc > 0, word_chars.cast("double") / wc)
        .otherwise(F.lit(0.0)), 6)
    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"(#|\.\.\.|…)"),
                                            F.lit(0)))
    symbol_ratio = F.round(
        F.when(wc > 0, n_symbols.cast("double") / wc)
        .otherwise(F.lit(0.0)), 6)
    alpha_frac = F.round(
        F.when(wc > 0,
               F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
               .cast("double") / wc)
        .otherwise(F.lit(0.0)), 6)
    low = F.lower(t)
    stop_distinct = sum(
        (F.when(low.rlike(rf"\b{w}\b"), 1).otherwise(0)
         for w in GOPHER_STOPWORDS),
        F.lit(0)).cast("int")
    flags = {
        "word_count": wc.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "alpha_word_frac": alpha_frac,
        "stop_distinct": stop_distinct,
        "flag_word_count": (wc >= min_words) & (wc <= max_words),
        "flag_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "flag_symbol_ratio": symbol_ratio < max_symbol_ratio,
        "flag_alpha_words": alpha_frac > min_alpha_word_frac,
        "flag_stopwords": stop_distinct >= stop_hits,
    }
    flags["keep"] = (flags["flag_word_count"]
                     & flags["flag_mean_word_len"]
                     & flags["flag_symbol_ratio"]
                     & flags["flag_alpha_words"]
                     & flags["flag_stopwords"])
    return flags


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewards stopword presence and sane
    word lengths, penalizes punctuation soup and degenerate length."""
    f = quality_features(text)
    len_ok = F.when((f["n_chars"] >= 20) & (f["n_chars"] <= 100000), 1.0).otherwise(0.0)
    word_ok = F.when((f["mean_word_len"] >= 2.0) & (f["mean_word_len"] <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(f["punct_ratio"] * 5.0, F.lit(1.0))
    return F.round((len_ok + word_ok + stop_ok + punct_ok) / 4.0, 6)


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backrefs. Order matters: emails before the
# bare-number patterns (an address's digits must not be half-scrubbed),
# and IPs before phones (the phone rule would otherwise eat "192.168").
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # leading \+?\b (not \b\+?): a word boundary can't precede '+', so the
    # anchor sits between the optional plus and the first digit
    (r"\+?\b(?:\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}\b",
     "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Scrub common PII shapes (emails, card-length digit runs, phone
    numbers, IPv4) to typed placeholder tokens — the standard scrub pass
    before corpus text reaches a training set. Heuristic by design:
    recall-oriented patterns, applied in order so composite matches
    (an email's digits) are consumed by the earlier rule. Pure
    ``regexp_replace`` — codegen'd, and oracle-checkable because the
    patterns avoid Java/RE2 dialect differences."""
    out = _c(text)
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def repetition_stats(text: Column | str) -> dict[str, Column]:
    """Gopher/C4-style repetition features: distinct-token ratio and the
    share of the text occupied by the single most frequent token. Low
    distinct ratios / high top-token share flag boilerplate and
    keyword-stuffed documents. Built-ins only: the token array is
    computed once per expression tree (no lambda capture of a computed
    array — see _sliding_concat)."""
    toks = F.split(F.trim(_c(text)), WS_PATTERN)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # top-token count = longest equal-run of the SORTED tokens, found in
    # one aggregate pass whose lambdas touch only (acc, x) — capturing
    # the token array in a per-element lambda would re-split the string
    # O(distinct) times (see _sliding_concat)
    def _merge(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc.best, run).alias("best"))

    top_count = F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit(" ").alias("prev"),
                 F.lit(0).cast("int").alias("run"),
                 F.lit(0).cast("int").alias("best")),
        _merge,
        lambda acc: acc.best)
    return {
        "n_tokens": n.cast("long"),
        "distinct_ratio": F.round(
            F.when(n > 0, n_distinct.cast("double") / n)
            .otherwise(F.lit(0.0)), 6),
        "top_token_share": F.round(
            F.when(n > 0, top_count.cast("double") / n)
            .otherwise(F.lit(0.0)), 6),
    }


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts over lowercased text."""
    t = F.lower(_c(text))
    return {
        lang: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for lang, pat in LANG_STOPWORDS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Argmax language with deterministic tie-break (LANG_ORDER priority);
    'und' when no signal fires."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate reversed so earlier LANG_ORDER entries win ties (>= replaces)
    for lang in reversed(LANG_ORDER):
        s = scores[lang]
        take = s >= best_score
        # strict > against later langs, but priority wins on equal: process
        # in reverse order with >= so the earliest lang ends up kept on ties.
        best_lang = F.when(take & (s > 0), F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), WS_PATTERN, " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Portable (identical value in any engine with md5)."""
    return F.md5(normalized_text(text))


HTML_TAG_PATTERN = r"<[^>]+>"
URL_PATTERN = r"https?://\S+|www\.\S+"
CONTROL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def strip_html(text: Column | str) -> Column:
    """Remove HTML/XML tags, leaving tag-separated text space-joined.
    Regex-based boilerplate removal (tags only, not entity decoding) —
    the standard first pass of a web-crawl cleaning pipeline."""
    return F.regexp_replace(_c(text), HTML_TAG_PATTERN, " ")


def strip_urls(text: Column | str) -> Column:
    """Remove http(s)/www URLs (crawl-noise removal)."""
    return F.regexp_replace(_c(text), URL_PATTERN, " ")


def strip_control_chars(text: Column | str) -> Column:
    """Remove C0/C1 control characters except tab/newline/CR."""
    return F.regexp_replace(_c(text), CONTROL_PATTERN, "")


def clean_text(text: Column | str) -> Column:
    """Composed cleaning pass: strip tags -> URLs -> control chars ->
    collapse whitespace. All JVM-side regexp_replace (whole-stage
    codegen), no Python in the hot path; at 100 TB this runs as a pure
    map stage with no shuffle."""
    return F.trim(F.regexp_replace(
        strip_control_chars(strip_urls(strip_html(text))),
        WS_PATTERN, " "))


def _sliding_concat(arr: Column, n: int, sep: str,
                    distinct: bool = True) -> Column:
    """n-gram shingles of an array via zip_with over shifted slices.

    Deliberately avoids referencing the source expression inside a
    ``transform`` lambda: Spark's higher-order functions re-evaluate
    lambda-captured child expressions PER ELEMENT (they are interpreted,
    not codegen'd), which turns an O(len) shingle pass into O(len^2) —
    measured 20x slower on real documents. Here each shifted slice
    evaluates the source once per row; trailing positions null out via
    ``concat`` (null-propagating, unlike concat_ws) and are filtered."""
    def concat_pair(x, y):
        return F.concat(x, F.lit(sep), y)

    sh = arr
    for i in range(1, n):
        shifted = F.slice(arr, i + 1, F.greatest(F.size(arr), F.lit(1)))
        sh = F.zip_with(sh, shifted, concat_pair)
    out = F.filter(sh, lambda x: x.isNotNull())
    return F.array_distinct(out) if distinct else out


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (empty array when the
    document has fewer than n tokens)."""
    toks = F.split(F.trim(_c(text)), WS_PATTERN)
    if n == 1:
        return F.array_distinct(toks)
    return _sliding_concat(toks, n, " ")


def char_shingles(text: Column | str, n: int = 5) -> Column:
    """Distinct character n-gram shingles over the normalized text."""
    chars = F.filter(F.split(normalized_text(text), ""),
                     lambda c: c != F.lit(""))
    return _sliding_concat(chars, n, "")


def ordered_word_ngrams(text: Column | str, n: int = 3) -> Column:
    """ORDERED, non-distinct word n-grams (position i holds the n-gram
    starting at token i) — the span input for duplicated-text statistics,
    where every occurrence counts, unlike the distinct shingle sets
    MinHash/Jaccard consume."""
    toks = F.split(F.trim(_c(text)), WS_PATTERN)
    if n == 1:
        return toks
    return _sliding_concat(toks, n, " ", distinct=False)


def ordered_char_kgrams(text: Column | str, k: int = 5) -> Column:
    """ORDERED, non-distinct char k-grams of the normalized text — the
    rolling-window input for winnowing fingerprints (position i holds the
    k-gram starting at character i)."""
    chars = F.filter(F.split(normalized_text(text), ""),
                     lambda c: c != F.lit(""))
    return _sliding_concat(chars, k, "", distinct=False)
