"""Structured Streaming extensions (beyond-reference; the reference is
strictly batch + request/response, SURVEY.md §2.5).

Two pipelines:

- **Incremental corpus ingest** (`stream_prepare`): the §3.2 prepare
  pipeline wrapped in a file-source stream — new CSV/JSON drops under a
  directory are embedded and appended to the Parquet corpus exactly once
  (checkpointed). This is `run_prepare` in `foreachBatch` form, so batch
  and streaming share one code path.
- **Streaming exact dedup** (`stream_dedup`): watermark-bounded
  drop-duplicates on the normalized-text fingerprint — the streaming twin
  of `operators.dedup.exact_dedup` for at-least-once ingest sources.
- **Event rollups** (`stream_hourly_rollup`, `stream_sessionize`):
  watermarked tumbling-window aggregation and applyInPandasWithState
  session windows over an event stream — the streaming twins of the batch
  `events_hourly` / `sessionize` queries, sharing their semantics.

Scale notes: file-source streams list incrementally (maxFilesPerTrigger
bounds batch size); the hourly rollup keeps state only within the
watermark horizon; sessionization state is per-key and evicted on timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from dotnetvectorsearch_spark.caching import release_transient
from dotnetvectorsearch_spark.embeddings.base import EmbeddingBackend
from dotnetvectorsearch_spark.pipeline.prepare import prepare_documents
from dotnetvectorsearch_spark.schemas import RAW_CSV_SCHEMA


def stream_prepare(spark: SparkSession, input_dir: str, out_path: str,
                   checkpoint: str, embedder: EmbeddingBackend,
                   max_files_per_trigger: int = 100):
    """Incremental prepare: watch input_dir for CSV drops, embed, append.

    Returns the started StreamingQuery (caller awaits/stops)."""
    raw = (spark.readStream.schema(RAW_CSV_SCHEMA)
           .option("header", True)
           .option("mode", "DROPMALFORMED")
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .csv(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = prepare_documents(batch_df, embedder)
        docs.write.mode("append").parquet(out_path)

    return (raw.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .start())


def stream_dedup(docs: DataFrame, ts_col: str = "created_at",
                 text_col: str = "text",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop documents whose normalized-text
    fingerprint was already seen within the watermark horizon — the
    streaming twin of ``operators.dedup.exact_dedup``, for ingest
    pipelines where the same document arrives repeatedly (re-crawls,
    at-least-once upstream queues).

    Uses ``dropDuplicatesWithinWatermark`` so state is bounded: a
    fingerprint is kept only until the watermark passes it, unlike plain
    ``dropDuplicates`` whose state grows without bound on a stream. At
    scale the dedup state shards by fingerprint across executors; the
    watermark horizon is the dedup window — duplicates farther apart
    than it are handled by the batch compaction pass instead.
    """
    from dotnetvectorsearch_spark.functions.text import fingerprint

    return (docs
            .withColumn("fp", fingerprint(text_col))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["fp"])
            .drop("fp"))


def stream_clean(docs: DataFrame, quality_floor: float = 0.4,
                 lang: str = "en", ts_col: str = "created_at",
                 text_col: str = "text",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the batch `clean_corpus` composition: language-ID
    + quality-floor predicates ahead of the watermark-bounded exact dedup.

    Operator order is the scale decision: the stateless filters are
    narrow codegen'd projections that cut the stream BEFORE any dedup
    state is touched, so state size tracks the post-filter (clean) rate,
    not the raw ingest rate. Works on a streaming or batch frame.
    """
    from dotnetvectorsearch_spark.functions.text import lang_id, quality_score

    filt = docs.filter((lang_id(text_col) == F.lit(lang))
                       & (quality_score(text_col) >= F.lit(quality_floor)))
    return stream_dedup(filt, ts_col=ts_col, text_col=text_col,
                        watermark=watermark)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour rollup. Works on a streaming OR batch
    frame with (ts timestamp, event_type string, value double)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("hour_start"), "event_type",
                    "n_events", "sum_value"))


def sliding_rollup(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding-window rollup: each event lands in window/slide overlapping
    windows (2 for 1h/30m). Works on a streaming OR batch frame with
    (ts timestamp, event_type string, value double).

    Scale note: output cardinality is input x (window/slide); keep the
    ratio small (2-4) at 100 TB or pre-aggregate to tumbling slide-sized
    buckets first and roll those up (the two-level pattern)."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (ev.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows via the built-in ``session_window``
    (merge-on-overlap: an event exactly ``gap`` after the last one starts
    a NEW session — the window is the half-open [start, last+gap)).

    The declarative twin of ``stream_sessionize``: same shape, but
    expressed as a groupBy so Catalyst plans it (and the streaming state
    store handles merging) instead of custom applyInPandasWithState code.
    Works on batch or streaming frames with (user_id long, ts timestamp).
    """
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events"))


def enrich_stream(events: DataFrame, dim: DataFrame, on,
                  how: str = "left") -> DataFrame:
    """Stream-static enrichment join: the static dimension is broadcast to
    every task, so the stream is never shuffled and no join state is kept
    (unlike stream-stream joins). The static side is re-resolved per
    micro-batch, so a dim table rewritten between batches is picked up.

    At 100 TB-of-stream scale this is THE join shape to prefer: state-free,
    watermark-free, and the dim refresh is free consistency."""
    return events.join(F.broadcast(dim), on=on, how=how)


def stream_index_append(vectors: DataFrame, index, path: str,
                        checkpoint: str, vec_col: str = "embedding"):
    """Incremental ANN-index maintenance: assign each arriving vector to
    its IVF cell and append it into the ``partitionBy(cell)`` parquet
    index — new vectors are immediately searchable with the same
    partition-pruned probe path as the batch-built index.

    The centroids stay fixed between retrains (the standard IVF
    maintenance contract: assignment drifts slowly; retrain + full
    rewrite is a periodic batch job, e.g. when cell-size skew passes a
    threshold). Appends create small files per trigger —
    ``sources.layout.compact`` per cell-partition is the companion
    maintenance pass at scale.

    ``index`` is a fitted ``operators.ann.IVFIndex``. Returns the started
    StreamingQuery."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (index.transform(batch_df, vec_col=vec_col)
         .write.mode("append").partitionBy("cell").parquet(path))

    return (vectors.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .start())


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_sec", LongType()),
    StructField("last_sec", LongType()),
    StructField("n_events", LongType()),
])


def _session_fn(key, pdfs, state: GroupState):
    """Stateful session builder: 30-min inactivity gap closes a session."""
    import pandas as pd

    gap = 1800
    if state.hasTimedOut:
        (start, last, n) = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": key[0],
            "session_start": pd.Timestamp(start, unit="s"),
            "session_end": pd.Timestamp(last, unit="s"),
            "n_events": n,
        }])
        return
    secs: list[int] = []
    for pdf in pdfs:
        secs.extend((pdf["ts"].astype("int64") // 1_000_000_000).tolist())
    secs.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = secs[0], secs[0], 0
    closed = []
    for s in secs:
        if s - last > gap:
            closed.append((start, last, n))
            start, n = s, 0
        last = s
        n += 1
    state.update((start, last, n))
    state.setTimeoutDuration(gap * 1000)
    if closed:
        yield pd.DataFrame([{
            "user_id": key[0],
            "session_start": pd.Timestamp(a, unit="s"),
            "session_end": pd.Timestamp(b, unit="s"),
            "n_events": c,
        } for (a, b, c) in closed])


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user session windows via
    applyInPandasWithState (30-min gap, processing-time timeout eviction).

    `events` must be a streaming frame with (user_id long, ts timestamp).
    """
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _session_fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
            ))


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str, left_ts: str, right_ts: str,
                         within: str = "30 minutes",
                         watermark: str = "1 hour",
                         how: str = "inner") -> DataFrame:
    """Stream-stream interval join: pair each left event with every right
    event for the same key that lands in ``[left_ts, left_ts + within]``
    (e.g. click -> purchases within the attribution window). Works on two
    streaming frames, two batch frames, or a mix — same plan shape, so the
    batch twin is directly oracle-checkable.

    Streaming semantics: BOTH sides carry watermarks and the join
    condition bounds event time in both directions, which lets the state
    store evict rows once ``watermark + within`` passes — without the
    bound, stream-stream join state grows forever (the documented Spark
    requirement for state cleanup). Column names must be disjoint apart
    from ``key`` (rename before calling).

    Scale: state per key is O(events inside the watermark horizon); the
    join itself is a hash-partition co-partitioning on ``key`` of the two
    streams — the same shuffle a batch equi-join would pay, plus state.
    Beyond-reference (reference has no streams, SURVEY §2.5).
    """
    l = (left.withWatermark(left_ts, watermark)
         if left.isStreaming else left)
    r = (right.withWatermark(right_ts, watermark)
         if right.isStreaming else right)
    cond = ((l[key] == r[key])
            & (r[right_ts] >= l[left_ts])
            & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}")))
    # how="left_outer": unmatched left rows emit with nulls once the
    # watermark closes their window (streaming) / immediately (batch) —
    # the shape for "clicks with NO purchase in the window" funnels.
    return l.join(r, cond, how).drop(r[key])


def stream_upsert_partitioned(stream: DataFrame, path: str,
                              partition_col: str, checkpoint: str):
    """Streaming idempotent partition sink: each micro-batch dynamically
    overwrites exactly the partitions it contains
    (`sources.io.upsert_partitioned` inside foreachBatch). Replayed
    batches after a failure rewrite the same partitions to the same
    bytes, so the sink is effectively exactly-once at partition
    granularity — without any transaction-log table format.

    The partition column must be a batch-stable key (event date, source
    shard): a replay must regenerate the SAME partition values to
    overwrite, which is the standard contract for this pattern.
    """
    from dotnetvectorsearch_spark.sources.io import upsert_partitioned

    def process(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitioned(batch_df, path, partition_col)

    return (stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .start())


def stream_rollup_maintenance(stream: DataFrame, path: str,
                              keys: list[str], value_col: str,
                              checkpoint: str):
    """Streaming incremental aggregate maintenance: each micro-batch is
    aggregated into mergeable partial form (`operators.rollup`) and
    merged into the parquet rollup table at ``path`` — per-batch cost is
    |batch| + |rollup|, and history is NEVER rescanned. The streaming
    twin of the batch `incremental_rollup` query.

    The merged table is staged next to ``path`` and swapped in with a
    directory rename, so a concurrent reader sees either the old or the
    new rollup, never a partial write. A rename is atomic on a local /
    HDFS filesystem; on an object store back this sink with a table
    format's commit (the same caveat as every overwrite-sink here).

    Note replayed batches after a failure re-MERGE (the merge is not
    idempotent per batch, unlike the partition upsert above): pair with
    a batch-id high-water mark in the rollup directory for exactly-once,
    or accept at-least-once for monitoring-grade rollups.
    """
    import glob
    import os
    import shutil

    from dotnetvectorsearch_spark.operators.rollup import (
        merge_rollups, rollup_batch)

    def recover() -> None:
        """Crash recovery for the rename swap: a failure between
        ``rename(path, old)`` and ``rename(stage, path)`` leaves no
        directory at ``path``. On entry, if ``path`` is missing but an
        ``__old-*`` (pre-swap rollup) or ``__stage`` (fully-written
        merged rollup) survivor exists, restore the staged result if
        present (it already contains the old data merged in), else the
        newest old copy — so accumulated history is never dropped."""
        if os.path.isdir(path):
            return
        stage = f"{path}__stage"
        # A stage dir is only complete once written; parquet's _SUCCESS
        # marker distinguishes a finished write from a torn one.
        if os.path.isdir(stage) and os.path.isfile(
                os.path.join(stage, "_SUCCESS")):
            os.rename(stage, path)
            return
        olds = sorted(glob.glob(f"{path}__old-*"),
                      key=lambda p: os.path.getmtime(p))
        if olds:
            os.rename(olds[-1], path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover()
        agg = rollup_batch(batch_df, keys, value_col)
        if os.path.isdir(path):
            agg = merge_rollups(
                spark.read.parquet(path)
                .select(*keys, "n", "sum_v", "min_v", "max_v"), agg)
        stage = f"{path}__stage"
        shutil.rmtree(stage, ignore_errors=True)   # torn prior stage
        agg.write.mode("overwrite").parquet(stage)
        old = f"{path}__old-{batch_id}"
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(stage, path)
        shutil.rmtree(old, ignore_errors=True)
        for leftover in glob.glob(f"{path}__old-*"):
            shutil.rmtree(leftover, ignore_errors=True)

    return (stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .start())


_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_OUT_SCHEMA = ("user_id long, step int, event_type string, "
                      "completed_at timestamp")
_FUNNEL_STATE_SCHEMA = "next_step int, last_ts long"


def _funnel_fn(key, pdfs, state: GroupState):
    """Per-user funnel progression: emit one row each time the user
    completes the NEXT step in order (micro-batch-incremental twin of
    the batch `funnel_steps` step chain)."""
    import pandas as pd

    if state.hasTimedOut:           # no timeout configured; safety only
        state.remove()
        return
    rows = []
    for pdf in pdfs:
        for t, ty in zip(pdf["ts"].astype("int64") // 1_000,
                         pdf["event_type"]):
            rows.append((int(t), str(ty)))     # epoch micros, type
    rows.sort()
    next_step, last_ts = state.get if state.exists else (0, -1)
    out = []
    for us, ty in rows:
        if (next_step < len(_FUNNEL_STEPS)
                and ty == _FUNNEL_STEPS[next_step] and us > last_ts):
            out.append({
                "user_id": key[0],
                "step": next_step + 1,
                "event_type": ty,
                "completed_at": pd.Timestamp(us, unit="us"),
            })
            next_step += 1
            last_ts = us
    state.update((next_step, last_ts))
    if out:
        yield pd.DataFrame(out)


def stream_heavy_hitters(stream: DataFrame, col: str, path: str,
                         checkpoint: str, k: int = 64):
    """Streaming frequent-items maintenance: a SINGLE bounded
    Misra-Gries summary (<= k tracked keys + slack) maintained forever
    over the stream — the streaming twin of the batch
    `heavy_hitters_mg`, built on the same mergeable partials
    (operators/sketches.py: mg_partials / mg_merge_compress; Agarwal
    et al. '12 mergeable summaries, so merge order cannot break the
    [est, est + slack] undercount guarantee).

    Per micro-batch cost: ONE Spark job — the Arrow partials pass over
    the batch, collecting <= (k+1) rows PER PARTITION (never the
    stream; 1000 executors x 65 rows is ~65k driver rows, the
    coordinator-merge regime mergeable summaries are built for). The
    merge-with-stored-summary + compress step runs in plain Python on
    <= k+1 + collected rows, and the new summary lands via a direct
    pyarrow write — no second Spark job, no driver collects inside a
    plan, no Spark write stage. (Round 9: the previous frame-algebra
    trigger paid 3 driver actions + a Spark write per batch = 5.4 s
    triggers; this is the same math at <= 1 job. Semantics mirror
    operators/sketches.mg_merge_compress exactly — same tie-break,
    same slack bookkeeping — pinned by the exact-regime stream test.)
    Read the current report any time with
    `mg_top(spark.read.parquet(path))`. Same atomic parquet-swap +
    crash recovery as `stream_rollup_maintenance`.
    """
    import glob
    import os
    import shutil

    from dotnetvectorsearch_spark.operators.sketches import mg_partials

    def recover() -> None:
        if os.path.isdir(path):
            return
        stage = f"{path}__stage"
        if os.path.isdir(stage) and os.path.isfile(
                os.path.join(stage, "_SUCCESS")):
            os.rename(stage, path)
            return
        olds = sorted(glob.glob(f"{path}__old-*"),
                      key=lambda p: os.path.getmtime(p))
        if olds:
            os.rename(olds[-1], path)

    def _merge_compress_py(rows) -> tuple[dict, int]:
        """Driver-side twin of sketches.mg_merge_compress over (key,
        est, slack) tuples: sum per-key partials, and if more than k
        keys survive, subtract the (k+1)-th largest estimate (est
        desc, key asc tie-break — identical ordering to the frame
        version) from every key, drop non-positives, fold the
        subtracted amount into the slack."""
        counters: dict = {}
        slack_total = 0
        for key, est, slack in rows:
            slack_total += int(slack or 0)
            if key is not None:
                counters[key] = counters.get(key, 0) + int(est)
        if len(counters) > k:
            ordered = sorted(counters.items(),
                             key=lambda kv: (-kv[1], kv[0]))
            m = ordered[k][1]
            counters = {key: c - m for key, c in ordered[:k] if c > m}
            slack_total += m
        return counters, slack_total

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        recover()
        stage = f"{path}__stage"
        rows = [(r.key, r.est, r.slack)
                for r in mg_partials(batch_df, col, k).collect()]
        if os.path.isdir(path):
            stored = pq.read_table(path, columns=["key", "est", "slack"])
            rows.extend(zip(stored.column("key").to_pylist(),
                            stored.column("est").to_pylist(),
                            stored.column("slack").to_pylist()))
        counters, slack_total = _merge_compress_py(rows)
        table = pa.table({
            "key": pa.array(list(counters) + [None], type=pa.string()),
            "est": pa.array(list(counters.values()) + [0],
                            type=pa.int64()),
            "slack": pa.array([0] * len(counters) + [slack_total],
                              type=pa.int64())})
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        pq.write_table(table, os.path.join(stage, "part-0.parquet"))
        # _SUCCESS last: recover() treats its presence as write-complete
        open(os.path.join(stage, "_SUCCESS"), "w").close()
        old = f"{path}__old-{batch_id}"
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(stage, path)
        shutil.rmtree(old, ignore_errors=True)
        for leftover in glob.glob(f"{path}__old-*"):
            shutil.rmtree(leftover, ignore_errors=True)

    return (stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .start())


def stream_neardup_dedup(stream: DataFrame, out_path: str,
                         store_path: str, checkpoint: str,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         num_hashes: int = 16, bands: int = 4,
                         threshold: float = 0.5):
    """Streaming incremental NEAR-dup dedup: per micro-batch, keep only
    docs that are not near-duplicates of anything seen before
    (signature-estimate gate against the growing md5-minhash store),
    append survivors to ``out_path`` and their SIGNATURES to
    ``store_path`` — the near-dup analogue of the exact `stream_dedup`,
    batch twin `neardup_filter_incremental` (operators/dedup.py).

    History is held as K hashes per doc (never shingles) and re-read
    only through the bipartite LSH band join, so per-batch cost tracks
    |batch| x collision-rate. Within-batch near-dups are resolved
    BEFORE probing the store with a conservative min-keep: a doc is
    dropped when it is over-threshold-similar to ANY lower-id doc of
    its batch (so only pair-cluster minima survive). At-least-once on
    replay (appends are not idempotent) — the usual foreachBatch
    caveat; pair with a batch-id high-water mark for exactly-once.
    """
    import os

    from dotnetvectorsearch_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures_portable,
        neardup_filter_incremental)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = minhash_signatures_portable(
            batch_df, id_col, text_col, num_hashes).persist()
        try:
            # within-batch keep-first: id_b of any over-threshold pair
            # (id_a < id_b by construction) is a dup of a lower id
            arr = F.array(*[F.col(f"h{k}") for k in range(num_hashes)])
            pairs = lsh_candidate_pairs(
                sigs.select(id_col, arr.alias("minhash")), id_col,
                "minhash", bands, num_hashes // bands)
            eq = F.size(F.filter(
                F.zip_with("a_sig", "b_sig", lambda a, b: a == b),
                lambda x: x))
            a = sigs.select(F.col(id_col).alias("id_a"),
                            arr.alias("a_sig"))
            b = sigs.select(F.col(id_col).alias("id_b"),
                            arr.alias("b_sig"))
            dup_in_batch = (pairs.join(a, "id_a").join(b, "id_b")
                            .withColumn("__est",
                                        eq.cast("double") / num_hashes)
                            .filter(F.col("__est") >= threshold)
                            .select(F.col("id_b").alias(id_col))
                            .distinct())
            survivors_sigs = sigs.join(dup_in_batch, id_col,
                                       "left_anti")
            if os.path.isdir(store_path):
                store = spark.read.parquet(store_path)
                flags = neardup_filter_incremental(
                    survivors_sigs, store, id_col, num_hashes, bands,
                    threshold)
                keep_ids = (flags.filter(~F.col("is_neardup"))
                            .select(id_col))
                survivors_sigs = survivors_sigs.join(
                    keep_ids, id_col, "left_semi")
            survivors_sigs = survivors_sigs.persist()
            # Docs too short to shingle produce NO signature row; they
            # are trivially non-NEAR-duplicates and must pass through
            # (advisor r4) — but through an EXACT-hash gate (advisor
            # r5: the bare anti-join re-emitted every repeat): keep the
            # min-id doc per md5(text) within the batch, drop hashes
            # already recorded in the short-doc store, and record the
            # survivors' hashes alongside the signature store.
            # coalesce: md5(NULL) is NULL and the semi-join below never
            # matches NULL keys, silently dropping null-text docs
            # (advisor r6) — hash them as '' so they flow through the
            # min-id gate like any other sig-less doc.
            short = (batch_df.join(sigs.select(id_col), id_col,
                                   "left_anti")
                     .withColumn("__h", F.md5(
                         F.coalesce(F.col(text_col), F.lit("")))))
            first_ids = short.groupBy("__h").agg(
                F.min(id_col).alias(id_col))
            short = short.join(first_ids, [id_col, "__h"], "left_semi")
            short_store = f"{store_path}__short"
            if os.path.isdir(short_store):
                short = short.join(spark.read.parquet(short_store),
                                   "__h", "left_anti")
            short = short.persist()
            keep = (batch_df.join(survivors_sigs.select(id_col),
                                  id_col, "left_semi")
                    .unionByName(short.drop("__h")))
            keep.write.mode("append").parquet(out_path)
            survivors_sigs.write.mode("append").parquet(store_path)
            short.select("__h").write.mode("append").parquet(short_store)
            short.unpersist()
            survivors_sigs.unpersist()
        finally:
            sigs.unpersist()

    return (stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .start())


_DEBOUNCE_OUT_SCHEMA = ("user_id long, ts timestamp, event_type string")
_DEBOUNCE_STATE_SCHEMA = "last_kept long"


def _make_debounce_fn(gap_us: int):
    def debounce_fn(key, pdfs, state: GroupState):
        """Per-key anchor debounce across micro-batches: keep an event
        iff it is >= gap after the last KEPT event (anchor semantics —
        the state is exactly one timestamp per key, the anchor)."""
        import pandas as pd

        if state.hasTimedOut:       # no timeout configured; safety only
            state.remove()
            return
        rows = []
        for pdf in pdfs:
            for us, ty in zip(pdf["ts"].astype("int64") // 1_000,
                              pdf["event_type"]):
                rows.append((int(us), str(ty)))
        rows.sort()
        (last_kept,) = state.get if state.exists else (-(1 << 62),)
        out = []
        for us, ty in rows:
            if us - last_kept >= gap_us:
                out.append({"user_id": key[0],
                            "ts": pd.Timestamp(us, unit="us"),
                            "event_type": ty})
                last_kept = us
        state.update((last_kept,))
        if out:
            yield pd.DataFrame(out)
    return debounce_fn


def stream_debounce(events: DataFrame, min_gap_sec: int = 5) -> DataFrame:
    """Stateful streaming debounce — the applyInPandasWithState twin of
    the batch `debounce_events` (operators/temporal.py): drop any event
    within ``min_gap_sec`` of the last KEPT event of the same user.
    Anchor state is ONE timestamp per key, so memory is O(users).

    Same batch/stream reconciliation caveat as `stream_funnel`: events
    are consumed in per-micro-batch arrival order (sorted within each
    batch); a late out-of-order event landing in a later batch is
    judged against the anchor as of ITS batch, where the batch operator
    — which sees a globally sorted stream — might keep/drop
    differently. Run the batch twin for nightly exact numbers.
    `events` must be a streaming frame with (user_id long,
    ts timestamp, event_type string).
    """
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_debounce_fn(min_gap_sec * 1_000_000),
                outputStructType=_DEBOUNCE_OUT_SCHEMA,
                stateStructType=_DEBOUNCE_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def stream_funnel(events: DataFrame) -> DataFrame:
    """Stateful streaming funnel: per-user step completions for the
    view -> click -> purchase chain, emitted AS THEY HAPPEN across
    micro-batches — the state is just (next expected step, completion
    ts), so memory is O(users), not O(events).

    Caveat vs the batch `funnel_steps`: events are consumed in
    per-batch arrival order (micro-batch streaming has no global sort),
    so a late out-of-order step inside an earlier batch window can be
    missed where the batch operator would count it — the usual
    streaming/batch reconciliation gap; run the batch twin for the
    nightly exact numbers. `events` must be a streaming frame with
    (user_id long, ts timestamp, event_type string).
    """
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _funnel_fn,
                outputStructType=_FUNNEL_OUT_SCHEMA,
                stateStructType=_FUNNEL_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
