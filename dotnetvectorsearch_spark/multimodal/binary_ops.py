"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata (beyond-reference, LLM-training-data-pipeline surface).

Design: media rows are (asset_id, modality, mime_type, payload binary,
meta map<string,string>) — see ``schemas.MEDIA_SCHEMA``. All compute runs
as Arrow-batched ``mapInPandas`` so payload bytes stream through in
columnar batches without row-at-a-time Python overhead; partitioning is by
asset_id hash so large fan-out stages (frame sampling) scale horizontally.

The actual codecs (PIL/ffmpeg/librosa) are NOT installed in this
container, so the decode kernel is stubbed: ``decode_stub='fake'``
produces deterministic fake features (so the Spark plumbing — schema,
batching, partition shape — is fully testable), ``decode_stub='raise'``
raises NotImplementedError marking the integration point.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("asset_id long, modality string, width int, height int, "
                  "n_frames int, feature array<float>")


def _fake_decode(payload: bytes, modality: str, feat_dim: int):
    """Deterministic fake decode: byte stats stand in for codec output."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    rng = np.random.RandomState(int(buf.sum()) % (2 ** 31))
    feat = rng.standard_normal(feat_dim).astype(np.float32)
    n = float(np.linalg.norm(feat))
    feat = feat / n if n > 1e-12 else feat
    width = int(buf[:4].sum()) % 1920 + 1
    height = int(buf[4:8].sum()) % 1080 + 1
    n_frames = 1 if modality == "image" else int(len(buf)) % 300 + 1
    return width, height, n_frames, feat


def extract_features(media: DataFrame, feat_dim: int = 16,
                     decode_stub: str = "fake") -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    At scale this is the pattern for any per-asset kernel (resize, frame
    sample, fingerprint): narrow transformation, Arrow batches, payload
    column pruned away in the output so the (huge) bytes don't flow
    downstream.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_stub == "raise":
            raise NotImplementedError(
                "real media codecs (PIL/ffmpeg) are not available in this "
                "environment; integration point for production decode")
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                    pdf["asset_id"], pdf["modality"], pdf["payload"]):
                w, h, nf, feat = _fake_decode(payload, modality, feat_dim)
                rows.append((asset_id, modality, w, h, nf, feat))
            yield pd.DataFrame(rows, columns=[
                "asset_id", "modality", "width", "height", "n_frames",
                "feature"])

    return media.select("asset_id", "modality", "payload") \
        .mapInPandas(process, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 30,
                  decode_stub: str = "fake") -> DataFrame:
    """Frame-sampling fan-out: one output row per sampled frame (video).

    Same stub policy as extract_features; demonstrates the 1->N mapInPandas
    fan-out shape (explode happens inside the Arrow batch, not via
    driver-side loops).
    """
    schema = "asset_id long, frame_idx int, frame_feature array<float>"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_stub == "raise":
            raise NotImplementedError("real video decode unavailable")
        for pdf in batches:
            rows = []
            for asset_id, modality, payload in zip(
                    pdf["asset_id"], pdf["modality"], pdf["payload"]):
                if modality != "video":
                    continue
                _, _, n_frames, _ = _fake_decode(payload, modality, 4)
                for idx in range(0, n_frames, every_nth):
                    _, _, _, feat = _fake_decode(
                        (payload or b"") + idx.to_bytes(4, "little"),
                        modality, 8)
                    rows.append((asset_id, idx, feat))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_feature"])

    return media.select("asset_id", "modality", "payload") \
        .mapInPandas(process, schema)


def resize_media(media: DataFrame, target_width: int = 224,
                 target_height: int = 224,
                 decode_stub: str = "fake") -> DataFrame:
    """Image resize: binary in -> binary out + updated dimension metadata
    (the preprocessing step every vision-training pipeline runs).

    The stub 'resize' is a deterministic payload transform (truncate/pad
    to a size proportional to the target area) so the binary->binary
    round-trip plumbing — payload column in AND out, metadata rewrite,
    non-image passthrough — is fully testable; swap ``_fake_decode``-style
    kernels for PIL at the marked integration point. Non-image rows pass
    through unchanged (width/height null), so the operator is safe to run
    over a mixed-modality table."""
    schema = ("asset_id long, modality string, mime_type string, "
              "payload binary, width int, height int")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_stub == "raise":
            raise NotImplementedError(
                "real image codecs (PIL) are not available; integration "
                "point for production resize")
        target_len = max(1, (target_width * target_height) // 1024)
        for pdf in batches:
            rows = []
            for asset_id, modality, mime, payload in zip(
                    pdf["asset_id"], pdf["modality"], pdf["mime_type"],
                    pdf["payload"]):
                if modality != "image":
                    rows.append((asset_id, modality, mime, payload,
                                 None, None))
                    continue
                buf = bytes(payload or b"") or b"\x00"  # empty -> 1 zero byte
                resized = (buf * (target_len // len(buf) + 1))[:target_len]
                rows.append((asset_id, modality, mime, resized,
                             target_width, target_height))
            yield pd.DataFrame(rows, columns=[
                "asset_id", "modality", "mime_type", "payload",
                "width", "height"])

    return media.select("asset_id", "modality", "mime_type", "payload") \
        .mapInPandas(process, schema)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media table from the documents fixture:
    payload = UTF-8 bytes of the text, modality/mime assigned by id hash.
    Lets the binary-column plumbing be exercised (and oracle-checked on
    byte lengths) without real media files in the container."""
    modality = (F.when(F.col(id_col) % 3 == 0, "image")
                .when(F.col(id_col) % 3 == 1, "audio")
                .otherwise("video"))
    mime = (F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4"))
    return docs.select(
        F.col(id_col).alias("asset_id"),
        modality.alias("modality"),
        mime.alias("mime_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"))


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata analytics over binary payloads: sizes per
    modality/mime — no decode, no Python."""
    return (media.groupBy("modality", "mime_type")
            .agg(F.count(F.lit(1)).alias("n_assets"),
                 F.sum(F.length("payload")).alias("total_bytes"),
                 F.max(F.length("payload")).alias("max_bytes")))


_EXT_MIME = {
    "png": ("image", "image/png"), "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"), "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"), "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"), "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"), "webm": ("video", "video/webm"),
}


def media_from_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Real-media ingestion edge: scan a directory of media blobs with
    the `binaryFile` source (`sources.io.read_binary_files`) and map
    each file into the MEDIA_SCHEMA contract — asset_id from a stable
    64-bit path hash, modality/mime from the file extension (unknown
    extensions land as modality 'binary' / 'application/octet-stream'
    rather than being dropped: triage them downstream).

    Everything is Catalyst expressions over the scan; file metadata
    (path, size, mtime) is preserved in ``meta``. Pruning pushes to the
    file LISTING — a `length`/`path` filter composed upstream of this
    frame never fetches the pruned blob bytes (pinned in
    test_pipeline's binaryFile tests). Never splits a file: shard media
    into many files upstream, the same rule as `read_binary_files`.
    """
    from dotnetvectorsearch_spark.sources.io import read_binary_files
    files = read_binary_files(spark, path, glob)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    modality, mime = F.lit("binary"), F.lit("application/octet-stream")
    for e, (mod, mt) in sorted(_EXT_MIME.items()):
        modality = F.when(ext == e, mod).otherwise(modality)
        mime = F.when(ext == e, mt).otherwise(mime)
    return files.select(
        F.xxhash64("path").alias("asset_id"),
        modality.alias("modality"),
        mime.alias("mime_type"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("bytes"), F.col("length").cast("string"),
            F.lit("mtime"), F.col("modificationTime").cast("string"),
        ).alias("meta"))
