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


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(as_media(docs))


QUERIES = {
    "multimodal_features": _q_multimodal,  # rows-only (mapInPandas stub)
}

ORACLES: dict[str, str] = {}
