"""File-based sources: the dev stand-in for Kafka and the lake re-reader.

The streaming harness (SURVEY.md §5.4) replays Kafka-shaped records
(``value`` binary, ``timestamp``) from parquet files via the file
source — same downstream pipeline, swap-in swap-out with
sources.kafka.  ``maxFilesPerTrigger`` is the file-source analog of
``maxOffsetsPerTrigger`` (T6 pacing; reference batch sizing at
/root/reference/main.go:42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

KAFKA_RECORD_SCHEMA = T.StructType([
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
    T.StructField("timestamp", T.TimestampType()),
])


def kafka_shaped_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def read_lake(spark: SparkSession, lake_root: str, table: str) -> DataFrame:
    """Read back a hive-partitioned lake table written by sinks.lake.
    The ``ingest_batch`` level is the sink's exactly-once idempotency
    key (streaming/pipeline.py), not a user-facing column."""
    df = spark.read.parquet(f"{lake_root}/{table}")
    return df.drop("ingest_batch") if "ingest_batch" in df.columns else df
