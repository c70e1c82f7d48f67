"""S8 parquet_export_sink: the hive-partitioned zstd parquet lake.

The reference exports each rotated DuckDB file twice per present hour
(/root/reference/main.go:101-125): the raw table filtered to the hour
(P1+P4) and the hourly aggregate (A2), both via
``COPY ... TO '<path>/year={{year}}/month={{month}}/day={{day}}/hour={{hour}}/...'
(FORMAT PARQUET, compression zstd, ROW_GROUP_SIZE_BYTES 100_000_000,
OVERWRITE_OR_IGNORE)``.

Spark collapses the machinery: ``partitionBy("year","month","day",
"hour")`` enumerates the partitions itself (A1 implicitly), writes all
hours in one pass, and dynamic partition-overwrite mode reproduces
``OVERWRITE_OR_IGNORE`` (replace exactly the hour partitions present in
this batch, leave the rest) — session.py pins
``partitionOverwriteMode=dynamic`` and zstd/100 MB row groups.

Scale notes:
- Partition values are computed once as columns; the writer hash-splits
  by partition value, so one pass regardless of hours present.
- ``maxRecordsPerFile`` bounds file size the way the reference's 4200
  MB rotation bounds DB files (main.go:48).
- A 100 TB day is ~4 TB/hour-partition: files stay parallel-readable
  because partition dirs shard by task, not one-file-per-hour.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import datepart_str, epoch_ms_precise, epoch_ms_to_ts

PARTITION_COLS = ["year", "month", "day", "hour"]


def with_hour_partitions(df: DataFrame, ts: Column) -> DataFrame:
    """Attach the four reference partition columns (string-typed, as the
    reference's ``datepart(...)::STRING`` produces, main.go:93-96)."""
    return (
        df.withColumn("year", datepart_str("year", ts))
        .withColumn("month", datepart_str("month", ts))
        .withColumn("day", datepart_str("day", ts))
        .withColumn("hour", datepart_str("hour", ts))
    )


def _write(
    df: DataFrame, path: str, max_records_per_file: int | None, mode: str = "overwrite"
) -> None:
    # mode="overwrite" + dynamic partitionOverwriteMode = the one-shot
    # batch export (replace exactly the hours present).  mode="append"
    # = the per-micro-batch streaming path: the reference's {{rand}}
    # file names mean successive rotated-DB exports *accumulate* files
    # in an hour dir (OVERWRITE_OR_IGNORE never clobbers); append is
    # the faithful equivalent (T3's weak late-data contract).
    writer = df.write.mode(mode).partitionBy(*PARTITION_COLS)
    writer = writer.option("compression", "zstd")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def raw_with_partitions(bidreq: DataFrame) -> DataFrame:
    """Raw table + hour partitions from the precise-millis payload
    timestamp (main.go:101-108)."""
    ts = epoch_ms_precise(F.col("timestamp.seconds"), F.col("timestamp.nanos"))
    return with_hour_partitions(bidreq, ts)


def norm_with_partitions(norm: DataFrame) -> DataFrame:
    """Flat table + hour partitions from event_time (main.go:119-123)."""
    return with_hour_partitions(norm, epoch_ms_to_ts(F.col("event_time")))


def agg_with_partitions(agg: DataFrame) -> DataFrame:
    """hourly_agg() output + partitions from its (date, hour) keys, so
    each hour's aggregate lands in its hour dir like the reference's
    templated COPY (main.go:109-125)."""
    d = F.to_date(F.col("date"))
    return (
        agg.withColumn("year", F.year(d).cast("string"))
        .withColumn("month", F.month(d).cast("string"))
        .withColumn("day", F.dayofmonth(d).cast("string"))
        .withColumn("hour", F.col("hour").cast("string"))
    )


def write_raw_export(
    bidreq: DataFrame, path: str, max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Raw export: SELECT * partitioned by payload timestamp."""
    _write(raw_with_partitions(bidreq), path, max_records_per_file, mode)


def write_norm_export(
    norm: DataFrame, path: str, max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Flat-table export partitioned by event_time."""
    _write(norm_with_partitions(norm), path, max_records_per_file, mode)


def write_hourly_agg(
    agg: DataFrame, path: str, max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Aggregate export."""
    _write(agg_with_partitions(agg), path, max_records_per_file, mode)
