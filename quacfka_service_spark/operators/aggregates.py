"""The reference's three embedded queries, Spark-first.

All three are DuckDB SQL strings in the reference
(/root/reference/main.go:92-125) executed per rotated DB file by
quacfka-runner; here they are DataFrame builders over either the nested
``bidreq`` frame or the flat ``bidreq_norm`` frame.

Scale notes (100 TB):
- ``partition_enumeration`` and ``hourly_agg`` shuffle once on their
  group keys; partial (map-side) aggregation halves traffic for free.
- ``hourly_agg`` uses *exact* countDistinct (the reference does,
  main.go:117) — Catalyst rewrites it into a two-phase Expand plan;
  the group keys (date,hour,pub,device,resolution,deal) are
  high-cardinality enough that skew is not expected, and AQE skew
  handling is on in session.py regardless.
- ``raw_export_filter``'s hour predicate is a plain conjunction of
  scalar comparisons -> pushed to the parquet scan when the source is
  a lake read (PushedFilters), and prunes hive partitions outright on
  a ``year=/month=/day=/hour=`` layout written by sinks/parquet_lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    concat_resolution,
    datepart_str,
    epoch_ms_precise,
    epoch_ms_to_ts,
    extract_hour,
    to_day_date,
)


def partition_enumeration(bidreq: DataFrame) -> DataFrame:
    """A1+O1 (main.go:92-99): distinct (year,month,day,hour) strings
    present in a batch, ordered by ordinal 1,2,3,4 — the runner uses
    this to drive per-hour export; kept as a first-class query."""
    ts = epoch_ms_precise(F.col("timestamp.seconds"), F.col("timestamp.nanos"))
    return (
        bidreq.select(
            datepart_str("year", ts).alias("year"),
            datepart_str("month", ts).alias("month"),
            datepart_str("day", ts).alias("day"),
            datepart_str("hour", ts).alias("hour"),
        )
        .distinct()
        .orderBy("year", "month", "day", "hour")
    )


def hourly_flat(norm: DataFrame) -> DataFrame:
    """The pre-aggregate projection of hourly_agg: one row per input
    with the six group columns + bidreq_id.  Split out so the
    incremental maintainer (streaming/incremental_agg.py) can keep the
    DISTINCT of exactly these rows as its merge base."""
    ts = epoch_ms_to_ts(F.col("event_time"))
    return norm.select(
        to_day_date(ts).cast("string").alias("date"),
        extract_hour(ts).alias("hour"),
        F.col("pub_id"),
        F.col("device_id"),
        concat_resolution(F.col("width"), F.col("height")).alias("resolution"),
        F.col("deal"),
        F.col("bidreq_id"),
    )


def hourly_agg(norm: DataFrame) -> DataFrame:
    """A2 (main.go:109-125), the flagship: GROUP BY ALL over
    (date, hour, pub_id, device_id, resolution, deal) with exact
    count(distinct bidreq_id) AS requests."""
    flat = hourly_flat(norm)
    return flat.groupBy("date", "hour", "pub_id", "device_id", "resolution", "deal").agg(
        F.countDistinct("bidreq_id").alias("requests")
    )


def raw_export_filter(bidreq: DataFrame) -> DataFrame:
    """P1+P4 (main.go:101-108): the raw export's hour filter — a
    conjunctive equality on year/month/day/hour of the precise-millis
    timestamp.  The hour selected is the minimum hour present (the
    reference iterates all hours from A1; one deterministic hour is
    enough for the correctness gate).  Projects the scalar subset
    (FIXTURES.md §4) rather than the full nested row so the value-hash
    is well-defined.
    """
    ts = epoch_ms_precise(F.col("timestamp.seconds"), F.col("timestamp.nanos"))
    with_ts = bidreq.withColumn("__pts", ts)
    min_hour = with_ts.agg(F.min(F.date_trunc("hour", F.col("__pts"))).alias("__mh"))
    return (
        with_ts.crossJoin(F.broadcast(min_hour))
        .where(
            (F.year("__pts") == F.year("__mh"))
            & (F.month("__pts") == F.month("__mh"))
            & (F.dayofmonth("__pts") == F.dayofmonth("__mh"))
            & (F.hour("__pts") == F.hour("__mh"))
        )
        .select(
            F.col("id").alias("bidreq_id"),
            F.col("site.publisher.id").alias("pub_id"),
            F.col("site.id").alias("site_id"),
            F.col("user.id").alias("user_id"),
            F.col("device.ifa").alias("ifa"),
            F.col("timestamp.seconds").alias("seconds"),
            F.col("timestamp.nanos").cast("long").alias("nanos"),
            F.col("event_tm"),
        )
    )
