"""Incremental (watermarked) hourly aggregation — the idiomatic
alternative to the reference's batch-per-rotated-file hour bucketing.

The reference computes hour aggregates post-hoc per 4200 MB DuckDB file
(/root/reference/main.go:92-125): a late message lands in whichever
file is open and its hour is re-exported wholesale (SURVEY.md T2/T3 —
no watermark, duplicate hour outputs across files possible).  Spark's
native form is a tumbling ``window`` aggregate with a watermark:

- state is bounded (hours older than the watermark are finalized and
  dropped — the reference's unbounded "whichever file is open" contract
  replaced by an explicit lateness budget);
- each hour partition is emitted exactly once, when it closes (append
  mode), so downstream consumers never see partial aggregates;
- exact per-hour distinct is achieved by deduplicating on the count key
  *within the watermark* before the windowed count — the streaming
  equivalent of A2/A3's exact ``count(distinct bidreq_id)``
  (main.go:117): after dedup, ``count(*)`` == ``count(distinct)``.

Chained stateful operators (dedup -> windowed agg) require append mode
and an event-time watermark — exactly what this builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import concat_resolution, epoch_ms_to_ts

DEFAULT_LATENESS = "2 hours"

GROUP_COLS = ["pub_id", "device_id", "resolution", "deal"]


def incremental_hourly_agg(norm: DataFrame, lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """bidreq_norm stream -> per-hour aggregate stream (append mode).

    Output schema matches hourly_agg() (date, hour, group keys,
    requests) plus the window bounds for audit.
    """
    ts = epoch_ms_to_ts(F.col("event_time"))
    evented = norm.select(
        ts.alias("ts"),
        F.col("bidreq_id"),
        F.col("pub_id"),
        F.col("device_id"),
        concat_resolution(F.col("width"), F.col("height")).alias("resolution"),
        F.col("deal"),
    ).withWatermark("ts", lateness)

    # exact distinct: drop duplicate (hour, group-key, bidreq_id)
    # tuples within the watermark, then a plain count ==
    # count(distinct).  The dedup key buckets by hour (not raw ts) so
    # an id recurring in two hours still counts once per hour, exactly
    # like the batch groupBy(date,hour,...).countDistinct.  NULL deal
    # must survive the dedup (explode_outer's no-deals row), so the
    # deal key is null-coalesced (to a NUL sentinel no real deal id
    # contains) for the dedup only.
    deduped = evented.withColumns({
        "_hour_bucket": F.date_trunc("hour", F.col("ts")),
        "_deal_key": F.coalesce(F.col("deal"), F.lit("\x00")),
    }).dropDuplicatesWithinWatermark(
        ["_hour_bucket", "bidreq_id", "pub_id", "device_id", "resolution", "_deal_key"]
    )

    agg = (
        deduped.groupBy(F.window("ts", "1 hour"), *GROUP_COLS)
        .agg(F.count(F.lit(1)).alias("requests"))
        .select(
            F.to_date(F.col("window.start")).cast("string").alias("date"),
            F.hour(F.col("window.start")).cast("long").alias("hour"),
            *GROUP_COLS,
            F.col("requests"),
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
        )
    )
    return agg
