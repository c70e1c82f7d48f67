"""Stream-stream interval join — the streaming twin of
``operators.joins.band_join``.

The reference has no stream-stream joins (SURVEY.md T5); this is the
additive Structured Streaming capability: two unbounded streams joined
on a key within a time band, with watermarks on BOTH sides so the join
state is bounded — each side buffers only rows younger than
(watermark - band), and older state is evicted exactly once the range
condition can no longer match.  Without the time-range predicate the
state would grow forever; Spark rejects unbounded stream-stream joins
in append mode for exactly that reason.

Semantics match band_join row-for-row: the coarse timestamp-interval
predicate (band + 1 s margin) is what Spark's state manager uses for
eviction, and the exact integer-second band filter on top reproduces
the batch operator's floor-seconds arithmetic, so a replay of the same
data through either path yields the identical pair set
(tests/test_streaming_joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LATENESS = "1 hour"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    band_secs: int,
    lts: str = "lts",
    rts: str = "rts",
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Inner join of two (streaming) frames on ``key`` with
    |floor_sec(lts) - floor_sec(rts)| <= band_secs.

    ``left``/``right`` must have disjoint column names apart from
    ``key``.  Works identically on batch frames (used by the
    equivalence test)."""
    l = left.withWatermark(lts, lateness) if left.isStreaming else left
    r = right.withWatermark(rts, lateness) if right.isStreaming else right
    r = r.withColumnRenamed(key, "_rkey")
    margin = f"INTERVAL {band_secs + 1} SECONDS"
    coarse = (
        (F.col(key) == F.col("_rkey"))
        & (F.col(rts) >= F.col(lts) - F.expr(margin))
        & (F.col(rts) <= F.col(lts) + F.expr(margin))
    )
    lsec = F.unix_timestamp(F.col(lts)).cast("long")
    rsec = F.unix_timestamp(F.col(rts)).cast("long")
    return (
        l.join(r, coarse)
        .where(F.abs(lsec - rsec) <= band_secs)
        .withColumn("dt_sec", lsec - rsec)
        .drop("_rkey")
    )
