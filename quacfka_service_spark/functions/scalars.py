"""Scalar function layer — F1-F10 from SURVEY.md §2.8.

Each helper is the single definition shared by every DataFrame query so
the oracle SQL (written once in __spark_entry__.py) has exactly one
Spark counterpart to disagree with.  All are thin wrappers over
built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen
friendly; no Python UDFs anywhere in this layer.

Reference expressions at /root/reference/main.go:92-125 (DuckDB SQL)
and main.go:342-381 (Go normalizer).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(seconds: Column) -> Column:
    """F1: ``epoch_ms(timestamp.seconds * 1000)`` (main.go:93-96)."""
    return F.timestamp_millis(seconds.cast("long") * 1000)


def epoch_ms_precise(seconds: Column, nanos: Column) -> Column:
    """F2: ``epoch_ms(((seconds*1000)+(nanos/1000000))::BIGINT)``
    (main.go:105-108).

    Deviation, documented: DuckDB's ``CAST(double AS BIGINT)`` *rounds*
    while Spark's truncates, so instead of float-divide-then-cast both
    our Spark build and our oracle use integer division
    (``nanos // 1e6``) — millisecond floor.  Differs from the reference
    only in sub-millisecond rounding of the partition boundary.
    """
    ms = seconds.cast("long") * 1000 + F.floor(nanos.cast("long") / F.lit(1_000_000)).cast("long")
    return F.timestamp_millis(ms)


def datepart_str(part: str, ts: Column) -> Column:
    """F3+F7: ``datepart('year'|..., ts)::STRING`` (main.go:93-96)."""
    fn = {"year": F.year, "month": F.month, "day": F.dayofmonth, "hour": F.hour}[part]
    return fn(ts).cast("string")


def to_day_date(ts: Column) -> Column:
    """F4+F9: ``datetrunc('day', ts)::DATE`` (main.go:111)."""
    return F.date_trunc("day", ts).cast("date")


def extract_hour(ts: Column) -> Column:
    """F5: ``extract('hour' FROM ts)`` (main.go:112). BIGINT to match
    DuckDB's extract return type."""
    return F.hour(ts).cast("long")


def concat_resolution(width: Column, height: Column) -> Column:
    """F6: ``CONCAT(width::string, 'x', height::string)`` (main.go:115)."""
    return F.concat(width.cast("string"), F.lit("x"), height.cast("string"))


def event_time_seconds(seconds: Column, nanos: Column) -> Column:
    """F10: Go ``timestampSeconds + int64(timestampNanos/1000000000)``
    (main.go:366) — *integer* division, so the nanos term is always 0
    for valid nanos.  Replicated faithfully with DIV, not "fixed"."""
    return (seconds.cast("long") + F.floor(nanos.cast("long") / F.lit(1_000_000_000)).cast("long")).cast("long")


def coalesce_empty(*cols: Column) -> Column:
    """P6: first non-*empty* (proto3 zero value, not NULL) string —
    ``coalesceStringFunc`` at main.go:431-438."""
    return F.coalesce(*[F.nullif(c, F.lit("")) for c in cols])
