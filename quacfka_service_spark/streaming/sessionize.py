"""Streaming sessionization: a custom stateful operator over
``applyInPandasWithState``.

Semantics identical to operators/sessionize.py (gap-based, GAP_SECS);
state per user = the open session (start, last event time, count).  A
new event either extends the open session or closes it (emitting one
output row) and opens a new one.  Open sessions stay in state until a
later event closes them — the streaming contract: only *closed*
sessions are emitted (append mode).

Late-data policy: events are sorted intra-batch; a cross-batch late
event (event time before the open session's last seen time) EXTENDS the
open session — it bumps n_events and can widen session_start, but never
rewinds session_end (max/min, not overwrite).  A late event older than
an already-*closed* session is counted into the open one; use the
watermarked windowed variant (streaming/windowed.py) when strict
late-event drop semantics are required.

This is the engine's UDF/UDTF extension point exercised statefully
(SURVEY.md X2's general case): Arrow-batched pandas per group, state
round-trips through the state store, partitioned by user_id so a 100 TB
event stream shards across executors with per-key state locality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sessionize import GAP_SECS

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.StringType()),
    T.StructField("session_end", T.StringType()),
    T.StructField("n_events", T.LongType()),
])

# state: (session_start_us, last_ts_us, n_events)
STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def _fmt(us: int) -> str:
    # match Spark's timestamp->string cast, which trims trailing
    # fractional zeros ("…54.12377", not "…54.123770")
    s = str(pd.Timestamp(us, unit="us"))
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = GAP_SECS * 1_000_000
    (user_id,) = key
    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    closed: list[dict[str, Any]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            us = ts.value // 1000  # pandas ns -> us
            if start_us is None:
                start_us, last_us, n = us, us, 1
            elif us - last_us > gap_us:
                closed.append({
                    "user_id": user_id,
                    "session_start": _fmt(start_us),
                    "session_end": _fmt(last_us),
                    "n_events": n,
                })
                start_us, last_us, n = us, us, 1
            else:
                # A late (out-of-order) event with us < last_us must not
                # rewind the open session's end — otherwise a subsequent
                # on-time event could falsely open a new session.  It can
                # still widen the start if it predates it.
                start_us = min(start_us, us)
                last_us, n = max(last_us, us), n + 1
    state.update((start_us, last_us, n))
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream -> closed-session stream (append)."""
    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
