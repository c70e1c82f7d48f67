"""Sessionization over the ``events`` stream table.

Beyond the reference surface (it has no stateful ops, SURVEY.md T5):
the canonical gap-based session operator a training-data pipeline needs,
in two forms sharing one definition of "session":

- **batch** (here): lag + running-sum window functions — fully
  SQL-expressible, oracle-checked.  One shuffle on user_id; the two
  windows and the final groupBy share that partitioning, so Catalyst
  plans a single Exchange.
- **streaming** (streaming/sessionize.py): the same semantics as a
  custom stateful operator over ``applyInPandasWithState``.

A session = consecutive events of one user where each gap is
<= GAP_SECS (strictly greater starts a new session).  Ordering ties
broken by event_id so both engines sort identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_table

GAP_SECS = 1800


def sessionize(events: DataFrame, gap_secs: int = GAP_SECS) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    prev_sec = F.lag(sec).over(w)
    is_new = F.when(prev_sec.isNull() | (sec - prev_sec > gap_secs), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_idx = events.select(
        "user_id", "ts", "event_id", F.sum(is_new).over(run).alias("session_idx")
    )
    return (
        with_idx.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").cast("string").alias("session_start"),
            F.max("ts").cast("string").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


QUERIES = {"events_sessionize": _q_sessionize}

ORACLES = {
    "events_sessionize": f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) // 1000000 AS sec,
         lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec > {GAP_SECS} THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
idx AS (
  SELECT user_id, ts, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       min(ts)::VARCHAR AS session_start,
       max(ts)::VARCHAR AS session_end,
       count(*) AS n_events
FROM idx
GROUP BY user_id, session_idx
""",
}


# --- round-7 addition: top session paths -----------------------------------

PATH_TOP_K = 10
PATH_LEN = 3


def session_paths(events: DataFrame, gap_secs: int = GAP_SECS,
                  k: int = PATH_TOP_K) -> DataFrame:
    """(path, n_sessions, rank): the top-k most common session
    OPENINGS — the first ``PATH_LEN`` event types of each session,
    joined with '>' — the navigation-pattern query behind funnel
    design and landing-page triage ("how do sessions actually
    start?").

    Reuses the sessionizer's gap rule verbatim (same window exprs), so
    path grouping inherits its proven determinism; the per-session
    path is an ordered collect (sort_array of (ts, event_id, type)
    structs == DuckDB list(... ORDER BY ts, event_id)) truncated to
    PATH_LEN, all strings/BIGINTs — hash-exact.

    100 TB shape: the session windows ride one user_id exchange (as
    sessionize); the path agg is keyed (user, session) on the same
    partitioning; the final count is path-cardinality-sized with a
    TakeOrdered top-k — no global sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    prev_sec = F.lag(sec).over(w)
    is_new = F.when(prev_sec.isNull() | (sec - prev_sec > gap_secs), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_idx = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum(is_new).over(run).alias("session_idx"),
    )
    paths = with_idx.groupBy("user_id", "session_idx").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                PATH_LEN,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
        .select(
            "path",
            "n_sessions",
            F.row_number()
            .over(Window.orderBy(F.desc("n_sessions"), F.asc("path")))
            .cast("long")
            .alias("rank"),
        )
    )


def _q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_paths(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_session_paths": _q_session_paths})

ORACLES.update(
    {
        "events_session_paths": f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(ts) // 1000000 AS sec,
         lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec > {GAP_SECS} THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
idx AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
paths AS (
  SELECT array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id), 1, {PATH_LEN}),
           '>') AS path
  FROM idx GROUP BY user_id, session_idx
)
SELECT path, n_sessions, rank FROM (
  SELECT path, count(*)::BIGINT AS n_sessions,
         row_number() OVER (ORDER BY count(*) DESC, path ASC)::BIGINT AS rank
  FROM paths GROUP BY path
) WHERE rank <= {PATH_TOP_K}
""",
    }
)


# --- round-8 addition: daily bounce rate -------------------------------------


def bounce_rate(events: DataFrame, gap_secs: int = GAP_SECS) -> DataFrame:
    """(date, n_sessions, n_bounce, bounce_rate): per-day session
    counts and the fraction that are single-event "bounces" — the
    canonical engagement KPI over the gap sessionizer (a day whose
    bounce rate jumps is a tracking bug or a landing-page regression
    before it is anything else).  A session belongs to the DAY IT
    STARTS (sessions never split across the date boundary).

    Composed on the hash-proven sessionize kernel: one extra
    date-keyed integer agg + one division — engine-exact.

    100 TB shape: inherits sessionize's single user_id exchange; the
    daily rollup is a map-side-combined agg onto a calendar-bounded
    key space."""
    s = sessionize(events, gap_secs)
    per = s.select(
        F.to_date(F.col("session_start").cast("timestamp")).cast("string").alias(
            "date"
        ),
        (F.col("n_events") == 1).cast("int").alias("is_bounce"),
    )
    return per.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("is_bounce").cast("long").alias("n_bounce"),
        (F.sum("is_bounce") / F.count(F.lit(1))).alias("bounce_rate"),
    )


def _q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bounce_rate(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_bounce_rate": _q_bounce_rate})

# Composed from the hash-verified sessionize oracle.
ORACLES.update(
    {
        "events_bounce_rate": f"""
WITH s AS ({ORACLES["events_sessionize"]})
SELECT (session_start::TIMESTAMP)::DATE::VARCHAR AS date,
       count(*)::BIGINT AS n_sessions,
       sum((n_events = 1)::INT)::BIGINT AS n_bounce,
       sum((n_events = 1)::INT)::BIGINT / count(*)::BIGINT AS bounce_rate
FROM s GROUP BY 1
""",
    }
)
