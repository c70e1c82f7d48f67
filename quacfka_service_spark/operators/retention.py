"""Cohort retention and funnel analytics over ``events``.

Product-analytics shapes every events warehouse serves (the reference's
events surface stops at GROUP BY — SURVEY.md §2.4; these are additive
generality operators in the same spirit as ``olap.py``).

Physical shapes at 100 TB:

- Retention: distinct (user, day) -> per-user min -> self-join.  All
  three steps key on ``user_id``, so every exchange hash-partitions on
  the same column and AQE coalesces; the per-user cohort table is
  |users| rows (orders of magnitude under the event count) and the
  final aggregate is tiny (cohorts x 8 offsets).
- Funnel: three shrinking per-user min-aggregates chained by joins,
  all keyed on ``user_id``.  Each stage's input is a filtered subset
  of the last (map-side predicate pushdown on ``event_type`` reaches
  the parquet scan), so the expensive first hash-agg dominates and
  later stages are progressively cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import to_day_date
from ..session import load_table

RETENTION_MAX_OFFSET = 7
FUNNEL_STEPS = ["view", "click", "purchase"]


def cohort_retention(ev: DataFrame, max_offset: int = RETENTION_MAX_OFFSET) -> DataFrame:
    """Users active N days after their cohort (first-seen) day.

    Output: (cohort_day string, day_offset long, n_users long); a user
    contributes once per active day, so offset 0 is the cohort size.
    """
    activity = ev.select(
        "user_id", to_day_date(F.col("ts")).alias("d")
    ).distinct()
    first = activity.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        activity.join(first, "user_id")
        .select(
            F.col("cohort").cast("string").alias("cohort_day"),
            F.datediff("d", "cohort").cast("long").alias("day_offset"),
            "user_id",
        )
        .where(F.col("day_offset").between(0, max_offset))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel(ev: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """Ordered-step conversion: a user converts step k only with an
    event of type steps[k] at-or-after their step k-1 conversion time
    (min-ts semantics, the standard unordered-window funnel).

    Output: (step_idx long, step string, n_users long).
    """
    steps = steps or FUNNEL_STEPS
    ev = ev.select("user_id", "event_type", "ts")
    prev: DataFrame | None = None
    out: list[DataFrame] = []
    for i, step in enumerate(steps):
        stage = ev.where(F.col("event_type") == step)
        if prev is not None:
            stage = stage.join(prev, "user_id").where(F.col("ts") >= F.col("_prev_ts"))
        cur = stage.groupBy("user_id").agg(F.min("ts").alias("_prev_ts"))
        out.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
        prev = cur
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


# --- queries()/oracle_sql() registrations ---------------------------------

def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(load_table(spark, sf_dir, "events"))


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_retention": _q_retention,
    "events_funnel": _q_funnel,
}

ORACLES = {
    "events_retention": f"""
WITH activity AS (
  SELECT DISTINCT user_id, datetrunc('day', ts)::DATE AS d FROM events
),
first AS (
  SELECT user_id, min(d) AS cohort FROM activity GROUP BY user_id
)
SELECT
  a.cohort_day, a.day_offset, count(*) AS n_users
FROM (
  SELECT
    f.cohort::VARCHAR AS cohort_day,
    datediff('day', f.cohort, activity.d)::BIGINT AS day_offset
  FROM activity JOIN first f USING (user_id)
) a
WHERE a.day_offset BETWEEN 0 AND {RETENTION_MAX_OFFSET}
GROUP BY a.cohort_day, a.day_offset
""",
    "events_funnel": """
WITH t1 AS (
  SELECT user_id, min(ts) AS pts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS pts FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.pts GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS pts FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.pts GROUP BY e.user_id
)
SELECT 1::BIGINT AS step_idx, 'view' AS step, count(*) AS n_users FROM t1
UNION ALL
SELECT 2::BIGINT, 'click', count(*) FROM t2
UNION ALL
SELECT 3::BIGINT, 'purchase', count(*) FROM t3
""",
}
