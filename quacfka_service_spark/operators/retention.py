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
        # each stage's user frame anchors BOTH its count row and the
        # next stage's join: checkpoint it (r11, guide §5) so stage k
        # runs once instead of being re-expanded under every later
        # stage (the chain re-derivation was O(steps^2) event scans)
        cur = (
            stage.groupBy("user_id")
            .agg(F.min("ts").alias("_prev_ts"))
            .localCheckpoint(eager=False)
        )
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


FUNNEL_WINDOW_HOURS = 24


def funnel_windowed(
    ev: DataFrame,
    steps: list[str] | None = None,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> DataFrame:
    """Time-bounded funnel: step k converts only with an event of type
    steps[k] within ``window_hours`` AFTER the step k-1 conversion —
    the form product analytics actually reports ("purchased within 24h
    of clicking"), where the unbounded funnel overcounts stragglers.
    Interval arithmetic on timestamps is exact integer micros on both
    engines.  Same shape as ``funnel``: chained shrinking min-ts
    aggregates, every exchange keyed on user_id.

    Output: (step_idx long, step string, n_users long)."""
    steps = steps or FUNNEL_STEPS
    ev = ev.select("user_id", "event_type", "ts")
    win = F.expr(f"INTERVAL {int(window_hours)} HOURS")
    prev: DataFrame | None = None
    out: list[DataFrame] = []
    for i, step in enumerate(steps):
        stage = ev.where(F.col("event_type") == step)
        if prev is not None:
            stage = stage.join(prev, "user_id").where(
                (F.col("ts") >= F.col("_prev_ts"))
                & (F.col("ts") <= F.col("_prev_ts") + win)
            )
        # each stage's user frame anchors BOTH its count row and the
        # next stage's join: checkpoint it (r11, guide §5) so stage k
        # runs once instead of being re-expanded under every later
        # stage (the chain re-derivation was O(steps^2) event scans)
        cur = (
            stage.groupBy("user_id")
            .agg(F.min("ts").alias("_prev_ts"))
            .localCheckpoint(eager=False)
        )
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


def _q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_windowed(load_table(spark, sf_dir, "events"))


def user_growth(ev: DataFrame) -> DataFrame:
    """Cumulative-user growth curve: per day, how many users appeared
    for the FIRST time, and the running total.  The running distinct
    count is NOT a windowed countDistinct (unsupported and quadratic):
    first-seen day per user collapses the corpus to |users| rows, the
    per-day new-user counts collapse to |days| rows, and the cumsum
    window runs over that day-cardinality table — at 100 TB the window
    input is a few thousand rows regardless of event count.  Output
    (day string, new_users, cum_users)."""
    from pyspark.sql.window import Window

    first = (
        ev.select("user_id", to_day_date(F.col("ts")).alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
    )
    per_day = first.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


ROLLING_WINDOW_DAYS = 7


def rolling_active_users(ev: DataFrame, window_days: int = ROLLING_WINDOW_DAYS) -> DataFrame:
    """WAU-style rolling distinct actives: for each day with activity,
    the distinct users active in the ``window_days`` window ENDING that
    day.  No range join: each distinct (user, day) row fans out to the
    <= 7 window-end days it contributes to (explode of a date
    sequence), then one countDistinct per window day, restricted to
    days that actually occur (left-semi against the day spine).  One
    shuffle keyed on the window day; fan-out factor is the window
    length, not data size."""
    ud = ev.select("user_id", to_day_date(F.col("ts")).alias("d")).distinct()
    spine = ud.select("d").distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("w"),
    )
    return (
        fan.join(spine, fan.w == spine.d, "left_semi")
        .groupBy("w")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(F.col("w").cast("string").alias("day"), "active_users")
    )


def event_transitions(ev: DataFrame) -> DataFrame:
    """Markov transition counts: per user, order events by (ts,
    event_id) and count each consecutive (prev_type -> next_type) step
    — the behavioral-flow matrix behind path/journey analysis.

    100 TB shape: ONE shuffle keyed on user_id for the per-user sort
    (window lag), then a map-side-combined aggregate over a key space
    bounded by |event_type|² (tens of rows) — the output never scales
    with data.  Output (prev_type, next_type, n)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    return steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )


# --- queries()/oracle_sql() registrations ---------------------------------

def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(load_table(spark, sf_dir, "events"))


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(load_table(spark, sf_dir, "events"))


def _q_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_growth(load_table(spark, sf_dir, "events"))


def _q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_active_users(load_table(spark, sf_dir, "events"))


def _q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_retention": _q_retention,
    "events_funnel": _q_funnel,
    "events_funnel_windowed": _q_funnel_windowed,
    "events_user_growth": _q_user_growth,
    "events_rolling_active_users": _q_rolling_active,
    "events_transitions": _q_transitions,
}

ORACLES = {
    "events_transitions": """
WITH s AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
)
SELECT prev_type, next_type, count(*)::BIGINT AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
""",
    "events_user_growth": """
WITH first AS (
  SELECT user_id, min(datetrunc('day', ts)::DATE) AS d FROM events GROUP BY user_id
),
per_day AS (SELECT d, count(*)::BIGINT AS new_users FROM first GROUP BY d)
SELECT d::VARCHAR AS day, new_users,
       sum(new_users) OVER (ORDER BY d)::BIGINT AS cum_users
FROM per_day
""",
    "events_rolling_active_users": f"""
WITH ud AS (
  SELECT DISTINCT user_id, datetrunc('day', ts)::DATE AS d FROM events
),
spine AS (SELECT DISTINCT d FROM ud),
fan AS (
  SELECT user_id, unnest(generate_series(d, d + INTERVAL {ROLLING_WINDOW_DAYS - 1} DAY, INTERVAL 1 DAY))::DATE AS w
  FROM ud
)
SELECT w::VARCHAR AS day, count(DISTINCT user_id)::BIGINT AS active_users
FROM fan SEMI JOIN spine ON fan.w = spine.d
GROUP BY w
""",
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
    "events_funnel_windowed": f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS pts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS pts FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.pts
    AND e.ts <= t1.pts + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS pts FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.pts
    AND e.ts <= t2.pts + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
)
SELECT 1::BIGINT AS step_idx, 'view' AS step, count(*) AS n_users FROM t1
UNION ALL
SELECT 2::BIGINT, 'click', count(*) FROM t2
UNION ALL
SELECT 3::BIGINT, 'purchase', count(*) FROM t3
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


# --- round-7 addition: first/last-touch attribution ------------------------


def attribution(ev: DataFrame) -> DataFrame:
    """(event_id, user_id, first_touch, last_touch, touches): for each
    purchase, the marketing-attribution credit assignment — the FIRST
    and the LAST non-purchase event type in the user's preceding
    journey, plus how many touches preceded (first-touch / last-touch
    attribution, the two standard credit models).

    Purchases with no preceding touch keep NULL types and touches = 0
    (organic conversions are a real reporting row, not a dropped one).

    Determinism: one per-user window over the total order (ts,
    event_id); first/last use IGNORE NULLS over a frame ending at
    1 PRECEDING so the purchase itself never self-attributes — the
    same window semantics in both engines, all strings/BIGINTs.

    100 TB shape: ONE hash exchange on user_id + one sort carries all
    three window aggregates (same-frame expressions share the window
    operator); the purchase filter projects after, so no second pass.
    """
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
            F.sum(F.when(touch.isNotNull(), 1).otherwise(0))
            .over(w)
            .alias("t_raw"),
        )
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "first_touch",
            "last_touch",
            F.coalesce("t_raw", F.lit(0)).cast("long").alias("touches"),
        )
    )


def _q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attribution(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_attribution": _q_attribution})

ORACLES.update(
    {
        "events_attribution": """
SELECT event_id, user_id, first_touch, last_touch,
       coalesce(t_raw, 0)::BIGINT AS touches
FROM (
  SELECT event_id, user_id, event_type,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS) OVER w AS first_touch,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS last_touch,
         sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
             OVER w AS t_raw
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
WHERE event_type = 'purchase'
""",
    }
)


def conversion_time(ev: DataFrame) -> DataFrame:
    """(n_converted, p50_ms, p90_ms, max_ms): time from a user's FIRST
    signup to their FIRST subsequent purchase — the latency behind the
    funnel counts (two funnels with equal conversion can hide a 10x
    time-to-value gap).

    Deltas are epoch-millis BIGINTs; exact interpolated percentiles of
    integers round to 6 dp DECIMAL strings (the events_quantiles
    idiom), so the single-row report hash-checks exactly.

    100 TB shape: two type-filtered min aggs keyed by user (map-side
    combined; the filters push to the scan), one user-keyed join, a
    1-row final agg.
    """
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.first("s_ts").alias("s_ts"))
    )
    delta = (F.unix_millis("p_ts") - F.unix_millis("s_ts")).alias("d")
    deltas = pu.select(delta)

    def q(p, name):
        return (
            F.round(F.percentile("d", F.lit(p)), 6)
            .cast("decimal(28,6)")
            .cast("string")
            .alias(name)
        )

    return deltas.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        q(0.5, "p50_ms"),
        q(0.9, "p90_ms"),
        F.max("d").cast("long").alias("max_ms"),
    )


def _q_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversion_time(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_conversion_time": _q_conversion_time})

ORACLES.update(
    {
        "events_conversion_time": """
WITH su AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
pu AS (
  SELECT e.user_id, min(e.ts) AS p_ts, min(su.s_ts) AS s_ts
  FROM events e JOIN su USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
  GROUP BY 1
),
d AS (SELECT epoch_ms(p_ts) - epoch_ms(s_ts) AS d FROM pu)
SELECT count(*)::BIGINT AS n_converted,
       round(quantile_cont(d, 0.5), 6)::DECIMAL(28,6)::VARCHAR AS p50_ms,
       round(quantile_cont(d, 0.9), 6)::DECIMAL(28,6)::VARCHAR AS p90_ms,
       max(d)::BIGINT AS max_ms
FROM d
""",
    }
)


def growth_accounting(ev: DataFrame) -> DataFrame:
    """(week, new_users, retained, resurrected, churned): weekly
    growth accounting — every active user classified as NEW (first
    ever week), RETAINED (also active the prior week) or RESURRECTED
    (returning after a gap), plus CHURNED (active prior week, absent
    this week, attributed to the first absent week).  The standard
    decomposition behind "is growth new demand or resurrection?".

    Determinism: presence collapses to distinct (user, week) rows
    (date_trunc('week') = ISO Monday in BOTH engines); classification
    is lag/lead day-arithmetic on those rows — integers only.  Churn
    weeks are attributed to week+7d even if the corpus has no other
    activity that week (both engines emit the same spine).

    100 TB shape: the corpus collapses to |users x active weeks| rows
    in one map-side-combined distinct; the lag/lead windows ride one
    user_id exchange; the four counts are week-cardinality aggs
    full-outer-merged on week.
    """
    from pyspark.sql.window import Window as W

    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    win = W.partitionBy("user_id").orderBy("w")
    flagged = uw.select(
        "user_id",
        "w",
        F.lag("w").over(win).alias("pw"),
        F.lead("w").over(win).alias("nw"),
    )
    gap = F.datediff(F.col("w"), F.col("pw"))
    cls = (
        F.when(F.col("pw").isNull(), F.lit("new"))
        .when(gap == 7, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    counts = (
        flagged.select("w", cls.alias("cls"))
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0)).cast("long").alias("new_users"),
            F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0)).cast("long").alias("retained"),
            F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0)).cast("long").alias("resurrected"),
        )
    )
    ngap = F.datediff(F.col("nw"), F.col("w"))
    churn = (
        flagged.where(F.col("nw").isNull() | (ngap > 7))
        .select(F.date_add(F.col("w"), 7).cast("timestamp").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    z = F.lit(0).cast("long")
    return (
        counts.join(churn, "w", "full")
        .select(
            "w",
            F.coalesce("new_users", z).alias("new_users"),
            F.coalesce("retained", z).alias("retained"),
            F.coalesce("resurrected", z).alias("resurrected"),
            F.coalesce("churned", z).alias("churned"),
        )
    )


def _q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    return growth_accounting(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_growth_accounting": _q_growth_accounting})

ORACLES.update(
    {
        "events_growth_accounting": """
WITH uw AS (
  SELECT DISTINCT user_id, datetrunc('week', ts) AS w FROM events
),
flagged AS (
  SELECT user_id, w,
         lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw,
         lead(w) OVER (PARTITION BY user_id ORDER BY w) AS nw
  FROM uw
),
counts AS (
  SELECT w,
         sum(CASE WHEN pw IS NULL THEN 1 ELSE 0 END)::BIGINT AS new_users,
         sum(CASE WHEN pw IS NOT NULL AND datediff('day', pw, w) = 7
                  THEN 1 ELSE 0 END)::BIGINT AS retained,
         sum(CASE WHEN pw IS NOT NULL AND datediff('day', pw, w) > 7
                  THEN 1 ELSE 0 END)::BIGINT AS resurrected
  FROM flagged GROUP BY w
),
churn AS (
  SELECT w + INTERVAL 7 DAY AS w, count(*)::BIGINT AS churned
  FROM flagged
  WHERE nw IS NULL OR datediff('day', w, nw) > 7
  GROUP BY 1
)
SELECT coalesce(c.w, ch.w) AS w,
       coalesce(c.new_users, 0)::BIGINT AS new_users,
       coalesce(c.retained, 0)::BIGINT AS retained,
       coalesce(c.resurrected, 0)::BIGINT AS resurrected,
       coalesce(ch.churned, 0)::BIGINT AS churned
FROM counts c FULL OUTER JOIN churn ch ON c.w = ch.w
""",
    }
)
