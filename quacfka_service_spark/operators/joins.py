"""Time-series joins the reference lacks but a production analytics
engine needs: as-of join, banded (interval) join, and a keyless range
join (SURVEY.md §2.3 notes the reference has no joins at all — these are
additive generality operators, each with a scale-first physical plan).

Scale rationale (100 TB target):

- ``asof_join`` is the union+window formulation: both sides shuffle
  ONCE on the key, sort by (ts, side), and a running ``last(...,
  ignorenulls)`` carries the most recent right-side row forward.  Cost
  is one Exchange + one sort — identical asymptotics to a sort-merge
  join, with no per-key Python and no point-in-time subquery explosion.
  tests/test_joins_olap.py pins the single-Exchange plan.
- ``band_join`` has an equi key, so Catalyst plans a shuffled join on
  the key with the band predicate as a residual filter — never a
  nested-loop product.
- ``range_join_binned`` has NO equi key; a naive inequality join would
  be a BroadcastNestedLoopJoin (quadratic).  Binning timestamps to
  band-width buckets and exploding the left side to its three candidate
  buckets manufactures an equi key: each qualifying pair lands in
  exactly one (left-bin, right-bin) pair, so no dedup is needed and the
  join is an ordinary shuffled hash join on ``_bin``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "r_",
    tolerance_secs: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the closest right row for the same key
    (NULLs when none): ``direction="backward"`` takes the latest right
    row with ``right.ts <= left.ts``; ``"forward"`` the earliest with
    ``right.ts >= left.ts`` (pandas ``merge_asof`` directions; both
    inclusive).

    ``right`` must be unique per (key, ts) — pre-aggregate with
    ``max_by`` if it is not — otherwise the carried row among ties is
    nondeterministic.  With ``tolerance_secs``, matches farther than
    the tolerance are nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    backward = direction == "backward"
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_cols], F.col(ts).alias("_asof_ts")
    )
    # sort the right side toward the left row at equal ts so the match
    # is inclusive: right before left (backward), after left (forward)
    r_side, l_side = (0, 1) if backward else (1, 0)
    r = right.select(
        F.col(key), F.col(ts), payload.alias("_r"), F.lit(r_side).alias("_side")
    )
    l = left.withColumn("_side", F.lit(l_side))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = Window.partitionBy(key).orderBy(ts, "_side")
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = F.first("_r", ignorenulls=True).over(w)
    if tolerance_secs is not None:
        lsec = F.unix_timestamp(F.col(ts))
        rsec = F.unix_timestamp(carried["_asof_ts"])
        age = (lsec - rsec) if backward else (rsec - lsec)
        carried = F.when(age <= tolerance_secs, carried)

    out = unioned.withColumn("_carried", carried).where(F.col("_side") == l_side)
    keep = [c for c in left.columns]
    proj = [F.col(c) for c in keep]
    proj += [F.col("_carried")[c].alias(f"{prefix}{c}") for c in right_cols]
    proj += [F.col("_carried")["_asof_ts"].alias(f"{prefix}{ts}")]
    return out.select(*proj)


def band_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    band_secs: int,
    lts: str = "lts",
    rts: str = "rts",
) -> DataFrame:
    """All (left, right) pairs sharing ``key`` whose integer-second
    timestamps differ by at most ``band_secs``.  Column names other
    than ``key`` must already be disjoint between the two frames."""
    lsec = F.unix_timestamp(F.col(lts)).cast("long")
    rsec = F.unix_timestamp(F.col(rts)).cast("long")
    joined = left.join(right, key).where(F.abs(lsec - rsec) <= band_secs)
    return joined.withColumn("dt_sec", lsec - rsec)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    band_secs: int,
    lts: str = "lts",
    rts: str = "rts",
) -> DataFrame:
    """Keyless range join: pairs with |left.ts - right.ts| <= band_secs
    (integer seconds).  Binned to avoid a nested-loop product: bin
    width = band, left explodes to {bin-1, bin, bin+1}, right keeps its
    own bin, equi-join on the bin, exact predicate as residual filter.
    |lsec-rsec| <= band implies the bins differ by at most 1, and the
    right bin is single-valued, so each pair matches exactly once."""
    B = band_secs
    lsec = F.unix_timestamp(F.col(lts)).cast("long")
    rsec = F.unix_timestamp(F.col(rts)).cast("long")
    lbin = F.floor(lsec / B)
    l2 = left.withColumn("_lsec", lsec).withColumn(
        "_bin", F.explode(F.array(lbin - 1, lbin, lbin + 1))
    )
    r2 = right.withColumn("_rsec", rsec).withColumn("_bin", F.floor(rsec / B))
    return (
        l2.join(r2, "_bin")
        .where(F.abs(F.col("_lsec") - F.col("_rsec")) <= B)
        .withColumn("dt_sec", F.col("_lsec") - F.col("_rsec"))
        .drop("_bin", "_lsec", "_rsec")
    )


# --- queries()/oracle_sql() registrations ---------------------------------

ASOF_BAND_SECS = 1800
RANGE_BAND_SECS = 900


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")


def _purchases_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases deduped to one row per (user_id, ts) so the as-of
    match is deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest purchase at-or-before each click, per user."""
    j = asof_join(
        _clicks(spark, sf_dir),
        _purchases_unique(spark, sf_dir),
        key="user_id",
        ts="ts",
        right_cols=["event_id"],
        prefix="purchase_",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("ts"),
        F.col("purchase_event_id").cast("long").alias("purchase_event_id"),
        F.col("purchase_ts").cast("string").alias("purchase_ts"),
    )


def _q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest purchase at-or-after each click, per user."""
    j = asof_join(
        _clicks(spark, sf_dir),
        _purchases_unique(spark, sf_dir),
        key="user_id",
        ts="ts",
        right_cols=["event_id"],
        prefix="purchase_",
        direction="forward",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("ts"),
        F.col("purchase_event_id").cast("long").alias("purchase_event_id"),
        F.col("purchase_ts").cast("string").alias("purchase_ts"),
    )


def _q_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, purchase) pair of one user within +-30 min."""
    l = _clicks(spark, sf_dir).select(
        F.col("event_id").alias("l_event_id"), "user_id", F.col("ts").alias("lts")
    )
    ev = load_table(spark, sf_dir, "events")
    r = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"), "user_id", F.col("ts").alias("rts")
    )
    return band_join(l, r, key="user_id", band_secs=ASOF_BAND_SECS).select(
        "user_id", "l_event_id", "r_event_id", "dt_sec"
    )


def _q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless: every (error, signup) event pair within +-15 min,
    across all users."""
    ev = load_table(spark, sf_dir, "events")
    l = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("l_event_id"), F.col("ts").alias("lts")
    )
    r = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("r_event_id"), F.col("ts").alias("rts")
    )
    return range_join_binned(l, r, band_secs=RANGE_BAND_SECS).select(
        "l_event_id", "r_event_id", "dt_sec"
    )


QUERIES = {
    "asof_join": _q_asof_join,
    "asof_join_forward": _q_asof_join_forward,
    "band_join": _q_band_join,
    "range_join_binned": _q_range_join_binned,
}

ORACLES = {
    "asof_join": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r0 AS (
  SELECT user_id, ts, max(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts::VARCHAR AS ts,
       r0.purchase_event_id, r0.ts::VARCHAR AS purchase_ts
FROM l ASOF LEFT JOIN r0
  ON l.user_id = r0.user_id AND l.ts >= r0.ts
""",
    "asof_join_forward": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r0 AS (
  SELECT user_id, ts, max(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts::VARCHAR AS ts,
       r0.purchase_event_id, r0.ts::VARCHAR AS purchase_ts
FROM l ASOF LEFT JOIN r0
  ON l.user_id = r0.user_id AND l.ts <= r0.ts
""",
    # NB: epoch(ts) in DuckDB is a DOUBLE (rounds at microsecond
    # precision -> off-by-one vs Spark's exact unix_timestamp floor);
    # epoch_us // 1_000_000 is the exact integer floor.
    "band_join": f"""
SELECT l.user_id,
       l.event_id AS l_event_id,
       r.event_id AS r_event_id,
       epoch_us(l.ts) // 1000000 - epoch_us(r.ts) // 1000000 AS dt_sec
FROM (SELECT * FROM events WHERE event_type = 'click') l
JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND abs(epoch_us(l.ts) // 1000000 - epoch_us(r.ts) // 1000000) <= {ASOF_BAND_SECS}
""",
    "range_join_binned": f"""
SELECT l.event_id AS l_event_id,
       r.event_id AS r_event_id,
       epoch_us(l.ts) // 1000000 - epoch_us(r.ts) // 1000000 AS dt_sec
FROM (SELECT * FROM events WHERE event_type = 'error') l
JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON abs(epoch_us(l.ts) // 1000000 - epoch_us(r.ts) // 1000000) <= {RANGE_BAND_SECS}
""",
}


# --- round-8 addition: nearest-direction as-of join --------------------------


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """pandas ``merge_asof(direction="nearest")``: for each left row,
    the right row (same key) minimizing |right.ts - left.ts|; exact
    ties prefer the BACKWARD match (the at-or-before row), matching
    the backward-biased tie pandas produces.  NULLs when the key has
    no right rows at all.

    Composition of the two hash-proven directional kernels: one
    backward and one forward pass (each a single key exchange + sort),
    then a per-row microsecond-exact comparison picks the closer side
    — integer epoch_us arithmetic on both engines, so the choice (and
    therefore the report) hash-matches.  Same uniqueness contract as
    asof_join: ``right`` unique per (key, ts)."""
    b = asof_join(left, right, key, ts, right_cols, prefix="_b_")
    f = asof_join(left, right, key, ts, right_cols, prefix="_f_", direction="forward")
    on = list(left.columns)
    j = b.join(f, on)
    db = F.unix_micros(F.col(ts)) - F.unix_micros(F.col(f"_b_{ts}"))
    df_ = F.unix_micros(F.col(f"_f_{ts}")) - F.unix_micros(F.col(ts))
    pick_b = F.col(f"_f_{ts}").isNull() | (
        F.col(f"_b_{ts}").isNotNull() & (db <= df_)
    )
    proj = [F.col(c) for c in on]
    for c in right_cols + [ts]:
        proj.append(
            F.when(pick_b, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"{prefix}{c}")
        )
    return j.select(*proj)


def _q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest purchase in either direction per click, per user."""
    j = asof_join_nearest(
        _clicks(spark, sf_dir),
        _purchases_unique(spark, sf_dir),
        key="user_id",
        ts="ts",
        right_cols=["event_id"],
        prefix="purchase_",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("ts"),
        F.col("purchase_event_id").cast("long").alias("purchase_event_id"),
        F.col("purchase_ts").cast("string").alias("purchase_ts"),
    )


QUERIES.update({"asof_join_nearest": _q_asof_join_nearest})

# DuckDB's ASOF JOIN is directional only, so the nearest oracle ranks
# each click's candidate purchases by (|epoch_us diff| ASC, ts ASC) —
# the ts ASC tie-break IS the backward preference (the earlier of two
# equidistant purchases is the at-or-before one).
ORACLES.update(
    {
        "asof_join_nearest": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r0 AS (
  SELECT user_id, ts, max(event_id) AS purchase_event_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
),
cand AS (
  SELECT l.event_id, l.user_id, l.ts, r0.purchase_event_id, r0.ts AS pts,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY abs(epoch_us(l.ts) - epoch_us(r0.ts)) ASC, r0.ts ASC
         ) AS rn
  FROM l JOIN r0 USING (user_id)
)
SELECT l.event_id, l.user_id, l.ts::VARCHAR AS ts,
       c.purchase_event_id, c.pts::VARCHAR AS purchase_ts
FROM l LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.event_id = l.event_id
""",
    }
)
