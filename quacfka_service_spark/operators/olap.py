"""OLAP surface beyond the reference's three queries: multi-level
aggregation (ROLLUP / CUBE / GROUPING SETS), pivot / unpivot, exact
quantiles, and JSON field extraction over ``events.props``.

The reference's only aggregation shapes are flat GROUP BY ALL
(SURVEY.md §2.4); these are additive generality operators.  All of
them are single-shuffle hash aggregates — rollup/cube expand each
input row to its grouping-set combinations BEFORE the exchange
(Catalyst's Expand node), so partial aggregation still applies and
the shuffle carries pre-combined partial rows, which is the plan you
want at 100 TB.  Pivot compiles to conditional aggregates (one
``count(CASE WHEN ...)`` per pivot value) — one shuffle, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import extract_hour, to_day_date
from ..session import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events_with_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        to_day_date(F.col("ts")).cast("string").alias("day"),
        extract_hour(F.col("ts")).alias("hr"),
        "event_type",
        "user_id",
        "value",
        "props",
        "event_id",
    )


def rollup_counts(ev: DataFrame) -> DataFrame:
    """(day, event_type) hierarchy: per-pair, per-day, grand total.
    gid bits: day is the MSB (Spark grouping_id convention)."""
    return ev.rollup("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid")
    )


def cube_counts(ev: DataFrame) -> DataFrame:
    """All 2^2 grouping combinations of (event_type, hr)."""
    return ev.cube("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid")
    )


def pivot_counts(ev: DataFrame) -> DataFrame:
    """Day x event_type count matrix, compiled to conditional
    aggregates (``count(CASE WHEN type = t)`` per pinned value).  The
    native ``groupBy().pivot(col, values)`` API plans TWO exchanges
    (pre-aggregate by (day, type), then pivot); this form is one
    shuffle with map-side partials — the plan you want on 100 TB.
    Values are pinned (EVENT_TYPES): never let pivot run its
    distinct-scan job on the full input.  test_joins_olap_split.py
    proves equivalence with the native pivot API."""
    return ev.groupBy("day").agg(
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(t)
            for t in EVENT_TYPES
        ]
    )


def unpivot_counts(ev: DataFrame) -> DataFrame:
    """Melt the pivot matrix back to (day, event_type, n) — zero-count
    combinations survive as n=0 rows (pivot/unpivot round trip)."""
    return pivot_counts(ev).unpivot(["day"], EVENT_TYPES, "event_type", "n")


def exact_quantiles(ev: DataFrame) -> DataFrame:
    """Exact linear-interpolation percentiles of value per type.
    DECIMAL(18,6) after a 6-dp round pins one cross-engine string
    representation (FIXTURES.md §5: never compare raw doubles)."""
    def q(p: float, name: str):
        return (
            F.round(F.percentile("value", F.lit(p)), 6)
            .cast("decimal(18,6)")
            .cast("string")
            .alias(name)
        )

    return ev.groupBy("event_type").agg(
        q(0.5, "p50"), q(0.9, "p90"), F.count(F.lit(1)).alias("n")
    )


def topk_per_group(ev: DataFrame) -> DataFrame:
    """Per event_type, the user with the highest total value —
    ``max_by`` over a (total, user_id) struct, so ties are broken
    deterministically and the plan is a two-level hash aggregate (no
    window sort).  Value is summed as DECIMAL so the total is exact
    and order-independent — ranking on raw double sums can flip on
    partial-aggregation order (FIXTURES.md §5)."""
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total")
    )
    return per_user.groupBy("event_type").agg(
        F.max_by("user_id", F.struct("total", "user_id")).alias("top_user"),
        F.max(F.struct("total", "user_id")).getField("total").cast("string").alias("top_total"),
    )


def approx_distinct(ev: DataFrame) -> DataFrame:
    """HyperLogLog++ distinct users per type — the sketch path for
    100 TB cardinalities where exact countDistinct's expand/shuffle is
    the bottleneck.  Deterministic (register merges are commutative)
    but engine-specific, so rows-only; the pytest bounds its error
    against the exact count."""
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


HLL_P = 12
HLL_M = 1 << HLL_P  # 4096 registers
# alpha_m * m^2 for m = 4096, precomputed once so BOTH engines parse the
# SAME double literal (repr round-trips; recomputing 0.7213/(1+1.079/m)
# in two engines could differ in the last ulp).
HLL_ALPHA_MM = repr(0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M)
_HEX = "0123456789abcdef"


def hll_registers(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """(event_type, bucket, r): deterministic HyperLogLog registers,
    built from scratch in pure column algebra over md5 — NOT the
    engine-native sketch (``approx_distinct`` above wraps
    ``F.approx_count_distinct``, whose xxhash64-based registers no
    other engine can reproduce, so it could only ever be rows-checked).

    Layout of md5(key): hex chars 1-3 are the 12 bucket bits, chars
    4-16 are a 52-bit stream whose leading-zero count gives rho.  All
    of it is engine-portable string algebra (instr/substring/regexp),
    so DuckDB computes bit-identical registers and the driver can
    hash-check an *approximate* operator.  The registers are the
    mergeable state: max-merge per bucket across any partitioning of
    the input (epochs, shards, streams) equals the registers of the
    union — pinned in tests.

    100 TB shape: one map-side projection (md5 + string ops, all
    codegen) -> ONE partial-aggregated shuffle on (event_type, bucket)
    carrying at most |types| x 4096 pre-combined rows per task.  This
    is the whole point of HLL at scale: the exchange is sketch-sized,
    not data-sized, where exact countDistinct shuffles every distinct
    key."""
    hx = F.md5(F.col(key).cast("string"))
    d = ev.select("event_type", hx.alias("hx")).select(
        "event_type",
        F.expr(
            f"(instr('{_HEX}', substring(hx, 1, 1)) - 1) * 256"
            f" + (instr('{_HEX}', substring(hx, 2, 1)) - 1) * 16"
            f" + (instr('{_HEX}', substring(hx, 3, 1)) - 1)"
        ).alias("bucket"),
        F.expr("substring(hx, 4, 13)").alias("rest"),
    )
    d = d.select(
        "event_type",
        "bucket",
        F.expr("length(regexp_extract(rest, '^(0*)', 1))").alias("z"),
        F.expr(
            f"instr('{_HEX}', substring(rest, length(regexp_extract(rest, '^(0*)', 1)) + 1, 1)) - 1"
        ).alias("v"),
    )
    rho = F.when(F.col("z") == 13, F.lit(53)).otherwise(
        F.col("z") * 4
        + F.when(F.col("v") >= 8, 0)
        .when(F.col("v") >= 4, 1)
        .when(F.col("v") >= 2, 2)
        .otherwise(3)
        + 1
    )
    return (
        d.select("event_type", "bucket", rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(regs: DataFrame, group_cols=("event_type",)) -> DataFrame:
    """Estimate tail over a register table (*group_cols, bucket, r) —
    shared verbatim by batch ``hll_distinct`` and the streaming
    ``IncrementalHLL`` so the two provably run the same plan over the
    same registers.  ``group_cols`` lets callers key registers on a
    compound group (e.g. set-algebra's (type_a, type_b) pairs) without
    packing several strings into one delimited column — a delimiter
    occurring in the data would corrupt the key (ADVICE r6 #4)."""
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("nonzero_buckets"),
        F.sum(F.expr("cast(shiftleft(1L, 53 - r) as decimal(38,0))")).alias("sp"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("bucket", "r"))),
                    lambda s: F.concat(
                        s["bucket"].cast("string"), F.lit(":"), s["r"].cast("string")
                    ),
                ),
            )
        ).alias("registers_md5"),
    )
    m = F.lit(HLL_M)
    zeros = m - F.col("nonzero_buckets")
    raw = F.lit(float(HLL_ALPHA_MM)) / (
        F.col("sp").cast("double") / F.lit(9007199254740992.0) + zeros.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0), m.cast("double") * F.log(m.cast("double") / zeros.cast("double"))
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est).cast("long").alias("hll_users"),
        "nonzero_buckets",
        "registers_md5",
    )


def hll_distinct(ev: DataFrame) -> DataFrame:
    """Distinct users per event_type via the from-scratch HLL above —
    estimate + register checksum, both value-checkable cross-engine.

    Exactness discipline: the register sum Σ 2^-r is accumulated as
    Σ 2^(53-r) in DECIMAL(38,0) (every term an exact integer, so
    accumulation order cannot perturb a float), converted to double
    ONCE at the end; alpha_m*m^2 is a shared literal (HLL_ALPHA_MM);
    the linear-counting branch (raw <= 2.5m and empty buckets exist)
    is the classic Flajolet correction.  ``registers_md5`` pins the
    ENTIRE sketch byte-exactly — even if the rounded estimate could
    mask an off-by-one register, the checksum cannot."""
    return hll_estimate(hll_registers(ev))


def hll_set_algebra(ev: DataFrame) -> DataFrame:
    """Sketch set-algebra: for every event_type pair (a < b), the HLL
    estimates of |users(a)|, |users(b)|, their UNION (max-merged
    registers — the merge HLL is exact for) and the inclusion-exclusion
    INTERSECTION estimate |a| + |b| - |a ∪ b|.  The cross-segment
    overlap matrix every analytics team wants, computed entirely on
    sketches — at 100 TB the alternative (exact pairwise distinct
    intersections) shuffles every (user, type-pair) combination.

    Register max-merge + the shared ``hll_estimate`` tail keep the
    whole thing engine-exact: the union registers of (a, b) are
    max(r_a, r_b) per bucket, a pure column op over the one register
    table.  |types|^2/2 pairs x 4096 registers stay broadcast-sized.
    Intersection can round slightly negative at tiny overlaps (standard
    HLL inclusion-exclusion behavior) — clamped at 0, same clamp both
    engines."""
    regs = hll_registers(ev).localCheckpoint(eager=False)  # 3 consumers
    est = hll_estimate(regs).select(
        "event_type", F.col("hll_users").alias("est")
    )
    # union registers per pair: tag each type's registers with every
    # pair it belongs to, union the two tagged streams, max per bucket
    # (a bucket present in only one side contributes its register
    # unchanged — exactly the HLL merge).
    types = regs.select(F.col("event_type").alias("t")).distinct()
    ta = types.select(F.col("t").alias("type_a"))
    tb = types.select(F.col("t").alias("type_b"))
    pairs = ta.crossJoin(tb).where(F.col("type_a") < F.col("type_b"))
    tagged_a = pairs.join(
        regs.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select("type_a", "type_b", "bucket", "r")
    tagged_b = pairs.join(
        regs.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select("type_a", "type_b", "bucket", "r")
    union_regs = (
        tagged_a.unionByName(tagged_b)
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("r").alias("r"))
    )
    # compound group key straight through the shared estimate tail —
    # no delimiter packing, so a '|' inside an event_type cannot
    # corrupt the pair key (ADVICE r6 #4).
    union_est = hll_estimate(union_regs, group_cols=("type_a", "type_b")).select(
        "type_a", "type_b", F.col("hll_users").alias("est_union")
    )
    ea = est.select(F.col("event_type").alias("type_a"), F.col("est").alias("est_a"))
    eb = est.select(F.col("event_type").alias("type_b"), F.col("est").alias("est_b"))
    return (
        union_est.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ).alias("est_intersection"),
        )
    )


def _q_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_set_algebra(load_table(spark, sf_dir, "events"))


# --- Count-Min Sketch (frequency twin of the HLL above) --------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # counters per row
CMS_TOP_K = 10


def _cms_col(key_col, row: int) -> object:
    """Counter column for hash row ``row``: md5('{row}:' || key) first
    8 hex chars mod CMS_W — the same engine-portable md5-bucket kernel
    as split.hash_bucket / text.hash_features, salted per row so the d
    hash functions are independent."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), key_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(CMS_W))


def cms_counters(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """(row, col, n): deterministic Count-Min Sketch counters (Cormode &
    Muthukrishnan 2005) — built from scratch in column algebra like the
    HLL registers, so DuckDB reproduces them bit-exactly.  Counters are
    SUM-mergeable across any partitioning of the input (epochs, shards,
    streams): the frequency twin of the HLL's max-mergeable registers.

    100 TB shape: one map-side fan-out of d=4 (row, col) pairs per
    event -> ONE partial-aggregated shuffle carrying at most d x w
    (4096) pre-combined rows per task — the exchange is sketch-sized,
    not data-sized, where an exact per-key count shuffles every key."""
    kc = F.col(key)
    fan = ev.select(
        F.posexplode(
            F.array(*[_cms_col(kc, i) for i in range(CMS_D)])
        ).alias("row", "col")
    )
    return fan.groupBy("row", "col").agg(F.count(F.lit(1)).alias("n"))


def cms_heavy_hitters(
    ev: DataFrame, key: str = "user_id", k: int = CMS_TOP_K
) -> DataFrame:
    """Heavy hitters with their CMS estimates: the exact top-``k`` keys
    by event count (ties -> lower key) next to the sketch's point-query
    estimate (min over the d counters).  CMS only ever OVER-counts, so
    ``cms_n >= true_n`` always — pinned in tests and visible in the
    driver-checked values; the estimate-vs-truth gap IS the sketch-
    quality report, the same continuously-verified form
    dedup_minhash_estimate gives MinHash and similarity_recall_report
    gives ANN.

    The candidate set here is the exact top-k (verifiable); production
    gets candidates from per-partition pre-filters and uses the SAME
    point-query join.  100 TB shape: the sketch is one sketch-sized
    aggregate; the probe explodes k x d rows and equi-joins the 4096-row
    counter table (broadcast)."""
    counters = cms_counters(ev, key)
    top = (
        ev.groupBy(key)
        .agg(F.count(F.lit(1)).alias("true_n"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("true_n"), F.asc(key))
            ),
        )
        .where(F.col("rank") <= k)
    )
    probes = top.select(
        key,
        "true_n",
        "rank",
        F.posexplode(
            F.array(*[_cms_col(F.col(key), i) for i in range(CMS_D)])
        ).alias("row", "col"),
    )
    return (
        probes.join(F.broadcast(counters), ["row", "col"])
        .groupBy(key, "true_n", "rank")
        .agg(F.min("n").alias("cms_n"))
        .select(key, "true_n", "cms_n", F.col("rank").cast("long").alias("rank"))
    )


HIST_WIDTH = 25


def value_histogram(ev: DataFrame, width: int = HIST_WIDTH) -> DataFrame:
    """Fixed-width value histogram per event_type: bucket i covers
    [i*width, (i+1)*width).  The bucket id is floor(decimal / int) —
    exact on both engines (casting the double to DECIMAL(18,6) first
    pins the boundary behavior; a double division could put 24.999...
    vs 25.0 in different buckets per engine).

    100 TB shape: one map-side-combined hash agg on a key space
    bounded by |event_types| x (value_range/width) — broadcast-sized
    output, single shuffle, same plan as any wordcount."""
    bucket = F.floor(F.col("value").cast("decimal(18,6)") / F.lit(width)).cast("long")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hourly_gap_fill(ev: DataFrame) -> DataFrame:
    """Hypertable-style rollup: per-hour event counts over a COMPLETE
    hour spine (min..max hour), empty hours as n=0.  The spine comes
    from a 1-row min/max aggregate exploded through ``sequence`` —
    spine size is (time range / bucket), independent of fact-table
    size, and the fill join broadcasts it; the fact table is touched
    once for the count aggregate."""
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts")
    )
    counts = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(counts, "hour_ts", "left")
        .select(
            F.col("hour_ts").cast("string").alias("hour_ts"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


def window_analytics(ev: DataFrame) -> DataFrame:
    """The full analytic-window surface in one query: lead/lag,
    running sum (rows frame), ntile over a UNIQUE ordering
    (ts, event_id) — ties under ntile are engine-arbitrary — and
    rank/dense_rank/percent_rank over a tied ordering (hr), where
    ranks are deterministic by definition.  Running sum is DECIMAL so
    partial-agg order cannot perturb it."""
    from pyspark.sql.window import Window

    w_unique = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_unique.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tied = Window.partitionBy("user_id").orderBy("hr")
    val = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w_unique).alias("prev_event"),
        F.lead("event_id").over(w_unique).alias("next_event"),
        F.sum(val).over(w_run).cast("string").alias("running_value"),
        F.ntile(4).over(w_unique).alias("quartile"),
        F.rank().over(w_tied).alias("rk"),
        F.dense_rank().over(w_tied).alias("drk"),
        F.round(F.percent_rank().over(w_tied), 6).alias("prk"),
    )


def json_extract_agg(ev: DataFrame) -> DataFrame:
    """Extract ``props.k`` (a JSON document column) JVM-side with
    get_json_object and aggregate — no Python in the loop."""
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# Spike threshold num/den shared by spike_hours defaults AND the
# DuckDB oracle f-string below — one source of truth (ADVICE r2).
SPIKE_NUM = 2
SPIKE_DEN = 1


def spike_hours(ev: DataFrame, num: int = SPIKE_NUM, den: int = SPIKE_DEN) -> DataFrame:
    """Hourly volume anomalies per event_type: hours whose count
    exceeds (num/den)x the trailing-24-observed-hours average.

    The comparison is pure integer cross-multiplication —
    ``cnt * n_prev * den > num * s_prev`` — never a float average, so
    both engines agree bit-for-bit.  ROWS (not RANGE) frame over
    *observed* hours: silent hours don't dilute the baseline (compose
    with hourly_gap_fill upstream if zero-fill semantics are wanted).

    100 TB shape: the hourly pre-aggregate collapses the event stream
    to (type x hour) cardinality before the window; the window sorts
    within each event_type partition — tiny after collapse."""
    from pyspark.sql.window import Window

    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    d = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.count("cnt").over(w).alias("n_prev"),
        F.coalesce(F.sum("cnt").over(w), F.lit(0).cast("long")).alias("s_prev"),
    )
    return (
        d.where(
            (F.col("n_prev") > 0)
            & (F.col("cnt") * F.col("n_prev") * den > num * F.col("s_prev"))
        )
        .select(
            "event_type",
            F.col("hour").cast("string").alias("hour"),
            "cnt", "n_prev", "s_prev",
        )
    )


# --- queries()/oracle_sql() registrations ---------------------------------

def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_counts(_events_with_day(spark, sf_dir))


def _q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cube_counts(_events_with_day(spark, sf_dir))


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the Spark SQL surface (the DataFrame API has
    only rollup/cube; this pins the SQL path too)."""
    _events_with_day(spark, sf_dir).createOrReplaceTempView("events_day")
    return spark.sql(
        """
        SELECT day, event_type, count(1) AS n, grouping_id() AS gid
        FROM events_day
        GROUP BY GROUPING SETS ((day), (event_type))
        """
    )


def _q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pivot_counts(_events_with_day(spark, sf_dir))


def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unpivot_counts(_events_with_day(spark, sf_dir))


def _q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_quantiles(_events_with_day(spark, sf_dir))


def _q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return json_extract_agg(_events_with_day(spark, sf_dir))


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk_per_group(_events_with_day(spark, sf_dir))


def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_distinct(_events_with_day(spark, sf_dir))


def _q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_heavy_hitters(load_table(spark, sf_dir, "events"))


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_gap_fill(load_table(spark, sf_dir, "events"))


def _q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value", extract_hour(F.col("ts")).alias("hr")
    )
    return window_analytics(ev)


def _q_spike_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spike_hours(load_table(spark, sf_dir, "events"))


def _q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "events"))


ZSCORE_MIN_HOURS = 2


def anomaly_zscore(ev: DataFrame, min_hours: int = ZSCORE_MIN_HOURS) -> DataFrame:
    """Hourly volume z-scores per event_type — the statistical spike
    detector beside ``spike_hours``' cross-multiplication rule: every
    (type, hour) bucket scored as (cnt - mean) / stddev of that type's
    hourly counts.

    Engine-exactness: mean and variance are DERIVED from BIGINT sums
    (sum, sum of squares, count) with the identical IEEE expression
    tree on both engines — never the engines' own stddev aggregates,
    whose Welford partial-merge order differs run to run.  Integer
    squares are summed as BIGINT (hourly counts bounded by
    ~4e9-per-hour before s*s approaches overflow; cast to DOUBLE in
    the mean/var expressions only).

    100 TB shape: the event stream collapses to (type x hour)
    cardinality in the first partial-agg groupBy; the per-type stats
    table is |types| rows and broadcasts back onto the hourly table —
    no second shuffle of anything data-sized."""
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
        F.count(F.lit(1)).alias("nh"),
    )
    s, ss, nh = (F.col(c).cast("double") for c in ("s", "ss", "nh"))
    mean = s / nh
    var = (ss - s * s / nh) / (nh - F.lit(1.0))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .where(F.col("nh") >= min_hours)
        .select(
            "event_type",
            F.col("hour").cast("string").alias("hour"),
            "cnt",
            mean.alias("mean_cnt"),
            F.when(var > 0, (F.col("cnt") - mean) / F.sqrt(var))
            .otherwise(F.lit(0.0))
            .alias("zscore"),
        )
    )


def _q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anomaly_zscore(load_table(spark, sf_dir, "events"))


def user_entropy(ev: DataFrame) -> DataFrame:
    """Per-user behavioral entropy over the event_type distribution —
    the bot/power-user discriminator (H=0: single-action users; high H:
    uniform mixers).  H = -Σ p log2 p over the user's event types.

    Engine-exactness: the per-user fold runs over the event types in
    SORTED order via collect_list + F.aggregate (DuckDB: list(... ORDER
    BY) + list_reduce with a prepended 0 seed), so the double
    accumulation order is pinned on both engines; p = n/total divides
    BIGINTs into identical doubles.  log2 itself is a TRANSCENDENTAL —
    JVM Math.log and libm disagree in the last ulp on ~1/6 of inputs
    (measured) — so the emitted entropy is rounded to 9 decimals on
    both engines; ``acc - p*log2(p)`` keeps H at exactly +0.0 for
    single-type users.

    100 TB shape: one partial-agg groupBy to (user, type) cardinality,
    one groupBy to user cardinality with a |types|-bounded list per
    user — both combiner-friendly; no window, no join."""
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    g = per_ut.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "n"))).alias("xs"),
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_types"),
    )
    p = lambda x: x["n"].cast("double") / F.col("total").cast("double")  # noqa: E731
    h = F.aggregate(
        "xs", F.lit(0.0), lambda acc, x: acc - p(x) * F.log2(p(x))
    )
    return g.select("user_id", "total", "n_types", F.round(h, 9).alias("entropy"))


def _q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_entropy(load_table(spark, sf_dir, "events"))


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Classic cohort lifetime-value matrix: customers grouped by their
    FIRST-order month, revenue and order counts per (cohort month,
    months since first order).  The retention/LTV curve every
    subscription/commerce dashboard starts from.

    Engine-exactness: months are integer indexes (year*12 + month);
    revenue sums are exact DECIMAL(12,2) (o_totalprice is a double in
    the fixture — cast BEFORE the sum on both engines, the q1 idiom),
    emitted as strings.

    100 TB shape: the first-order table is one partial-agg min per
    customer; it joins back customer-keyed (the fact's natural key) and
    the final matrix aggregate collapses to (months x months)
    cardinality map-side."""
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first = orders.groupBy("o_custkey").agg(F.min(midx).alias("m0"))
    return (
        orders.select("o_custkey", midx.alias("m"), "o_totalprice")
        .join(first, "o_custkey")
        .groupBy(
            F.col("m0").alias("cohort_month_idx"),
            (F.col("m") - F.col("m0")).alias("months_since"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("revenue"),
        )
    )


def _q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_ltv(load_table(spark, sf_dir, "orders"))


BASKET_MIN_ORDERS = 2


def basket_pairs(li: DataFrame, min_orders: int = BASKET_MIN_ORDERS) -> DataFrame:
    """Market-basket co-occurrence (frequent itemsets, k=2): part
    pairs ordered together in >= min_orders orders.  The classic
    combinatorial trap is bounded per GROUP, not per corpus: the
    orderkey self-join fans out only within an order (~4 items ->
    ~6 pairs), both sides hash-partition on the same orderkey (AQE
    coalesces to one co-partitioned exchange pair), and the pair
    count agg is map-side combinable.  A pathological mega-order is
    the skew unit — cap items-per-group upstream if baskets are
    unbounded."""
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= min_orders)
    )


def inter_arrival(ev: DataFrame) -> DataFrame:
    """Per-type inter-event gap profile (the ops/monitoring query
    behind rate alerting and session-gap tuning): seconds between
    consecutive events of a type, summarized as count/min/max plus
    exact p50/p90.  Gaps come from one lag window partitioned on
    event_type with a deterministic (ts, event_id) order — ties
    sequence identically in both engines, so the gap MULTISET is
    engine-exact.  Gaps are epoch MILLIS (exact integers both
    engines; whole seconds diverge — Spark unix_seconds floors while
    DuckDB's epoch()::BIGINT cast rounds); they feed the same
    exact-percentile +
    6dp-DECIMAL pinning as events_quantiles.  One hash partition +
    sort; the aggregate rides the same partitioning (no second
    exchange)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    sec = F.unix_millis(F.col("ts"))
    gaps = (
        ev.select("event_type", "ts", "event_id")
        .select("event_type", (sec - F.lag(sec).over(w)).alias("gap"))
        .where(F.col("gap").isNotNull())
    )

    def q(p: float, name: str):
        return (
            F.round(F.percentile("gap", F.lit(p)), 6)
            .cast("decimal(18,6)").cast("string").alias(name)
        )

    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap").alias("min_gap_ms"),
        F.max("gap").alias("max_gap_ms"),
        q(0.5, "p50_gap_ms"),
        q(0.9, "p90_gap_ms"),
    )


def _q_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inter_arrival(load_table(spark, sf_dir, "events"))


RFM_RECENT_DAYS = 365
RFM_FREQ_HI = 3
RFM_MONEY_HI = 300_000


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation (the classic CRM cut): per customer,
    days-since-last-order relative to the corpus max date (recency),
    order count (frequency), exact-DECIMAL spend (monetary), plus a
    3-letter segment code from fixed business thresholds.  Fixed-value
    thresholds — not quantiles — keep every comparison integer/DECIMAL
    exact AND make segments stable as data grows (quantile cuts
    reshuffle customers every run).  One orderkey-free aggregate keyed
    on customer + a 1-row broadcast max-date; map-only labeling."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(38,10)").alias("monetary"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("mx"))
    r = F.datediff("mx", "last_order").cast("long")
    seg = F.concat(
        F.when(r <= RFM_RECENT_DAYS, F.lit("R")).otherwise(F.lit("r")),
        F.when(F.col("frequency") >= RFM_FREQ_HI, F.lit("F")).otherwise(F.lit("f")),
        F.when(
            F.col("monetary") >= F.lit(RFM_MONEY_HI).cast("decimal(12,2)"), F.lit("M")
        ).otherwise(F.lit("m")),
    )
    return per_cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        r.alias("recency_days"),
        "frequency",
        F.col("monetary").cast("string").alias("monetary"),
        seg.alias("segment"),
    )


def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(load_table(spark, sf_dir, "orders"))


def _q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return basket_pairs(load_table(spark, sf_dir, "lineitem"))


QUERIES = {
    "basket_pairs": _q_basket_pairs,
    "orders_rfm": _q_rfm,
    "events_inter_arrival": _q_inter_arrival,
    "events_rollup": _q_rollup,
    "events_cube": _q_cube,
    "events_grouping_sets": _q_grouping_sets,
    "events_pivot": _q_pivot,
    "events_unpivot": _q_unpivot,
    "events_quantiles": _q_quantiles,
    "events_json_extract": _q_json,
    "events_topk_per_group": _q_topk,
    "events_approx_distinct": _q_approx_distinct,  # from-scratch HLL, hash-checked
    "events_cms_heavy_hitters": _q_cms_heavy_hitters,  # from-scratch CMS, r6
    "events_hll_set_algebra": _q_hll_set_algebra,      # sketch set-algebra, r6
    "events_gap_fill": _q_gap_fill,
    "events_window_analytics": _q_window_analytics,
    "events_spike_hours": _q_spike_hours,
    "events_histogram": _q_histogram,
    "events_anomaly_zscore": _q_anomaly_zscore,
    "events_user_entropy": _q_user_entropy,
    "orders_cohort_ltv": _q_cohort_ltv,
}

_DAY = "datetrunc('day', ts)::DATE::VARCHAR"
_PIVOT_COLS = ",\n  ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES
)

ORACLES = {
    "events_approx_distinct": f"""
WITH parts AS (
  SELECT event_type,
         (instr('{_HEX}', substring(hx, 1, 1)) - 1) * 256
       + (instr('{_HEX}', substring(hx, 2, 1)) - 1) * 16
       + (instr('{_HEX}', substring(hx, 3, 1)) - 1) AS bucket,
         substring(hx, 4, 13) AS rest
  FROM (SELECT event_type, md5(user_id::VARCHAR) AS hx FROM events)
), rho AS (
  SELECT event_type, bucket,
         CASE WHEN z = 13 THEN 53
              ELSE z * 4
                 + CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
                        WHEN v >= 2 THEN 2 ELSE 3 END
                 + 1
         END AS rho
  FROM (
    SELECT event_type, bucket,
           length(regexp_extract(rest, '^(0*)', 1)) AS z,
           instr('{_HEX}', substring(rest, length(regexp_extract(rest, '^(0*)', 1)) + 1, 1)) - 1 AS v
    FROM parts)
), regs AS (
  SELECT event_type, bucket, max(rho) AS r FROM rho GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         count(*)::BIGINT AS nonzero_buckets,
         sum(1::HUGEINT << (53 - r)) AS sp,
         md5(string_agg(bucket || ':' || r, ',' ORDER BY bucket)) AS registers_md5
  FROM regs GROUP BY 1
)
SELECT event_type,
       CAST(round(CASE WHEN raw <= 2.5 * {HLL_M} AND ({HLL_M} - nonzero_buckets) > 0
                       THEN {HLL_M} * ln({HLL_M} / CAST({HLL_M} - nonzero_buckets AS DOUBLE))
                       ELSE raw END) AS BIGINT) AS hll_users,
       nonzero_buckets,
       registers_md5
FROM (SELECT *,
             {HLL_ALPHA_MM} / (CAST(sp AS DOUBLE) / 9007199254740992.0
                               + CAST({HLL_M} - nonzero_buckets AS DOUBLE)) AS raw
      FROM agg)
""",
    "events_hll_set_algebra": f"""
WITH parts AS (
  SELECT event_type,
         (instr('{_HEX}', substring(hx, 1, 1)) - 1) * 256
       + (instr('{_HEX}', substring(hx, 2, 1)) - 1) * 16
       + (instr('{_HEX}', substring(hx, 3, 1)) - 1) AS bucket,
         substring(hx, 4, 13) AS rest
  FROM (SELECT event_type, md5(user_id::VARCHAR) AS hx FROM events)
), rho AS (
  SELECT event_type, bucket,
         CASE WHEN z = 13 THEN 53
              ELSE z * 4
                 + CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
                        WHEN v >= 2 THEN 2 ELSE 3 END
                 + 1
         END AS rho
  FROM (
    SELECT event_type, bucket,
           length(regexp_extract(rest, '^(0*)', 1)) AS z,
           instr('{_HEX}', substring(rest, length(regexp_extract(rest, '^(0*)', 1)) + 1, 1)) - 1 AS v
    FROM parts)
), regs AS (
  SELECT event_type, bucket, max(rho) AS r FROM rho GROUP BY 1, 2
), est AS (
  SELECT event_type,
         CAST(round(CASE WHEN raw <= 2.5 * {HLL_M} AND ({HLL_M} - nonzero_buckets) > 0
                         THEN {HLL_M} * ln({HLL_M} / CAST({HLL_M} - nonzero_buckets AS DOUBLE))
                         ELSE raw END) AS BIGINT) AS est
  FROM (
    SELECT event_type, nonzero_buckets,
           {HLL_ALPHA_MM} / (CAST(sp AS DOUBLE) / 9007199254740992.0
                             + CAST({HLL_M} - nonzero_buckets AS DOUBLE)) AS raw
    FROM (SELECT event_type, count(*)::BIGINT AS nonzero_buckets,
                 sum(1::HUGEINT << (53 - r)) AS sp
          FROM regs GROUP BY 1))
), prs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM regs) a,
       (SELECT DISTINCT event_type FROM regs) b
  WHERE a.event_type < b.event_type
), tagged AS (
  SELECT p.type_a, p.type_b, r.bucket, r.r
  FROM prs p JOIN regs r ON r.event_type = p.type_a
  UNION ALL
  SELECT p.type_a, p.type_b, r.bucket, r.r
  FROM prs p JOIN regs r ON r.event_type = p.type_b
), union_regs AS (
  SELECT type_a, type_b, bucket, max(r) AS r FROM tagged GROUP BY 1, 2, 3
), union_est AS (
  SELECT type_a, type_b,
         CAST(round(CASE WHEN raw <= 2.5 * {HLL_M} AND ({HLL_M} - nonzero_buckets) > 0
                         THEN {HLL_M} * ln({HLL_M} / CAST({HLL_M} - nonzero_buckets AS DOUBLE))
                         ELSE raw END) AS BIGINT) AS est_union
  FROM (
    SELECT type_a, type_b, nonzero_buckets,
           {HLL_ALPHA_MM} / (CAST(sp AS DOUBLE) / 9007199254740992.0
                             + CAST({HLL_M} - nonzero_buckets AS DOUBLE)) AS raw
    FROM (SELECT type_a, type_b, count(*)::BIGINT AS nonzero_buckets,
                 sum(1::HUGEINT << (53 - r)) AS sp
          FROM union_regs GROUP BY 1, 2))
)
SELECT u.type_a, u.type_b, ea.est AS est_a, eb.est AS est_b, u.est_union,
       greatest(0, ea.est + eb.est - u.est_union)::BIGINT AS est_intersection
FROM union_est u
JOIN est ea ON ea.event_type = u.type_a
JOIN est eb ON eb.event_type = u.type_b
""",
    "events_cms_heavy_hitters": f"""
WITH fan AS (
  SELECT t.row,
         ('0x' || substr(md5(t.row::VARCHAR || ':' || user_id::VARCHAR), 1, 8))::BIGINT
           % {CMS_W} AS col
  FROM events, generate_series(0, {CMS_D} - 1) AS t(row)
),
counters AS (SELECT row, col, count(*)::BIGINT AS n FROM fan GROUP BY 1, 2),
top AS (
  SELECT user_id, true_n, rank FROM (
    SELECT user_id, count(*)::BIGINT AS true_n,
           row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank
    FROM events GROUP BY user_id
  ) WHERE rank <= {CMS_TOP_K}
),
probes AS (
  SELECT top.user_id, top.true_n, top.rank, t.row,
         ('0x' || substr(md5(t.row::VARCHAR || ':' || top.user_id::VARCHAR), 1, 8))::BIGINT
           % {CMS_W} AS col
  FROM top, generate_series(0, {CMS_D} - 1) AS t(row)
)
SELECT p.user_id, p.true_n, min(c.n)::BIGINT AS cms_n, p.rank::BIGINT AS rank
FROM probes p JOIN counters c ON p.row = c.row AND p.col = c.col
GROUP BY p.user_id, p.true_n, p.rank
""",
    "events_inter_arrival": """
WITH g AS (
  SELECT event_type,
         epoch_ms(ts)::BIGINT - lag(epoch_ms(ts)::BIGINT)
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type,
       count(gap)::BIGINT AS n_gaps,
       min(gap)::BIGINT AS min_gap_ms,
       max(gap)::BIGINT AS max_gap_ms,
       round(quantile_cont(gap, 0.5), 6)::DECIMAL(18,6)::VARCHAR AS p50_gap_ms,
       round(quantile_cont(gap, 0.9), 6)::DECIMAL(18,6)::VARCHAR AS p90_gap_ms
FROM g WHERE gap IS NOT NULL
GROUP BY event_type
""",
    "orders_rfm": f"""
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*)::BIGINT AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,10)) AS monetary
  FROM orders GROUP BY o_custkey
),
mx AS (SELECT max(o_orderdate) AS mx FROM orders)
SELECT o_custkey,
       datediff('day', last_order, mx)::BIGINT AS recency_days,
       frequency,
       monetary::VARCHAR AS monetary,
       (CASE WHEN datediff('day', last_order, mx) <= {RFM_RECENT_DAYS} THEN 'R' ELSE 'r' END)
       || (CASE WHEN frequency >= {RFM_FREQ_HI} THEN 'F' ELSE 'f' END)
       || (CASE WHEN monetary >= CAST({RFM_MONEY_HI} AS DECIMAL(12,2)) THEN 'M' ELSE 'm' END)
       AS segment
FROM per_cust CROSS JOIN mx
""",
    "basket_pairs": f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*)::BIGINT AS n_orders
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {BASKET_MIN_ORDERS}
""",
    "events_histogram": f"""
SELECT event_type,
       floor(CAST(value AS DECIMAL(18,6)) / {HIST_WIDTH})::BIGINT AS bucket,
       count(*)::BIGINT AS n
FROM events
GROUP BY 1, 2
""",
    "events_spike_hours": f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, hour, cnt,
         count(cnt) OVER (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)::BIGINT AS n_prev,
         coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
                                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s_prev
  FROM hourly
)
SELECT event_type, hour::VARCHAR AS hour, cnt, n_prev, s_prev
FROM w
WHERE n_prev > 0 AND cnt * n_prev * {SPIKE_DEN} > {SPIKE_NUM} * s_prev
""",
    "events_rollup": f"""
WITH d AS (SELECT {_DAY} AS day, event_type FROM events)
SELECT day, event_type, count(*) AS n,
       (grouping(day) * 2 + grouping(event_type))::BIGINT AS gid
FROM d GROUP BY ROLLUP(day, event_type)
""",
    "events_cube": f"""
WITH d AS (SELECT event_type, extract('hour' FROM ts) AS hr FROM events)
SELECT event_type, hr, count(*) AS n,
       (grouping(event_type) * 2 + grouping(hr))::BIGINT AS gid
FROM d GROUP BY CUBE(event_type, hr)
""",
    "events_grouping_sets": f"""
WITH d AS (SELECT {_DAY} AS day, event_type FROM events)
SELECT day, event_type, count(*) AS n,
       (grouping(day) * 2 + grouping(event_type))::BIGINT AS gid
FROM d GROUP BY GROUPING SETS ((day), (event_type))
""",
    "events_pivot": f"""
SELECT {_DAY} AS day,
  {_PIVOT_COLS}
FROM events GROUP BY 1
""",
    "events_unpivot": f"""
WITH wide AS (
  SELECT {_DAY} AS day,
    {_PIVOT_COLS}
  FROM events GROUP BY 1
)
SELECT day, event_type, n
FROM wide UNPIVOT INCLUDE NULLS (n FOR event_type IN ({', '.join(EVENT_TYPES)}))
""",
    "events_quantiles": """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)::DECIMAL(18,6)::VARCHAR AS p50,
       round(quantile_cont(value, 0.9), 6)::DECIMAL(18,6)::VARCHAR AS p90,
       count(*) AS n
FROM events GROUP BY event_type
""",
    "events_json_extract": """
SELECT event_type,
       sum((props->>'k')::BIGINT)::BIGINT AS sum_k,
       min((props->>'k')::BIGINT) AS min_k,
       max((props->>'k')::BIGINT) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
""",
    # semantics oracle (window formulation), not a mechanism mirror of
    # Spark's max_by — both pick max (total, user_id) lexicographically
    "events_topk_per_group": """
SELECT event_type, user_id AS top_user, total::VARCHAR AS top_total
FROM (
  SELECT event_type, user_id,
         sum(value::DECIMAL(18,6)) AS total,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY sum(value::DECIMAL(18,6)) DESC, user_id DESC) AS rn
  FROM events GROUP BY 1, 2
) WHERE rn = 1
""",
    "events_gap_fill": """
WITH bounds AS (
  SELECT datetrunc('hour', min(ts)) AS lo, datetrunc('hour', max(ts)) AS hi FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts FROM bounds
),
counts AS (
  SELECT datetrunc('hour', ts) AS hour_ts, count(*) AS n FROM events GROUP BY 1
)
SELECT spine.hour_ts::VARCHAR AS hour_ts, coalesce(counts.n, 0)::BIGINT AS n
FROM spine LEFT JOIN counts USING (hour_ts)
""",
    "events_window_analytics": """
SELECT
  event_id,
  user_id,
  lag(event_id)  OVER w_unique AS prev_event,
  lead(event_id) OVER w_unique AS next_event,
  CAST(sum(value::DECIMAL(18,6)) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS running_value,
  ntile(4) OVER w_unique AS quartile,
  rank()       OVER w_tied AS rk,
  dense_rank() OVER w_tied AS drk,
  round(percent_rank() OVER w_tied, 6) AS prk
FROM (SELECT event_id, user_id, ts, value, extract('hour' FROM ts) AS hr FROM events)
WINDOW
  w_unique AS (PARTITION BY user_id ORDER BY ts, event_id),
  w_tied   AS (PARTITION BY user_id ORDER BY hr)
""",
    # mean/var derived from BIGINT sums with the SAME IEEE expression
    # tree as the Spark op — never the engine stddev aggregate
    "events_anomaly_zscore": f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, sum(cnt)::BIGINT AS s, sum(cnt * cnt)::BIGINT AS ss,
         count(*)::BIGINT AS nh
  FROM hourly GROUP BY 1
)
SELECT h.event_type, h.hour::VARCHAR AS hour, h.cnt,
       s::DOUBLE / nh::DOUBLE AS mean_cnt,
       CASE WHEN (ss::DOUBLE - s::DOUBLE * s::DOUBLE / nh::DOUBLE) / (nh::DOUBLE - 1.0) > 0
            THEN (h.cnt - s::DOUBLE / nh::DOUBLE)
                 / sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / nh::DOUBLE) / (nh::DOUBLE - 1.0))
            ELSE 0.0 END AS zscore
FROM hourly h JOIN stats USING (event_type)
WHERE nh >= {ZSCORE_MIN_HOURS}
""",
    # sorted-list fold (list(... ORDER BY) + list_reduce with prepended
    # 0.0 seed) pins the double accumulation order to Spark's
    # sort_array + F.aggregate
    "events_user_entropy": """
WITH per_ut AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT user_id,
         list(n ORDER BY event_type) AS ns,
         sum(n)::BIGINT AS total,
         count(*)::BIGINT AS n_types
  FROM per_ut GROUP BY 1
)
SELECT user_id, total, n_types,
       round(list_reduce(
         list_prepend(0.0, list_transform(ns, n ->
           -(n::DOUBLE / total::DOUBLE) * log2(n::DOUBLE / total::DOUBLE))),
         (acc, x) -> acc + x
       ), 9) AS entropy
FROM g
""",
    "orders_cohort_ltv": """
WITH m AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS m,
         o_totalprice
  FROM orders
),
first AS (SELECT o_custkey, min(m) AS m0 FROM m GROUP BY 1)
SELECT m0 AS cohort_month_idx, (m - m0)::BIGINT AS months_since,
       count(*)::BIGINT AS n_orders,
       count(DISTINCT o_custkey)::BIGINT AS n_customers,
       sum(o_totalprice::DECIMAL(12,2))::DECIMAL(38,2)::VARCHAR AS revenue
FROM m JOIN first USING (o_custkey)
GROUP BY 1, 2
""",
}


# --- round-7 addition: association rules over basket pairs ----------------


def basket_lift(li: DataFrame, min_orders: int = BASKET_MIN_ORDERS) -> DataFrame:
    """(part_a, part_b, n_ab, n_a, n_b, support, confidence, lift):
    association-rule strength for the frequent pairs from
    ``basket_pairs`` — the standard support / confidence / lift triple
    (Agrawal et al., public association-rule mining literature).

    Float parity: every ratio is ONE IEEE division of exact BIGINTs
    (``lift`` cross-multiplies numerator and denominator first:
    n_ab*N / (n_a*n_b)), so both engines convert the same integers and
    divide once — bit-equal results, no float-accumulation ordering to
    pin.  Overflow headroom: products of per-part order counts stay
    far under 2^63 until well past 10^9 baskets per part.

    100 TB shape: the pair generation is basket_pairs' bounded
    per-group fanout; per-item counts are parts-sized (broadcast here;
    at a scale where parts outgrow broadcast, the join key is
    l_partkey on both sides so it degrades to one co-partitioned
    shuffle); the grand total is a 1-row broadcast.
    """
    op = li.select("l_orderkey", "l_partkey").distinct()
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    total = op.agg(F.countDistinct("l_orderkey").alias("n_total"))
    pairs = basket_pairs(li, min_orders).withColumnRenamed("n_orders", "n_ab")
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .join(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab") / F.col("n_total")).alias("support"),
            (F.col("n_ab") / F.col("n_a")).alias("confidence"),
            ((F.col("n_ab") * F.col("n_total")) / (F.col("n_a") * F.col("n_b"))).alias(
                "lift"
            ),
        )
    )


def _q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return basket_lift(load_table(spark, sf_dir, "lineitem"))


QUERIES.update({"basket_lift": _q_basket_lift})

ORACLES.update(
    {
        "basket_lift": f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item AS (SELECT l_partkey, count(*)::BIGINT AS n_item FROM op GROUP BY 1),
total AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_total FROM op),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*)::BIGINT AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_ORDERS}
)
SELECT part_a, part_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
       n_ab / n_total AS support,
       n_ab / ia.n_item AS confidence,
       (n_ab * n_total) / (ia.n_item * ib.n_item) AS lift
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN total
""",
    }
)


# --- round-7 addition: ABC / Pareto revenue classification ----------------

ABC_BANDS = 32
# sub-bands per band (r10): bounds the largest window partition at
# ~N / (ABC_BANDS * ABC_SUBBANDS) rows even when revenue mass piles
# into one band; driver state stays <= 32*16 = 512 offset rows.
ABC_SUBBANDS = 16


def abc_pareto(orders: DataFrame, n_bands: int = ABC_BANDS) -> DataFrame:
    """(o_custkey, revenue, cum, rank, abc_class): Pareto/ABC customer
    classification — rank customers by exact DECIMAL revenue and class
    them A (first 80% of cumulative revenue), B (to 95%), C (rest).

    The interesting part is the DISTRIBUTED PREFIX SUM: a naive
    cumulative window over all customers collapses to ONE partition
    (Spark's no-partition window), an entity-sized bottleneck at 10^8+
    customers.  Instead revenue space is cut into ordered cells —
    (binary exponent, mantissa slice of ``ABC_SUBBANDS``) since r11
    (VERDICT r9 #6 gave the sub-band split: a band-only window still
    sorted each band on one task, ~1e8 rows per task at 1e9
    customers); per-cell totals (bounded driver state, ~exponent
    span x ABC_SUBBANDS rows) give prefix offsets, and each row's
    cumulative = its cell's higher-cells offset + a within-cell
    running sum (window PARTITIONED by (band, sub)).  Because DECIMAL
    addition is associative, the banded sum is EXACTLY the naive
    cumulative — which is what the oracle computes, so the hash-check
    proves the rewrite.

    Banding uses double math (floor(log2(rev)) and a mantissa floor)
    — boundaries only need to respect revenue order and be
    deterministic, which single IEEE ops are; being data-independent,
    no global max() pass is needed (the r8-r10 shape collected max
    first — one extra job plus the persist amortizing it).  Rows with
    EQUAL rev always share a cell, so the (rev DESC, custkey ASC)
    order never straddles a cell boundary.
    Class thresholds compare integer CENTS cross-multiplied
    (cum*100 <= total*80), no float ratios.  Headroom: total cents *
    100 stays under 2^63 to ~9e14 dollars of corpus revenue; past
    that, lift to DECIMAL(38,0).
    """
    from pyspark.sql.window import Window as W

    from decimal import Decimal

    # BOUNDED driver state instead of a broadcast-subquery chain: the
    # per-cell totals, their prefix offsets, and the grand total are
    # all cell-cardinality data.  r8 shape ran them as chained
    # broadcast joins + a global window — 8 exchanges, 17 AQE
    # stage-jobs at any SF, pure scheduling floor locally.  Collect
    # them (ONE bounded job), compute offsets in exact Python
    # Decimal/int arithmetic (decimal addition is associative —
    # identical to the window sum), and feed the per-row pass one
    # broadcast-local lookup frame.
    #
    # r11 (VERDICT r10 #3): banding is DATA-INDEPENDENT — the band is
    # the revenue's binary exponent, the sub-band a slice of its
    # mantissa.  Monotone in rev (exponent dominates; within an
    # exponent the mantissa is monotone), deterministic, and needs NO
    # global max — which kills the r8-era max() collect job AND the
    # persist that amortized rev across the two collects (the r10
    # persist/unpersist pair cost ~+0.4 s at sf0.1 under the driver's
    # fresh-session protocol while saving only a cheap re-agg; at
    # cluster scale the total pass count drops 3 -> 2, strictly
    # better).  Equal revs always share a cell, so the
    # (rev DESC, custkey ASC) order never straddles a cell boundary.
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev")
    )
    d = F.col("rev").cast("double")
    # o_totalprice > 0 (TPC-H), so log2 is defined; exponent spans
    # ~a dozen values, the mantissa slice spreads each ~uniformly.
    band_col = F.floor(F.log2(d)).cast("int")
    sub_col = F.least(
        F.floor((d / F.pow(F.lit(2.0), band_col.cast("double")) - 1.0)
                * ABC_SUBBANDS).cast("int"),
        F.lit(ABC_SUBBANDS - 1),
    )
    banded = rev.select(
        "o_custkey", "rev", band_col.alias("band"), sub_col.alias("sub")
    )
    pb = banded.groupBy("band", "sub").agg(
        F.sum("rev").alias("brev"), F.count(F.lit(1)).alias("bn")
    ).collect()
    stats = sorted(
        ((r["band"], r["sub"], r["brev"], r["bn"]) for r in pb),
        key=lambda t: (-t[0], -t[1]),
    )
    total = sum((b for _, _, b, _ in stats), Decimal("0.00"))
    offs_rows, boff, noff = [], Decimal("0.00"), 0
    for band, sub, brev, bn in stats:
        offs_rows.append((band, sub, boff, noff, total))
        boff += brev
        noff += bn
    spark = orders.sparkSession
    offs = spark.createDataFrame(
        offs_rows,
        "band int, sub int, boff decimal(22,2), noff bigint, total decimal(38,2)",
    )
    ww = W.partitionBy("band", "sub").orderBy(F.desc("rev"), F.asc("o_custkey"))
    cum = (
        banded.join(F.broadcast(offs), ["band", "sub"])
        .select(
            "o_custkey",
            "rev",
            (F.col("boff").cast("decimal(38,2)")
             + F.sum("rev").over(ww.rowsBetween(W.unboundedPreceding, 0))
            ).cast("decimal(38,2)").alias("cum"),
            (F.col("noff") + F.row_number().over(ww)).cast("long").alias("rank"),
            "total",
        )
    )
    cents = (F.col("cum") * 100).cast("long")
    tcents = (F.col("total") * 100).cast("long")
    return cum.select(
        "o_custkey",
        F.col("rev").cast("decimal(38,2)").cast("string").alias("revenue"),
        F.col("cum").cast("string").alias("cum"),
        "rank",
        F.when(cents * 100 <= tcents * 80, F.lit("A"))
        .when(cents * 100 <= tcents * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def _q_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return abc_pareto(load_table(spark, sf_dir, "orders"))


QUERIES.update({"orders_abc_pareto": _q_abc_pareto})

ORACLES.update(
    {
        # the NAIVE global cumulative: exact-DECIMAL associativity makes
        # the banded distributed prefix sum hash-identical to this.
        "orders_abc_pareto": """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(12,2)) AS rev
  FROM orders GROUP BY 1
),
cum AS (
  SELECT o_custkey, rev,
         sum(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS UNBOUNDED PRECEDING)::DECIMAL(38,2) AS cum,
         row_number() OVER (ORDER BY rev DESC, o_custkey)::BIGINT AS rank,
         (SELECT sum(rev)::DECIMAL(38,2) FROM rev) AS total
  FROM rev
)
SELECT o_custkey,
       rev::DECIMAL(38,2)::VARCHAR AS revenue,
       cum::VARCHAR AS cum,
       rank,
       CASE WHEN (cum * 100)::BIGINT * 100 <= (total * 100)::BIGINT * 80 THEN 'A'
            WHEN (cum * 100)::BIGINT * 100 <= (total * 100)::BIGINT * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM cum
""",
    }
)


# --- round-7 addition: robust (MAD) outlier detection ---------------------

MAD_K = 3 * 1.4826  # 3 sigma-equivalents; 1.4826 = consistency constant


def outliers_mad(ev: DataFrame) -> DataFrame:
    """(event_type, event_id, value, dev): robust per-type outliers —
    rows whose |value - median| exceeds 3 sigma-equivalents of the
    Median Absolute Deviation (dev > 3*1.4826*MAD), the standard
    outlier rule that a few extreme points cannot poison (unlike
    z-scores, where the outliers inflate their own sigma).

    Parity: median and MAD come from the exact interpolated
    percentile both engines share (events_quantiles idiom), ROUNDED to
    6 dp before reuse so a 1-ulp interpolation difference cannot flip
    a row across the threshold; after that every per-row op (one
    subtract, one abs, one multiply-compare against the Python-folded
    constant) is the same single IEEE op on both sides.

    100 TB shape: two aggregate passes (median, then MAD over the
    deviations) plus two broadcast joins of the per-type medians
    (|types| rows).  Exact percentiles sort per type inside the agg;
    for value spaces where that bites, the approx_percentile twin is
    the documented fallback — the rule's robustness doesn't depend on
    exactness.
    """
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("dev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("dev") > F.lit(MAD_K) * F.col("mad"))
        .select("event_type", "event_id", "value", "dev")
    )


def _q_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return outliers_mad(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_outlier_mad": _q_outliers_mad})

ORACLES.update(
    {
        "events_outlier_mad": f"""
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(dev, 0.5), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type, d.event_id, d.value, d.dev
FROM dev d JOIN mad m USING (event_type)
WHERE d.dev > {MAD_K!r} * m.mad
""",
    }
)


# --- round-7 addition: exact audience overlap via chunked bitmaps ---------


def bitmap_overlap(ev: DataFrame) -> DataFrame:
    """(type_a, type_b, n_a, n_b, n_inter, jaccard): EXACT audience
    overlap between event types — the number events_hll_set_algebra
    ESTIMATES, computed exactly with chunked bitmap indexes (the
    public roaring-bitmap idea reduced to its Spark-native core).

    Each type's user set becomes a sharded bitmap: word = user DIV 32,
    bits = bit_or of 1<<(user%32) — one map-side-combined agg produces
    |users|/32-sized state per type (32-bit payloads in BIGINT words:
    DuckDB's signed << overflows loudly at bit 63, so the portable
    chunk is a half-word).  Intersections are then a
    word-equi join + sum(bit_count(a & b)): exchanges carry BITMAP
    words, never user rows, which is what makes exact audience overlap
    affordable where HLL would otherwise be the only option.  Pairs
    sharing no word fall out of the join and are restored as
    n_inter=0 via the totals cross (|types|^2 rows).

    Everything is integer until the final jaccard = n_inter /
    (n_a + n_b - n_inter), one IEEE division of exact BIGINTs.
    """
    base = ev.select("event_type", "user_id").distinct()
    bm = base.select(
        "event_type",
        F.expr("user_id DIV 32").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias("m"),
    ).groupBy("event_type", "word").agg(F.bit_or("m").alias("bits")).localCheckpoint(
        eager=False  # |users|/32-sized; feeds totals + both join sides (r11, §5)
    )
    totals = bm.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n")
    )
    a, b = bm.alias("a"), bm.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(F.bit_count(F.col("a.bits").bitwiseAND(F.col("b.bits"))))
            .cast("long")
            .alias("n_inter")
        )
    )
    ta = totals.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    pairs = ta.join(tb, F.col("type_a") < F.col("type_b"))
    return (
        pairs.join(inter, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.coalesce("n_inter", F.lit(0).cast("long")).alias("n_inter"),
        )
        .select(
            "*",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def _q_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bitmap_overlap(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_bitmap_overlap": _q_bitmap_overlap})

ORACLES.update(
    {
        "events_bitmap_overlap": """
WITH base AS (SELECT DISTINCT event_type, user_id FROM events),
bm AS (
  SELECT event_type, user_id // 32 AS word,
         bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
  FROM base GROUP BY 1, 2
),
totals AS (
  SELECT event_type, sum(bit_count(bits))::BIGINT AS n FROM bm GROUP BY 1
),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         sum(bit_count(a.bits & b.bits))::BIGINT AS n_inter
  FROM bm a JOIN bm b
    ON a.word = b.word AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_a, p.n_b,
       coalesce(i.n_inter, 0)::BIGINT AS n_inter,
       coalesce(i.n_inter, 0) / (p.n_a + p.n_b - coalesce(i.n_inter, 0)) AS jaccard
FROM (
  SELECT ta.event_type AS type_a, tb.event_type AS type_b,
         ta.n AS n_a, tb.n AS n_b
  FROM totals ta JOIN totals tb ON ta.event_type < tb.event_type
) p LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
""",
    }
)


# --- round-7 addition: Benford first-digit audit ---------------------------

# log10(1 + 1/d), precomputed in Python so both engines consume the
# SAME repr-round-tripped double literals — no libm call in either
# engine's query path.
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


def benford_audit(orders: DataFrame) -> DataFrame:
    """(digit, n, share, benford_p, dev): first-significant-digit
    distribution of order amounts vs Benford's law — the classic
    fabricated-numbers audit (Benford 1938; Nigrini's forensic
    accounting use).  A synthetic or manipulated amount column drifts
    from the log-law; dev = |share - benford_p| per digit is the
    signal a reviewer thresholds.

    Exactness: amounts become integer CENTS, and the first digit comes
    from substr(CAST(cents AS STRING), 1, 1) — BIGINT-to-string is
    exact and identical in both engines, so no log10/float-format
    parity risk anywhere; share is one division of exact counts and
    the Benford constants are repr-round-tripped Python doubles
    interpolated into BOTH sides.  Zero/negative amounts are excluded
    (no first significant digit).

    100 TB shape: one map-side-combined 9-group agg + a 1-row total
    broadcast — nothing else.
    """
    # explicit floor on BOTH sides: Spark's cast-to-long truncates
    # while DuckDB's ::BIGINT cast ROUNDS (the epoch-seconds trap from
    # the verify notes) — floor(double) is identical in both engines.
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    d = orders.where(cents > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = d.agg(F.count(F.lit(1)).cast("long").alias("t"))
    bp = F.create_map(
        *[x for dd, p in BENFORD_P.items() for x in (F.lit(dd), F.lit(p))]
    )
    return counts.join(F.broadcast(total)).select(
        F.col("digit").cast("long").alias("digit"),
        "n",
        (F.col("n") / F.col("t")).alias("share"),
        bp[F.col("digit")].alias("benford_p"),
        F.abs(F.col("n") / F.col("t") - bp[F.col("digit")]).alias("dev"),
    )


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_audit(load_table(spark, sf_dir, "orders"))


QUERIES.update({"orders_benford_audit": _q_benford})

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p!r}::DOUBLE" for d, p in BENFORD_P.items()
)

ORACLES.update(
    {
        "orders_benford_audit": f"""
WITH d AS (
  SELECT substr(CAST(floor(o_totalprice * 100)::BIGINT AS VARCHAR), 1, 1)::INT AS digit
  FROM orders WHERE floor(o_totalprice * 100)::BIGINT > 0
),
counts AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1),
total AS (SELECT count(*)::BIGINT AS t FROM d)
SELECT digit::BIGINT AS digit, n,
       n / t AS share,
       (CASE digit {_BENFORD_CASE} END) AS benford_p,
       abs(n / t - (CASE digit {_BENFORD_CASE} END)) AS dev
FROM counts, total
""",
    }
)


# --- round-7 addition: SLO error-budget burn --------------------------------

SLO_TARGET = 0.99  # 1% error budget


def slo_burn(ev: DataFrame) -> DataFrame:
    """(h, n_total, n_errors, error_rate, burn_rate, burning): per-hour
    SRE error-budget accounting — error_rate = errors/total and
    burn_rate = error_rate / (1 - SLO) (burn 1.0 = consuming budget
    exactly at the sustainable pace; > 1 = on track to blow the SLO) —
    the Google SRE-workbook alerting primitive over the event stream.

    Exact integer counts; the two ratios are single IEEE divisions
    (budget = 1 - 0.99 folds identically in both engines as doubles);
    ``burning`` is a boolean on the exact comparison.

    100 TB shape: one map-side-combined (hour) agg with conditional
    counts — nothing else.
    """
    budget = F.lit(1.0) - F.lit(SLO_TARGET)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    rate = F.col("n_errors") / F.col("n_total")
    return hourly.select(
        "h",
        "n_total",
        "n_errors",
        rate.alias("error_rate"),
        (rate / budget).alias("burn_rate"),
        (rate / budget > F.lit(1.0)).alias("burning"),
    )


def _q_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return slo_burn(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_slo_burn": _q_slo_burn})

ORACLES.update(
    {
        "events_slo_burn": f"""
WITH hourly AS (
  SELECT datetrunc('hour', ts) AS h,
         count(*)::BIGINT AS n_total,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors
  FROM events GROUP BY 1
)
SELECT h, n_total, n_errors,
       n_errors / n_total AS error_rate,
       (n_errors / n_total) / (1.0::DOUBLE - {SLO_TARGET}::DOUBLE) AS burn_rate,
       (n_errors / n_total) / (1.0::DOUBLE - {SLO_TARGET}::DOUBLE) > 1.0::DOUBLE AS burning
FROM hourly
""",
    }
)


# --- round-7 addition: market-concentration HHI -----------------------------


def supplier_hhi(li: DataFrame, part: DataFrame) -> DataFrame:
    """(p_brand, n_suppliers, hhi, concentration): Herfindahl-Hirschman
    index of supplier revenue concentration per part brand —
    the antitrust-grade concentration metric (sum of squared revenue
    shares, 1.0 = monopoly; the DOJ bands label < 0.15 competitive,
    0.15-0.25 moderate, above concentrated).

    Exactness: revenue sums are DECIMAL(12,2) (order-free exact);
    share = one division of exact decimals cast double; the SUM of
    squared shares crosses aggregation order, so each square is
    floor-quantized (the pca.py idiom) before the exact integer sum —
    the HHI hash-checks exactly.

    100 TB shape: one (mfgr, supplier) revenue agg (map-side
    combined), a broadcast of the |brand|-row totals, and a
    brand-cardinality quantized agg.
    """
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("r"))
        # (brand, supplier)-sized; feeds totals + the share join — one
        # lineitem x part pass instead of two (r11, guide §5)
        .localCheckpoint(eager=False)
    )
    tot = rev.groupBy("p_brand").agg(
        F.sum("r").cast("decimal(38,2)").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    share = F.col("r").cast("double") / F.col("t").cast("double")
    hhi = (
        rev.join(F.broadcast(tot), "p_brand")
        .select("p_brand", "n_suppliers", (share * share).alias("s2"))
        .groupBy("p_brand", "n_suppliers")
        .agg(
            (
                F.sum(F.floor(F.col("s2") * F.lit(1e12)).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .cast("double")
                / F.lit(1e12)
            ).alias("hhi")
        )
    )
    return hhi.select(
        "p_brand",
        "n_suppliers",
        "hhi",
        F.when(F.col("hhi") < 0.15, F.lit("competitive"))
        .when(F.col("hhi") < 0.25, F.lit("moderate"))
        .otherwise(F.lit("concentrated"))
        .alias("concentration"),
    )


def _q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return supplier_hhi(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


QUERIES.update({"supplier_concentration_hhi": _q_supplier_hhi})

ORACLES.update(
    {
        "supplier_concentration_hhi": """
WITH rev AS (
  SELECT p.p_brand, l.l_suppkey,
         sum(l.l_extendedprice::DECIMAL(12,2)) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
tot AS (
  SELECT p_brand, sum(r)::DECIMAL(38,2) AS t, count(*)::BIGINT AS n_suppliers
  FROM rev GROUP BY 1
),
sq AS (
  SELECT rev.p_brand, tot.n_suppliers,
         (rev.r::DOUBLE / tot.t::DOUBLE) * (rev.r::DOUBLE / tot.t::DOUBLE) AS s2
  FROM rev JOIN tot USING (p_brand)
),
h AS (
  SELECT p_brand, n_suppliers,
         sum(floor(s2 * 1e12)::BIGINT)::DOUBLE / 1e12 AS hhi
  FROM sq GROUP BY 1, 2
)
SELECT p_brand, n_suppliers, hhi,
       CASE WHEN hhi < 0.15 THEN 'competitive'
            WHEN hhi < 0.25 THEN 'moderate'
            ELSE 'concentrated' END AS concentration
FROM h
""",
    }
)


# --- round-7 addition: revenue Gini coefficient ------------------------------


def revenue_gini(orders: DataFrame) -> DataFrame:
    """(n_customers, total_revenue, gini): Gini coefficient of customer
    revenue — the inequality summary beside the ABC classes and the
    brand HHI (same family: how skewed is the revenue base).  With
    revenues x sorted ASCENDING and 1-based rank i:

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    The DESCENDING rank d from abc_pareto's banded distributed prefix
    sum converts exactly (i = n + 1 - d), so this composes the
    single-partition-free rank machinery instead of a global window:
    sum(i*x) = (n+1)*sum(x) - sum(d*x).

    Exactness: x is exact DECIMAL revenue, d and n are BIGINTs, so
    every product and sum stays exact DECIMAL under any aggregation
    order; G is ONE final division of exact decimals cast double —
    hash-exact with no quantization at all.
    """
    ranked = abc_pareto(orders).select(
        "rank", F.col("revenue").cast("decimal(38,2)").alias("rev")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("decimal(38,2)").alias("sx"),
        F.sum(F.col("rank") * F.col("rev")).cast("decimal(38,2)").alias("sdx"),
    )
    n, sx, sdx = F.col("n"), F.col("sx"), F.col("sdx")
    # sum(i*x) with ascending i, from the descending-rank sum
    six = (n + 1) * sx - sdx
    return agg.select(
        n.alias("n_customers"),
        sx.cast("string").alias("total_revenue"),
        (
            (F.lit(2) * six - (n + 1) * sx).cast("decimal(38,2)").cast("double")
            / (n * sx).cast("decimal(38,2)").cast("double")
        ).alias("gini"),
    )


def _q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_gini(load_table(spark, sf_dir, "orders"))


QUERIES.update({"orders_revenue_gini": _q_revenue_gini})

ORACLES.update(
    {
        # the naive global-rank formulation: the banded rank is
        # hash-identical to it (abc_pareto's proof), so the sums match
        "orders_revenue_gini": """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(12,2)) AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT rev::DECIMAL(38,2) AS rev,
         row_number() OVER (ORDER BY rev DESC, o_custkey)::BIGINT AS d
  FROM rev
),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(rev)::DECIMAL(38,2) AS sx,
         sum(d * rev)::DECIMAL(38,2) AS sdx
  FROM ranked
)
SELECT n AS n_customers,
       sx::VARCHAR AS total_revenue,
       ((2 * ((n + 1) * sx - sdx) - (n + 1) * sx)::DECIMAL(38,2)::DOUBLE)
         / ((n * sx)::DECIMAL(38,2)::DOUBLE) AS gini
FROM agg
""",
    }
)


# --- round-7 addition: alert episode debounce --------------------------------

ALERT_RATE = 0.3  # hourly error-share that trips the alert


def alert_episodes(ev: DataFrame, rate: float = ALERT_RATE) -> DataFrame:
    """(episode_start, episode_end, n_hours, peak_rate, total_errors):
    consecutive alerting hours collapsed into EPISODES — the
    alert-debounce primitive (page once per incident, not once per
    hour).  An hour alerts when its error share exceeds ``rate``;
    adjacent alerting hours (gap = exactly 1 hour) form one episode.

    Gaps-and-islands on the filtered hourly spine: integer hour
    arithmetic (epoch-hours), exact counts, one ratio per hour (single
    division) and a max over exact ratios — all engine-exact.

    100 TB shape: one (hour) agg collapses the stream; the island
    windows run over alerting-hour-cardinality rows only.
    """
    from pyspark.sql.window import Window as W

    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("e"),
    )
    alerting = hourly.select(
        "h",
        "e",
        (F.col("e") / F.col("n")).alias("r"),
        (F.unix_seconds(F.col("h")) / 3600).cast("long").alias("hi"),
    ).where(F.col("r") > rate)
    w = W.orderBy("hi")
    flagged = alerting.select(
        "*",
        F.when(
            F.lag("hi").over(w).isNull() | (F.col("hi") - F.lag("hi").over(w) > 1), 1
        ).otherwise(0).alias("chg"),
    )
    isl = flagged.select(
        "*", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("ep")
    )
    return isl.groupBy("ep").agg(
        F.min("h").alias("episode_start"),
        F.max("h").alias("episode_end"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.max("r").alias("peak_rate"),
        F.sum("e").cast("long").alias("total_errors"),
    ).drop("ep")


def _q_alert_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alert_episodes(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_alert_episodes": _q_alert_episodes})

ORACLES.update(
    {
        "events_alert_episodes": f"""
WITH hourly AS (
  SELECT datetrunc('hour', ts) AS h, count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS e
  FROM events GROUP BY 1
),
alerting AS (
  SELECT h, e, e / n AS r, (epoch(h)::BIGINT // 3600) AS hi
  FROM hourly WHERE e / n > {ALERT_RATE!r}
),
flagged AS (
  SELECT *, CASE WHEN lag(hi) OVER (ORDER BY hi) IS NULL
                   OR hi - lag(hi) OVER (ORDER BY hi) > 1
                 THEN 1 ELSE 0 END AS chg
  FROM alerting
),
isl AS (
  SELECT *, sum(chg) OVER (ORDER BY hi ROWS UNBOUNDED PRECEDING) AS ep
  FROM flagged
)
SELECT min(h) AS episode_start, max(h) AS episode_end,
       count(*)::BIGINT AS n_hours, max(r) AS peak_rate,
       sum(e)::BIGINT AS total_errors
FROM isl GROUP BY ep
""",
    }
)


# --- round-8 closing addition: mergeable histogram quantiles ---------------

QUANTILE_QS = (50, 90, 99)


def value_bins(ev: DataFrame) -> DataFrame:
    """(event_type, bin, n): the mergeable quantile-sketch state —
    event values floor-quantized to integer cents and histogrammed.
    Fixed data-independent bin rule, so counts SUM-merge over any
    partitioning/batching (the IncrementalQuantile contract), exactly
    like CMS counters."""
    return (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles_from_bins(
    bins: DataFrame,
    qs: tuple = QUANTILE_QS,
    key: str | None = "event_type",
    scale: float = 100.0,
) -> DataFrame:
    """([key,] q, n, bin, est): the deterministic quantile readout —
    smallest bin whose cumulative count reaches ceil(q * n / 100), all
    integer arithmetic; ``est`` is the bin lower bound in value units
    (one exact division by ``scale``).  ``key=None`` computes one
    global distribution.  Shared verbatim by the batch operators and
    the streaming twin so their equality is structural."""
    from pyspark.sql.window import Window as W

    kcols = [key] if key else []
    w_cum = W.partitionBy(*kcols).orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_tot = W.partitionBy(*kcols)
    c = bins.select(
        *kcols,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("tot"),
    )
    ex = c.select(
        *kcols,
        "bin",
        "cum",
        "tot",
        F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q"),
    )
    hit = ex.where(F.col("cum") >= F.expr("(q * tot + 99) DIV 100"))
    out = hit.groupBy(*kcols, "q").agg(
        F.min("bin").alias("bin"), F.max("tot").alias("n")
    )
    return out.select(
        *kcols,
        F.col("q").cast("long").alias("q"),
        F.col("n").cast("long").alias("n"),
        "bin",
        (F.col("bin") / F.lit(float(scale))).alias("est"),
    )


def hist_quantiles(ev: DataFrame, qs: tuple = QUANTILE_QS) -> DataFrame:
    """p50/p90/p99 of ``value`` per event_type from the mergeable
    histogram sketch — the quantile member of the sketch family
    (HLL = distinct, CMS = frequency, this = distribution).  At cent
    resolution the estimate is exact to the bin floor (error bounded
    by the 0.01 bin width), and unlike exact percentile it needs only
    one sketch-sized exchange and never a per-group sort of raw
    values.

    100 TB shape: the only corpus-sized stage is the map-side-combined
    (type, bin) count; the cumsum window runs over bounded bin
    cardinality (value-range/0.01 per type), and state SUM-merges
    across batches — the same economics as the CMS."""
    return quantiles_from_bins(value_bins(ev), qs)


def _q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hist_quantiles(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_value_quantiles": _q_hist_quantiles})

ORACLES.update(
    {
        "events_value_quantiles": f"""
WITH b AS (
  SELECT event_type, floor(value * 100)::BIGINT AS bin, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(n) OVER (PARTITION BY event_type)::BIGINT AS tot
  FROM b
),
x AS (
  SELECT c.event_type, c.bin, c.cum, c.tot, t.q
  FROM c CROSS JOIN (VALUES (50), (90), (99)) AS t(q)
),
h AS (
  SELECT event_type, q, min(bin) AS bin, max(tot) AS n
  FROM x WHERE cum >= (q * tot + 99) // 100
  GROUP BY 1, 2
)
SELECT event_type, q::BIGINT AS q, n, bin, bin / 100.0 AS est FROM h
""",
    }
)


def session_duration_quantiles(ev: DataFrame) -> DataFrame:
    """(q, n, bin, est): p50/p90/p99 of session DURATION seconds over
    the gap sessionizer — the engagement-depth distribution behind the
    bounce rate (a p50 of 0 s with a fat p99 is a drive-by corpus; a
    rising p90 is stickiness).  Durations come from integer epoch
    seconds (max - min per session), never from re-parsing rendered
    timestamps — string round-trips through a non-UTC driver session
    could shift DST-straddling sessions by an hour.

    100 TB shape: one user-keyed session window (the sessionizer's
    own exchange), a duration-bin count, then the shared sketch
    readout over bounded bin cardinality."""
    from pyspark.sql.window import Window as W

    from .sessionize import GAP_SECS

    sec = F.unix_timestamp("ts").cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag(sec).over(w)
    is_new = F.when(prev_sec.isNull() | (sec - prev_sec > GAP_SECS), 1).otherwise(0)
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    with_idx = ev.select(
        "user_id", "ts", "event_id", sec.alias("sec"),
        F.sum(is_new).over(run).alias("session_idx"),
    )
    ses = with_idx.groupBy("user_id", "session_idx").agg(
        (F.max("sec") - F.min("sec")).alias("bin")
    )
    bins = ses.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    return quantiles_from_bins(bins, key=None, scale=1.0)


def _q_session_duration_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_duration_quantiles(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_session_duration_quantiles": _q_session_duration_quantiles})


def _sess_dur_oracle() -> str:
    from .sessionize import GAP_SECS

    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, epoch_us(ts) // 1000000 AS sec,
         lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev_sec
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, sec,
         CASE WHEN prev_sec IS NULL OR sec - prev_sec > {GAP_SECS}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
runs AS (
  SELECT user_id, sec,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
),
ses AS (
  SELECT user_id, session_idx, max(sec) - min(sec) AS bin
  FROM runs GROUP BY 1, 2
),
b AS (SELECT bin, count(*)::BIGINT AS n FROM ses GROUP BY 1),
c AS (
  SELECT bin,
         sum(n) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(n) OVER ()::BIGINT AS tot
  FROM b
),
x AS (SELECT c.bin, c.cum, c.tot, t.q
      FROM c CROSS JOIN (VALUES (50), (90), (99)) AS t(q)),
h AS (SELECT q, min(bin) AS bin, max(tot) AS n
      FROM x WHERE cum >= (q * tot + 99) // 100 GROUP BY 1)
SELECT q::BIGINT AS q, n, bin, bin / 1.0 AS est FROM h
"""


ORACLES.update({"events_session_duration_quantiles": _sess_dur_oracle()})
