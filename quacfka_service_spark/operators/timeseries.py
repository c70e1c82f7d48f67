"""Time-series subsequence similarity (motif search) over the event
stream.

"Time Series Similarity Search for Streaming Data in Distributed
Systems" (EDBT 2019, PAPERS.md) frames the ops gap this fills: given
the per-type hourly activity series, find the historical windows most
similar to the CURRENT window — the "when did traffic last look like
this?" query behind incident triage, seasonality mining and anomaly
explanation.

Semantics (deterministic, exact-oracled):

- series        per event_type: hourly sums of ``value`` in
                DECIMAL(18,6) (exact under any partial-agg order),
                ordered by hour, densified to observed hours (index =
                position in the sorted hour list).
- query window  the LAST ``window`` points of each type's series.
- candidates    every earlier start with no overlap with the query
                window (start <= n - 2*window + 1).
- distance      z-normalized Euclidean: both windows are centered and
                scaled by their own mean/std before the pointwise
                distance — the standard shape-similarity measure (raw
                Euclidean just clusters by magnitude).  Windows with
                zero variance are skipped (shape undefined), same
                guard both engines.
- output        top-``k`` starts per type, ties broken by start index.

Float-parity discipline: every sum is a sequential F.aggregate fold
over an ordered slice (bit-identical to DuckDB's list_reduce with a
prepended zero seed); mean/var/distance are then scalar IEEE ops on
identical doubles, so the driver hash-checks exact float distances.

100 TB shape: the per-type series length is bounded by CALENDAR TIME
(a year of hours = 8,760 points), not data size — collapsing the event
stream to (type, hour) sums is the only data-sized stage (one
map-side-combined agg), after which per-type arrays are broadcast-tiny
and the window scan is |starts| x window arithmetic per type.  This is
the same histogram-collapse trick as corpus_length_deciles: reduce to
a value-cardinality-bounded structure first, then do the quadratic-ish
work there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

TS_WINDOW = 24
TS_TOP_K = 5


def _fold_sum(arr):
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _hourly_series(ev: DataFrame) -> DataFrame:
    """(event_type, s): hour-ordered per-type value series — exact
    DECIMAL sums, shared by motif and discord search."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    return hourly.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("h", "v"))),
            lambda s: s["v"].cast("double"),
        ).alias("s")
    )


def ts_motif_topk(
    ev: DataFrame, window: int = TS_WINDOW, k: int = TS_TOP_K
) -> DataFrame:
    """(event_type, start, dist, rank): top-k z-normalized nearest
    historical windows to each type's latest window (module docstring)."""
    series = _hourly_series(ev)
    n = F.size("s")
    starts = F.when(
        n >= 2 * window, F.sequence(F.lit(1), n - 2 * window + 1)
    ).otherwise(F.array().cast("array<int>"))
    ex = series.select(
        "event_type", "s", F.size("s").alias("n"), F.explode(starts).alias("start")
    )
    w = F.lit(float(window))
    cand = F.slice("s", F.col("start"), window)
    qry = F.slice("s", F.col("n") - window + 1, window)

    def _stats(arr):
        mean = _fold_sum(arr) / w
        var = _fold_sum(F.transform(arr, lambda x: x * x)) / w - mean * mean
        return mean, var

    cm, cv = _stats(cand)
    qm, qv = _stats(qry)
    # Zero-variance guard on the RAW variance, before sqrt: for a
    # constant window E[x^2]-mean^2 can land a few ulp NEGATIVE (e.g.
    # a window of constant 0.1 gives var = -2e-18), and sqrt(<0) is
    # NaN — which both Spark and DuckDB order GREATER than 0, so a
    # flat window would pass a sqrt(var) > 0 filter and poison every
    # distance with NaN (ADVICE r6 #1).  var > 0 has no NaN path.
    scored = (
        ex.select(
            "event_type",
            "start",
            cand.alias("c"),
            qry.alias("q"),
            cm.alias("cm"),
            cv.alias("cv"),
            qm.alias("qm"),
            qv.alias("qv"),
        )
        .where((F.col("cv") > 0) & (F.col("qv") > 0))
        .select(
            "event_type",
            "start",
            "c",
            "q",
            "cm",
            F.sqrt("cv").alias("cs"),
            "qm",
            F.sqrt("qv").alias("qs"),
        )
    )
    diff = F.zip_with(
        F.col("c"),
        F.col("q"),
        lambda a, b: ((a - F.col("cm")) / F.col("cs") - (b - F.col("qm")) / F.col("qs"))
        * ((a - F.col("cm")) / F.col("cs") - (b - F.col("qm")) / F.col("qs")),
    )
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    win = Window.partitionBy("event_type").orderBy(F.asc("dist"), F.asc("start"))
    return (
        scored.select("event_type", "start", dist.alias("dist"))
        .select(
            "event_type",
            F.col("start").cast("long").alias("start"),
            "dist",
            F.row_number().over(win).alias("rank"),
        )
        .where(F.col("rank") <= k)
        .select("event_type", "start", "dist", F.col("rank").cast("long").alias("rank"))
    )


DISCORD_TOP_K = 3


def ts_discord_topk(
    ev: DataFrame, window: int = TS_WINDOW, k: int = DISCORD_TOP_K
) -> DataFrame:
    """Time-series DISCORDS (Keogh et al.): the windows FARTHEST from
    their nearest non-overlapping neighbor — the complement of motif
    search, and the classic unsupervised anomaly detector for series
    ("which day looked like no other day?").  For every window start,
    nn_dist = min z-normalized distance to any window at |i - j| >=
    ``window``; the top-``k`` LARGEST nn_dist per type are the
    discords (ties -> lower start).

    Zero-variance windows are excluded from both sides (shape
    undefined), same guard as motif search; a type needs at least two
    non-overlapping varying windows to emit anything.

    100 TB shape: inherits _hourly_series's collapse — after the one
    data-sized aggregate, the all-pairs window scan is |starts|^2 x W
    scalar arithmetic on calendar-bounded arrays (8,760 hourly starts
    per YEAR of data, regardless of corpus bytes), partitioned per
    type.  The per-pair kernel reuses the pre-z-scored window arrays,
    so each window normalizes once, not once per pair."""
    series = _hourly_series(ev)
    n = F.size("s")
    starts = F.when(
        n >= 2 * window, F.sequence(F.lit(1), n - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    ex = series.select("event_type", "s", F.explode(starts).alias("start"))
    w = F.lit(float(window))
    wnd = F.slice("s", F.col("start"), window)
    mean = _fold_sum(wnd) / w
    var = _fold_sum(F.transform(wnd, lambda x: x * x)) / w - mean * mean
    # Raw-variance guard (not sqrt(var) > 0): a constant window's var
    # can be a few ulp negative, sqrt of that is NaN, and NaN orders
    # greater than 0 in BOTH engines — see the motif guard above
    # (ADVICE r6 #1).
    zx = (
        ex.select(
            "event_type", "start", wnd.alias("wv"), mean.alias("m"), var.alias("var")
        )
        .where(F.col("var") > 0)
        .select(
            "event_type",
            "start",
            F.transform(
                "wv", lambda x: (x - F.col("m")) / F.sqrt("var")
            ).alias("z"),
        )
    )
    a = zx.select("event_type", F.col("start").alias("ia"), F.col("z").alias("za"))
    b = zx.select("event_type", F.col("start").alias("ib"), F.col("z").alias("zb"))
    pairs = a.join(
        b,
        ["event_type"],
    ).where(F.abs(F.col("ia") - F.col("ib")) >= window)
    d2 = F.aggregate(
        F.zip_with(F.col("za"), F.col("zb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nn = (
        pairs.select("event_type", "ia", d2.alias("d2"))
        .groupBy("event_type", "ia")
        .agg(F.sqrt(F.min("d2")).alias("nn_dist"))
    )
    win = Window.partitionBy("event_type").orderBy(F.desc("nn_dist"), F.asc("ia"))
    return (
        nn.select(
            "event_type",
            F.col("ia").cast("long").alias("start"),
            "nn_dist",
            F.row_number().over(win).alias("rank"),
        )
        .where(F.col("rank") <= k)
        .select(
            "event_type", "start", "nn_dist", F.col("rank").cast("long").alias("rank")
        )
    )


ACF_MAX_LAG = 36


def ts_seasonality(ev: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """Seasonality detection via the autocorrelation function: for each
    event_type's hourly series, ACF(lag) for lag = 1..``max_lag``,
    ranked per type (acf DESC, lag ASC) — the peak lag IS the dominant
    period ("is this traffic daily? half-daily?"), the precursor every
    forecasting/anomaly pipeline runs before choosing its window.

    ACF(lag) = sum_i c_i * c_(i+lag) / sum_i c_i^2 over the mean-
    centered series c.  Sequential folds over ordered slices keep the
    float ratios engine-exact (same discipline as motif/discord).
    Series with zero variance are skipped.

    100 TB shape: inherits _hourly_series's calendar-bounded collapse;
    the lag scan is max_lag x n scalar ops per type on broadcast-tiny
    arrays."""
    series = _hourly_series(ev)
    n = F.size("s")
    mean = _fold_sum(F.col("s")) / n.cast("double")
    c = F.transform(F.col("s"), lambda x: x - mean)
    denom = _fold_sum(F.transform(c, lambda x: x * x))
    base = series.select(
        "event_type", c.alias("c"), denom.alias("denom"), n.alias("n")
    ).where((F.col("denom") > 0) & (F.col("n") > max_lag))
    ex = base.select(
        "event_type",
        "c",
        "denom",
        "n",
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
    )
    num = F.aggregate(
        F.zip_with(
            F.slice("c", F.lit(1), F.col("n") - F.col("lag")),
            F.slice("c", F.col("lag") + 1, F.col("n") - F.col("lag")),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    win = Window.partitionBy("event_type").orderBy(F.desc("acf"), F.asc("lag"))
    return (
        ex.select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            (num / F.col("denom")).alias("acf"),
        )
        .select(
            "event_type", "lag", "acf", F.row_number().over(win).cast("long").alias("rank")
        )
    )


# --- queries()/oracle_sql() registrations ---------------------------------


def _q_ts_motif_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_motif_topk(load_table(spark, sf_dir, "events"))


def _q_ts_discord_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_discord_topk(load_table(spark, sf_dir, "events"))


def _q_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_seasonality(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_ts_motif_topk": _q_ts_motif_topk,
    "events_ts_discord_topk": _q_ts_discord_topk,
    "events_ts_seasonality": _q_ts_seasonality,
}

ORACLES = {
    "events_ts_motif_topk": f"""
WITH hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h,
         sum(value::DECIMAL(18,6)) AS v
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list_transform(list(v ORDER BY h), x -> x::DOUBLE) AS s
  FROM hourly GROUP BY event_type
),
ex AS (
  SELECT event_type, s, len(s) AS n, unnest(
           CASE WHEN len(s) >= 2 * {TS_WINDOW}
                THEN generate_series(1, len(s) - 2 * {TS_WINDOW} + 1)
                ELSE [] END) AS start
  FROM series
),
wnd AS (
  SELECT event_type, start,
         list_slice(s, start, start + {TS_WINDOW} - 1) AS c,
         list_slice(s, n - {TS_WINDOW} + 1, n) AS q
  FROM ex
),
stats AS (
  -- raw variances (no sqrt yet): the zero-variance guard must filter
  -- on var > 0 because a constant window's E[x^2]-mean^2 can be a few
  -- ulp NEGATIVE and sqrt of that is NaN, which DuckDB (and Spark)
  -- order GREATER than 0.
  SELECT event_type, start, c, q,
         list_reduce(list_prepend(0.0, c), (a, b) -> a + b) / {float(TS_WINDOW)} AS cm,
         list_reduce(list_prepend(0.0, list_transform(c, x -> x * x)), (a, b) -> a + b)
              / {float(TS_WINDOW)}
              - (list_reduce(list_prepend(0.0, c), (a, b) -> a + b) / {float(TS_WINDOW)})
                * (list_reduce(list_prepend(0.0, c), (a, b) -> a + b) / {float(TS_WINDOW)}) AS cv,
         list_reduce(list_prepend(0.0, q), (a, b) -> a + b) / {float(TS_WINDOW)} AS qm,
         list_reduce(list_prepend(0.0, list_transform(q, x -> x * x)), (a, b) -> a + b)
              / {float(TS_WINDOW)}
              - (list_reduce(list_prepend(0.0, q), (a, b) -> a + b) / {float(TS_WINDOW)})
                * (list_reduce(list_prepend(0.0, q), (a, b) -> a + b) / {float(TS_WINDOW)}) AS qv
  FROM wnd
),
zs AS (
  SELECT event_type, start, c, q, cm, sqrt(cv) AS cs, qm, sqrt(qv) AS qs
  FROM stats WHERE cv > 0 AND qv > 0
),
scored AS (
  SELECT event_type, start,
         sqrt(list_reduce(list_prepend(0.0,
           list_transform(generate_series(1, {TS_WINDOW}),
             i -> ((c[i] - cm) / cs - (q[i] - qm) / qs)
                * ((c[i] - cm) / cs - (q[i] - qm) / qs))),
           (a, b) -> a + b)) AS dist
  FROM zs
)
SELECT event_type, start::BIGINT AS start, dist, rank::BIGINT AS rank FROM (
  SELECT event_type, start, dist,
         row_number() OVER (PARTITION BY event_type ORDER BY dist ASC, start ASC) AS rank
  FROM scored
) WHERE rank <= {TS_TOP_K}
""",
    "events_ts_discord_topk": f"""
WITH hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h,
         sum(value::DECIMAL(18,6)) AS v
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list_transform(list(v ORDER BY h), x -> x::DOUBLE) AS s
  FROM hourly GROUP BY event_type
),
ex AS (
  SELECT event_type, s, unnest(
           CASE WHEN len(s) >= 2 * {TS_WINDOW}
                THEN generate_series(1, len(s) - {TS_WINDOW} + 1)
                ELSE [] END) AS start
  FROM series
),
zx AS (
  -- guard on the RAW variance (var > 0), not sqrt(var) > 0: constant
  -- windows can compute var a few ulp negative, sqrt is NaN, and NaN
  -- orders greater than 0 in both engines.
  SELECT event_type, start, list_transform(wv, x -> (x - m) / sqrt(var)) AS z
  FROM (
    SELECT event_type, start, wv,
           list_reduce(list_prepend(0.0, wv), (a, b) -> a + b) / {float(TS_WINDOW)} AS m,
           list_reduce(list_prepend(0.0, list_transform(wv, x -> x * x)), (a, b) -> a + b)
                / {float(TS_WINDOW)}
                - (list_reduce(list_prepend(0.0, wv), (a, b) -> a + b) / {float(TS_WINDOW)})
                  * (list_reduce(list_prepend(0.0, wv), (a, b) -> a + b) / {float(TS_WINDOW)}) AS var
    FROM (SELECT event_type, start,
                 list_slice(s, start, start + {TS_WINDOW} - 1) AS wv
          FROM ex))
  WHERE var > 0
),
pairs AS (
  SELECT a.event_type, a.start AS ia,
         list_reduce(list_prepend(0.0,
           list_transform(generate_series(1, {TS_WINDOW}),
             i -> (a.z[i] - b.z[i]) * (a.z[i] - b.z[i]))),
           (x, y) -> x + y) AS d2
  FROM zx a JOIN zx b
    ON a.event_type = b.event_type AND abs(a.start - b.start) >= {TS_WINDOW}
),
nn AS (
  SELECT event_type, ia, sqrt(min(d2)) AS nn_dist FROM pairs GROUP BY 1, 2
)
SELECT event_type, start, nn_dist, rank::BIGINT AS rank FROM (
  SELECT event_type, ia::BIGINT AS start, nn_dist,
         row_number() OVER (PARTITION BY event_type ORDER BY nn_dist DESC, ia ASC) AS rank
  FROM nn
) WHERE rank <= {DISCORD_TOP_K}
""",
    "events_ts_seasonality": f"""
WITH hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h,
         sum(value::DECIMAL(18,6)) AS v
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list_transform(list(v ORDER BY h), x -> x::DOUBLE) AS s
  FROM hourly GROUP BY event_type
),
base AS (
  SELECT event_type, c, denom, n FROM (
    SELECT event_type,
           list_transform(s, x -> x - m) AS c,
           list_reduce(list_prepend(0.0,
             list_transform(list_transform(s, x -> x - m), x -> x * x)),
             (a, b) -> a + b) AS denom,
           len(s) AS n
    FROM (SELECT event_type, s,
                 list_reduce(list_prepend(0.0, s), (a, b) -> a + b)
                   / len(s)::DOUBLE AS m
          FROM series))
  WHERE denom > 0 AND n > {ACF_MAX_LAG}
),
ex AS (
  SELECT event_type, c, denom, n, unnest(generate_series(1, {ACF_MAX_LAG})) AS lag
  FROM base
),
acfs AS (
  SELECT event_type, lag::BIGINT AS lag,
         list_reduce(list_prepend(0.0,
           list_transform(generate_series(1, n - lag),
             i -> c[i] * c[i + lag])),
           (a, b) -> a + b) / denom AS acf
  FROM ex
)
SELECT event_type, lag, acf,
       row_number() OVER (PARTITION BY event_type ORDER BY acf DESC, lag ASC)::BIGINT AS rank
FROM acfs
""",
}


# --- round-7 additions: changepoint + EWMA --------------------------------

CUSUM_TOP_K = 3
EWMA_ALPHA = 0.25  # exactly representable in binary: parity-safe


def ts_changepoint_cusum(ev: DataFrame, k: int = CUSUM_TOP_K) -> DataFrame:
    """(event_type, h, stat, rank): top-k CUSUM changepoint boundaries
    per type over the hourly COUNT series.

    CUSUM picks the split hour i maximizing |cum_i - i*T/n| (observed
    cumulative count vs the uniform-rate expectation).  Multiplying
    through by n keeps the statistic in exact BIGINTs:

        stat_i = | n * cum_i - i * T |

    so the driver hash-check is integer-exact — no float tolerance
    needed.  Overflow headroom: n is calendar-bounded (a year of hours
    = 8760), so n*cum <= 8.8e3 * total-rows; even a 10^12-row type
    stays under 2^63 (9.2e18).  Beyond that, cast the products to
    DECIMAL(38,0).

    100 TB shape: the only data-sized stage is the (type, hour) count
    agg (map-side combined); the window functions then run over
    calendar-bounded series — one hash exchange on event_type, and the
    cumulative/rank windows share that partitioning (single sort).
    Same histogram-collapse discipline as the motif/discord family.
    """
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return cusum_from_hourly(hourly, k)


def cusum_from_hourly(hourly: DataFrame, k: int = CUSUM_TOP_K) -> DataFrame:
    """CUSUM tail over an (event_type, h, c) hourly-count frame —
    shared verbatim by the batch operator and IncrementalCusum, so the
    streaming readout is bit-identical to the batch one by
    construction (integer counts SUM-merge exactly for any
    batching)."""
    wc = Window.partitionBy("event_type").orderBy("h")
    wall = Window.partitionBy("event_type")
    scored = hourly.select(
        "event_type",
        "h",
        F.sum("c").over(wc.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(wc).cast("long").alias("i"),
        F.sum("c").over(wall).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).select(
        "event_type",
        "h",
        F.abs(F.col("n") * F.col("cum") - F.col("i") * F.col("t")).alias("stat"),
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("stat"), F.asc("h"))
    return (
        scored.select(
            "event_type", "h", "stat", F.row_number().over(wr).cast("long").alias("rank")
        )
        .where(F.col("rank") <= k)
    )


def ts_ewma(ev: DataFrame, alpha: float = EWMA_ALPHA) -> DataFrame:
    """(event_type, idx, ewma): exponentially weighted moving average
    of each type's hour-ordered value series.

    The recurrence s_i = alpha*x_i + (1-alpha)*s_{i-1} (s_1 = x_1) is
    evaluated as a SEQUENTIAL left fold appending to the accumulator
    array — the same fold DuckDB's recursive-CTE oracle performs, and
    since alpha = 0.25 and 1-alpha = 0.75 are exact binary fractions,
    every multiply/add is the identical IEEE op in both engines: the
    smoothed doubles are bit-equal (same discipline as the motif
    distances).

    100 TB shape: identical to the rest of this module — one data-
    sized (type, hour) DECIMAL agg, then per-type arrays bounded by
    calendar hours; the fold is O(series length) per type with no
    additional exchange.
    """
    series = _hourly_series(ev)
    a, b = F.lit(float(alpha)), F.lit(1.0 - alpha)
    smoothed = series.where(F.size("s") >= 1).select(
        "event_type",
        F.aggregate(
            F.slice("s", 2, F.greatest(F.size("s") - 1, F.lit(0))),
            F.array(F.element_at("s", 1)),
            lambda acc, x: F.concat(
                acc, F.array(a * x + b * F.element_at(acc, -1))
            ),
        ).alias("e"),
    )
    return smoothed.select(
        "event_type", F.posexplode("e").alias("idx0", "ewma")
    ).select("event_type", (F.col("idx0") + 1).cast("long").alias("idx"), "ewma")


def _q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_changepoint_cusum(load_table(spark, sf_dir, "events"))


def _q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_ewma(load_table(spark, sf_dir, "events"))


QUERIES.update(
    {
        "events_ts_changepoint": _q_ts_changepoint,
        "events_ts_ewma": _q_ts_ewma,
    }
)

ORACLES.update(
    {
        "events_ts_changepoint": f"""
WITH hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, h,
         abs((count(*) OVER (PARTITION BY event_type))
               * (sum(c) OVER (PARTITION BY event_type ORDER BY h
                               ROWS UNBOUNDED PRECEDING))
             - (row_number() OVER (PARTITION BY event_type ORDER BY h))
               * (sum(c) OVER (PARTITION BY event_type)))::BIGINT AS stat
  FROM hourly
)
SELECT event_type, h, stat, rank FROM (
  SELECT event_type, h, stat,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY stat DESC, h ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= {CUSUM_TOP_K}
""",
        # recursive-CTE mirror of the sequential fold: same
        # 0.25*x + 0.75*prev IEEE ops in series order.
        "events_ts_ewma": f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h,
         sum(value::DECIMAL(18,6)) AS v
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT event_type, v::DOUBLE AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY h)::BIGINT AS idx
  FROM hourly
),
ew AS (
  SELECT event_type, idx, x AS ewma FROM pts WHERE idx = 1
  UNION ALL
  SELECT p.event_type, p.idx, {EWMA_ALPHA} * p.x + {1.0 - EWMA_ALPHA} * e.ewma
  FROM ew e JOIN pts p
    ON p.event_type = e.event_type AND p.idx = e.idx + 1
)
SELECT event_type, idx, ewma FROM ew
""",
    }
)


HOLT_ALPHA = 0.5   # exact binary fractions: parity-safe
HOLT_BETA = 0.25


def ts_holt(ev: DataFrame, alpha: float = HOLT_ALPHA, beta: float = HOLT_BETA) -> DataFrame:
    """(event_type, idx, level, trend, forecast): Holt's linear
    (double-exponential) smoothing of each type's hour-ordered value
    series — EWMA's forecasting twin, tracking a local trend so
    ``forecast = level + trend`` is the 1-step-ahead prediction.

        level_i = a*x_i + (1-a)*(level_{i-1} + trend_{i-1})
        trend_i = b*(level_i - level_{i-1}) + (1-b)*trend_{i-1}
        level_1 = x_1,  trend_1 = x_2 - x_1   (types with < 2 points skip)

    Parity: one SEQUENTIAL fold appending (level, trend) pairs; the
    DuckDB oracle replays the identical recurrence in a recursive CTE
    with the same literal expression shapes, and a = 0.5, b = 0.25 are
    exact binary fractions — every multiply/add is the same IEEE op in
    the same order, so the doubles are bit-equal.

    100 TB shape: same as the rest of the module — the only data-sized
    stage is the (type, hour) DECIMAL agg; the fold runs over
    calendar-bounded per-type arrays.
    """
    series = _hourly_series(ev)
    a, na = F.lit(float(alpha)), F.lit(1.0 - alpha)
    b, nb = F.lit(float(beta)), F.lit(1.0 - beta)
    x1 = F.element_at("s", 1)
    x2 = F.element_at("s", 2)
    init = F.struct(
        F.array(x1).alias("ls"), F.array(x2 - x1).alias("ts")
    )

    def step(acc, x):
        lp = F.element_at(acc["ls"], -1)
        tp = F.element_at(acc["ts"], -1)
        lvl = a * x + na * (lp + tp)
        trd = b * (lvl - lp) + nb * tp
        return F.struct(
            F.concat(acc["ls"], F.array(lvl)).alias("ls"),
            F.concat(acc["ts"], F.array(trd)).alias("ts"),
        )

    folded = series.where(F.size("s") >= 2).select(
        "event_type",
        F.aggregate(F.slice("s", 2, F.size("s") - 1), init, step).alias("acc"),
    )
    return (
        folded.select(
            "event_type",
            F.posexplode(F.arrays_zip(F.col("acc.ls"), F.col("acc.ts"))).alias(
                "idx0", "z"
            ),
        )
        .select(
            "event_type",
            (F.col("idx0") + 1).cast("long").alias("idx"),
            F.col("z.ls").alias("level"),
            F.col("z.ts").alias("trend"),
            (F.col("z.ls") + F.col("z.ts")).alias("forecast"),
        )
    )


def _q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_holt(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_ts_holt": _q_ts_holt})

ORACLES.update(
    {
        "events_ts_holt": f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h,
         sum(value::DECIMAL(18,6)) AS v
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT event_type, v::DOUBLE AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY h)::BIGINT AS idx,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
hl AS (
  SELECT p1.event_type, p1.idx, p1.x AS level, p2.x - p1.x AS trend
  FROM pts p1 JOIN pts p2 ON p2.event_type = p1.event_type AND p2.idx = 2
  WHERE p1.idx = 1 AND p1.n >= 2
  UNION ALL
  SELECT p.event_type, p.idx,
         {HOLT_ALPHA} * p.x + {1.0 - HOLT_ALPHA} * (e.level + e.trend),
         {HOLT_BETA} * (({HOLT_ALPHA} * p.x + {1.0 - HOLT_ALPHA} * (e.level + e.trend)) - e.level)
           + {1.0 - HOLT_BETA} * e.trend
  FROM hl e JOIN pts p
    ON p.event_type = e.event_type AND p.idx = e.idx + 1
)
SELECT event_type, idx, level, trend, level + trend AS forecast FROM hl
""",
    }
)


def ts_forecast_backtest(ev: DataFrame) -> DataFrame:
    """(event_type, n_scored, mae_naive, mae_seasonal, skill): backtest
    of the two standard zero-parameter forecasting baselines over each
    type's hourly value series — naive (h-1 carries forward) vs
    seasonal-naive (h-24 carries forward) — and the skill ratio
    mae_seasonal / mae_naive (< 1 means daily seasonality is real and
    any model worth shipping must beat the seasonal line, the
    forecasting-evaluation companion to the EWMA/Holt smoothers).

    Exactness: hourly sums are DECIMAL(18,6); lags are windows over
    the (type, hour) order; absolute errors stay DECIMAL, so their SUM
    is exact under any aggregation order (no fold needed); each MAE is
    ONE division of exact numbers and the skill is one more.  Only
    hours where BOTH baselines can score (h >= 25th point) enter, so
    the two MAEs compare the same support.

    100 TB shape: one data-sized (type, hour) agg; the lag windows and
    the error agg ride one event_type exchange over calendar-bounded
    series rows.
    """
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("p1"),
        F.lag("v", 24).over(w).alias("p24"),
    ).where(F.col("p1").isNotNull() & F.col("p24").isNotNull())
    mae_n = F.sum(F.abs(F.col("v") - F.col("p1"))).cast("decimal(38,6)")
    mae_s = F.sum(F.abs(F.col("v") - F.col("p24"))).cast("decimal(38,6)")
    n = F.count(F.lit(1)).cast("long")
    return lagged.groupBy("event_type").agg(
        n.alias("n_scored"),
        (mae_n.cast("double") / n).alias("mae_naive"),
        (mae_s.cast("double") / n).alias("mae_seasonal"),
        F.when(
            mae_n > 0, mae_s.cast("double") / mae_n.cast("double")
        ).alias("skill"),
    )


def _q_ts_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts_forecast_backtest(load_table(spark, sf_dir, "events"))


QUERIES.update({"events_ts_forecast_backtest": _q_ts_backtest})

ORACLES.update(
    {
        "events_ts_forecast_backtest": """
WITH hourly AS (
  SELECT event_type, datetrunc('hour', ts) AS h,
         sum(value::DECIMAL(18,6)) AS v
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, v,
         lag(v, 1) OVER w AS p1,
         lag(v, 24) OVER w AS p24
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h)
)
SELECT event_type,
       count(*)::BIGINT AS n_scored,
       sum(abs(v - p1))::DECIMAL(38,6)::DOUBLE / count(*) AS mae_naive,
       sum(abs(v - p24))::DECIMAL(38,6)::DOUBLE / count(*) AS mae_seasonal,
       CASE WHEN sum(abs(v - p1)) > 0
            THEN sum(abs(v - p24))::DECIMAL(38,6)::DOUBLE
                 / sum(abs(v - p1))::DECIMAL(38,6)::DOUBLE END AS skill
FROM lagged
WHERE p1 IS NOT NULL AND p24 IS NOT NULL
GROUP BY event_type
""",
    }
)
