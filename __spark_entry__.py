"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Operator keys follow SURVEY.md §2's inventory; the nested ``bidreq``
input is derived deterministically from the driver's ``events`` table
(quacfka_service_spark/fixtures.py) so DuckDB can reproduce it exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quacfka_service_spark.session import load_table

from quacfka_service_spark.fixtures import (
    BIDREQ_BASE_CTE,
    BIDREQ_NORM_CTE,
    build_bidreq,
)
from quacfka_service_spark.functions.scalars import (
    coalesce_empty,
    concat_resolution,
    datepart_str,
    epoch_ms_to_ts,
    extract_hour,
    to_day_date,
)
from quacfka_service_spark.operators.aggregates import (
    hourly_agg,
    partition_enumeration,
    raw_export_filter,
)
from quacfka_service_spark.operators.normalize import normalize_bidreq
from quacfka_service_spark.operators import dedup as _dedup
from quacfka_service_spark.operators import joins as _joins
from quacfka_service_spark.operators import olap as _olap
from quacfka_service_spark.operators import sessionize as _sessionize
from quacfka_service_spark.operators import split as _split
from quacfka_service_spark.operators import similarity as _similarity
from quacfka_service_spark.operators import text as _text
from quacfka_service_spark.operators import multimodal as _multimodal


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's hourly aggregation (A2, main.go:109-125)
    over the nested bidreq fixture at sf0.001."""
    bidreq = build_bidreq(spark, "/root/testdata/sf0.001")
    return hourly_agg(normalize_bidreq(bidreq))


# --------------------------------------------------------------------------
# queries(): one entry per implemented operator from SURVEY.md §2
# --------------------------------------------------------------------------

def _q_normalize_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_bidreq(build_bidreq(spark, sf_dir))


def _q_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_agg(normalize_bidreq(build_bidreq(spark, sf_dir)))


def _q_partition_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return partition_enumeration(build_bidreq(spark, sf_dir))


def _q_raw_export_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return raw_export_filter(build_bidreq(spark, sf_dir))


def _q_coalesce_device_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    bidreq = build_bidreq(spark, sf_dir)
    return bidreq.select(
        F.col("id").alias("bidreq_id"),
        coalesce_empty(F.col("user.id"), F.col("site.id"), F.col("device.ifa")).alias("device_id"),
    )


def _q_explode_deals_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    bidreq = build_bidreq(spark, sf_dir)
    return bidreq.select(
        F.col("id").alias("bidreq_id"),
        F.explode_outer(F.get(F.col("imp"), 0)["pmp"]["deals"]["id"]).alias("deal"),
    )


def _q_banner_video_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    bidreq = build_bidreq(spark, sf_dir)
    imp0 = F.get(F.col("imp"), 0)
    return bidreq.select(
        F.col("id").alias("bidreq_id"),
        F.when(imp0["banner"].isNotNull(), imp0["banner"]["w"]).otherwise(imp0["video"]["w"]).cast("int").alias("width"),
        F.when(imp0["banner"].isNotNull(), imp0["banner"]["h"]).otherwise(imp0["video"]["h"]).cast("int").alias("height"),
    )


def _q_concat_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = normalize_bidreq(build_bidreq(spark, sf_dir))
    return norm.select(
        "bidreq_id",
        concat_resolution(F.col("width"), F.col("height")).alias("resolution"),
    ).distinct()


def _q_epoch_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    ms = F.unix_millis(F.col("ts"))
    ts_sec = epoch_ms_to_ts(sec)
    ts_ms = F.timestamp_millis(ms)
    return ev.select(
        F.col("event_id"),
        sec.alias("sec"),
        ms.alias("ms"),
        ts_sec.cast("string").alias("ts_sec_str"),
        ts_ms.cast("string").alias("ts_ms_str"),
        datepart_str("year", ts_sec).alias("y_str"),
        datepart_str("month", ts_sec).alias("m_str"),
        datepart_str("day", ts_sec).alias("d_str"),
        datepart_str("hour", ts_sec).alias("h_str"),
        to_day_date(ts_sec).cast("string").alias("day_date"),
        extract_hour(ts_sec).alias("hr"),
    )


def _q_order_by_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(to_day_date(F.col("ts")).cast("string").alias("day"), F.col("event_type"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day", "event_type")
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            to_day_date(F.col("ts")).cast("string").alias("day"),
            extract_hour(F.col("ts")).alias("hr"),
            F.col("event_type"),
            F.col("user_id"),
            F.col("value"),
        )
        .groupBy("day", "hr", "event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").cast("string").alias("total_value"),
        )
    )


def _q_join_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # customer is the small dimension: broadcast it — no shuffle of orders.
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").cast("string").alias("total_price"),
        )
    )


def _q_window_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"), F.asc("l_linenumber"))
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 2)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _q_proto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S3+S4+X1+X2: fixture -> wire-format protobuf bytes (Confluent
    prefix + LE ts suffix, main.go:228-233) -> decode -> normalize ->
    hourly agg.  Oracle = the plain hourly-agg SQL, so a hash match
    proves the codec round-trip is lossless on real data."""
    from quacfka_service_spark.proto.decode import decode_bidrequests, encode_bidrequests

    framed = encode_bidrequests(build_bidreq(spark, sf_dir))
    decoded = decode_bidrequests(framed, confluent_prefix=True, ts_suffix=True)
    return hourly_agg(normalize_bidreq(decoded))


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("decimal(38,10)").cast("string").alias("sum_qty"),
            F.sum(ext).cast("decimal(38,10)").cast("string").alias("sum_base_price"),
            F.sum(ext * (F.lit(1).cast("decimal(6,4)") - disc)).cast("decimal(38,10)").cast("string").alias("sum_disc_price"),
            F.sum(ext * (F.lit(1).cast("decimal(6,4)") - disc) * (F.lit(1).cast("decimal(6,4)") + tax)).cast("decimal(38,10)").cast("string").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k with LIMIT (generality guard:
    the reference has no joins or limits, SURVEY.md §2.3/§2.6).
    customer is filtered then broadcast; lineitem — the 100 TB fact —
    is never shuffled before the aggregate."""
    cutoff = F.lit("1996-03-15").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return (
        li.join(F.broadcast(orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)),
                li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(ext * (F.lit(1).cast("decimal(6,4)") - disc)).cast("decimal(38,10)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.col("revenue").cast("string").alias("revenue"),
        )
    )


def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join (generality guard): small dims (region, nation,
    supplier, customer) broadcast; only orders x lineitem shuffle."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier),
              (li.l_suppkey == supplier.s_suppkey)
              & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(ext * (F.lit(1).cast("decimal(6,4)") - disc)).cast("decimal(38,10)").cast("string").alias("revenue"))
    )


def _q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-revenue share (TPC-H Q14 shape): one month of the fact
    table joined to the broadcast `part` dimension.  Sums are exact
    DECIMAL; only the final ratio is a double (identical IEEE division
    on both engines)."""
    lo, hi = F.lit("1995-09-01").cast("timestamp"), F.lit("1995-10-01").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,6)"))).cast("decimal(38,10)").alias("promo"),
            F.sum(rev).cast("decimal(38,10)").alias("total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo").cast("double") / F.col("total").cast("double"), 6).alias("promo_share"),
            F.col("promo").cast("string").alias("promo_revenue"),
            F.col("total").cast("string").alias("total_revenue"),
        )
    )


def _q_set_ops_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL (generality guard: the reference
    has no set operations, SURVEY.md §2.7)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big_spenders = (
        o.where(F.col("o_totalprice") > 150_000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(big_spenders).select("c_custkey", F.lit("both").alias("tag"))
    only = building.exceptAll(building.intersect(big_spenders)).distinct().select(
        "c_custkey", F.lit("building_only").alias("tag")
    )
    return both.unionAll(only)


def _q_semi_anti_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi / left-anti joins (EXISTS / NOT EXISTS): per-segment
    counts of customers with and without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = F.col("c_custkey") == F.col("o_custkey")
    with_o = (
        c.join(o, cond, "left_semi")
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_with"))
    )
    without_o = (
        c.join(o, cond, "left_anti")
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_without"))
    )
    return (
        with_o.join(without_o, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_with", F.lit(0)).alias("n_with"),
            F.coalesce("n_without", F.lit(0)).alias("n_without"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # reference surface (SURVEY.md §2)
        "normalize_flat": _q_normalize_flat,
        "hourly_agg": _q_hourly_agg,
        "partition_enumeration": _q_partition_enumeration,
        "raw_export_filter": _q_raw_export_filter,
        "coalesce_device_id": _q_coalesce_device_id,
        "explode_deals_outer": _q_explode_deals_outer,
        "banner_video_fallback": _q_banner_video_fallback,
        "concat_resolution": _q_concat_resolution,
        "epoch_scalar_suite": _q_epoch_scalar_suite,
        "proto_roundtrip": _q_proto_roundtrip,
        "order_by_ordinal": _q_order_by_ordinal,
        "events_hourly": _q_events_hourly,
        # generality guards (additive, SURVEY.md §7.3.4)
        "join_guard": _q_join_guard,
        "window_guard": _q_window_guard,
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "tpch_q14": _q_tpch_q14,
        "set_ops_guard": _q_set_ops_guard,
        "semi_anti_guard": _q_semi_anti_guard,
    }
    q.update(_sessionize.QUERIES)
    q.update(_dedup.QUERIES)
    q.update(_similarity.QUERIES)
    q.update(_text.QUERIES)
    q.update(_multimodal.QUERIES)
    q.update(_joins.QUERIES)
    q.update(_olap.QUERIES)
    q.update(_split.QUERIES)
    return q


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB-dialect equivalents over the pre-registered views
# --------------------------------------------------------------------------

_NORM_SELECT = f"""
WITH {BIDREQ_NORM_CTE}
SELECT bidreq_id, device_id, pub_id, event_time, width, height, deal
FROM bidreq_norm
"""

_HOURLY_AGG_SQL = f"""
WITH {BIDREQ_NORM_CTE}
SELECT
  datetrunc('day', epoch_ms(event_time * 1000))::DATE::VARCHAR AS date,
  extract('hour' FROM epoch_ms(event_time * 1000))    AS hour,
  pub_id,
  device_id,
  CONCAT(width::VARCHAR, 'x', height::VARCHAR)        AS resolution,
  deal,
  count(DISTINCT bidreq_id)                           AS requests
FROM bidreq_norm
GROUP BY ALL
"""

_PARTITION_ENUM_SQL = f"""
WITH {BIDREQ_BASE_CTE}
SELECT DISTINCT
  datepart('year',  epoch_ms(seconds * 1000 + nanos // 1000000))::VARCHAR AS year,
  datepart('month', epoch_ms(seconds * 1000 + nanos // 1000000))::VARCHAR AS month,
  datepart('day',   epoch_ms(seconds * 1000 + nanos // 1000000))::VARCHAR AS day,
  datepart('hour',  epoch_ms(seconds * 1000 + nanos // 1000000))::VARCHAR AS hour
FROM bidreq_base
ORDER BY 1, 2, 3, 4
"""

_RAW_EXPORT_SQL = f"""
WITH {BIDREQ_BASE_CTE},
sel AS (
  SELECT *, epoch_ms(seconds * 1000 + nanos // 1000000) AS pts FROM bidreq_base
),
mn AS (SELECT min(datetrunc('hour', pts)) AS mh FROM sel)
SELECT
  s.bidreq_id, s.pub_id,
  s.site_id_s AS site_id, s.user_id_s AS user_id, s.ifa_s AS ifa,
  s.seconds, s.nanos, s.event_tm
FROM sel s, mn
WHERE datepart('year', s.pts)  = datepart('year', mn.mh)
  AND datepart('month', s.pts) = datepart('month', mn.mh)
  AND datepart('day', s.pts)   = datepart('day', mn.mh)
  AND datepart('hour', s.pts)  = datepart('hour', mn.mh)
"""


def oracle_sql() -> dict[str, str]:
    o = {
        "normalize_flat": _NORM_SELECT,
        "hourly_agg": _HOURLY_AGG_SQL,
        "partition_enumeration": _PARTITION_ENUM_SQL,
        "raw_export_filter": _RAW_EXPORT_SQL,
        "coalesce_device_id": f"""
WITH {BIDREQ_BASE_CTE}
SELECT bidreq_id,
       coalesce(nullif(user_id_s, ''), nullif(site_id_s, ''), nullif(ifa_s, '')) AS device_id
FROM bidreq_base
""",
        "explode_deals_outer": f"""
WITH {BIDREQ_NORM_CTE}
SELECT bidreq_id, deal FROM bidreq_norm
""",
        "proto_roundtrip": _HOURLY_AGG_SQL,
        "banner_video_fallback": f"""
WITH {BIDREQ_BASE_CTE}
SELECT bidreq_id, width, height FROM bidreq_base
""",
        "concat_resolution": f"""
WITH {BIDREQ_BASE_CTE}
SELECT DISTINCT bidreq_id, CONCAT(width::VARCHAR, 'x', height::VARCHAR) AS resolution
FROM bidreq_base
""",
        "epoch_scalar_suite": """
SELECT
  event_id,
  epoch_ms(ts) // 1000                                           AS sec,
  epoch_ms(ts)                                                   AS ms,
  CAST(epoch_ms((epoch_ms(ts) // 1000) * 1000) AS VARCHAR)       AS ts_sec_str,
  CAST(epoch_ms(epoch_ms(ts)) AS VARCHAR)                        AS ts_ms_str,
  datepart('year',  epoch_ms((epoch_ms(ts) // 1000) * 1000))::VARCHAR AS y_str,
  datepart('month', epoch_ms((epoch_ms(ts) // 1000) * 1000))::VARCHAR AS m_str,
  datepart('day',   epoch_ms((epoch_ms(ts) // 1000) * 1000))::VARCHAR AS d_str,
  datepart('hour',  epoch_ms((epoch_ms(ts) // 1000) * 1000))::VARCHAR AS h_str,
  datetrunc('day',  epoch_ms((epoch_ms(ts) // 1000) * 1000))::DATE::VARCHAR AS day_date,
  extract('hour' FROM epoch_ms((epoch_ms(ts) // 1000) * 1000))        AS hr
FROM events
""",
        "order_by_ordinal": """
SELECT datetrunc('day', ts)::DATE::VARCHAR AS day, event_type, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "events_hourly": """
SELECT
  datetrunc('day', ts)::DATE::VARCHAR AS day,
  extract('hour' FROM ts)          AS hr,
  event_type,
  count(DISTINCT user_id)          AS users,
  count(*)                         AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6))::VARCHAR AS total_value
FROM events GROUP BY ALL
""",
        "join_guard": """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
        "window_guard": """
SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice, rn
FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
  FROM lineitem
) WHERE rn <= 2
""",
        "tpch_q1": """
SELECT
  l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,10))::VARCHAR AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,10))::VARCHAR AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,10))::VARCHAR AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(38,10))::VARCHAR AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "tpch_q3": """
SELECT l_orderkey, o_orderdate::VARCHAR AS o_orderdate, revenue::VARCHAR AS revenue FROM (
  SELECT l_orderkey, o_orderdate,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,10)) AS revenue
  FROM customer JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1996-03-15'
    AND l_shipdate  > TIMESTAMP '1996-03-15'
  GROUP BY l_orderkey, o_orderdate
  ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
  LIMIT 10
)
""",
        "tpch_q5": """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,10))::VARCHAR AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
        "tpch_q14": """
WITH agg AS (
  SELECT
    CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,10)) AS promo,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(38,10)) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'
)
SELECT round(100.0 * promo::DOUBLE / total::DOUBLE, 6) AS promo_share,
       promo::VARCHAR AS promo_revenue,
       total::VARCHAR AS total_revenue
FROM agg
""",
        "set_ops_guard": """
WITH building AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
big AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
)
SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM building INTERSECT SELECT * FROM big)
UNION ALL
SELECT c_custkey, 'building_only' AS tag FROM (SELECT * FROM building EXCEPT SELECT * FROM big)
""",
        "semi_anti_guard": """
SELECT c_mktsegment,
       count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))     AS n_with,
       count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without
FROM customer
GROUP BY c_mktsegment
""",
    }
    o.update(_sessionize.ORACLES)
    o.update(_dedup.ORACLES)
    o.update(_similarity.ORACLES)
    o.update(_text.ORACLES)
    o.update(_multimodal.ORACLES)
    o.update(_joins.ORACLES)
    o.update(_olap.ORACLES)
    o.update(_split.ORACLES)
    return o
