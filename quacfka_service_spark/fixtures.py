"""Deterministic nested ``bidreq`` fixture derived from the driver's
``events`` table.

The reference's only input is a stream of protobuf ``Bidrequest``
messages (/root/reference/proto/bidrequest.proto).  The driver's
correctness harness can only oracle-check queries whose inputs DuckDB
can also see, so the nested fixture is defined as a *pure arithmetic*
function of ``events`` columns (event_id, user_id, ts) — no RNG, no
wall clock (FIXTURES.md §5).  Spark builds the nested structs with
DataFrame expressions; the DuckDB oracle reproduces the *flattened*
consequences of the same arithmetic directly, so both engines agree
bit-for-bit.

Derivation spec (e = event_id, u = user_id):
  seconds     = floor epoch seconds of ts
  nanos       = (e * 1000003) % 1_000_000_000
  event_tm    = epoch millis of ts
  user.id     = ''                 if e % 2 = 0  else 'u' || u          (~50% empty)
  site.id     = ''                 if e % 5 = 0  else 's' || (e % 100)  (~20% empty)
  device.ifa  = ''                 if e % 10 < 3 else 'd' || (e % 1000) (~30% empty)
  pub.id      = 'pub' || (u % 20)
  banner      present iff e % 10 < 7:  w = 300 + (e%5)*10, h = 250 + (e%3)*50
  video       present iff banner absent: w = 640 + (e%5)*16, h = 480 + (e%3)*60
  n_deals     = 0 if e % 5 < 3 else 1 + (e % 4)                         (~60% zero)
  deal[i].id  = 'deal-' || e || '-' || i     (i = 1..n_deals)
  imp has a 2nd bystander element when e % 3 = 0 (exercises pruning;
  the reference only ever touches imp[0], main.go:352-380).

Rows with e % 10 == 0 have user.id = site.id = ifa = '' (>=1% all-empty
per FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import load_table

from .schema import BANNER, DEAL, PMP, VIDEO


def build_bidreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested bidreq DataFrame from ``{sf_dir}/events.parquet``."""
    ev = load_table(spark, sf_dir, "events")
    # The dev fixture is one parquet row-group -> one input split; the
    # struct build + explode downstream would run single-threaded.
    # Rebalance only when the scan under-splits (at real scale the scan
    # has >> defaultParallelism splits and this is a no-op).
    target = spark.sparkContext.defaultParallelism
    if ev.rdd.getNumPartitions() < target:
        ev = ev.repartition(target)
    e = F.col("event_id")
    u = F.col("user_id")

    seconds = F.unix_timestamp("ts").cast("long")
    nanos = ((e * F.lit(1000003)) % F.lit(1_000_000_000)).cast("int")

    has_banner = (e % 10) < 7
    banner = F.when(
        has_banner,
        F.struct(
            (F.lit(300) + (e % 5) * 10).cast("int").alias("w"),
            (F.lit(250) + (e % 3) * 50).cast("int").alias("h"),
        ),
    ).otherwise(F.lit(None).cast(BANNER))
    video = F.when(
        ~has_banner,
        F.struct(
            (F.lit(640) + (e % 5) * 16).cast("int").alias("w"),
            (F.lit(480) + (e % 3) * 60).cast("int").alias("h"),
        ),
    ).otherwise(F.lit(None).cast(VIDEO))

    n_deals = F.when((e % 5) < 3, F.lit(0)).otherwise((e % 4) + 1).cast("int")
    # slice(1..4, 1, n) instead of sequence(1, n): Spark's sequence()
    # rejects an empty 1..0 range, slice handles n = 0.
    deal_idx = F.slice(F.sequence(F.lit(1), F.lit(4)), F.lit(1), n_deals)
    deals = F.transform(
        deal_idx,
        lambda i: F.struct(
            F.concat(F.lit("deal-"), e.cast("string"), F.lit("-"), i.cast("string")).alias("id"),
            (((e % 100) + i) / F.lit(10.0)).cast("float").alias("bidfloor"),
        ),
    )

    imp0 = F.struct(
        F.concat(F.lit("imp-"), e.cast("string")).alias("id"),
        banner.alias("banner"),
        video.alias("video"),
        F.struct(
            (e % 2).cast("int").alias("private_auction"),
            deals.alias("deals"),
        ).alias("pmp"),
        ((e % 50) / F.lit(4.0)).cast("float").alias("bidfloor"),
    )
    imp_extra = F.struct(
        F.concat(F.lit("imp-"), e.cast("string"), F.lit("-x")).alias("id"),
        F.struct(F.lit(120).alias("w"), F.lit(600).alias("h")).cast(BANNER).alias("banner"),
        F.lit(None).cast(VIDEO).alias("video"),
        F.struct(
            F.lit(0).alias("private_auction"),
            F.array().cast("array<struct<id:string,bidfloor:float>>").alias("deals"),
        ).cast(PMP).alias("pmp"),
        F.lit(1.0).cast("float").alias("bidfloor"),
    )
    imp = F.when((e % 3) == 0, F.array(imp0, imp_extra)).otherwise(F.array(imp0))

    return ev.select(
        F.concat(F.lit("req-"), e.cast("string")).alias("id"),
        imp.alias("imp"),
        F.struct(
            F.when((e % 5) == 0, F.lit("")).otherwise(F.concat(F.lit("s"), (e % 100).cast("string"))).alias("id"),
            F.concat(F.lit("site"), (e % 50).cast("string"), F.lit(".example.com")).alias("domain"),
            F.struct(
                F.concat(F.lit("pub"), (u % 20).cast("string")).alias("id"),
                F.concat(F.lit("publisher-"), (u % 20).cast("string")).alias("name"),
            ).alias("publisher"),
        ).alias("site"),
        F.struct(
            F.when((e % 10) < 3, F.lit("")).otherwise(F.concat(F.lit("d"), (e % 1000).cast("string"))).alias("ifa"),
            F.concat(F.lit("ua/"), (e % 7).cast("string")).alias("ua"),
            F.element_at(F.array(F.lit("android"), F.lit("ios"), F.lit("web")), (e % 3).cast("int") + 1).alias("os"),
            F.struct(
                F.concat(F.lit("C"), (e % 10).cast("string")).alias("country"),
                F.concat(F.lit("city"), (e % 40).cast("string")).alias("city"),
            ).alias("geo"),
        ).alias("device"),
        F.struct(
            F.when((e % 2) == 0, F.lit("")).otherwise(F.concat(F.lit("u"), u.cast("string"))).alias("id"),
        ).alias("user"),
        F.struct(seconds.alias("seconds"), nanos.alias("nanos")).alias("timestamp"),
        F.unix_millis(F.col("ts")).alias("event_tm"),
    )


# --- DuckDB oracle counterpart -------------------------------------------
#
# ``BIDREQ_BASE_CTE`` reproduces the *scalar* consequences of the same
# arithmetic (per-bidrequest grain); ``BIDREQ_NORM_CTE`` additionally
# outer-explodes the deals (per-deal grain, NULL row when no deals —
# exactly U1's semantics, main.go:362-380).  Oracle SQL strings for
# individual operators are composed from these in __spark_entry__.py.

BIDREQ_BASE_CTE = """
bidreq_base AS (
  SELECT
    'req-' || event_id                            AS bidreq_id,
    epoch_ms(ts) // 1000                          AS seconds,
    (event_id * 1000003) % 1000000000             AS nanos,
    epoch_ms(ts)                                  AS event_tm,
    CASE WHEN event_id % 2 = 0 THEN '' ELSE 'u' || user_id END            AS user_id_s,
    CASE WHEN event_id % 5 = 0 THEN '' ELSE 's' || (event_id % 100) END   AS site_id_s,
    CASE WHEN event_id % 10 < 3 THEN '' ELSE 'd' || (event_id % 1000) END AS ifa_s,
    'pub' || (user_id % 20)                       AS pub_id,
    CASE WHEN event_id % 10 < 7
         THEN CAST(300 + (event_id % 5) * 10 AS INTEGER)
         ELSE CAST(640 + (event_id % 5) * 16 AS INTEGER) END AS width,
    CASE WHEN event_id % 10 < 7
         THEN CAST(250 + (event_id % 3) * 50 AS INTEGER)
         ELSE CAST(480 + (event_id % 3) * 60 AS INTEGER) END AS height,
    CASE WHEN event_id % 5 < 3 THEN 0 ELSE 1 + (event_id % 4) END AS n_deals,
    event_id                                      AS e
  FROM events
)
"""

BIDREQ_NORM_CTE = BIDREQ_BASE_CTE + """,
bidreq_norm AS (
  SELECT
    b.bidreq_id,
    coalesce(nullif(b.user_id_s, ''), nullif(b.site_id_s, ''), nullif(b.ifa_s, '')) AS device_id,
    b.pub_id,
    b.seconds + (b.nanos // 1000000000)           AS event_time,
    b.width,
    b.height,
    CASE WHEN d.i IS NULL THEN NULL
         ELSE 'deal-' || b.e || '-' || d.i END    AS deal
  FROM bidreq_base b
  LEFT JOIN LATERAL (SELECT unnest(generate_series(1, b.n_deals)) AS i) d ON true
)
"""
