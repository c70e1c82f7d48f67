"""Warehouse-pattern operators: SCD Type-2 history build and a
Bloom-prefiltered semi-join.

Reference parity note: the reference service (main.go:385 normalize +
its DuckDB store) exposes point-in-time state only implicitly (latest
row wins); rebuilding attribute HISTORY from an append-only event log
is the canonical warehouse companion query, and the Bloom-prefilter
is the standard scale technique for the reference's "export rows whose
key is in this set" filters (main.go:204 rotation + custom-field
filters).  Both are re-derived from public warehouse literature
(Kimball SCD2; Bloom 1970 / the runtime-filter design in the Spark
AQE docs), not from any reference code.

scd2_user_attr
--------------
Gaps-and-islands SCD2 build: per user, the tracked attribute is the
``props->>'k'`` payload field; consecutive equal values collapse into
one validity interval with ``valid_from``/``valid_to``/``is_current``.

Determinism: events order by (ts, event_id) — a total order, so the
change flags, island ids, interval bounds and row counts are all
engine-exact (timestamps and BIGINTs only; no floats anywhere).

100 TB shape: everything partitions by user_id — the lag window, the
island cumulative sum, the island groupBy and the lead window all ride
ONE hash exchange on user_id (Catalyst reuses the child distribution;
the plan pin asserts a single Exchange).  No driver state, no
collect; a 10^9-user log is just more partitions.

bloom_semi_join
---------------
``orders ⋉ segment-customers`` computed as: build a 2^16-bit Bloom
filter (k=3) over the dim keys entirely executor-side (explode 3 hash
positions → bit_or per 64-bit word → one dense array<long> row),
broadcast the ~8 KB bitmap via a 1-row join, prefilter orders map-only
(3 element_at probes, no shuffle, no explode on the fact side), then
verify candidates with an exact broadcast semi-join so false positives
drop out.  Result is provably IDENTICAL to the plain semi-join (Bloom
filters have no false negatives), which is exactly what the oracle
checks.

Why carry both steps at 100 TB: when the dim side is broadcast-able
the verify join alone suffices — but when it is NOT (a 10^9-key dim),
the exact join becomes a shuffle join over the FULL fact table, and
the 8 KB-per-2^16-keys bitmap (scaled up: ~2 GB per 10^9 keys at the
same 10 bits/key, still executor-memory-sized) prefilters the fact
rows BEFORE the shuffle — the classic runtime row-level filter that
Spark's own bloom-filter-join rewrite applies when statistics allow.
Here it is explicit, so the cut is guaranteed rather than
optimizer-dependent.  The m/k choice (65536 bits, 3 hashes) gives
~1.7% false-positive rate at the sf0.01 dim size (~300 keys is far
under capacity; FPR ~0 in practice) — candidates ~= matches, so the
verify join's shuffle input is already reduced to essentially the
true result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table

BLOOM_BITS = 1 << 16  # 1024 longs = 8 KB bitmap
BLOOM_HASHES = 3
BLOOM_SEGMENT = "BUILDING"


def scd2_user_attr(ev: DataFrame) -> DataFrame:
    """(user_id, attr, valid_from, valid_to, is_current, n_events):
    SCD Type-2 validity intervals of the per-user ``props.k``
    attribute (module docstring)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    attr = F.get_json_object("props", "$.k").cast("long")
    e = ev.select("user_id", "ts", "event_id", attr.alias("attr"))
    # IS DISTINCT FROM via eqNullSafe: first row (lag NULL) opens
    # island 1; equal consecutive attrs keep the island id.
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "attr",
        F.when(F.lag("attr").over(w).eqNullSafe(F.col("attr")), F.lit(0))
        .otherwise(F.lit(1))
        .alias("chg"),
    )
    islands = flagged.select(
        "user_id",
        "ts",
        "attr",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("isl"),
    )
    grp = islands.groupBy("user_id", "isl").agg(
        F.first("attr").alias("attr"),  # constant within an island
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("valid_from")
    return grp.select(
        "user_id",
        "attr",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        F.lead("valid_from").over(wl).isNull().alias("is_current"),
        "n_events",
    )


def _bloom_positions(key, n_hashes: int, n_bits: int):
    """k hash positions for a key: xxhash64 with distinct salt
    columns (seeded re-hash), pmod into the bit space."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def bloom_bitmap(keys: DataFrame, key_col: str, n_bits: int = BLOOM_BITS,
                 n_hashes: int = BLOOM_HASHES) -> DataFrame:
    """One-row DataFrame ``(bitmap array<long>)``: dense Bloom bitmap
    over ``keys[key_col]``, built fully executor-side (explode k
    positions -> bit_or per word -> dense array via a range join on
    the word index)."""
    spark = keys.sparkSession
    n_words = n_bits // 64
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), n_hashes, n_bits))).alias(
            "pos"
        )
    )
    # shiftleft's shift amount must be a literal in the Python API, so
    # the variable-shift mask goes through a SQL expr.
    words = pos.select(
        F.expr("pos DIV 64").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    ).groupBy("word").agg(F.bit_or("mask").alias("bits"))
    dense = (
        spark.range(n_words)
        .withColumnRenamed("id", "word")
        .join(words, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    return dense.groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("word", "bits"))), lambda s: s["bits"]
        ).alias("bitmap")
    )


def bloom_semi_join(
    orders: DataFrame,
    customer: DataFrame,
    segment: str = BLOOM_SEGMENT,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(o_orderkey, o_custkey, o_totalprice): orders of positive-
    balance customers in ``segment`` — Bloom prefilter + exact verify
    (module docstring).  Result identical to a plain semi-join."""
    dim = customer.where(
        (F.col("c_mktsegment") == segment) & (F.col("c_acctbal") > 0)
    ).select("c_custkey")
    bitmap = bloom_bitmap(dim, "c_custkey", n_bits, n_hashes)
    probes = _bloom_positions(F.col("o_custkey"), n_hashes, n_bits)
    probed = (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(F.broadcast(bitmap))  # 1-row 8 KB bitmap: map-only prefilter
        .select(
            "*", *[p.alias(f"p{i}") for i, p in enumerate(probes)]
        )
    )
    hit = None
    for i in range(n_hashes):
        test = F.expr(
            f"(element_at(bitmap, CAST(p{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(p{i} % 64 AS INT))) != 0"
        )
        hit = test if hit is None else (hit & test)
    candidates = probed.where(hit).select("o_orderkey", "o_custkey", "o_totalprice")
    return candidates.join(
        F.broadcast(dim), candidates.o_custkey == dim.c_custkey, "left_semi"
    )


# --- queries()/oracle_sql() registrations ---------------------------------


def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_user_attr(load_table(spark, sf_dir, "events"))


def _q_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_semi_join(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


QUERIES = {
    "scd2_user_attr": _q_scd2,
    "bloom_semi_join": _q_bloom_semi,
}

ORACLES = {
    "scd2_user_attr": """
WITH e AS (
  SELECT user_id, ts, event_id, (props->>'k')::BIGINT AS attr
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, attr,
         CASE WHEN lag(attr) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NOT DISTINCT FROM attr
              THEN 0 ELSE 1 END AS chg
  FROM e
),
islands AS (
  SELECT user_id, ts, attr,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM flagged
),
grp AS (
  SELECT user_id, isl, min(attr) AS attr, min(ts) AS valid_from,
         count(*)::BIGINT AS n_events
  FROM islands GROUP BY user_id, isl
)
SELECT user_id, attr, valid_from,
       lead(valid_from) OVER w AS valid_to,
       lead(valid_from) OVER w IS NULL AS is_current,
       n_events
FROM grp
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)
""",
    # The oracle is the PLAIN semi-join: the Bloom stage must be
    # invisible in the result (no false negatives; verify join kills
    # false positives).
    "bloom_semi_join": f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = '{BLOOM_SEGMENT}' AND c_acctbal > 0
)
""",
}
