"""Skew-resilient join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime, but it only splits *sort-merge* join partitions; when a hot
key must go through a shuffled join and the small side is too big to
broadcast, explicit salting is the standard fix: spread the hot key's
rows across S sub-keys on the big side, replicate the small side S
ways, join on (key, salt).  Shuffle size grows by |small| x (S-1),
but the hottest partition shrinks by ~S — the right trade when one key
holds e.g. 10% of 100 TB.

The salt must vary per *row* of the big side (not per key) and need
not be stable across task retries: every salt value joins against a
full copy of the small side, so correctness is salt-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on shared column names, salted.

    Output columns = join keys + non-key columns of both sides (same
    shape as ``big.join(small, on, how)``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_s.join(small_s, keys + ["__salt"], how)
    return joined.drop("__salt")


def salted_agg_count(
    df: DataFrame, keys: list[str], *, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Two-stage count for pathologically hot group keys: partial count
    per (key, salt), then merge.  Spark's partial aggregation already
    gives this for algebraic aggs; the explicit form documents the
    pattern and serves non-algebraic pipelines (e.g. collect-heavy
    stages) where partials don't apply."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    stage1 = (
        df.withColumn("__salt", salt.cast("int"))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return stage1.groupBy(*keys).agg(F.sum("__partial").alias("n"))


# --- queries()/oracle_sql() registrations ---------------------------------
#
# The salting operators are registered against PLAIN-join / plain-agg
# oracles: salting must be result-invisible (every salt value carries a
# full small-side copy; partial counts merge exactly), so the driver's
# value-hash against the unsalted SQL IS the salt-independence proof —
# run to run, the nondeterministic per-row salt may differ while the
# result multiset may not.

def _q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    return salted_join(li, supp, "l_suppkey")


def _q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_agg_count(load_table(spark, sf_dir, "events"), ["event_type"])


QUERIES = {
    "skew_salted_join": _q_salted_join,
    "skew_salted_agg": _q_salted_agg,
}

ORACLES = {
    "skew_salted_join": """
SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, s_name, s_nationkey
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
""",
    "skew_salted_agg": """
SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY event_type
""",
}
