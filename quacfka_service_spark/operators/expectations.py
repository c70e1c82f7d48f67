"""Declarative data-quality expectations — the release-gate operator
family's third member (k-anonymity gates privacy, drift gates
distribution shift, expectations gate STRUCTURE).

Public pattern: assertion suites over tables (the design popularized
by open-source data-quality frameworks and by the constraint clauses
of ANSI SQL — NOT NULL, UNIQUE, FOREIGN KEY, CHECK), evaluated in
bulk as aggregates rather than row-by-row so a 100 TB table costs one
scan per table, not one job per constraint.

``expectations_report`` runs a fixed suite over the warehouse tables
and emits one row per constraint:

    (table_name, check_name, n_rows, n_violations, passed)

Suite (each an exact integer count, SQL-oracle-able):

- events.event_id unique         (count - count(distinct))
- events.ts not null / user_id not null / value in [-1e9, 1e9]
- orders.o_orderkey unique, o_totalprice >= 0
- orders.o_custkey FK -> customer.c_custkey   (anti-join count)
- lineitem.(l_orderkey) FK -> orders.o_orderkey
- documents.doc_id unique, n_chars = length(text) consistency

Scale shape: EVERY constraint on a table — conditional sums,
uniqueness count-distincts, and FK orphan counts — shares ONE
map-side-combined aggregate pass over that table.  The FK checks ride
the same pass as a left join on the DISTINCT parent key set (cannot
multiply child rows, so sum(key-missed) == the anti-join orphan
count); the optimizer broadcasts the key set while it fits and
degrades to a co-partitioned shuffle past that.  Everything after is
unioning 1-row frames: four table scans total, no re-scan per check,
no driver-side looping over constraints with separate jobs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table


def _row(table: str, name: str, n_rows, n_viol):
    return F.struct(
        F.lit(table).alias("table_name"),
        F.lit(name).alias("check_name"),
        n_rows.cast("long").alias("n_rows"),
        n_viol.cast("long").alias("n_violations"),
        (n_viol.cast("long") == 0).alias("passed"),
    )


def _scalar_suite(df: DataFrame, table: str, checks: list) -> DataFrame:
    """One aggregate pass -> one row per check.  ``checks`` is a list
    of (name, violation_condition_or_None, unique_key_or_None)."""
    n = F.count(F.lit(1))
    aggs, names = [], []
    for name, viol, key in checks:
        if key is not None:
            aggs.append((n - F.countDistinct(F.col(key))).alias(f"v_{len(names)}"))
        else:
            aggs.append(
                F.sum(F.when(viol, F.lit(1)).otherwise(F.lit(0))).alias(
                    f"v_{len(names)}"
                )
            )
        names.append(name)
    agged = df.agg(n.alias("n_rows"), *aggs)
    rows = F.array(
        *[
            _row(table, name, F.col("n_rows"), F.coalesce(F.col(f"v_{i}"), F.lit(0)))
            for i, name in enumerate(names)
        ]
    )
    return agged.select(F.explode(rows).alias("r")).select("r.*")


def _with_fk_flag(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """child + ``_fk_miss`` boolean — TRUE where the key has no parent.
    A left join on DISTINCT parent keys cannot multiply child rows, so
    sum(_fk_miss) equals the anti-join orphan count (a NULL child key
    never matches in either formulation) and the FK check shares the
    child table's single aggregate pass instead of re-scanning it.
    No broadcast hint: the optimizer broadcasts the key set while it
    fits and falls back to a co-partitioned shuffle past that."""
    pk = parent.select(F.col(parent_key).alias("_pk")).distinct()
    return child.join(pk, F.col(child_key) == F.col("_pk"), "left").withColumn(
        "_fk_miss", F.col("_pk").isNull()
    )


def expectations_report(
    events: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    ev = _scalar_suite(
        events,
        "events",
        [
            ("event_id_unique", None, "event_id"),
            ("ts_not_null", F.col("ts").isNull(), None),
            ("user_id_not_null", F.col("user_id").isNull(), None),
            (
                "value_in_range",
                F.col("value").isNull()
                | (F.col("value") < -1e9)
                | (F.col("value") > 1e9),
                None,
            ),
        ],
    )
    od = _scalar_suite(
        _with_fk_flag(orders, "o_custkey", customer, "c_custkey"),
        "orders",
        [
            ("o_orderkey_unique", None, "o_orderkey"),
            ("o_totalprice_nonneg", F.col("o_totalprice") < 0, None),
            ("o_custkey_fk_customer", F.col("_fk_miss"), None),
        ],
    )
    dc = _scalar_suite(
        documents,
        "documents",
        [
            ("doc_id_unique", None, "doc_id"),
            ("n_chars_consistent", F.col("n_chars") != F.length("text"), None),
        ],
    )
    li = _scalar_suite(
        _with_fk_flag(lineitem, "l_orderkey", orders, "o_orderkey"),
        "lineitem",
        [("l_orderkey_fk_orders", F.col("_fk_miss"), None)],
    )
    return reduce(DataFrame.unionByName, [ev, od, dc, li])


def _q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plain lazy plan (r11, VERDICT r10 #3): the r10 run_static wrapper
    # DID cut the AQE job split (17 -> 9 jobs) but its eager
    # localCheckpoint pays a materialize+re-read that the driver's
    # fresh-session min-of-3 protocol never amortizes — BENCH_r10
    # regressed 0.94 -> 1.39 s, and the r11 subset A/B reproduced it
    # (run_static 1.53-2.89 s vs plain 1.25-1.57 s).  The job-count win
    # was warm-session-only evidence; the driver's number is the
    # record, so the report plan stays lazy under AQE.
    return expectations_report(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "documents"),
    )


QUERIES = {"quality_expectations": _q_expectations}

ORACLES = {
    "quality_expectations": """
SELECT 'events' AS table_name, 'event_id_unique' AS check_name,
       count(*)::BIGINT AS n_rows,
       (count(*) - count(DISTINCT event_id))::BIGINT AS n_violations,
       count(*) = count(DISTINCT event_id) AS passed
FROM events
UNION ALL
SELECT 'events', 'ts_not_null', count(*)::BIGINT,
       sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'events', 'user_id_not_null', count(*)::BIGINT,
       sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'events', 'value_in_range', count(*)::BIGINT,
       sum(CASE WHEN value IS NULL OR value < -1e9 OR value > 1e9
                THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN value IS NULL OR value < -1e9 OR value > 1e9
                THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'orders', 'o_orderkey_unique', count(*)::BIGINT,
       (count(*) - count(DISTINCT o_orderkey))::BIGINT,
       count(*) = count(DISTINCT o_orderkey)
FROM orders
UNION ALL
SELECT 'orders', 'o_totalprice_nonneg', count(*)::BIGINT,
       sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'documents', 'doc_id_unique', count(*)::BIGINT,
       (count(*) - count(DISTINCT doc_id))::BIGINT,
       count(*) = count(DISTINCT doc_id)
FROM documents
UNION ALL
SELECT 'documents', 'n_chars_consistent', count(*)::BIGINT,
       sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)::BIGINT,
       sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) = 0
FROM documents
UNION ALL
SELECT 'orders', 'o_custkey_fk_customer', count(*)::BIGINT,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))::BIGINT,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) = 0
FROM orders
UNION ALL
SELECT 'lineitem', 'l_orderkey_fk_orders', count(*)::BIGINT,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) = 0
FROM lineitem
""",
}
