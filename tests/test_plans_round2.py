"""Plan pins for round-2 operators: decontamination, OOV scoring, and
the new TPC-H guards.  Same contract as test_plans.py — assert the
load-bearing plan property, not timings."""

from __future__ import annotations

import __spark_entry__ as entry
from quacfka_service_spark.plans.inspect import (
    count_exchanges,
    count_generates,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
    read_schema,
)

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, key):
    return entry.queries()[key](spark, SF_DIR)


def test_decontaminate_broadcasts_bench_grams(spark):
    df = _q(spark, "corpus_decontaminate")
    plan = formatted_plan(df)
    assert has_broadcast_join(df)  # bench gram set must broadcast
    # only 3 exchanges: bench distinct + two-phase per-doc countDistinct
    assert count_exchanges(df) == 3
    # the n-gram Generate must not be duplicated into a pushed filter
    # (the plain-explode InferFiltersFromGenerate trap): two Generates
    # total — one per corpus side.  (ADVICE r2: the old string-count
    # guard matched nothing in formatted output and was vacuous.)
    assert count_generates(df) == 2, plan


def test_oov_score_never_shuffles_on_token(spark):
    df = _q(spark, "text_oov_score")
    plan = formatted_plan(df)
    # r11 single-pass shape: the vocab (distinct tokens) broadcast
    # LEFT-joins onto the occurrence stream (cannot multiply rows) and
    # ONE per-doc aggregate carries both n_tokens and n_oov — the old
    # LeftAnti + separate totals subtree is gone (OPTIMIZATION_r11 §12).
    assert "LeftOuter" in plan and has_broadcast_join(df)
    # exchanges: vocab wordcount + the one per-doc agg = 2; nothing
    # keyed on tok for a row join (the vocab join is broadcast).
    assert count_exchanges(df) == 2
    assert "SortMergeJoin" not in plan


def test_tpch_q6_is_pure_pushdown_scan(spark):
    df = _q(spark, "tpch_q6")
    pf = pushed_filters(df)
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf
    rs = read_schema(df)
    assert "l_orderkey" not in rs  # only the 4 referenced columns read
    assert count_exchanges(df) == 1
    assert has_partial_aggregation(df)


def test_tpch_q4_semi_join_with_residual(spark):
    df = _q(spark, "tpch_q4")
    plan = formatted_plan(df)
    assert "LeftSemi" in plan
    assert "o_orderdate" in pushed_filters(df)  # quarter filter pushed


def test_tpch_q18_aggregates_before_joining(spark):
    df = _q(spark, "tpch_q18")
    plan = formatted_plan(df)
    # the per-orderkey quantity agg must sit BELOW the first join —
    # i.e. partial aggregation exists and only one (agg) exchange.
    assert has_partial_aggregation(df)
    assert count_exchanges(df) == 1
    assert has_broadcast_join(df)


def test_dynamic_partition_pruning_on_hive_lake(spark, tmp_path):
    """Dynamic partition pruning: joining the hive-partitioned lake
    against a FILTERED dim must inject a runtime subquery filter on the
    partition column (the fact scan's files are chosen at execution
    time from the dim's surviving keys — at 100 TB this is the
    difference between scanning one hour-partition and all 8,760).
    Static pruning is already pinned elsewhere; this pins the dynamic
    path Catalyst uses when the partition keys are only known at run
    time."""
    from pyspark.sql import functions as F

    from quacfka_service_spark.plans.inspect import formatted_plan

    lake = str(tmp_path / "lake")
    (
        spark.range(0, 10_000)
        .select(
            F.col("id"),
            (F.col("id") % 24).cast("string").alias("hour"),
            (F.col("id") * 3).alias("v"),
        )
        .write.mode("overwrite")
        .partitionBy("hour")
        .parquet(lake)
    )
    fact = spark.read.parquet(lake)
    dim = (
        spark.range(0, 24)
        .select(F.col("id").cast("string").alias("hour"), F.lit("x").alias("attr"))
        .where(F.col("hour") == "7")
    )
    joined = fact.join(dim, "hour").agg(F.sum("v").alias("s"))
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning reaches the fact scan's partition filters
    assert "PartitionFilters" in plan


def test_contamination_score_single_train_pass(spark):
    """r11: the train side is tokenized/exploded exactly ONCE — both
    distinct counts (n_grams, bench-matched n_hit) ride one per-doc
    aggregate over one broadcast left join, with no doc_id re-join of
    two aggregation subtrees (the r10 shape paid the tokenize twice).
    Two Generate nodes total: one train explode + one bench explode."""
    df = _q(spark, "corpus_contamination_score")
    plan = formatted_plan(df)
    assert count_generates(df) == 2, plan
    assert has_broadcast_join(df)
    assert has_partial_aggregation(df)
    # exactly one join in the whole plan (the gram-keyed broadcast)
    import re

    assert len(re.findall(r"^\(\d+\) \w*Join", plan, re.MULTILINE)) == 1, plan
