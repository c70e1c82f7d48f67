"""Plan pins for round-3 additions: the completed TPC-H guard set and
the new dedup/similarity/corpus operators.  Same contract as
test_plans.py — assert the load-bearing physical property (the thing
that must survive a 100x scale-up), not timings."""

from __future__ import annotations

import __spark_entry__ as entry
from quacfka_service_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    pushed_filters,
)

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, key):
    return entry.queries()[key](spark, SF_DIR)


def test_q9_broadcasts_every_dim(spark):
    """The 5-table join tree must broadcast part/supplier/nation; the
    only shuffle join is the lineitem-orders fact join."""
    df = _q(spark, "tpch_q9")
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    # the part LIKE filter reaches the part scan
    assert "Contains(p_name,widget)" in plan.replace(" ", "") or "widget" in plan


def test_q2_argmin_has_no_fact_shuffle_join(spark):
    """After the catalog agg, every join (argmin join-back, part,
    supplier chain) is a broadcast — no sort-merge join anywhere."""
    df = _q(spark, "tpch_q2")
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_q21_decorrelates_to_two_fact_shuffles(spark):
    """EXISTS/NOT-EXISTS pair must become per-order aggregates, not
    correlated re-scans: the orderkey fact join + per-order agg +
    blame-side dedup, all on the same orderkey hash — and the status
    filter is pushed into the orders scan."""
    df = _q(spark, "tpch_q21")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "IsNotNull(o_orderstatus)" in pushed_filters(df) or "F" in plan


def test_q16_excludes_via_broadcast_anti(spark):
    df = _q(spark, "tpch_q16")
    plan = formatted_plan(df)
    assert "BuildRight, LeftAnti" in plan or (
        "LeftAnti" in plan and "Broadcast" in plan
    )


def test_minhash_exact_buckets_no_corpus_product(spark):
    """The md5-banded join must be an equi-join on (band, band_hash) —
    never a corpus x corpus product; the 8 permutation minima must
    come from ONE aggregate over the exploded shingles (8 aggregate
    expressions, not 8 passes)."""
    df = _q(spark, "dedup_minhash_exact")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # shingle-explode + band-posexplode per self-join side — and NOT
    # the 4x-unionAll shape that re-inlines the signature aggregate
    # subtree per band (16 Generates when this regresses)
    from quacfka_service_spark.plans.inspect import count_generates

    assert count_generates(df) <= 4, plan


def test_edit_distance_blocks_before_levenshtein(spark):
    """The block join must be an equi-join on (lb, pfx); levenshtein
    runs as a post-join filter, never as a join condition that would
    force a nested loop."""
    df = _q(spark, "dedup_edit_distance")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan


def test_knn_join_kernel_shape(spark):
    """Exact kNN self-join (r7 executor-side rewrite): the numpy
    kernel runs as ONE cogroup node (FlatMapCoGroupsInPandas) over
    the 2-D (corpus block x query tile) grid — no join node at all
    (the 30s-at-sf0.1 per-pair cross join is the regression this pins
    against), no checkpoint scan (the pre-r7 driver-collect tiling
    materialized per-tile ExistingRDDs), and the global finish is a
    windowed rank with WindowGroupLimit pruning.  The no-driver-data
    property is pinned at runtime by test_skew_and_ivf.py."""
    df = _q(spark, "similarity_knn_join")
    plan = formatted_plan(df)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "ExistingRDD" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_cap_per_source_prunes_before_shuffle(spark):
    """row_number <= cap must trigger WindowGroupLimit so a hot
    source's rows are pruned to the per-partition top-cap BEFORE the
    source-keyed shuffle; exactly one exchange."""
    df = _q(spark, "corpus_cap_per_source")
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert count_exchanges(df) == 1


def test_q11_global_total_is_broadcast(spark):
    """The group-vs-global gate: the 1-row total must come back as a
    broadcast nested-loop cross, not a shuffle."""
    df = _q(spark, "tpch_q11")
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_rolling_active_users_no_range_join(spark):
    """WAU via date-sequence fan-out: no range/nested-loop join may
    appear — the semi join on the day spine must be broadcast/hash."""
    df = _q(spark, "events_rolling_active_users")
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_basket_pairs_co_partitions_on_orderkey(spark):
    """The pair self-join must be an equi-join on orderkey (fan-out
    bounded per order) — never a product."""
    df = _q(spark, "basket_pairs")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rfm_broadcasts_global_max(spark):
    df = _q(spark, "orders_rfm")
    assert has_broadcast_join(df)


def test_quantize_broadcasts_dim_stats(spark):
    """The 64-row per-dimension stats join must broadcast (map-only
    encode); exactly the explode + stats agg shuffles exist."""
    df = _q(spark, "embedding_quantize_sq8")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_user_growth_windows_day_cardinality_only(spark):
    """The cumsum window must sit above the per-day aggregate, never
    over event rows: two aggregates (user first-seen, per-day counts)
    then the window."""
    df = _q(spark, "events_user_growth")
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2


# --- batch 6: chunking / transitions / coverage / temperature mix ---------

def test_chunk_windows_zero_shuffle(spark):
    """Chunking is pure map + bounded fan-out: the plan may contain NO
    Exchange at all — tokenization, the sequence explode, and the
    slice/join projection all stream through the scan."""
    df = _q(spark, "corpus_chunk_windows")
    assert count_exchanges(df) == 0
    plan = formatted_plan(df)
    assert "Generate" in plan  # the window-index explode


def test_transitions_single_user_shuffle_then_tiny_agg(spark):
    """One hash-partition on user_id for the lag window; the
    transition count aggregate is map-side combined over a
    |event_type|^2 key space."""
    df = _q(spark, "events_transitions")
    assert count_exchanges(df) == 2  # user window + final agg
    assert has_partial_aggregation(df)


def test_token_coverage_windows_class_cardinality_only(spark):
    """The running-sum window must run on the frequency-CLASS table
    (group by tf), never over the token table: wordcount agg +
    class agg + single-partition window + broadcast decile join."""
    df = _q(spark, "text_token_coverage")
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final x (tf, classes)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_mixture_temperature_no_corpus_shuffle(spark):
    """Identical scan shape to corpus_mixture: per-source counts
    broadcast back; the corpus itself never shuffles (no Exchange
    below the join other than the tiny count aggregate's)."""
    df = _q(spark, "corpus_mixture_temperature")
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in plan


def test_centroid_assign_is_map_only_plus_matrix_agg(spark):
    """The |labels|-row centroid table is collected driver-side and
    inlined as a literal array (VERDICT r7 #1) — assignment is a pure
    projection, so the corpus-side plan has NO join of any kind and NO
    window; the only exchange is the final |labels|²-key matrix agg,
    which must map-side combine."""
    # pin the OPERATOR's plan, not the registered key's: since r10 the
    # key wraps it in run_static (eager localCheckpoint under a scoped
    # non-AQE conf), whose returned frame is a checkpoint scan that
    # hides the upstream shape.
    from quacfka_service_spark.operators.similarity import centroid_assign
    from quacfka_service_spark.session import load_table as _lt

    df = centroid_assign(_lt(spark, SF_DIR, "embeddings"))
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "Window" not in plan
    assert count_exchanges(df) == 1  # the matrix agg only
    assert has_partial_aggregation(df)  # the matrix agg map-side combines
