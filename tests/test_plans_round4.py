"""Plan pins for round-4 additions — assert the load-bearing physical
property (the thing that must survive a 100x scale-up), not timings."""

from __future__ import annotations

import __spark_entry__ as entry
from quacfka_service_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_partial_aggregation,
)

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, key):
    return entry.queries()[key](spark, SF_DIR)


def test_anomaly_zscore_broadcasts_stats(spark):
    """The |types|-row stats table must BROADCAST back onto the hourly
    table — a shuffle join here would re-exchange the (type x hour)
    aggregate for a 5-row dimension.  Both aggregates keep map-side
    partials."""
    df = _q(spark, "events_anomaly_zscore")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert has_partial_aggregation(df)


def test_user_entropy_two_exchanges_no_window(spark):
    """(user, type) partial agg then user agg — two exchanges, no
    window operator, no join: the per-user fold happens inside the
    aggregate, never as a per-row window pass."""
    df = _q(spark, "events_user_entropy")
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "Join" not in plan
    assert count_exchanges(df) == 2


def test_cohort_ltv_joins_on_the_natural_key(spark):
    """first-order table joins back on o_custkey (the fact's natural
    key) — no cartesian anything; the cohort matrix aggregate keeps
    partial aggregation (months x months key space combines map-side)."""
    df = _q(spark, "orders_cohort_ltv")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_partial_aggregation(df)


def test_ngram_novelty_is_linear_no_pair_join(spark):
    """Novelty must NOT build doc pairs: exactly one join (shingle ->
    first_doc lookup), keyed on the shingle — the same key the agg
    shuffles on — and no self-join of the exploded table against
    itself producing doc x doc output."""
    import re

    df = _q(spark, "dedup_ngram_novelty")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # exactly ONE physical join node (the shingle -> first_doc lookup)
    assert len(re.findall(r"\(\d+\) \w*Join", plan)) == 1
    assert has_partial_aggregation(df)


def test_minhash_estimate_no_corpus_product(spark):
    """Candidates come from the banded bucket join; the signature and
    true-jaccard joins attach to CANDIDATES only — no unbucketed
    corpus x corpus join shape anywhere."""
    df = _q(spark, "dedup_minhash_estimate")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_ivf_probe_prunes_cells(spark, tmp_path):
    """The incremental store is hive-partitioned by cell; the probe
    join keys on cell, so scan-level partition pruning applies (the
    plan reads cell as a partition column, not a data column)."""
    from pyspark.sql import functions as F

    from quacfka_service_spark.operators.similarity import seed_centroids
    from quacfka_service_spark.session import load_table
    from quacfka_service_spark.streaming.incremental_similarity import (
        IncrementalIVFIndex,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = IncrementalIVFIndex(str(tmp_path / "ivf"), centroids=seed_centroids(emb))
    idx.process_batch(emb, 0)
    store = idx.cells.read(spark)
    # partition column: filtering on it must NOT appear as a data filter
    plan = formatted_plan(store.where(F.col("cell") == 0))
    assert "PartitionFilters" in plan and "cell" in plan
