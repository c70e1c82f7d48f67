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
    """Novelty must NOT build doc pairs: since r11 the only join is the
    doc_id-keyed merge of two DOC-SIZED aggregates (per-doc shingle
    counts ⟕ first-doc histogram of the per-shingle minima) — the full
    exploded shingle stream feeds map-side-combinable aggregates only
    and never crosses an exchange raw, and there is no self-join of
    the exploded table against itself producing doc x doc output."""
    import re

    df = _q(spark, "dedup_ngram_novelty")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # exactly ONE physical join node (doc-sized sizes <-> novelty merge)
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


def test_field_profile_single_scan_single_expand(spark):
    """The five exact countDistincts must compile to ONE Expand over
    ONE scan of documents — per-column re-scans (5 file reads) or
    per-distinct jobs would multiply the 100 TB cost by the column
    count."""
    import re

    df = _q(spark, "corpus_field_profile")
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_interleave_shards_no_global_sort(spark):
    """order_idx comes from the closed form over the broadcast
    per-source count list — the plan must contain NO single-partition
    global Sort feeding a Window (the naive row_number() OVER (ORDER
    BY ...) shape).  The only Window is the per-source row_number,
    partitioned by source; the counts side reaches the docs via
    broadcast."""
    import re

    df = _q(spark, "corpus_interleave_shards")
    plan = formatted_plan(df)
    # exactly ONE Window — the per-source row_number.  The naive shape
    # has a SECOND window (global row_number over ORDER BY round_idx,
    # source) whose sort runs on one task.
    windows = re.findall(r"\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan)
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert any("source" in w for w in windows)
    # the counts list reaches every doc row via broadcast (1-row table)
    assert "BroadcastExchange" in plan


def test_multimodal_dedup_digest_shuffle_only(spark):
    """Payload bytes must never shuffle: the aggregate keys on
    (media_type, md5) with map-side partial aggregation, and the
    exchange carries digests, not binary payloads."""
    df = _q(spark, "multimodal_dedup")
    plan = formatted_plan(df)
    assert has_partial_aggregation(df)
    assert "payload" not in plan.split("Exchange", 1)[1].split("\n")[0]


def test_pq_adc_broadcasts_lut_no_cartesian(spark):
    """ADC must scan the code table once with the LUT broadcast onto it
    — no cartesian anything, no shuffle of full-precision vectors (the
    only exchanges carry codes / (q_id, vec_id) partials), and the
    per-pair distance aggregate keeps map-side partials."""
    df = _q(spark, "similarity_pq_adc_topk")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert has_partial_aggregation(df)
