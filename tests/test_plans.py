"""Physical-plan regression guards (SURVEY.md §4.1).

Each test pins a plan property the 100 TB story depends on.  These are
*plan* assertions, not timings — they catch a silently-added shuffle or
a dropped pushdown at CI time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.operators.aggregates import hourly_agg
from quacfka_service_spark.operators.normalize import normalize_bidreq
from quacfka_service_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    partition_filters,
    pushed_filters,
    read_schema,
)
from quacfka_service_spark.session import load_table
from quacfka_service_spark.sinks.lake import write_raw_export

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def raw_lake(spark, tmp_path_factory):
    """A real hive-partitioned lake written by our sink."""
    path = str(tmp_path_factory.mktemp("lake")) + "/bidreq"
    write_raw_export(build_bidreq(spark, SF_DIR), path)
    return path


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.where(F.col("l_quantity") < 10).select("l_orderkey")
    assert "LessThan(l_quantity" in pushed_filters(q)


def test_column_pruning_two_column_projection(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    rs = read_schema(q)
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs  # untouched wide column must not be read


def test_nested_schema_pruning_on_lake(spark, raw_lake):
    """Selecting 2 nested leaves from the 22-message struct must not
    scan the whole struct (nestedSchemaPruning)."""
    lake = spark.read.parquet(raw_lake)
    q = lake.select(F.col("site.publisher.id"), F.col("timestamp.seconds"))
    rs = read_schema(q)
    assert "publisher" in rs and "seconds" in rs
    assert "device" not in rs and "imp" not in rs


def test_hour_partition_pruning_on_lake(spark, raw_lake):
    """P4's year/month/day/hour predicate prunes hive partitions
    (static partition pruning — no data files of other hours read)."""
    lake = spark.read.parquet(raw_lake)
    one_hour = lake.where(
        (F.col("year") == "2024") & (F.col("month") == "11")
        & (F.col("day") == "1") & (F.col("hour") == "3")
    )
    pf = partition_filters(one_hour)
    assert "year" in pf and "hour" in pf
    assert pushed_filters(one_hour) == ""  # all four are partition cols


def test_join_guard_broadcasts_small_dim(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    q = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    assert has_broadcast_join(q)
    # broadcast join must not shuffle the big side
    assert "hashpartitioning(o_custkey" not in formatted_plan(q)


def test_hourly_agg_partial_aggregation_and_shuffle_budget(spark):
    q = hourly_agg(normalize_bidreq(build_bidreq(spark, SF_DIR)))
    assert has_partial_aggregation(q)  # map-side combine before exchange
    # fixture repartition + distinct rewrite's two exchanges = 3 max
    assert count_exchanges(q) <= 3


def test_normalize_is_shuffle_free(spark, raw_lake):
    """The normalizer over a lake read is pure narrow work (projection
    + generate): zero exchanges, exactly the reference's one-pass
    flattening claim (main.go:339-341)."""
    lake = spark.read.parquet(raw_lake).drop("year", "month", "day", "hour")
    assert count_exchanges(normalize_bidreq(lake)) == 0


def test_pack_blocks_single_exchange(spark):
    """Per-shard packing = exactly one hash-partition on source; the
    window sort happens inside the task (no global sort, no extra
    shuffle)."""
    from quacfka_service_spark.operators.corpus import corpus_pack_blocks

    docs = load_table(spark, SF_DIR, "documents")
    q = corpus_pack_blocks(docs)
    plan = formatted_plan(q)
    assert count_exchanges(q) == 1
    assert "hashpartitioning(source" in plan.replace(" ", "").lower()


def test_curation_broadcasts_component_map(spark):
    """The survivor semi-join against the component map (only docs with
    >= 1 near-dup) must broadcast, not shuffle the corpus."""
    from quacfka_service_spark.operators.corpus import corpus_curation

    docs = load_table(spark, SF_DIR, "documents")
    assert has_broadcast_join(corpus_curation(docs))


def test_pack_blocks_column_pruning(spark):
    """Packing reads only (source, doc_id, text) — the scan must not
    drag the other document columns."""
    from quacfka_service_spark.operators.corpus import corpus_pack_blocks

    docs = load_table(spark, SF_DIR, "documents")
    rs = read_schema(corpus_pack_blocks(docs))
    assert "lang" not in rs and "n_chars" not in rs

def test_lm_quality_buckets_has_no_global_sort_window(spark):
    """The decile rank must NOT plan a single-task global sort.  Two
    Window nodes are expected: the per-doc row_number PARTITIONED by
    the monotone log-band (parallel), and the running-offset sum over
    the band-count frame (unpartitioned but band-cardinality-sized —
    it sorts ~|log bands| rows, not the corpus).  Guard: the
    row_number window carries a partition spec."""
    from quacfka_service_spark.operators.lm import lm_quality_buckets

    docs = load_table(spark, SF_DIR, "documents")
    q = lm_quality_buckets(docs)
    plan = formatted_plan(q)
    rn = [
        a for a in plan.splitlines()
        if "row_number() windowspecdefinition" in a
    ]
    assert rn, "decile rank window missing from plan"
    # partitioned on the band: windowspecdefinition(band#..L, avg_logp ...)
    assert all("windowspecdefinition(band#" in a for a in rn), rn
    assert q.count() > 0
