"""Incremental HLL (streaming/incremental_hll.py): estimate() after
any sequence of batches must equal batch hll_distinct over the union —
estimate, nonzero_buckets AND register checksum — replays and
compaction included (register max-merge is associative/idempotent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.olap import hll_distinct
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_hll import IncrementalHLL

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["event_type"], r["hll_users"], r["nonzero_buckets"], r["registers_md5"])
        for r in df.collect()
    )


def test_incremental_hll_equals_batch_over_union(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    want = _rows(hll_distinct(ev))
    assert len(want) > 0

    sk = IncrementalHLL(str(tmp_path / "hll"))
    for epoch in range(3):
        sk.process_batch(ev.where(F.col("user_id") % 3 == epoch), epoch)
    assert _rows(sk.estimate(spark)) == want

    # replayed epoch: version unchanged, estimate unchanged
    v = sk.regs.latest_version()
    sk.process_batch(ev.where(F.col("user_id") % 3 == 1), 1)
    assert sk.regs.latest_version() == v
    assert _rows(sk.estimate(spark)) == want


def test_incremental_hll_batching_invariance_and_compaction(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    want = _rows(hll_distinct(ev))

    sk = IncrementalHLL(str(tmp_path / "hll2"))
    sk.process_batch(ev.where(F.col("event_id") % 2 == 0), 0)
    sk.process_batch(ev.where(F.col("event_id") % 2 == 1), 1)
    assert _rows(sk.estimate(spark)) == want

    # compaction folds history to one row per register, same estimate
    n_before = sk.regs.read(spark).count()
    sk.compact(spark)
    merged = sk.regs.read(spark)
    assert merged.count() <= n_before
    assert (
        merged.groupBy("event_type", "bucket").count().where(F.col("count") > 1).count()
        == 0
    )
    assert _rows(sk.estimate(spark)) == want


def test_incremental_cms_counters_equal_batch(spark, tmp_path):
    """Sum-merged streaming counters == batch cms_counters over the
    union for any batching; replay no-op; compaction preserves them."""
    from quacfka_service_spark.operators.olap import cms_counters
    from quacfka_service_spark.streaming.incremental_hll import IncrementalCMS

    ev = load_table(spark, SF_DIR, "events")
    want = sorted(
        (r["row"], r["col"], r["n"]) for r in cms_counters(ev).collect()
    )
    assert len(want) > 0

    sk = IncrementalCMS(str(tmp_path / "cms"))
    for epoch in range(3):
        sk.process_batch(ev.where(F.col("event_id") % 3 == epoch), epoch)
    got = sorted((r["row"], r["col"], r["n"]) for r in sk.merged(spark).collect())
    assert got == want

    v = sk.counters.latest_version()
    sk.process_batch(ev.where(F.col("event_id") % 3 == 0), 0)  # replay
    assert sk.counters.latest_version() == v

    sk.compact(spark)
    got2 = sorted((r["row"], r["col"], r["n"]) for r in sk.merged(spark).collect())
    assert got2 == want


def test_cms_overcounts_never_undercounts(spark):
    """CMS point estimates are >= the true count for EVERY heavy
    hitter — the one-sided error bound the sketch guarantees."""
    from quacfka_service_spark.operators.olap import cms_heavy_hitters

    ev = load_table(spark, SF_DIR, "events")
    out = cms_heavy_hitters(ev).collect()
    assert len(out) > 0
    assert all(r["cms_n"] >= r["true_n"] for r in out)


def test_hll_set_algebra_bounds_and_accuracy(spark):
    """Union dominates both sides (register max-merge is monotone),
    intersections are non-negative, every type pair appears once, and
    the sketch union stays within 10% of the exact union (HLL's m=4096
    standard error is ~1.6%)."""
    from quacfka_service_spark.operators.olap import hll_set_algebra

    ev = load_table(spark, SF_DIR, "events")
    out = hll_set_algebra(ev).collect()
    n_types = ev.select("event_type").distinct().count()
    assert len(out) == n_types * (n_types - 1) // 2
    for r in out:
        assert r["est_union"] >= max(r["est_a"], r["est_b"])
        assert r["est_intersection"] >= 0

    exact = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in (
            ev.select(F.col("event_type").alias("type_a"), "user_id")
            .join(
                ev.select(F.col("event_type").alias("type_b"), "user_id"),
                "user_id",
            )
            .where(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    exact_card = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in out:
        true_union = (
            exact_card[r["type_a"]]
            + exact_card[r["type_b"]]
            - exact.get((r["type_a"], r["type_b"]), 0)
        )
        assert abs(r["est_union"] - true_union) / true_union < 0.10
