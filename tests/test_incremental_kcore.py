"""Incremental k-core (streaming/incremental_kcore.py): ``result()``
after any batching must equal batch ``kcore_neardup`` over the full
corpus; a replayed epoch is a txlog no-op (doubled shingle rows would
corrupt both the Jaccard denominators and the df-cap census)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.graph import kcore_neardup
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_kcore import IncrementalKCore

SF_DIR = "/root/testdata/sf0.001"


def _cores(df):
    return {(r["doc_id"], r["degree"]) for r in df.collect()}


def test_incremental_kcore_equals_batch_and_replay_is_noop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = [
        docs.where(F.col("doc_id") % 3 == 0),
        docs.where(F.col("doc_id") % 3 == 1),
        docs.where(F.col("doc_id") % 3 == 2),
    ]
    kc = IncrementalKCore(str(tmp_path / "kc"))
    for epoch, part in enumerate(parts):
        v = kc.process_batch(part, epoch)
    assert kc.process_batch(parts[1], 1) == v  # replay = no-op

    got = _cores(kc.result(docs.sparkSession))
    want = _cores(kcore_neardup(docs))
    assert want, "fixture has no 2-core (vacuous)"
    assert got == want

    # cross-epoch retroactivity: the core must contain edges whose
    # endpoints arrived in DIFFERENT epochs — per-part cores alone
    # must not reconstruct the full core
    per_part = set()
    for part in parts:
        per_part |= _cores(kcore_neardup(part))
    assert got != per_part or len(parts) == 1


def test_incremental_kcore_empty_before_ingest(spark, tmp_path):
    kc = IncrementalKCore(str(tmp_path / "kc0"))
    assert kc.result(spark).count() == 0


def test_dedup_savings_mass_conservation(spark):
    """Funnel-in-mass invariants: stage masses are monotone
    non-increasing, removed_* columns complement them exactly, and
    the doc counts agree with corpus_dedup_funnel row for row."""
    from quacfka_service_spark.operators.corpus import dedup_funnel, dedup_savings
    from quacfka_service_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    sav = {r["stage"]: r for r in dedup_savings(docs, emb).collect()}
    fun = {r["stage"]: r for r in dedup_funnel(docs, emb).collect()}
    assert set(sav) == set(fun) == {"1_raw", "2_exact", "3_near", "4_semantic"}
    raw_docs = sav["1_raw"]["n_docs"]
    raw_chars = sav["1_raw"]["total_chars"]
    prev_chars = None
    for stage in ["1_raw", "2_exact", "3_near", "4_semantic"]:
        r = sav[stage]
        assert r["n_docs"] == fun[stage]["n_docs"]
        assert r["removed_docs"] == raw_docs - r["n_docs"]
        assert r["removed_chars"] == raw_chars - r["total_chars"]
        assert abs(r["removed_frac"] - r["removed_chars"] / raw_chars) < 1e-12
        if prev_chars is not None:
            assert r["total_chars"] <= prev_chars
        prev_chars = r["total_chars"]
    assert sav["4_semantic"]["removed_chars"] > 0, "fixture removes nothing (vacuous)"
