"""Incremental winnowing (streaming/incremental_winnow.py):
``result()`` after any batching must equal batch ``winnow_candidates``
over the full corpus; a replayed epoch is a txlog no-op (doubled
fingerprint rows would inflate n_shared)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.text import winnow_candidates
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_winnow import (
    IncrementalWinnowDeduper,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"], r["n_shared"]) for r in df.collect()}


def test_incremental_winnow_equals_batch_and_replay_is_noop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = [
        docs.where(F.col("doc_id") % 3 == 0),
        docs.where(F.col("doc_id") % 3 == 1),
        docs.where(F.col("doc_id") % 3 == 2),
    ]
    dd = IncrementalWinnowDeduper(str(tmp_path / "wn"))
    for epoch, part in enumerate(parts):
        v = dd.process_batch(part, epoch)
    assert dd.process_batch(parts[1], 1) == v  # replay = no-op

    got = _pairs(dd.result(docs.sparkSession))
    want = _pairs(winnow_candidates(docs))
    assert want, "fixture produced no candidate pairs (vacuous)"
    assert got == want

    # certify cross-epoch pairs exist (a pair whose two docs arrived
    # in different epochs) — otherwise the union contract is untested
    per_part = set()
    for part in parts:
        per_part |= _pairs(winnow_candidates(part))
    assert got - per_part, "no cross-epoch pair in fixture (vacuous)"


def test_incremental_winnow_empty_before_ingest(spark, tmp_path):
    dd = IncrementalWinnowDeduper(str(tmp_path / "wn0"))
    assert dd.result(spark).count() == 0
