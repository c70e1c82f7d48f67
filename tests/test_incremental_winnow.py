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


def test_incremental_quantile_equals_batch_and_replay_noop(spark, tmp_path):
    from pyspark.sql import functions as F

    from quacfka_service_spark.operators.olap import hist_quantiles
    from quacfka_service_spark.streaming.incremental_hll import IncrementalQuantile

    ev = load_table(spark, SF_DIR, "events")
    parts = [ev.where(F.col("event_id") % 3 == r) for r in range(3)]
    sk = IncrementalQuantile(str(tmp_path / "qs"))
    for epoch, part in enumerate(parts):
        v = sk.process_batch(part, epoch)
    assert sk.process_batch(parts[0], 0) == v  # replay no-op

    def rows(df):
        return {
            (r["event_type"], r["q"], r["n"], r["bin"], r["est"])
            for r in df.collect()
        }

    got = rows(sk.quantiles(spark))
    want = rows(hist_quantiles(ev))
    assert want and got == want
    sk.compact(spark)
    assert rows(sk.quantiles(spark)) == want  # compaction preserves
