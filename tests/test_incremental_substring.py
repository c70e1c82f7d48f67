"""Incremental ExactSubstr (streaming/incremental_substring.py):
``result()`` after any batching must equal batch ``substring_spans``
over the full corpus; a replayed epoch is a txlog no-op (doubled
occurrence rows would fabricate duplicates — idempotence is
correctness here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.dedup import substring_spans
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_substring import (
    IncrementalSubstringDeduper,
)

SF_DIR = "/root/testdata/sf0.001"


def _spans(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in df.collect()
    }


def test_incremental_substring_equals_batch_and_replay_is_noop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    parts = [
        docs.where(F.col("doc_id") % 3 == 0),
        docs.where(F.col("doc_id") % 3 == 1),
        docs.where(F.col("doc_id") % 3 == 2),
    ]
    dd = IncrementalSubstringDeduper(str(tmp_path / "ss"))
    for epoch, part in enumerate(parts):
        v = dd.process_batch(part, epoch)
    # replayed epoch: txlog drops the duplicate commit — version
    # unchanged AND (the correctness half) counts are not doubled
    assert dd.process_batch(parts[1], 1) == v

    got = _spans(dd.result(docs.sparkSession))
    want = _spans(substring_spans(docs))
    assert want, "fixture produced no duplicated spans (vacuous)"
    assert got == want

    # cross-epoch retroactivity: result() must ALSO find duplicated
    # spans whose two copies arrived in DIFFERENT epochs — certify the
    # fixture exercises it by checking some span's doc pair straddles
    # the %3 split (text equality across residue classes)
    # (substring_spans on each part alone misses cross-part dups)
    per_part = set()
    for part in parts:
        per_part |= _spans(substring_spans(part))
    assert got - per_part, "no cross-epoch duplicate in fixture (vacuous)"


def test_incremental_substring_empty_result_before_ingest(spark, tmp_path):
    dd = IncrementalSubstringDeduper(str(tmp_path / "ss0"))
    out = dd.result(spark)
    assert out.count() == 0
    assert out.columns == ["doc_id", "span_start", "span_end", "span_len"]
