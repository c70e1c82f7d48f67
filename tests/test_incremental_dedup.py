"""Incremental LSH dedup (streaming/incremental.py): the union of
per-epoch pair emissions must equal batch ``minhash_lsh_pairs`` over
the full corpus — same pairs, same jaccard — however the rows were
batched; replayed epochs emit nothing (txlog txn idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.dedup import minhash_lsh_pairs
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental import IncrementalDeduper

SF_DIR = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in df.collect()
    }


def test_incremental_equals_batch_and_replay_is_noop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # 3 deterministic epochs, uneven sizes, near-dups split across them
    parts = [
        docs.where(F.col("doc_id") % 3 == 0),
        docs.where(F.col("doc_id") % 3 == 1),
        docs.where(F.col("doc_id") % 3 == 2),
    ]
    dd = IncrementalDeduper(str(tmp_path / "dd"))
    emitted = set()
    per_epoch_counts = []
    for epoch, part in enumerate(parts):
        got = _pairs_set(dd.process_batch(part, epoch))
        assert not (emitted & got), "pair emitted twice across epochs"
        emitted |= got
        per_epoch_counts.append(len(got))

    batch = _pairs_set(minhash_lsh_pairs(docs))
    assert emitted == batch
    assert len(batch) > 0, "fixture produced no near-dup pairs (vacuous)"
    # cross-epoch pairs must exist, else the accumulated-store join was
    # never exercised (every pair same-batch would also pass equality)
    assert sum(1 for c in per_epoch_counts[1:] if c) > 0

    # replayed epoch (driver retry): emits nothing, tables unchanged
    v_corpus = dd.corpus.latest_version()
    v_buckets = dd.buckets.latest_version()
    again = dd.process_batch(parts[1], 1)
    assert again.count() == 0
    assert dd.corpus.latest_version() == v_corpus
    assert dd.buckets.latest_version() == v_buckets

    # a genuinely new epoch after the replay still works
    extra = spark.createDataFrame(
        [(900001, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    out = dd.process_batch(extra, 3)
    assert out.count() == 0  # unrelated text: no near-dups
    assert dd.corpus.read(spark).count() == docs.count() + 1
