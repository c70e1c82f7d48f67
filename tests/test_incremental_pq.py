"""Incremental PQ index (streaming/incremental_pq.py): adc_topk() over
any sequence of appended batches must equal batch ``pq_adc_topk`` over
the union under the same frozen codebook — same neighbors, same float
adist, same ranks; replayed epochs are no-ops (txlog txn idempotency
on both the codes and queries tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.similarity import pq_adc_topk, pq_seed_codebook
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_pq import IncrementalPQIndex

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["q_id"], r["rank"], r["neighbor_id"], r["adist"])
        for r in df.collect()
    )


def test_incremental_pq_equals_batch_over_union(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_seed_codebook(emb)  # frozen codebook, shared by both sides
    parts = [
        emb.where(F.col("vec_id") % 3 == 0),
        emb.where(F.col("vec_id") % 3 == 1),
        emb.where(F.col("vec_id") % 3 == 2),
    ]
    idx = IncrementalPQIndex(str(tmp_path / "pq"), codebook=cb)
    for epoch, part in enumerate(parts):
        idx.process_batch(part, epoch)

    got = _rows(idx.adc_topk(spark))
    want = _rows(pq_adc_topk(emb, codebook=cb))
    assert len(want) > 0, "fixture produced no ADC results (vacuous)"
    assert got == want  # includes exact float equality on adist

    # replayed epoch: both tables drop it; results unchanged
    v_codes = idx.codes.latest_version()
    v_queries = idx.queries.latest_version()
    idx.process_batch(parts[0], 0)
    assert idx.codes.latest_version() == v_codes
    assert idx.queries.latest_version() == v_queries
    assert _rows(idx.adc_topk(spark)) == want


def test_frozen_codebook_means_no_reencode(spark, tmp_path):
    """The codebook is FROZEN: encoding a batch must not depend on
    which other batches exist (the property that makes the index
    appendable without rescanning the corpus).  Encode the same part
    alone vs after other parts landed — identical codes."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_seed_codebook(emb)
    part = emb.where(F.col("vec_id") % 3 == 2)

    alone = IncrementalPQIndex(str(tmp_path / "a"), codebook=cb)
    alone.process_batch(part, 0)
    after = IncrementalPQIndex(str(tmp_path / "b"), codebook=cb)
    after.process_batch(emb.where(F.col("vec_id") % 3 == 0), 0)
    after.process_batch(part, 1)

    key = lambda df: sorted(  # noqa: E731
        (r["vec_id"], r["m"], r["code"]) for r in df.collect()
    )
    part_ids = {r["vec_id"] for r in part.select("vec_id").collect()}
    got = [
        t for t in key(after.codes.read(spark).select("vec_id", "m", "code"))
        if t[0] in part_ids
    ]
    assert got == key(alone.codes.read(spark).select("vec_id", "m", "code"))
