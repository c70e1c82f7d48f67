"""IncrementalDrift: streaming-vs-batch exactness, replay no-op,
compaction invariance, frozen-reference gate (VERDICT r6 #8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.importance import drift_tv
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_drift import IncrementalDrift

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _doc_batches(spark, n=3):
    docs = load_table(spark, SF_DIR, "documents")
    return docs, [docs.where(F.col("doc_id") % n == i) for i in range(n)]


def test_incremental_drift_equals_batch_over_union(spark, tmp_path):
    """After any sequence of batches — replays included — drift()
    equals drift_tv over the union, bit-exactly (integer histogram
    state + the shared exact TV tail)."""
    docs, batches = _doc_batches(spark)
    mon = IncrementalDrift(str(tmp_path / "drift"))
    for i, b in enumerate(batches):
        mon.process_batch(b, epoch=i)
    mon.process_batch(batches[1], epoch=1)  # replayed epoch: no-op
    assert _rows(mon.drift(spark)) == _rows(drift_tv(docs))


def test_incremental_drift_compaction_invariance(spark, tmp_path):
    docs, batches = _doc_batches(spark)
    mon = IncrementalDrift(str(tmp_path / "driftc"))
    mon.process_batch(batches[0], epoch=0)
    mon.process_batch(batches[1], epoch=1)
    mon.compact(spark)
    mon.process_batch(batches[2], epoch=2)
    assert _rows(mon.drift(spark)) == _rows(drift_tv(docs))


def test_drift_vs_frozen_reference_gates_a_shifted_source(spark, tmp_path):
    """The online-gate shape: freeze the accepted release's histogram;
    a clean re-ingest scores near zero against it, a boilerplate-
    flooded source scores high."""
    docs = load_table(spark, SF_DIR, "documents")
    mon = IncrementalDrift(str(tmp_path / "driftg"))
    mon.freeze_reference(docs)
    # epoch 0: the same distribution -> per-source TV vs ref equals the
    # batch drift numbers (reference == corpus-wide histogram)
    mon.process_batch(docs, epoch=0)
    assert _rows(mon.drift_vs_reference(spark)) == _rows(drift_tv(docs))
    # epoch 1: one source floods with boilerplate
    flooded = docs.limit(50).select(
        "doc_id",
        F.lit("spamsource").alias("source"),
        F.lit("click here click here click here buy now").alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "source", "text")],
    ).select(*docs.columns)
    mon.process_batch(flooded, epoch=1)
    tv = {r["source"]: r["tv"] for r in mon.drift_vs_reference(spark).collect()}
    clean_max = max(v for s, v in tv.items() if s != "spamsource")
    assert tv["spamsource"] > 0.5 > clean_max


def test_incremental_drift_readstream_e2e(spark, tmp_path):
    """Real readStream pipeline: documents streamed one file per
    micro-batch through foreachBatch into the monitor; the final
    drift() equals the batch operator over the whole corpus."""
    docs = load_table(spark, SF_DIR, "documents")
    src_dir = str(tmp_path / "src")
    docs.repartition(3).write.mode("overwrite").parquet(src_dir)
    mon = IncrementalDrift(str(tmp_path / "drifts"))
    seen = []

    def body(batch_df, epoch_id):
        seen.append(epoch_id)
        mon.process_batch(batch_df, epoch_id)

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen) > 1
    assert _rows(mon.drift(spark)) == _rows(drift_tv(docs))
