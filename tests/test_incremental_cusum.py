"""IncrementalCusum: streaming-vs-batch exactness, replay no-op,
compaction invariance, readStream e2e, and the online rate-shift
alert shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.timeseries import ts_changepoint_cusum
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.incremental_cusum import IncrementalCusum

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _batches(spark, n=3):
    ev = load_table(spark, SF_DIR, "events")
    return ev, [ev.where(F.col("event_id") % n == i) for i in range(n)]


def test_incremental_cusum_equals_batch_over_union(spark, tmp_path):
    """After any batching — replays included — changepoints() equals
    the batch operator over the union, bit-exactly (integer counts
    SUM-merge; shared cusum_from_hourly tail)."""
    ev, batches = _batches(spark)
    mon = IncrementalCusum(str(tmp_path / "cusum"))
    for i, b in enumerate(batches):
        mon.process_batch(b, epoch=i)
    mon.process_batch(batches[1], epoch=1)  # replayed epoch: no-op
    assert _rows(mon.changepoints(spark)) == _rows(ts_changepoint_cusum(ev))


def test_incremental_cusum_compaction_invariance(spark, tmp_path):
    ev, batches = _batches(spark)
    mon = IncrementalCusum(str(tmp_path / "cusumc"))
    mon.process_batch(batches[0], epoch=0)
    mon.process_batch(batches[1], epoch=1)
    mon.compact(spark)
    mon.process_batch(batches[2], epoch=2)
    assert _rows(mon.changepoints(spark)) == _rows(ts_changepoint_cusum(ev))


def test_incremental_cusum_flags_rate_shift(spark, tmp_path):
    """Online alert shape: a type running flat for 48 h then spiking
    10x in later epochs must surface the regime boundary as its #1
    changepoint, with the statistic growing as the spike persists."""
    def mk(h0, h1, per, eid0):
        rows = []
        eid = eid0
        for h in range(h0, h1):
            for _ in range(per):
                eid += 1
                rows.append(
                    (eid, f"2024-03-{1 + h // 24:02d} {h % 24:02d}:30:00", 1, "svc", 1.0, "{}")
                )
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))

    mon = IncrementalCusum(str(tmp_path / "cusumr"))
    mon.process_batch(mk(0, 48, 1, 0), epoch=0)      # flat regime
    mon.process_batch(mk(48, 60, 10, 10_000), epoch=1)  # spike begins
    top1 = mon.changepoints(spark, k=1).collect()[0]
    mon.process_batch(mk(60, 72, 10, 20_000), epoch=2)  # spike persists
    top2 = mon.changepoints(spark, k=1).collect()[0]
    assert top1.h.strftime("%Y-%m-%d %H") == "2024-03-02 23"
    assert top2.h.strftime("%Y-%m-%d %H") == "2024-03-02 23"
    assert top2.stat > top1.stat  # evidence accumulates


def test_incremental_cusum_readstream_e2e(spark, tmp_path):
    """Real readStream pipeline: events streamed file-per-micro-batch
    through foreachBatch; final changepoints equal the batch operator
    over the whole log."""
    ev = load_table(spark, SF_DIR, "events")
    src_dir = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src_dir)
    stream_schema = spark.read.parquet(src_dir).schema
    mon = IncrementalCusum(str(tmp_path / "cusums"))
    seen = []

    def body(batch_df, epoch_id):
        seen.append(epoch_id)
        mon.process_batch(batch_df, epoch_id)

    q = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(seen) > 1
    assert _rows(mon.changepoints(spark)) == _rows(ts_changepoint_cusum(ev))
