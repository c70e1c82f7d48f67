"""Watermarked incremental hourly aggregation (streaming/windowed.py).

Semantics under test (SURVEY.md T2/T3, the strictly-stronger contract):
- append mode emits an hour exactly once, after the watermark passes it;
- the within-watermark dedup makes count(*) == exact count(distinct),
  so emitted rows equal the batch hourly_agg on the same data even when
  the input contains duplicate messages;
- a record later than the watermark allows is dropped, not double
  counted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.operators.aggregates import hourly_agg
from quacfka_service_spark.operators.normalize import normalize_bidreq
from quacfka_service_spark.proto.wire import append_ts_suffix, encode_bidrequest
from quacfka_service_spark.streaming.pipeline import Pipeline

SF_DIR = "/root/testdata/sf0.001"
PREFIX = b"\x00\x00\x00\x00\x00\x01"


def _frame(d: dict) -> tuple:
    event_tm = d.pop("event_tm")
    return (None, PREFIX + append_ts_suffix(encode_bidrequest(d), event_tm), event_tm)


@pytest.fixture(scope="module")
def dicts(spark):
    return [r.asDict(recursive=True) for r in build_bidreq(spark, SF_DIR).collect()]


def test_incremental_agg_matches_batch(spark, dicts, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inc_agg") / "agg")
    ckpt = str(tmp_path_factory.mktemp("inc_ckpt"))
    input_dir = str(tmp_path_factory.mktemp("inc_input"))

    recs = [_frame(dict(d, timestamp=dict(d["timestamp"]))) for d in
            (dict(x) for x in dicts)]
    # inject a duplicate of the first message: the streaming dedup must
    # keep counts equal to batch countDistinct over the originals
    recs.append(recs[0])
    df = spark.createDataFrame(recs, "key binary, value binary, ts_ms long").select(
        "key", "value", F.timestamp_millis("ts_ms").alias("timestamp")
    )
    df.coalesce(1).write.mode("append").parquet(input_dir)

    pipe = (
        Pipeline(spark)
        .source_files(input_dir)
        .decode(confluent_prefix=True, ts_suffix=True)
        .sink_lake("unused", ckpt)
        .trigger(available_now=True)
    )
    h = pipe.run_incremental_agg(out, lateness="2 hours")
    h.await_termination(300)
    assert h.error() is None
    h.stop()

    # run 1: watermark sits 2 h before max event time -> the trailing
    # hours are still open and unemitted
    emitted_1 = spark.read.parquet(out).count()

    # a far-future sentinel advances the watermark past every real hour
    max_sec = max(d["timestamp"]["seconds"] for d in dicts)
    sentinel = {
        "id": "req-sentinel",
        "imp": [], "site": None, "device": None, "user": None,
        "timestamp": {"seconds": max_sec + 36_000, "nanos": 0},
        "event_tm": (max_sec + 36_000) * 1000,
    }
    sdf = spark.createDataFrame([_frame(sentinel)], "key binary, value binary, ts_ms long").select(
        "key", "value", F.timestamp_millis("ts_ms").alias("timestamp")
    )
    sdf.coalesce(1).write.mode("append").parquet(input_dir)

    h2 = pipe.run_incremental_agg(out, lateness="2 hours")  # same checkpoint resumes
    h2.await_termination(300)
    assert h2.error() is None
    h2.stop()

    got = (
        spark.read.parquet(out)
        .where(F.col("pub_id").isNotNull())  # sentinel row has no pub
        .select("date", "hour", "pub_id", "device_id", "resolution", "deal", "requests")
    )
    want = hourly_agg(normalize_bidreq(build_bidreq(spark, SF_DIR)))
    assert got.count() > emitted_1  # run 2 flushed the open hours
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # phase 3 (T3): an event hours behind the watermark must be
    # DISCARDED, not double-counted into an already-emitted hour
    late = {
        "id": "req-late",
        "imp": dicts[0]["imp"],
        "site": dicts[0]["site"],
        "device": dicts[0]["device"],
        "user": dicts[0]["user"],
        "timestamp": dict(dicts[0]["timestamp"]),  # an old, closed hour
        "event_tm": dicts[0]["event_tm"],
    }
    ldf = spark.createDataFrame([_frame(late)], "key binary, value binary, ts_ms long").select(
        "key", "value", F.timestamp_millis("ts_ms").alias("timestamp")
    )
    ldf.coalesce(1).write.mode("append").parquet(input_dir)
    h3 = pipe.run_incremental_agg(out, lateness="2 hours")
    h3.await_termination(300)
    assert h3.error() is None
    h3.stop()
    after = (
        spark.read.parquet(out)
        .where(F.col("pub_id").isNotNull())
        .select("date", "hour", "pub_id", "device_id", "resolution", "deal", "requests")
    )
    assert after.count() == want.count()
    assert after.exceptAll(want).count() == 0
