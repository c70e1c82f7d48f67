"""Sessionization: batch (oracle-checked separately) vs streaming
stateful operator — the two forms must agree on closed sessions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quacfka_service_spark.operators.sessionize import sessionize
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.sessionize import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_matches_batch_closed_sessions(spark, tmp_path_factory):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_id")
    input_dir = str(tmp_path_factory.mktemp("sess_in"))
    out = str(tmp_path_factory.mktemp("sess_out") / "sessions")
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))

    # two arrival waves split by event time (earlier wave arrives first,
    # so state carries open sessions across separate runs)
    median = ev.select(F.median(F.unix_timestamp("ts")).alias("m")).first()["m"]
    sec = F.unix_timestamp("ts")
    ev.where(sec <= F.lit(median)).coalesce(1).write.mode("append").parquet(input_dir)

    def run_once():
        q = (
            sessionize_stream(
                spark.readStream.schema(ev.schema).parquet(input_dir)
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None
        q.stop()

    run_once()
    ev.where(sec > F.lit(median)).coalesce(1).write.mode("append").parquet(input_dir)
    run_once()

    got = spark.read.parquet(out).select(
        "user_id", "session_start", "session_end", "n_events"
    )

    # batch truth: all sessions except each user's final (still open)
    sess = sessionize(ev)
    last = Window.partitionBy("user_id")
    want = (
        sess.withColumn("_max_idx", F.max("session_idx").over(last))
        .where(F.col("session_idx") != F.col("_max_idx"))
        .select("user_id", "session_start", "session_end", "n_events")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert got.count() > 0  # the fixture must actually close sessions


@pytest.mark.parametrize("gap", [60, 3600])
def test_batch_gap_parameter_monotonicity(spark, gap):
    ev = load_table(spark, SF_DIR, "events")
    n_default = sessionize(ev).count()
    n = sessionize(ev, gap_secs=gap).count()
    # smaller gap => at least as many sessions
    assert (n >= n_default) == (gap <= 1800)
