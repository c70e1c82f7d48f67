"""Stream-stream interval join (streaming/joins.py): the streamed
pair set must equal the batch band_join on the same data, and the
physical plan must carry watermarks on both inputs (bounded state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.joins import ASOF_BAND_SECS, band_join
from quacfka_service_spark.session import load_table
from quacfka_service_spark.streaming.joins import interval_join

from .conftest import SF_DIR


def _sides(spark):
    ev = load_table(spark, SF_DIR, "events")
    l = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("l_event_id"), "user_id", F.col("ts").alias("lts")
    )
    r = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("r_event_id"), "user_id", F.col("ts").alias("rts")
    )
    return l, r


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    l, r = _sides(spark)
    ldir, rdir, out = str(tmp_path / "l"), str(tmp_path / "r"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    l.write.parquet(ldir)
    r.write.parquet(rdir)

    ls = spark.readStream.schema(l.schema).parquet(ldir)
    rs = spark.readStream.schema(r.schema).parquet(rdir)
    joined = interval_join(ls, rs, key="user_id", band_secs=ASOF_BAND_SECS)
    q = (
        joined.select("user_id", "l_event_id", "r_event_id", "dt_sec")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    got = spark.read.parquet(out)
    want = band_join(l, r, key="user_id", band_secs=ASOF_BAND_SECS).select(
        "user_id", "l_event_id", "r_event_id", "dt_sec"
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_interval_join_batch_twin(spark):
    """interval_join on batch frames == band_join (shared semantics)."""
    l, r = _sides(spark)
    a = interval_join(l, r, key="user_id", band_secs=ASOF_BAND_SECS).select(
        "user_id", "l_event_id", "r_event_id", "dt_sec"
    )
    b = band_join(l, r, key="user_id", band_secs=ASOF_BAND_SECS).select(
        "user_id", "l_event_id", "r_event_id", "dt_sec"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
