"""S8 dynamic-overwrite semantics + permissive decode robustness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.functions.scalars import epoch_ms_precise
from quacfka_service_spark.proto.decode import decode_bidrequests
from quacfka_service_spark.proto.wire import append_ts_suffix, encode_bidrequest
from quacfka_service_spark.sinks.lake import write_raw_export

SF_DIR = "/root/testdata/sf0.001"
PREFIX = b"\x00\x00\x00\x00\x00\x01"


def test_dynamic_overwrite_replaces_only_written_hours(spark, tmp_path_factory):
    """OVERWRITE_OR_IGNORE parity (main.go:108,125): re-exporting one
    hour must replace exactly that hour partition and leave the rest."""
    lake = str(tmp_path_factory.mktemp("lake_dyn")) + "/bidreq"
    bidreq = build_bidreq(spark, SF_DIR)
    write_raw_export(bidreq, lake)  # full overwrite export
    total = spark.read.parquet(lake).count()

    ts = epoch_ms_precise(F.col("timestamp.seconds"), F.col("timestamp.nanos"))
    with_h = bidreq.withColumn("__h", F.date_trunc("hour", ts))
    one_hour_val = with_h.agg(F.min("__h")).first()[0]
    one_hour = with_h.where(F.col("__h") == one_hour_val).drop("__h")
    n_hour = one_hour.count()
    assert 0 < n_hour < total

    # re-export only that hour, halved: dynamic mode must rewrite just it
    halved = one_hour.where(F.col("id").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    write_raw_export(halved, lake)  # mode=overwrite + dynamic conf
    after = spark.read.parquet(lake).count()
    assert after == total - n_hour + halved.count()


@pytest.fixture(scope="module")
def mixed_input(spark):
    rows = build_bidreq(spark, SF_DIR).limit(20).collect()
    recs = []
    for r in rows:
        d = r.asDict(recursive=True)
        tm = d.pop("event_tm")
        recs.append((None, PREFIX + append_ts_suffix(encode_bidrequest(d), tm), tm))
    # corrupt records: a dangling varint (continuation bit set, buffer
    # ends) and a record too short to carry the 8-byte ts suffix
    recs.append((None, PREFIX + append_ts_suffix(b"\x08\x80", 0), 0))
    recs.append((None, b"\x01\x02", 0))
    return spark.createDataFrame(recs, "key binary, value binary, ts_ms long").select(
        "key", "value", F.timestamp_millis("ts_ms").alias("timestamp")
    )


def test_permissive_decode_drops_corrupt_records(spark, mixed_input):
    out = decode_bidrequests(
        mixed_input, confluent_prefix=True, ts_suffix=True, permissive=True
    )
    ids = [r["id"] for r in out.select("id").collect()]
    assert len(ids) == 20  # the two corrupt records dropped
    assert all(i.startswith("req-") for i in ids)


def test_strict_decode_fails_on_corrupt_records(spark, mixed_input):
    with pytest.raises(Exception):
        decode_bidrequests(
            mixed_input, confluent_prefix=True, ts_suffix=True, permissive=False
        ).count()


def test_two_concurrent_writers_accumulate_files_in_same_hour(
    spark, tmp_path_factory
):
    """{{rand}} multi-writer parity (reference main.go:108,125): the
    reference names each rotated export file with a random token +
    OVERWRITE_OR_IGNORE, so multiple consumer processes ACCUMULATE
    parquet files inside the same hour partition without clobbering.
    Our analog is txlog append: two concurrent foreachBatch writers
    (distinct app_ids, interleaved epochs) landing the SAME hour must
    (a) both commit (optimistic rebase, no lost write), (b) accumulate
    files side by side in the hour partition, and (c) read back equal
    to a single-writer export of the same rows."""
    import threading

    from quacfka_service_spark.functions.scalars import epoch_ms_precise
    from quacfka_service_spark.sinks.txlog import TxTable

    from pyspark.sql.window import Window

    bidreq = build_bidreq(spark, SF_DIR)
    ts = epoch_ms_precise(F.col("timestamp.seconds"), F.col("timestamp.nanos"))
    with_h = bidreq.withColumn("__h", F.date_trunc("hour", ts))
    busiest = (
        with_h.groupBy("__h").count().orderBy(F.desc("count"), F.asc("__h")).first()
    )
    hour_rows = (
        with_h.where(F.col("__h") == busiest["__h"])
        .select("id", F.col("__h").cast("string").alias("h"))
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    n_hour = hour_rows.count()
    assert n_hour > 1
    # deterministic balanced split between the two "consumers"
    half_a = hour_rows.where(F.col("rn") % 2 == 1).drop("rn").localCheckpoint()
    half_b = hour_rows.where(F.col("rn") % 2 == 0).drop("rn").localCheckpoint()
    hour_rows = hour_rows.drop("rn")
    assert half_a.count() > 0 and half_b.count() > 0

    root = str(tmp_path_factory.mktemp("multi")) + "/t"
    errs = []

    def writer(app_id, part, epochs=3):
        try:
            t = TxTable(root)  # own handle, like a separate process
            for e in range(epochs):
                # each "rotation" lands a slice of this writer's rows
                sl = part.where(F.crc32(F.col("id")) % epochs == e)
                t.commit_epoch(sl, app_id, e, partition_by=["h"])
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    th_a = threading.Thread(target=writer, args=("consumer-a", half_a))
    th_b = threading.Thread(target=writer, args=("consumer-b", half_b))
    th_a.start(); th_b.start(); th_a.join(); th_b.join()
    assert not errs, errs

    t = TxTable(root)
    live = t.live_files()
    # file ACCUMULATION inside the single hour dir: every non-empty
    # epoch of each writer left its own file(s); nothing clobbered
    assert len(live) >= 2
    back = t.read(spark)
    single = hour_rows
    assert back.count() == n_hour
    assert (
        back.select("id").exceptAll(single.select("id")).count() == 0
        and single.select("id").exceptAll(back.select("id")).count() == 0
    )

    # idempotent replay parity with the reference's OVERWRITE_OR_IGNORE:
    # re-running writer a's epochs adds nothing
    v = t.latest_version()
    writer("consumer-a", half_a)
    assert not errs, errs
    assert t.read(spark).count() == n_hour
    assert t.latest_version() == v
