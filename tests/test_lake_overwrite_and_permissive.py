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
