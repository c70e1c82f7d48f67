"""X2 extension point as a Spark-4 Python UDTF: the SQL-callable
decode+normalize must agree row-for-row with the oracle-checked
mapInArrow + Catalyst path on real framed fixture bytes."""

from __future__ import annotations

from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.operators.normalize import normalize_bidreq
from quacfka_service_spark.proto.decode import decode_bidrequests, encode_bidrequests
from quacfka_service_spark.proto.udtf_ext import register_normalize_udtf

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_udtf_equals_maparrow_normalize_path(spark, tmp_path):
    framed = encode_bidrequests(build_bidreq(spark, SF_DIR))
    path = str(tmp_path / "framed")
    framed.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("framed_records")

    register_normalize_udtf(spark)
    got = spark.sql(
        "SELECT bidreq_id, device_id, pub_id, event_time, width, height, deal "
        "FROM normalize_bidreq(TABLE(framed_records))"
    )
    want = normalize_bidreq(
        decode_bidrequests(
            spark.read.parquet(path), confluent_prefix=True, ts_suffix=True
        )
    )
    assert got.columns == want.columns
    g, w = _rows(got), _rows(want)
    assert len(g) == len(w) > 0
    assert g == w


def test_udtf_emits_multiple_rows_per_multi_deal_message(spark, tmp_path):
    framed = encode_bidrequests(build_bidreq(spark, SF_DIR))
    path = str(tmp_path / "framed2")
    framed.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("framed_records2")
    register_normalize_udtf(spark, name="normalize_bidreq2")
    out = spark.sql(
        "SELECT bidreq_id, count(*) AS n FROM "
        "normalize_bidreq2(TABLE(framed_records2)) GROUP BY bidreq_id"
    )
    # the fixture plants multi-deal requests: the UDTF is genuinely 1->N
    assert out.where("n > 1").count() > 0
