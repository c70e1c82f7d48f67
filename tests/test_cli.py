"""CLI smoke: the service main drains a file-source replay to the lake."""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F

from quacfka_service_spark.fixtures import build_bidreq
from quacfka_service_spark.proto.wire import append_ts_suffix, encode_bidrequest

SF_DIR = "/root/testdata/sf0.001"
PREFIX = b"\x00\x00\x00\x00\x00\x01"


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "quacfka_service_spark", "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    assert "--lake" in out.stdout and "--source-files" in out.stdout


def test_cli_available_now_drain(spark, tmp_path_factory):
    input_dir = str(tmp_path_factory.mktemp("cli_in"))
    lake = str(tmp_path_factory.mktemp("cli_lake"))
    ckpt = str(tmp_path_factory.mktemp("cli_ckpt"))
    metrics = str(tmp_path_factory.mktemp("cli_metrics") / "m.jsonl")

    rows = build_bidreq(spark, SF_DIR).limit(50).collect()
    recs = []
    for r in rows:
        d = r.asDict(recursive=True)
        tm = d.pop("event_tm")
        recs.append((None, PREFIX + append_ts_suffix(encode_bidrequest(d), tm), tm))
    (
        spark.createDataFrame(recs, "key binary, value binary, ts_ms long")
        .select("key", "value", F.timestamp_millis("ts_ms").alias("timestamp"))
        .coalesce(1).write.mode("overwrite").parquet(input_dir)
    )

    out = subprocess.run(
        [sys.executable, "-m", "quacfka_service_spark",
         "--source-files", input_dir, "--lake", lake, "--checkpoint", ckpt,
         "--metrics-jsonl", metrics, "--available-now", "--ts-suffix",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert spark.read.parquet(f"{lake}/bidreq").count() == 50
