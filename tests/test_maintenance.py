"""Small-file compaction (sinks/maintenance.py): rows preserved
exactly, file counts collapse, untouched partitions untouched."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from quacfka_service_spark.session import load_table
from quacfka_service_spark.sinks.lake import with_hour_partitions
from quacfka_service_spark.sinks.maintenance import compact_partitions

from .conftest import SF_DIR


def _files(lake: str) -> list[str]:
    return glob.glob(lake + "/**/*.parquet", recursive=True)


def test_compact_partition(spark, tmp_path):
    lake = str(tmp_path / "lake")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", F.col("ts")
    )
    part = with_hour_partitions(ev, F.col("ts"))
    # simulate many micro-batch appends: 2 x 10-way-split writes
    for _ in range(2):
        part.drop("ts").repartition(10).write.mode("append").partitionBy(
            "year", "month", "day", "hour"
        ).parquet(lake)

    before_rows = spark.read.parquet(lake).count()
    before_files = len(_files(lake))
    assert before_files > 40  # plenty of small files

    target_day = spark.read.parquet(lake).select("year", "month", "day").first()
    where = (
        f"year='{target_day['year']}' AND month='{target_day['month']}'"
        f" AND day='{target_day['day']}'"
    )
    day_rows_before = spark.read.parquet(lake).where(where).count()
    other_files_before = {
        f for f in _files(lake)
        if f"/year={target_day['year']}/month={target_day['month']}/day={target_day['day']}/" not in f
    }

    stats = compact_partitions(spark, lake, where=where)
    assert stats.count() > 0
    assert stats.agg(F.sum("rows")).collect()[0][0] == day_rows_before

    # rows identical, compacted partitions now one file per hour dir
    assert spark.read.parquet(lake).count() == before_rows
    assert spark.read.parquet(lake).where(where).count() == day_rows_before
    day_files_after = [
        f for f in _files(lake)
        if f"/year={target_day['year']}/month={target_day['month']}/day={target_day['day']}/" in f
    ]
    per_hour = {}
    for f in day_files_after:
        hour_dir = f.rsplit("/", 1)[0]
        per_hour[hour_dir] = per_hour.get(hour_dir, 0) + 1
    assert all(n == 1 for n in per_hour.values()), per_hour

    # untouched partitions keep their original files
    assert other_files_before == {
        f for f in _files(lake)
        if f"/year={target_day['year']}/month={target_day['month']}/day={target_day['day']}/" not in f
    }
    assert len(_files(lake)) < before_files
