"""Bucketed-table layout: pre-shuffle facts once at write time so
every subsequent join/aggregate on the bucket key is exchange-free.

At 100 TB the dominant cost of an order-grain join is shuffling the
fact table; bucketing both sides on the join key at ingest time pays
that shuffle once per dataset lifetime instead of once per query.
Spark only honors bucket pruning/co-location through the catalog, so
these are ``saveAsTable`` external tables (``option("path", ...)``) —
a plain ``parquet(path)`` write silently drops bucket metadata.

`tests/test_bucketed.py` pins the property that justifies the feature:
a join of two co-bucketed tables plans ZERO Exchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sort=True`` additionally sorts each bucket file by the key, which
    lets a sort-merge join skip its Sort as well when each bucket is a
    single file (one writer task per bucket => repartition first)."""
    w = (
        df.repartition(buckets, key)  # one file per bucket
        .write.format("parquet")
        .bucketBy(buckets, key)
        .mode("overwrite")
        .option("path", path)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.
    With equal bucket counts Spark aligns buckets 1:1 — no Exchange on
    either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
