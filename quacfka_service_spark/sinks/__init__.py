"""Sinks: hive-partitioned zstd parquet lake (raw / norm / hourly agg)."""
