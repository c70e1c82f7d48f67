"""Protobuf ingest layer: wire-format codec + Spark decode operators."""
