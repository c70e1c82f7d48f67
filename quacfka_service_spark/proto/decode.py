"""S4 proto_decode: Kafka-record DataFrame -> nested bidreq DataFrame.

Two decode paths (SURVEY.md §7.4):

- **JVM (scale path):** ``pyspark.sql.protobuf.functions.from_protobuf``
  with a compiled descriptor set — the direct analog of the reference's
  generated-code unmarshal (/root/reference/main.go:329-391).  Runs
  inside codegen, no Python hop.  Requires the spark-protobuf jar +
  ``protoc``-compiled descriptor, neither present in the dev container.
- **Python (fallback, always available):** the pure wire-format decoder
  (wire.py) inside ``mapInPandas`` — Arrow-batched, one Python call per
  ~10k-row batch, not per row.  Each batch emits JSON which
  ``from_json`` parses JVM-side into the typed nested struct; all
  downstream operators see the identical schema either way.

Record shape in = Kafka source columns (``value`` binary, ``timestamp``
timestamp).  The reference's byte hacks map as:
- S2 confluent prefix: stripped JVM-side with ``substring`` before
  either decode path (main.go:231).
- S3 ts suffix: the reference smuggles the Kafka timestamp as 8
  trailing LE bytes because its decoder only sees the payload
  (main.go:228-233,331-333); Spark's Kafka source exposes ``timestamp``
  as a real column, so the suffix is only parsed when replaying
  reference-framed payloads (``ts_suffix=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import BIDREQUEST_SCHEMA
from .wire import (
    CONFLUENT_PREFIX_LEN,
    append_ts_suffix,
    decode_bidrequest,
    encode_bidrequest,
    split_ts_suffix,
)

# decoded payload schema = BIDREQUEST_SCHEMA minus the injected custom
# field event_tm (X3, main.go:201), which is attached post-decode.
PAYLOAD_SCHEMA = T.StructType([f for f in BIDREQUEST_SCHEMA.fields if f.name != "event_tm"])


def strip_confluent_prefix_col(df: DataFrame, col: str = "value") -> DataFrame:
    """S2 confluent_prefix_munger as a JVM-side binary slice."""
    n = CONFLUENT_PREFIX_LEN
    return df.withColumn(col, F.expr(f"substring({col}, {n + 1}, length({col}) - {n})"))


def jvm_protobuf_available(spark) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.protobuf.functions  # noqa: B018
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401
        return True
    except Exception:
        return False


def decode_bidrequests(
    df: DataFrame,
    *,
    confluent_prefix: bool = False,
    ts_suffix: bool = False,
    use_jvm: bool | None = None,
    desc_path: str | None = None,
    message_name: str = "Bidrequest",
    permissive: bool = False,
) -> DataFrame:
    """Kafka-shaped (value, timestamp) -> BIDREQUEST_SCHEMA rows.

    ``permissive=True``: a malformed payload is dropped instead of
    failing the batch/stream — the production posture for a Kafka topic
    that may carry stray records (the reference's pooled unmarshal
    simply surfaces the error per message, main.go:329-341).  Python
    path only; the JVM path inherits from_protobuf's own mode.
    """
    if confluent_prefix:
        df = strip_confluent_prefix_col(df)

    if use_jvm is None:
        use_jvm = desc_path is not None and jvm_protobuf_available(df.sparkSession)

    if use_jvm:
        if desc_path is None:
            raise ValueError("JVM decode path needs a protobuf descriptor file")
        from pyspark.sql.protobuf.functions import from_protobuf

        value = F.col("value")
        if ts_suffix:
            value = F.expr("substring(value, 1, length(value) - 8)")
        out = df.select(
            from_protobuf(value, message_name, descFilePath=desc_path).alias("r"),
            F.unix_millis(F.col("timestamp")).alias("event_tm"),
        )
        return out.select("r.*", "event_tm")

    # --- Python wire-format fallback (Arrow-batched) ---
    has_ts = "timestamp" in df.columns
    src = df
    if has_ts and not ts_suffix:
        src = src.withColumn("_ts_ms", F.unix_millis(F.col("timestamp")))
    cols = ["value"] + (["_ts_ms"] if (has_ts and not ts_suffix) else [])
    src = src.select(*cols)

    def _decode_batches(batches):
        # orjson serializes ~5x faster than stdlib json; the decoded
        # dicts are pure str/int/float/list/None so output is identical
        try:
            import orjson

            def _dumps(d):
                return orjson.dumps(d).decode()
        except ImportError:
            import json

            def _dumps(d):
                return json.dumps(d, separators=(",", ":"))

        import pandas as pd

        for pdf in batches:
            docs, evtm = [], []
            vals = pdf["value"].tolist()  # list iteration beats Series indexing
            ts_list = pdf["_ts_ms"].tolist() if "_ts_ms" in pdf.columns else None
            for i, raw in enumerate(vals):
                b = raw if isinstance(raw, bytes) else bytes(raw)
                try:
                    if ts_suffix:
                        b, ms = split_ts_suffix(b)
                    elif ts_list is not None:
                        ms = int(ts_list[i])
                    else:
                        ms = 0
                    doc = _dumps(decode_bidrequest(b))
                except Exception:
                    if permissive:
                        continue  # drop the malformed record
                    raise
                docs.append(doc)
                evtm.append(ms)
            yield pd.DataFrame({"json": docs, "event_tm": evtm})

    dec = src.mapInPandas(_decode_batches, schema="json string, event_tm long")
    return dec.select(
        F.from_json(F.col("json"), PAYLOAD_SCHEMA).alias("r"), F.col("event_tm")
    ).select("r.*", "event_tm")


_CONFLUENT_STUB = b"\x00\x00\x00\x00\x00\x01"


def encode_bidrequests(
    bidreq: DataFrame,
    *,
    confluent_prefix: bool = True,
    ts_suffix: bool = True,
) -> DataFrame:
    """Inverse of decode_bidrequests: BIDREQUEST_SCHEMA rows -> framed
    Kafka-record shape (value binary, timestamp).  Exists for replay /
    test harnesses (the reference is a consumer, not a producer); with
    decode it forms the oracle-checked round-trip proving the wire
    codec is lossless over real fixture data."""

    def _encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            vals, ts_ms = [], []
            for rec in pdf.to_dict("records"):
                event_tm = int(rec.pop("event_tm", 0) or 0)
                payload = encode_bidrequest(rec)
                if ts_suffix:
                    payload = append_ts_suffix(payload, event_tm)
                if confluent_prefix:
                    payload = _CONFLUENT_STUB + payload
                vals.append(payload)
                ts_ms.append(event_tm)
            yield pd.DataFrame({"value": vals, "ts_ms": ts_ms})

    out = bidreq.mapInPandas(_encode_batches, schema="value binary, ts_ms long")
    return out.select("value", F.timestamp_millis(F.col("ts_ms")).alias("timestamp"))
