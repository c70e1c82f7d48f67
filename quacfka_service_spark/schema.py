"""Bidrequest schemas — the reference's one "table".

The reference autogenerates an Arrow schema from the protobuf type
parameter (/root/reference/README.md:6, main.go:203) and extends it with
declared custom fields (main.go:201).  Here the Spark ``StructType`` is
DERIVED from the wire-codec field specs (proto/wire.py), which mirror
/root/reference/proto/bidrequest.proto field-for-field across all 22
messages — one source of truth, so codec and schema cannot drift.

Proto3 null semantics (SURVEY.md §1.2): scalar fields are never null
(absent => zero value, i.e. '' / 0); *message* fields are nullable.
That is why ``banner``/``video``/``pmp`` are nullable structs while
``user.id`` etc. are non-null strings that may be ''.  Repeated fields
(scalar or message) are never null inside a present parent — absent =>
empty array.
"""

from __future__ import annotations

from pyspark.sql import types as T

from .proto import wire

_KIND_TO_TYPE = {
    "string": T.StringType,
    "int32": T.IntegerType,
    "int64": T.LongType,
    "float": T.FloatType,
}


def struct_of(spec: dict) -> T.StructType:
    """Wire spec -> StructType, field order = ascending field number
    (= declaration order in the reference .proto)."""
    fields = []
    for num in sorted(spec):
        name, kind, sub = spec[num]
        if kind in _KIND_TO_TYPE:
            dt: T.DataType = _KIND_TO_TYPE[kind]()
        elif kind == "strings":
            dt = T.ArrayType(T.StringType())
        elif kind == "int32s":
            dt = T.ArrayType(T.IntegerType())
        elif kind == "message":
            dt = struct_of(sub)
        elif kind == "messages":
            dt = T.ArrayType(struct_of(sub))
        else:  # pragma: no cover
            raise ValueError(f"unknown kind {kind}")
        fields.append(T.StructField(name, dt))
    return T.StructType(fields)


# Named sub-schemas (kept for direct use in fixtures/tests).
METRIC = struct_of(wire.METRIC_SPEC)
BANNER = struct_of(wire.BANNER_SPEC)
VIDEO = struct_of(wire.VIDEO_SPEC)
AUDIO = struct_of(wire.AUDIO_SPEC)
NATIVE = struct_of(wire.NATIVE_SPEC)
FORMAT = struct_of(wire.FORMAT_SPEC)   # declared but unreferenced in the proto
DEAL = struct_of(wire.DEAL_SPEC)
PMP = struct_of(wire.PMP_SPEC)
IMP = struct_of(wire.IMP_SPEC)
PUBLISHER = struct_of(wire.PUBLISHER_SPEC)
PRODUCER = struct_of(wire.PRODUCER_SPEC)
SEGMENT = struct_of(wire.SEGMENT_SPEC)
DATA = struct_of(wire.DATA_SPEC)
CONTENT = struct_of(wire.CONTENT_SPEC)
SITE = struct_of(wire.SITE_SPEC)
APP = struct_of(wire.APP_SPEC)
GEO = struct_of(wire.GEO_SPEC)
DEVICE = struct_of(wire.DEVICE_SPEC)
USER = struct_of(wire.USER_SPEC)

# google.protobuf.Timestamp kept as a raw struct — the reference queries
# timestamp.seconds / timestamp.nanos directly (main.go:105), it never
# materializes a TIMESTAMP column at ingest.
PROTO_TIMESTAMP = struct_of(wire.TIMESTAMP_SPEC)

BIDREQUEST_SCHEMA = T.StructType(
    list(struct_of(wire.BIDREQUEST_SPEC).fields)
    # custom field injected by the orchestrator config
    # (main.go:201: q.CustomField{Name:"event_tm", Type:q.INT64})
    + [T.StructField("event_tm", T.LongType())]
)

# --- flat normalized schema (main.go:198-199 aliases, builder types at
#     main.go:363-380; uint32 widened to INT per SURVEY.md §1.2) ---------

NORM_COLUMNS = [
    "bidreq_id",    # = bidreq.id
    "device_id",    # coalesce_empty(user.id, site.id, device.ifa), main.go:347
    "pub_id",       # site.publisher.id
    "event_time",   # timestamp.seconds + nanos DIV 1e9 (== seconds), main.go:366
    "width",        # imp[0].banner.w if banner else imp[0].video.w, main.go:351-361
    "height",
    "deal",         # one row per imp[0].pmp.deals[i].id; NULL if none, main.go:362-380
]

NORM_SCHEMA = T.StructType([
    T.StructField("bidreq_id", T.StringType()),
    T.StructField("device_id", T.StringType()),
    T.StructField("pub_id", T.StringType()),
    T.StructField("event_time", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("deal", T.StringType()),
])
