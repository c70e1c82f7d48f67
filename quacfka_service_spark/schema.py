"""Bidrequest schemas — the reference's one "table".

The reference autogenerates an Arrow schema from the protobuf type
parameter (/root/reference/README.md:6, main.go:203) and extends it with
declared custom fields (main.go:201).  Here the same schema is a static
``StructType`` mirroring /root/reference/proto/bidrequest.proto — the
subset every reference query/normalizer path touches, plus bystander
fields to exercise nested-column pruning (FIXTURES.md §1).

Proto3 null semantics (SURVEY.md §1.2): scalar fields are never null
(absent => zero value, i.e. '' / 0); *message* fields are nullable.
That is why ``banner``/``video``/``pmp`` are nullable structs while
``user.id`` etc. are non-null strings that may be ''.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- nested bidreq schema (proto/bidrequest.proto) -----------------------

BANNER = T.StructType([
    T.StructField("w", T.IntegerType()),      # proto:78
    T.StructField("h", T.IntegerType()),      # proto:79
])

VIDEO = T.StructType([
    T.StructField("w", T.IntegerType()),      # proto:98
    T.StructField("h", T.IntegerType()),      # proto:99
])

DEAL = T.StructType([
    T.StructField("id", T.StringType()),      # proto:173
    T.StructField("bidfloor", T.FloatType()), # proto:174
])

PMP = T.StructType([
    T.StructField("private_auction", T.IntegerType()),   # proto:166
    T.StructField("deals", T.ArrayType(DEAL)),           # proto:167
])

IMP = T.StructType([
    T.StructField("id", T.StringType()),          # proto:47
    T.StructField("banner", BANNER),              # nullable struct
    T.StructField("video", VIDEO),                # nullable struct
    T.StructField("pmp", PMP),                    # nullable struct
    T.StructField("bidfloor", T.FloatType()),     # proto:58
])

PUBLISHER = T.StructType([
    T.StructField("id", T.StringType()),          # proto:222
    T.StructField("name", T.StringType()),        # proto:223
])

SITE = T.StructType([
    T.StructField("id", T.StringType()),          # proto:184
    T.StructField("domain", T.StringType()),
    T.StructField("publisher", PUBLISHER),
])

GEO = T.StructType([
    T.StructField("country", T.StringType()),
    T.StructField("city", T.StringType()),
])

DEVICE = T.StructType([
    T.StructField("ifa", T.StringType()),         # proto:292
    T.StructField("ua", T.StringType()),
    T.StructField("os", T.StringType()),
    T.StructField("geo", GEO),
])

USER = T.StructType([
    T.StructField("id", T.StringType()),          # proto:322
])

# google.protobuf.Timestamp kept as a raw struct — the reference queries
# timestamp.seconds / timestamp.nanos directly (main.go:105), it never
# materializes a TIMESTAMP column at ingest.
PROTO_TIMESTAMP = T.StructType([
    T.StructField("seconds", T.LongType()),
    T.StructField("nanos", T.IntegerType()),
])

BIDREQUEST_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), nullable=False),     # proto:9
    T.StructField("imp", T.ArrayType(IMP)),                  # proto:10
    T.StructField("site", SITE),                             # proto:11
    T.StructField("device", DEVICE),                         # proto:13
    T.StructField("user", USER),                             # proto:27
    T.StructField("timestamp", PROTO_TIMESTAMP),             # proto:28
    # custom field injected by the orchestrator config
    # (main.go:201: q.CustomField{Name:"event_tm", Type:q.INT64})
    T.StructField("event_tm", T.LongType()),
])

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
