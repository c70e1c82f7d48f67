"""The normalizer: nested bidreq -> flat ``bidreq_norm``.

Re-expresses the reference's hand-written builder loop
(/root/reference/main.go:342-381, rationale :339-341 "Unnesting the
data at the message deserialization level is much better for cache
locality") as a declarative DataFrame transform:

- P5 normalizer_projection: dotted-path + array-index access
  (``"imp[0].banner.w" -> "width"``, main.go:198-199).
- P6 coalesce_device_id: first non-*empty-string* of user.id, site.id,
  device.ifa (main.go:347,431-438 — proto3 zero values, not NULL).
- P7 banner_video_fallback: width/height from imp[0].banner when the
  banner *message* is present, else imp[0].video (main.go:351-361).
- U1 explode_deals_outer: one row per imp[0].pmp.deals[i]; a single
  NULL-deal row when there are zero deals (AppendNull at main.go:369)
  — exactly ``explode_outer`` semantics (NULL for both empty array and
  NULL array/pmp).
- F10 event_time: seconds + nanos DIV 1e9 (integer division — always
  +0; replicated, not fixed; main.go:366).

Scale notes: pure narrow projections + one generator (explode) — no
shuffle, stays inside whole-stage codegen, and Catalyst's nested-schema
pruning means a parquet scan under this transform reads only the seven
leaf columns actually referenced out of the 22-message struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import coalesce_empty, event_time_seconds

# Every field normalize_bidreq touches — pass to
# decode_bidrequests(project=NORMALIZE_FIELDS) for decoder-level
# projection pushdown on the ingest hot path (mapInArrow output is
# opaque to Catalyst pruning, so the pushdown must happen in the
# decoder; the parquet path needs nothing — nested-schema pruning
# handles it there).
NORMALIZE_FIELDS = [
    "id",
    "imp.banner.w", "imp.banner.h",
    "imp.video.w", "imp.video.h",
    "imp.pmp.deals.id",
    "site.id", "site.publisher.id",
    "device.ifa",
    "user.id",
    "timestamp",
]


def normalize_bidreq(bidreq: DataFrame) -> DataFrame:
    """bidreq (nested) -> bidreq_norm (flat, per-deal grain)."""
    # F.get, not [0]: ANSI mode (Spark 4 default) throws on indexing an
    # empty array; a zero-imp request must flow through as NULLs (the
    # proto3 absent-message contract), not kill the stream.
    imp0 = F.get(F.col("imp"), 0)
    width = F.when(imp0["banner"].isNotNull(), imp0["banner"]["w"]).otherwise(imp0["video"]["w"])
    height = F.when(imp0["banner"].isNotNull(), imp0["banner"]["h"]).otherwise(imp0["video"]["h"])

    return bidreq.select(
        F.col("id").alias("bidreq_id"),
        coalesce_empty(F.col("user.id"), F.col("site.id"), F.col("device.ifa")).alias("device_id"),
        F.col("site.publisher.id").alias("pub_id"),
        event_time_seconds(F.col("timestamp.seconds"), F.col("timestamp.nanos")).alias("event_time"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        # array-of-struct field extraction: imp[0].pmp.deals.id is
        # array<string>; explode_outer keeps a NULL row for empty/NULL.
        F.explode_outer(imp0["pmp"]["deals"]["id"]).alias("deal"),
    )
