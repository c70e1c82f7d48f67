"""Minimal protobuf (proto3) wire-format codec for ``Bidrequest``.

The reference decodes Kafka payloads with generated vtproto code
(/root/reference/gen/bidrequest_vtproto.pb.go, unmarshal entry :12212);
its schema is /root/reference/proto/bidrequest.proto.  Spark's native
analog is ``from_protobuf`` (pyspark.sql.protobuf), but that needs the
spark-protobuf jar + a compiled descriptor set, neither of which exists
in this environment — so this module implements the proto3 *wire
format* (varint / 64-bit / length-delimited / 32-bit frames; public
spec) directly, schema-driven from the field numbers in the reference
.proto.  It is the fallback decode path and the test-fixture encoder;
production deployments with the jar available use ``from_protobuf``
(see decode.py).

Proto3 semantics replicated (SURVEY.md §1.2):
- scalar zero values ('' / 0 / 0.0) are NOT serialized; a decoder
  therefore materializes them as defaults whenever the enclosing
  message is present;
- message fields are presence-tracked: absent => None, present-but-
  empty => all-defaults struct (matches Go nil-vs-zero pointers,
  gen/bidrequest.pb.go:29-32);
- unknown fields are skipped by wire type;
- repeated scalars: proto3 packs repeated ints (LEN frame of varints)
  by default — the decoder accepts both packed and unpacked; repeated
  strings are one LEN frame per element.

The field specs below cover ALL 22 messages of
/root/reference/proto/bidrequest.proto (field numbers cited inline) and
are the single source of truth: quacfka_service_spark/schema.py derives
the Spark StructTypes from them and fullwidth.py derives the fixture
generator + flat-export oracle, so wire codec, schema, and fixtures can
never drift apart.
"""

from __future__ import annotations

import struct
from typing import Any

# --- wire primitives ------------------------------------------------------

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def encode_varint(value: int) -> bytes:
    """Unsigned LEB128."""
    if value < 0:
        # proto int32/int64 negatives are encoded as 10-byte two's complement
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _zig(n: int, bits: int) -> int:
    """Reinterpret an unsigned varint as signed two's complement."""
    if n >= 1 << (bits - 1):
        n -= 1 << bits
    return n


# --- schema specs ---------------------------------------------------------
#
# spec := {field_number: (name, kind, sub_spec_or_None)}
# kind in {"string", "int32", "int64", "float", "message", "messages",
# "strings", "int32s"} ("messages" = repeated message, "strings" =
# repeated string, "int32s" = repeated int32, packed).  Field numbers
# cited from /root/reference/proto/bidrequest.proto.  All 22 messages.

METRIC_SPEC = {                                                            # proto:67-73
    1: ("type", "string", None),
    2: ("value", "float", None),
    3: ("vendor", "string", None),
}
BANNER_SPEC = {                                                            # proto:75-90
    1: ("format", "strings", None),   # repeated string in this proto
    2: ("w", "int32", None),
    3: ("h", "int32", None),
    4: ("btype", "int32s", None),
    5: ("battr", "int32s", None),
    6: ("pos", "int32", None),
    7: ("mimes", "strings", None),
    8: ("topframe", "int32", None),
    9: ("expdir", "int32s", None),
    10: ("api", "int32s", None),
    11: ("id", "string", None),
    12: ("vcm", "int32", None),
}
VIDEO_SPEC = {                                                             # proto:92-120
    1: ("mimes", "strings", None),
    2: ("minduration", "int32", None),
    3: ("maxduration", "int32", None),
    4: ("protocols", "int32s", None),
    5: ("w", "int32", None),
    6: ("h", "int32", None),
    7: ("startdelay", "int32", None),
    8: ("placement", "int32", None),
    9: ("linearity", "int32", None),
    10: ("skip", "int32", None),
    11: ("skipmin", "int32", None),
    12: ("skipafter", "int32", None),
    13: ("sequence", "int32", None),
    14: ("battr", "int32s", None),
    15: ("maxextended", "int32", None),
    16: ("minbitrate", "int32", None),
    17: ("maxbitrate", "int32", None),
    18: ("boxingallowed", "int32", None),
    19: ("playbackmethod", "int32s", None),
    20: ("playbackend", "int32", None),
    21: ("delivery", "int32s", None),
    22: ("pos", "int32", None),
    23: ("companionad", "messages", BANNER_SPEC),
    24: ("api", "int32s", None),
    25: ("companiontype", "int32s", None),
}
AUDIO_SPEC = {                                                             # proto:122-143
    1: ("mimes", "strings", None),
    2: ("minduration", "int32", None),
    3: ("maxduration", "int32", None),
    4: ("protocols", "int32s", None),
    5: ("startdelay", "int32", None),
    6: ("sequence", "int32", None),
    7: ("battr", "int32s", None),
    8: ("maxextended", "int32", None),
    9: ("minbitrate", "int32", None),
    10: ("maxbitrate", "int32", None),
    11: ("delivery", "int32s", None),
    12: ("companionad", "messages", BANNER_SPEC),
    13: ("api", "int32s", None),
    14: ("companiontype", "int32s", None),
    15: ("maxseq", "int32", None),
    16: ("feed", "int32", None),
    17: ("stitched", "int32", None),
    18: ("nvol", "int32", None),
}
NATIVE_SPEC = {                                                            # proto:145-152
    1: ("request", "string", None),
    2: ("ver", "string", None),
    3: ("api", "int32s", None),
    4: ("battr", "int32s", None),
}
# Format is declared in the reference proto (proto:154-162) but never
# referenced by any field (Banner.format is `repeated string`); kept so
# every one of the 22 messages has a spec + codec coverage.
FORMAT_SPEC = {
    1: ("w", "int32", None),
    2: ("h", "int32", None),
    3: ("wratio", "int32", None),
    4: ("hratio", "int32", None),
    5: ("wmin", "int32", None),
}
DEAL_SPEC = {                                                              # proto:171-180
    1: ("id", "string", None),
    2: ("bidfloor", "float", None),
    3: ("bidfloorcur", "string", None),
    4: ("at", "int32", None),
    5: ("wseat", "strings", None),
    6: ("wadomain", "strings", None),
}
PMP_SPEC = {                                                               # proto:164-169
    1: ("private_auction", "int32", None),
    2: ("deals", "messages", DEAL_SPEC),
}
IMP_SPEC = {                                                               # proto:45-65
    1: ("id", "string", None),
    2: ("metric", "messages", METRIC_SPEC),
    3: ("banner", "message", BANNER_SPEC),
    4: ("video", "message", VIDEO_SPEC),
    5: ("audio", "message", AUDIO_SPEC),
    6: ("native", "message", NATIVE_SPEC),
    7: ("pmp", "message", PMP_SPEC),
    8: ("displaymanager", "string", None),
    9: ("displaymanagerver", "string", None),
    10: ("instl", "int32", None),
    11: ("tagid", "string", None),
    12: ("bidfloor", "float", None),
    13: ("bidfloorcur", "string", None),
    14: ("clickbrowser", "int32", None),
    15: ("secure", "int32", None),
    16: ("iframebuster", "strings", None),
    17: ("exp", "int32", None),
}
PUBLISHER_SPEC = {                                                         # proto:220-227
    1: ("id", "string", None),
    2: ("name", "string", None),
    3: ("cat", "strings", None),
    4: ("domain", "string", None),
}
PRODUCER_SPEC = {                                                          # proto:258-265
    1: ("id", "string", None),
    2: ("name", "string", None),
    3: ("cat", "strings", None),
    4: ("domain", "string", None),
}
SEGMENT_SPEC = {                                                           # proto:341-347
    1: ("id", "string", None),
    2: ("name", "string", None),
    3: ("value", "string", None),
}
DATA_SPEC = {                                                              # proto:333-339
    1: ("id", "string", None),
    2: ("name", "string", None),
    3: ("segment", "messages", SEGMENT_SPEC),
}
CONTENT_SPEC = {                                                           # proto:229-256
    1: ("id", "string", None),
    2: ("episode", "int32", None),
    3: ("title", "string", None),
    4: ("series", "string", None),
    5: ("season", "string", None),
    6: ("artist", "string", None),
    7: ("genre", "string", None),
    8: ("album", "string", None),
    9: ("isrc", "string", None),
    10: ("producer", "message", PRODUCER_SPEC),
    11: ("url", "string", None),
    12: ("cat", "strings", None),
    13: ("prodq", "int32", None),
    14: ("context", "int32", None),
    15: ("contentrating", "string", None),
    16: ("userrating", "string", None),
    17: ("qagmediarating", "int32", None),
    18: ("keywords", "string", None),
    19: ("livestream", "int32", None),
    20: ("sourcerelationship", "int32", None),
    21: ("len", "int32", None),
    22: ("language", "string", None),
    23: ("embeddable", "int32", None),
    24: ("data", "messages", DATA_SPEC),
}
SITE_SPEC = {                                                              # proto:182-199
    1: ("id", "string", None),
    2: ("name", "string", None),
    3: ("domain", "string", None),
    4: ("cat", "strings", None),
    5: ("sectioncat", "strings", None),
    6: ("pagecat", "strings", None),
    7: ("page", "string", None),
    8: ("ref", "string", None),
    9: ("search", "string", None),
    10: ("mobile", "int32", None),
    11: ("privacypolicy", "int32", None),
    12: ("publisher", "message", PUBLISHER_SPEC),
    13: ("content", "message", CONTENT_SPEC),
    14: ("keywords", "string", None),
}
APP_SPEC = {                                                               # proto:201-218
    1: ("id", "string", None),
    2: ("name", "string", None),
    3: ("bundle", "string", None),
    4: ("domain", "string", None),
    5: ("storeurl", "string", None),
    6: ("cat", "strings", None),
    7: ("sectioncat", "strings", None),
    8: ("pagecat", "strings", None),
    9: ("ver", "string", None),
    10: ("privacypolicy", "int32", None),
    11: ("paid", "int32", None),
    12: ("publisher", "message", PUBLISHER_SPEC),
    13: ("content", "message", CONTENT_SPEC),
    14: ("keywords", "string", None),
}
GEO_SPEC = {                                                               # proto:302-318
    1: ("lat", "float", None),
    2: ("lon", "float", None),
    3: ("type", "int32", None),
    4: ("accuracy", "int32", None),
    5: ("lastfix", "int32", None),
    6: ("ipservice", "int32", None),
    7: ("country", "string", None),
    8: ("region", "string", None),
    9: ("regionfips104", "string", None),
    10: ("metro", "string", None),
    11: ("city", "string", None),
    12: ("zip", "string", None),
    13: ("utcoffset", "int32", None),
}
DEVICE_SPEC = {                                                            # proto:267-300
    1: ("ua", "string", None),
    2: ("geo", "message", GEO_SPEC),
    3: ("dnt", "int32", None),
    4: ("lmt", "int32", None),
    5: ("ip", "string", None),
    6: ("ipv6", "string", None),
    7: ("devicetype", "int32", None),
    8: ("make", "string", None),
    9: ("model", "string", None),
    10: ("os", "string", None),
    11: ("osv", "string", None),
    12: ("hwv", "string", None),
    13: ("h", "int32", None),
    14: ("w", "int32", None),
    15: ("ppi", "int32", None),
    16: ("pxratio", "float", None),
    17: ("js", "int32", None),
    18: ("geofetch", "int32", None),
    19: ("flashver", "string", None),
    20: ("language", "string", None),
    21: ("carrier", "string", None),
    22: ("mccmnc", "string", None),
    23: ("connectiontype", "int32", None),
    24: ("ifa", "string", None),
    25: ("didsha1", "string", None),
    26: ("didmd5", "string", None),
    27: ("dpidsha1", "string", None),
    28: ("dpidmd5", "string", None),
    29: ("macsha1", "string", None),
    30: ("macmd5", "string", None),
}
USER_SPEC = {                                                              # proto:320-331
    1: ("id", "string", None),
    2: ("buyeruid", "string", None),
    3: ("yob", "int32", None),
    4: ("gender", "string", None),
    5: ("keywords", "string", None),
    6: ("customdata", "string", None),
    7: ("geo", "message", GEO_SPEC),
    8: ("data", "messages", DATA_SPEC),
}
SOURCE_SPEC = {                                                            # proto:31-37
    1: ("fd", "int32", None),
    2: ("tid", "string", None),
    3: ("pchain", "string", None),
}
REGS_SPEC = {1: ("coppa", "int32", None)}                                  # proto:39-43
TIMESTAMP_SPEC = {1: ("seconds", "int64", None), 2: ("nanos", "int32", None)}
BIDREQUEST_SPEC = {                                                        # proto:7-29
    1: ("id", "string", None),
    2: ("imp", "messages", IMP_SPEC),
    3: ("site", "message", SITE_SPEC),
    4: ("app", "message", APP_SPEC),
    5: ("device", "message", DEVICE_SPEC),
    6: ("user", "message", USER_SPEC),
    7: ("test", "int32", None),
    8: ("at", "int32", None),
    9: ("tmax", "int32", None),
    10: ("wseat", "strings", None),
    11: ("bseat", "strings", None),
    12: ("allimps", "int32", None),
    13: ("cur", "strings", None),
    14: ("wlang", "strings", None),
    15: ("bcat", "strings", None),
    16: ("badv", "strings", None),
    17: ("bapp", "strings", None),
    18: ("source", "message", SOURCE_SPEC),
    19: ("regs", "message", REGS_SPEC),
    20: ("timestamp", "message", TIMESTAMP_SPEC),
}


# --- encoder (test fixtures; proto3 zero-skipping) ------------------------

# Keyed by id(spec) for O(1) lookup, but the entry PINS the spec
# object: without the reference, a GC'd spec dict's id can be reused by
# a different spec and serve a stale field map (silently mis-encoded
# payloads).  Bounded by the number of distinct live specs.
_BY_NAME_CACHE: dict[int, tuple[dict, dict]] = {}


def _by_name(spec: dict) -> dict:
    got = _BY_NAME_CACHE.get(id(spec))
    if got is None or got[0] is not spec:
        mapped = {name: (num, kind, sub) for num, (name, kind, sub) in spec.items()}
        _BY_NAME_CACHE[id(spec)] = (spec, mapped)
        return mapped
    return got[1]


def encode_message(msg: dict[str, Any] | None, spec: dict) -> bytes:
    out = bytearray()
    if msg is None:
        return b""
    by_name = _by_name(spec)
    for name, value in msg.items():
        if name not in by_name:
            continue
        num, kind, sub = by_name[name]
        tag_len = (num << 3) | _WT_LEN
        if kind == "string":
            if value:  # proto3: '' not serialized
                raw = value.encode("utf-8")
                out += encode_varint(tag_len) + encode_varint(len(raw)) + raw
        elif kind in ("int32", "int64"):
            if value:  # proto3: 0 not serialized
                out += encode_varint((num << 3) | _WT_VARINT) + encode_varint(int(value))
        elif kind == "float":
            if value:
                out += encode_varint((num << 3) | _WT_I32) + struct.pack("<f", value)
        elif kind == "message":
            if value is not None:
                raw = encode_message(value, sub)
                out += encode_varint(tag_len) + encode_varint(len(raw)) + raw
        elif kind == "messages":
            # explicit None check: value may be a numpy array (pandas
            # batches), whose truthiness is ambiguous
            if value is not None:
                for item in value:
                    raw = encode_message(item, sub)
                    out += encode_varint(tag_len) + encode_varint(len(raw)) + raw
        elif kind == "strings":
            # proto3 repeated string: one LEN frame per element (every
            # element serialized, including '')
            if value is not None:
                for item in value:
                    raw = item.encode("utf-8")
                    out += encode_varint(tag_len) + encode_varint(len(raw)) + raw
        elif kind == "int32s":
            # proto3 packs repeated ints by default: one LEN frame of
            # concatenated varints; empty list not serialized
            if value is not None and len(value) > 0:
                packed = b"".join(encode_varint(int(v)) for v in value)
                out += encode_varint(tag_len) + encode_varint(len(packed)) + packed
    return bytes(out)


# --- decoder --------------------------------------------------------------

# Per-spec default templates, memoized: dict.copy() + fresh lists beats
# rebuilding a 30-field dict per decoded message (the decode hot loop
# touches this once per message, nested messages included).
# entry pins the spec — see _BY_NAME_CACHE for why id() alone is unsafe
_DEFAULTS_CACHE: dict[int, tuple[dict, dict[str, Any], tuple[str, ...]]] = {}


def _defaults(spec: dict) -> dict[str, Any]:
    entry = _DEFAULTS_CACHE.get(id(spec))
    got = (entry[1], entry[2]) if entry is not None and entry[0] is spec else None
    if got is None:
        tpl: dict[str, Any] = {}
        list_fields: list[str] = []
        for name, kind, _sub in spec.values():
            if kind == "string":
                tpl[name] = ""
            elif kind in ("int32", "int64"):
                tpl[name] = 0
            elif kind == "float":
                tpl[name] = 0.0
            elif kind == "message":
                tpl[name] = None
            elif kind in ("messages", "strings", "int32s"):
                tpl[name] = []
                list_fields.append(name)
        got = (tpl, tuple(list_fields))
        _DEFAULTS_CACHE[id(spec)] = (spec, tpl, tuple(list_fields))
    tpl, list_fields = got
    d = tpl.copy()
    for name in list_fields:
        d[name] = []
    return d


def decode_message(buf: bytes, spec: dict) -> dict[str, Any]:
    msg = _defaults(spec)
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = decode_varint(buf, pos)
        num, wt = key >> 3, key & 7
        field = spec.get(num)
        if field is None:
            # unknown field: skip by wire type
            if wt == _WT_VARINT:
                _, pos = decode_varint(buf, pos)
            elif wt == _WT_I64:
                pos += 8
            elif wt == _WT_LEN:
                ln, pos = decode_varint(buf, pos)
                pos += ln
            elif wt == _WT_I32:
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            continue
        name, kind, sub = field
        if kind == "string":
            ln, pos = decode_varint(buf, pos)
            msg[name] = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif kind == "int32":
            v, pos = decode_varint(buf, pos)
            # wire-standard truncation: int32 takes the low 32 bits of
            # the varint (identity on every wire-legal encoding; caps
            # malformed mid-range values to the declared width)
            msg[name] = _zig(v & 0xFFFFFFFF, 32)
        elif kind == "int64":
            v, pos = decode_varint(buf, pos)
            msg[name] = _zig(v & 0xFFFFFFFFFFFFFFFF, 64)
        elif kind == "float":
            msg[name] = struct.unpack("<f", buf[pos:pos + 4])[0]
            pos += 4
        elif kind == "message":
            ln, pos = decode_varint(buf, pos)
            msg[name] = decode_message(buf[pos:pos + ln], sub)
            pos += ln
        elif kind == "messages":
            ln, pos = decode_varint(buf, pos)
            msg[name].append(decode_message(buf[pos:pos + ln], sub))
            pos += ln
        elif kind == "strings":
            ln, pos = decode_varint(buf, pos)
            msg[name].append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        elif kind == "int32s":
            if wt == _WT_LEN:  # packed (proto3 default)
                ln, pos = decode_varint(buf, pos)
                end = pos + ln
                vals = msg[name]
                while pos < end:
                    v, pos = decode_varint(buf, pos)
                    vals.append(_zig(v & 0xFFFFFFFF, 32))
            else:  # unpacked writer
                v, pos = decode_varint(buf, pos)
                msg[name].append(_zig(v & 0xFFFFFFFF, 32))
    return msg


def encode_bidrequest(msg: dict[str, Any]) -> bytes:
    return encode_message(msg, BIDREQUEST_SPEC)


def decode_bidrequest(buf: bytes) -> dict[str, Any]:
    return decode_message(buf, BIDREQUEST_SPEC)


# --- framing helpers (reference's byte-level hacks) -----------------------

CONFLUENT_PREFIX_LEN = 6  # main.go:230-231 WithMessageCutConfluencePrefix


def strip_confluent_prefix(payload: bytes) -> bytes:
    """S2 confluent_prefix_munger (main.go:231): drop 6 magic bytes."""
    return payload[CONFLUENT_PREFIX_LEN:]


def append_ts_suffix(payload: bytes, epoch_ms: int) -> bytes:
    """S3 kafka_ts_append (main.go:228-229): +8 LE bytes of epoch-ms."""
    return payload + struct.pack("<Q", epoch_ms)


def split_ts_suffix(payload: bytes) -> tuple[bytes, int]:
    """Inverse of append_ts_suffix (decode at main.go:331-333)."""
    return payload[:-8], struct.unpack("<Q", payload[-8:])[0]
