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
- unknown fields are skipped by wire type (we model only the schema
  subset the engine queries; real payloads carry all 22 messages).
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
# kind in {"string", "int32", "int64", "float", "message", "messages"}
# ("messages" = repeated message).  Field numbers cited from
# /root/reference/proto/bidrequest.proto.

BANNER_SPEC = {2: ("w", "int32", None), 3: ("h", "int32", None)}           # proto:75-90
VIDEO_SPEC = {5: ("w", "int32", None), 6: ("h", "int32", None)}            # proto:92-120
DEAL_SPEC = {1: ("id", "string", None), 2: ("bidfloor", "float", None)}    # proto:171-180
PMP_SPEC = {                                                               # proto:164-169
    1: ("private_auction", "int32", None),
    2: ("deals", "messages", DEAL_SPEC),
}
IMP_SPEC = {                                                               # proto:45-65
    1: ("id", "string", None),
    3: ("banner", "message", BANNER_SPEC),
    4: ("video", "message", VIDEO_SPEC),
    7: ("pmp", "message", PMP_SPEC),
    12: ("bidfloor", "float", None),
}
PUBLISHER_SPEC = {1: ("id", "string", None), 2: ("name", "string", None)}  # proto:220-227
SITE_SPEC = {                                                              # proto:182-199
    1: ("id", "string", None),
    3: ("domain", "string", None),
    12: ("publisher", "message", PUBLISHER_SPEC),
}
GEO_SPEC = {7: ("country", "string", None), 11: ("city", "string", None)}  # proto:302-318
DEVICE_SPEC = {                                                            # proto:267-300
    1: ("ua", "string", None),
    2: ("geo", "message", GEO_SPEC),
    10: ("os", "string", None),
    24: ("ifa", "string", None),
}
USER_SPEC = {1: ("id", "string", None)}                                    # proto:320-331
TIMESTAMP_SPEC = {1: ("seconds", "int64", None), 2: ("nanos", "int32", None)}
BIDREQUEST_SPEC = {                                                        # proto:7-29
    1: ("id", "string", None),
    2: ("imp", "messages", IMP_SPEC),
    3: ("site", "message", SITE_SPEC),
    5: ("device", "message", DEVICE_SPEC),
    6: ("user", "message", USER_SPEC),
    20: ("timestamp", "message", TIMESTAMP_SPEC),
}


# --- encoder (test fixtures; proto3 zero-skipping) ------------------------

def encode_message(msg: dict[str, Any] | None, spec: dict) -> bytes:
    out = bytearray()
    if msg is None:
        return b""
    by_name = {name: (num, kind, sub) for num, (name, kind, sub) in spec.items()}
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
    return bytes(out)


# --- decoder --------------------------------------------------------------

def _defaults(spec: dict) -> dict[str, Any]:
    d: dict[str, Any] = {}
    for name, kind, _sub in spec.values():
        if kind == "string":
            d[name] = ""
        elif kind in ("int32", "int64"):
            d[name] = 0
        elif kind == "float":
            d[name] = 0.0
        elif kind == "message":
            d[name] = None
        elif kind == "messages":
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
            msg[name] = _zig(v & 0xFFFFFFFF, 32) if v < 1 << 32 else _zig(v, 64)
        elif kind == "int64":
            v, pos = decode_varint(buf, pos)
            msg[name] = _zig(v, 64)
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
