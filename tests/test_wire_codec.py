"""Unit tests for the pure-Python protobuf wire codec (proto/wire.py).

Covers proto3 semantics the pipeline depends on (SURVEY.md §1.2):
zero-value skipping, message presence vs None, repeated fields,
unknown-field skipping, and the reference's byte framing (S2 confluent
prefix, S3 trailing LE timestamp)."""

from __future__ import annotations

import struct

from quacfka_service_spark.proto.wire import (
    BIDREQUEST_SPEC,
    append_ts_suffix,
    decode_bidrequest,
    decode_message,
    decode_varint,
    encode_bidrequest,
    encode_message,
    encode_varint,
    split_ts_suffix,
    strip_confluent_prefix,
)

FULL_MSG = {
    "id": "req-1",
    "imp": [
        {
            "id": "imp-1",
            "banner": {"w": 300, "h": 250},
            "video": None,
            "pmp": {"private_auction": 1, "deals": [
                {"id": "deal-1", "bidfloor": 1.5},
                {"id": "deal-2", "bidfloor": 0.0},
            ]},
            "bidfloor": 2.25,
        }
    ],
    "site": {"id": "s1", "domain": "d.example.com",
             "publisher": {"id": "pub1", "name": "p"}},
    "device": {"ua": "ua/1", "geo": {"country": "C1", "city": "city1"},
               "os": "android", "ifa": "ifa-1"},
    "user": {"id": "u-1"},
    "timestamp": {"seconds": 1700000000, "nanos": 123456789},
}


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 1 << 31, (1 << 63) - 1]:
        raw = encode_varint(v)
        got, pos = decode_varint(raw, 0)
        assert got == v and pos == len(raw)


def test_negative_int32_ten_byte_encoding():
    # proto3 encodes negative ints as 64-bit two's complement varints
    raw = encode_message({"w": -1}, {2: ("w", "int32", None)})
    got = decode_message(raw, {2: ("w", "int32", None)})
    assert got["w"] == -1


def _subset(got, want):
    """Recursive: every key in `want` appears in `got` with equal value.
    Decoded messages are FULL-width (all 22 messages' fields defaulted),
    so equality checks are subset-based since round 2."""
    if isinstance(want, dict):
        assert isinstance(got, dict)
        for k, v in want.items():
            _subset(got[k], v)
    elif isinstance(want, list):
        assert isinstance(got, list) and len(got) == len(want)
        for g, w in zip(got, want):
            _subset(g, w)
    else:
        assert got == want


def test_full_roundtrip():
    got = decode_bidrequest(encode_bidrequest(FULL_MSG))
    assert got["id"] == "req-1"
    _subset(got["site"], FULL_MSG["site"])
    _subset(got["user"], {"id": "u-1"})
    assert got["timestamp"] == FULL_MSG["timestamp"]
    imp = got["imp"][0]
    _subset(imp["banner"], {"w": 300, "h": 250})
    assert imp["video"] is None  # absent message -> None
    _subset(imp["pmp"]["deals"][0], {"id": "deal-1", "bidfloor": 1.5})
    # 0.0 bidfloor was zero-skipped on the wire, restored as default
    _subset(imp["pmp"]["deals"][1], {"id": "deal-2", "bidfloor": 0.0})
    assert abs(imp["bidfloor"] - 2.25) < 1e-9


def test_proto3_zero_values_not_on_wire_but_defaulted():
    msg = {"id": "", "user": {"id": ""}, "timestamp": {"seconds": 0, "nanos": 0}}
    raw = encode_bidrequest(msg)
    got = decode_bidrequest(raw)
    assert got["id"] == ""            # scalar zero: skipped, defaulted
    _subset(got["user"], {"id": ""})  # present-but-empty message kept
    assert got["site"] is None        # absent message -> None
    assert got["imp"] == []           # absent repeated -> empty


def test_empty_message_presence():
    # user set but all-default: emitted as zero-length frame (Go nil
    # vs zero-pointer distinction, gen/bidrequest.pb.go:29-32)
    raw = encode_bidrequest({"user": {"id": ""}})
    assert len(raw) > 0
    _subset(decode_bidrequest(raw)["user"], {"id": ""})
    assert decode_bidrequest(b"")["user"] is None


def test_unknown_fields_skipped():
    # splice in unknown fields of each wire type between known ones
    known = encode_bidrequest({"id": "x"})
    unknown = (
        encode_varint((99 << 3) | 0) + encode_varint(7)        # varint
        + encode_varint((98 << 3) | 1) + struct.pack("<d", 1.0)  # i64
        + encode_varint((97 << 3) | 2) + encode_varint(3) + b"abc"  # len
        + encode_varint((96 << 3) | 5) + struct.pack("<f", 2.0)  # i32
    )
    got = decode_bidrequest(unknown + known)
    assert got["id"] == "x"


def test_framing_helpers():
    payload = encode_bidrequest(FULL_MSG)
    framed = append_ts_suffix(b"\x00\x00\x00\x00\x00\x01" + payload, 1700000000123)
    body, ms = split_ts_suffix(strip_confluent_prefix(framed))
    assert ms == 1700000000123
    assert decode_bidrequest(body)["id"] == "req-1"


def test_spec_matches_reference_field_numbers():
    # spot-check against proto/bidrequest.proto field numbers
    names = {n: (name, kind) for n, (name, kind, _) in BIDREQUEST_SPEC.items()}
    assert names[1] == ("id", "string")
    assert names[2] == ("imp", "messages")
    assert names[20] == ("timestamp", "message")
