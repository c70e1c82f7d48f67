"""Property-based round-trip tests for the protobuf wire codec.

Strategy generates arbitrary Bidrequest-shaped dicts (including
unicode strings, empty/absent messages, zero scalars, deep nesting);
the invariant is decode(encode(m)) == canonicalize(m), where
canonicalization applies proto3's lossy-by-design rules: scalar zero
values and absent messages are indistinguishable from defaults."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from quacfka_service_spark.proto.wire import (
    BIDREQUEST_SPEC,
    decode_bidrequest,
    decode_message,
    encode_bidrequest,
    encode_varint,
)

text = st.text(min_size=0, max_size=40)
i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# float32-representable values only (the wire is fixed32)
f32 = st.floats(width=32, allow_nan=False, allow_infinity=False)

banner = st.none() | st.fixed_dictionaries({"w": i32, "h": i32})
video = st.none() | st.fixed_dictionaries({"w": i32, "h": i32})
deal = st.fixed_dictionaries({"id": text, "bidfloor": f32})
pmp = st.none() | st.fixed_dictionaries({
    "private_auction": i32,
    "deals": st.lists(deal, max_size=4),
})
imp = st.fixed_dictionaries({
    "id": text, "banner": banner, "video": video, "pmp": pmp, "bidfloor": f32,
})
publisher = st.none() | st.fixed_dictionaries({"id": text, "name": text})
site = st.none() | st.fixed_dictionaries({"id": text, "domain": text, "publisher": publisher})
geo = st.none() | st.fixed_dictionaries({"country": text, "city": text})
device = st.none() | st.fixed_dictionaries({"ua": text, "geo": geo, "os": text, "ifa": text})
user = st.none() | st.fixed_dictionaries({"id": text})
timestamp = st.none() | st.fixed_dictionaries({"seconds": i64, "nanos": i32})

bidrequest = st.fixed_dictionaries({
    "id": text,
    "imp": st.lists(imp, max_size=3),
    "site": site,
    "device": device,
    "user": user,
    "timestamp": timestamp,
})


def _canon(msg, spec):
    """What proto3 round-tripping must preserve: presence + non-zero
    values; zero scalars and absent collections collapse to defaults."""
    if msg is None:
        return None
    out = {}
    for _num, (name, kind, sub) in spec.items():
        v = msg.get(name)
        if kind == "string":
            out[name] = v or ""
        elif kind in ("int32", "int64"):
            out[name] = v or 0
        elif kind == "float":
            out[name] = struct.unpack("<f", struct.pack("<f", v or 0.0))[0]
        elif kind == "message":
            out[name] = _canon(v, sub)
        elif kind == "messages":
            out[name] = [_canon(x, sub) for x in (v or [])]
    return out


@settings(max_examples=300, deadline=None)
@given(bidrequest)
def test_roundtrip(msg):
    assert decode_bidrequest(encode_bidrequest(msg)) == _canon(msg, BIDREQUEST_SPEC)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_decoder_never_reads_past_known_fields(junk):
    """Arbitrary junk after a valid message: the decoder either raises
    cleanly or returns a dict — it must never hang or corrupt known
    fields parsed before the junk."""
    prefix = encode_bidrequest({"id": "stable"})
    try:
        got = decode_bidrequest(prefix + bytes(junk))
    except (ValueError, IndexError, UnicodeDecodeError, struct.error):
        return
    assert got["id"] == "stable" or isinstance(got["id"], str)


@settings(max_examples=200, deadline=None)
@given(i64)
def test_varint_negative_and_large(v):
    spec = {1: ("x", "int64", None)}
    raw = encode_varint((1 << 3) | 0) + encode_varint(v)
    assert decode_message(raw, spec)["x"] == v
