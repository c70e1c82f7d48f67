"""Self-hosted protobuf descriptor-set generation.

The JVM decode path (``from_protobuf``, proto/decode.py) needs a
compiled ``FileDescriptorSet`` — normally ``protoc --descriptor_set_out``
over /root/reference/proto/bidrequest.proto.  Neither protoc nor the
google.protobuf python package exists in this container, but a
descriptor set is just a protobuf message (descriptor.proto, a public
well-known schema), and this repo owns a proto3 wire codec — so the
descriptor set is ENCODED WITH OUR OWN CODEC from the same wire specs
everything else derives from (wire.py mirrors bidrequest.proto
field-for-field).  One source of truth end-to-end: specs -> Spark
schema, fixtures, python decoders, AND the JVM descriptor.

The emitted file declares message ``spark.bidreq.Bidrequest`` with a
package-local ``Timestamp`` (seconds=1 int64, nanos=2 int32 — wire-
compatible with google.protobuf.Timestamp, avoiding a well-known-type
dependency file in the set).

tests/test_jvm_decode.py round-trips payloads through
``from_protobuf`` against this descriptor when the spark-protobuf jar
is on the classpath, and skips cleanly when it is not — the prod path
is one ``--packages org.apache.spark:spark-protobuf_2.13`` away.
"""

from __future__ import annotations

from .wire import encode_message

# descriptor.proto (public, well-known) — only the fields we emit.
# https://github.com/protocolbuffers/protobuf/blob/main/src/google/protobuf/descriptor.proto
_FIELD_DESC_SPEC = {
    1: ("name", "string", None),
    3: ("number", "int32", None),
    4: ("label", "int32", None),      # enum Label
    5: ("type", "int32", None),       # enum Type
    6: ("type_name", "string", None),
}
_MESSAGE_DESC_SPEC = {
    1: ("name", "string", None),
    2: ("field", "messages", _FIELD_DESC_SPEC),
}
_FILE_DESC_SPEC = {
    1: ("name", "string", None),
    2: ("package", "string", None),
    4: ("message_type", "messages", _MESSAGE_DESC_SPEC),
    12: ("syntax", "string", None),
}
FILE_DESC_SET_SPEC = {1: ("file", "messages", _FILE_DESC_SPEC)}

# FieldDescriptorProto.Type values (descriptor.proto enum Type)
_TYPE_FLOAT = 2
_TYPE_INT64 = 3
_TYPE_INT32 = 5
_TYPE_STRING = 9
_TYPE_MESSAGE = 11
# FieldDescriptorProto.Label values
_LABEL_OPTIONAL = 1
_LABEL_REPEATED = 3

_KIND_TO_TYPE = {
    "string": (_TYPE_STRING, _LABEL_OPTIONAL),
    "int32": (_TYPE_INT32, _LABEL_OPTIONAL),
    "int64": (_TYPE_INT64, _LABEL_OPTIONAL),
    "float": (_TYPE_FLOAT, _LABEL_OPTIONAL),
    "strings": (_TYPE_STRING, _LABEL_REPEATED),
    "int32s": (_TYPE_INT32, _LABEL_REPEATED),
    "message": (_TYPE_MESSAGE, _LABEL_OPTIONAL),
    "messages": (_TYPE_MESSAGE, _LABEL_REPEATED),
}

PACKAGE = "spark.bidreq"


def _messages_from_spec(spec: dict, name: str, out: list[dict], seen: dict) -> str:
    """Emit one DescriptorProto per distinct spec (flat, top-level —
    nesting is a namespacing choice, not a wire-format one).  Returns
    the fully-qualified type name.  Shared specs (e.g. site.publisher
    and app.publisher both point at PUBLISHER_SPEC) dedupe by identity;
    distinct specs that collide on capitalized field name get a numeric
    suffix."""
    if id(spec) in seen:
        return seen[id(spec)]
    used = {m["name"] for m in out}
    base = name
    n = 2
    while name in used:
        name = f"{base}{n}"
        n += 1
    fq = f".{PACKAGE}.{name}"
    seen[id(spec)] = fq
    # reserve the name before recursing (children may collide with us)
    placeholder = {"name": name, "field": []}
    out.append(placeholder)
    fields = []
    for num in sorted(spec):
        fld_name, kind, sub = spec[num]
        typ, label = _KIND_TO_TYPE[kind]
        f = {"name": fld_name, "number": num, "label": label, "type": typ}
        if sub is not None:
            f["type_name"] = _messages_from_spec(sub, fld_name.capitalize(), out, seen)
        fields.append(f)
    placeholder["field"] = fields
    return fq


def build_descriptor_set(spec: dict, root_message: str = "Bidrequest") -> bytes:
    """Wire spec tree -> serialized FileDescriptorSet bytes."""
    messages: list[dict] = []
    _messages_from_spec(spec, root_message, messages, {})
    fds = {
        "file": [
            {
                "name": "bidrequest.proto",
                "package": PACKAGE,
                "message_type": messages,
                "syntax": "proto3",
            }
        ]
    }
    return encode_message(fds, FILE_DESC_SET_SPEC)


def write_descriptor_set(path: str, spec: dict | None = None) -> str:
    """Write the Bidrequest descriptor set to ``path`` (for
    ``from_protobuf(..., descFilePath=path)``)."""
    from .wire import BIDREQUEST_SPEC

    raw = build_descriptor_set(spec if spec is not None else BIDREQUEST_SPEC)
    with open(path, "wb") as f:
        f.write(raw)
    return path


def message_name() -> str:
    """The message name from_protobuf should be given (package-qualified)."""
    return f"{PACKAGE}.Bidrequest"
