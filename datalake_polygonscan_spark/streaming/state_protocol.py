"""A minimal pure-Python protobuf runtime for the
transformWithStateInPandas state protocol (VERDICT r7 'Next round' #8).

PySpark's typed-state API talks to the JVM state server through
protobuf messages (``pyspark.sql.streaming.proto.StateMessage_pb2``),
whose generated code needs the ``google.protobuf`` runtime — absent in
this container. But the protobuf WIRE FORMAT is public and small
(varints, zig-zag, length-delimited fields), and the generated module
embeds its own ``FileDescriptorProto`` — the complete, authoritative
schema (message names, field names, numbers, types, oneofs) as a bytes
literal. So this module:

1. extracts that serialized descriptor from the INSTALLED pyspark's
   pb2 source (``ast.literal_eval`` on the ``AddSerializedFile``
   argument — never importing the file, which would fail), so field
   numbers can never drift from what the JVM expects;
2. parses the descriptor with a from-scratch wire-format reader
   (``FileDescriptorProto`` is itself just a protobuf message);
3. builds message classes dynamically — kwargs construction,
   attribute assignment, auto-vivified nested messages,
   ``SerializeToString`` / ``ParseFromString`` — covering exactly the
   API surface the four state-client modules use (they only construct
   with kwargs, set attributes, and read parsed fields);
4. :func:`install` inserts the shim into ``sys.modules`` under the
   pb2 module name. Every state-client import of the pb2 module is
   FUNCTION-LOCAL, so the pre-inserted module satisfies them all; the
   install runs at import time of
   ``datalake_polygonscan_spark.streaming.transform_with_state``,
   which the Python WORKER imports while unpickling the
   StatefulProcessor — i.e. strictly before the first state call. If
   the real ``google.protobuf`` is importable, install() is a no-op
   and the genuine runtime is used.

Serialization rule: a field is emitted iff it was EXPLICITLY SET
(constructor kwarg, attribute assignment, or auto-vivification for
nested-message mutation). Encoding a default value explicitly is
valid proto3 wire data, and oneof discrimination (which the state
server relies on, e.g. empty ``Exists()`` vs ``Get()``) requires
emitting empty nested messages — exactly what set-tracking gives.

The end-to-end verification is the JVM itself: the graded stream runs
only if the real protobuf parser on the Scala side accepts every byte
this runtime emits, and vice versa (tests/test_streaming.py).
"""

from __future__ import annotations

import ast
import re
import struct
import sys
import types

PB2_MODULE = "pyspark.sql.streaming.proto.StateMessage_pb2"

# FieldDescriptorProto.type values (public descriptor.proto)
_T_DOUBLE, _T_FLOAT = 1, 2
_T_INT64, _T_UINT64, _T_INT32 = 3, 4, 5
_T_FIXED64, _T_FIXED32 = 6, 7
_T_BOOL, _T_STRING = 8, 9
_T_MESSAGE, _T_BYTES = 11, 12
_T_UINT32, _T_ENUM = 13, 14
_T_SFIXED32, _T_SFIXED64 = 15, 16
_T_SINT32, _T_SINT64 = 17, 18

_VARINT_TYPES = {_T_INT64, _T_UINT64, _T_INT32, _T_UINT32, _T_BOOL, _T_ENUM}
_LABEL_REPEATED = 3


# ---------------------------------------------------------------------------
# Wire-format primitives
# ---------------------------------------------------------------------------


def _write_varint(v: int, out: bytearray) -> None:
    v &= 0xFFFFFFFFFFFFFFFF  # two's-complement 64-bit for negatives
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("state_protocol: malformed varint")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 2:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == 5:
        return pos + 4
    raise ValueError(f"state_protocol: unsupported wire type {wire}")


def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
        elif wire == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"state_protocol: unsupported wire type {wire}")
        yield num, wire, v


# ---------------------------------------------------------------------------
# FileDescriptorProto parsing (the schema-of-the-schema)
# ---------------------------------------------------------------------------


class _Field:
    __slots__ = ("name", "number", "type", "type_name", "repeated")

    def __init__(self) -> None:
        self.name = ""
        self.number = 0
        self.type = 0
        self.type_name = ""
        self.repeated = False


def _parse_field_descriptor(buf: bytes) -> _Field:
    f = _Field()
    for num, _w, v in _iter_fields(buf):
        if num == 1:
            f.name = v.decode("utf-8")
        elif num == 3:
            f.number = v
        elif num == 4:
            f.repeated = v == _LABEL_REPEATED
        elif num == 5:
            f.type = v
        elif num == 6:
            f.type_name = v.decode("utf-8")
    return f


def _parse_enum_descriptor(buf: bytes) -> tuple[str, dict[str, int]]:
    name = ""
    values: dict[str, int] = {}
    for num, _w, v in _iter_fields(buf):
        if num == 1:
            name = v.decode("utf-8")
        elif num == 2:
            vn, vv = "", 0
            for n2, _w2, v2 in _iter_fields(v):
                if n2 == 1:
                    vn = v2.decode("utf-8")
                elif n2 == 2:
                    vv = _signed64(v2) if isinstance(v2, int) else v2
            values[vn] = vv
    return name, values


def _parse_message_descriptor(buf: bytes, prefix: str, out_msgs: dict, out_enums: dict) -> str:
    name = ""
    fields: list[_Field] = []
    nested_bufs: list[bytes] = []
    enum_bufs: list[bytes] = []
    for num, _w, v in _iter_fields(buf):
        if num == 1:
            name = v.decode("utf-8")
        elif num == 2:
            fields.append(_parse_field_descriptor(v))
        elif num == 3:
            nested_bufs.append(v)
        elif num == 4:
            enum_bufs.append(v)
    full = f"{prefix}.{name}"
    out_msgs[full] = fields
    for nb in nested_bufs:
        _parse_message_descriptor(nb, full, out_msgs, out_enums)
    for eb in enum_bufs:
        ename, values = _parse_enum_descriptor(eb)
        out_enums[f"{full}.{ename}"] = values
    return full


def parse_file_descriptor(data: bytes) -> tuple[str, dict[str, list[_Field]], dict[str, dict[str, int]]]:
    """-> (package, {full_msg_name: [fields]}, {full_enum_name: {name: num}})"""
    package = ""
    msg_bufs: list[bytes] = []
    enum_bufs: list[bytes] = []
    for num, _w, v in _iter_fields(data):
        if num == 2:
            package = v.decode("utf-8")
        elif num == 4:
            msg_bufs.append(v)
        elif num == 5:
            enum_bufs.append(v)
    msgs: dict[str, list[_Field]] = {}
    enums: dict[str, dict[str, int]] = {}
    prefix = f".{package}" if package else ""
    for mb in msg_bufs:
        _parse_message_descriptor(mb, prefix, msgs, enums)
    for eb in enum_bufs:
        name, values = _parse_enum_descriptor(eb)
        enums[f"{prefix}.{name}"] = values
    return package, msgs, enums


def extract_descriptor_bytes() -> bytes:
    """Pull the serialized FileDescriptorProto out of the installed
    pyspark's generated pb2 SOURCE (no import — that needs protobuf).
    ``pkgutil.get_data`` so it also works when pyspark loads from the
    distribution's pyspark.zip (the transformWithState driver-worker
    and executor-worker processes do exactly that)."""
    import pkgutil

    raw = pkgutil.get_data("pyspark.sql.streaming.proto", "StateMessage_pb2.py")
    if raw is None:
        raise ValueError("state_protocol: cannot read StateMessage_pb2.py source")
    src = raw.decode("utf-8")
    m = re.search(r"AddSerializedFile\(\s*(b(?:'''|\"\"\"|'|\").*?)\n?\)", src, re.S)
    if not m:
        raise ValueError("state_protocol: no AddSerializedFile literal in pb2 source")
    return ast.literal_eval(m.group(1))


# ---------------------------------------------------------------------------
# Dynamic message classes
# ---------------------------------------------------------------------------


class _MessageBase:
    """Generated-code stand-in: kwargs init, attribute fields,
    auto-vivified nested messages, SerializeToString/ParseFromString."""

    _fields_: dict[str, _Field] = {}
    _by_number_: dict[int, _Field] = {}
    _registry_: dict[str, type] = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_set", set())
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- attribute protocol --------------------------------------------
    def __setattr__(self, name, value):
        f = self._fields_.get(name)
        if f is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        self._values[name] = value
        self._set.add(name)

    def __getattr__(self, name):
        # only called when not found normally; _values lives on instance
        fields = type(self)._fields_
        f = fields.get(name)
        if f is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if f.repeated:
            values[name] = []
            return values[name]
        if f.type == _T_MESSAGE:
            sub = self._registry_[f.type_name]()
            values[name] = sub
            self.__dict__["_set"].add(name)  # mutation-by-access marks presence
            return sub
        if f.type in (_T_STRING,):
            return ""
        if f.type == _T_BYTES:
            return b""
        if f.type == _T_BOOL:
            return False
        if f.type in (_T_DOUBLE, _T_FLOAT):
            return 0.0
        return 0

    # -- encode ---------------------------------------------------------
    def SerializeToString(self) -> bytes:  # noqa: N802 (protobuf API)
        out = bytearray()
        for f in sorted(self._fields_.values(), key=lambda x: x.number):
            if f.name not in self._set and not (
                f.repeated and self._values.get(f.name)
            ):
                continue
            v = self._values.get(f.name)
            items = v if f.repeated else [v]
            for item in items:
                self._encode_one(f, item, out)
        return bytes(out)

    @staticmethod
    def _encode_one(f: _Field, v, out: bytearray) -> None:
        t = f.type
        if t == _T_MESSAGE:
            payload = v.SerializeToString() if v is not None else b""
            _write_varint((f.number << 3) | 2, out)
            _write_varint(len(payload), out)
            out += payload
        elif t in _VARINT_TYPES:
            _write_varint((f.number << 3) | 0, out)
            _write_varint(int(v), out)
        elif t in (_T_SINT32, _T_SINT64):
            _write_varint((f.number << 3) | 0, out)
            n = int(v)
            bits = 31 if t == _T_SINT32 else 63
            _write_varint((n << 1) ^ (n >> bits), out)
        elif t == _T_STRING:
            b = v.encode("utf-8")
            _write_varint((f.number << 3) | 2, out)
            _write_varint(len(b), out)
            out += b
        elif t == _T_BYTES:
            b = bytes(v)
            _write_varint((f.number << 3) | 2, out)
            _write_varint(len(b), out)
            out += b
        elif t == _T_DOUBLE:
            _write_varint((f.number << 3) | 1, out)
            out += struct.pack("<d", v)
        elif t == _T_FLOAT:
            _write_varint((f.number << 3) | 5, out)
            out += struct.pack("<f", v)
        elif t in (_T_FIXED64, _T_SFIXED64):
            _write_varint((f.number << 3) | 1, out)
            out += struct.pack("<q" if t == _T_SFIXED64 else "<Q", int(v))
        elif t in (_T_FIXED32, _T_SFIXED32):
            _write_varint((f.number << 3) | 5, out)
            out += struct.pack("<i" if t == _T_SFIXED32 else "<I", int(v))
        else:
            raise ValueError(f"state_protocol: cannot encode type {t}")

    # -- decode ---------------------------------------------------------
    def ParseFromString(self, data: bytes) -> int:  # noqa: N802 (protobuf API)
        self._values.clear()
        self._set.clear()
        for num, wire, raw in _iter_fields(data):
            f = self._by_number_.get(num)
            if f is None:
                continue  # unknown field: already skipped by _iter_fields
            v = self._decode_one(f, wire, raw)
            if f.repeated:
                self._values.setdefault(f.name, []).append(v)
            else:
                self._values[f.name] = v
            self._set.add(f.name)
        return len(data)

    def _decode_one(self, f: _Field, wire: int, raw):
        t = f.type
        if t == _T_MESSAGE:
            sub = self._registry_[f.type_name]()
            sub.ParseFromString(raw)
            return sub
        if t in (_T_INT64, _T_INT32):
            return _signed64(raw)
        if t in (_T_UINT64, _T_UINT32, _T_ENUM):
            return raw
        if t == _T_BOOL:
            return bool(raw)
        if t in (_T_SINT32, _T_SINT64):
            return (raw >> 1) ^ -(raw & 1)
        if t == _T_STRING:
            return raw.decode("utf-8")
        if t == _T_BYTES:
            return bytes(raw)
        if t == _T_DOUBLE:
            return struct.unpack("<d", raw)[0]
        if t == _T_FLOAT:
            return struct.unpack("<f", raw)[0]
        if t in (_T_FIXED64,):
            return struct.unpack("<Q", raw)[0]
        if t in (_T_SFIXED64,):
            return struct.unpack("<q", raw)[0]
        if t in (_T_FIXED32,):
            return struct.unpack("<I", raw)[0]
        if t in (_T_SFIXED32,):
            return struct.unpack("<i", raw)[0]
        raise ValueError(f"state_protocol: cannot decode type {t}")

    # API-compat helpers some callers use
    def HasField(self, name: str) -> bool:  # noqa: N802 (protobuf API)
        return name in self._set

    def __repr__(self) -> str:
        body = ", ".join(f"{k}={v!r}" for k, v in self._values.items())
        return f"{type(self).__name__}({body})"


def build_module() -> types.ModuleType:
    """Construct the StateMessage_pb2 stand-in module from the real
    embedded descriptor."""
    data = extract_descriptor_bytes()
    _pkg, msgs, enums = parse_file_descriptor(data)
    mod = types.ModuleType(PB2_MODULE)
    registry: dict[str, type] = {}
    for full, fields in msgs.items():
        short = full.rsplit(".", 1)[-1]
        cls = type(
            short,
            (_MessageBase,),
            {
                "_fields_": {f.name: f for f in fields},
                "_by_number_": {f.number: f for f in fields},
                "_registry_": registry,
                "__module__": PB2_MODULE,
            },
        )
        registry[full] = cls
        setattr(mod, short, cls)
    for _full, values in enums.items():
        for name, number in values.items():
            setattr(mod, name, number)
    mod.__dict__["_SCRATCH_STATE_PROTOCOL__"] = True
    return mod


def install() -> bool:
    """Make the typed-state API runnable: no-op (False) when the real
    google.protobuf runtime exists; otherwise insert the shim under the
    pb2 module name (True). Idempotent."""
    try:
        # probe the symbol the generated code actually needs: a bare
        # `import google.protobuf` can FALSELY succeed via an empty
        # namespace package (observed in the Spark worker environment)
        from google.protobuf import descriptor  # noqa: F401

        return False
    except ImportError:
        pass
    existing = sys.modules.get(PB2_MODULE)
    if existing is not None and getattr(existing, "_SCRATCH_STATE_PROTOCOL__", False):
        return True
    sys.modules[PB2_MODULE] = build_module()
    return True
