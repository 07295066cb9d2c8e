"""Apache Hudi LOG FILE codec (the Merge-on-Read delta format), from
the public tech spec (hudi.apache.org/tech-specs "Log File Format") —
no hudi runtime. Write side exists only to compose spec-faithful MoR
fixtures; the read side is what `io/hudi_reader.py` merges at scan
time.

A ``.log`` file is a sequence of BLOCKS::

    magic           6 bytes  b"#HUDI#"
    block_length    int64 BE  bytes after this field through total_len
    format_version  int32 BE  (1)
    block_type      int32 BE  (0 command / 1 delete / 2 corrupt /
                               3 avro data / 4 hfile / 5 parquet)
    header          int32 count, then per entry:
                      int32 key ordinal, int32 byte length, utf8 bytes
    content_length  int64 BE
    content         bytes
    footer          same shape as header
    total_length    int64 BE  whole block incl. magic (reverse seek)

Header key ordinals (HeaderMetadataType): 0 INSTANT_TIME,
1 TARGET_INSTANT_TIME, 2 SCHEMA, 3 COMMAND_BLOCK_TYPE.

AVRO DATA BLOCK content: int32 format version (3), int32 record
count, then per record int32 size + one bare Avro-binary record in
the SCHEMA header's writer schema (encoded/decoded by the in-repo
from-scratch Avro layer, io/avro.py). Records carry the table schema
including the ``_hoodie_*`` meta columns; a record whose
``_hoodie_is_deleted`` field is true is a DELETE marker during merge
(Hudi's documented soft-delete convention — the payload-level delete
path, which is also how this reader expresses deletes; opaque
kryo-serialized DELETE blocks are a capability gate).

COMMAND BLOCK: content empty; COMMAND_BLOCK_TYPE "0" = ROLLBACK — all
earlier blocks in the SAME log file whose INSTANT_TIME equals the
command's TARGET_INSTANT_TIME are invalidated (Hudi's log-level
rollback mechanism for failed deltacommits).

Capability gates: unknown/unsupported block types (hfile, parquet,
delete, corrupt) and format versions raise ``HudiLogFormatError``
loudly — the S47/S48 reader-capability discipline.
"""

from __future__ import annotations

import struct

_MAGIC = b"#HUDI#"
_LOG_FORMAT_VERSION = 1
_AVRO_CONTENT_VERSION = 3

#: block types (tech-specs block-type table)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

#: header key ordinals (HeaderMetadataType)
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2
COMMAND_BLOCK_TYPE = 3


class HudiLogFormatError(RuntimeError):
    """Log block shape this reader does not implement."""


def _enc_meta_map(meta: dict[int, str]) -> bytes:
    out = bytearray(struct.pack(">i", len(meta)))
    for k, v in sorted(meta.items()):
        vb = v.encode("utf-8")
        out += struct.pack(">ii", k, len(vb))
        out += vb
    return bytes(out)


def _dec_meta_map(buf: bytes, pos: int) -> tuple[dict[int, str], int]:
    (n,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    meta = {}
    for _ in range(n):
        k, ln = struct.unpack_from(">ii", buf, pos)
        pos += 8
        meta[k] = buf[pos:pos + ln].decode("utf-8")
        pos += ln
    return meta, pos


def write_log_block(block_type: int, header: dict[int, str],
                    content: bytes) -> bytes:
    hdr = _enc_meta_map(header)
    ftr = _enc_meta_map({})
    # bytes after the block_length field through total_length inclusive
    body = (
        struct.pack(">ii", _LOG_FORMAT_VERSION, block_type)
        + hdr
        + struct.pack(">q", len(content))
        + content
        + ftr
    )
    block_len = len(body) + 8  # + the trailing total_length field
    total_len = len(_MAGIC) + 8 + block_len
    return _MAGIC + struct.pack(">q", block_len) + body + struct.pack(">q", total_len)


def write_avro_data_block(instant: str, schema_json: str, rows: list) -> bytes:
    from datalake_polygonscan_spark.io.avro import encode_datum

    content = bytearray(struct.pack(">ii", _AVRO_CONTENT_VERSION, len(rows)))
    for r in rows:
        rb = encode_datum(schema_json, r)
        content += struct.pack(">i", len(rb))
        content += rb
    return write_log_block(
        AVRO_DATA_BLOCK,
        {INSTANT_TIME: instant, SCHEMA: schema_json},
        bytes(content),
    )


def write_rollback_block(instant: str, target_instant: str) -> bytes:
    return write_log_block(
        COMMAND_BLOCK,
        {INSTANT_TIME: instant, TARGET_INSTANT_TIME: target_instant,
         COMMAND_BLOCK_TYPE: "0"},
        b"",
    )


def parse_log_blocks(data: bytes, path: str = "<log>") -> list[dict]:
    """-> raw blocks [{type, header, content}] in file order. Loud on
    torn tails, bad magic, unknown versions."""
    blocks = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 6] != _MAGIC:
            raise HudiLogFormatError(f"{path}: bad magic at {pos}")
        pos += 6
        (block_len,) = struct.unpack_from(">q", data, pos)
        pos += 8
        end = pos + block_len
        if end > n:
            raise HudiLogFormatError(f"{path}: torn block at {pos}")
        ver, btype = struct.unpack_from(">ii", data, pos)
        pos += 8
        if ver != _LOG_FORMAT_VERSION:
            raise HudiLogFormatError(f"{path}: log format version {ver}")
        header, pos = _dec_meta_map(data, pos)
        (clen,) = struct.unpack_from(">q", data, pos)
        pos += 8
        content = data[pos:pos + clen]
        pos += clen
        _footer, pos = _dec_meta_map(data, pos)
        (total_len,) = struct.unpack_from(">q", data, pos)
        pos += 8
        if pos != end or total_len != block_len + 14:
            raise HudiLogFormatError(f"{path}: length mismatch at block end {pos}")
        blocks.append({"type": btype, "header": header, "content": bytes(content)})
    return blocks


def scan_log_block_headers(path: str) -> list[tuple[int, dict[int, str]]]:
    """Frame-walk one log file WITHOUT decoding content: -> [(type,
    header)] per block. Content bytes are seeked over, so this is
    O(blocks) reads — cheap enough for driver-side capability gating
    and slice planning (the same frame walk every Hudi planner does)."""
    out = []
    with open(path, "rb") as f:
        while True:
            magic = f.read(6)
            if not magic:
                return out
            if magic != _MAGIC:
                raise HudiLogFormatError(f"{path}: bad magic at {f.tell() - 6}")
            (block_len,) = struct.unpack(">q", f.read(8))
            start = f.tell()
            ver, btype = struct.unpack(">ii", f.read(8))
            if ver != _LOG_FORMAT_VERSION:
                raise HudiLogFormatError(f"{path}: log format version {ver}")
            (n_hdr,) = struct.unpack(">i", f.read(4))
            header: dict[int, str] = {}
            for _ in range(n_hdr):
                k, ln = struct.unpack(">ii", f.read(8))
                header[k] = f.read(ln).decode("utf-8")
            out.append((btype, header))
            f.seek(start + block_len)  # skip content + footer + total_len


def read_log_records(data: bytes, completed: set[str],
                     path: str = "<log>") -> list[tuple[str, int, int, dict]]:
    """Decode one log file's effective upsert stream ->
    [(instant, block_idx, record_idx, record_dict)].

    - blocks whose INSTANT_TIME never completed are invisible (the
      deltacommit atomicity rule, same as inflight base files);
    - a later ROLLBACK command block invalidates earlier blocks of its
      TARGET_INSTANT_TIME within this log file;
    - unsupported block types raise.
    """
    from datalake_polygonscan_spark.io.avro import datum_decoder

    blocks = parse_log_blocks(data, path)
    rolled_back: set[str] = set()
    for b in blocks:
        if b["type"] == COMMAND_BLOCK:
            if b["header"].get(COMMAND_BLOCK_TYPE) != "0":
                raise HudiLogFormatError(
                    f"{path}: unsupported command block type "
                    f"{b['header'].get(COMMAND_BLOCK_TYPE)!r}"
                )
            tgt = b["header"].get(TARGET_INSTANT_TIME)
            if tgt:
                rolled_back.add(tgt)
        elif b["type"] == AVRO_DATA_BLOCK:
            pass
        else:
            raise HudiLogFormatError(
                f"{path}: unsupported block type {b['type']} "
                "(this reader implements avro data + rollback command blocks)"
            )
    out: list[tuple[str, int, int, dict]] = []
    for bi, b in enumerate(blocks):
        if b["type"] != AVRO_DATA_BLOCK:
            continue
        instant = b["header"].get(INSTANT_TIME, "")
        if instant in rolled_back or instant not in completed:
            continue
        schema_json = b["header"][SCHEMA]
        dec = datum_decoder(schema_json)
        content = b["content"]
        cver, cnt = struct.unpack_from(">ii", content, 0)
        if cver != _AVRO_CONTENT_VERSION:
            raise HudiLogFormatError(f"{path}: avro block content version {cver}")
        pos = 8
        for ri in range(cnt):
            (sz,) = struct.unpack_from(">i", content, pos)
            pos += 4
            row, used = dec(content, pos)
            if used - pos != sz:
                raise HudiLogFormatError(
                    f"{path}: record size mismatch ({used - pos} != {sz})"
                )
            pos = used
            out.append((instant, bi, ri, row))
    return out
