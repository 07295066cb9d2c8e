"""From-scratch SNAPPY raw-format codec (VERDICT r9 'Next round' #3)
— no python-snappy, no native library; implemented from the public
format description (google/snappy format_description.txt), the way
io/roaring.py implements the portable RoaringBitmap format and
operators/deflate.py implements INFLATE.

Snappy raw format:

- preamble: the UNCOMPRESSED length as a little-endian base-128
  varint (7 data bits per byte, high bit = continuation);
- then a sequence of elements, each starting with a tag byte whose
  low 2 bits select the type:

  ==== ==========================================================
  0    literal: ``(tag>>2)+1`` bytes follow; lengths >= 61 store
       ``len-1`` in the next 1-4 little-endian bytes (tag>>2 being
       60, 61, 62, 63)
  1    copy, 1-byte offset: length ``4 + ((tag>>2) & 7)`` (4..11),
       offset ``((tag>>5) << 8) | next byte`` (1..2047)
  2    copy, 2-byte LE offset: length ``(tag>>2) + 1`` (1..64)
  3    copy, 4-byte LE offset: length ``(tag>>2) + 1`` (1..64)
  ==== ==========================================================

  Copies may overlap their own output (offset < length) — decoded
  byte-by-byte, the LZ77 run-extension idiom.

The COMPRESSOR emits any valid stream (greedy 4-byte-hash matcher,
2-byte-offset copies, 64-byte match cap — the shape the reference
encoder produces for its common case); the DECOMPRESSOR handles every
element type, so foreign files from any snappy encoder decode
bit-exact. ``tests/test_avro.py`` pins a hand-composed foreign stream
that uses the 1-byte-offset and overlapping-copy forms our encoder
never emits.

Avro framing (Avro spec "Required Codecs / snappy"): each block's
payload is the raw-snappy compressed data followed by the CRC-32
(big-endian, 4 bytes) of the UNCOMPRESSED bytes — helpers
:func:`avro_snappy_encode` / :func:`avro_snappy_decode` implement the
frame + checksum.
"""

from __future__ import annotations

import struct
import zlib


class SnappyFormatError(ValueError):
    """Malformed snappy stream (truncation, bad offset, length
    mismatch, checksum failure in the Avro frame)."""


# ---------------------------------------------------------------------------
# raw snappy
# ---------------------------------------------------------------------------


def _put_uvarint(n: int, out: bytearray) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _get_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise SnappyFormatError("snappy: truncated length preamble")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise SnappyFormatError("snappy: varint overflow in preamble")


def decompress(buf: bytes) -> bytes:
    """Raw snappy stream -> original bytes; loud on any malformation."""
    want, pos = _get_uvarint(buf, 0)
    out = bytearray()
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 1..4 bytes of len-1
                if pos + extra > n:
                    raise SnappyFormatError("snappy: truncated literal length")
                ln = int.from_bytes(buf[pos:pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise SnappyFormatError("snappy: truncated literal body")
            out += buf[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:
            if pos >= n:
                raise SnappyFormatError("snappy: truncated copy-1")
            length = 4 + ((tag >> 2) & 7)
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:
            if pos + 2 > n:
                raise SnappyFormatError("snappy: truncated copy-2")
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos:pos + 2], "little")
            pos += 2
        else:
            if pos + 4 > n:
                raise SnappyFormatError("snappy: truncated copy-4")
            length = (tag >> 2) + 1
            offset = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyFormatError(
                f"snappy: copy offset {offset} out of range at output "
                f"position {len(out)}")
        if offset >= length:
            start = len(out) - offset
            out += out[start:start + length]
        else:
            # overlapping copy: the run-extension form, byte-by-byte
            start = len(out) - offset
            for i in range(length):
                out.append(out[start + i])
    if len(out) != want:
        raise SnappyFormatError(
            f"snappy: declared {want} uncompressed bytes, produced {len(out)}")
    return bytes(out)


def _emit_literal(data: bytes, start: int, end: int, out: bytearray) -> None:
    while start < end:
        ln = min(end - start, 1 << 32)
        lm1 = ln - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < (1 << 8):
            out.append(60 << 2)
            out.append(lm1)
        elif lm1 < (1 << 16):
            out.append(61 << 2)
            out += lm1.to_bytes(2, "little")
        elif lm1 < (1 << 24):
            out.append(62 << 2)
            out += lm1.to_bytes(3, "little")
        else:
            out.append(63 << 2)
            out += lm1.to_bytes(4, "little")
        out += data[start:start + ln]
        start += ln


def compress(data: bytes) -> bytes:
    """Any-valid-stream greedy encoder: 4-byte hash matches within a
    64 KiB window, emitted as 2-byte-offset copies capped at 64 bytes
    (tag type 2); everything else literals."""
    out = bytearray()
    _put_uvarint(len(data), out)
    n = len(data)
    i = 0
    lit_start = 0
    table: dict[bytes, int] = {}
    while i + 4 <= n:
        key = bytes(data[i:i + 4])
        j = table.get(key)
        table[key] = i
        if j is not None and 0 < i - j <= 0xFFFF:
            length = 4
            maxl = min(64, n - i)
            while length < maxl and data[j + length] == data[i + length]:
                length += 1
            _emit_literal(data, lit_start, i, out)
            out.append(((length - 1) << 2) | 2)
            out += (i - j).to_bytes(2, "little")
            i += length
            lit_start = i
        else:
            i += 1
    _emit_literal(data, lit_start, n, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# Avro block framing: raw snappy + big-endian CRC-32 of the PLAIN bytes
# ---------------------------------------------------------------------------


def avro_snappy_encode(raw: bytes) -> bytes:
    return compress(raw) + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)


def avro_snappy_decode(payload: bytes) -> bytes:
    if len(payload) < 4:
        raise SnappyFormatError("avro snappy block shorter than its CRC")
    raw = decompress(payload[:-4])
    (want,) = struct.unpack(">I", payload[-4:])
    got = zlib.crc32(raw) & 0xFFFFFFFF
    if got != want:
        raise SnappyFormatError(
            f"avro snappy block checksum mismatch: stored {want:#010x}, "
            f"computed {got:#010x}")
    return raw
