"""From-scratch 64-bit RoaringBitmap codec + Z85 + the Delta Lake
DELETION VECTOR file layout — everything a reader needs to apply
``deletionVectors`` tables from the public formats alone:

- RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec,
  "portable" layout): a 32-bit roaring bitmap is
  ``cookie u32 LE`` (12346 = no run containers, the only form this
  codec emits; 12347 = with run containers, gated loudly on read),
  ``container count u32``, a descriptive header of (key u16,
  cardinality-1 u16) pairs, an offset header of u32 byte offsets, then
  the containers: ARRAY (cardinality <= 4096: sorted u16 values) or
  BITSET (8 KiB bitmap). The 64-bit "portable" extension prefixes a
  u64 LE count of 32-bit buckets, each bucket being
  ``key u32 LE`` (the high 32 bits) + one 32-bit bitmap.

- Delta's RoaringBitmapArray wraps that with a 4-byte LE magic
  1681511377 (delta-io PROTOCOL.md "Deletion Vector Format").

- The DV FILE layout (same doc): 1 version byte (1), then each vector
  at its ``offset``: u32 BE size, the magic+bitmap bytes, u32 BE
  CRC-32 of those bytes. ``storageType`` 'u' = UUID-named file
  relative to the table (pathOrInlineDv = optional random prefix +
  Z85-encoded 16-byte UUID), 'p' = absolute path, 'i' = the
  magic+bitmap bytes themselves Z85-encoded inline.

- Z85 (the 0MQ spec, 4 bytes -> 5 chars; not in this stdlib).
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib

_MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_ARRAY_MAX = 4096


class RoaringFormatError(ValueError):
    """Serialized bitmap shape this codec does not implement."""


# ---------------------------------------------------------------------------
# Z85
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            n = n * 85 + _Z85_DECODE[c]
        out += struct.pack(">I", n)
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap (portable, no run containers)
# ---------------------------------------------------------------------------


def _serialize32(values: list[int]) -> bytes:
    """values: sorted distinct u32."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<II", _COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: absolute byte offsets of each container
    data_start = len(out) + 4 * len(keys)
    bodies = []
    off = data_start
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
        bodies.append(body)
        out += struct.pack("<I", off)
        off += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def _deserialize32(buf: bytes, pos: int) -> tuple[list[int], int]:
    (cookie,) = struct.unpack_from("<I", buf, pos)
    if cookie == _COOKIE_RUN or (cookie & 0xFFFF) == _COOKIE_RUN:
        raise RoaringFormatError(
            "run-container roaring serialization not implemented"
        )
    if cookie != _COOKIE_NO_RUN:
        raise RoaringFormatError(f"bad roaring cookie {cookie}")
    pos += 4
    (n,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    heads = []
    for _ in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        heads.append((k, cm1 + 1))
    pos += 4 * n  # offset header (containers follow in order anyway)
    values: list[int] = []
    for k, card in heads:
        base = k << 16
        if card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base | v for v in vals)
        else:
            bits = buf[pos:pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    values.append(base | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
    return values, pos


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's portable form, with magic)
# ---------------------------------------------------------------------------


def serialize_rbm64(values: list[int]) -> bytes:
    """Sorted-or-not distinct u64 -> Delta RoaringBitmapArray bytes
    (magic + portable 64-bit layout)."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Iq", _MAGIC, len(buckets)))
    for hi in sorted(buckets):
        out += struct.pack("<I", hi)
        out += _serialize32(buckets[hi])
    return bytes(out)


def deserialize_rbm64(buf: bytes) -> list[int]:
    magic, n = struct.unpack_from("<Iq", buf, 0)
    if magic != _MAGIC:
        raise RoaringFormatError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    values: list[int] = []
    for _ in range(n):
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _deserialize32(buf, pos)
        values.extend((hi << 32) | v for v in lows)
    return values


# ---------------------------------------------------------------------------
# Delta deletion vector files
# ---------------------------------------------------------------------------


def write_dv_file(path: str, dvs: list[list[int]]) -> list[dict]:
    """Write one DV file holding each vector at its own offset.
    Returns the descriptor fields per vector: {offset, sizeInBytes,
    cardinality} (storageType/pathOrInlineDv are the caller's)."""
    out = bytearray(b"\x01")  # format version
    descs = []
    for values in dvs:
        body = serialize_rbm64(values)
        descs.append({
            "offset": len(out),
            "sizeInBytes": len(body),
            "cardinality": len(set(values)),
        })
        out += struct.pack(">I", len(body))
        out += body
        out += struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with open(path, "wb") as f:
        f.write(out)
    return descs


def read_dv(descriptor: dict, table_path: str) -> list[int]:
    """Resolve one ``deletionVector`` descriptor -> deleted row
    positions. Implements storageType 'u' (UUID-named file relative to
    the table), 'p' (absolute path) and 'i' (inline Z85)."""
    import os

    st = descriptor["storageType"]
    if st == "i":
        body = z85_decode(descriptor["pathOrInlineDv"])
        return deserialize_rbm64(body)
    if st == "p":
        fpath = descriptor["pathOrInlineDv"]
    elif st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, uuid_part = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(uuid_part))
        fpath = os.path.join(
            table_path, *( [prefix] if prefix else [] ),
            f"deletion_vector_{u}.bin",
        )
    else:
        raise RoaringFormatError(f"unknown DV storageType {st!r}")
    data = open(fpath, "rb").read()
    if data[0] != 1:
        raise RoaringFormatError(f"DV file format version {data[0]}")
    off = int(descriptor["offset"])
    (size,) = struct.unpack_from(">I", data, off)
    body = data[off + 4:off + 4 + size]
    (crc,) = struct.unpack_from(">I", data, off + 4 + size)
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise RoaringFormatError("DV checksum mismatch")
    if int(descriptor.get("sizeInBytes") or size) != size:
        raise RoaringFormatError("DV sizeInBytes mismatch")
    return deserialize_rbm64(body)


def make_uuid_dv_name(u: _uuid.UUID, prefix: str = "") -> str:
    """Compose the 'u' storageType pathOrInlineDv for a UUID."""
    return prefix + z85_encode(u.bytes)
