"""From-scratch INFLATE — RFC 1951 DEFLATE decoding with zero use of
zlib, completing the in-repo codec family's sixth compression scheme
(DEFLATE itself, previously delegated to the stdlib): stored blocks,
fixed-Huffman blocks and dynamic-Huffman blocks (the code-length code
with 16/17/18 repeats), canonical Huffman table construction, and the
LZ77 back-reference copy with overlapping-run semantics.

``zlib_decompress_scratch`` additionally parses the RFC 1950 zlib
wrapper and VERIFIES the Adler-32 checksum (also from scratch), so a
corrupted stream fails loudly rather than decoding to garbage.

Re-expresses the reference's only decompression dependency surface
(requests' transparent gzip on the PolygonScan HTTP pulls,
walletDataConsumer.py:62) as an in-repo primitive; cross-validated
bit-exactly against stdlib zlib in tests/test_media.py on all three
block types.
"""

from __future__ import annotations

# length codes 257..285: (extra bits, base length)
_LEN_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51,
    59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
)
_LEN_EXTRA = (
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
    4, 5, 5, 5, 5, 0,
)
# distance codes 0..29
_DIST_BASE = (
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
    513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577,
)
_DIST_EXTRA = (
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
    10, 11, 11, 12, 12, 13, 13,
)
#: order the code-length code's own lengths arrive in (RFC 1951 §3.2.7)
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)


class _Bits:
    """LSB-first bit reader over a byte string (DEFLATE bit order)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def take(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("inflate: truncated stream")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _canonical(lengths: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman decode table: (code_length, code_value) ->
    symbol, per RFC 1951 §3.2.2 (codes of each length are consecutive,
    ordered by symbol)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    for ln in range(1, max(lengths, default=0) + 1):
        for sym, l in enumerate(lengths):
            if l == ln:
                table[(ln, code)] = sym
                code += 1
        code <<= 1
    return table


def _decode_sym(bits: _Bits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 16):
        code = (code << 1) | bits.take(1)  # Huffman codes read MSB-first
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("inflate: bad Huffman code")


_FIXED_LIT = _canonical(
    [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
)
_FIXED_DIST = _canonical([5] * 30)


def inflate(data: bytes, pos: int = 0) -> bytes:
    """Decode a raw RFC 1951 DEFLATE stream starting at byte ``pos``."""
    bits = _Bits(data, pos)
    out = bytearray()
    while True:
        bfinal = bits.take(1)
        btype = bits.take(2)
        if btype == 0:  # stored
            bits.align()
            b = bits.byte
            if b + 4 > len(data):
                raise ValueError("inflate: truncated stored-block header")
            ln = data[b] | (data[b + 1] << 8)
            nlen = data[b + 2] | (data[b + 3] << 8)
            if ln ^ 0xFFFF != nlen:
                raise ValueError("inflate: stored-block LEN/NLEN mismatch")
            if b + 4 + ln > len(data):
                raise ValueError("inflate: truncated stored block")
            out += data[b + 4 : b + 4 + ln]
            bits.byte = b + 4 + ln
        else:
            if btype == 1:  # fixed Huffman
                lit_t, dist_t = _FIXED_LIT, _FIXED_DIST
            elif btype == 2:  # dynamic Huffman
                hlit = bits.take(5) + 257
                hdist = bits.take(5) + 1
                hclen = bits.take(4) + 4
                clc_len = [0] * 19
                for i in range(hclen):
                    clc_len[_CLC_ORDER[i]] = bits.take(3)
                clc = _canonical(clc_len)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    s = _decode_sym(bits, clc)
                    if s < 16:
                        lens.append(s)
                    elif s == 16:
                        lens += [lens[-1]] * (3 + bits.take(2))
                    elif s == 17:
                        lens += [0] * (3 + bits.take(3))
                    else:
                        lens += [0] * (11 + bits.take(7))
                lit_t = _canonical(lens[:hlit])
                dist_t = _canonical(lens[hlit:])
            else:
                raise ValueError("inflate: reserved block type")
            while True:
                sym = _decode_sym(bits, lit_t)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    i = sym - 257
                    length = _LEN_BASE[i] + bits.take(_LEN_EXTRA[i])
                    d = _decode_sym(bits, dist_t)
                    dist = _DIST_BASE[d] + bits.take(_DIST_EXTRA[d])
                    if dist > len(out):
                        raise ValueError("inflate: distance beyond window")
                    # overlapping copies are the RLE idiom (dist < length)
                    start = len(out) - dist
                    for j in range(length):
                        out.append(out[start + j])
        if bfinal:
            return bytes(out)


def adler32_scratch(data: bytes) -> int:
    a, b = 1, 0
    for byte in data:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    return (b << 16) | a


def zlib_decompress_scratch(data: bytes) -> bytes:
    """RFC 1950 wrapper: validate the CMF/FLG header, inflate, VERIFY
    the trailing Adler-32 (computed from scratch)."""
    if len(data) < 6:
        raise ValueError("zlib: truncated")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib: not deflate")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib: bad header check")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionary unsupported")
    out = inflate(data, 2)
    want = int.from_bytes(data[-4:], "big")
    got = adler32_scratch(out)
    if want != got:
        raise ValueError(f"zlib: adler32 mismatch ({got:#x} != {want:#x})")
    return out


# ---------------------------------------------------------------------------
# From-scratch DEFLATE *encoding* (RFC 1951 §3.2.3-3.2.6) — the write
# side of the codec family, used by the Avro container writer
# (io/avro.py). Two strategies:
#
# - ``deflate_stored``  — BTYPE=0 stored blocks: byte-aligned copies,
#   zero compression but zero per-byte Python work (memoryview slices),
#   the fast path when the payload is already dense (parquet pages,
#   media bytes).
# - ``deflate_fixed``   — BTYPE=1 fixed-Huffman with greedy hash-chain
#   LZ77 (3..258-byte matches, 32 KiB window): real compression using
#   only the RFC's fixed code tables, no dynamic-table pass. Pure
#   Python, so it trades speed for self-containedness — at cluster
#   scale the JVM-side columnar codecs carry the hot path and this
#   remains the container-format tier.
#
# Both emit streams that stdlib zlib.decompress(raw) accepts and that
# ``inflate`` above round-trips bit-exactly (tests/test_avro.py).
# ---------------------------------------------------------------------------


def deflate_stored(data: bytes) -> bytes:
    """Encode ``data`` as RFC 1951 stored (BTYPE=0) blocks."""
    out = bytearray()
    view = memoryview(data)
    n = len(data)
    pos = 0
    while True:
        chunk = view[pos : pos + 0xFFFF]
        last = pos + len(chunk) >= n
        out.append(0x01 if last else 0x00)  # BFINAL | BTYPE=00 (aligned)
        ln = len(chunk)
        out += bytes((ln & 0xFF, ln >> 8, (ln ^ 0xFFFF) & 0xFF, (ln ^ 0xFFFF) >> 8))
        out += chunk
        pos += ln
        if last:
            return bytes(out)


class _BitWriter:
    """LSB-first bit accumulator (DEFLATE's bit order: Huffman codes
    are written MSB-first *within* the code, everything packed
    LSB-first into bytes — RFC 1951 §3.1.1)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, width: int) -> None:  # LSB-first payload bits
        self.acc |= value << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, width: int) -> None:  # Huffman code, MSB-first
        rev = 0
        for _ in range(width):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.put(rev, width)

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _fixed_lit_code(sym: int) -> tuple[int, int]:
    """RFC 1951 §3.2.6 fixed literal/length table: (code, width)."""
    if sym <= 143:
        return 0x30 + sym, 8
    if sym <= 255:
        return 0x190 + (sym - 144), 9
    if sym <= 279:
        return sym - 256, 7
    return 0xC0 + (sym - 280), 8


def _length_symbol(length: int) -> tuple[int, int, int]:
    """(symbol 257..285, extra-bit value, extra-bit count) for a match
    length in 3..258."""
    for i in range(len(_LEN_BASE) - 1, -1, -1):
        if length >= _LEN_BASE[i]:
            return 257 + i, length - _LEN_BASE[i], _LEN_EXTRA[i]
    raise ValueError(f"deflate: bad match length {length}")


def _dist_symbol(dist: int) -> tuple[int, int, int]:
    """(symbol 0..29, extra-bit value, extra-bit count) for a match
    distance in 1..32768."""
    for i in range(len(_DIST_BASE) - 1, -1, -1):
        if dist >= _DIST_BASE[i]:
            return i, dist - _DIST_BASE[i], _DIST_EXTRA[i]
    raise ValueError(f"deflate: bad match distance {dist}")


def deflate_fixed(data: bytes, max_chain: int = 32) -> bytes:
    """Encode ``data`` as ONE fixed-Huffman (BTYPE=1) DEFLATE block
    with greedy hash-chain LZ77: 3-byte-hash chains, newest-first probe
    capped at ``max_chain``, matches up to 258 bytes within the 32 KiB
    window. Greedy (no lazy matching) — a couple % worse than zlib -6,
    two orders of magnitude less code."""
    w = _BitWriter()
    w.put(1, 1)  # BFINAL
    w.put(1, 2)  # BTYPE=01 fixed
    n = len(data)
    head: dict[int, list[int]] = {}
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 3 <= n:
            key = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
            chain = head.get(key)
            if chain:
                lo = i - 32768
                probes = 0
                for j in reversed(chain):
                    if j < lo or probes >= max_chain:
                        break
                    probes += 1
                    # extend the match
                    length = 0
                    maxl = min(258, n - i)
                    while length < maxl and data[j + length] == data[i + length]:
                        length += 1
                    if length > best_len:
                        best_len, best_dist = length, i - j
                        if length >= 258:
                            break
            chain = head.setdefault(key, [])
            chain.append(i)
            if len(chain) > 2 * max_chain:  # bound memory per key
                del chain[: len(chain) - max_chain]
        if best_len >= 3:
            sym, extra, nb = _length_symbol(best_len)
            code, width = _fixed_lit_code(sym)
            w.put_code(code, width)
            if nb:
                w.put(extra, nb)
            dsym, dextra, dnb = _dist_symbol(best_dist)
            w.put_code(dsym, 5)  # fixed distance codes: 5-bit, values 0..29
            if dnb:
                w.put(dextra, dnb)
            # index the skipped positions so later matches can find them
            end = min(i + best_len, n - 2)
            for p in range(i + 1, end):
                key2 = data[p] | (data[p + 1] << 8) | (data[p + 2] << 16)
                head.setdefault(key2, []).append(p)
            i += best_len
        else:
            code, width = _fixed_lit_code(data[i])
            w.put_code(code, width)
            i += 1
    code, width = _fixed_lit_code(256)  # end of block
    w.put_code(code, width)
    return w.finish()
