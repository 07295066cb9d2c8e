"""Multimodal (binary) column operators.

Treats image/audio/video as opaque ``BinaryType`` content columns with
typed metadata — the schema pattern for a training-data lake:

    media_id BIGINT, mime STRING, content BINARY

Operators:
- ``media_table``        — derive a deterministic media fixture from the
                           ``documents`` table (driver testdata has no
                           binary column, so the fixture constructs one:
                           real magic bytes + big-endian dimension
                           fields + UTF-8 payload). Deterministic, so a
                           DuckDB oracle reconstructs the same bytes.
- ``sniff_mime``         — magic-byte container detection from content
                           alone (never trusts declared metadata).
- ``media_metadata``     — size / content hash / sniffed mime /
                           header-parsed dimensions, all codegen (hex
                           string surgery + ``conv``) — no Python.
- ``media_dedup_by_payload`` — exact dedup on the md5 of the payload
                           bytes (content minus container header): the
                           same image wrapped in different containers
                           still collapses. Min-id survivor.
- ``image_meta_pandas``  — the Arrow-batched UDF tier: parse header
                           bytes in pandas (``int.from_bytes``) with a
                           typed struct result; the slot where a real
                           decoder (PIL/ffmpeg) plugs in at deployment.
- ``decode_image``       — the genuine pixel-decode step, STUBBED: the
                           container ships no image libraries, so this
                           raises NotImplementedError by design; the
                           Spark-side plumbing (schema, batching,
                           partitioning) around it is real and tested.

Magic bytes are the public file-format signatures (PNG: 89 50 4E 47 0D
0A 1A 0A; JPEG/JFIF: FF D8 FF; RIFF/WAV: 52 49 46 46).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_MAGIC = "89504E470D0A1A0A"  # 8 bytes
JPEG_MAGIC = "FFD8FFE0"  # 4 bytes
RIFF_MAGIC = "52494646"  # 4 bytes

#: header byte length per sniffed mime (magic + dimension/rate fields)
HEADER_LEN = {"image/png": 16, "image/jpeg": 12, "audio/wav": 8}


def _hex4(col: Column) -> Column:
    """4-byte big-endian hex encoding of an integer column."""
    return F.lpad(F.hex(col.cast("long")), 8, "0")


def media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media fixture: one binary blob per document.

    kind = id % 3 (png / jpeg / wav); image dims and audio sample rate
    are fixed functions of the id so the oracle can recompute them;
    payload = UTF-8 bytes of the text.
    """
    mid = F.col(id_col).cast("long")
    width = (mid * 37) % 1920 + 16
    height = (mid * 53) % 1080 + 16
    rate = (mid % 5) * 8000 + 8000
    header_hex = (
        F.when(mid % 3 == 0, F.concat(F.lit(PNG_MAGIC), _hex4(width), _hex4(height)))
        .when(mid % 3 == 1, F.concat(F.lit(JPEG_MAGIC), _hex4(width), _hex4(height)))
        .otherwise(F.concat(F.lit(RIFF_MAGIC), _hex4(rate)))
    )
    return docs.select(
        mid.alias("media_id"),
        F.when(mid % 3 == 0, "image/png")
        .when(mid % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
        .alias("mime"),
        F.concat(F.unhex(header_hex), F.encode(F.col(text_col), "UTF-8")).alias("content"),
    )


def sniff_mime(content: Column | str) -> Column:
    """Container type from magic bytes of the content itself."""
    h = F.hex(F.col(content) if isinstance(content, str) else content)
    return (
        F.when(h.startswith(PNG_MAGIC), "image/png")
        .when(h.startswith("FFD8FF"), "image/jpeg")
        .when(h.startswith(RIFF_MAGIC), "audio/wav")
        .otherwise("application/octet-stream")
    )


def _hex_to_long(hexstr: Column) -> Column:
    return F.conv(hexstr, 16, 10).cast("long")


def media_metadata(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata extracted from the binary column, all codegen:
    byte size, md5 of the hex form (engine-neutral), sniffed mime, and
    dimensions parsed from the container header bytes (NULL for
    non-image containers)."""
    h = F.hex(F.col(content_col))
    mime = sniff_mime(content_col)
    width_hex = F.when(mime == "image/png", h.substr(17, 8)).when(mime == "image/jpeg", h.substr(9, 8))
    height_hex = F.when(mime == "image/png", h.substr(25, 8)).when(mime == "image/jpeg", h.substr(17, 8))
    return media.select(
        "media_id",
        F.length(F.col(content_col)).cast("long").alias("n_bytes"),
        F.md5(h).alias("content_md5"),
        mime.alias("sniffed_mime"),
        _hex_to_long(width_hex).alias("width"),
        _hex_to_long(height_hex).alias("height"),
    )


def payload_md5(content_col: str = "content") -> Column:
    """md5 of the payload bytes (content minus container header),
    computed on the hex form so any engine reproduces it."""
    h = F.hex(F.col(content_col))
    mime = sniff_mime(content_col)
    hdr_chars = (
        F.when(mime == "image/png", F.lit(2 * HEADER_LEN["image/png"]))
        .when(mime == "image/jpeg", F.lit(2 * HEADER_LEN["image/jpeg"]))
        .when(mime == "audio/wav", F.lit(2 * HEADER_LEN["audio/wav"]))
        .otherwise(F.lit(0))
    )
    return F.md5(h.substr(hdr_chars + 1, F.length(h)))


def media_dedup_by_payload(media: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Exact media dedup on payload bytes: the same underlying asset in
    different containers (png vs jpeg wrapper) collapses to one row —
    min-id survivor (deterministic), same rank-1 pattern as L1."""
    from pyspark.sql import Window

    hashed = media.withColumn("payload_md5", payload_md5(content_col))
    w = Window.partitionBy("payload_md5").orderBy(F.col(id_col).asc())
    return hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


_IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sniffed_mime", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


def image_meta_pandas(media: DataFrame) -> DataFrame:
    """Arrow-batched header parse (the pandas-UDF tier of the media
    pipeline): per batch, parse magic + big-endian dims with
    ``int.from_bytes``. This is where a real decoder (PIL, libvips,
    ffmpeg) plugs in at deployment; per-batch columnar transfer and the
    typed struct schema are the production plumbing."""

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                b = bytes(blob)
                if b[:8] == bytes.fromhex(PNG_MAGIC):
                    mime, w, h, hdr = "image/png", int.from_bytes(b[8:12], "big"), int.from_bytes(b[12:16], "big"), 16
                elif b[:3] == bytes.fromhex("FFD8FF"):
                    mime, w, h, hdr = "image/jpeg", int.from_bytes(b[4:8], "big"), int.from_bytes(b[8:12], "big"), 12
                elif b[:4] == bytes.fromhex(RIFF_MAGIC):
                    mime, w, h, hdr = "audio/wav", None, None, 8
                else:
                    mime, w, h, hdr = "application/octet-stream", None, None, 0
                rows.append(
                    {
                        "media_id": mid,
                        "sniffed_mime": mime,
                        "width": w,
                        "height": h,
                        "n_pixels": (w * h) if (w is not None and h is not None) else None,
                        "payload_bytes": len(b) - hdr,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _IMAGE_META_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(parse, schema=_IMAGE_META_SCHEMA)


def sample_frames(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    frame_bytes: int = 256,
    every_nth: int = 4,
) -> DataFrame:
    """Frame sampling over the binary payload — pure codegen: the
    payload (content minus container header) is treated as fixed-size
    frames and every ``every_nth`` frame is emitted as its own row
    (media_id, frame_idx, frame BINARY, frame_md5).

    This is the video/audio frame-sample shape: explode(sequence) over
    the frame index + ``Column.substr`` on the BINARY column — no
    Python, no decode; a real container swaps byte-striding for codec
    frame boundaries inside the same plumbing. Row count is linear in
    sampled frames; the binary column never passes through Python.
    """
    def header_len(col: Column) -> Column:
        mime = sniff_mime(col)
        return (
            F.when(mime == "image/png", F.lit(HEADER_LEN["image/png"]))
            .when(mime == "image/jpeg", F.lit(HEADER_LEN["image/jpeg"]))
            .when(mime == "audio/wav", F.lit(HEADER_LEN["audio/wav"]))
            .otherwise(F.lit(0))
        )

    content = F.col(content_col)
    payload_len = F.length(content) - header_len(content)
    n_frames = F.floor((payload_len + F.lit(frame_bytes - 1)) / F.lit(frame_bytes)).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_nth == 0,
    )
    hdr_c = header_len(F.col("_c"))
    return (
        media.filter(payload_len > 0)
        .select(F.col(id_col).alias("media_id"), content.alias("_c"), F.explode(idx).alias("frame_idx"))
        .select(
            "media_id",
            "frame_idx",
            F.col("_c").substr(hdr_c + F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes)).alias("frame"),
        )
        .withColumn("frame_md5", F.md5(F.hex("frame")))
    )


def resize_image_headers(media: DataFrame, content_col: str = "content", factor: int = 2) -> DataFrame:
    """Resize step of a thumbnail pipeline, Arrow-batched
    (binary-in/binary-out ``mapInPandas``): parse the header, divide
    the dimension fields by ``factor``, re-emit the blob with the new
    header and the payload untouched. With no codecs in this container
    the pixel resample is a header rewrite on the deterministic fake
    format; a real deployment decodes/resamples/re-encodes inside the
    same batched plumbing (see :func:`decode_image`). Non-image rows
    pass through unchanged."""

    def rewrite(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(blob: bytes) -> bytes:
            b = bytes(blob)
            if b[:8] == bytes.fromhex(PNG_MAGIC):
                hdr, off = 16, 8
            elif b[:3] == bytes.fromhex("FFD8FF"):
                hdr, off = 12, 4
            else:
                return b
            w = int.from_bytes(b[off : off + 4], "big") // factor
            h = int.from_bytes(b[off + 4 : off + 8], "big") // factor
            return b[:off] + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b[hdr:]

        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": [one(x) for x in pdf["content"]]}
            )

    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("content", T.BinaryType())]
    )
    return media.select("media_id", F.col(content_col).alias("content")).mapInPandas(rewrite, schema=schema)


def media_byte_features(media: DataFrame, content_col: str = "content", dim: int = 8) -> DataFrame:
    """Feature extraction over the payload bytes, Arrow-batched: a
    deterministic ``dim``-element float vector (byte-value mean/std +
    evenly-spaced quantiles, scaled to [0,1]). The embedding slot of a
    media pipeline — a real deployment swaps the byte statistics for a
    vision/audio model forward pass over the decoded tensor; schema
    (array<float>), batching and partitioning are identical."""

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n_quant = dim - 2

        def one(blob: bytes):
            a = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
            if a.size == 0:
                return [0.0] * dim
            qs = np.quantile(a, np.linspace(0.0, 1.0, n_quant))
            return [float(x) / 255.0 for x in (a.mean(), a.std(), *qs)]

        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": [one(x) for x in pdf["content"]]}
            )

    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("features", T.ArrayType(T.FloatType()))]
    )
    return media.select("media_id", F.col(content_col).alias("content")).mapInPandas(
        featurize, schema=schema
    )


def _le_hex(value: Column, n_bytes: int) -> Column:
    """Little-endian hex encoding of an integer column (BMP header
    fields are LE, unlike the PNG-style big-endian fixtures above)."""
    parts = [
        F.lpad(F.hex((value / F.lit(256**i)).cast("long") % 256), 2, "0") for i in range(n_bytes)
    ]
    return F.concat(*parts)


#: fixed BMP fixture width: 4 px * 3 B/px = 12-byte rows, a multiple of
#: 4, so the fixture needs no row padding (the decoder still handles
#: padded widths generally).
BMP_WIDTH = 4

_BMP_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def bmp_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic REAL-format image fixture: a valid uncompressed
    24-bit BMP per document (BITMAPFILEHEADER + BITMAPINFOHEADER +
    bottom-up BGR pixel rows), 4 px wide x (id%3 + 1) rows; pixel bytes
    are the document's first ``12*h`` UTF-8 bytes, space-padded. Built
    entirely in codegen hex surgery so a DuckDB oracle reconstructs the
    byte-exact file — and any external BMP reader can open it.
    """
    mid = F.col(id_col).cast("long")
    height = mid % 3 + 1
    npix_bytes = height * F.lit(BMP_WIDTH * 3)
    file_size = npix_bytes + 54
    # rpad truncates-or-pads to the max payload (3 rows = 36 bytes) in
    # both Spark and DuckDB; then cut to this row count's actual bytes
    payload_hex = F.rpad(F.hex(F.encode(F.col(text_col), "UTF-8")), 6 * BMP_WIDTH * 3, "20").substr(
        F.lit(1), npix_bytes * 2
    )
    header_hex = F.concat(
        F.lit("424D"),                      # 'BM'
        _le_hex(file_size, 4),              # file size
        F.lit("00000000"),                  # reserved
        _le_hex(F.lit(54), 4),              # pixel data offset
        _le_hex(F.lit(40), 4),              # BITMAPINFOHEADER size
        _le_hex(F.lit(BMP_WIDTH), 4),       # width (LE, signed)
        _le_hex(height, 4),                 # height (bottom-up)
        F.lit("0100"),                      # planes = 1
        F.lit("1800"),                      # 24 bpp
        F.lit("00000000"),                  # BI_RGB (uncompressed)
        _le_hex(npix_bytes, 4),             # image size
        F.lit("00000000" * 4),              # ppm + palette fields
    )
    return docs.select(
        mid.alias("media_id"),
        F.lit("image/bmp").alias("mime"),
        F.unhex(F.concat(header_hex, payload_hex)).alias("content"),
    )


def decode_bmp_pixels(media: DataFrame) -> DataFrame:
    """The REAL pixel-decode tier, no external codecs: parse the BMP
    container (LE header fields, bottom-up rows, 4-byte row padding)
    and decode the 24-bit BGR pixel array into per-channel statistics —
    Arrow-batched ``mapInPandas``, the same plumbing slot where
    PIL/libvips plugs in for compressed formats (see
    :func:`decode_image`). Output: per-image dimensions, pixel count,
    per-channel byte sums and mean luminance (ITU-R BT.601 weights).
    """

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(mid: int, blob: bytes) -> dict:
            b = bytes(blob)
            if b[:2] != b"BM":
                raise ValueError(f"media_id {mid}: not a BMP container")
            offset = int.from_bytes(b[10:14], "little")
            width = int.from_bytes(b[18:22], "little", signed=True)
            height = int.from_bytes(b[22:26], "little", signed=True)
            bpp = int.from_bytes(b[28:30], "little")
            if bpp != 24:
                raise ValueError(f"media_id {mid}: only 24-bit BMP supported, got {bpp}")
            row_bytes = width * 3
            stride = (row_bytes + 3) // 4 * 4  # rows pad to 4-byte multiples
            rows = []
            for r in range(abs(height)):
                start = offset + r * stride
                rows.append(np.frombuffer(b[start : start + row_bytes], dtype=np.uint8))
            # bottom-up storage when height > 0
            px = np.stack(rows[::-1] if height > 0 else rows).reshape(-1, 3).astype(np.int64)
            bsum, gsum, rsum = (int(px[:, i].sum()) for i in range(3))
            n = px.shape[0]
            # computed from the exact integer channel sums in the same
            # expression order an SQL oracle uses, so the double is
            # bit-identical cross-engine (never a numpy pairwise mean)
            luma = (0.299 * rsum + 0.587 * gsum + 0.114 * bsum) / n
            return {
                "media_id": mid,
                "width": width,
                "height": abs(height),
                "n_pixels": n,
                "sum_b": bsum,
                "sum_g": gsum,
                "sum_r": rsum,
                "mean_luma": float(luma),
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(m, c) for m, c in zip(pdf["media_id"], pdf["content"])],
                columns=[f.name for f in _BMP_PIXEL_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(decode, schema=_BMP_PIXEL_SCHEMA)


def decode_image(content: bytes):
    """Pixel decode dispatch over the IN-REPO codecs — the plug-in
    slot earlier rounds documented as a stub is now closed for the
    four implemented formats: PNG (DEFLATE, round 3), BMP
    (uncompressed), GIF (LZW dictionary coder, round 5) and baseline
    JPEG (Huffman + DCT, round 5). Returns (width, height, pixels)
    where pixels is a numpy array (grayscale 2-D or RGB 3-D).
    Formats beyond these (progressive JPEG, WebP, AVIF...) still
    raise, with the sniffed container named."""
    import numpy as np

    b = bytes(content)
    if b[:8] == _PNG_SIG:
        w, h, raw = decode_png_bytes(b)
        return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h, palette, idx = decode_gif_bytes(b)
        pal = np.asarray(palette, dtype=np.uint8)
        return w, h, pal[np.frombuffer(idx, dtype=np.uint8)].reshape(h, w, 3)
    if b[:2] == b"\xff\xd8":
        return decode_jpeg_bytes(b)
    if b[:2] == b"BM":
        raise NotImplementedError(
            "BMP pixel decode is Spark-native (decode_bmp_pixels); use that entry point"
        )
    raise NotImplementedError(
        f"no in-repo codec for container {b[:4]!r}; PNG/GIF/baseline-JPEG/BMP are implemented"
    )


# ---------------------------------------------------------------------------
# PNG — a REAL compressed codec with zero external dependencies:
# stdlib zlib (DEFLATE) + the PNG chunk/filter spec, both encode and
# decode. Upgrades the decode tier from "uncompressed container" (BMP
# above) to an actual compressed format; PIL/libvips still plug into
# decode_image for JPEG-class codecs.
# ---------------------------------------------------------------------------

PNG_WIDTH = 4
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_bytes(media_id: int, payload: bytes, width: int = PNG_WIDTH) -> bytes:
    """A valid 8-bit RGB PNG whose raw pixel bytes are ``payload``
    (height = len(payload) / (3*width)): signature + IHDR + IDAT
    (zlib-compressed filtered scanlines, split into TWO IDAT chunks to
    exercise multi-IDAT concatenation) + IEND. Row r uses filter type
    ``(media_id + r) % 5`` so every decode exercises all five PNG
    filters (None/Sub/Up/Average/Paeth), not just the trivial one."""
    import struct
    import zlib as _z

    bpp = 3
    row_bytes = width * bpp
    height = len(payload) // row_bytes
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    prev = bytes(row_bytes)
    lines = bytearray()
    for r in range(height):
        raw = payload[r * row_bytes : (r + 1) * row_bytes]
        f = (media_id + r) % 5
        filt = bytearray()
        for i in range(row_bytes):
            x = raw[i]
            a = raw[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = (x - a) % 256
            elif f == 2:
                v = (x - b) % 256
            elif f == 3:
                v = (x - (a + b) // 2) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (x - pred) % 256
            filt.append(v)
        lines.append(f)
        lines.extend(filt)
        prev = raw
    comp = _z.compress(bytes(lines), 6)
    half = max(1, len(comp) // 2)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:half])
        + _png_chunk(b"IDAT", comp[half:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png_bytes(blob: bytes, inflate_fn=None) -> tuple[int, int, bytes]:
    """Parse a PNG (8-bit RGB, non-interlaced), decompress the IDAT
    stream and REVERSE the per-row filters; returns (width, height,
    raw RGB bytes). Pure Python — the real compressed-codec decode
    path, no PIL. ``inflate_fn`` defaults to stdlib zlib; pass
    :func:`datalake_polygonscan_spark.operators.deflate.zlib_decompress_scratch`
    for the fully from-scratch DEFLATE path (RFC 1951/1950 in-repo,
    Adler-32 verified)."""
    import struct
    import zlib as _z

    b = bytes(blob)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, interlace) != (8, 2, 0):
                raise ValueError(f"only 8-bit RGB non-interlaced supported, got {(depth, ctype, interlace)}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    lines = (inflate_fn or _z.decompress)(bytes(idat))
    bpp = 3
    row_bytes = width * bpp
    out = bytearray()
    prev = bytes(row_bytes)
    for r in range(height):
        f = lines[r * (row_bytes + 1)]
        filt = lines[r * (row_bytes + 1) + 1 : (r + 1) * (row_bytes + 1)]
        raw = bytearray()
        for i in range(row_bytes):
            x = filt[i]
            a = raw[i - bpp] if i >= bpp else 0
            bb = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = (x + a) % 256
            elif f == 2:
                v = (x + bb) % 256
            elif f == 3:
                v = (x + (a + bb) // 2) % 256
            elif f == 4:
                p = a + bb - c
                pa, pb_, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb_ and pa <= pc) else (bb if pb_ <= pc else c)
                v = (x + pred) % 256
            else:
                raise ValueError(f"bad filter type {f}")
            raw.append(v)
        out.extend(raw)
        prev = bytes(raw)
    return width, height, bytes(out)


def png_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic REAL compressed-image fixture: a valid 8-bit RGB
    PNG per document (same payload convention as :func:`bmp_table` —
    the doc's first ``3*width*height`` UTF-8 bytes, space-padded;
    height = id%3 + 1; row filters cycle through all five PNG filter
    types). Compression makes codegen construction impossible, so the
    fixture builds in Arrow-batched ``mapInPandas`` — the oracle
    checks the DECODED payload, which is compression-invariant."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        row_bytes = PNG_WIDTH * 3
        for pdf in batches:
            out = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                h = int(mid) % 3 + 1
                raw = str(text).encode("utf-8")[: row_bytes * h]
                raw = raw + b" " * (row_bytes * h - len(raw))
                out.append(
                    {"media_id": int(mid), "mime": "image/png", "content": png_bytes(int(mid), raw)}
                )
            yield pd.DataFrame(out, columns=["media_id", "mime", "content"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(build, schema=schema)


def decode_png_pixels(media: DataFrame, inflate_fn=None) -> DataFrame:
    """Pixel decode for REAL compressed PNGs through the same
    Arrow-batched ``mapInPandas`` tier as :func:`decode_bmp_pixels`:
    stdlib-zlib IDAT decompression + full five-filter unfiltering
    (:func:`decode_png_bytes`), then per-channel statistics. Output
    schema matches the BMP decoder (RGB channel order)."""

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(mid: int, blob: bytes) -> dict:
            width, height, raw = decode_png_bytes(blob, inflate_fn=inflate_fn)
            px = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
            rsum, gsum, bsum = (int(px[:, i].sum()) for i in range(3))
            n = px.shape[0]
            luma = (0.299 * rsum + 0.587 * gsum + 0.114 * bsum) / n
            return {
                "media_id": mid,
                "width": width,
                "height": height,
                "n_pixels": n,
                "sum_b": bsum,
                "sum_g": gsum,
                "sum_r": rsum,
                "mean_luma": float(luma),
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(m, c) for m, c in zip(pdf["media_id"], pdf["content"])],
                columns=[f.name for f in _BMP_PIXEL_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(decode, schema=_BMP_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# M-WAV: real audio container decode (RIFF/WAVE 16-bit PCM, zero codecs)
# ---------------------------------------------------------------------------

WAV_RATES = (8000, 12000, 16000)


def wav_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic REAL-format audio fixture: a valid RIFF/WAVE
    16-bit PCM mono file per document (RIFF header, fmt chunk, data
    chunk), sample rate 8/12/16 kHz by id%3, (id%3+1)*4 samples whose
    little-endian bytes are the document's first UTF-8 bytes,
    space-padded. Built entirely in codegen hex surgery so a DuckDB
    oracle reconstructs the byte-exact file — and any external WAV
    reader can open it.
    """
    mid = F.col(id_col).cast("long")
    rate = mid % 3 * 4000 + 8000
    n_samples = (mid % 3 + 1) * 4
    data_bytes = n_samples * 2
    max_hex = 6 * 4 * 2 * 2  # 12 samples * 2 bytes * 2 hex chars
    payload_hex = F.rpad(F.hex(F.encode(F.col(text_col), "UTF-8")), max_hex, "20").substr(
        F.lit(1), data_bytes * 2
    )
    header_hex = F.concat(
        F.lit("52494646"),                 # 'RIFF'
        _le_hex(data_bytes + 36, 4),       # riff size
        F.lit("57415645"),                 # 'WAVE'
        F.lit("666D7420"),                 # 'fmt '
        _le_hex(F.lit(16), 4),             # fmt chunk size
        F.lit("0100"),                     # PCM
        F.lit("0100"),                     # mono
        _le_hex(rate, 4),                  # sample rate
        _le_hex(rate * 2, 4),              # byte rate
        F.lit("0200"),                     # block align
        F.lit("1000"),                     # 16 bits/sample
        F.lit("64617461"),                 # 'data'
        _le_hex(data_bytes, 4),            # data size
    )
    return docs.select(
        mid.alias("media_id"),
        F.lit("audio/wav").alias("mime"),
        F.unhex(F.concat(header_hex, payload_hex)).alias("content"),
    )


def decode_wav_pcm(media: DataFrame) -> DataFrame:
    """The REAL audio-decode tier, no external codecs: walk the RIFF
    chunk list (arbitrary chunk order tolerated), validate the PCM fmt
    chunk, decode the int16-LE sample array and emit per-file signal
    statistics — Arrow-batched ``mapInPandas``, the same plumbing slot
    where soundfile/ffmpeg plugs in for compressed audio. Output:
    (media_id, sample_rate, n_samples, duration_ms floor, peak |s|,
    sum_abs Σ|s| — integer-exact, engine-neutral).
    """
    import math

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(mid: int, blob: bytes) -> dict:
            b = bytes(blob)
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError(f"media_id {mid}: not a RIFF/WAVE container")
            pos, rate, bits, channels, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                size = int.from_bytes(b[pos + 4 : pos + 8], "little")
                body = b[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt_tag = int.from_bytes(body[0:2], "little")
                    channels = int.from_bytes(body[2:4], "little")
                    rate = int.from_bytes(body[4:8], "little")
                    bits = int.from_bytes(body[14:16], "little")
                    if fmt_tag != 1:
                        raise ValueError(f"media_id {mid}: not PCM (fmt={fmt_tag})")
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)  # chunks are word-aligned
            if rate is None or data is None:
                raise ValueError(f"media_id {mid}: missing fmt/data chunk")
            if bits != 16 or channels != 1:
                raise ValueError(f"media_id {mid}: expected 16-bit mono, got {bits}/{channels}")
            samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
            return {
                "media_id": mid,
                "sample_rate": rate,
                "n_samples": len(samples),
                "duration_ms": int(math.floor(len(samples) * 1_000_000 / rate / 1000)),
                "peak": int(np.abs(samples).max()) if len(samples) else 0,
                "sum_abs": int(np.abs(samples).sum()),
            }

        for pdf in batches:
            yield pd.DataFrame([one(int(m), c) for m, c in zip(pdf["media_id"], pdf["content"])])

    return media.mapInPandas(
        decode,
        schema=(
            "media_id long, sample_rate long, n_samples long, "
            "duration_ms long, peak long, sum_abs long"
        ),
    )


# ---------------------------------------------------------------------------
# M-ADPCM: IMA/DVI ADPCM compressed-audio decode (WAVE fmt tag 0x11),
# zero external codecs — a PREDICTIVE coder, the fourth compression
# family in the media tier after DEFLATE (PNG), LZW (GIF) and DCT
# (JPEG). Cross-validated against CPython's audioop (tests).
# ---------------------------------------------------------------------------

#: the standard IMA ADPCM step-size table (89 entries) and 3-bit
#: magnitude index-adaptation table — identical across IMA WAV,
#: DVI ADPCM and CPython's audioop.
ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
ADPCM_INDEX_DELTA = (-1, -1, -1, -1, 2, 4, 6, 8)
ADPCM_RATE = 8000


def adpcm_decode_block(data: bytes, predictor: int, index: int) -> list[int]:
    """Decode one IMA ADPCM nibble stream (LOW nibble first, the WAV
    block order) from an explicit (predictor, step-index) start state.
    Returns the sample list INCLUDING the seed predictor as sample 0,
    per the IMA WAV block contract."""
    index = max(0, min(88, index))
    out = [predictor]
    for byte in data:
        for nib in (byte & 0x0F, byte >> 4):
            step = ADPCM_STEPS[index]
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            predictor = predictor - diff if nib & 8 else predictor + diff
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + ADPCM_INDEX_DELTA[nib & 7]))
            out.append(predictor)
    return out


def adpcm_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic REAL-format compressed-audio fixture: a valid
    RIFF/WAVE IMA ADPCM (fmt tag 0x11) mono file per document — fmt
    chunk with the 2-byte samples-per-block extension, the mandatory
    ``fact`` chunk (sample count, required for compressed WAV), and
    one ADPCM block whose 4-byte header seeds predictor=0 and step
    index ``doc_id % 89``, followed by (doc_id%3+1)*4 nibble-payload
    bytes taken from the document's first UTF-8 bytes (space-padded).
    Built entirely in codegen hex surgery so the DuckDB oracle can
    replay the decode recurrence from the same payload formula.
    """
    mid = F.col(id_col).cast("long")
    nb = (mid % 3 + 1) * 4                      # ADPCM payload bytes
    n_samples = nb * 2 + 1                      # header seed + 2/byte
    block_align = nb + 4                        # 4-byte block header
    max_hex = 12 * 2                            # 12 payload bytes max
    payload_hex = F.rpad(F.hex(F.encode(F.col(text_col), "UTF-8")), max_hex, "20").substr(
        F.lit(1), (nb * 2).cast("int")
    )
    header_hex = F.concat(
        F.lit("52494646"),                 # 'RIFF'
        _le_hex(nb + 56, 4),               # riff size (see layout below)
        F.lit("57415645"),                 # 'WAVE'
        F.lit("666D7420"),                 # 'fmt '
        _le_hex(F.lit(20), 4),             # fmt chunk size (16 + cb 2 + ext 2)
        F.lit("1100"),                     # wFormatTag 0x0011 = IMA ADPCM
        F.lit("0100"),                     # mono
        _le_hex(F.lit(ADPCM_RATE), 4),     # sample rate
        _le_hex((F.lit(ADPCM_RATE) * block_align / n_samples).cast("long"), 4),  # byte rate
        _le_hex(block_align, 2),           # block align
        F.lit("0400"),                     # 4 bits per (compressed) sample
        F.lit("0200"),                     # cbSize = 2
        _le_hex(n_samples, 2),             # samples per block
        F.lit("66616374"),                 # 'fact'
        _le_hex(F.lit(4), 4),
        _le_hex(n_samples, 4),             # total samples (decompressed)
        F.lit("64617461"),                 # 'data'
        _le_hex(block_align, 4),           # data size = one block
        F.lit("0000"),                     # block header: predictor = 0
        F.lpad(F.hex(mid % 89), 2, "0"),   # block header: step index
        F.lit("00"),                       # block header: reserved
    )
    return docs.select(
        mid.alias("media_id"),
        F.lit("audio/adpcm").alias("mime"),
        F.unhex(F.concat(header_hex, payload_hex)).alias("content"),
    )


def decode_adpcm_pcm(media: DataFrame) -> DataFrame:
    """The compressed-audio decode tier: walk the RIFF chunk list,
    validate the IMA ADPCM fmt (tag 0x11) + samples-per-block
    extension + fact chunk, decode each data block's nibble stream
    through the step-adaptive predictor recurrence
    (``adpcm_decode_block``), truncate to the fact sample count, and
    emit integer-exact signal stats. Arrow-batched ``mapInPandas``;
    blocks are independent (each reseeds predictor+index), so a
    100 TB corpus decodes embarrassingly parallel per file AND could
    split per block within a file."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        def one(mid: int, blob: bytes) -> dict:
            b = bytes(blob)
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError(f"media_id {mid}: not a RIFF/WAVE container")
            pos, fmt, fact_n, data = 12, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                size = int.from_bytes(b[pos + 4 : pos + 8], "little")
                body = b[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt = body
                elif cid == b"fact":
                    fact_n = int.from_bytes(body[0:4], "little")
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)
            if fmt is None or data is None:
                raise ValueError(f"media_id {mid}: missing fmt/data chunk")
            fmt_tag = int.from_bytes(fmt[0:2], "little")
            channels = int.from_bytes(fmt[2:4], "little")
            rate = int.from_bytes(fmt[4:8], "little")
            block_align = int.from_bytes(fmt[12:14], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if fmt_tag != 0x11 or bits != 4 or channels != 1:
                raise ValueError(
                    f"media_id {mid}: expected mono IMA ADPCM, got fmt={fmt_tag} bits={bits}"
                )
            if len(fmt) < 20:
                raise ValueError(f"media_id {mid}: fmt missing samples-per-block extension")
            spb = int.from_bytes(fmt[18:20], "little")
            if fact_n is None:
                raise ValueError(f"media_id {mid}: compressed WAV requires a fact chunk")
            samples: list[int] = []
            for off in range(0, len(data), block_align):
                block = data[off : off + block_align]
                if len(block) < 4:
                    raise ValueError(f"media_id {mid}: truncated ADPCM block header")
                pred = int.from_bytes(block[0:2], "little", signed=True)
                idx = block[2]
                if idx > 88:
                    raise ValueError(f"media_id {mid}: step index {idx} out of range")
                samples.extend(adpcm_decode_block(block[4:], pred, idx)[:spb])
            samples = samples[:fact_n]
            if len(samples) != fact_n:
                raise ValueError(
                    f"media_id {mid}: fact says {fact_n} samples, decoded {len(samples)}"
                )
            return {
                "media_id": mid,
                "sample_rate": rate,
                "n_samples": len(samples),
                "peak": max(abs(s) for s in samples) if samples else 0,
                "sum_abs": sum(abs(s) for s in samples),
            }

        for pdf in batches:
            yield pd.DataFrame([one(int(m), c) for m, c in zip(pdf["media_id"], pdf["content"])])

    return media.mapInPandas(
        decode,
        schema="media_id long, sample_rate long, n_samples long, peak long, sum_abs long",
    )


# ---------------------------------------------------------------------------
# M-AVI: real video container decode (RIFF/AVI, uncompressed DIB
# frames, zero codecs) — completes the modality triple: image (BMP,
# PNG), audio (WAV), VIDEO (AVI).
# ---------------------------------------------------------------------------

AVI_W = 2
AVI_H = 2
AVI_US_PER_FRAME = 100_000  # 10 fps
_AVI_ROW_STRIDE = ((AVI_W * 3 + 3) // 4) * 4      # 8: rows pad to dword
_AVI_FRAME_BYTES = _AVI_ROW_STRIDE * AVI_H        # 16
_AVI_MAX_FRAMES = 3


def avi_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic REAL-format video fixture: a valid RIFF/AVI file
    per document — LIST hdrl (avih main header, LIST strl with a
    'vids'/'DIB ' strh and a 24-bit BI_RGB BITMAPINFOHEADER strf) and
    LIST movi holding (id%3+1) uncompressed '00db' frames of 2x2
    bottom-up BGR pixels (rows dword-padded), frame bytes taken from
    the document's UTF-8 hex, space-padded. Pure codegen hex surgery,
    so a DuckDB oracle reconstructs the decoder's output byte-exactly.
    """
    mid = F.col(id_col).cast("long")
    n = (mid % 3 + 1).cast("int")
    max_hex = _AVI_MAX_FRAMES * _AVI_FRAME_BYTES * 2  # 96
    ph = F.rpad(F.hex(F.encode(F.col(text_col), "UTF-8")), max_hex, "20")

    def le(v, nb):
        return _le_hex(v if isinstance(v, Column) else F.lit(v), nb)

    avih = F.concat(
        F.lit("61766968"), le(56, 4),          # 'avih', cb
        le(AVI_US_PER_FRAME, 4), le(0, 4), le(0, 4), le(0, 4),
        le(n, 4),                              # dwTotalFrames
        le(0, 4), le(1, 4),                    # initial frames, streams
        le(_AVI_FRAME_BYTES, 4),               # suggested buffer
        le(AVI_W, 4), le(AVI_H, 4),
        le(0, 4), le(0, 4), le(0, 4), le(0, 4),  # reserved[4]
    )
    strh = F.concat(
        F.lit("73747268"), le(56, 4),          # 'strh', cb
        F.lit("76696473"),                     # fccType 'vids'
        F.lit("44494220"),                     # fccHandler 'DIB '
        le(0, 4), le(0, 4), le(0, 4),          # flags, prio/lang, initial
        le(1, 4), le(10, 4),                   # scale=1, rate=10 (10fps)
        le(0, 4), le(n, 4),                    # start, length (frames)
        le(_AVI_FRAME_BYTES, 4), le(0, 4), le(0, 4),  # sugg, quality, samplesize
        le(0, 4), le(0, 4),                    # rcFrame
    )
    strf = F.concat(
        F.lit("73747266"), le(40, 4),          # 'strf', cb
        le(40, 4), le(AVI_W, 4), le(AVI_H, 4),
        F.lit("0100"), F.lit("1800"),          # planes=1, bitcount=24
        le(0, 4),                              # BI_RGB
        le(_AVI_FRAME_BYTES, 4),
        le(0, 4), le(0, 4), le(0, 4), le(0, 4),
    )
    strl = F.concat(F.lit("4C495354"), le(4 + 64 + 48, 4), F.lit("7374726C"), strh, strf)
    hdrl = F.concat(F.lit("4C495354"), le(4 + 64 + 124, 4), F.lit("6864726C"), avih, strl)

    frame_chunks = []
    for f in range(_AVI_MAX_FRAMES):
        body = ph.substr(F.lit(f * _AVI_FRAME_BYTES * 2 + 1), F.lit(_AVI_FRAME_BYTES * 2))
        chunk = F.concat(F.lit("30306462"), le(_AVI_FRAME_BYTES, 4), body)  # '00db'
        frame_chunks.append(F.when(n > f, chunk).otherwise(F.lit("")))
    movi_size = F.lit(4) + n.cast("long") * (8 + _AVI_FRAME_BYTES)
    movi = F.concat(F.lit("4C495354"), _le_hex(movi_size, 4), F.lit("6D6F7669"), *frame_chunks)

    riff_size = F.lit(4 + 8 + 192 + 8 + 4) + n.cast("long") * (8 + _AVI_FRAME_BYTES)
    file_hex = F.concat(
        F.lit("52494646"), _le_hex(riff_size, 4), F.lit("41564920"), hdrl, movi
    )
    return docs.select(
        mid.alias("media_id"),
        F.lit("video/avi").alias("mime"),
        F.unhex(file_hex).alias("content"),
    )


def decode_avi_frames(media: DataFrame) -> DataFrame:
    """The REAL video-decode tier, no external codecs: parse the RIFF
    'AVI ' container — avih main header, strh/strf stream headers
    (validated 'vids' + uncompressed 24-bit BI_RGB), then every '00db'
    frame in LIST movi decoded as bottom-up dword-padded BGR rows —
    in Arrow-batched ``mapInPandas`` (the slot where a real codec
    plugs in for compressed video). Output: per-file frame geometry,
    duration from the header clock, integer-exact per-channel sums
    across ALL frames, and a header-consistency verdict.
    """

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        def chunks(b: bytes, pos: int, end: int):
            while pos + 8 <= end:
                cid = b[pos : pos + 4]
                size = int.from_bytes(b[pos + 4 : pos + 8], "little")
                yield cid, pos + 8, size
                pos += 8 + size + (size & 1)

        def one(mid: int, blob: bytes) -> dict:
            b = bytes(blob)
            if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                raise ValueError(f"media_id {mid}: not a RIFF/AVI container")
            total_frames = width = height = us_per_frame = None
            bitcount = compression = handler_ok = None
            frames: list[bytes] = []
            for cid, off, size in chunks(b, 12, len(b)):
                if cid != b"LIST":
                    continue
                ltype = b[off : off + 4]
                if ltype == b"hdrl":
                    for c2, o2, s2 in chunks(b, off + 4, off + size):
                        if c2 == b"avih":
                            us_per_frame = int.from_bytes(b[o2 : o2 + 4], "little")
                            total_frames = int.from_bytes(b[o2 + 16 : o2 + 20], "little")
                            width = int.from_bytes(b[o2 + 32 : o2 + 36], "little")
                            height = int.from_bytes(b[o2 + 36 : o2 + 40], "little")
                        elif c2 == b"LIST" and b[o2 : o2 + 4] == b"strl":
                            for c3, o3, s3 in chunks(b, o2 + 4, o2 + s2):
                                if c3 == b"strh":
                                    handler_ok = (
                                        b[o3 : o3 + 4] == b"vids"
                                        and b[o3 + 4 : o3 + 8] == b"DIB "
                                    )
                                elif c3 == b"strf":
                                    bitcount = int.from_bytes(b[o3 + 14 : o3 + 16], "little")
                                    compression = int.from_bytes(b[o3 + 16 : o3 + 20], "little")
                elif ltype == b"movi":
                    for c2, o2, s2 in chunks(b, off + 4, off + size):
                        if c2 == b"00db":
                            frames.append(b[o2 : o2 + s2])
            if total_frames is None or not handler_ok:
                raise ValueError(f"media_id {mid}: missing/invalid AVI headers")
            if bitcount != 24 or compression != 0:
                raise ValueError(
                    f"media_id {mid}: expected uncompressed 24-bit DIB, "
                    f"got {bitcount}-bit compression={compression}"
                )
            stride = ((width * 3 + 3) // 4) * 4
            sums = [0, 0, 0]  # B, G, R
            for fr in frames:
                for r in range(height):
                    row = fr[r * stride : r * stride + width * 3]
                    for c, v in enumerate(row):
                        sums[c % 3] += v
            return {
                "media_id": mid,
                "width": width,
                "height": height,
                "n_frames": len(frames),
                "duration_ms": total_frames * us_per_frame // 1000,
                "sum_b": sums[0],
                "sum_g": sums[1],
                "sum_r": sums[2],
                "frames_match_header": len(frames) == total_frames,
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(int(m), c) for m, c in zip(pdf["media_id"], pdf["content"])]
            )

    return media.mapInPandas(
        decode,
        schema=(
            "media_id long, width long, height long, n_frames long, "
            "duration_ms long, sum_b long, sum_g long, sum_r long, "
            "frames_match_header boolean"
        ),
    )


# ---------------------------------------------------------------------------
# M-GIF: real GIF87a encode/decode with a from-scratch LZW dictionary
# coder (variable-width codes 9->12 bits, early-change growth, CLEAR
# reset at table-full) — the second real compressed codec beside PNG,
# exercising a DICTIONARY coder where PNG/zlib exercises DEFLATE.
# Stdlib-only, like the rest of the tier. The VARIABLE-WIDTH bit
# packing is LSB-first per the GIF spec; encoder and decoder are a
# matched pair (property-tested roundtrip incl. >4096-entry resets in
# tests/test_media.py) with the deferred-growth convention giflib
# uses (encoder grows after inserting code (1<<n)-1, decoder one code
# behind grows at (1<<n)-2 insertions — derived in-line below).
# ---------------------------------------------------------------------------

GIF_WIDTH = 6
_GIF_MAX_CODE = 4096


def _gif_palette_rgb(idx: int) -> tuple[int, int, int]:
    """Deterministic 256-entry palette: r=i, g=255-i, b=(7i)%256 —
    non-trivial (catches channel swaps) yet closed-form restatable in
    the DuckDB oracle."""
    return idx, 255 - idx, (idx * 7) % 256


class _BitWriter:
    """LSB-first variable-width code packer (GIF convention)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-variant LZW, bit-exact with the giflib/ImageIO convention
    (cross-validated against Java's javax.imageio in
    tests/test_media.py): the code width grows via a DEFERRED check
    after each emission (counter >= 1<<width -> next code is wider) —
    NOT at insertion time, which is the TIFF 'early change' variant
    real GIF decoders reject — and the dictionary resets via CLEAR
    when the counter reaches 4095 (entry 4095 stays unused, same
    headroom giflib leaves)."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal width
        bw.write(code, width)
        if next_code >= (1 << width) and width < 12:
            width += 1

    emit(clear)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code >= _GIF_MAX_CODE - 1:  # 4095: full -> fresh dictionary
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        else:
            table[wk] = next_code
            next_code += 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(end)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """Mirror of :func:`lzw_encode`. The decoder replays the
    ENCODER's counter (one ahead of its own table, since it learns
    entry i while processing code i+1) and applies the same deferred
    width check after each code read, so both sides switch widths at
    the identical bit position. Handles the KwKwK self-referential
    case and CLEAR resets."""
    clear = 1 << min_code_size
    end = clear + 1
    br = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    enc_counter = end + 1  # mirrors the encoder's next_code at emit time
    prev: bytes | None = None

    def reset():
        nonlocal table, width, enc_counter, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        enc_counter = end + 1
        prev = None

    reset()
    while True:
        code = br.read(width)
        if code is None:
            return bytes(out)
        # deferred growth, mirroring the encoder's post-emit check
        if enc_counter >= (1 << width) and width < 12:
            width += 1
        if code == clear:
            reset()
            continue
        if code == end:
            return bytes(out)
        if prev is None:  # first code after clear: literal
            entry = table[code]
            out.extend(entry)
            prev = entry
            enc_counter += 1  # the encoder inserted after emitting it
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK: code not yet in table
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > next {len(table)}")
        out.extend(entry)
        if len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
        enc_counter += 1
        prev = entry


def gif_bytes(media_id: int, payload: bytes, width: int = GIF_WIDTH) -> bytes:
    """A valid GIF87a whose pixel indices are ``payload`` bytes
    (height = len(payload)/width) against the fixed 256-entry
    :func:`_gif_palette_rgb` global color table; image data is
    real LZW in 255-byte sub-blocks."""
    import struct

    height = len(payload) // width
    out = bytearray(b"GIF87a")
    # logical screen descriptor: 256-entry global color table
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes(_gif_palette_rgb(i))
    # image descriptor
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    comp = lzw_encode(payload, 8)
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_bytes(blob: bytes) -> tuple[int, int, list[tuple[int, int, int]], bytes]:
    """Parse a GIF87a/89a (single image, global palette only),
    reassemble the LZW sub-blocks and decode to palette indices.
    Returns (width, height, palette, indices)."""
    import struct

    b = bytes(blob)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    while pos < len(b):
        marker = b[pos]
        if marker == 0x2C:  # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            min_code = b[pos]
            pos += 1
            comp = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                comp += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = lzw_decode(bytes(comp), min_code)
            if ipacked & 0x40:  # interlaced: four-pass row ordering
                deinter = bytearray(len(idx))
                src = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for row in range(start, ih, step):
                        deinter[row * iw : (row + 1) * iw] = idx[src : src + iw]
                        src += iw
                idx = bytes(deinter)
            return iw, ih, palette, idx
        if marker == 0x21:  # extension: skip sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif marker == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
    raise ValueError("no image data in GIF")


def gif_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic GIF fixture mirroring :func:`png_table`: each
    doc's first ``width*height`` UTF-8 bytes (space-padded) become the
    palette indices of a real LZW-compressed GIF87a; height = id%3+1."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                h = int(mid) % 3 + 1
                raw = str(text).encode("utf-8")[: GIF_WIDTH * h]
                raw = raw + b" " * (GIF_WIDTH * h - len(raw))
                out.append(
                    {"media_id": int(mid), "mime": "image/gif", "content": gif_bytes(int(mid), raw)}
                )
            yield pd.DataFrame(out, columns=["media_id", "mime", "content"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(build, schema=schema)


def decode_gif_pixels(media: DataFrame) -> DataFrame:
    """Full GIF decode in the Arrow-batched ``mapInPandas`` tier:
    sub-block reassembly, LZW dictionary decode, palette lookup from
    the file's own global color table, then per-channel statistics
    (same output schema as the BMP/PNG decoders)."""

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(mid: int, blob: bytes) -> dict:
            width, height, palette, idx = decode_gif_bytes(blob)
            pal = np.asarray(palette, dtype=np.int64)
            px = pal[np.frombuffer(idx, dtype=np.uint8)]
            rsum, gsum, bsum = (int(px[:, i].sum()) for i in range(3))
            n = px.shape[0]
            luma = (0.299 * rsum + 0.587 * gsum + 0.114 * bsum) / n
            return {
                "media_id": mid,
                "width": width,
                "height": height,
                "n_pixels": n,
                "sum_b": bsum,
                "sum_g": gsum,
                "sum_r": rsum,
                "mean_luma": float(luma),
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(m, c) for m, c in zip(pdf["media_id"], pdf["content"])],
                columns=[f.name for f in _BMP_PIXEL_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(decode, schema=_BMP_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# M-JPEG: baseline JPEG (SOF0) decode from scratch — the THIRD real
# codec tier and the one the decode_image plug-in slot documented as
# missing: entropy coding (canonical Huffman from the file's own DHT
# segments) + transform coding (dequant, de-zigzag, 2D IDCT, level
# shift), stdlib+numpy only. The fixture encoder emits DC-only
# grayscale JPEGs whose decode is integer-EXACT (flat 8x8 blocks,
# Q00=8 ⇒ pixel == payload byte bit-for-bit), so the DuckDB oracle is
# closed-form; foreign baseline files (Java ImageIO) decode through
# the general path — full AC run-length, successive DC prediction,
# restart markers, 1-component or 3-component 4:4:4 with BT.601
# YCbCr->RGB — and are cross-validated against ImageIO's own decode
# in tests/test_media.py.
# ---------------------------------------------------------------------------

JPEG_BLOCKS_W = 2  # fixture width: 2 blocks = 16 px


def _zigzag_order() -> list[int]:
    """Zigzag-position -> natural-position (row*8+col) map, generated
    by the diagonal walk so there is no 64-entry constant to mistype."""
    out = []
    for d in range(15):
        pts = [(i, d - i) for i in range(d + 1) if i < 8 and d - i < 8]
        if d % 2 == 0:
            pts = pts[::-1]
        out += [r * 8 + c for r, c in pts]
    return out


_JPEG_ZIGZAG = _zigzag_order()


class _JBitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        while self.nbits:  # pad with 1-bits per the spec
            self.write(1, 1)
        return bytes(self.out)


def jpeg_bytes(media_id: int, payload: bytes, blocks_w: int = JPEG_BLOCKS_W) -> bytes:
    """A valid baseline grayscale JPEG whose 8x8 blocks are FLAT, one
    block per payload byte (row-major, ``blocks_w`` blocks per row):
    quantized DC = v - 128 with Q00 = 8, all AC zero — DC-only blocks
    IDCT to an exact constant, so decode reproduces ``payload``
    bit-for-bit (the property the oracle's closed form relies on).
    Emits its OWN canonical Huffman tables in DHT (DC categories 0-8
    at 4 bits, AC EOB at 2 bits); any conformant decoder reads them
    from the file."""
    import struct

    n_blocks = len(payload)
    blocks_h = n_blocks // blocks_w
    width, height = blocks_w * 8, blocks_h * 8
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, 8-bit, Q[0]=8 and 1 elsewhere (natural order 0 is
    # zigzag 0 — the DC slot)
    q = bytes([8] + [1] * 63)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + q
    # DHT: DC table 0 — 9 symbols (categories 0..8), all 4-bit codes
    bits_dc = bytes([0, 0, 0, 9] + [0] * 12)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 9, 0x00) + bits_dc + bytes(range(9))
    # DHT: AC table 0 — single EOB symbol at 2 bits (code 00; the
    # all-ones codeword stays unused per the spec's convention)
    bits_ac = bytes([0, 1] + [0] * 14)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 1, 0x10) + bits_ac + bytes([0x00])
    # SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes([1, 0x11, 0])
    # SOS: component 1 uses DC 0 / AC 0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    bw = _JBitWriter()
    # canonical codes: DC category s -> code s at 4 bits (first 9 codes
    # of length 4 are 0..8); AC EOB -> code 0 at 2 bits
    prev = 0
    for v in payload:
        dc = v - 128
        diff = dc - prev
        prev = dc
        s = diff.bit_length() if diff else 0
        bw.write(s, 4)  # DC Huffman code (canonical: value == index)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        bw.write(0, 2)  # AC EOB
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_bytes_progressive(media_id: int, payload: bytes, blocks_w: int = JPEG_BLOCKS_W) -> bytes:
    """The SAME flat DC-only fixture as :func:`jpeg_bytes`, written as
    a PROGRESSIVE (SOF2) stream with a real three-scan successive-
    approximation script:

      1. DC first scan, Al=1 — diff-codes ``dc >> 1`` (decoder shifts
         back up, so the first scan alone renders a coarse image),
      2. AC first scan Ss=1..63, Al=0 — one EOBn RUN covering every
         block (exercises the EOB-run machinery, not per-block EOB),
      3. DC refinement scan, Ah=1/Al=0 — one raw appended bit per
         block (``dc & 1``).

    ``(dc >> 1) << 1 | (dc & 1) == dc`` exactly (two's complement), so
    the progressive stream decodes bit-for-bit to ``payload`` like the
    baseline fixture — lossy format, lossless fixture."""
    import struct

    n_blocks = len(payload)
    blocks_h = n_blocks // blocks_w
    width, height = blocks_w * 8, blocks_h * 8
    out = bytearray(b"\xff\xd8")  # SOI
    q = bytes([8] + [1] * 63)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + q
    # DC table 0: categories 0..8 at 4 bits (canonical: value == index)
    bits_dc = bytes([0, 0, 0, 9] + [0] * 12)
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 9, 0x00) + bits_dc + bytes(range(9))
    # AC table 0: the fifteen EOBn symbols (r<<4 for r=0..14) at 4 bits
    bits_ac = bytes([0, 0, 0, 15] + [0] * 12)
    eobn = bytes(r << 4 for r in range(15))
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 15, 0x10) + bits_ac + eobn
    # SOF2: 8-bit, 1 component, 1x1 sampling, quant table 0
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, height, width, 1) + bytes([1, 0x11, 0])

    # scan 1: DC first, Al=1 — diff-code dc >> 1
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x01])
    bw = _JBitWriter()
    prev = 0
    for v in payload:
        hi = (v - 128) >> 1
        diff = hi - prev
        prev = hi
        s = diff.bit_length() if diff else 0
        bw.write(s, 4)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += bw.flush()

    # scan 2: AC first, band 1..63, Al=0 — EOBn runs spanning all blocks
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x00])
    bw = _JBitWriter()
    remaining = n_blocks
    while remaining:
        r = min(remaining.bit_length() - 1, 14)
        run = min(remaining, (1 << r) * 2 - 1)  # 2^r + r extension bits
        bw.write(r, 4)  # EOBn Huffman code (canonical code == index r)
        if r:
            bw.write(run - (1 << r), r)
        remaining -= run
    out += bw.flush()

    # scan 3: DC refinement, Ah=1/Al=0 — one appended bit per block
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x10])
    bw = _JBitWriter()
    for v in payload:
        bw.write((v - 128) & 1, 1)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _huff_table(bits: bytes, vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JBitReader:
    """MSB-first entropy-segment reader: unstuffs 0xFF00, surfaces
    RSTn markers, stops at any other marker (EOI)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        b = self.data
        if self.pos >= len(b):
            return False
        byte = b[self.pos]
        if byte == 0xFF:
            # a run of 0xFF bytes before a marker is legal fill
            # (ITU T.81 B.1.1.2): collapse it to the final FF + code
            while self.pos + 1 < len(b) and b[self.pos + 1] == 0xFF:
                self.pos += 1
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # RSTn / EOI: entropy data ends here
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            # A well-formed scan never needs bits past its entropy
            # segment (padding bits live inside the final data byte),
            # so a stall means truncation or a misplaced marker —
            # error out instead of decoding garbage silently.
            at = f"marker FF{self.marker:02X}" if self.marker is not None else "end of data"
            raise ValueError(f"JPEG entropy stream stalled at {at} mid-scan")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Byte-align, consume the pending RSTn marker."""
        self.acc, self.nbits = 0, 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None


def _receive_extend(br: _JBitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _triangle_upsample2(a, axis: int):
    """Factor-2 chroma upsample with libjpeg's 'fancy' triangle filter
    (3:1 nearest/next weights, edge replication — the 9:3:3:1 2-D
    kernel when applied on both axes), in float."""
    import numpy as np

    a = np.moveaxis(a, axis, 0)
    prev = np.concatenate([a[:1], a[:-1]], axis=0)
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    even = (3.0 * a + prev) / 4.0
    odd = (3.0 * a + nxt) / 4.0
    out = np.empty((a.shape[0] * 2,) + a.shape[1:], dtype=np.float64)
    out[0::2] = even
    out[1::2] = odd
    return np.moveaxis(out, 0, axis)


def _jpeg_finish(planes, comps, w, h, hmax, vmax):
    """Shared tail of baseline and progressive decode: triangle-filter
    chroma upsampling, crop to frame dims, BT.601 color conversion."""
    import numpy as np

    out = []
    for p_, (_, _, hc, vc) in zip(planes, comps):
        for axis, factor in ((0, vmax // vc), (1, hmax // hc)):
            if factor == 2:
                p_ = _triangle_upsample2(p_, axis)
        out.append(p_[:h, :w])
    if len(out) == 1:
        return w, h, np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255) for c in (r, g, bl)], axis=-1
    ).astype(np.uint8)
    return w, h, rgb


def _jpeg_prog_scan(
    b, data_start, scan_sel, comps, coeff, huff_dc, huff_ac,
    ss, se, ah, al, mcus_x, mcus_y, w, h, hmax, vmax, restart_interval,
):
    """Decode ONE progressive scan (ITU T.81 G.2), accumulating into
    the per-component coefficient arrays. ``scan_sel`` is
    [(ci, dc_tid, ac_tid)]. Returns the byte offset of the next
    marker. The four scan kinds: DC first (Ah=0, Ss=0, diff-coded,
    value << Al), DC refinement (one raw bit per block, |= 1<<Al),
    AC first (per-band run-length with EOB runs), AC refinement
    (correction bits for already-coded coefficients plus new ±1<<Al
    insertions — the libjpeg decode_mcu_AC_refine control flow)."""
    if ss == 0 and se != 0:
        raise ValueError("invalid progressive scan: DC scan must have Se=0")
    if ss > 0 and len(scan_sel) > 1:
        raise ValueError("invalid progressive scan: AC scans are single-component")
    br = _JBitReader(b, data_start)
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    preds = {ci: 0 for ci, _, _ in scan_sel}

    def units():
        """(unit, ci, by, bx) in scan order: MCU-interleaved when the
        scan has several components, component-raster otherwise (the
        non-interleaved grid is the component's OWN ceil-block dims,
        not the MCU-padded grid)."""
        if len(scan_sel) > 1:
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, _, _ in scan_sel:
                        _, _, hc, vc = comps[ci]
                        for v_ in range(vc):
                            for h_ in range(hc):
                                yield unit, ci, my * vc + v_, mx * hc + h_
                    unit += 1
        else:
            ci = scan_sel[0][0]
            _, _, hc, vc = comps[ci]
            wb = (-(-w * hc // hmax) + 7) // 8
            hb = (-(-h * vc // vmax) + 7) // 8
            unit = 0
            for by in range(hb):
                for bx in range(wb):
                    yield unit, ci, by, bx
                    unit += 1

    tabs = {ci: (dc_t, ac_t) for ci, dc_t, ac_t in scan_sel}
    prev_unit = 0
    for unit, ci, by, bx in units():
        if restart_interval and unit != prev_unit and unit % restart_interval == 0:
            br.sync_restart()
            preds = {c: 0 for c in preds}
            eobrun = 0
        prev_unit = unit
        block = coeff[ci][by][bx]
        dc_t, ac_t = tabs[ci]
        if ss == 0:  # DC scan (Se is 0 by spec)
            if ah == 0:  # first pass: diff-coded, scaled by 2^Al
                s = br.huff(huff_dc[dc_t])
                preds[ci] += _receive_extend(br, s)
                block[0] = preds[ci] << al
            elif br.bit():  # refinement: one appended bit
                block[0] |= p1
            continue
        # AC scans are single-component by spec
        k = ss
        if ah == 0:  # AC first pass
            if eobrun > 0:
                eobrun -= 1  # block is entirely zero in this scan
                continue
            while k <= se:
                rs = br.huff(huff_ac[ac_t])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    # EOBn: the run INCLUDES this block, so store run-1
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index past spectral band")
                block[_JPEG_ZIGZAG[k]] = _receive_extend(br, s) << al
                k += 1
        else:  # AC refinement pass (libjpeg decode_mcu_AC_refine flow)
            if eobrun == 0:
                while k <= se:
                    rs = br.huff(huff_ac[ac_t])
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r < 15:
                            # refinement EOBn: FULL run; the common tail
                            # below refines this block then decrements
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: ZRL — sixteen zero-history skips below
                    else:  # s is always 1 in a refinement scan
                        val = p1 if br.bit() else m1
                    while k <= se:
                        z = _JPEG_ZIGZAG[k]
                        cv = block[z]
                        if cv != 0:
                            if br.bit() and (cv & p1) == 0:
                                block[z] = cv + (p1 if cv >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        block[_JPEG_ZIGZAG[k]] = val
                    k += 1
            if eobrun > 0:
                # inside an EOB run the block's already-coded
                # coefficients still receive correction bits
                while k <= se:
                    z = _JPEG_ZIGZAG[k]
                    cv = block[z]
                    if cv != 0:
                        if br.bit() and (cv & p1) == 0:
                            block[z] = cv + (p1 if cv >= 0 else m1)
                    k += 1
                eobrun -= 1
    # byte-align and locate the next marker (skip stuffing + restarts)
    p = br.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:
                p += 2
                continue
            break
        p += 1
    return p


def decode_jpeg_bytes(blob: bytes):
    """JPEG decode: returns (width, height, pixels) where pixels is a
    numpy uint8 array of shape (h, w) for grayscale or (h, w, 3) RGB
    for 3 components (BT.601), including subsampled 4:2:0 / 4:2:2
    frames (per-component MCU block interleave, triangle chroma
    upsampling). Decodes baseline (SOF0) single-scan frames AND
    progressive (SOF2) multi-scan frames — spectral selection,
    successive approximation, DC/AC refinement, EOB runs — the latter
    cross-validated against javax.imageio's progressive encoder in
    tests/test_media.py."""
    import struct

    import numpy as np

    b = bytes(blob)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coeff: list | None = None  # progressive: per-comp block coeff arrays
    mcu_dims = None
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI (progressive reaches it; baseline returns at SOS)
            break
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p : p + n]
                vals = (
                    list(struct.unpack(f">{64}H", raw)) if prec else list(raw)
                )
                nat = [0] * 64
                for zz, natpos in enumerate(_JPEG_ZIGZAG):
                    nat[natpos] = vals[zz]
                qtables[tid] = nat
                p += n
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = seg[p + 1 : p + 17]
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                (huff_ac if cls else huff_dc)[tid] = _huff_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = seg[6 + 3 * c : 9 + 3 * c]
                hc, vc = sampling >> 4, sampling & 0x0F
                if not (1 <= hc <= 2 and 1 <= vc <= 2):
                    raise ValueError(f"unsupported sampling factor {hc}x{vc}")
                comps.append((cid, tq, hc, vc))
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF marker 0x{marker:02x} (SOF0/SOF2 only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            comp_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp_tables[cid] = (tt >> 4, tt & 0x0F)
            w, h, comps = frame
            if progressive:
                hmax = max(hc for _, _, hc, _ in comps)
                vmax = max(vc for _, _, _, vc in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                if coeff is None:
                    coeff = [
                        np.zeros((mcus_y * vc, mcus_x * hc, 64), dtype=np.int32)
                        for _, _, hc, vc in comps
                    ]
                ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah_al = seg[3 + 2 * ns]
                ah_, al_ = ah_al >> 4, ah_al & 0x0F
                cid_to_ci = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
                scan_sel = [
                    (cid_to_ci[cid], dc_t, ac_t)
                    for cid, (dc_t, ac_t) in comp_tables.items()
                ]
                pos = _jpeg_prog_scan(
                    b, pos + seglen, scan_sel, comps, coeff, huff_dc, huff_ac,
                    ss_, se_, ah_, al_, mcus_x, mcus_y, w, h, hmax, vmax,
                    restart_interval,
                )
                continue
            hmax = max(hc for _, _, hc, _ in comps)
            vmax = max(vc for _, _, _, vc in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            u = np.arange(8)
            m = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16) / 2.0
            m[:, 0] /= np.sqrt(2.0)
            # each component decodes at ITS sampling resolution; chroma
            # upsamples after the scan with the triangle filter
            planes = [
                np.zeros((mcus_y * 8 * vc, mcus_x * 8 * hc), dtype=np.float64)
                for _, _, hc, vc in comps
            ]
            br = _JBitReader(b, pos + seglen)
            pred = [0] * len(comps)
            mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        br.sync_restart()
                        pred = [0] * len(comps)
                    mcu += 1
                    for ci, (cid, tq, hc, vc) in enumerate(comps):
                        dc_t, ac_t = comp_tables[cid]
                        q = qtables[tq]
                        for v_ in range(vc):  # blocks raster-ordered in the MCU
                            for h_ in range(hc):
                                coeffs = [0] * 64
                                s = br.huff(huff_dc[dc_t])
                                pred[ci] += _receive_extend(br, s)
                                coeffs[0] = pred[ci] * q[0]
                                k = 1
                                while k < 64:
                                    rs = br.huff(huff_ac[ac_t])
                                    r, sz = rs >> 4, rs & 0x0F
                                    if rs == 0x00:
                                        break  # EOB
                                    if rs == 0xF0:
                                        k += 16  # ZRL
                                        continue
                                    k += r
                                    if k > 63:
                                        raise ValueError("AC index overflow")
                                    natpos = _JPEG_ZIGZAG[k]
                                    coeffs[natpos] = _receive_extend(br, sz) * q[natpos]
                                    k += 1
                                F_ = np.asarray(coeffs, dtype=np.float64).reshape(8, 8)
                                block = m @ F_ @ m.T + 128.0
                                oy = (my * vc + v_) * 8
                                ox = (mx * hc + h_) * 8
                                planes[ci][oy : oy + 8, ox : ox + 8] = block
            return _jpeg_finish(planes, comps, w, h, hmax, vmax)
        pos += seglen
    if progressive and coeff is not None:
        # all scans accumulated: dequantize + batched IDCT per component
        w, h, comps = frame
        hmax = max(hc for _, _, hc, _ in comps)
        vmax = max(vc for _, _, _, vc in comps)
        u = np.arange(8)
        m = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16) / 2.0
        m[:, 0] /= np.sqrt(2.0)
        planes = []
        for ci, (cid, tq, hc, vc) in enumerate(comps):
            q = np.asarray(qtables[tq], dtype=np.float64)
            by, bx = coeff[ci].shape[0], coeff[ci].shape[1]
            blocks = coeff[ci].astype(np.float64) * q  # (by, bx, 64)
            f = blocks.reshape(by, bx, 8, 8)
            # batched 2-D IDCT: m @ F @ m.T over the trailing axes
            sp = np.einsum("iu,yxuv,jv->yxij", m, f, m) + 128.0
            plane = sp.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
            planes.append(plane)
        return _jpeg_finish(planes, comps, w, h, hmax, vmax)
    raise ValueError("no SOS segment in JPEG")


_JPEG_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_luma", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def jpeg_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    progressive: bool = False,
) -> DataFrame:
    """Deterministic JPEG fixture: per doc, the first ``2*(id%3+1)``
    UTF-8 bytes (space-padded) become flat 8x8 block values of a
    DC-only grayscale JPEG (2 blocks wide) — lossy format, lossless
    fixture: DC-only blocks decode integer-exactly. With
    ``progressive=True`` the SAME pixels are written as an SOF2
    multi-scan successive-approximation stream
    (:func:`jpeg_bytes_progressive`)."""

    enc = jpeg_bytes_progressive if progressive else jpeg_bytes

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                n_blocks = 2 * (int(mid) % 3 + 1)
                raw = str(text).encode("utf-8")[:n_blocks]
                raw = raw + b" " * (n_blocks - len(raw))
                out.append(
                    {
                        "media_id": int(mid),
                        "mime": "image/jpeg",
                        "content": enc(int(mid), raw),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "mime", "content"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(build, schema=schema)


def decode_jpeg_pixels(media: DataFrame) -> DataFrame:
    """Full baseline-JPEG decode in the Arrow-batched ``mapInPandas``
    tier: marker walk, in-file Huffman tables, entropy decode,
    dequant, IDCT, level shift — then integer luma statistics."""

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(mid: int, blob: bytes) -> dict:
            w, h, px = decode_jpeg_bytes(blob)
            if px.ndim == 3:  # color: BT.601 luma
                luma = np.round(
                    0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                ).astype(np.int64)
            else:
                luma = px.astype(np.int64)
            n = int(luma.size)
            s = int(luma.sum())
            return {
                "media_id": mid,
                "width": w,
                "height": h,
                "n_pixels": n,
                "sum_luma": s,
                "mean_luma": s / n,
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(m, c) for m, c in zip(pdf["media_id"], pdf["content"])],
                columns=[f.name for f in _JPEG_PIXEL_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(decode, schema=_JPEG_PIXEL_SCHEMA)


#: standard luminance quantization table (JPEG Annex K.1), natural order
_JPEG_STD_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def jpeg_encode_gray(pixels, quality: int = 85) -> bytes:
    """FULL baseline JPEG encoder (the DC-only fixture's big sibling):
    forward 2D DCT per 8x8 block, libjpeg-style quality scaling of the
    Annex-K luminance table, zigzag, DC differential + AC run-length
    coding (ZRL/EOB) under fixed canonical Huffman tables emitted in
    the file's own DHT (DC categories at 4 bits, all 162 AC symbols at
    8 bits — valid, deliberately simple). Grayscale, 8-bit,
    dimensions padded to block multiples by edge replication.
    Round-trip + foreign-decoder validation in tests/test_media.py."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge")
    # quality-scaled quantization table (libjpeg jpeg_quality_scaling)
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qtab = np.clip((np.asarray(_JPEG_STD_LUMA_Q) * scale + 50) // 100, 1, 255).astype(np.int64)
    u = np.arange(8)
    m = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16) / 2.0
    m[:, 0] /= np.sqrt(2.0)

    out = bytearray(b"\xff\xd8")
    zz = _JPEG_ZIGZAG
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes(int(qtab[n]) for n in zz)
    # DC table: categories 0..11 at 4 bits
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 12, 0x00)
    out += bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
    # AC table: EOB, ZRL and every (run 0-15, size 1-10) symbol at 8 bits
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | sz for r in range(16) for sz in range(1, 11)
    ]
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(ac_syms), 0x10)
    out += bytes([0] * 7 + [len(ac_syms)] + [0] * 8) + bytes(ac_syms)
    ac_code = {sym: i for i, sym in enumerate(ac_syms)}  # canonical 8-bit
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    bw = _JBitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw_):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            F_ = m.T @ block @ m
            coeffs = np.round(F_.reshape(64) / qtab).astype(np.int64)
            zzc = [int(coeffs[n]) for n in zz]
            diff = zzc[0] - prev_dc
            prev_dc = zzc[0]
            s = diff.bit_length() if diff else 0
            bw.write(s, 4)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zzc[i]), default=0)
            for i in range(1, last_nz + 1):
                v = zzc[i]
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    bw.write(ac_code[0xF0], 8)  # ZRL
                    run -= 16
                sz = abs(v).bit_length()
                bw.write(ac_code[(run << 4) | sz], 8)
                bw.write(v if v > 0 else v + (1 << sz) - 1, sz)
                run = 0
            if last_nz < 63:
                bw.write(ac_code[0x00], 8)  # EOB
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# M-TIFF — real TIFF container (IFD metadata tree) + PackBits RLE codec
# ---------------------------------------------------------------------------

TIFF_WIDTH = 16

#: TIFF tag ids used by the writer/reader (TIFF 6.0 spec §8)
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMP, _T_PHOTO = 256, 257, 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_CNT = 273, 277, 278, 279
_PACKBITS = 32773


def packbits_encode(data: bytes) -> bytes:
    """From-scratch PackBits (TIFF 6.0 §9 / Apple RLE): replicate runs
    of n>=3 emit (257-n, byte); literal stretches emit (n-1, bytes),
    both capped at 128. The -128 no-op code is never emitted."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        lit_start = i
        i = j
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        chunk = data[lit_start:min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    """PackBits inverse: n in 0..127 copies n+1 literal bytes, n in
    129..255 replicates the next byte 257-n times, 128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            out.extend(data[i : i + c + 1])
            i += c + 1
        elif c > 128:
            out.extend(data[i : i + 1] * (257 - c))
            i += 1
        # 128: no-op
    return bytes(out)


def _le(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "little")


def tiff_bytes(media_id: int, payload: bytes, width: int = TIFF_WIDTH) -> bytes:
    """A real little-endian TIFF 6.0 file: 8-byte header, one
    PackBits-compressed grayscale strip, and a 9-entry IFD (width,
    height, bits, compression, photometric, strip offset/count,
    samples, rows-per-strip). Readable by any TIFF implementation
    (javax.imageio cross-validates in tests)."""
    height = len(payload) // width
    strip = packbits_encode(payload)
    # layout: header(8) | strip | IFD
    strip_off = 8
    ifd_off = strip_off + len(strip)
    if ifd_off % 2:  # IFDs must be word-aligned
        strip = strip + b"\x00"
        ifd_off += 1
    head = b"II" + _le(42, 2) + _le(ifd_off, 4)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        return _le(tag, 2) + _le(typ, 2) + _le(count, 4) + _le(value, 4)

    entries = [
        entry(_T_WIDTH, 3, 1, width),
        entry(_T_HEIGHT, 3, 1, height),
        entry(_T_BITS, 3, 1, 8),
        entry(_T_COMP, 3, 1, _PACKBITS),
        entry(_T_PHOTO, 3, 1, 1),  # BlackIsZero
        entry(_T_STRIP_OFF, 4, 1, strip_off),
        entry(_T_SPP, 3, 1, 1),
        entry(_T_ROWS_PER_STRIP, 3, 1, height),
        entry(_T_STRIP_CNT, 4, 1, len(packbits_encode(payload))),
    ]
    ifd = _le(len(entries), 2) + b"".join(entries) + _le(0, 4)
    return head + strip + ifd


def decode_tiff_bytes(blob: bytes) -> tuple[int, int, bytes]:
    """Parse a single-strip TIFF: byte order (II/MM both), IFD walk,
    PackBits or uncompressed strip. Returns (width, height, pixels)."""
    if blob[:2] == b"II":
        order = "little"
    elif blob[:2] == b"MM":
        order = "big"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")

    def rd(off: int, n: int) -> int:
        return int.from_bytes(blob[off : off + n], order)

    if rd(2, 2) != 42:
        raise ValueError("not a TIFF: bad magic")
    ifd = rd(4, 4)
    n_entries = rd(ifd, 2)
    tags: dict[int, int] = {}
    for k in range(n_entries):
        e = ifd + 2 + 12 * k
        tag, typ = rd(e, 2), rd(e + 2, 2)
        # inline SHORT/LONG scalar values only (all this writer emits)
        tags[tag] = rd(e + 8, 2 if typ == 3 else 4)
    width, height = tags[_T_WIDTH], tags[_T_HEIGHT]
    comp = tags.get(_T_COMP, 1)
    off, cnt = tags[_T_STRIP_OFF], tags[_T_STRIP_CNT]
    strip = blob[off : off + cnt]
    pixels = packbits_decode(strip) if comp == _PACKBITS else bytes(strip)
    if len(pixels) != width * height:
        raise ValueError(f"strip decodes to {len(pixels)}, want {width * height}")
    return width, height, pixels


def tiff_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic TIFF fixture mirroring :func:`gif_table`: each
    doc's first ``width*height`` UTF-8 bytes (space-padded) become a
    PackBits-compressed grayscale strip; height = id%3+1."""

    def build(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                h = int(mid) % 3 + 1
                raw = str(text).encode("utf-8")[: TIFF_WIDTH * h]
                raw = raw + b" " * (TIFF_WIDTH * h - len(raw))
                out.append(
                    {"media_id": int(mid), "mime": "image/tiff",
                     "content": tiff_bytes(int(mid), raw)}
                )
            yield pd.DataFrame(out, columns=["media_id", "mime", "content"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(build, schema=schema)


def decode_tiff_pixels(media: DataFrame) -> DataFrame:
    """Arrow-batched TIFF decode: container parse + PackBits expansion
    per blob, grayscale pixel sum + mean luma per image."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                w, h, px = decode_tiff_bytes(bytes(blob))
                s = sum(px)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        "sum_v": s,
                        "mean_luma": round(s / (w * h), 6),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_pixels", "sum_v", "mean_luma"],
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("sum_v", T.LongType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )
    return media.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# M7 — perceptual image hashing (aHash + dHash) and Hamming near-dup pairs
# ---------------------------------------------------------------------------

#: perceptual hashes are computed over a fixed GRID x GRID downsample
#: (dHash uses GRID+1 columns), the classic 64-bit aHash/dHash layout
PHASH_GRID = 8

_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("a_hi", T.LongType()),
        T.StructField("a_lo", T.LongType()),
        T.StructField("d_hi", T.LongType()),
        T.StructField("d_lo", T.LongType()),
    ]
)


def _parse_bmp_pixels(blob: bytes):
    """Top-down h x w x 3 BGR byte array from a 24-bit BMP blob
    (shared by decode_bmp_pixels' stats path and the hash path)."""
    import numpy as np

    b = bytes(blob)
    if b[:2] != b"BM":
        raise ValueError("not a BMP container")
    offset = int.from_bytes(b[10:14], "little")
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = int.from_bytes(b[22:26], "little", signed=True)
    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    rows = []
    for r in range(abs(height)):
        start = offset + r * stride
        rows.append(np.frombuffer(b[start : start + row_bytes], dtype=np.uint8))
    px = np.stack(rows[::-1] if height > 0 else rows).reshape(abs(height), width, 3)
    return px.astype(np.int64)


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """64-bit aHash + dHash per image — the image-dedup signature a
    training-data pipeline computes before Hamming-distance blocking
    (re-expresses the reference's content-hash dedup idea,
    walletDataConsumer.py's full-refresh snapshot, at the perceptual
    level where re-encoded/resized copies still collapse).

    The decoded pixel array is downsampled to an 8x8 grid (8x9 for
    dHash) by NEAREST NEIGHBOR — src = (dst * size) // 8 — and
    grayscaled with integer ITU-R BT.601 weights (299/587/114, scale
    1000), so every step is exact integer arithmetic a SQL oracle can
    replay. aHash bit(i,j) = 64*g(i,j) > sum(g); dHash bit(i,j) =
    g(i,j+1) > g(i,j). Each 64-bit hash ships as two 32-bit halves in
    BIGINT columns (bit 63 never touches a sign bit on either engine).
    Arrow-batched mapInPandas; O(n), no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        g8 = PHASH_GRID

        def one(mid: int, blob: bytes) -> dict:
            px = _parse_bmp_pixels(blob)
            h, w = px.shape[0], px.shape[1]
            # integer luma (scale 1000): BGR byte order in BMP rows
            lum = 299 * px[:, :, 2] + 587 * px[:, :, 1] + 114 * px[:, :, 0]

            def grid(cols: int) -> "np.ndarray":
                si = (np.arange(g8) * h) // g8
                sj = (np.arange(cols) * w) // cols
                return lum[np.ix_(si, sj)]

            ga = grid(g8)
            total = int(ga.sum())
            a_bits = (ga * (g8 * g8) > total).astype(np.int64)
            gd = grid(g8 + 1)
            d_bits = (gd[:, 1:] > gd[:, :-1]).astype(np.int64)

            def halves(bits: "np.ndarray") -> tuple[int, int]:
                flat = bits.reshape(-1)
                lo = sum(int(flat[k]) << k for k in range(32))
                hi = sum(int(flat[k]) << (k - 32) for k in range(32, 64))
                return hi, lo

            a_hi, a_lo = halves(a_bits)
            d_hi, d_lo = halves(d_bits)
            return {
                "media_id": mid, "a_hi": a_hi, "a_lo": a_lo,
                "d_hi": d_hi, "d_lo": d_lo,
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(int(m), c) for m, c in zip(pdf["media_id"], pdf["content"])],
                columns=[f.name for f in _PHASH_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(run, schema=_PHASH_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame, cap: int = 40, max_hamming: int = 10
) -> DataFrame:
    """Hamming-distance near-duplicate pairs by BANDED blocking over the
    aHash — the image twin of the MinHash-LSH text path (never
    all-pairs): the 64-bit hash splits into four 16-bit bands; images
    sharing any band value become candidates (pigeonhole: hamming <= 3
    guarantees a shared band, larger distances are caught
    probabilistically exactly as text LSH does); one shuffle on
    (band, value), buckets larger than ``cap`` are dropped
    DETERMINISTICALLY (boilerplate images — the df-cap rule the shingle
    pipelines use), candidates verified with exact
    bit_count(xor) Hamming over both halves. All JVM codegen after the
    hash UDF; scales as O(n) + sum(bucket^2 <= cap^2)."""
    bands = []
    for idx, expr in enumerate(
        ["a_lo & 65535", "(a_lo >> 16) & 65535", "a_hi & 65535", "(a_hi >> 16) & 65535"]
    ):
        bands.append(
            hashes.select(
                F.lit(idx).alias("band"),
                F.expr(expr).alias("band_val"),
                "media_id", "a_hi", "a_lo", "d_hi", "d_lo",
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    from pyspark.sql import Window

    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "band_val"))
    ).filter(F.col("bucket_n") <= cap)
    a = sized.select(
        "band", "band_val",
        F.col("media_id").alias("doc_a"),
        F.col("a_hi").alias("ah_a"), F.col("a_lo").alias("al_a"),
        F.col("d_hi").alias("dh_a"), F.col("d_lo").alias("dl_a"),
    )
    b = sized.select(
        "band", "band_val",
        F.col("media_id").alias("doc_b"),
        F.col("a_hi").alias("ah_b"), F.col("a_lo").alias("al_b"),
        F.col("d_hi").alias("dh_b"), F.col("d_lo").alias("dl_b"),
    )
    cand = (
        a.join(b, on=["band", "band_val"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            (F.expr("bit_count(ah_a ^ ah_b) + bit_count(al_a ^ al_b)")).alias("hamming_a"),
            (F.expr("bit_count(dh_a ^ dh_b) + bit_count(dl_a ^ dl_b)")).alias("hamming_d"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming_a") <= max_hamming)


# ---------------------------------------------------------------------------
# M8 — audio feature extraction over decoded PCM (the audio-modality
# "embedding" step of a training-data pipeline)
# ---------------------------------------------------------------------------

_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("zcr", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("centroid_consistent", T.BooleanType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Signal features over REAL-decoded WAV PCM: zero-crossing count
    and energy (sum of squared samples) in EXACT integer arithmetic a
    SQL oracle replays sample-for-sample, plus a spectral-centroid
    self-consistency verdict — the centroid is computed TWICE by
    independent implementations (numpy rfft vs a from-first-principles
    O(n^2) direct DFT with math.cos/sin) and the verdict records that
    they agree to 1e-9 relative, the cross-validation pattern the KNN/
    LSH recall verdicts use where bit-exact SQL replay isn't possible
    (FFT butterflies reorder float additions). Arrow-batched
    mapInPandas, O(n), no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        def centroid_direct(v) -> tuple[float, float]:
            n = len(v)
            num = den = 0.0
            for k in range(n // 2 + 1):
                re = sum(float(v[t]) * math.cos(2 * math.pi * k * t / n) for t in range(n))
                im = sum(-float(v[t]) * math.sin(2 * math.pi * k * t / n) for t in range(n))
                mag = math.hypot(re, im)
                num += k * mag
                den += mag
            return num, den

        def one(mid: int, blob: bytes) -> dict:
            b = bytes(blob)
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError(f"media_id {mid}: not a RIFF/WAVE container")
            pos, data = 12, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                size = int.from_bytes(b[pos + 4 : pos + 8], "little")
                if cid == b"data":
                    data = b[pos + 8 : pos + 8 + size]
                pos += 8 + size + (size & 1)
            if data is None:
                raise ValueError(f"media_id {mid}: missing data chunk")
            v = np.frombuffer(data, dtype="<i2").astype(np.int64)
            zcr = int(((v[1:] < 0) != (v[:-1] < 0)).sum()) if len(v) > 1 else 0
            sum_sq = int((v * v).sum())
            mags = np.abs(np.fft.rfft(v.astype(np.float64)))
            den_fft = float(mags.sum())
            num_fft = float((np.arange(len(mags)) * mags).sum())
            num_dir, den_dir = centroid_direct(v)
            c_fft = num_fft / den_fft if den_fft > 0 else 0.0
            c_dir = num_dir / den_dir if den_dir > 0 else 0.0
            ok = abs(c_fft - c_dir) <= 1e-9 * max(1.0, abs(c_dir))
            return {
                "media_id": mid, "n_samples": len(v), "zcr": zcr,
                "sum_sq": sum_sq, "centroid_consistent": bool(ok),
            }

        for pdf in batches:
            yield pd.DataFrame(
                [one(int(m), c) for m, c in zip(pdf["media_id"], pdf["content"])],
                columns=[f.name for f in _AUDIO_FEAT_SCHEMA.fields],
            )

    return media.select("media_id", "content").mapInPandas(run, schema=_AUDIO_FEAT_SCHEMA)


def decode_avi_raw_frames(media: DataFrame) -> DataFrame:
    """M9 support — the same chunk-walking AVI parse as
    :func:`decode_avi_frames`, but emitting ONE ROW PER FRAME with the
    pad-stripped pixel bytes (stored row order), so downstream
    frame-to-frame operators (scene-change SAD, per-shot sampling)
    stay in JVM codegen over a binary column instead of re-entering
    Python per comparison."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        def chunks(b: bytes, pos: int, end: int):
            while pos + 8 <= end:
                cid = b[pos : pos + 4]
                size = int.from_bytes(b[pos + 4 : pos + 8], "little")
                yield cid, pos + 8, size
                pos += 8 + size + (size & 1)

        def rows_of(mid: int, blob: bytes) -> list[dict]:
            b = bytes(blob)
            if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                raise ValueError(f"media_id {mid}: not a RIFF/AVI container")
            width = height = None
            frames: list[bytes] = []
            for cid, off, size in chunks(b, 12, len(b)):
                if cid != b"LIST":
                    continue
                ltype = b[off : off + 4]
                if ltype == b"hdrl":
                    for c2, o2, s2 in chunks(b, off + 4, off + size):
                        if c2 == b"avih":
                            width = int.from_bytes(b[o2 + 32 : o2 + 36], "little")
                            height = int.from_bytes(b[o2 + 36 : o2 + 40], "little")
                elif ltype == b"movi":
                    for c2, o2, s2 in chunks(b, off + 4, off + size):
                        if c2 == b"00db":
                            frames.append(b[o2 : o2 + s2])
            if width is None:
                raise ValueError(f"media_id {mid}: missing AVI headers")
            stride = ((width * 3 + 3) // 4) * 4
            out = []
            for idx, fr in enumerate(frames):
                raw = b"".join(
                    fr[r * stride : r * stride + width * 3] for r in range(height)
                )
                out.append(
                    {
                        "media_id": mid,
                        "n_frames": len(frames),
                        "frame_idx": idx,
                        "fbytes": raw,
                    }
                )
            return out

        for pdf in batches:
            rows = []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                rows.extend(rows_of(int(m), c))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "frame_idx", "fbytes"]
            )

    return media.mapInPandas(
        decode, schema="media_id long, n_frames long, frame_idx long, fbytes binary"
    )
