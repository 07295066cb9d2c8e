"""Multimodal (binary column) operator tests: fixture construction,
magic-byte sniffing, codegen header parsing, payload dedup across
containers, the Arrow-batched UDF tier, and the documented decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.operators.media import (
    decode_image,
    image_meta_pandas,
    media_dedup_by_payload,
    media_metadata,
    media_table,
    sniff_mime,
)


def _docs(spark):
    rows = [(0, "a png-backed doc"), (1, "a jpeg-backed doc"), (2, "a wav-backed doc"), (3, "another png doc")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_media_table_is_binary_with_magic(spark):
    media = media_table(_docs(spark))
    assert isinstance(media.schema["content"].dataType, T.BinaryType)
    rows = {r.media_id: (r.mime, bytes(r.content)) for r in media.collect()}
    assert rows[0][0] == "image/png" and rows[0][1][:8] == bytes.fromhex("89504E470D0A1A0A")
    assert rows[1][0] == "image/jpeg" and rows[1][1][:3] == bytes.fromhex("FFD8FF")
    assert rows[2][0] == "audio/wav" and rows[2][1][:4] == b"RIFF"
    # payload is the UTF-8 text after the header
    assert rows[0][1][16:] == b"a png-backed doc"


def test_media_metadata_parses_header_dims(spark):
    meta = {r.media_id: r for r in media_metadata(media_table(_docs(spark))).collect()}
    # dims must match the fixture formulas, parsed from actual bytes
    assert meta[0].width == 16 and meta[0].height == 16
    assert meta[3].width == (3 * 37) % 1920 + 16 and meta[3].height == (3 * 53) % 1080 + 16
    assert meta[2].width is None and meta[2].height is None  # audio: no dims
    assert meta[0].n_bytes == 16 + len("a png-backed doc")
    assert meta[0].sniffed_mime == "image/png" and meta[2].sniffed_mime == "audio/wav"


def test_sniff_rejects_unknown_container(spark):
    df = spark.createDataFrame([(1, bytearray(b"plain bytes, no magic"))], "id long, content binary")
    out = df.select(sniff_mime("content").alias("mime")).collect()[0]
    assert out.mime == "application/octet-stream"


def test_payload_dedup_collapses_rewrapped_asset(spark):
    docs = _docs(spark)
    original = media_table(docs)
    # same payload, different container (id shift changes mime + header)
    rewrapped = media_table(docs.select((F.col("doc_id") + 100).alias("doc_id"), "text"))
    kept = media_dedup_by_payload(original.unionByName(rewrapped))
    ids = sorted(r.media_id for r in kept.collect())
    assert ids == [0, 1, 2, 3]  # min-id survivor: originals win


def test_image_meta_udf_matches_codegen_parse(spark):
    media = media_table(_docs(spark))
    udf_meta = {r.media_id: r for r in image_meta_pandas(media).collect()}
    exp_meta = {r.media_id: r for r in media_metadata(media).collect()}
    for mid, exp in exp_meta.items():
        got = udf_meta[mid]
        assert (got.sniffed_mime, got.width, got.height) == (exp.sniffed_mime, exp.width, exp.height)
        if exp.width is not None:
            assert got.n_pixels == exp.width * exp.height


def test_decode_image_dispatches_to_in_repo_codecs():
    """The plug-in slot earlier rounds documented as a stub now routes
    PNG/GIF/baseline-JPEG through the in-repo decoders; unsupported
    containers still raise with the container named."""
    import numpy as np

    from datalake_polygonscan_spark.operators.media import (
        gif_bytes,
        jpeg_bytes,
        png_bytes,
    )

    w, h, px = decode_image(jpeg_bytes(1, bytes([10, 200])))
    assert (w, h) == (16, 8) and px[0, 0] == 10 and px[0, 8] == 200
    w, h, px = decode_image(png_bytes(1, b"x" * 12))
    assert (w, h) == (4, 1) and tuple(px[0, 0]) == (120, 120, 120)
    w, h, px = decode_image(gif_bytes(1, b"abcdef"))
    assert (w, h) == (6, 1) and px.shape == (1, 6, 3)
    assert isinstance(px, np.ndarray)
    with pytest.raises(NotImplementedError, match="no in-repo codec"):
        decode_image(b"RIFF....WEBP")


def test_sample_frames_strides_payload(spark):
    from datalake_polygonscan_spark.operators.media import sample_frames

    docs = spark.createDataFrame([(0, "x" * 1000)], ["doc_id", "text"])  # png, 1000-byte payload
    media = media_table(docs)
    frames = sample_frames(media, frame_bytes=256, every_nth=2).collect()
    # 1000 bytes -> 4 frames (256,256,256,232); every 2nd -> idx 0, 2
    assert [r.frame_idx for r in frames] == [0, 2]
    assert len(bytes(frames[0].frame)) == 256
    assert bytes(frames[0].frame) == b"x" * 256
    assert len(bytes(frames[1].frame)) == 256
    assert all(r.frame_md5 is not None for r in frames)


def test_resize_image_headers_halves_dims_keeps_payload(spark):
    from datalake_polygonscan_spark.operators.media import (
        media_dedup_by_payload,
        payload_md5,
        resize_image_headers,
    )

    docs = _docs(spark)
    media = media_table(docs)
    before = {r.media_id: (r.width, r.height) for r in media_metadata(media).collect()}
    resized = resize_image_headers(media, factor=2)
    after = {r.media_id: (r.width, r.height) for r in media_metadata(resized).collect()}
    for mid, (w, h) in after.items():
        if before[mid][0] is not None:  # image rows halve
            assert (w, h) == (before[mid][0] // 2, before[mid][1] // 2)
        else:  # wav passes through
            assert (w, h) == (None, None)
    # payload untouched: payload hash identical before/after
    pb = {r.media_id: r.p for r in media.select("media_id", payload_md5().alias("p")).collect()}
    pa = {r.media_id: r.p for r in resized.select("media_id", payload_md5().alias("p")).collect()}
    assert pb == pa


def test_media_byte_features_deterministic_vectors(spark):
    from datalake_polygonscan_spark.operators.media import media_byte_features

    media = media_table(_docs(spark))
    v1 = {r.media_id: r.features for r in media_byte_features(media).collect()}
    v2 = {r.media_id: r.features for r in media_byte_features(media).collect()}
    assert v1 == v2  # deterministic
    assert all(len(v) == 8 for v in v1.values())
    assert all(0.0 <= x <= 1.0 for v in v1.values() for x in v)
    assert v1[0] != v1[1]  # distinct payloads -> distinct features


def test_bmp_decode_handles_padding_and_bottom_up(spark):
    """decode_bmp_pixels must honor the general BMP container: 4-byte
    row stride padding (width=1 -> 3 data bytes + 1 pad byte per row)
    and bottom-up row order; pad bytes must not leak into the sums."""
    import struct

    from datalake_polygonscan_spark.operators.media import bmp_table, decode_bmp_pixels

    width, height = 1, 2
    stride = (width * 3 + 3) // 4 * 4
    rows_bottom_up = [bytes([10, 20, 30]) + b"\xff", bytes([1, 2, 3]) + b"\xff"]  # pad=0xff
    pixel_data = b"".join(rows_bottom_up)
    header = (
        b"BM" + struct.pack("<I", 54 + len(pixel_data)) + b"\x00\x00\x00\x00" + struct.pack("<I", 54)
        + struct.pack("<I", 40) + struct.pack("<i", width) + struct.pack("<i", height)
        + struct.pack("<H", 1) + struct.pack("<H", 24) + struct.pack("<I", 0)
        + struct.pack("<I", len(pixel_data)) + b"\x00" * 16
    )
    media = spark.createDataFrame([(1, bytearray(header + pixel_data))], "media_id long, content binary")
    r = decode_bmp_pixels(media).collect()[0]
    assert (r.width, r.height, r.n_pixels) == (1, 2, 2)
    # bottom-up: file row 0 is the image's BOTTOM row; sums ignore pads
    assert (r.sum_b, r.sum_g, r.sum_r) == (10 + 1, 20 + 2, 30 + 3)
    assert abs(r.mean_luma - (0.299 * 33 + 0.587 * 22 + 0.114 * 11) / 2) < 1e-9
    assert stride == 4

    # and the codegen fixture parses to the advertised shape
    docs = spark.createDataFrame([(5, "abcdefghijklmnopqrstuvwxyz0123456789")], ["doc_id", "text"])
    f = decode_bmp_pixels(bmp_table(docs)).collect()[0]
    assert (f.width, f.height, f.n_pixels) == (4, 5 % 3 + 1, 4 * (5 % 3 + 1))
    payload = "abcdefghijklmnopqrstuvwxyz0123456789".encode()[: f.n_pixels * 3]
    assert f.sum_b == sum(payload[0::3]) and f.sum_g == sum(payload[1::3]) and f.sum_r == sum(payload[2::3])


def test_png_roundtrip_all_filter_types():
    """Encode/decode round-trip exercising every PNG filter type
    (row r of image mid uses filter (mid+r)%5) — a filter-math bug in
    either direction breaks byte equality."""
    from datalake_polygonscan_spark.operators.media import decode_png_bytes, png_bytes

    used = set()
    for mid in range(10):
        h = mid % 3 + 1
        raw = bytes((mid * 7 + i * 13) % 256 for i in range(12 * h))
        w, hh, dec = decode_png_bytes(png_bytes(mid, raw))
        assert (w, hh, dec) == (4, h, raw)
        used.update((mid + r) % 5 for r in range(h))
    assert used == {0, 1, 2, 3, 4}


def test_png_decoder_rejects_non_png_and_interlaced():
    import struct
    import zlib

    import pytest

    from datalake_polygonscan_spark.operators.media import (
        _png_chunk,
        _PNG_SIG,
        decode_png_bytes,
        png_bytes,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_bytes(b"BM" + b"\x00" * 60)
    # flip the interlace flag: decoder must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 1)
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + b" " * 12))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png_bytes(blob)


def test_png_spark_fixture_decodes(spark):
    from datalake_polygonscan_spark.operators.media import decode_png_pixels, png_table

    docs_df = _docs(spark)
    out = decode_png_pixels(png_table(docs_df)).collect()
    assert len(out) == docs_df.count()
    for r in out:
        assert r["width"] == 4 and r["n_pixels"] == 4 * r["height"]
        assert 0 <= r["mean_luma"] <= 255


# ---------------------------------------------------------------------------
# M-WAV: real RIFF/WAVE PCM decode (operators/media.py)
# ---------------------------------------------------------------------------


def test_wav_files_are_valid_for_stdlib_wave_reader(spark):
    """The fixture's bytes must open in Python's stdlib `wave` module —
    proof the container is REAL, not a lookalike."""
    import io as _io
    import wave

    from datalake_polygonscan_spark.operators.media import wav_table

    docs = spark.createDataFrame(
        [(i, f"sample document {i} with audio payload") for i in range(6)],
        ["doc_id", "text"],
    )
    for r in wav_table(docs).collect():
        with wave.open(_io.BytesIO(bytes(r["content"]))) as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
            assert w.getframerate() == r["media_id"] % 3 * 4000 + 8000
            assert w.getnframes() == (r["media_id"] % 3 + 1) * 4


def test_wav_decode_matches_stdlib_reference(spark):
    import io as _io
    import wave

    import numpy as np

    from datalake_polygonscan_spark.operators.media import decode_wav_pcm, wav_table

    docs = spark.createDataFrame(
        [(i, f"doc {i} text for pcm bytes here") for i in range(6)], ["doc_id", "text"]
    )
    media = wav_table(docs)
    got = {r["media_id"]: r for r in decode_wav_pcm(media).collect()}
    for r in media.collect():
        with wave.open(_io.BytesIO(bytes(r["content"]))) as w:
            frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2").astype(np.int64)
        g = got[r["media_id"]]
        assert g["n_samples"] == len(frames)
        assert g["peak"] == int(np.abs(frames).max())
        assert g["sum_abs"] == int(np.abs(frames).sum())


def test_wav_decode_rejects_non_riff(spark):
    import pytest as _pytest

    from datalake_polygonscan_spark.operators.media import decode_wav_pcm

    bad = spark.createDataFrame([(1, bytearray(b"NOTAWAVFILE" * 4))], ["media_id", "content"])
    with _pytest.raises(Exception, match="RIFF"):
        decode_wav_pcm(bad).collect()


def test_avi_decode_validates_and_counts_frames(spark, sf_dir):
    from datalake_polygonscan_spark.operators.media import avi_table, decode_avi_frames
    from datalake_polygonscan_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(30)
    out = decode_avi_frames(avi_table(docs))
    rows = out.collect()
    assert all(r.frames_match_header for r in rows)
    assert all(r.n_frames == r.media_id % 3 + 1 for r in rows)
    assert all(r.width == 2 and r.height == 2 for r in rows)
    assert all(r.duration_ms == r.n_frames * 100 for r in rows)


def test_avi_decode_rejects_non_avi(spark):
    import pytest
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.media import decode_avi_frames

    bad = spark.createDataFrame([(1,)], "media_id long").select(
        "media_id", F.lit(b"RIFF\x00\x00\x00\x00WAVE").alias("content")
    )
    with pytest.raises(Exception, match="not a RIFF/AVI"):
        decode_avi_frames(bad).collect()


def test_avi_rejects_compressed_stream(spark):
    """A strf claiming non-BI_RGB compression must refuse (that is the
    plug-in slot for a real codec, not silently-wrong sums)."""
    import pytest
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.media import avi_table, decode_avi_frames

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    good = avi_table(docs).collect()[0].content
    b = bytearray(bytes(good))
    # strf biCompression dword: find 'strf' tag and patch +8(hdr)+16
    i = bytes(b).find(b"strf")
    b[i + 8 + 16 : i + 8 + 20] = (1).to_bytes(4, "little")  # BI_RLE8
    bad = spark.createDataFrame([(1, bytes(b))], "media_id long, content binary")
    with pytest.raises(Exception, match="uncompressed 24-bit"):
        decode_avi_frames(bad).collect()


# ---------------------------------------------------------------------------
# GIF / LZW dictionary coder
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_including_table_resets():
    """Matched-pair property: decode(encode(x)) == x across empty,
    tiny, random (table resets past 4096 entries), compressible and
    constant-run payloads — every width transition 9->12 and the
    CLEAR reset path."""
    import random

    from datalake_polygonscan_spark.operators.media import lzw_decode, lzw_encode

    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        bytes([5] * 10),
        bytes(rng.randrange(256) for _ in range(300)),     # 9->10 bits
        bytes(rng.randrange(256) for _ in range(6000)),    # ->12 bits
        bytes(rng.randrange(256) for _ in range(24000)),   # table reset
        (b"abcabcabd" * 3000)[:20000],                     # compressible
        bytes([7]) * 12000,                                # runs (KwKwK)
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data


def test_gif_roundtrip_and_palette():
    from datalake_polygonscan_spark.operators.media import (
        _gif_palette_rgb,
        decode_gif_bytes,
        gif_bytes,
    )

    payload = b"hello world!" + b" " * 6
    w, h, palette, idx = decode_gif_bytes(gif_bytes(11, payload))
    assert (w, h) == (6, 3)
    assert idx == payload
    assert palette[104] == _gif_palette_rgb(104) == (104, 151, 216)


@pytest.fixture(scope="module")
def javac(tmp_path_factory):
    """Compile the ImageIO-based GIF decode/encode helpers; skip if no
    JDK compiler is present (java itself is guaranteed by Spark)."""
    import shutil
    import subprocess

    if not (shutil.which("javac") and shutil.which("java")):
        pytest.skip("no JDK available for ImageIO cross-validation")
    d = tmp_path_factory.mktemp("gifjava")
    (d / "Decode.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.File;
public class Decode {
  public static void main(String[] a) throws Exception {
    BufferedImage img = ImageIO.read(new File(a[0]));
    System.out.println(img.getWidth() + " " + img.getHeight());
    for (int y = 0; y < img.getHeight(); y++)
      for (int x = 0; x < img.getWidth(); x++) {
        int p = img.getRGB(x, y);
        System.out.println(((p>>16)&255) + " " + ((p>>8)&255) + " " + (p&255));
      }
  }
}
"""
    )
    (d / "Encode.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.File;
import java.util.Random;
public class Encode {
  public static void main(String[] a) throws Exception {
    int w = 32, h = 100;
    byte[] r = new byte[256], g = new byte[256], b = new byte[256];
    for (int i = 0; i < 256; i++) { r[i]=(byte)i; g[i]=(byte)(255-i); b[i]=(byte)((i*7)%256); }
    IndexColorModel cm = new IndexColorModel(8, 256, r, g, b);
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
    Random rnd = new Random(99);
    WritableRaster ras = img.getRaster();
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) ras.setSample(x, y, 0, rnd.nextInt(256));
    ImageIO.write(img, "gif", new File(a[0]));
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) System.out.println(ras.getSample(x, y, 0));
  }
}
"""
    )
    subprocess.run(["javac", "Decode.java", "Encode.java"], cwd=d, check=True)
    return d


def test_gif_encoder_bit_exact_with_java_imageio(javac, tmp_path):
    """Our GIF bitstreams decode pixel-identically in a FOREIGN codec
    (Java's javax.imageio): deferred width growth, the 12-bit region
    and a dictionary reset all land on the same bit positions giflib
    uses — if the LZW convention drifted even one code, every pixel
    past the boundary would differ."""
    import random
    import subprocess

    from datalake_polygonscan_spark.operators.media import _gif_palette_rgb, gif_bytes

    rng = random.Random(123)
    for name, payload in {
        "grow": bytes(rng.randrange(256) for _ in range(6 * 900)),
        "reset": bytes(rng.randrange(256) for _ in range(6 * 4000)),
        "runs": bytes([7]) * (6 * 2000),
    }.items():
        p = tmp_path / f"{name}.gif"
        p.write_bytes(gif_bytes(3, payload, width=6))
        out = subprocess.run(
            ["java", "-cp", str(javac), "Decode", str(p)],
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        got = [tuple(map(int, line.split())) for line in out[1:]]
        assert got == [_gif_palette_rgb(v) for v in payload], name


def test_gif_decoder_reads_java_encoded_interlaced_gif(javac, tmp_path):
    """The reverse direction: a GIF ENCODED by Java's ImageIO (which
    writes interlaced four-pass layouts) decodes to the exact palette
    indices through our sub-block + LZW + de-interlace path."""
    import subprocess

    from datalake_polygonscan_spark.operators.media import decode_gif_bytes

    p = tmp_path / "java.gif"
    out = subprocess.run(
        ["java", "-cp", str(javac), "Encode", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    expected = bytes(int(v) for v in out)
    w, h, palette, idx = decode_gif_bytes(p.read_bytes())
    assert (w, h) == (32, 100)
    assert idx == expected
    assert palette[:256] == [(i, 255 - i, (i * 7) % 256) for i in range(256)]


# ---------------------------------------------------------------------------
# JPEG (baseline SOF0): Huffman + DCT
# ---------------------------------------------------------------------------


def test_jpeg_dc_only_roundtrip_is_integer_exact():
    """DC-only flat blocks with Q00=8 decode bit-for-bit: the lossy
    format with a lossless fixture, across the whole byte range and
    long DC-prediction chains (128 successive blocks)."""
    import numpy as np

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes, jpeg_bytes

    payload = bytes(range(0, 256, 2))  # 128 blocks, 2 wide
    w, h, px = decode_jpeg_bytes(jpeg_bytes(3, payload))
    assert (w, h) == (16, 512)
    exp = np.zeros((h, w), dtype=np.uint8)
    for i, v in enumerate(payload):
        by, bx = divmod(i, 2)
        exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    assert (px == exp).all()


def test_jpeg_rejects_invalid_frames_and_garbage():
    import pytest as _pytest

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes, jpeg_bytes

    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_bytes(b"GIF87a queue")
    # flipping a baseline SOF0 to SOF2 yields an ILLEGAL scan script
    # (a progressive DC scan must have Se=0, baseline SOS has Se=63):
    # the decoder must error on the script, not decode garbage
    blob = bytearray(jpeg_bytes(1, bytes([5, 6])))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="DC scan must have Se=0"):
        decode_jpeg_bytes(bytes(blob))
    # lossless SOF3 stays rejected
    blob[i + 1] = 0xC3
    with _pytest.raises(ValueError, match="SOF0/SOF2 only"):
        decode_jpeg_bytes(bytes(blob))


def test_jpeg_encoder_bit_exact_in_java_imageio(javac, tmp_path):
    """Java's ImageIO must read our DC-only JPEG to the exact pixel
    values (raster samples — getRGB would apply gray->sRGB and is NOT
    the decode)."""
    import subprocess

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes, jpeg_bytes

    (tmp_path / "DecodeGray.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.File;
public class DecodeGray {
  public static void main(String[] a) throws Exception {
    BufferedImage img = ImageIO.read(new File(a[0]));
    Raster r = img.getRaster();
    System.out.println(img.getWidth() + " " + img.getHeight());
    for (int y = 0; y < img.getHeight(); y++)
      for (int x = 0; x < img.getWidth(); x++)
        System.out.println(r.getSample(x, y, 0));
  }
}
"""
    )
    subprocess.run(["javac", "DecodeGray.java"], cwd=tmp_path, check=True)
    payload = bytes(range(0, 256, 2))
    p = tmp_path / "ours.jpg"
    p.write_bytes(jpeg_bytes(3, payload))
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "DecodeGray", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split("\n")
    vals = [int(line) for line in out[1:] if line.strip()]
    _, _, px = decode_jpeg_bytes(p.read_bytes())
    assert vals == px.flatten().tolist()


def test_jpeg_decoder_matches_imageio_on_foreign_file(javac, tmp_path):
    """The general path (real Huffman tables, AC run-length, full
    IDCT) on a JPEG Java ENCODED: our decode must match ImageIO's own
    decode of the same file within the +-1 IDCT rounding bound."""
    import subprocess

    import numpy as np

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes

    (tmp_path / "EncodeJpg.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.File;
import java.util.Random;
public class EncodeJpg {
  public static void main(String[] a) throws Exception {
    int w = 48, h = 40;
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
    Random rnd = new Random(7);
    WritableRaster ras = img.getRaster();
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) ras.setSample(x, y, 0, rnd.nextInt(256));
    ImageIO.write(img, "jpg", new File(a[0]));
    BufferedImage back = ImageIO.read(new File(a[0]));
    Raster r2 = back.getRaster();
    System.out.println(back.getWidth() + " " + back.getHeight());
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) System.out.println(r2.getSample(x, y, 0));
  }
}
"""
    )
    subprocess.run(["javac", "EncodeJpg.java"], cwd=tmp_path, check=True)
    p = tmp_path / "java.jpg"
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "EncodeJpg", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split("\n")
    jw, jh = map(int, out[0].split())
    java_px = np.array([int(line) for line in out[1:] if line.strip()]).reshape(jh, jw)
    w, h, ours = decode_jpeg_bytes(p.read_bytes())
    assert (w, h) == (jw, jh)
    assert np.abs(ours.astype(np.int64) - java_px).max() <= 1


def test_jpeg_decoder_handles_java_420_color(javac, tmp_path):
    """Real-world color JPEGs: Java ImageIO writes 4:2:0 (Y 2x2,
    chroma 1x1). Our decoder's per-component MCU interleave + triangle
    chroma upsampling must track ImageIO's own decode closely on
    gradient content (small bounded divergence from libjpeg's integer
    upsampling arithmetic; nothing structural)."""
    import subprocess

    import numpy as np

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes

    (tmp_path / "EncodeJpgColor.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.File;
import java.util.Random;
public class EncodeJpgColor {
  public static void main(String[] a) throws Exception {
    int w = 48, h = 40;
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
    Random rnd = new Random(11);
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
      int r = (x * 5 + rnd.nextInt(8)) % 256;
      int g = (y * 6 + rnd.nextInt(8)) % 256;
      int b = ((x + y) * 3 + rnd.nextInt(8)) % 256;
      img.setRGB(x, y, (r << 16) | (g << 8) | b);
    }
    ImageIO.write(img, "jpg", new File(a[0]));
    BufferedImage back = ImageIO.read(new File(a[0]));
    System.out.println(back.getWidth() + " " + back.getHeight());
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
      int p = back.getRGB(x, y);
      System.out.println(((p>>16)&255) + " " + ((p>>8)&255) + " " + (p&255));
    }
  }
}
"""
    )
    subprocess.run(["javac", "EncodeJpgColor.java"], cwd=tmp_path, check=True)
    p = tmp_path / "color.jpg"
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "EncodeJpgColor", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split("\n")
    jw, jh = map(int, out[0].split())
    java_px = np.array(
        [list(map(int, line.split())) for line in out[1:] if line.strip()]
    ).reshape(jh, jw, 3)
    blob = p.read_bytes()
    # Java really wrote 4:2:0 — otherwise this test is vacuous
    i = blob.find(b"\xff\xc0")
    samps = [(blob[i + 11 + 3 * c] >> 4, blob[i + 11 + 3 * c] & 15) for c in range(blob[i + 9])]
    assert samps[0] == (2, 2)
    w, h, px = decode_jpeg_bytes(blob)
    assert (w, h) == (jw, jh)
    diff = np.abs(px.astype(np.int64) - java_px)
    assert diff.max() <= 10
    assert diff.mean() <= 1.0
    assert np.percentile(diff, 99) <= 3


def test_jpeg_full_ac_encoder_roundtrip_within_quantization():
    """The full-AC encoder (forward DCT, quality-scaled Annex-K
    quantization, run-length + canonical Huffman AC coding): decoding
    our own q=85 encode of a noisy gradient must land within the
    quantization error envelope — and padding to block multiples must
    preserve the true dimensions."""
    import numpy as np

    from datalake_polygonscan_spark.operators.media import (
        decode_jpeg_bytes,
        jpeg_encode_gray,
    )

    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:44, 0:52]  # non-multiples of 8: edge padding path
    img = np.clip(2.5 * x + 1.5 * y + rng.normal(0, 6, (44, 52)), 0, 255).astype(np.uint8)
    w, h, back = decode_jpeg_bytes(jpeg_encode_gray(img, quality=85))
    assert (w, h) == (52, 44)
    diff = np.abs(back.astype(int) - img.astype(int))
    assert diff.mean() < 6
    assert diff.max() <= 40


def test_jpeg_full_ac_bitstream_decodes_in_java_imageio(javac, tmp_path):
    """Foreign-decoder check on the FULL-AC bitstream (run-length AC
    symbols, ZRL, EOB, in-file canonical tables): ImageIO's decode of
    our encoder's output must match our own decode within the +-1 IDCT
    rounding bound."""
    import subprocess

    import numpy as np

    from datalake_polygonscan_spark.operators.media import (
        decode_jpeg_bytes,
        jpeg_encode_gray,
    )

    (tmp_path / "DecodeGray.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.File;
public class DecodeGray {
  public static void main(String[] a) throws Exception {
    BufferedImage img = ImageIO.read(new File(a[0]));
    Raster r = img.getRaster();
    System.out.println(img.getWidth() + " " + img.getHeight());
    for (int y = 0; y < img.getHeight(); y++)
      for (int x = 0; x < img.getWidth(); x++)
        System.out.println(r.getSample(x, y, 0));
  }
}
"""
    )
    subprocess.run(["javac", "DecodeGray.java"], cwd=tmp_path, check=True)
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:40, 0:48]
    img = np.clip(3 * x + 2 * y + rng.normal(0, 8, (40, 48)), 0, 255).astype(np.uint8)
    p = tmp_path / "fullac.jpg"
    p.write_bytes(jpeg_encode_gray(img, quality=90))
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "DecodeGray", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    jw, jh = int(out[0]), int(out[1])
    java_px = np.array([int(v) for v in out[2:]]).reshape(jh, jw)
    w, h, ours = decode_jpeg_bytes(p.read_bytes())
    assert (w, h) == (jw, jh)
    assert np.abs(ours.astype(int) - java_px).max() <= 1


def test_jpeg_progressive_fixture_bit_exact_both_decoders(javac, tmp_path):
    """Our SOF2 progressive fixture (3-scan successive approximation:
    DC@Al=1, AC EOB-run scan, DC refinement bit) must decode bit-exact
    in BOTH our decoder and Java ImageIO — the same lossless-fixture
    property the baseline jpeg_bytes fixture has."""
    import subprocess

    import numpy as np

    from datalake_polygonscan_spark.operators.media import (
        decode_jpeg_bytes,
        jpeg_bytes_progressive,
    )

    (tmp_path / "DecodeGray.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.File;
public class DecodeGray {
  public static void main(String[] a) throws Exception {
    BufferedImage img = ImageIO.read(new File(a[0]));
    Raster r = img.getRaster();
    System.out.println(img.getWidth() + " " + img.getHeight());
    for (int y = 0; y < img.getHeight(); y++)
      for (int x = 0; x < img.getWidth(); x++)
        System.out.println(r.getSample(x, y, 0));
  }
}
"""
    )
    subprocess.run(["javac", "DecodeGray.java"], cwd=tmp_path, check=True)
    payload = bytes(range(0, 256, 2))  # odd AND even dc values (both refinement bits)
    blob = jpeg_bytes_progressive(3, payload, blocks_w=2)
    assert b"\xff\xc2" in blob  # really SOF2
    w, h, px = decode_jpeg_bytes(blob)
    expect = np.repeat(np.repeat(np.frombuffer(payload, np.uint8).reshape(-1, 2), 8, 0), 8, 1)
    assert (px == expect).all()
    p = tmp_path / "prog.jpg"
    p.write_bytes(blob)
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "DecodeGray", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split("\n")
    jw, jh = map(int, out[0].split())
    java_px = np.array([int(x) for x in out[1:] if x.strip()], np.int64).reshape(jh, jw)
    assert (jw, jh) == (w, h)
    assert (java_px == expect).all()


def test_jpeg_progressive_decoder_matches_imageio_gray(javac, tmp_path):
    """Java-ENCODED progressive grayscale (ImageIO MODE_DEFAULT writes
    a 6-scan script: DC first/refine, AC bands, two AC refinement
    passes): our decode must match ImageIO's own decode within the
    ±1 IDCT rounding bound."""
    import subprocess

    import numpy as np

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes

    (tmp_path / "EncodeProgGray.java").write_text(
        """
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.File;
import java.util.Random;
public class EncodeProgGray {
  public static void main(String[] a) throws Exception {
    int w = 48, h = 40;
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
    Random rnd = new Random(7);
    WritableRaster ras = img.getRaster();
    for (int y=0;y<h;y++) for (int x=0;x<w;x++) ras.setSample(x,y,0,rnd.nextInt(256));
    ImageWriter wr = ImageIO.getImageWritersByFormatName("jpg").next();
    ImageWriteParam p = wr.getDefaultWriteParam();
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
    try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[0]))) {
      wr.setOutput(os); wr.write(null, new IIOImage(img, null, null), p);
    }
    wr.dispose();
    BufferedImage back = ImageIO.read(new File(a[0]));
    Raster r2 = back.getRaster();
    System.out.println(back.getWidth() + " " + back.getHeight());
    for (int y=0;y<h;y++) for (int x=0;x<w;x++) System.out.println(r2.getSample(x,y,0));
  }
}
"""
    )
    subprocess.run(["javac", "EncodeProgGray.java"], cwd=tmp_path, check=True)
    p = tmp_path / "prog_gray.jpg"
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "EncodeProgGray", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split("\n")
    jw, jh = map(int, out[0].split())
    java_px = np.array([int(x) for x in out[1:] if x.strip()], np.int64).reshape(jh, jw)
    blob = p.read_bytes()
    assert b"\xff\xc2" in blob  # Java really wrote SOF2
    w, h, ours = decode_jpeg_bytes(blob)
    assert (w, h) == (jw, jh)
    assert np.abs(ours.astype(np.int64) - java_px).max() <= 1


def test_jpeg_progressive_decoder_matches_imageio_color(javac, tmp_path):
    """Java-encoded progressive COLOR (4:2:0, per-component AC scans):
    tracks ImageIO's decode within the same chroma-upsampling bounds
    the baseline 4:2:0 test uses."""
    import subprocess

    import numpy as np

    from datalake_polygonscan_spark.operators.media import decode_jpeg_bytes

    (tmp_path / "EncodeProgColor.java").write_text(
        """
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.File;
import java.util.Random;
public class EncodeProgColor {
  public static void main(String[] a) throws Exception {
    int w = 48, h = 40;
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
    Random rnd = new Random(11);
    for (int y=0;y<h;y++) for (int x=0;x<w;x++) {
      int r=(x*5+rnd.nextInt(8))%256, g=(y*6+rnd.nextInt(8))%256, b=((x+y)*3+rnd.nextInt(8))%256;
      img.setRGB(x,y,(r<<16)|(g<<8)|b);
    }
    ImageWriter wr = ImageIO.getImageWritersByFormatName("jpg").next();
    ImageWriteParam p = wr.getDefaultWriteParam();
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
    try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[0]))) {
      wr.setOutput(os); wr.write(null, new IIOImage(img, null, null), p);
    }
    wr.dispose();
    BufferedImage back = ImageIO.read(new File(a[0]));
    System.out.println(back.getWidth() + " " + back.getHeight());
    for (int y=0;y<h;y++) for (int x=0;x<w;x++) {
      int q = back.getRGB(x,y);
      System.out.println(((q>>16)&255)+" "+((q>>8)&255)+" "+(q&255));
    }
  }
}
"""
    )
    subprocess.run(["javac", "EncodeProgColor.java"], cwd=tmp_path, check=True)
    p = tmp_path / "prog_color.jpg"
    out = subprocess.run(
        ["java", "-cp", str(tmp_path), "EncodeProgColor", str(p)],
        capture_output=True, text=True, check=True,
    ).stdout.split("\n")
    jw, jh = map(int, out[0].split())
    java_px = np.array(
        [list(map(int, ln.split())) for ln in out[1:] if ln.strip()], np.int64
    ).reshape(jh, jw, 3)
    blob = p.read_bytes()
    assert b"\xff\xc2" in blob
    i = blob.find(b"\xff\xc2")
    samps = [(blob[i + 11 + 3 * c] >> 4, blob[i + 11 + 3 * c] & 15) for c in range(blob[i + 9])]
    assert samps[0] == (2, 2)  # really 4:2:0
    w, h, px = decode_jpeg_bytes(blob)
    assert (w, h) == (jw, jh)
    diff = np.abs(px.astype(np.int64) - java_px)
    assert diff.max() <= 16
    assert diff.mean() <= 1.0
    assert np.percentile(diff, 99) <= 4


# ---------------------------------------------------------------------------
# M-ADPCM: IMA ADPCM compressed audio (predictive coding)
# ---------------------------------------------------------------------------


def test_adpcm_block_decode_bit_exact_with_audioop():
    """The from-scratch IMA ADPCM recurrence must match CPython's
    audioop (an INDEPENDENT implementation of the same DVI/IMA
    algorithm) bit-for-bit on random blocks and states. audioop packs
    the HIGH nibble first while WAV blocks are low-nibble-first, so
    the comparison swaps nibbles; audioop also does not emit the seed
    sample, so sample 0 is dropped from ours."""
    import random
    import struct
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from datalake_polygonscan_spark.operators.media import adpcm_decode_block

    rng = random.Random(1234)
    for _ in range(300):
        n = rng.randint(0, 48)
        data = bytes(rng.randrange(256) for _ in range(n))
        pred = rng.randint(-32768, 32767)
        idx = rng.randint(0, 88)
        mine = adpcm_decode_block(data, pred, idx)[1:]
        swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in data)
        pcm, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
        assert mine == list(struct.unpack(f"<{len(pcm) // 2}h", pcm))


def test_adpcm_fixture_decodes_and_validates(spark):
    from datalake_polygonscan_spark.operators.media import (
        adpcm_decode_block,
        adpcm_table,
        decode_adpcm_pcm,
    )

    docs = spark.createDataFrame(
        [(i, f"adpcm doc {i} payload text bytes") for i in range(6)], ["doc_id", "text"]
    )
    media = adpcm_table(docs)
    got = {r["media_id"]: r for r in decode_adpcm_pcm(media).collect()}
    for r in media.collect():
        b = bytes(r["content"])
        mid = r["media_id"]
        nb = (mid % 3 + 1) * 4
        # driver-side reference decode straight from the blob's block
        data_off = b.index(b"data") + 8
        pred = int.from_bytes(b[data_off : data_off + 2], "little", signed=True)
        idx = b[data_off + 2]
        assert pred == 0 and idx == mid % 89
        samples = adpcm_decode_block(b[data_off + 4 : data_off + 4 + nb], pred, idx)
        g = got[mid]
        assert g["n_samples"] == nb * 2 + 1 == len(samples)
        assert g["peak"] == max(abs(s) for s in samples)
        assert g["sum_abs"] == sum(abs(s) for s in samples)
        assert g["sample_rate"] == 8000


def test_adpcm_decode_rejects_pcm_and_bad_index(spark):
    import pytest as _pytest

    from datalake_polygonscan_spark.operators.media import (
        adpcm_table,
        decode_adpcm_pcm,
        wav_table,
    )

    docs = spark.createDataFrame([(1, "plain pcm not adpcm")], ["doc_id", "text"])
    with _pytest.raises(Exception, match="IMA ADPCM"):
        decode_adpcm_pcm(wav_table(docs)).collect()

    # corrupt the block's step index beyond 88
    row = adpcm_table(docs).collect()[0]
    b = bytearray(bytes(row["content"]))
    b[b.index(b"data") + 8 + 2] = 99
    bad = spark.createDataFrame([(1, bytes(b))], ["media_id", "content"])
    with _pytest.raises(Exception, match="out of range"):
        decode_adpcm_pcm(bad).collect()


def test_packbits_roundtrip_property():
    """PackBits encode/decode round-trips arbitrary byte strings,
    including >=128-byte literal stretches and >=128-byte runs (both
    must split at the cap)."""
    import random

    from datalake_polygonscan_spark.operators.media import (
        packbits_decode,
        packbits_encode,
    )

    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        b"ab",
        b"aaa",
        bytes([5]) * 300,                      # run split at 128
        bytes(range(256)),                     # pure literal > 128
        bytes(rng.choice([0, 1, 32, 200]) for _ in range(1000)),
    ]
    for _ in range(300):
        n = rng.randint(0, 500)
        cases.append(bytes(rng.choice([rng.randrange(256), 32, 65]) for _ in range(n)))
    for data in cases:
        enc = packbits_encode(data)
        assert packbits_decode(enc) == data
        # worst-case expansion bound from the spec: 1 extra byte per 128
        assert len(enc) <= len(data) + (len(data) // 128) + 2


def test_tiff_roundtrip_and_ifd():
    """Our TIFF container round-trips: IFD walk finds the strip, the
    PackBits strip expands to the exact payload."""
    from datalake_polygonscan_spark.operators.media import (
        decode_tiff_bytes,
        tiff_bytes,
    )

    payload = (b"PackBits!!  " + bytes([9] * 20) + b"tail").ljust(16 * 3)[: 16 * 3]
    w, h, px = decode_tiff_bytes(tiff_bytes(5, payload))
    assert (w, h) == (16, 3)
    assert px == payload


def test_tiff_encoder_decodes_in_java_imageio(javac, tmp_path):
    """Our PackBits TIFFs decode pixel-identically in a FOREIGN codec
    (Java's javax.imageio TIFF plugin, JDK 9+): the IFD layout, strip
    offsets and every RLE opcode must match the spec or Java reads
    garbage. Raw raster samples are compared (getRGB would run Java's
    linear-gray -> sRGB color conversion and scramble the values)."""
    import random
    import subprocess

    from datalake_polygonscan_spark.operators.media import tiff_bytes

    (tmp_path / "DecodeRaw.java").write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.File;
public class DecodeRaw {
  public static void main(String[] a) throws Exception {
    BufferedImage img = ImageIO.read(new File(a[0]));
    System.out.println(img.getWidth() + " " + img.getHeight());
    for (int y = 0; y < img.getHeight(); y++)
      for (int x = 0; x < img.getWidth(); x++)
        System.out.println(img.getRaster().getSample(x, y, 0));
  }
}
"""
    )
    subprocess.run(["javac", "DecodeRaw.java"], cwd=tmp_path, check=True)

    rng = random.Random(321)
    for name, payload in {
        "mixed": bytes(rng.choice([rng.randrange(256), 32]) for _ in range(16 * 40)),
        "runs": bytes([200]) * (16 * 30),
        "literal": bytes(rng.randrange(256) for _ in range(16 * 25)),
    }.items():
        p = tmp_path / f"{name}.tiff"
        p.write_bytes(tiff_bytes(3, payload, width=16))
        out = subprocess.run(
            ["java", "-cp", str(tmp_path), "DecodeRaw", str(p)],
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        assert out[0] == f"16 {len(payload) // 16}", name
        assert [int(v) for v in out[1:]] == list(payload), name


# ---------------------------------------------------------------------------
# M7 perceptual hashing
# ---------------------------------------------------------------------------


def test_perceptual_hash_identical_pixels_hash_equal(spark):
    """Two docs with identical text (hence identical BMP pixels) get
    bit-identical hashes and surface as a Hamming-0 pair; a doc with
    different pixels does not collide with them."""
    from datalake_polygonscan_spark.operators.media import (
        bmp_table,
        perceptual_hashes,
        phash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(0, "the same exact document text here"),
         (3, "the same exact document text here"),   # %3==0: same height
         (6, "completely different pixel content!")],
        "doc_id long, text string",
    )
    hashes = perceptual_hashes(bmp_table(docs)).collect()
    by_id = {r["media_id"]: r for r in hashes}
    for c in ("a_hi", "a_lo", "d_hi", "d_lo"):
        assert by_id[0][c] == by_id[3][c]
        assert 0 <= by_id[0][c] < 2**32  # halves never touch the sign bit
    pairs = phash_near_dup_pairs(
        perceptual_hashes(bmp_table(docs)), cap=40, max_hamming=0
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} >= {(0, 3)}
    assert all(r["hamming_a"] == 0 for r in pairs if (r["doc_a"], r["doc_b"]) == (0, 3))


def test_perceptual_hash_matches_independent_recompute(spark):
    """Cross-validate the numpy hash path against a from-first-
    principles pure-Python recompute over the SAME decoded pixels."""
    from datalake_polygonscan_spark.operators.media import (
        _parse_bmp_pixels,
        bmp_table,
        perceptual_hashes,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some distinguishing text {i*7}")
         for i in range(6)],
        "doc_id long, text string",
    )
    media = bmp_table(docs)
    got = {r["media_id"]: r for r in perceptual_hashes(media).collect()}
    for row in media.collect():
        px = _parse_bmp_pixels(bytes(row["content"]))
        h, w = px.shape[0], px.shape[1]
        lum = [[299 * int(px[i][j][2]) + 587 * int(px[i][j][1]) + 114 * int(px[i][j][0])
                for j in range(w)] for i in range(h)]
        ga = [[lum[(i * h) // 8][(j * w) // 8] for j in range(8)] for i in range(8)]
        total = sum(sum(r) for r in ga)
        a_bits = [1 if 64 * ga[i][j] > total else 0 for i in range(8) for j in range(8)]
        gd = [[lum[(i * h) // 8][(j * w) // 9] for j in range(9)] for i in range(8)]
        d_bits = [1 if gd[i][j + 1] > gd[i][j] else 0 for i in range(8) for j in range(8)]

        def halves(bits):
            lo = sum(b << k for k, b in enumerate(bits[:32]))
            hi = sum(b << k for k, b in enumerate(bits[32:]))
            return hi, lo

        a_hi, a_lo = halves(a_bits)
        d_hi, d_lo = halves(d_bits)
        r = got[row["media_id"]]
        assert (r["a_hi"], r["a_lo"], r["d_hi"], r["d_lo"]) == (a_hi, a_lo, d_hi, d_lo)


def test_phash_bucket_cap_drops_boilerplate_buckets(spark):
    """A band bucket larger than the cap is dropped entirely (the
    deterministic boilerplate rule), so a 5-way identical group with
    cap=4 yields no pairs, while cap=10 yields all C(5,2)=10."""
    from datalake_polygonscan_spark.operators.media import (
        bmp_table,
        perceptual_hashes,
        phash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(i * 3, "identical boilerplate everywhere") for i in range(5)],
        "doc_id long, text string",
    )
    hashes = perceptual_hashes(bmp_table(docs))
    assert phash_near_dup_pairs(hashes, cap=4, max_hamming=10).count() == 0
    assert phash_near_dup_pairs(hashes, cap=10, max_hamming=10).count() == 10


def test_audio_features_match_stdlib_recompute(spark):
    """ZCR/energy cross-checked against a pure-Python recompute over
    stdlib `wave`-decoded samples, and the dual-DFT centroid verdict
    holds on every fixture file."""
    import io
    import wave

    from datalake_polygonscan_spark.operators.media import audio_features, wav_table

    docs = spark.createDataFrame(
        [(i, f"audio fixture text {i} {'x' * (i % 7)}") for i in range(9)],
        "doc_id long, text string",
    )
    media = wav_table(docs)
    got = {r["media_id"]: r for r in audio_features(media).collect()}
    for row in media.collect():
        with wave.open(io.BytesIO(bytes(row["content"]))) as w:
            raw = w.readframes(w.getnframes())
        import struct

        v = list(struct.unpack(f"<{len(raw) // 2}h", raw))
        zcr = sum(1 for a, b in zip(v, v[1:]) if (a < 0) != (b < 0))
        r = got[row["media_id"]]
        assert r["n_samples"] == len(v)
        assert r["zcr"] == zcr
        assert r["sum_sq"] == sum(x * x for x in v)
        assert r["centroid_consistent"] is True


# ---------------------------------------------------------------------------
# from-scratch INFLATE (operators/deflate.py)
# ---------------------------------------------------------------------------


def test_scratch_inflate_matches_zlib_all_block_types():
    """Cross-validate the RFC 1951 decoder against stdlib zlib across
    stored (level 0), fixed- and dynamic-Huffman blocks, overlapping
    LZ77 runs, and >258-byte matches, plus the Adler-32 check."""
    import random
    import zlib

    from datalake_polygonscan_spark.operators.deflate import (
        adler32_scratch,
        zlib_decompress_scratch,
    )

    rng = random.Random(7)
    cases = [
        b"",
        b"hello world",
        b"A" * 1000 + b"B" * 300,          # long runs -> overlapping copies
        b"abc" * 500,                       # period-3 overlap
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        b"".join(bytes([rng.choice([32, 65, rng.randrange(256)])]) for _ in range(8000)),
    ]
    for payload in cases:
        for level in (0, 1, 6, 9):
            assert zlib_decompress_scratch(zlib.compress(payload, level)) == payload
        assert adler32_scratch(payload) == zlib.adler32(payload)


def test_scratch_inflate_rejects_corruption():
    import zlib

    import pytest

    from datalake_polygonscan_spark.operators.deflate import zlib_decompress_scratch

    z = bytearray(zlib.compress(b"payload under test", 6))
    z[-1] ^= 0xFF  # corrupt the adler32 trailer
    with pytest.raises(ValueError, match="adler32"):
        zlib_decompress_scratch(bytes(z))
