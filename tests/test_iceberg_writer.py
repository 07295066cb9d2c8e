"""Write-side Iceberg interop (io/iceberg_writer.py): the emitted
metadata tree round-trips through the S48 foreign READER alone."""

from __future__ import annotations

import os

import pytest

from datalake_polygonscan_spark.io.iceberg_reader import (
    read_iceberg_table,
    snapshot_info,
)
from datalake_polygonscan_spark.io.iceberg_writer import write_iceberg_table


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )


def test_roundtrip_create_append_overwrite(spark, tmp_path):
    t = str(tmp_path / "icew")
    r1 = write_iceberg_table(spark, _df(spark, 0, 30), t, ["part"])
    assert r1["sequence_number"] == 1 and r1["n_added"] >= 3
    assert read_iceberg_table(spark, t).count() == 30

    r2 = write_iceberg_table(spark, _df(spark, 30, 50), t, ["part"],
                             mode="append")
    live = read_iceberg_table(spark, t)
    rows = live.collect()
    assert {r.k for r in rows} == set(range(50))
    # Iceberg data files must carry ALL columns — partition values
    # included (Spark's partitionBy drops them; the writer duplicates)
    assert all(r.part == str(r.k % 3) for r in rows)
    # snapshot time travel to the pre-append state
    assert read_iceberg_table(spark, t, snapshot_id=r1["snapshot_id"]).count() == 30
    # metadata-only count agrees with the scan without opening files
    info = snapshot_info(t)
    assert info["record_count"] == 50 and info["snapshot_id"] == r2["snapshot_id"]

    r3 = write_iceberg_table(spark, _df(spark, 100, 110), t, ["part"])
    assert {r.k for r in read_iceberg_table(spark, t).collect()} == set(range(100, 110))
    # REPLACE keeps prior snapshots readable
    assert read_iceberg_table(spark, t, snapshot_id=r2["snapshot_id"]).count() == 50
    assert snapshot_info(t)["n_snapshots"] == 3


def test_identity_partition_pruning_on_written_table(spark, tmp_path):
    """The written spec declares identity partition fields, so the
    reader's manifest pruning works on our own exports."""
    t = str(tmp_path / "icewp")
    write_iceberg_table(spark, _df(spark, 0, 30), t, ["part"])
    full = read_iceberg_table(spark, t)
    pruned = read_iceberg_table(spark, t, partition_filter={"part": "1"})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(r.k for r in pruned.collect()) == [
        k for k in range(30) if k % 3 == 1]


def test_unpartitioned_and_nested_decimal_schema(spark, tmp_path):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, Decimal("1.50"), (7, ["a"]))],
        "k long, d decimal(10,2), nest struct<a:int,tags:array<string>>",
    )
    t = str(tmp_path / "icewn")
    write_iceberg_table(spark, df, t)
    back = read_iceberg_table(spark, t)
    assert [f.dataType.simpleString() for f in back.schema] == [
        "bigint", "decimal(10,2)", "struct<a:int,tags:array<string>>"]
    row = back.collect()[0]
    assert str(row.d) == "1.50" and row.nest.tags == ["a"]


def test_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported mode"):
        write_iceberg_table(spark, _df(spark, 0, 5), str(tmp_path / "x"),
                            mode="merge")


def test_emitted_avro_shapes_are_spec_complete(spark, tmp_path):
    """ADVICE r9: the metadata tree must carry the spec's required
    shapes — field-ids on every Avro field, the typed r102 partition
    struct, the v2 manifest-list required fields, and metadata.json's
    required v2 keys."""
    import json as _json

    from datalake_polygonscan_spark.io.avro import parse_header

    t = str(tmp_path / "icespec")
    write_iceberg_table(spark, _df(spark, 0, 30), t, ["part"])
    mdir = os.path.join(t, "metadata")

    def header_schema(path):
        meta, _sync, _pos = parse_header(open(path, "rb").read())
        return _json.loads(meta["avro.schema"].decode())

    # manifest list: required v2 fields, all with field-ids
    ml = header_schema(os.path.join(mdir, "snap-00001.avro"))
    by_name = {f["name"]: f for f in ml["fields"]}
    for req in ("manifest_path", "manifest_length", "partition_spec_id",
                "content", "sequence_number", "min_sequence_number",
                "added_snapshot_id", "added_files_count",
                "existing_files_count", "deleted_files_count",
                "added_rows_count", "existing_rows_count",
                "deleted_rows_count", "partitions"):
        assert req in by_name, req
        assert "field-id" in by_name[req], req
    # manifest entry: typed r102 partition struct, not a map
    me = header_schema(os.path.join(mdir, "m-00001.avro"))
    ef = {f["name"]: f for f in me["fields"]}
    assert all("field-id" in f for f in me["fields"])
    df_fields = {f["name"]: f for f in ef["data_file"]["type"]["fields"]}
    part_t = df_fields["partition"]["type"]
    assert part_t["type"] == "record" and part_t["name"] == "r102"
    [pf] = part_t["fields"]
    assert pf["name"] == "part" and pf["field-id"] == 1000
    assert pf["type"] == ["null", "string"]
    # metadata.json: required v2 keys
    meta = _json.load(open(os.path.join(mdir, "v1.metadata.json")))
    assert meta["last-partition-id"] == 1000
    assert meta["default-sort-order-id"] == 0
    assert meta["sort-orders"] == [{"order-id": 0, "fields": []}]
    # manifest-list counts are real
    from datalake_polygonscan_spark.io.avro import read_avro_file
    _, [m] = read_avro_file(os.path.join(mdir, "snap-00001.avro"))
    assert m["added_rows_count"] == 30 and m["added_files_count"] >= 3
    assert m["min_sequence_number"] == 1
    [summary] = m["partitions"]
    assert summary["contains_null"] is False
    assert bytes(summary["lower_bound"]) == b"0"
    assert bytes(summary["upper_bound"]) == b"2"


def test_escaped_partition_values_roundtrip(spark, tmp_path):
    """ADVICE r9: partition string values with spaces/colons were
    stored hive-ESCAPED, so a partition_filter on the real value
    silently returned nothing. Unescaped tuples must prune correctly,
    and null partitions map to null (not the hive marker string)."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c:d"), (3, "a b"), (4, None)], "k long, part string")
    t = str(tmp_path / "iceesc")
    write_iceberg_table(spark, df, t, ["part"])
    full = read_iceberg_table(spark, t)
    assert {(r.k, r.part) for r in full.collect()} == {
        (1, "a b"), (2, "c:d"), (3, "a b"), (4, None)}
    got = read_iceberg_table(spark, t, partition_filter={"part": "a b"})
    assert sorted(r.k for r in got.collect()) == [1, 3]
    assert len(got.inputFiles()) < len(full.inputFiles())
    got2 = read_iceberg_table(spark, t, partition_filter={"part": "c:d"})
    assert [r.k for r in got2.collect()] == [2]


def test_long_partition_col_typed_tuple_and_bounds(spark, tmp_path):
    """Non-string partition columns land TYPED in the r102 struct and
    their manifest-list bounds use Appendix-D little-endian longs, so
    the reader's summary pruning works on exports."""
    from datalake_polygonscan_spark.io.avro import read_avro_file

    df = spark.range(40).selectExpr("id AS k", "CAST(id % 4 AS LONG) AS b")
    t = str(tmp_path / "icelong")
    write_iceberg_table(spark, df, t, ["b"])
    _, [m] = read_avro_file(os.path.join(t, "metadata", "snap-00001.avro"))
    [summary] = m["partitions"]
    assert int.from_bytes(bytes(summary["lower_bound"]), "little", signed=True) == 0
    assert int.from_bytes(bytes(summary["upper_bound"]), "little", signed=True) == 3
    _, entries = read_avro_file(os.path.join(t, "metadata", "m-00001.avro"))
    assert {e["data_file"]["partition"]["b"] for e in entries} == {0, 1, 2, 3}
    got = read_iceberg_table(spark, t, partition_filter={"b": 2})
    assert sorted(r.k for r in got.collect()) == [k for k in range(40) if k % 4 == 2]
