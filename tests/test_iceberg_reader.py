"""Foreign Iceberg v2 reader (io/iceberg_reader.py): spec-faithful
metadata tree composed by the in-repo Avro encoder, resolved by the
in-repo decoder."""

from __future__ import annotations

import json
import os

import pytest

from datalake_polygonscan_spark.io.avro import write_avro_file
from datalake_polygonscan_spark.io.iceberg_reader import (
    _MANIFEST_FILE_SCHEMA,
    IcebergProtocolError,
    read_iceberg_table,
    snapshot_info,
    write_foreign_iceberg_fixture,
)


@pytest.fixture()
def ice_table(spark, tmp_path):
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) * 1.5 AS v", "CAST(id % 3 AS STRING) AS s"
    )
    t = str(tmp_path / "icetab")
    write_foreign_iceberg_fixture(spark, df, t, "k")
    return t, df


def test_snapshot_lifecycle_and_time_travel(spark, ice_table):
    t, df = ice_table
    n_extra = df.filter("k % 7 = 3").count()
    assert read_iceberg_table(spark, t, snapshot_id=1).count() == 100
    assert read_iceberg_table(spark, t, snapshot_id=2).count() == 100 + n_extra
    live = read_iceberg_table(spark, t)
    assert live.count() == 50 + n_extra  # odd-parity file DELETED at s3
    # multiset semantics: only the EVEN half of the extra file overlaps
    # a live file (the odd-parity file was deleted at s3)
    dup = live.groupBy("k").count().filter("count = 2")
    assert dup.count() == df.filter("k % 7 = 3 AND k % 2 = 0").count()
    assert live.schema.fieldNames() == ["k", "v", "s"]


def test_metadata_only_statistics(spark, ice_table):
    t, _ = ice_table
    info = snapshot_info(t)
    assert info["snapshot_id"] == 3 and info["n_snapshots"] == 3
    assert info["record_count"] == read_iceberg_table(spark, t).count()
    assert info["n_bytes"] > 0
    assert snapshot_info(t, snapshot_id=1)["record_count"] == 100


def test_version_hint_and_unknown_snapshot(spark, ice_table):
    t, _ = ice_table
    # hint rolled back to v2 -> current snapshot resolves to 2
    open(os.path.join(t, "metadata", "version-hint.text"), "w").write("2")
    assert snapshot_info(t)["snapshot_id"] == 2
    with pytest.raises(ValueError, match="snapshot 99"):
        read_iceberg_table(spark, t, snapshot_id=99)


def test_protocol_gates(spark, tmp_path):
    # format-version 3 refused
    t = str(tmp_path / "v3tab")
    mdir = os.path.join(t, "metadata")
    os.makedirs(mdir)
    json.dump({"format-version": 3}, open(os.path.join(mdir, "v1.metadata.json"), "w"))
    open(os.path.join(mdir, "version-hint.text"), "w").write("1")
    with pytest.raises(IcebergProtocolError, match="format-version"):
        read_iceberg_table(spark, t)

    # unknown delete content id (3) refused; eq delete without
    # equality_ids refused
    from datalake_polygonscan_spark.io.iceberg_reader import _MANIFEST_ENTRY_SCHEMA

    for sub, content, match in (("c3", 3, "unknown delete"),
                                ("noids", 2, "without equality_ids")):
        t2 = str(tmp_path / f"deltab_{sub}")
        mdir2 = os.path.join(t2, "metadata")
        os.makedirs(mdir2)
        mpath = os.path.join(mdir2, "m1.avro")
        msize = write_avro_file(mpath, _MANIFEST_ENTRY_SCHEMA, [{
            "status": 1, "snapshot_id": 1, "sequence_number": 1,
            "data_file": {
                "content": content, "file_path": os.path.join(t2, "d.parquet"),
                "file_format": "PARQUET", "partition": None,
                "record_count": 0, "file_size_in_bytes": 0,
                "equality_ids": None,
            }}])
        ml = os.path.join(mdir2, "snap-1.avro")
        write_avro_file(ml, _MANIFEST_FILE_SCHEMA, [{
            "manifest_path": mpath, "manifest_length": msize,
            "partition_spec_id": 0, "content": 1, "sequence_number": 1,
            "added_snapshot_id": 1,
        }])
        json.dump({
            "format-version": 2, "current-schema-id": 0,
            "schemas": [{"schema-id": 0, "type": "struct", "fields": []}],
            "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifest-list": ml}],
        }, open(os.path.join(mdir2, "v1.metadata.json"), "w"))
        open(os.path.join(mdir2, "version-hint.text"), "w").write("1")
        with pytest.raises(IcebergProtocolError, match=match):
            read_iceberg_table(spark, t2)


def test_relocated_table_path_rerooting(spark, ice_table, tmp_path):
    """Foreign tables carry absolute paths from the writing engine;
    after a relocation the reader re-roots them under the new table
    directory."""
    import shutil

    t, _ = ice_table
    moved = str(tmp_path / "moved" / "icetab")
    os.makedirs(os.path.dirname(moved))
    shutil.move(t, moved)
    assert read_iceberg_table(spark, moved).count() == snapshot_info(moved)["record_count"]


def test_partition_pruning_skips_files_before_open(spark, tmp_path):
    """Identity-transform partition pruning: the manifest entries'
    partition tuples prune file slices — the pruned scan opens a
    strict subset of files yet returns exactly the filtered rows."""
    import json as _json

    from datalake_polygonscan_spark.io.avro import write_avro_file
    from datalake_polygonscan_spark.io.iceberg_reader import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
    )

    df = spark.range(90).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )
    t = str(tmp_path / "ptab")
    ddir, mdir = os.path.join(t, "data"), os.path.join(t, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)
    import pyarrow as pa
    import pyarrow.parquet as pq

    entries = []
    for pv in ("0", "1", "2"):
        pdf = df.filter(f"part = '{pv}'").toPandas()
        path = os.path.join(ddir, f"f-{pv}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        entries.append({"status": 1, "snapshot_id": 1, "data_file": {
            "content": 0, "file_path": path, "file_format": "PARQUET",
            "partition": {"part": pv},
            "record_count": len(pdf), "file_size_in_bytes": os.path.getsize(path),
        }})
    mpath = os.path.join(mdir, "m1.avro")
    msize = write_avro_file(mpath, _MANIFEST_ENTRY_SCHEMA, entries)
    ml = os.path.join(mdir, "snap-1.avro")
    write_avro_file(ml, _MANIFEST_FILE_SCHEMA, [{
        "manifest_path": mpath, "manifest_length": msize,
        "partition_spec_id": 0, "content": 0, "added_snapshot_id": 1,
    }])
    _json.dump({
        "format-version": 2, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "part", "type": "string"},
            {"id": 3, "name": "v", "type": "double"},
        ]}],
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "part", "transform": "identity", "source-id": 2, "field-id": 1000},
        ]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifest-list": ml}],
    }, open(os.path.join(mdir, "v1.metadata.json"), "w"))
    open(os.path.join(mdir, "version-hint.text"), "w").write("1")

    full = read_iceberg_table(spark, t)
    pruned = read_iceberg_table(spark, t, partition_filter={"part": "1"})
    assert len(full.inputFiles()) == 3
    assert len(pruned.inputFiles()) == 1  # two files never opened
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.filter("part = '1'").collect())
    )


# ---------------------------------------------------------------------------
# v2 row-level deletes (round 9)
# ---------------------------------------------------------------------------


@pytest.fixture()
def del_table(spark, tmp_path):
    from datalake_polygonscan_spark.io.iceberg_reader import (
        write_foreign_iceberg_delete_fixture,
    )

    df = spark.range(140).selectExpr("id AS k", "CAST(id AS DOUBLE) AS value")
    t = str(tmp_path / "deltab")
    info = write_foreign_iceberg_delete_fixture(spark, df, t, "k", mark_col="value")
    return t, df, info


def test_position_deletes_apply(spark, del_table):
    """Snapshot 2: a (file_path, pos) delete file removes exactly the
    targeted rows of the even-parity file."""
    t, df, info = del_table
    s2 = read_iceberg_table(spark, t, snapshot_id=2)
    gone = set(info["pos_deleted_keys"])
    assert gone == {k for k in range(140) if k % 10 == 0}
    assert s2.count() == 140 - len(gone)
    assert {r.k for r in s2.collect()} == set(range(140)) - gone


def test_equality_deletes_respect_sequence_order(spark, del_table):
    """Snapshot 3: the equality delete (seq 3) kills k%7==5 rows from
    the seq-1 data files but NOT the same-sequence re-added file —
    strict-less semantics; re-added rows carry the doubled marker."""
    t, df, info = del_table
    live = read_iceberg_table(spark, t)
    rows = {r.k: r.value for r in live.collect()}
    pos_gone = set(info["pos_deleted_keys"])
    eq_keys = set(info["eq_deleted_keys"])
    # every eq-deleted key survives ONLY through the re-add (value*2)
    for k in eq_keys - pos_gone:
        assert rows[k] == 2.0 * k
    # pos-deleted keys not in the re-add are fully gone
    assert all(k not in rows for k in pos_gone - eq_keys)
    # untouched rows keep their original value
    for k in set(range(140)) - eq_keys - pos_gone:
        assert rows[k] == float(k)
    expected = (set(range(140)) - pos_gone - eq_keys) | eq_keys
    assert set(rows) == expected


def test_snapshot1_undeleted_and_stats(spark, del_table):
    t, df, info = del_table
    assert read_iceberg_table(spark, t, snapshot_id=1).count() == 140
    info3 = snapshot_info(t)
    assert info3["n_pos_delete_files"] == 1
    assert info3["n_eq_delete_files"] == 1
    assert info3["n_delete_rows"] == len(info["pos_deleted_keys"]) + len(
        info["eq_deleted_keys"])


def test_delete_plan_is_single_scan_broadcast_antijoins(spark, del_table):
    """100 TB story: delete application must not shuffle the data side
    — one data scan, broadcast anti-joins only."""
    t, _, _ = del_table
    live = read_iceberg_table(spark, t)
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_nested_and_decimal_schema_types(spark, tmp_path):
    """Round 9: the metadata schema mapper covers the spec's nested
    struct/list/map JSON objects and decimal(P,S)/fixed[N] strings —
    a table with nested columns reads under the right Spark types."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalake_polygonscan_spark.io.avro import write_avro_file
    from datalake_polygonscan_spark.io.iceberg_reader import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
    )

    t = str(tmp_path / "nesttab")
    ddir, mdir = os.path.join(t, "data"), os.path.join(t, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)
    from decimal import Decimal

    tbl = pa.table({
        "k": pa.array([1, 2], type=pa.int64()),
        "amount": pa.array([Decimal("12.345"), Decimal("-0.001")],
                           type=pa.decimal128(10, 3)),
        "nest": pa.array([{"a": 1, "tags": ["x", "y"]}, {"a": 2, "tags": []}],
                         type=pa.struct([("a", pa.int32()),
                                         ("tags", pa.list_(pa.string()))])),
        "m": pa.array([{"p": 1.5}, {"q": 2.5}],
                      type=pa.map_(pa.string(), pa.float64())),
    })
    dpath = os.path.join(ddir, "f1.parquet")
    pq.write_table(tbl, dpath)
    mpath = os.path.join(mdir, "m1.avro")
    msize = write_avro_file(mpath, _MANIFEST_ENTRY_SCHEMA, [{
        "status": 1, "snapshot_id": 1, "sequence_number": 1,
        "data_file": {"content": 0, "file_path": dpath,
                      "file_format": "PARQUET", "partition": None,
                      "record_count": 2,
                      "file_size_in_bytes": os.path.getsize(dpath),
                      "equality_ids": None}}])
    ml = os.path.join(mdir, "snap-1.avro")
    write_avro_file(ml, _MANIFEST_FILE_SCHEMA, [{
        "manifest_path": mpath, "manifest_length": msize,
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "added_snapshot_id": 1}])
    _json.dump({
        "format-version": 2, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "required": True, "type": "long"},
            {"id": 2, "name": "amount", "type": "decimal(10, 3)"},
            {"id": 3, "name": "nest", "type": {"type": "struct", "fields": [
                {"id": 4, "name": "a", "type": "int"},
                {"id": 5, "name": "tags", "type": {
                    "type": "list", "element-id": 6, "element": "string",
                    "element-required": True}},
            ]}},
            {"id": 7, "name": "m", "type": {
                "type": "map", "key-id": 8, "key": "string",
                "value-id": 9, "value": "double", "value-required": True}},
        ]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifest-list": ml}],
    }, open(os.path.join(mdir, "v1.metadata.json"), "w"))
    open(os.path.join(mdir, "version-hint.text"), "w").write("1")

    out = read_iceberg_table(spark, t)
    assert [f.dataType.simpleString() for f in out.schema] == [
        "bigint", "decimal(10,3)", "struct<a:int,tags:array<string>>",
        "map<string,double>"]
    rows = {r.k: r for r in out.collect()}
    assert str(rows[1].amount) == "12.345" and rows[1].nest.tags == ["x", "y"]
    assert rows[2].m == {"q": 2.5} and rows[2].nest.a == 2


def test_transform_partition_pruning(spark, tmp_path):
    """Round 9: pruning through NON-identity transforms — a filter on
    the SOURCE column resolves to the bucket[4]/truncate[2] partition
    tuple via the spec's transforms (murmur3 bucket verified against
    the spec's Appendix-B vectors), so pruned partitions never open a
    data file."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalake_polygonscan_spark.io.avro import write_avro_file
    from datalake_polygonscan_spark.io.iceberg_reader import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
        _bucket_of,
        _murmur3_32,
    )

    # the spec's own bucket-hash vectors pin the murmur3 implementation
    assert _murmur3_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert _murmur3_32(b"iceberg") == 1210000089

    t = str(tmp_path / "btab")
    ddir, mdir = os.path.join(t, "data"), os.path.join(t, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)
    rows = [(k, f"u{k % 7}") for k in range(40)]
    entries = []
    by_part = {}
    for k, name in rows:
        key = (_bucket_of(k, 4), name[:2])
        by_part.setdefault(key, []).append((k, name))
    for (b, pre), prows in sorted(by_part.items()):
        path = os.path.join(ddir, f"f-{b}-{pre}.parquet")
        pq.write_table(pa.table({
            "k": pa.array([r[0] for r in prows], type=pa.int64()),
            "name": pa.array([r[1] for r in prows]),
        }), path)
        entries.append({"status": 1, "snapshot_id": 1, "sequence_number": 1,
                        "data_file": {
                            "content": 0, "file_path": path,
                            "file_format": "PARQUET",
                            "partition": {"k_bucket": str(b), "name_trunc": pre},
                            "record_count": len(prows),
                            "file_size_in_bytes": os.path.getsize(path),
                            "equality_ids": None}})
    mpath = os.path.join(mdir, "m1.avro")
    msize = write_avro_file(mpath, _MANIFEST_ENTRY_SCHEMA, entries)
    ml = os.path.join(mdir, "snap-1.avro")
    write_avro_file(ml, _MANIFEST_FILE_SCHEMA, [{
        "manifest_path": mpath, "manifest_length": msize,
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "added_snapshot_id": 1}])
    _json.dump({
        "format-version": 2, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "name", "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "k_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1000},
            {"name": "name_trunc", "transform": "truncate[2]",
             "source-id": 2, "field-id": 1001},
        ]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifest-list": ml}],
    }, open(os.path.join(mdir, "v1.metadata.json"), "w"))
    open(os.path.join(mdir, "version-hint.text"), "w").write("1")

    full = read_iceberg_table(spark, t)
    assert len(full.inputFiles()) == len(by_part)
    # filter on the SOURCE integer column: only the bucket's files open
    pruned = read_iceberg_table(spark, t, partition_filter={"k": 17})
    want_files = sum(1 for (b, _p) in by_part if b == _bucket_of(17, 4))
    assert len(pruned.inputFiles()) == want_files < len(by_part)
    assert 17 in {r.k for r in pruned.collect()}
    # filter on the SOURCE string column through truncate[2]
    pruned2 = read_iceberg_table(spark, t, partition_filter={"name": "u3"})
    assert {r.name for r in pruned2.collect()} >= {"u3"}
    assert len(pruned2.inputFiles()) == sum(1 for (_b, p) in by_part if p == "u3")
    # unknown column refuses rather than silently scanning everything
    from datalake_polygonscan_spark.io.iceberg_reader import IcebergProtocolError
    with pytest.raises(IcebergProtocolError, match="matches no partition"):
        read_iceberg_table(spark, t, partition_filter={"nope": 1})


# ---------------------------------------------------------------------------
# planning at scale (round 10): manifest-list summary pruning +
# executor-side manifest decode
# ---------------------------------------------------------------------------


def _build_many_manifest_table(spark, root: str, n_parts: int) -> str:
    """A table with ONE manifest per partition and spec-faithful
    field_summary bounds in the manifest list — the shape a real
    engine emits, where a planner prunes manifests before opening
    them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalake_polygonscan_spark.io.iceberg_reader import (
        _MANIFEST_ENTRY_SCHEMA,
        encode_bound,
    )

    t = os.path.join(root, "manytab")
    ddir, mdir = os.path.join(t, "data"), os.path.join(t, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)
    manifests = []
    for p in range(n_parts):
        pdf = (
            spark.range(20).selectExpr(
                f"id + {p * 100} AS k", f"CAST({p} AS LONG) AS part")
            .toPandas()
        )
        fpath = os.path.join(ddir, f"f-{p}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fpath)
        mpath = os.path.join(mdir, f"m-{p}.avro")
        msize = write_avro_file(mpath, _MANIFEST_ENTRY_SCHEMA, [{
            "status": 1, "snapshot_id": 1, "sequence_number": 1,
            "data_file": {
                "content": 0, "file_path": fpath, "file_format": "PARQUET",
                "partition": {"part": str(p)},
                "record_count": len(pdf),
                "file_size_in_bytes": os.path.getsize(fpath),
            }}])
        manifests.append({
            "manifest_path": mpath, "manifest_length": msize,
            "partition_spec_id": 0, "content": 0, "sequence_number": 1,
            "added_snapshot_id": 1,
            "partitions": [{
                "contains_null": False, "contains_nan": False,
                "lower_bound": encode_bound(p, "long"),
                "upper_bound": encode_bound(p, "long"),
            }],
        })
    ml = os.path.join(mdir, "snap-1.avro")
    write_avro_file(ml, _MANIFEST_FILE_SCHEMA, manifests)
    json.dump({
        "format-version": 2, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "type": "long"},
            {"id": 2, "name": "part", "type": "long"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "part", "transform": "identity", "source-id": 2,
             "field-id": 1000},
        ]}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
                       "manifest-list": ml}],
    }, open(os.path.join(mdir, "v1.metadata.json"), "w"))
    open(os.path.join(mdir, "version-hint.text"), "w").write("1")
    return t


def test_manifest_list_summary_pruning_never_opens_skipped(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 #2: a partition-filtered read must skip
    non-matching MANIFESTS from the manifest list's field_summary
    bounds — counted here by wrapping the reader's Avro entry point:
    only the manifest list itself and the ONE matching manifest file
    may be opened."""
    from datalake_polygonscan_spark.io import iceberg_reader as IR

    t = _build_many_manifest_table(spark, str(tmp_path), 5)
    opened = []
    real = IR.read_avro_file
    monkeypatch.setattr(
        IR, "read_avro_file",
        lambda p, *a, **kw: (opened.append(p), real(p, *a, **kw))[1],
    )
    out = IR.read_iceberg_table(spark, t, partition_filter={"part": 3})
    assert sorted(r.k for r in out.collect()) == list(range(300, 320))
    avro_opens = [os.path.basename(p) for p in opened]
    assert avro_opens == ["snap-1.avro", "m-3.avro"]


def test_distributed_manifest_decode_matches_serial(
    spark, tmp_path, monkeypatch
):
    """Above DISTRIBUTED_MANIFEST_THRESHOLD the surviving manifests
    decode executor-side (one task each); results must be identical
    to the driver-serial path, with and without a partition filter."""
    from datalake_polygonscan_spark.io import iceberg_reader as IR

    t = _build_many_manifest_table(spark, str(tmp_path), 10)
    assert len(IR.read_iceberg_table.__defaults__ or ()) >= 0  # smoke
    monkeypatch.setattr(IR, "DISTRIBUTED_MANIFEST_THRESHOLD", 4)
    dist_all = sorted(map(tuple, IR.read_iceberg_table(spark, t).collect()))
    dist_f = sorted(map(tuple, IR.read_iceberg_table(
        spark, t, partition_filter={"part": 7}).collect()))
    monkeypatch.setattr(IR, "DISTRIBUTED_MANIFEST_THRESHOLD", 10 ** 9)
    ser_all = sorted(map(tuple, IR.read_iceberg_table(spark, t).collect()))
    ser_f = sorted(map(tuple, IR.read_iceberg_table(
        spark, t, partition_filter={"part": 7}).collect()))
    assert dist_all == ser_all and len(dist_all) == 200
    assert dist_f == ser_f and len(dist_f) == 20


def test_delete_broadcast_gate_falls_back_to_shuffle(
    spark, tmp_path, monkeypatch
):
    """VERDICT r9 #6: with the broadcast budget forced to zero the
    delete anti-joins must plan WITHOUT a broadcast of the delete
    side (shuffled hash join instead) and stay value-identical."""
    from datalake_polygonscan_spark.io import iceberg_reader as IR
    from datalake_polygonscan_spark.io.iceberg_reader import (
        write_foreign_iceberg_delete_fixture,
    )

    df = spark.range(140).selectExpr("id AS k", "CAST(id AS DOUBLE) AS value")
    t = str(tmp_path / "gatetab")
    write_foreign_iceberg_delete_fixture(spark, df, t, "k", mark_col="value")

    normal = IR.read_iceberg_table(spark, t)
    want = sorted(map(tuple, normal.collect()))
    plan_b = normal._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b  # default: delete side broadcast

    monkeypatch.setattr(IR, "DELETE_BROADCAST_MAX_BYTES", 0)
    gated = IR.read_iceberg_table(spark, t)
    got = sorted(map(tuple, gated.collect()))
    plan_g = gated._jdf.queryExecution().executedPlan().toString()
    assert got == want
    # the DELETE anti-joins must not broadcast; the tiny seq-map
    # broadcast (left join) is fine and expected
    import re as _re
    anti = [seg for seg in plan_g.splitlines() if "LeftAnti" in seg]
    assert anti and all("Broadcast" not in seg for seg in anti), plan_g
