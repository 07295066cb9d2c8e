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
                      "readerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t", "schemaString": schema.json(), "partitionColumns": []}},
    ])
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
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
