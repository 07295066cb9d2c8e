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
