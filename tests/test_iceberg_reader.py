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

    # delete manifests (content=1) refused
    t2 = str(tmp_path / "deltab")
    mdir2 = os.path.join(t2, "metadata")
    os.makedirs(mdir2)
    ml = os.path.join(mdir2, "snap-1.avro")
    write_avro_file(ml, _MANIFEST_FILE_SCHEMA, [{
        "manifest_path": os.path.join(mdir2, "x.avro"), "manifest_length": 0,
        "partition_spec_id": 0, "content": 1, "added_snapshot_id": 1,
    }])
    json.dump({
        "format-version": 2, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": []}],
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0, "manifest-list": ml}],
    }, open(os.path.join(mdir2, "v1.metadata.json"), "w"))
    open(os.path.join(mdir2, "version-hint.text"), "w").write("1")
    with pytest.raises(IcebergProtocolError, match="delete manifests"):
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
