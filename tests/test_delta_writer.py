"""Write-side Delta interop (io/delta_writer.py): the emitted
_delta_log round-trips through the S47 foreign READER alone and
validates against the protocol doc's required fields."""

from __future__ import annotations

import json
import os

import pytest

from datalake_polygonscan_spark.io.delta_reader import read_delta_table
from datalake_polygonscan_spark.io.delta_writer import (
    validate_delta_log,
    write_delta_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 4 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )


def test_roundtrip_create_append_overwrite(spark, tmp_path):
    t = str(tmp_path / "t")
    r0 = write_delta_table(spark, _df(spark, 0, 40), t, ["part"])
    assert r0["version"] == 0 and r0["n_added"] >= 4 and r0["n_removed"] == 0
    assert read_delta_table(spark, t).count() == 40

    r1 = write_delta_table(spark, _df(spark, 40, 70), t, ["part"], mode="append")
    assert r1["version"] == 1 and r1["n_removed"] == 0
    live = read_delta_table(spark, t)
    assert {r.k for r in live.collect()} == set(range(70))
    # partition columns re-enter typed through the log, not the files
    assert live.schema["part"].dataType.simpleString() == "string"
    assert read_delta_table(spark, t, version=0).count() == 40  # time travel

    r2 = write_delta_table(spark, _df(spark, 100, 110), t, ["part"])
    assert r2["version"] == 2 and r2["n_removed"] == r0["n_added"] + r1["n_added"]
    assert {r.k for r in read_delta_table(spark, t).collect()} == set(range(100, 110))
    # old snapshots still resolve after the overwrite (atomic replace)
    assert read_delta_table(spark, t, version=1).count() == 70

    summary = validate_delta_log(t)
    assert summary["n_versions"] == 3 and summary["n_live_files"] == r2["n_added"]


def test_unpartitioned_and_validation_catches_corruption(spark, tmp_path):
    t = str(tmp_path / "u")
    write_delta_table(spark, _df(spark, 0, 10).drop("part"), t)
    assert read_delta_table(spark, t).count() == 10
    validate_delta_log(t)

    # drop a required field -> the validator must refuse
    log0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log0)]
    for a in lines:
        if "add" in a:
            del a["add"]["modificationTime"]
            break
    with open(log0, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="missing required"):
        validate_delta_log(t)


def test_log_declares_universally_readable_protocol(spark, tmp_path):
    """No optional feature is used, so the emitted protocol must be
    (1, 2) — readable by every Delta reader in existence."""
    t = str(tmp_path / "p")
    write_delta_table(spark, _df(spark, 0, 5), t, ["part"])
    first = [json.loads(x) for x in
             open(os.path.join(t, "_delta_log", f"{0:020d}.json"))]
    proto = next(a["protocol"] for a in first if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in first if "metaData" in a)
    assert meta["partitionColumns"] == ["part"]
    # schemaString is Spark's own schema JSON (Delta's dialect)
    from pyspark.sql.types import StructType

    assert StructType.fromJson(json.loads(meta["schemaString"])).fieldNames() == [
        "k", "part", "v"]


def test_checkpoint_emission_and_json_prefix_cleanup(spark, tmp_path):
    """Round 10 (VERDICT r9 #4): write_checkpoint emits the classic
    checkpoint parquet + _last_checkpoint; after deleting EVERY log
    JSON the foreign reader still resolves the exact snapshot, and a
    version older than the checkpoint fails loudly (its JSONs are
    gone, not silently misread). The auto-interval fires on its own
    every Nth commit."""
    import glob
    import os

    import pytest as _pytest

    from datalake_polygonscan_spark.io.delta_reader import read_delta_table
    from datalake_polygonscan_spark.io.delta_writer import (
        write_checkpoint,
        write_delta_table,
    )

    t = str(tmp_path / "cpt")
    df = spark.range(60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    write_delta_table(spark, df.filter("k < 20"), t, ["part"])
    write_delta_table(spark, df.filter("k >= 20 AND k < 40"), t, ["part"],
                      mode="append")
    info = write_delta_table(spark, df.filter("k >= 40"), t, ["part"],
                             mode="append", checkpoint_interval=3)
    assert info["checkpointed"] is True  # (2+1) % 3 == 0 fired on its own
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))

    for p in glob.glob(os.path.join(log, "*.json")):
        os.remove(p)
    back = read_delta_table(spark, t)
    assert {(r.k, r.part) for r in back.collect()} == {
        (i, str(i % 3)) for i in range(60)}
    with _pytest.raises(ValueError, match="not reachable"):
        read_delta_table(spark, t, version=0)

    # appends AFTER the cleanup replay checkpoint + JSON tail together
    write_delta_table(spark, df.selectExpr("k + 100 AS k", "part", "v"), t,
                      ["part"], mode="append")
    assert read_delta_table(spark, t).count() == 120
    # re-checkpoint at the new tip and clean again: still exact
    write_checkpoint(t)
    for p in glob.glob(os.path.join(log, "*.json")):
        os.remove(p)
    assert read_delta_table(spark, t).count() == 120


def test_delete_where_emits_deletion_vectors(spark, tmp_path):
    """Round 10: row-level DELETE emits roaring DV sidecars — no data
    file rewritten — with remove+re-add actions and the v3 protocol
    upgrade; a second delete on the same file MERGES positions; the
    pre-delete version still time-travels."""
    import glob

    from datalake_polygonscan_spark.io.delta_reader import read_delta_table
    from datalake_polygonscan_spark.io.delta_writer import (
        delete_where,
        write_delta_table,
    )

    t = str(tmp_path / "dvw")
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS v")
    write_delta_table(spark, df, t, ["part"])
    data_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(t, "part=*", "*.parquet"))
    }

    r = delete_where(spark, t, "k % 7 = 3")
    gone = {k for k in range(100) if k % 7 == 3}
    assert r["n_deleted"] == len(gone) and r["version"] == 1
    assert r["n_dv_files"] >= 3  # every partition holds a k%7==3 row
    live = {row.k for row in read_delta_table(spark, t).collect()}
    assert live == set(range(100)) - gone
    # no data file touched
    assert {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(t, "part=*", "*.parquet"))
    } == data_before
    # time travel to the pre-delete version
    assert read_delta_table(spark, t, version=0).count() == 100

    # second delete on a PARTITION predicate merges with existing DVs
    r2 = delete_where(spark, t, "part = '1' AND k < 10")
    newly = {k for k in range(10) if k % 3 == 1 and k % 7 != 3}
    assert r2["n_deleted"] == len(newly)
    live2 = {row.k for row in read_delta_table(spark, t).collect()}
    assert live2 == set(range(100)) - gone - {k for k in range(10) if k % 3 == 1}

    # nothing-matches is a no-op: no new commit
    r3 = delete_where(spark, t, "k > 100000")
    assert r3["n_deleted"] == 0 and r3["version"] == r2["version"]
