"""S42 COPY INTO: exactly-once file loading, replay no-ops, versioned
incremental commits, renamed-vs-grown file identity."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.copy_into import copy_into, loaded_files
from datalake_polygonscan_spark.io.sinks import history, read_table


def _land(spark, landing, name, rows):
    tmp = os.path.join(landing, f".{name}.tmp")
    spark.createDataFrame(rows, "k long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(landing, name))
    shutil.rmtree(tmp)


def test_copy_into_loads_once_and_replays_noop(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "t")
    os.makedirs(landing)
    _land(spark, landing, "a.parquet", [(1, "x"), (2, "y")])
    _land(spark, landing, "b.parquet", [(3, "z")])

    first = copy_into(spark, table, os.path.join(landing, "*.parquet"))
    assert first == {
        "loaded_files": 2, "skipped_files": 0, "rows_loaded": 3, "committed": True,
    }
    assert read_table(spark, table).count() == 3

    replay = copy_into(spark, table, os.path.join(landing, "*.parquet"))
    assert replay["committed"] is False and replay["skipped_files"] == 2
    # a no-op must not advance the version
    assert len(history(table)) == 1
    assert read_table(spark, table).count() == 3


def test_copy_into_incremental_only_new_files(spark, tmp_path):
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "t")
    os.makedirs(landing)
    _land(spark, landing, "a.parquet", [(1, "x")])
    copy_into(spark, table, os.path.join(landing, "*.parquet"))
    _land(spark, landing, "b.parquet", [(2, "y"), (3, "z")])

    second = copy_into(spark, table, os.path.join(landing, "*.parquet"))
    assert second["loaded_files"] == 1 and second["skipped_files"] == 1
    assert second["rows_loaded"] == 2
    assert len(history(table)) == 2
    assert sorted(r.k for r in read_table(spark, table).collect()) == [1, 2, 3]


def test_copy_into_regrown_file_is_new_identity(spark, tmp_path):
    """Identity is name+size: a file REPLACED with different bytes (a
    re-export) is a new identity and loads again — the conservative
    choice; a byte-identical replay of the same name+size is skipped."""
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "t")
    os.makedirs(landing)
    _land(spark, landing, "a.parquet", [(1, "x")])
    copy_into(spark, table, os.path.join(landing, "*.parquet"))
    size_before = os.path.getsize(os.path.join(landing, "a.parquet"))
    _land(spark, landing, "a.parquet", [(1, "x"), (2, "longer-row-content")])
    assert os.path.getsize(os.path.join(landing, "a.parquet")) != size_before

    third = copy_into(spark, table, os.path.join(landing, "*.parquet"))
    assert third["loaded_files"] == 1
    assert {k.split(":")[0] for k in loaded_files(table)} == {"a.parquet"}
    assert len(loaded_files(table)) == 2  # two distinct identities


def test_copy_into_existing_data_links_through(spark, tmp_path):
    """The incremental commit hard-links prior data files (same
    inodes) — COPY INTO never rewrites what is already loaded."""
    landing = str(tmp_path / "landing")
    table = str(tmp_path / "t")
    os.makedirs(landing)
    _land(spark, landing, "a.parquet", [(i, "x") for i in range(100)])
    copy_into(spark, table, os.path.join(landing, "*.parquet"))

    from datalake_polygonscan_spark.io.sinks import current_snapshot_path

    def inodes():
        snap = current_snapshot_path(table)
        return {
            f: os.stat(os.path.join(snap, f)).st_ino
            for f in os.listdir(snap)
            if f.endswith(".parquet")
        }

    before = inodes()
    _land(spark, landing, "b.parquet", [(1000, "y")])
    copy_into(spark, table, os.path.join(landing, "*.parquet"))
    after = inodes()
    assert set(before) <= set(after)
    for f, ino in before.items():
        assert after[f] == ino  # prior files linked, not copied
    assert read_table(spark, table).count() == 101
