"""S34 position-delete files: row-identity deletes, duplicate-copy
semantics, idempotence, zero-rewrite contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.posdeletes import (
    posdelete_dirs,
    position_delete,
    read_with_position_deletes,
)
from datalake_polygonscan_spark.io.sinks import atomic_overwrite, current_snapshot_path


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, "b", 20.0), (3, "c", 30.0), (4, "a", 40.0)],
        "id long, tag string, v double",
    )
    path = str(tmp_path / "t")
    atomic_overwrite(df.repartition(2), path)
    return path


def test_duplicate_rows_delete_copy_by_copy(spark, table):
    """Two EXACT duplicate rows (id=2) are two delete entries — the
    position identity distinguishes copies no key could."""
    n = position_delete(spark, table, F.col("id") == 2)
    assert n == 2
    left = read_with_position_deletes(spark, table)
    assert sorted(r["id"] for r in left.collect()) == [1, 3, 4]


def test_second_delete_skips_already_deleted(spark, table):
    """Deleting WHERE tag='a' then WHERE v >= 10 must not re-enter the
    already-deleted positions: batch 2 carries only still-visible rows."""
    n1 = position_delete(spark, table, F.col("tag") == "a")       # ids 1, 4
    n2 = position_delete(spark, table, F.col("v") >= 10.0)        # the rest
    assert n1 == 2
    assert n2 == 3  # 2, 2, 3 — NOT the two 'a' rows again
    assert read_with_position_deletes(spark, table).count() == 0


def test_delete_commits_are_hard_links(spark, table):
    def inodes(snap):
        out = {}
        for dp, dirs, fs in os.walk(snap):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in fs:
                if not f.startswith(("_", ".")):
                    out[f] = os.stat(os.path.join(dp, f)).st_ino
        return out

    before = inodes(current_snapshot_path(table))
    position_delete(spark, table, F.col("id") == 3)
    snap = current_snapshot_path(table)
    assert inodes(snap) == before
    assert len(posdelete_dirs(snap)) == 1


def test_empty_predicate_writes_empty_batch(spark, table):
    n = position_delete(spark, table, F.lit(False))
    assert n == 0
    assert read_with_position_deletes(spark, table).count() == 5
