"""Merge-on-read DELETE (io/tombstones.py): key tombstones commit a
new version with ZERO data rewrites (all files hard-linked); every
reader applies them; a re-inserting merge clears them; OPTIMIZE
materializes them."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.maintenance import compact_snapshot
from datalake_polygonscan_spark.io.merge import merge_upsert
from datalake_polygonscan_spark.io.sinks import (
    current_snapshot_path,
    read_table,
    read_version,
)
from datalake_polygonscan_spark.io.tombstones import delete_keys, tombstone_dirs


def _seed(spark, tbl, n=40):
    df = spark.createDataFrame([(i, float(i)) for i in range(n)], ["k", "v"])
    merge_upsert(spark, tbl, df, keys=["k"], n_buckets=8)


def _data_inodes(snap):
    out = {}
    for dp, dirs, fs in os.walk(snap):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        for f in fs:
            if not f.startswith(("_", ".")):
                out[os.path.relpath(os.path.join(dp, f), snap)] = os.stat(
                    os.path.join(dp, f)
                ).st_ino
    return out


def test_delete_is_zero_rewrite_and_applies_on_read(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl)
    prev = current_snapshot_path(tbl)
    prev_inodes = _data_inodes(prev)
    dels = spark.createDataFrame([(k,) for k in range(0, 40, 5)], ["k"])
    live = delete_keys(spark, tbl, dels, keys=["k"])
    assert sorted(r["k"] for r in live.collect()) == [k for k in range(40) if k % 5]
    # every data file of the new snapshot is a hard link of the old one
    new = current_snapshot_path(tbl)
    assert _data_inodes(new) == prev_inodes
    # time travel: the pre-delete version still shows all rows
    assert read_version(spark, tbl, 0).count() == 40
    assert read_version(spark, tbl, -1).count() == 32


def test_merge_clears_tombstones_of_reinserted_keys(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=20)
    dels = spark.createDataFrame([(5,), (10,), (15,)], ["k"])
    delete_keys(spark, tbl, dels, keys=["k"])
    # re-insert k=10 with a new value; 5 and 15 stay deleted
    batch = spark.createDataFrame([(10, 99.0), (3, 33.0)], ["k", "v"])
    live = merge_upsert(spark, tbl, batch, keys=["k"], n_buckets=8)
    got = {r["k"]: r["v"] for r in live.collect()}
    assert got[10] == 99.0 and got[3] == 33.0
    assert 5 not in got and 15 not in got
    assert len(got) == 18
    # stacked delete after the merge still works (batches accumulate)
    live2 = delete_keys(spark, tbl, spark.createDataFrame([(3,)], ["k"]), keys=["k"])
    assert 3 not in {r["k"] for r in live2.collect()}


def test_compaction_materializes_tombstones(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=20)
    delete_keys(spark, tbl, spark.createDataFrame([(1,), (2,)], ["k"]), keys=["k"])
    stats = compact_snapshot(spark, tbl, target_file_bytes=1 << 30)
    snap = current_snapshot_path(tbl)
    assert tombstone_dirs(snap) == []
    live = read_table(spark, tbl)
    assert live.count() == 18
    # physical: footer-discovery read (no tombstone logic) agrees
    assert spark.read.parquet(snap).drop("_bucket").count() == 18
    assert stats["version"] == 2


def test_mismatched_tombstone_keys_raise(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=10)
    delete_keys(spark, tbl, spark.createDataFrame([(1,)], ["k"]), keys=["k"])
    with pytest.raises(ValueError, match="key space"):
        delete_keys(spark, tbl, spark.createDataFrame([(2.0,)], ["v"]), keys=["v"])
    with pytest.raises(ValueError, match="key space"):
        merge_upsert(
            spark, tbl,
            spark.createDataFrame([(1, 1.0)], ["k", "v"]).withColumnRenamed("k", "k2"),
            keys=["k2"], n_buckets=8,
        )


def test_deleted_rows_cannot_resurrect_through_merge_kept_arm(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=16)
    delete_keys(spark, tbl, spark.createDataFrame([(4,)], ["k"]), keys=["k"])
    # merge a batch into the SAME bucket as k=4 (any batch): the kept
    # arm re-reads that bucket and must not bring k=4 back
    batch = spark.createDataFrame([(100 + i, 0.0) for i in range(8)], ["k", "v"])
    live = merge_upsert(spark, tbl, batch, keys=["k"], n_buckets=8)
    assert 4 not in {r["k"] for r in live.collect()}
    assert live.count() == 15 + 8


# ---------------- MoR UPSERT (append_upserts) ----------------


def _rows(spark, tbl):
    return sorted((r["k"], r["v"]) for r in read_table(spark, tbl).collect())


def test_mor_upsert_zero_rewrite_and_latest_batch_wins(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import append_upserts

    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=10)
    before = _data_inodes(current_snapshot_path(tbl))
    up = lambda rows: spark.createDataFrame(rows, ["k", "v"])  # noqa: E731
    append_upserts(spark, tbl, up([(2, 20.0), (100, 100.0)]), ["k"])
    append_upserts(spark, tbl, up([(2, 200.0)]), ["k"])
    after = _data_inodes(current_snapshot_path(tbl))
    assert all(after.get(p) == i for p, i in before.items())  # zero rewrite
    got = dict(_rows(spark, tbl))
    assert got[2] == 200.0  # later delta batch wins
    assert got[100] == 100.0  # insert visible
    assert len(got) == 11


def test_mor_upsert_tombstone_interplay(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import append_upserts

    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=10)
    up = lambda rows: spark.createDataFrame(rows, ["k", "v"])  # noqa: E731
    append_upserts(spark, tbl, up([(3, 30.0), (50, 50.0)]), ["k"])
    # delete kills the BASE row 4 and the DELTA rows 3 and 50
    delete_keys(spark, tbl, up([(3, 0.0), (4, 0.0), (50, 0.0)]), ["k"])
    got = dict(_rows(spark, tbl))
    assert 3 not in got and 4 not in got and 50 not in got
    # re-upserting 3 clears ONLY its tombstone
    append_upserts(spark, tbl, up([(3, 33.0)]), ["k"])
    got = dict(_rows(spark, tbl))
    assert got[3] == 33.0 and 4 not in got and 50 not in got


def test_mor_upsert_optimize_materializes(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import append_upserts, delta_dirs

    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=10)
    up = spark.createDataFrame([(1, 11.0), (77, 77.0)], ["k", "v"])
    append_upserts(spark, tbl, up, ["k"])
    expect = _rows(spark, tbl)
    compact_snapshot(spark, tbl)
    snap = current_snapshot_path(tbl)
    assert delta_dirs(snap) == []  # deltas folded into data files
    assert _rows(spark, tbl) == expect


def test_mor_upsert_cow_merge_materializes(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import append_upserts, delta_dirs

    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=10)
    append_upserts(spark, tbl, spark.createDataFrame([(5, 55.0)], ["k", "v"]), ["k"])
    merge_upsert(spark, tbl, spark.createDataFrame([(200, 2.0)], ["k", "v"]), keys=["k"], n_buckets=8)
    got = dict(_rows(spark, tbl))
    assert got[5] == 55.0 and got[200] == 2.0
    assert delta_dirs(current_snapshot_path(tbl)) == []


def test_mor_upsert_guards(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import append_upserts

    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=5)
    with pytest.raises(ValueError, match="key space"):
        append_upserts(spark, tbl, spark.createDataFrame([(1, 1.0)], ["k", "v"]), ["v"])
    with pytest.raises(ValueError, match="schema"):
        append_upserts(
            spark, tbl,
            spark.createDataFrame([(1, 1.0, "x")], ["k", "v", "extra"]), ["k"],
        )
