"""S9 time travel (_log commit log, read_version, vacuum), S10
small-file compaction, S11 merge DELETE arm + CDC change feed — the
lakehouse maintenance surface over the atomic snapshot tables
(io/sinks.py, io/maintenance.py, io/merge.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.maintenance import _data_files, compact_snapshot
from datalake_polygonscan_spark.io.merge import change_feed, merge_upsert
from datalake_polygonscan_spark.io.sinks import (
    SnapshotVacuumed,
    atomic_overwrite,
    current_snapshot_path,
    history,
    read_table,
    read_version,
    vacuum,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


COLS = ["k", "v"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


# ---------------------------------------------------------------- S9


def test_time_travel_reads_each_version(spark, tmp_table):
    atomic_overwrite(_df(spark, [(1, "a")]), tmp_table, retain=10)
    atomic_overwrite(_df(spark, [(1, "b"), (2, "c")]), tmp_table, retain=10)
    atomic_overwrite(_df(spark, [(9, "z")]), tmp_table, retain=10)
    assert _rows(read_version(spark, tmp_table, 0)) == [(1, "a")]
    assert _rows(read_version(spark, tmp_table, 1)) == [(1, "b"), (2, "c")]
    assert _rows(read_version(spark, tmp_table, 2)) == [(9, "z")]
    # negative indexing: -1 = live
    assert _rows(read_version(spark, tmp_table, -1)) == _rows(read_table(spark, tmp_table))
    assert _rows(read_version(spark, tmp_table, -3)) == [(1, "a")]


def test_history_records_every_commit(spark, tmp_table):
    atomic_overwrite(_df(spark, [(1, "a")]), tmp_table)
    atomic_overwrite(_df(spark, [(2, "b")]), tmp_table, extra_meta={"job": "repricing"})
    log = history(tmp_table)
    assert [e["version"] for e in log] == [0, 1]
    assert log[1]["job"] == "repricing"
    assert all(e["snapshot"].startswith("snapshot=") for e in log)


def test_default_retention_prunes_data_but_log_survives(spark, tmp_table):
    for i in range(4):
        atomic_overwrite(_df(spark, [(i, "x")]), tmp_table)  # retain=2 default
    log = history(tmp_table)
    assert [e["version"] for e in log] == [0, 1, 2, 3]
    assert [e["available"] for e in log] == [False, False, True, True]
    with pytest.raises(SnapshotVacuumed):
        read_version(spark, tmp_table, 0)
    with pytest.raises(ValueError):
        read_version(spark, tmp_table, 99)
    assert _rows(read_version(spark, tmp_table, 2)) == [(2, "x")]


def test_vacuum_keeps_live_and_log(spark, tmp_table):
    for i in range(3):
        atomic_overwrite(_df(spark, [(i, "x")]), tmp_table, retain=10)
    removed = vacuum(tmp_table, keep_last=1)
    assert removed == [0, 1]
    assert _rows(read_table(spark, tmp_table)) == [(2, "x")]
    assert [e["version"] for e in history(tmp_table)] == [0, 1, 2]
    with pytest.raises(SnapshotVacuumed):
        read_version(spark, tmp_table, 0)


def test_merge_commits_are_versioned_too(spark, tmp_table):
    atomic_overwrite(_df(spark, [(1, "a"), (2, "b")]), tmp_table)
    merge_upsert(spark, tmp_table, _df(spark, [(2, "B"), (3, "c")]), keys=["k"], n_buckets=4)
    assert [e["version"] for e in history(tmp_table)] == [0, 1]
    # time travel to the pre-merge table (retain default keeps previous)
    assert _rows(read_version(spark, tmp_table, 0)) == [(1, "a"), (2, "b")]
    assert _rows(read_version(spark, tmp_table, 1)) == [(1, "a"), (2, "B"), (3, "c")]


# --------------------------------------------------------------- S10


def test_compaction_reduces_files_same_rows(spark, tmp_table):
    df = spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    atomic_overwrite(df.repartition(32), tmp_table)
    before_rows = _rows(read_table(spark, tmp_table))
    stats = compact_snapshot(spark, tmp_table, target_file_bytes=128 << 20)
    assert stats["files_before"] == 32
    assert stats["files_after"] == 1
    assert stats["version"] == 1
    assert _rows(read_table(spark, tmp_table)) == before_rows


def test_compaction_preserves_bucketed_layout_and_pruning(spark, tmp_table):
    """Compacting a merge-bucketed table keeps one dir per bucket and
    carries merge_buckets metadata, so later merges still bucket-prune."""
    base = _df(spark, [(i, f"v{i}") for i in range(40)])
    merge_upsert(spark, tmp_table, base.repartition(16), keys=["k"], n_buckets=4)
    stats = compact_snapshot(spark, tmp_table, target_file_bytes=128 << 20)
    snap = current_snapshot_path(tmp_table)
    buckets = sorted(e for e in os.listdir(snap) if e.startswith("_bucket="))
    assert len(buckets) == 4
    assert stats["files_after"] <= stats["files_before"]
    # a post-compaction merge must still use the pruned path: untouched
    # bucket files stay hard-link-identical (same inode) in the new snap
    inode_before = {
        os.path.relpath(p, snap): os.stat(p).st_ino for p, _ in _data_files(snap)
    }
    merge_upsert(spark, tmp_table, _df(spark, [(0, "UPD")]), keys=["k"], n_buckets=4)
    new_snap = current_snapshot_path(tmp_table)
    assert new_snap != snap
    linked = [
        rel
        for p, _ in _data_files(new_snap)
        for rel in [os.path.relpath(p, new_snap)]
        if inode_before.get(rel) == os.stat(p).st_ino
    ]
    assert linked, "expected untouched buckets to be hard-linked, got a full rewrite"
    got = dict((k, v) for k, v in _rows(read_table(spark, tmp_table)))
    assert got[0] == "UPD" and got[17] == "v17" and len(got) == 40


# --------------------------------------------------------------- S11


def test_merge_delete_arm(spark, tmp_table):
    atomic_overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), tmp_table)
    live = merge_upsert(
        spark,
        tmp_table,
        _df(spark, [(2, "B")]),
        keys=["k"],
        n_buckets=4,
        deletes=spark.createDataFrame([(3,), (99,)], ["k"]),  # 99: unmatched -> noop
    )
    assert _rows(live) == [(1, "a"), (2, "B")]


def test_merge_delete_then_reinsert_nets_to_update(spark, tmp_table):
    atomic_overwrite(_df(spark, [(1, "a"), (2, "b")]), tmp_table)
    live = merge_upsert(
        spark,
        tmp_table,
        _df(spark, [(2, "NEW")]),
        keys=["k"],
        n_buckets=4,
        deletes=spark.createDataFrame([(2,)], ["k"]),  # same key deleted AND upserted: batch wins
    )
    assert _rows(live) == [(1, "a"), (2, "NEW")]


def test_merge_delete_only_batch_is_bucket_pruned(spark, tmp_table):
    """An update-free delete batch still rewrites only the delete keys'
    buckets (delete buckets count as touched)."""
    base = _df(spark, [(i, f"v{i}") for i in range(40)])
    merge_upsert(spark, tmp_table, base, keys=["k"], n_buckets=8)
    snap = current_snapshot_path(tmp_table)
    inode_before = {os.path.relpath(p, snap): os.stat(p).st_ino for p, _ in _data_files(snap)}
    empty_updates = _df(spark, [(0, "x")]).filter(F.lit(False))
    live = merge_upsert(
        spark, tmp_table, empty_updates, keys=["k"], n_buckets=8, deletes=spark.createDataFrame([(5,)], ["k"])
    )
    assert len(_rows(live)) == 39 and (5, "v5") not in _rows(live)
    new_snap = current_snapshot_path(tmp_table)
    linked = [
        rel
        for p, _ in _data_files(new_snap)
        for rel in [os.path.relpath(p, new_snap)]
        if inode_before.get(rel) == os.stat(p).st_ino
    ]
    assert linked, "expected untouched buckets hard-linked on a delete-only merge"


def test_change_feed_types(spark):
    current = _df(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    batch = _df(spark, [(2, "B"), (5, "e")])
    deletes = spark.createDataFrame([(3,), (2,), (99,)], ["k"])
    feed = change_feed(current, batch, keys=["k"], deletes=deletes)
    got = sorted((r["k"], r["v"], r["_change_type"]) for r in feed.collect())
    assert got == [
        (2, "B", "update"),   # delete+reinsert nets to update with NEW values
        (3, "c", "delete"),   # carries the OLD row
        (5, "e", "insert"),
    ]


def test_incremental_compaction_links_large_rewrites_small(spark, tmp_table):
    """compact_small_files: files >= cutoff are hard-linked untouched
    (inode identity), only the small tail is bin-packed; row content
    identical."""
    from datalake_polygonscan_spark.io.maintenance import compact_small_files
    from datalake_polygonscan_spark.io.sinks import (
        append,
        atomic_overwrite,
        current_snapshot_path,
        read_table,
    )

    big = spark.range(50000).withColumn("v", F.col("id") * 2)
    atomic_overwrite(big.repartition(1), tmp_table, retain=10)
    # accrete a small-file tail into the live snapshot
    for i in range(4):
        append(spark.range(100 + i, 100 + i + 1).repartition(1).withColumn("v", F.col("id") * 2), tmp_table)

    snap = current_snapshot_path(tmp_table)
    files = {(p, os.stat(p).st_ino, sz) for p, sz in _data_files(snap)}
    big_files = {(os.path.basename(p), ino) for p, ino, sz in files if sz >= 4096}
    assert len(files) == 5, files

    stats = compact_small_files(
        spark, tmp_table, target_file_bytes=128 << 20, small_file_bytes=4096, retain=10
    )
    assert stats["rewritten"] == 4 and stats["linked"] >= 1
    assert stats["files_after"] < stats["files_before"]

    new_snap = current_snapshot_path(tmp_table)
    assert new_snap != snap
    new_files = {
        (os.path.basename(p), os.stat(p).st_ino) for p, _ in _data_files(new_snap)
    }
    # every large file survived as the SAME inode
    assert big_files <= new_files
    out = read_table(spark, tmp_table)
    assert out.count() == 50004
    assert out.agg(F.sum("v")).collect()[0][0] == sum(
        2 * i for i in range(50000)
    ) + sum(2 * i for i in range(100, 104))


def test_incremental_compaction_noop_when_no_small_tail(spark, tmp_table):
    from datalake_polygonscan_spark.io.maintenance import compact_small_files
    from datalake_polygonscan_spark.io.sinks import atomic_overwrite, read_pointer

    atomic_overwrite(spark.range(1000).repartition(1), tmp_table, retain=10)
    v_before = read_pointer(tmp_table)
    stats = compact_small_files(spark, tmp_table, small_file_bytes=64)
    assert stats["rewritten"] == 0
    assert read_pointer(tmp_table) == v_before  # no pointless commit


def test_incremental_compaction_preserves_hive_layout(spark, tmp_table):
    from datalake_polygonscan_spark.io.maintenance import compact_small_files
    from datalake_polygonscan_spark.io.sinks import (
        append,
        atomic_overwrite,
        current_snapshot_path,
        read_table,
    )

    df = spark.range(2000).withColumn("part", (F.col("id") % 2).cast("string"))
    atomic_overwrite(df, tmp_table, partition_by=["part"], retain=10)
    for _ in range(3):
        append(
            spark.range(5).withColumn("part", F.lit("0")),
            tmp_table,
            partition_by=["part"],
        )
    compact_small_files(
        spark, tmp_table, small_file_bytes=1 << 30, retain=10
    )  # everything is "small": full bin-pack per dir
    snap = current_snapshot_path(tmp_table)
    assert sorted(d for d in os.listdir(snap) if d.startswith("part=")) == [
        "part=0",
        "part=1",
    ]
    out = read_table(spark, tmp_table)
    assert out.count() == 2015
    assert out.filter(F.col("part") == "0").count() == 1015


def test_auto_optimize_triggers_only_past_threshold(spark, tmp_table):
    """Policy gate: below min_small_files it no-ops without a commit;
    past it, the incremental bin-pack runs."""
    from datalake_polygonscan_spark.io.maintenance import auto_optimize
    from datalake_polygonscan_spark.io.sinks import (
        append,
        atomic_overwrite,
        read_pointer,
        read_table,
    )

    atomic_overwrite(spark.range(50000).repartition(1), tmp_table, retain=10)
    for i in range(3):
        append(spark.range(500 + i, 501 + i).repartition(1), tmp_table)
    before = read_pointer(tmp_table)
    out = auto_optimize(spark, tmp_table, small_file_bytes=4096, min_small_files=5)
    assert out == {"triggered": False, "small_files": 3}
    assert read_pointer(tmp_table) == before  # no commit

    for i in range(4):
        append(spark.range(600 + i, 601 + i).repartition(1), tmp_table)
    out = auto_optimize(
        spark, tmp_table, small_file_bytes=4096, min_small_files=5, retain=10
    )
    assert out["triggered"] and out["small_files"] == 7
    assert out["rewritten"] == 7 and out["files_after"] < out["files_before"]
    assert read_table(spark, tmp_table).count() == 50007


# ---------------------------------------------------------------------------
# S44 row lineage
# ---------------------------------------------------------------------------


def test_row_lineage_ids_survive_upsert_and_inserts_extend(spark, tmp_path):
    from datalake_polygonscan_spark.io.rowlineage import (
        LAST_UPDATED,
        ROW_ID,
        rl_create,
        rl_read,
        rl_upsert,
    )

    path = str(tmp_path / "rl")
    base = spark.createDataFrame(
        [(10, 1.0), (20, 2.0), (30, 3.0)], "k long, p double"
    )
    rl_create(base, path, "k")
    v0 = {r["k"]: r[ROW_ID] for r in rl_read(spark, path).collect()}
    assert v0 == {10: 1, 20: 2, 30: 3}

    batch = spark.createDataFrame(
        [(20, 99.0), (40, 4.0), (5, 0.5)], "k long, p double"
    )
    rl_upsert(spark, path, batch, "k")
    rows = {r["k"]: r for r in rl_read(spark, path).collect()}
    # survivors keep ids; only the touched key advances its stamp
    assert rows[10][ROW_ID] == 1 and rows[10][LAST_UPDATED] == 0
    assert rows[20][ROW_ID] == 2 and rows[20][LAST_UPDATED] == 1
    assert rows[20]["p"] == 99.0
    assert rows[30][ROW_ID] == 3 and rows[30][LAST_UPDATED] == 0
    # inserts: fresh ids above max, allocated in key order
    assert rows[5][ROW_ID] == 4 and rows[40][ROW_ID] == 5
    assert rows[5][LAST_UPDATED] == 1 and rows[40][LAST_UPDATED] == 1


def test_row_lineage_noop_update_still_advances_stamp(spark, tmp_path):
    from datalake_polygonscan_spark.io.rowlineage import (
        LAST_UPDATED,
        ROW_ID,
        rl_create,
        rl_read,
        rl_upsert,
    )

    path = str(tmp_path / "rl2")
    rl_create(spark.createDataFrame([(1, 7.0)], "k long, p double"), path, "k")
    rl_upsert(
        spark, path, spark.createDataFrame([(1, 7.0)], "k long, p double"), "k"
    )
    r = rl_read(spark, path).collect()[0]
    assert r[ROW_ID] == 1 and r[LAST_UPDATED] == 1 and r["p"] == 7.0
