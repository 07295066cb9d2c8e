"""S32 — branch/WAP protocol tests (io/branches.py)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io import branches as B
from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    atomic_overwrite,
    read_pointer,
    read_table,
    snapshot_version,
)


def _seed(spark, path, n=100):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    atomic_overwrite(df, str(path), retain=10)
    return df


def test_branch_fork_is_zero_copy_and_isolated(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    dirs_before = {d for d in os.listdir(t) if d.startswith("snapshot=")}
    B.create_branch(t, "dev")
    dirs_after = {d for d in os.listdir(t) if d.startswith("snapshot=")}
    assert dirs_before == dirs_after  # zero-copy: no new data dirs
    assert B.read_branch(spark, t, "dev").count() == 100

    extra = spark.range(100, 150).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    B.commit_branch(B.read_branch(spark, t, "dev").unionByName(extra), t, "dev")
    assert B.read_branch(spark, t, "dev").count() == 150
    assert read_table(spark, t).count() == 100  # main untouched


def test_branch_commit_cas_conflict(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _seed(spark, t)
    B.create_branch(t, "dev")
    base = B.read_branch_pointer(t, "dev")
    B.commit_branch(df.limit(10), t, "dev")  # writer 1 wins
    # writer 2 derived from the stale base: simulate by restoring base
    # expectation at the CAS — commit_branch re-reads internally, so
    # drive the ref back via a direct second commit racing the check
    import datalake_polygonscan_spark.io.branches as br_mod

    real_read = br_mod.read_branch_pointer
    calls = {"n": 0}

    def stale_then_real(path, branch):
        calls["n"] += 1
        if calls["n"] == 1:
            return base  # writer 2 planned against the old head
        return real_read(path, branch)

    br_mod_read = br_mod.read_branch_pointer
    try:
        br_mod.read_branch_pointer = stale_then_real
        with pytest.raises(SnapshotConflict):
            B.commit_branch(df.limit(5), t, "dev")
    finally:
        br_mod.read_branch_pointer = br_mod_read


def test_publish_fast_forwards_and_divergence_refuses(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _seed(spark, t)
    v0 = snapshot_version(read_pointer(t))
    B.create_branch(t, "wap")
    extra = spark.range(100, 120).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    B.commit_branch(B.read_branch(spark, t, "wap").unionByName(extra), t, "wap")
    B.publish_branch(t, "wap", retain=10)
    assert read_table(spark, t).count() == 120
    assert snapshot_version(read_pointer(t)) > v0
    # published pointer names the branch head snapshot (zero-copy)
    assert read_pointer(t)["op"] == "PUBLISH"

    B.create_branch(t, "late")
    atomic_overwrite(df, t, retain=10)  # main advances underneath
    with pytest.raises(B.BranchDiverged):
        B.publish_branch(t, "late", retain=10)
    B.drop_branch(t, "late")


def test_publish_prune_never_deletes_other_branch_snapshots(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    B.create_branch(t, "keepme")  # parked at v0's snapshot
    B.create_branch(t, "wap")
    head = B.read_branch(spark, t, "wap")
    for i in range(4):  # advance the wap branch several versions
        extra = spark.range(200 + i, 201 + i).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        head = B.read_branch(spark, t, "wap").unionByName(extra)
        B.commit_branch(head, t, "wap")
    B.publish_branch(t, "wap", retain=1)  # aggressive retain
    # the parked branch must still be fully readable
    assert B.read_branch(spark, t, "keepme").count() == 100
    assert read_table(spark, t).count() == 104


def test_drop_branch_leaves_main_and_errors_are_clean(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    with pytest.raises(FileNotFoundError):
        B.read_branch(spark, t, "ghost")
    with pytest.raises(ValueError):
        B.create_branch(t, "../evil")
    B.create_branch(t, "dev")
    with pytest.raises(ValueError):
        B.create_branch(t, "dev")  # duplicate
    B.drop_branch(t, "dev")
    assert B.list_branches(t) == {}
    assert read_table(spark, t).count() == 100
    B.drop_branch(t, "dev")  # idempotent
