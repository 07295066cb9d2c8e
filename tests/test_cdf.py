"""Persisted Change Data Feed (io/merge.py write_changes/read_changes):
typed per-version feeds survive snapshot pruning, replay ranges are
gap-checked, and a replica built from the feed alone equals the source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.merge import changes_glob, merge_upsert, read_changes
from datalake_polygonscan_spark.io.sinks import read_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


def test_feed_types_and_versions(spark, tmp_path):
    tbl = str(tmp_path / "t")
    merge_upsert(spark, tbl, _df(spark, [(1, 1.0), (2, 2.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(spark, tbl, _df(spark, [(2, 20.0), (3, 3.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(
        spark, tbl, _df(spark, [(4, 4.0)]), ["k"], n_buckets=4,
        deletes=_df(spark, [(1, 0.0)]), write_changes=True,
    )
    feed = read_changes(spark, tbl)
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["v"]) for r in feed.collect()
    )
    assert got == [
        (0, "insert", 1, 1.0),
        (0, "insert", 2, 2.0),
        (1, "insert", 3, 3.0),
        (1, "update", 2, 20.0),
        (2, "delete", 1, 1.0),
        (2, "insert", 4, 4.0),
    ]
    sub = read_changes(spark, tbl, from_version=1, to_version=1)
    assert {r["_change_type"] for r in sub.collect()} == {"insert", "update"}


def test_feed_survives_snapshot_pruning(spark, tmp_path):
    tbl = str(tmp_path / "t")
    for i in range(4):  # default retain=2 prunes v0/v1 snapshot dirs
        merge_upsert(spark, tbl, _df(spark, [(i, float(i))]), ["k"], n_buckets=4, write_changes=True)
    snaps = [d for d in os.listdir(tbl) if d.startswith("snapshot=")]
    assert len(snaps) < 4  # pruning really happened
    feed = read_changes(spark, tbl, from_version=0)
    assert feed.count() == 4  # ...but every version's feed is readable
    assert sorted(r[0] for r in feed.select("_commit_version").distinct().collect()) == [0, 1, 2, 3]


def test_read_changes_gap_raises(spark, tmp_path):
    tbl = str(tmp_path / "t")
    merge_upsert(spark, tbl, _df(spark, [(1, 1.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(spark, tbl, _df(spark, [(2, 2.0)]), ["k"], n_buckets=4)  # NO feed
    merge_upsert(spark, tbl, _df(spark, [(3, 3.0)]), ["k"], n_buckets=4, write_changes=True)
    with pytest.raises(FileNotFoundError, match=r"\[1\]"):
        read_changes(spark, tbl, from_version=0)
    # the contiguous prefix/suffix are still readable explicitly
    assert read_changes(spark, tbl, 0, 0).count() == 1
    assert read_changes(spark, tbl, 2, 2).count() == 1


def test_replica_from_feed_alone_matches_source(spark, tmp_path):
    src, rep = str(tmp_path / "src"), str(tmp_path / "rep")
    merge_upsert(spark, src, _df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(spark, src, _df(spark, [(2, 20.0), (4, 4.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(
        spark, src, _df(spark, [(5, 5.0)]), ["k"], n_buckets=4,
        deletes=_df(spark, [(3, 0.0)]), write_changes=True,
    )
    feed = read_changes(spark, src)
    for v in sorted(r[0] for r in feed.select("_commit_version").distinct().collect()):
        sub = feed.filter(F.col("_commit_version") == v)
        ups = sub.filter(F.col("_change_type") != "delete").drop("_change_type", "_commit_version")
        dels = sub.filter(F.col("_change_type") == "delete").select("k")
        merge_upsert(
            spark, rep, ups, ["k"], n_buckets=4,
            deletes=dels if dels.limit(1).count() else None,
        )
    s, r = read_table(spark, src), read_table(spark, rep)
    assert s.exceptAll(r).count() == 0 and r.exceptAll(s).count() == 0


def test_changes_glob_readable_as_one_scan(spark, tmp_path):
    tbl = str(tmp_path / "t")
    merge_upsert(spark, tbl, _df(spark, [(1, 1.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(spark, tbl, _df(spark, [(1, 10.0)]), ["k"], n_buckets=4, write_changes=True)
    df = spark.read.parquet(changes_glob(tbl))
    assert df.count() == 2
    assert set(df.columns) == {"k", "v", "_change_type", "_commit_version"}
