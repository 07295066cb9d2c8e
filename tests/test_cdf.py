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


def test_cdf_is_a_table_property(spark, tmp_path):
    """Once a merge enables CDF, every later content-changing commit
    emits a feed even when the caller forgets write_changes=True — a
    feedless version would be a gap streaming consumers silently skip
    (round-3 ADVICE)."""
    tbl = str(tmp_path / "t")
    merge_upsert(spark, tbl, _df(spark, [(1, 1.0)]), ["k"], n_buckets=4, write_changes=True)
    merge_upsert(spark, tbl, _df(spark, [(2, 2.0)]), ["k"], n_buckets=4)  # flag omitted
    merge_upsert(spark, tbl, _df(spark, [(3, 3.0)]), ["k"], n_buckets=4, write_changes=True)
    feed = read_changes(spark, tbl, from_version=0)
    assert sorted(
        r[0] for r in feed.select("_commit_version").distinct().collect()
    ) == [0, 1, 2]


def test_read_changes_gap_raises(spark, tmp_path):
    import shutil

    tbl = str(tmp_path / "t")
    for i in range(3):
        merge_upsert(spark, tbl, _df(spark, [(i, float(i))]), ["k"], n_buckets=4, write_changes=True)
    # manufacture a real gap (e.g. an operator deleted a feed dir by
    # hand): the consumer must refuse a silent partial replay
    shutil.rmtree(os.path.join(tbl, "_changes", f"{1:012d}"))
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


# ---------------------------------------------------------------------------
# round 4: every content-changing commit on a CDF table emits a feed
# (delete_keys / append_upserts / restore / OPTIMIZE), the crash window
# between CAS and publish is repairable, and retention prunes loudly.
# ---------------------------------------------------------------------------

def _cdf_table(spark, tmp_path, rows=((1, 1.0), (2, 2.0), (3, 3.0))):
    tbl = str(tmp_path / "t")
    merge_upsert(spark, tbl, _df(spark, list(rows)), ["k"], n_buckets=4, write_changes=True)
    return tbl


def test_mor_delete_emits_feed(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import delete_keys

    tbl = _cdf_table(spark, tmp_path)
    delete_keys(spark, tbl, _df(spark, [(2, 0.0)]), ["k"])
    feed = read_changes(spark, tbl, 1, 1)
    assert [(r["_change_type"], r["k"]) for r in feed.collect()] == [("delete", 2)]
    # deleting an already-absent key still commits, with an EMPTY feed
    delete_keys(spark, tbl, _df(spark, [(99, 0.0)]), ["k"])
    assert read_changes(spark, tbl, 2, 2).count() == 0


def test_mor_upsert_emits_typed_feed(spark, tmp_path):
    from datalake_polygonscan_spark.io.tombstones import append_upserts

    tbl = _cdf_table(spark, tmp_path)
    append_upserts(spark, tbl, _df(spark, [(3, 30.0), (9, 9.0)]), ["k"])
    feed = read_changes(spark, tbl, 1, 1)
    assert sorted((r["_change_type"], r["k"]) for r in feed.collect()) == [
        ("insert", 9),
        ("update", 3),
    ]


def test_restore_emits_diff_feed(spark, tmp_path):
    from datalake_polygonscan_spark.io.sinks import restore_version

    tbl = _cdf_table(spark, tmp_path)
    # one commit after v0: default retain=2 keeps v0 readable for the
    # restore target
    merge_upsert(
        spark, tbl, _df(spark, [(2, 20.0), (4, 4.0)]), ["k"], n_buckets=4,
        deletes=_df(spark, [(3, 0.0)]),
    )
    restore_version(spark, tbl, 0)
    feed = read_changes(spark, tbl, 2, 2)
    got = sorted((r["_change_type"], r["k"]) for r in feed.collect())
    # rollback as typed CDC: key 4 (added after v0) retracts, key 2
    # reverts to its v0 value, key 3 (deleted after v0) re-inserts
    assert got == [("delete", 4), ("insert", 3), ("update", 2)]
    # and the replica invariant holds: feed-applied state == table
    assert sorted(
        (r["k"], r["v"]) for r in read_table(spark, tbl).collect()
    ) == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_optimize_emits_empty_feed(spark, tmp_path):
    from datalake_polygonscan_spark.io.maintenance import compact_snapshot

    tbl = _cdf_table(spark, tmp_path)
    compact_snapshot(spark, tbl)
    assert read_changes(spark, tbl, 1, 1).count() == 0
    # the range replay over [0,1] still works (no gap)
    assert read_changes(spark, tbl, 0, 1).count() == 3


def test_repair_promotes_interrupted_publish(spark, tmp_path):
    import os as _os

    from datalake_polygonscan_spark.io.merge import repair_change_feed
    from datalake_polygonscan_spark.io.sinks import history

    tbl = _cdf_table(spark, tmp_path)
    merge_upsert(spark, tbl, _df(spark, [(4, 4.0)]), ["k"], n_buckets=4)
    # simulate a crash between the pointer CAS and the feed publish:
    # rename the published v1 feed back to its staged (.pending) name
    snap1 = next(e["snapshot"] for e in history(tbl) if e["version"] == 1)
    pub = _os.path.join(tbl, "_changes", f"{1:012d}")
    _os.rename(pub, _os.path.join(tbl, "_changes", f".pending-{snap1}"))
    assert not _os.path.isdir(pub)  # the gap is real before repair
    assert repair_change_feed(tbl) == [1]
    assert read_changes(spark, tbl, 0).count() == 4


def test_prune_changes_raises_loudly_on_overpruned_read(spark, tmp_path):
    from datalake_polygonscan_spark.io.merge import prune_changes

    tbl = _cdf_table(spark, tmp_path)
    for i in range(3):
        merge_upsert(spark, tbl, _df(spark, [(10 + i, 1.0)]), ["k"], n_buckets=4)
    assert prune_changes(tbl, before_version=2) == [0, 1]
    with pytest.raises(FileNotFoundError, match="pruned by"):
        read_changes(spark, tbl, from_version=0)
    assert read_changes(spark, tbl, from_version=2).count() == 2
