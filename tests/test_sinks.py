"""Atomic snapshot sink semantics (S4/S5): pointer swap, crash safety,
append, partitioned layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.sinks import (
    append,
    atomic_overwrite,
    current_snapshot_path,
    read_table,
    write_partitioned,
)


def test_overwrite_replaces_atomically(spark, tmp_table):
    df1 = spark.range(10)
    df2 = spark.range(100, 105)
    atomic_overwrite(df1, tmp_table)
    assert read_table(spark, tmp_table).count() == 10
    atomic_overwrite(df2, tmp_table)
    assert sorted(r.id for r in read_table(spark, tmp_table).collect()) == [100, 101, 102, 103, 104]


def test_failed_write_keeps_previous_snapshot(spark, tmp_table):
    """A crash mid-write must leave the old snapshot live — the exact
    failure the reference's TRUNCATE-then-COPY cannot survive
    (resources/redshift.py:80,98-104)."""
    atomic_overwrite(spark.range(7), tmp_table)
    bad = spark.range(10).selectExpr("assert_true(id < 5) as x", "id")
    with pytest.raises(Exception):
        atomic_overwrite(bad, tmp_table)
    # pointer still resolves to the good snapshot
    assert read_table(spark, tmp_table).count() == 7


def test_append_accumulates(spark, tmp_table):
    atomic_overwrite(spark.range(5), tmp_table)
    append(spark.range(5, 8), tmp_table)
    assert read_table(spark, tmp_table).count() == 8


def test_snapshot_pruning(spark, tmp_table):
    for i in range(3):
        atomic_overwrite(spark.range(i + 1), tmp_table)
    versions = sorted(
        int(e.split("=")[1].split("-")[0]) for e in os.listdir(tmp_table) if e.startswith("snapshot=")
    )
    assert versions == [1, 2]  # current + one-reader grace
    assert os.path.basename(current_snapshot_path(tmp_table)).startswith("snapshot=2-")


def test_concurrent_commit_raises_and_preserves_winner(spark, tmp_table):
    """CAS pointer swap: a writer whose base pointer went stale must
    get SnapshotConflict (not silently clobber the winner), and a
    merge-level retry must land BOTH writers' rows."""
    import pytest

    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import (
        SnapshotConflict,
        commit_snapshot,
        new_snapshot_name,
        read_pointer,
    )

    cols = ["k", "v"]
    atomic_overwrite(spark.createDataFrame([("a", 1)], cols), tmp_table)

    # writer A reads its base, then writer B commits first
    stale_base = read_pointer(tmp_table)
    merge_upsert(spark, tmp_table, spark.createDataFrame([("b", 2)], cols), keys=["k"], n_buckets=4)

    # A's commit against the stale base must be rejected...
    orphan = new_snapshot_name(stale_base)
    os.makedirs(os.path.join(tmp_table, orphan))
    with pytest.raises(SnapshotConflict):
        commit_snapshot(tmp_table, orphan, stale_base, None)
    # ...and B's rows are still live
    assert sorted(tuple(r) for r in read_table(spark, tmp_table).collect()) == [("a", 1), ("b", 2)]

    # A retries through merge_upsert (internal re-read + CAS): both land
    merge_upsert(spark, tmp_table, spark.createDataFrame([("c", 3)], cols), keys=["k"], n_buckets=4)
    assert sorted(tuple(r) for r in read_table(spark, tmp_table).collect()) == [
        ("a", 1), ("b", 2), ("c", 3),
    ]


def test_partitioned_write_layout(spark, tmp_table):
    df = spark.createDataFrame([(i, "ab"[i % 2]) for i in range(10)], ["id", "part"])
    write_partitioned(df, tmp_table, ["part"])
    entries = {e for e in os.listdir(tmp_table) if e.startswith("part=")}
    assert entries == {"part=a", "part=b"}


def test_restore_rolls_back_by_rolling_forward(spark, tmp_path):
    from datalake_polygonscan_spark.io.sinks import (
        atomic_overwrite,
        history,
        read_table,
        read_version,
        restore_version,
    )

    tbl = str(tmp_path / "t")
    v0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    atomic_overwrite(v0, tbl, retain=10)
    atomic_overwrite(v0.withColumn("v", F.col("v") * 100), tbl, retain=10)  # bad
    live = restore_version(spark, tbl, 0, retain=10)
    assert sorted((r.k, r.v) for r in live.collect()) == [(1, 10.0), (2, 20.0)]
    log = history(tbl)
    assert len(log) == 3 and log[-1]["restored_from"] == 0
    # the rolled-back commit stays readable for forensics
    assert sorted(r.v for r in read_version(spark, tbl, 1).collect()) == [1000.0, 2000.0]
    # negative indexing: -3 = v0 content too
    assert read_version(spark, tbl, -3).count() == 2


def test_restore_preserves_mor_state(spark, tmp_path):
    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import read_table, restore_version
    from datalake_polygonscan_spark.io.tombstones import delete_keys

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], ["k", "v"])
    merge_upsert(spark, tbl, df, keys=["k"], n_buckets=4)  # v0
    delete_keys(spark, tbl, spark.createDataFrame([(3, 0.0)], ["k", "v"]), ["k"])  # v1
    merge_upsert(spark, tbl, spark.createDataFrame([(99, 99.0)], ["k", "v"]), keys=["k"], n_buckets=4)  # v2
    live = restore_version(spark, tbl, 1, retain=10)  # back to: 3 deleted, no 99
    got = sorted(r.k for r in live.collect())
    assert 3 not in got and 99 not in got and len(got) == 9


def test_history_records_operations(spark, tmp_path):
    from datalake_polygonscan_spark.io.maintenance import compact_snapshot
    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import history, restore_version
    from datalake_polygonscan_spark.io.tombstones import append_upserts, delete_keys

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
    merge_upsert(spark, tbl, df, keys=["k"], n_buckets=4)
    delete_keys(spark, tbl, spark.createDataFrame([(1, 0.0)], ["k", "v"]), ["k"])
    append_upserts(spark, tbl, spark.createDataFrame([(3, 3.0)], ["k", "v"]), ["k"])
    compact_snapshot(spark, tbl, retain=10)
    restore_version(spark, tbl, 2, retain=10)  # v0/v1 pruned by default retain
    ops = [e.get("op") for e in history(tbl)]
    assert ops == ["MERGE", "DELETE", "MOR_UPSERT", "OPTIMIZE", "RESTORE"]


# ---------------------------------------------------------------------------
# round 4: commit-log checkpointing + true multi-process CAS racing
# ---------------------------------------------------------------------------

def _commit_n(tbl: str, n: int) -> None:
    """n cheap pointer-only commits (no Spark jobs — the log layer is
    pure Python)."""
    from datalake_polygonscan_spark.io.sinks import (
        commit_snapshot,
        new_snapshot_name,
        read_pointer,
    )

    os.makedirs(tbl, exist_ok=True)
    for _ in range(n):
        base = read_pointer(tbl)
        name = new_snapshot_name(base)
        os.makedirs(os.path.join(tbl, name), exist_ok=True)
        commit_snapshot(tbl, name, base, {"op": "WRITE"})


def test_log_checkpoint_bounds_history_reads(tmp_path):
    """120 commits -> checkpoints at 32/64/96; history() must read the
    newest checkpoint + the 24-entry tail, NOT all 120 entry files."""
    import builtins

    from datalake_polygonscan_spark.io import sinks as S

    tbl = str(tmp_path / "t")
    _commit_n(tbl, 120)
    log_dir = os.path.join(tbl, "_log")
    cps = sorted(f for f in os.listdir(log_dir) if f.startswith("checkpoint-"))
    assert [int(c[len("checkpoint-"):].split(".")[0]) for c in cps] == [32, 64, 96]

    real_open = builtins.open
    reads = []

    def counting_open(path, *a, **kw):
        if str(path).startswith(log_dir):
            reads.append(str(path))
        return real_open(path, *a, **kw)

    builtins.open = counting_open
    try:
        log = S.history(tbl)
    finally:
        builtins.open = real_open
    assert [e["version"] for e in log] == list(range(120))
    # 1 checkpoint + versions 97..119 (23 files) = 24 reads
    assert len(reads) == 24, reads
    assert sum("checkpoint-" in p for p in reads) == 1


def test_compact_log_preserves_history(tmp_path):
    from datalake_polygonscan_spark.io import sinks as S

    tbl = str(tmp_path / "t")
    _commit_n(tbl, 70)  # checkpoints at 32, 64
    before = S.history(tbl)
    removed = S.compact_log(tbl)
    assert removed == 65  # per-version files 0..64 covered by checkpoint-64
    after = S.history(tbl)
    assert [(e["version"], e["snapshot"]) for e in before] == [
        (e["version"], e["snapshot"]) for e in after
    ]
    # and later commits keep extending the same log
    _commit_n(tbl, 1)
    assert S.history(tbl)[-1]["version"] == 70


_RACER = r"""
import os, sys, time
sys.path.insert(0, sys.argv[3])
from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict, commit_snapshot, new_snapshot_name, read_pointer,
)
tbl, tag = sys.argv[1], sys.argv[2]
base = read_pointer(tbl)
name = new_snapshot_name(base)
os.makedirs(os.path.join(tbl, name), exist_ok=True)
# handshake: base is read -> tell the test we're parked. Without this
# a slow interpreter start can read the pointer AFTER the fast racer
# committed, see the new base, and legitimately commit as FIRST too.
with open(os.path.join(tbl, "_ready_" + tag), "w") as f:
    f.write("ready")
go = os.path.join(tbl, "_go")
deadline = time.monotonic() + 30
while not os.path.exists(go):
    if time.monotonic() > deadline:
        sys.exit(2)
    time.sleep(0.0005)
try:
    commit_snapshot(tbl, name, base, {"writer": tag})
    print("FIRST")
except SnapshotConflict:
    base2 = read_pointer(tbl)
    name2 = new_snapshot_name(base2)
    os.makedirs(os.path.join(tbl, name2), exist_ok=True)
    commit_snapshot(tbl, name2, base2, {"writer": tag})
    print("RETRY")
"""


@pytest.mark.parametrize("round_", range(3))
def test_two_process_cas_race(tmp_path, round_):
    """TWO OS PROCESSES commit against the same table from the same
    base pointer (the race Delta's protocol defends; in-process
    interleaving is tested above): exactly one wins the CAS, the loser
    gets SnapshotConflict and succeeds on retry, no commit is lost."""
    import subprocess
    import sys as _sys
    import time as _time

    from datalake_polygonscan_spark.io.sinks import history

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tbl = str(tmp_path / "t")
    os.makedirs(tbl)
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _RACER, tbl, f"w{i}", repo],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    # wait until BOTH racers have read the base pointer and parked on
    # the go-file spin (a fixed sleep raced against interpreter startup)
    deadline = _time.monotonic() + 30
    while not all(os.path.exists(os.path.join(tbl, f"_ready_w{i}")) for i in range(2)):
        assert _time.monotonic() < deadline, "racers failed to start"
        _time.sleep(0.005)
    with open(os.path.join(tbl, "_go"), "w") as f:
        f.write("go")
    outs = sorted(p.communicate(timeout=60)[0].strip() for p in procs)
    assert all(p.returncode == 0 for p in procs)
    assert outs == ["FIRST", "RETRY"]  # exactly one winner, one retried loser
    log = history(tbl)
    assert [e["version"] for e in log] == [0, 1]
    assert {e["writer"] for e in log} == {"w0", "w1"}  # neither commit lost


def test_timestamp_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: resolve the newest commit at-or-before the
    requested wall-clock time; before-table timestamps raise."""
    import pytest as _pytest

    from datalake_polygonscan_spark.io.sinks import (
        atomic_overwrite,
        history,
        read_version_at_timestamp,
    )

    tbl = str(tmp_path / "t")
    v0 = spark.createDataFrame([(1, "a")], ["k", "s"])
    v1 = spark.createDataFrame([(1, "b"), (2, "c")], ["k", "s"])
    atomic_overwrite(v0, tbl, retain=10)
    atomic_overwrite(v1, tbl, retain=10)
    t0, t1 = (float(e["committed_at"]) for e in history(tbl))
    assert t0 <= t1
    mid = (t0 + t1) / 2 if t1 > t0 else t0
    got_mid = sorted(tuple(r) for r in read_version_at_timestamp(spark, tbl, mid).collect())
    assert got_mid == [(1, "a")]
    got_now = sorted(tuple(r) for r in read_version_at_timestamp(spark, tbl, t1 + 10).collect())
    assert got_now == [(1, "b"), (2, "c")]
    with _pytest.raises(ValueError):
        read_version_at_timestamp(spark, tbl, t0 - 10)


def test_shallow_clone_zero_copy_and_bidirectional_isolation(spark, tmp_path):
    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import (
        current_snapshot_path,
        history,
        read_table,
        shallow_clone,
    )

    src, cl = str(tmp_path / "src"), str(tmp_path / "cl")
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], ["k", "v"])
    merge_upsert(spark, src, df, keys=["k"], n_buckets=4)
    shallow_clone(spark, src, cl)

    def inos(t):
        import os as _os

        snap = current_snapshot_path(t)
        return {
            _os.path.relpath(_os.path.join(dp, f), snap): _os.stat(_os.path.join(dp, f)).st_ino
            for dp, _, fs in _os.walk(snap)
            for f in fs
            if not f.startswith(("_", "."))
        }

    assert inos(src) == inos(cl) and inos(src)  # zero-copy v0
    assert history(cl)[0]["op"] == "CLONE" and "cloned_from" in history(cl)[0]

    # clone writes don't touch the source...
    merge_upsert(spark, cl, spark.createDataFrame([(1, 100.0)], ["k", "v"]), keys=["k"], n_buckets=4)
    assert {r["k"]: r["v"] for r in read_table(spark, src).collect()}[1] == 1.0
    # ...and source writes don't touch the clone
    merge_upsert(spark, src, spark.createDataFrame([(2, 200.0)], ["k", "v"]), keys=["k"], n_buckets=4)
    assert {r["k"]: r["v"] for r in read_table(spark, cl).collect()}[2] == 2.0
    assert {r["k"]: r["v"] for r in read_table(spark, cl).collect()}[1] == 100.0


def test_shallow_clone_survives_source_vacuum(spark, tmp_path):
    """Hard links keep shared file data alive: pruning the source's
    old snapshot dirs must not break the clone's reads."""
    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import read_table, shallow_clone, vacuum

    src, cl = str(tmp_path / "src"), str(tmp_path / "cl")
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], ["k", "v"])
    merge_upsert(spark, src, df, keys=["k"], n_buckets=4)
    shallow_clone(spark, src, cl)
    # source moves on twice, then prunes everything but its newest
    for val in (50.0, 60.0):
        merge_upsert(spark, src, spark.createDataFrame([(0, val)], ["k", "v"]), keys=["k"], n_buckets=4)
    vacuum(src, keep_last=1)
    got = sorted((r["k"], r["v"]) for r in read_table(spark, cl).collect())
    assert got == [(i, float(i)) for i in range(10)]  # clone intact


def test_shallow_clone_refuses_existing_table(spark, tmp_path):
    import pytest as _pytest

    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import shallow_clone

    src, cl = str(tmp_path / "src"), str(tmp_path / "cl")
    df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    merge_upsert(spark, src, df, keys=["k"], n_buckets=2)
    merge_upsert(spark, cl, df, keys=["k"], n_buckets=2)
    with _pytest.raises(FileExistsError):
        shallow_clone(spark, src, cl)


def test_rename_columns_zero_copy_and_time_travel(spark, tmp_path):
    """S27: renames are metadata-only (every data file hard-linked),
    compose across commits, and time travel resolves names through
    each version's own map."""
    from datalake_polygonscan_spark.io.sinks import read_version, rename_columns

    t = str(tmp_path / "t")
    df = spark.range(20).withColumn("v", F.col("id") * 2)
    atomic_overwrite(df, t, retain=10)

    def inodes():
        snap = current_snapshot_path(t)
        return sorted(
            os.stat(os.path.join(dp, f)).st_ino
            for dp, _, fs in os.walk(snap)
            for f in fs
            if not f.startswith(("_", "."))
        )

    before = inodes()
    rename_columns(spark, t, {"v": "value"}, retain=10)
    assert inodes() == before
    rename_columns(spark, t, {"value": "value_x2", "id": "key"}, retain=10)
    assert inodes() == before

    live = read_table(spark, t)
    assert set(live.columns) == {"key", "value_x2"}
    assert live.agg(F.sum("value_x2")).collect()[0][0] == sum(2 * i for i in range(20))
    assert set(read_version(spark, t, 0).columns) == {"id", "v"}
    assert set(read_version(spark, t, 1).columns) == {"id", "value"}


def test_rename_columns_rejects_bad_names(spark, tmp_path):
    from datalake_polygonscan_spark.io.sinks import rename_columns

    t = str(tmp_path / "t")
    atomic_overwrite(spark.range(5).withColumn("v", F.lit(1)), t)
    with pytest.raises(ValueError, match="no such column"):
        rename_columns(spark, t, {"nope": "x"})
    with pytest.raises(ValueError, match="duplicate"):
        rename_columns(spark, t, {"v": "id"})


def test_rename_blocks_merge_until_compaction_materializes(spark, tmp_path):
    """MERGE addresses physical names, so a pending map refuses the
    merge; OPTIMIZE rewrites logical names into the files, drops the
    map, and merging resumes."""
    from datalake_polygonscan_spark.io.maintenance import compact_snapshot
    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import read_pointer, rename_columns

    t = str(tmp_path / "t")
    atomic_overwrite(spark.range(10).withColumn("v", F.col("id") + 100), t, retain=10)
    rename_columns(spark, t, {"v": "price"}, retain=10)
    batch = spark.range(5).withColumn("price", F.lit(0).cast("long"))
    with pytest.raises(ValueError, match="pending column-mapping"):
        merge_upsert(spark, t, batch, keys=["id"])
    compact_snapshot(spark, t, retain=10)
    meta = read_pointer(t)
    assert "column_mapping" not in meta
    live = merge_upsert(spark, t, batch, keys=["id"])
    got = {r.id: r.price for r in live.collect()}
    assert got[3] == 0 and got[7] == 107


def test_rename_refuses_mor_and_cdf_tables(spark, tmp_path):
    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.sinks import rename_columns
    from datalake_polygonscan_spark.io.tombstones import delete_keys

    t = str(tmp_path / "t")
    df = spark.range(10).withColumn("v", F.col("id"))
    merge_upsert(spark, t, df, keys=["id"])
    with pytest.raises(ValueError, match="merge-bucketed"):
        rename_columns(spark, t, {"v": "w"})

    t2 = str(tmp_path / "t2")
    atomic_overwrite(df, t2)
    # plain table with tombstone-free history renames fine
    rename_columns(spark, t2, {"v": "w"})
    assert "w" in read_table(spark, t2).columns


def test_shallow_clone_version_as_of(spark, tmp_path):
    """CLONE ... VERSION AS OF: the clone's v0 is the SOURCE's
    historical snapshot (hard-linked), independent of later source
    commits; vacuumed versions refuse."""
    from datalake_polygonscan_spark.io.sinks import (
        SnapshotVacuumed,
        read_version,
        shallow_clone,
        vacuum,
    )

    src = str(tmp_path / "src")
    atomic_overwrite(spark.range(10), src, retain=10)            # v0
    atomic_overwrite(spark.range(100, 105), src, retain=10)      # v1
    atomic_overwrite(spark.range(200, 202), src, retain=10)      # v2 (live)

    c0 = str(tmp_path / "c0")
    shallow_clone(spark, src, c0, version=0)
    assert sorted(r.id for r in read_table(spark, c0).collect()) == list(range(10))
    # negative indexing: -2 = v1
    c1 = str(tmp_path / "c1")
    shallow_clone(spark, src, c1, version=-2)
    assert sorted(r.id for r in read_table(spark, c1).collect()) == [100, 101, 102, 103, 104]
    # the clone is frozen: a later source commit doesn't leak in
    atomic_overwrite(spark.range(300, 310), src, retain=10)
    assert read_table(spark, c0).count() == 10

    vacuum(src, keep_last=1)
    c2 = str(tmp_path / "c2")
    with pytest.raises(SnapshotVacuumed):
        shallow_clone(spark, src, c2, version=0)
    with pytest.raises(ValueError, match="never committed"):
        shallow_clone(spark, src, c2, version=99)


def test_zombie_commit_replay_rejected(tmp_path):
    """Task-retry idempotence for the MERGE/commit path: a zombie
    driver retry replaying commit_snapshot with the SAME base_meta
    after the original attempt already succeeded must get
    SnapshotConflict (the pointer moved past its base), never a
    silent second version of the same logical commit."""
    import pytest as _pytest

    from datalake_polygonscan_spark.io.sinks import (
        SnapshotConflict, commit_snapshot, read_pointer,
    )

    table = str(tmp_path / "t")
    os.makedirs(table)
    commit_snapshot(table, "snapshot=0-base", None)
    base = read_pointer(table)
    commit_snapshot(table, "snapshot=1-attempt", base)  # original succeeds
    v1 = read_pointer(table)
    with _pytest.raises(SnapshotConflict):
        commit_snapshot(table, "snapshot=1-attempt-retry", base)  # zombie replay
    assert read_pointer(table) == v1  # winner untouched


def test_gc_orphans_only_touches_unreferenced(spark, tmp_path):
    """S38: orphan GC may remove ONLY data the commit log never heard
    of — committed versions (even vacuum-eligible old ones) and young
    orphans survive."""
    import os

    from datalake_polygonscan_spark.io.maintenance import gc_orphans
    from datalake_polygonscan_spark.io.sinks import atomic_overwrite, read_table

    df = spark.range(10).withColumnRenamed("id", "k")
    path = str(tmp_path / "t")
    atomic_overwrite(df, path, retain=10)
    atomic_overwrite(df.withColumn("k", F.col("k") + 1), path, retain=10)

    orphan = os.path.join(path, "snapshot=99-nevercommitted")
    df.limit(2).write.mode("overwrite").parquet(orphan)
    stray = os.path.join(path, "junk-leftover.bin")
    with open(stray, "wb") as fh:
        fh.write(b"junk")

    # young orphans survive the age guard
    assert gc_orphans(path, min_age_s=3600) == []
    assert os.path.isdir(orphan) and os.path.exists(stray)

    removed = gc_orphans(path, min_age_s=0)
    assert sorted(removed) == ["junk-leftover.bin", "snapshot=99-nevercommitted"]
    assert not os.path.exists(orphan) and not os.path.exists(stray)
    # both committed versions intact
    assert read_table(spark, path).count() == 10
    from datalake_polygonscan_spark.io.sinks import read_version

    assert read_version(spark, path, 0).count() == 10


def test_gc_orphans_inflight_guard_keys_on_newest_inner_mtime(spark, tmp_path):
    """The min_age guard must key on the newest write ANYWHERE under a
    candidate tree, not its root dir's creation time: a slow writer
    creates the snapshot dir early, keeps writing files, and commits
    at the end — the recent inner files prove it is still in flight."""
    import os
    import time as _time

    from datalake_polygonscan_spark.io.maintenance import gc_orphans
    from datalake_polygonscan_spark.io.sinks import atomic_overwrite

    path = str(tmp_path / "t")
    atomic_overwrite(spark.range(5).withColumnRenamed("id", "k"), path, retain=10)

    inflight = os.path.join(path, "snapshot=99-inflight")
    spark.range(3).write.mode("overwrite").parquet(inflight)
    # age the ROOT dir and one early file far past the guard, then
    # simulate the writer still appending: touch one inner file now
    old = _time.time() - 7200
    os.utime(inflight, (old, old))
    inner = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(inflight)
        for f in fs
    ]
    for f in inner:
        os.utime(f, (old, old))
    os.utime(inner[-1], None)  # most recent write: writer is alive

    assert gc_orphans(path, min_age_s=3600) == []
    assert os.path.isdir(inflight)

    # once every file is old, the same candidate is collectable
    os.utime(inner[-1], (old, old))
    assert gc_orphans(path, min_age_s=3600) == ["snapshot=99-inflight"]


def test_migrate_in_place_is_zero_copy_and_isolated(spark, tmp_path):
    """S39: migration hard-links every file (same inodes) and later
    table commits never disturb the legacy directory."""
    import os

    from datalake_polygonscan_spark.io.sinks import (
        atomic_overwrite, migrate_in_place, read_table,
    )

    legacy = str(tmp_path / "legacy")
    table = str(tmp_path / "t")
    src = spark.range(20).withColumn("p", F.col("id") % 2)
    src.write.mode("overwrite").partitionBy("p").parquet(legacy)

    def inodes(root):
        out = {}
        for dirpath, _d, names in os.walk(root):
            for nm in names:
                if nm.endswith(".parquet"):
                    full = os.path.join(dirpath, nm)
                    out[os.path.relpath(full, root)] = os.stat(full).st_ino
        return out

    li = inodes(legacy)
    migrated = migrate_in_place(spark, legacy, table)
    snap = [e for e in os.listdir(table) if e.startswith("snapshot=")][0]
    assert inodes(os.path.join(table, snap)) == li and li
    assert migrated.count() == 20

    atomic_overwrite(migrated.filter(F.col("id") < 5), table, retain=10)
    assert spark.read.parquet(legacy).count() == 20  # legacy untouched
    assert read_table(spark, table).count() == 5


def test_gc_orphans_never_touches_system_namespaces(spark, tmp_path):
    """S38 regression: underscore-prefixed table-root entries are
    SYSTEM namespaces (_changes CDF feed, _stream_chk checkpoints) —
    orphan GC must never remove them even though the commit log does
    not reference them by name."""
    import os

    from datalake_polygonscan_spark.io.maintenance import gc_orphans
    from datalake_polygonscan_spark.io.sinks import atomic_overwrite

    df = spark.range(5).withColumnRenamed("id", "k")
    path = str(tmp_path / "t")
    atomic_overwrite(df, path)
    for system_dir in ("_changes", "_stream_chk"):
        os.makedirs(os.path.join(path, system_dir, "x"), exist_ok=True)
    assert gc_orphans(path, min_age_s=0) == []
    assert os.path.isdir(os.path.join(path, "_changes", "x"))
    assert os.path.isdir(os.path.join(path, "_stream_chk", "x"))
