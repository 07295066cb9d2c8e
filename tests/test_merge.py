"""S6 incremental MERGE ingest (io/merge.py): upsert semantics,
idempotency, bootstrap, and the max-block watermark — the strict
upgrade over the reference's TRUNCATE+COPY weekly full refresh
(resources/redshift.py:80,98-104; startblock at walletDataConsumer.py:57)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.merge import merge_upsert, next_start_block
from datalake_polygonscan_spark.io.sinks import atomic_overwrite, read_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_bootstrap_creates_table(spark, tmp_table):
    batch = spark.createDataFrame([("w1", "h1", 10, 1.0)], ["wallet_address", "tx_hash", "block_number", "qty"])
    live = merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"])
    assert _rows(live) == _rows(batch)


def test_merge_updates_inserts_and_keeps(spark, tmp_table):
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    current = spark.createDataFrame(
        [("w1", "h1", 10, 1.0), ("w1", "h2", 11, 2.0), ("w2", "h3", 12, 3.0)], cols
    )
    atomic_overwrite(current, tmp_table)
    batch = spark.createDataFrame(
        [("w1", "h2", 11, 20.0),  # update: replaces the current row
         ("w2", "h4", 13, 4.0)],  # insert: new key
        cols,
    )
    live = merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"])
    assert _rows(live) == sorted(
        [("w1", "h1", 10, 1.0), ("w1", "h2", 11, 20.0), ("w2", "h3", 12, 3.0), ("w2", "h4", 13, 4.0)]
    )


def test_merge_idempotent(spark, tmp_table):
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    atomic_overwrite(spark.createDataFrame([("w1", "h1", 10, 1.0)], cols), tmp_table)
    batch = spark.createDataFrame([("w1", "h1", 10, 9.0), ("w1", "h2", 11, 2.0)], cols)
    once = _rows(merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"]))
    twice = _rows(merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"]))
    assert once == twice == sorted([("w1", "h1", 10, 9.0), ("w1", "h2", 11, 2.0)])


def test_merge_equals_full_rebuild(spark, tmp_table):
    """overwrite(stale) + merge(corrections) == the corrected table —
    the same invariant the s6 registry oracle checks at sf0.01."""
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    truth = spark.createDataFrame(
        [(f"w{i % 3}", f"h{i}", i, float(i)) for i in range(30)], cols
    )
    stale = truth.withColumn("qty", F.col("qty") + 100.0)
    atomic_overwrite(stale, tmp_table)
    corrections = truth.filter(F.col("block_number") % 2 == 0)
    live = merge_upsert(spark, tmp_table, corrections, keys=["wallet_address", "tx_hash"])
    expected = truth.withColumn(
        "qty", F.when(F.col("block_number") % 2 == 0, F.col("qty")).otherwise(F.col("qty") + 100.0)
    )
    assert _rows(live) == _rows(expected)


def test_next_start_block_watermark(spark, tmp_table):
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    atomic_overwrite(spark.createDataFrame([("w1", "h1", 41, 1.0), ("w1", "h2", 97, 2.0)], cols), tmp_table)
    assert next_start_block(read_table(spark, tmp_table)) == 98
    empty = spark.createDataFrame([], "wallet_address string, tx_hash string, block_number long, qty double")
    assert next_start_block(empty) == 0


def test_merge_batch_duplicate_keys_collapse(spark, tmp_table):
    """ADVICE: two same-key rows in one batch must not both land.
    version_col picks the winner; without it the collapse is still
    deterministic."""
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    atomic_overwrite(spark.createDataFrame([("w1", "h1", 10, 1.0)], cols), tmp_table)
    batch = spark.createDataFrame(
        [("w1", "h1", 11, 5.0), ("w1", "h1", 12, 9.0)], cols  # same key twice
    )
    live = merge_upsert(
        spark, tmp_table, batch, keys=["wallet_address", "tx_hash"], version_col="block_number"
    )
    assert _rows(live) == [("w1", "h1", 12, 9.0)]  # highest version wins, one row


def test_merge_rewrites_only_touched_buckets(spark, tmp_table):
    """Scale contract: an update batch touching one hash bucket rewrites
    ONLY that bucket directory; every other bucket is carried into the
    new snapshot as hard links to the previous snapshot's files."""
    import os

    from datalake_polygonscan_spark.io.merge import _bucket_col
    from datalake_polygonscan_spark.io.sinks import current_snapshot_path

    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    n_buckets = 8
    seed = spark.createDataFrame(
        [(f"w{i}", f"h{i}", i, float(i)) for i in range(200)], cols
    )
    # bootstrap through merge so the snapshot is bucket-laid-out
    merge_upsert(spark, tmp_table, seed, keys=["wallet_address", "tx_hash"], n_buckets=n_buckets)
    prev_snap = current_snapshot_path(tmp_table)
    prev_inodes = {
        d: {f: os.stat(os.path.join(prev_snap, d, f)).st_ino
            for f in os.listdir(os.path.join(prev_snap, d)) if not f.startswith(("_", "."))}
        for d in os.listdir(prev_snap) if d.startswith("_bucket=")
    }

    one = spark.createDataFrame([("w7", "h7", 999, 42.0)], cols)
    touched = one.select(_bucket_col(["wallet_address", "tx_hash"], n_buckets).alias("b")).collect()[0]["b"]
    live = merge_upsert(spark, tmp_table, one, keys=["wallet_address", "tx_hash"], n_buckets=n_buckets)

    new_snap = current_snapshot_path(tmp_table)
    assert new_snap != prev_snap
    for d, files in prev_inodes.items():
        new_dir = os.path.join(new_snap, d)
        new_inodes = {
            f: os.stat(os.path.join(new_dir, f)).st_ino
            for f in os.listdir(new_dir) if not f.startswith(("_", "."))
        }
        if d == f"_bucket={touched}":
            # rewritten: no file carried over by inode
            assert not (set(new_inodes.values()) & set(files.values()))
        else:
            # untouched: identical files, same inodes (hard links)
            assert new_inodes == files
    # and the merge itself is correct
    got = {tuple(r) for r in live.collect()}
    assert ("w7", "h7", 999, 42.0) in got
    assert ("w7", "h7", 7, 7.0) not in got
    assert len(got) == 200


def test_versioned_merge_is_conditional_across_batches(spark, tmp_table):
    # WHEN MATCHED AND s.v >= t.v THEN UPDATE: a stale batch arriving
    # AFTER the revision it predates must not clobber newer data —
    # final state is independent of batch arrival order
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    fresh = spark.createDataFrame([("w1", "h1", 20, 9.0), ("w2", "h2", 20, 2.0)], cols)
    merge_upsert(spark, tmp_table, fresh, keys=["wallet_address", "tx_hash"], version_col="block_number")
    stale = spark.createDataFrame([("w1", "h1", 10, 1.0), ("w3", "h3", 10, 3.0)], cols)
    live = merge_upsert(spark, tmp_table, stale, keys=["wallet_address", "tx_hash"], version_col="block_number")
    got = {(r["wallet_address"], r["block_number"], r["qty"]) for r in live.collect()}
    # w1 keeps the newer block-20 row; w3 (new key) inserts fine
    assert got == {("w1", 20, 9.0), ("w2", 20, 2.0), ("w3", 10, 3.0)}
    # equal versions: the update wins (deterministic tie -> new row)
    tie = spark.createDataFrame([("w2", "h2", 20, 99.0)], cols)
    live = merge_upsert(spark, tmp_table, tie, keys=["wallet_address", "tx_hash"], version_col="block_number")
    got = {(r["wallet_address"], r["qty"]) for r in live.collect()}
    assert ("w2", 99.0) in got


def test_versioned_change_feed_skips_losing_rows(spark, tmp_table):
    from datalake_polygonscan_spark.io.merge import change_feed
    from datalake_polygonscan_spark.io.sinks import read_table

    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    fresh = spark.createDataFrame([("w1", "h1", 20, 9.0)], cols)
    merge_upsert(spark, tmp_table, fresh, keys=["wallet_address", "tx_hash"], version_col="block_number")
    stale_plus_new = spark.createDataFrame([("w1", "h1", 10, 1.0), ("w3", "h3", 10, 3.0)], cols)
    feed = change_feed(
        read_table(spark, tmp_table), stale_plus_new,
        keys=["wallet_address", "tx_hash"], version_col="block_number",
    )
    got = {(r["wallet_address"], r["_change_type"]) for r in feed.collect()}
    # the stale w1 row is a no-op (no change row); w3 is an insert
    assert got == {("w3", "insert")}


def test_check_constraints_inherit_and_reject_atomically(spark, tmp_path):
    from datalake_polygonscan_spark.io.merge import ConstraintViolation
    from datalake_polygonscan_spark.io.sinks import history

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "v"])
    merge_upsert(spark, tbl, df, keys=["k"], n_buckets=4, checks={"v_pos": "v > 0"})
    # inherited: no checks= on this call, still enforced
    with pytest.raises(ConstraintViolation, match="v_pos"):
        merge_upsert(spark, tbl, spark.createDataFrame([(3, -1.0)], ["k", "v"]), keys=["k"], n_buckets=4)
    assert len(history(tbl)) == 1  # nothing committed
    assert read_table(spark, tbl).count() == 2
    # NULL passes (SQL CHECK semantics)
    merge_upsert(
        spark, tbl,
        spark.createDataFrame([(4, None)], "k long, v double"), keys=["k"], n_buckets=4,
    )
    assert read_table(spark, tbl).count() == 3
    # new constraints compose with inherited ones
    with pytest.raises(ConstraintViolation, match="k_small"):
        merge_upsert(
            spark, tbl, spark.createDataFrame([(999, 1.0)], ["k", "v"]),
            keys=["k"], n_buckets=4, checks={"k_small": "k < 100"},
        )


# ---------------------------------------------------------------------------
# bucket-disjoint concurrent-commit REBASE (io/merge.py:_rebase_commit)
# ---------------------------------------------------------------------------


def _bucket_map(spark, df, n_buckets):
    from datalake_polygonscan_spark.io.merge import _bucket_col

    return {
        r["k"]: r["b"]
        for r in df.select("k", _bucket_col(["k"], n_buckets).alias("b")).collect()
    }


def _race(spark, tmp_table, monkeypatch, batch_first, batch_second):
    """Run merge(batch_second) with merge(batch_first) landing right
    before its pointer CAS — the deterministic in-process version of a
    two-writer race (the cross-process CAS atomicity itself is covered
    in tests/test_sinks.py)."""
    import datalake_polygonscan_spark.io.merge as M

    orig = M.commit_snapshot
    state = {"armed": True, "calls": 0}

    def racy(table_path, snap, base, meta, retain=2):
        state["calls"] += 1
        if state["armed"]:
            state["armed"] = False
            merge_upsert(spark, tmp_table, batch_first, keys=["k"], n_buckets=8)
        return orig(table_path, snap, base, meta, retain=retain)

    monkeypatch.setattr(M, "commit_snapshot", racy)
    try:
        live = merge_upsert(spark, tmp_table, batch_second, keys=["k"], n_buckets=8)
    finally:
        monkeypatch.undo()
    return live


def test_disjoint_concurrent_merge_rebases_without_recompute(spark, tmp_table, monkeypatch):
    import os

    from datalake_polygonscan_spark.io.sinks import history, read_pointer

    cols = ["k", "v"]
    seed = spark.createDataFrame([(i, float(i)) for i in range(32)], cols)
    merge_upsert(spark, tmp_table, seed, keys=["k"], n_buckets=8)  # bootstrap v0
    bmap = _bucket_map(spark, seed, 8)
    buckets = sorted(set(bmap.values()))
    keys_a = [k for k, b in bmap.items() if b == buckets[0]][:2]
    keys_b = [k for k, b in bmap.items() if b == buckets[1]][:2]
    batch_a = spark.createDataFrame([(k, 1000.0 + k) for k in keys_a], cols)
    batch_b = spark.createDataFrame([(k, 2000.0 + k) for k in keys_b], cols)

    live = _race(spark, tmp_table, monkeypatch, batch_a, batch_b)

    # neither commit lost, untouched rows intact
    vals = {r["k"]: r["v"] for r in live.collect()}
    assert all(vals[k] == 1000.0 + k for k in keys_a)
    assert all(vals[k] == 2000.0 + k for k in keys_b)
    assert all(
        vals[k] == float(k) for k in range(32) if k not in keys_a and k not in keys_b
    )
    log = history(tmp_table)
    assert [e["version"] for e in log] == [0, 1, 2]
    assert log[-1].get("rebased_from") == 1  # the loser REBASED, no recompute
    # the rebased snapshot's untouched buckets are hard links of the
    # winner's files — zero data movement outside the loser's buckets
    winner_snap = os.path.join(tmp_table, log[-2]["snapshot"])
    rebased_snap = os.path.join(tmp_table, read_pointer(tmp_table)["snapshot"])
    checked = 0
    for d in os.listdir(winner_snap):
        if not d.startswith("_bucket=") or d == f"_bucket={buckets[1]}":
            continue
        for f in os.listdir(os.path.join(winner_snap, d)):
            if f.startswith(("_", ".")):
                continue
            a = os.stat(os.path.join(winner_snap, d, f)).st_ino
            b = os.stat(os.path.join(rebased_snap, d, f)).st_ino
            assert a == b
            checked += 1
    assert checked > 0


def test_overlapping_concurrent_merge_recomputes(spark, tmp_table, monkeypatch):
    from datalake_polygonscan_spark.io.sinks import history

    cols = ["k", "v"]
    seed = spark.createDataFrame([(i, float(i)) for i in range(32)], cols)
    merge_upsert(spark, tmp_table, seed, keys=["k"], n_buckets=8)
    bmap = _bucket_map(spark, seed, 8)
    buckets = sorted(set(bmap.values()))
    shared = [k for k, b in bmap.items() if b == buckets[0]]
    batch_a = spark.createDataFrame([(shared[0], 1000.0)], cols)
    batch_b = spark.createDataFrame([(shared[1], 2000.0)], cols)  # SAME bucket

    live = _race(spark, tmp_table, monkeypatch, batch_a, batch_b)

    vals = {r["k"]: r["v"] for r in live.collect()}
    assert vals[shared[0]] == 1000.0 and vals[shared[1]] == 2000.0
    log = history(tmp_table)
    assert [e["version"] for e in log] == [0, 1, 2]
    # overlapping buckets: the loser fell back to the full
    # recompute-retry against the fresh base — no rebase marker
    assert "rebased_from" not in log[-1]


def test_volume_derived_bucket_default(spark, tmp_path):
    """Round 11 (VERDICT r10 #7): the default bucket count is derived
    from the batch's optimizer size estimate at bootstrap (clamped
    [4, 4096], ~256 MB/bucket target) and FOLLOWS the table's recorded
    layout afterwards — an explicit count is never overridden."""
    from datalake_polygonscan_spark.io.merge import derive_buckets, merge_upsert
    from datalake_polygonscan_spark.io.sinks import read_pointer

    # scales with estimated input volume (range stats: 8 bytes/row)
    assert derive_buckets(spark.range(10)) == 4
    big = derive_buckets(spark.range(2_000_000_000))  # ~16 GB estimate
    assert 32 <= big <= 128 and big > derive_buckets(spark.range(200_000_000)) >= 4

    # bootstrap without an explicit count: derived (tiny batch -> 4)
    t1 = str(tmp_path / "t1")
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    merge_upsert(spark, t1, df, keys=["k"])
    assert read_pointer(t1)["merge_buckets"] == 4

    # later default merges FOLLOW the table layout, never re-derive
    t2 = str(tmp_path / "t2")
    merge_upsert(spark, t2, df, keys=["k"], n_buckets=8)
    merge_upsert(spark, t2, df.limit(10), keys=["k"])  # default
    p = read_pointer(t2)
    assert p["merge_buckets"] == 8 and "rebased_from" not in p
