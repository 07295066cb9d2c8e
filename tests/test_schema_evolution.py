"""Schema evolution on MERGE (Delta's mergeSchema) with log-tracked
schemas: a widening batch lands in one atomic commit, untouched buckets
stay hard-linked (old-schema files), and every read resolves against
the schema stored in the commit log — no footer-merging scans. Time
travel returns each version's OWN schema."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.maintenance import compact_snapshot
from datalake_polygonscan_spark.io.merge import merge_upsert
from datalake_polygonscan_spark.io.sinks import (
    current_snapshot_path,
    read_pointer,
    read_table,
    read_version,
)

KEYS = ["k"]


def _seed(spark, tbl, n=40, n_buckets=8):
    rows = [(i, float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["k", "v"])
    merge_upsert(spark, tbl, df, keys=KEYS, n_buckets=n_buckets)
    return df


def test_widening_batch_requires_flag(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl)
    wide = spark.createDataFrame([(1, 1.0, "x")], ["k", "v", "tag"])
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_upsert(spark, tbl, wide, keys=KEYS, n_buckets=8)
    narrow = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_upsert(spark, tbl, narrow, keys=KEYS, n_buckets=8)


def test_widening_merge_nulls_old_rows_and_links_untouched_buckets(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl)
    prev_snap = current_snapshot_path(tbl)
    wide = spark.createDataFrame([(1, 100.0, "tagged")], ["k", "v", "tag"])
    live = merge_upsert(spark, tbl, wide, keys=KEYS, n_buckets=8, schema_evolution=True)
    got = {r["k"]: (r["v"], r["tag"]) for r in live.collect()}
    assert got[1] == (100.0, "tagged")
    assert all(tag is None for k, (_, tag) in got.items() if k != 1)
    assert len(got) == 40
    # the widened schema is in the commit log
    assert "tag" in read_pointer(tbl)["table_schema"]
    # untouched buckets were hard-linked, not rewritten: at least one
    # data file in the new snapshot shares an inode with the old one
    new_snap = current_snapshot_path(tbl)
    old_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _, fs in os.walk(prev_snap)
        for f in fs
        if not f.startswith(("_", "."))
    }
    shared = [
        f
        for dp, _, fs in os.walk(new_snap)
        for f in fs
        if not f.startswith(("_", ".")) and os.stat(os.path.join(dp, f)).st_ino in old_inodes
    ]
    assert shared, "expected untouched old-schema buckets to be hard-linked"


def test_time_travel_returns_historical_schema(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=10, n_buckets=4)
    wide = spark.createDataFrame([(11, 11.0, "x")], ["k", "v", "tag"])
    merge_upsert(spark, tbl, wide, keys=KEYS, n_buckets=4, schema_evolution=True)
    assert read_version(spark, tbl, 0).columns == ["k", "v"]
    assert read_version(spark, tbl, -1).columns == ["k", "v", "tag"]


def test_compaction_rewrites_mixed_schema_files_widened(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=20, n_buckets=4)
    wide = spark.createDataFrame([(1, 1.5, "x")], ["k", "v", "tag"])
    before = merge_upsert(spark, tbl, wide, keys=KEYS, n_buckets=4, schema_evolution=True)
    before_state = sorted(map(tuple, before.collect()))
    compact_snapshot(spark, tbl, target_file_bytes=1 << 30)
    after = read_table(spark, tbl)
    assert sorted(map(tuple, after.collect())) == before_state
    # post-compaction files physically carry the widened schema: plain
    # footer discovery (no log schema, no mergeSchema) sees `tag`
    disc = spark.read.parquet(current_snapshot_path(tbl))
    assert "tag" in disc.columns
    assert disc.filter(F.col("tag").isNotNull()).count() == 1


def test_batch_missing_column_nulls_it_in_replaced_rows(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _seed(spark, tbl, n=6, n_buckets=4)
    # full-row replacement: a batch without `v` nulls it for its keys
    narrow = spark.createDataFrame([(2,)], ["k"])
    live = merge_upsert(spark, tbl, narrow, keys=KEYS, n_buckets=4, schema_evolution=True)
    got = {r["k"]: r["v"] for r in live.collect()}
    assert got[2] is None
    assert got[3] == 3.0


def test_s33_add_column_default_semantics_and_time_travel(spark, tmp_path):
    """S33: metadata-only ALTER — pre-existing rows read the default,
    post-ALTER appends keep explicit NULLs, the pre-ALTER version
    still time-travels WITHOUT the column, and duplicate/naked adds
    raise cleanly."""
    import pytest
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.io.defaults import add_column_with_default
    from datalake_polygonscan_spark.io.sinks import (
        append,
        atomic_overwrite,
        read_table,
        read_version,
    )

    t = str(tmp_path / "t")
    seed = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    atomic_overwrite(seed, t, retain=10)
    add_column_with_default(t, "tier", "string", "basic")

    extra = spark.createDataFrame(
        [(3, "c", "gold"), (4, "d", None)], "k long, v string, tier string"
    )
    append(extra, t)

    got = {r.k: r.tier for r in read_table(spark, t).collect()}
    assert got == {1: "basic", 2: "basic", 3: "gold", 4: None}

    v0 = read_version(spark, t, 0)
    assert "tier" not in v0.columns
    assert v0.count() == 2

    with pytest.raises(ValueError):
        add_column_with_default(t, "tier", "string", "x")  # duplicate
