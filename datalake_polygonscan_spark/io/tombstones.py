"""Merge-on-read DELETE — key tombstones instead of data rewrites.

The copy-on-write delete (io/merge.py's ``deletes=`` arm) rewrites
every touched bucket; fine for deletes that ride an update batch, but
a standalone delete of K keys from a 100 TB table should cost O(K),
not O(touched buckets). ``delete_keys`` commits a NEW table version
whose data directories are all HARD LINKS of the previous snapshot
(zero data movement) plus a small ``_tombstones/`` key set; every read
(``read_table``, time travel, merge internals, compaction) anti-joins
the tombstones via the log-tracked ``merge_keys`` — Delta/Iceberg's
delete-vector / positional-delete idea expressed at key granularity.

Lifecycle:
- reads apply tombstones (io/sinks.py:read_snapshot — one broadcast
  anti-join; tombstones are small by construction);
- a later MERGE re-inserting a tombstoned key CLEARS its tombstone in
  the same commit (no resurrection, no zombie-delete);
- ``compact_snapshot`` (OPTIMIZE) materializes: rows drop out of the
  rewritten files and the new version carries no tombstones.

The underscore directory name keeps Spark's file index from ever
listing tombstone files as data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    commit_snapshot,
    new_snapshot_name,
    read_pointer,
    read_table,
)

_TOMB = "_tombstones"
_DELTAS = "_deltas"


def tombstone_dirs(snap_dir: str) -> list[str]:
    root = os.path.join(snap_dir, _TOMB)
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, e) for e in os.listdir(root) if e.startswith("batch-")
    )


def delta_dirs(snap_dir: str) -> list[str]:
    """MoR upsert delta batches of a snapshot, oldest first (the
    6-digit sequence embedded in the name is the resolution order)."""
    root = os.path.join(snap_dir, _DELTAS)
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, e) for e in os.listdir(root) if e.startswith("batch-")
    )


def _link_tree(src: str, dst: str, skip: set[str]) -> None:
    """Hard-link every data file of ``src`` into ``dst`` preserving the
    directory layout (copy fallback); top-level names in ``skip`` and
    hidden files are left out."""
    for entry in os.listdir(src):
        if entry in skip or entry.startswith("."):
            continue
        s = os.path.join(src, entry)
        if os.path.isdir(s):
            _link_tree(s, os.path.join(dst, entry), set())
        else:
            os.makedirs(dst, exist_ok=True)
            try:
                os.link(s, os.path.join(dst, entry))
            except OSError:
                shutil.copy2(s, os.path.join(dst, entry))


def delete_keys(
    spark: SparkSession,
    table_path: str,
    deletes: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge-on-read DELETE: commit a new version that removes every
    row matching ``deletes``' key set WITHOUT rewriting any data file
    (all data hard-linked; one small tombstone batch written). Returns
    the new live table. Raises if the table already has tombstones
    under a DIFFERENT key set (one key space per table)."""
    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    existing_keys = base.get("merge_keys")
    if existing_keys is not None and existing_keys != keys:
        raise ValueError(
            f"table key space is {existing_keys}, not {keys}"
        )
    prev_snap = os.path.join(table_path, base["snapshot"])
    snap_name = new_snapshot_name(base)
    new_snap = os.path.join(table_path, snap_name)
    os.makedirs(new_snap, exist_ok=True)
    # zero data movement: link data AND any prior tombstone batches
    _link_tree(prev_snap, new_snap, skip={_TOMB})
    for d in tombstone_dirs(prev_snap):
        _link_tree(d, os.path.join(new_snap, _TOMB, os.path.basename(d)), set())
    batch_dir = os.path.join(new_snap, _TOMB, f"batch-{snap_name.split('-')[-1]}")
    deletes.select(*keys).distinct().write.mode("overwrite").parquet(batch_dir)
    meta = {
        k: v for k, v in base.items() if k != "snapshot"
    }
    meta.update({"op": "DELETE", "has_tombstones": True, "merge_keys": keys})
    # CDF-enabled tables emit a feed for EVERY content-changing commit
    # (a feedless version would be a gap streaming consumers silently
    # skip): the delete feed is the current rows being tombstoned —
    # O(matched rows) output, one semi-join against the live read
    staged = None
    if base.get("cdf_enabled"):
        from datalake_polygonscan_spark.io.merge import _pending_feed_dir, publish_feed
        from datalake_polygonscan_spark.io.sinks import snapshot_version
        from pyspark.sql import functions as F

        version = snapshot_version(base) + 1
        feed = (
            read_table(spark, table_path)
            .join(deletes.select(*keys).distinct(), keys, "left_semi")
            .withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_version", F.lit(version).cast("long"))
        )
        staged = _pending_feed_dir(table_path, snap_name)
        feed.write.mode("overwrite").parquet(staged)
    try:
        commit_snapshot(table_path, snap_name, base, meta)
    except SnapshotConflict:
        shutil.rmtree(new_snap, ignore_errors=True)
        if staged:
            shutil.rmtree(staged, ignore_errors=True)
        raise
    if staged:
        from datalake_polygonscan_spark.io.merge import publish_feed
        from datalake_polygonscan_spark.io.sinks import snapshot_version

        publish_feed(table_path, snap_name, snapshot_version(base) + 1)
    return read_table(spark, table_path)


def append_upserts(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge-on-read UPSERT (Hudi MOR / Iceberg v2 equality-delete+
    append): commit a new version whose data files are ALL hard links
    of the previous snapshot plus one small ``_deltas/`` batch — write
    cost O(batch), zero write amplification. Readers resolve
    latest-batch-wins per key (io/sinks.py:read_snapshot), deferring
    the merge cost to reads; ``compact_snapshot`` (OPTIMIZE)
    materializes the deltas back into data files, and a copy-on-write
    MERGE on a delta-carrying table takes the full-rewrite path (the
    same materialization). This is the write-heavy end of the
    CoW/MoR tradeoff — the bucket-pruned ``merge_upsert`` is the
    read-heavy end; both commit through the same CAS pointer.

    Within a batch, duplicate keys collapse deterministically
    (io/merge.py's batch dedup). Tombstones of upserted keys CLEAR in
    the same commit (no resurrection) — surviving tombstones postdate
    every delta batch by construction, so reads apply them AFTER delta
    resolution. ``keys`` must be the table's one key space (enforced
    against the commit metadata)."""
    from datalake_polygonscan_spark.io.merge import _dedup_batch

    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    existing_keys = base.get("merge_keys")
    if existing_keys is not None and existing_keys != keys:
        raise ValueError(f"table key space is {existing_keys}, not {keys}")
    import json as _json

    if base.get("table_schema"):
        table_cols = {f["name"] for f in _json.loads(base["table_schema"])["fields"]}
        if set(updates.columns) != table_cols:
            raise ValueError(
                f"MoR upsert batch columns {sorted(updates.columns)} != table "
                f"schema {sorted(table_cols)} (no schema evolution on the MoR path)"
            )
    prev_snap = os.path.join(table_path, base["snapshot"])
    snap_name = new_snapshot_name(base)
    new_snap = os.path.join(table_path, snap_name)
    os.makedirs(new_snap, exist_ok=True)
    _link_tree(prev_snap, new_snap, skip={_TOMB, _DELTAS})
    for d in delta_dirs(prev_snap):
        _link_tree(d, os.path.join(new_snap, _DELTAS, os.path.basename(d)), set())
    seq = len(delta_dirs(prev_snap))
    batch_dir = os.path.join(
        new_snap, _DELTAS, f"batch-{seq:06d}-{snap_name.split('-')[-1]}"
    )
    _dedup_batch(updates, keys, None).write.mode("overwrite").parquet(batch_dir)

    meta = {k: v for k, v in base.items() if k != "snapshot"}
    meta.update({"op": "MOR_UPSERT", "has_deltas": True, "merge_keys": keys})
    # no-resurrection rule: tombstones of re-upserted keys clear now.
    # The surviving set writes DISTRIBUTED straight to the new
    # snapshot's _TOMB dir (a different directory than the source
    # being read, so no read-overwrite hazard); only a 1-row
    # existence probe touches the driver — never the full key set
    if base.get("has_tombstones"):
        remaining = (
            spark.read.parquet(*tombstone_dirs(prev_snap))
            .join(updates.select(*keys).distinct(), keys, "left_anti")
        )
        if remaining.limit(1).count():
            remaining.write.mode("overwrite").parquet(
                os.path.join(new_snap, _TOMB, "batch-0")
            )
        else:
            meta.pop("has_tombstones", None)
    # CDF: typed insert/update feed for the upsert batch (cross-batch
    # key existence resolved against the live read, same shape the
    # CoW merge emits)
    staged = None
    if base.get("cdf_enabled"):
        from datalake_polygonscan_spark.io.merge import (
            _pending_feed_dir,
            change_feed,
            publish_feed,
        )
        from datalake_polygonscan_spark.io.sinks import snapshot_version
        from pyspark.sql import functions as F

        version = snapshot_version(base) + 1
        feed = change_feed(
            read_table(spark, table_path), updates, keys
        ).withColumn("_commit_version", F.lit(version).cast("long"))
        staged = _pending_feed_dir(table_path, snap_name)
        feed.write.mode("overwrite").parquet(staged)
    try:
        commit_snapshot(table_path, snap_name, base, meta)
    except SnapshotConflict:
        shutil.rmtree(new_snap, ignore_errors=True)
        if staged:
            shutil.rmtree(staged, ignore_errors=True)
        raise
    if staged:
        from datalake_polygonscan_spark.io.merge import publish_feed
        from datalake_polygonscan_spark.io.sinks import snapshot_version

        publish_feed(table_path, snap_name, snapshot_version(base) + 1)
    return read_table(spark, table_path)
