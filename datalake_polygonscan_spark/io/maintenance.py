"""Table maintenance — small-file compaction (OPTIMIZE) over the
atomic snapshot tables (io/sinks.py, io/merge.py).

The 100 TB failure mode this addresses: incremental ingest (S6 merge,
streaming foreachBatch) accretes many small parquet files per bucket —
at scale the NameNode/object-store listing and per-file open cost
dominates scan time long before data volume does. ``compact_snapshot``
is Delta's ``OPTIMIZE``: rewrite the live snapshot's data into
size-targeted files, commit the result as a NEW version through the
same CAS pointer swap (readers never see a half-compacted table; a
concurrent merge makes the compaction lose the race and raise, never
corrupt), and leave row content bit-identical.

Layout is preserved: a hive-partitioned snapshot (``_bucket=K`` merge
layout or user partition columns) compacts each partition directory to
its own size-targeted file count, so partition pruning keeps working
afterwards; an unpartitioned snapshot compacts to ``ceil(bytes /
target)`` files.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    commit_snapshot,
    new_snapshot_name,
    read_pointer,
    read_snapshot,
)


def _data_files(root: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under a snapshot dir (skips
    _SUCCESS / hidden / CRC files and hidden directories — e.g. the
    ``_tombstones/`` key sets, which are metadata, not data)."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        # hidden dirs are metadata (_tombstones) — EXCEPT hive
        # partition dirs, whose names contain '=' (e.g. _bucket=3)
        dirnames[:] = [d for d in dirnames if "=" in d or not d.startswith(("_", "."))]
        for fname in filenames:
            if fname.startswith(("_", ".")):
                continue
            full = os.path.join(dirpath, fname)
            out.append((full, os.path.getsize(full)))
    return out


def _partition_cols(root: str) -> list[str]:
    """Hive partition columns of a snapshot dir, outermost first
    (directories named ``col=value``)."""
    cols = []
    cur = root
    while True:
        subdirs = [e for e in os.listdir(cur) if "=" in e and os.path.isdir(os.path.join(cur, e))]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = os.path.join(cur, subdirs[0])


def compact_snapshot(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 << 20,
    retain: int = 2,
) -> dict:
    """Rewrite the live snapshot into size-targeted files and commit it
    as a new version (row content unchanged — verified by the s10
    oracle). Returns ``{"files_before", "files_after", "bytes",
    "version"}``. Raises :class:`SnapshotConflict` if another writer
    commits first (compaction is always safe to retry or skip)."""
    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    prev_snap = os.path.join(table_path, base["snapshot"])
    before = _data_files(prev_snap)
    total_bytes = sum(sz for _, sz in before)
    part_cols = _partition_cols(prev_snap)

    # log-schema-aware read: compacting a mixed-schema snapshot (after a
    # schema-evolving merge) must rewrite every row in the WIDENED schema
    df = read_snapshot(spark, prev_snap, base)
    # S27: read_snapshot returned LOGICAL names — the rewrite
    # materializes any column-mapping rename, so partition dirs (named
    # after physical columns on disk) must be addressed by their
    # logical names from here on
    cmap = base.get("column_mapping") or {}
    part_cols = [cmap.get(c, c) for c in part_cols]
    snap_name = new_snapshot_name(base)
    new_snap = os.path.join(table_path, snap_name)
    # S26: compacting a partition-evolved table rewrites EVERYTHING
    # into the newest spec's layout and collapses the spec list to one
    # (Iceberg's REWRITE DATA does the same — evolution defers the
    # rewrite, OPTIMIZE is where it finally happens)
    specs = base.get("partition_specs")
    write_root = new_snap
    if specs:
        latest = specs[-1]
        part_cols = list(latest["partition_by"])
        write_root = os.path.join(new_snap, f"spec-{latest['id']:05d}")
    if part_cols:
        # one shuffle on the partition cols -> each partition dir lands
        # in one task -> one size-targeted file per dir (a 100 TB table
        # compacts per-partition, embarrassingly parallel)
        writer = df.repartition(*[F.col(c) for c in part_cols]).write.partitionBy(*part_cols)
    else:
        n_files = max(1, math.ceil(total_bytes / max(target_file_bytes, 1)))
        writer = df.repartition(n_files).write
    writer.mode("overwrite").parquet(write_root)

    # carry non-snapshot metadata forward (e.g. merge_buckets, so
    # future merges keep pruning against the compacted layout); the
    # rewrite MATERIALIZES merge-on-read tombstones (read_snapshot
    # applied them), so the compacted version carries none
    meta = {k: v for k, v in base.items() if k != "snapshot"}
    meta.pop("has_tombstones", None)
    meta.pop("has_deltas", None)  # MoR upserts materialize too
    if specs:
        meta["partition_specs"] = [specs[-1]]
    if cmap:
        # the rewrite just wrote logical names into the files: drop the
        # map and rename the tracked schema/keys to match (S27
        # materialization — Delta keeps maps forever; we compact them
        # away so MERGE can resume addressing one namespace)
        meta.pop("column_mapping", None)
        if meta.get("table_schema"):
            sch = json.loads(meta["table_schema"])
            for f in sch["fields"]:
                f["name"] = cmap.get(f["name"], f["name"])
            meta["table_schema"] = json.dumps(sch)
        if meta.get("merge_keys"):
            meta["merge_keys"] = [cmap.get(k, k) for k in meta["merge_keys"]]
    meta["compacted_from"] = base["snapshot"]
    meta["op"] = "OPTIMIZE"
    # CDF-enabled tables get an EMPTY feed for this version (OPTIMIZE
    # changes no logical rows, but a feedless version would read as a
    # gap to read_changes/streaming subscribers)
    staged = None
    if base.get("cdf_enabled"):
        from datalake_polygonscan_spark.io.merge import _pending_feed_dir

        version = int(snap_name.split("=")[1].split("-")[0])
        logical = df.drop("_bucket") if "_bucket" in df.columns else df
        feed = (
            logical.limit(0)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(version).cast("long"))
        )
        staged = _pending_feed_dir(table_path, snap_name)
        feed.coalesce(1).write.mode("overwrite").parquet(staged)
    try:
        commit_snapshot(table_path, snap_name, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(new_snap, ignore_errors=True)
        if staged:
            shutil.rmtree(staged, ignore_errors=True)
        raise
    if staged:
        from datalake_polygonscan_spark.io.merge import publish_feed

        publish_feed(table_path, snap_name, version)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(new_snap)),
        "bytes": total_bytes,
        "version": int(snap_name.split("=")[1].split("-")[0]),
    }


def compact_small_files(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    retain: int = 2,
) -> dict:
    """INCREMENTAL OPTIMIZE (Delta's actual behavior — its OPTIMIZE
    only rewrites files below ``minFileSize`` and bin-packs them; files
    already near target size are left untouched): data files >=
    ``small_file_bytes`` (default target/4) are HARD-LINKED into the
    new snapshot unchanged, only the small-file tail is read and
    bin-packed. On a 100 TB table under streaming ingest this is the
    difference between an O(new-small-files) maintenance job and a
    full-table rewrite — write amplification proportional to the
    problem, not the table.

    Restricted to plain snapshot layouts (hive partition dirs fine):
    MoR tombstone/delta state, CDF feeds, and column mappings need the
    full :func:`compact_snapshot`, which materializes them; this
    function refuses those tables rather than silently dropping state.
    Returns ``{"files_before", "files_after", "linked", "rewritten"}``.
    """
    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    for feature in ("has_tombstones", "has_deltas", "cdf_enabled", "column_mapping", "partition_specs"):
        if base.get(feature):
            raise ValueError(
                f"table has {feature}; use compact_snapshot() (full rewrite, "
                "materializes MoR/CDF/mapping state) instead"
            )
    prev_snap = os.path.join(table_path, base["snapshot"])
    files = _data_files(prev_snap)
    cutoff = small_file_bytes if small_file_bytes is not None else target_file_bytes // 4
    small = [p for p, sz in files if sz < cutoff]
    large = [p for p, sz in files if sz >= cutoff]
    if len(small) <= 1:
        # nothing to bin-pack — zero or one small file is already optimal
        return {
            "files_before": len(files),
            "files_after": len(files),
            "linked": len(files),
            "rewritten": 0,
        }
    part_cols = _partition_cols(prev_snap)
    snap_name = new_snapshot_name(base)
    new_snap = os.path.join(table_path, snap_name)
    # hard-link the keepers at their original relative paths (so hive
    # dir layout, and thus partition pruning, is preserved)
    for p in large:
        rel = os.path.relpath(p, prev_snap)
        dst = os.path.join(new_snap, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(p, dst)
    # read ONLY the small files; basePath keeps hive partition columns
    reader = spark.read.option("basePath", prev_snap)
    if base.get("table_schema"):
        from pyspark.sql import types as T

        reader = reader.schema(T.StructType.fromJson(json.loads(base["table_schema"])))
    small_df = reader.parquet(*small)
    small_set = set(small)
    small_bytes = sum(sz for p, sz in files if p in small_set)
    if part_cols:
        writer = (
            small_df.repartition(*[F.col(c) for c in part_cols])
            .write.partitionBy(*part_cols)
        )
    else:
        n_files = max(1, math.ceil(small_bytes / max(target_file_bytes, 1)))
        writer = small_df.repartition(n_files).write
    writer.mode("append").parquet(new_snap)
    meta = {k: v for k, v in base.items() if k != "snapshot"}
    meta["compacted_from"] = base["snapshot"]
    meta["op"] = "OPTIMIZE (incremental)"
    try:
        commit_snapshot(table_path, snap_name, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(new_snap, ignore_errors=True)
        raise
    after = _data_files(os.path.join(table_path, snap_name))
    return {
        "files_before": len(files),
        "files_after": len(after),
        "linked": len(large),
        "rewritten": len(small),
    }


def auto_optimize(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    min_small_files: int = 8,
    retain: int = 2,
) -> dict:
    """Policy-driven maintenance (Delta's auto-compaction trigger):
    inspect the live snapshot's file manifest and run the INCREMENTAL
    bin-pack only when the small-file tail has actually accreted
    (>= ``min_small_files`` files under the cutoff). A no-op returns
    without committing, so scheduling this after every ingest batch is
    safe — cost stays proportional to the work that exists, which is
    the whole point of maintenance policy at 100 TB (a cron'd full
    OPTIMIZE rewrites the table on a timer whether it needs it or not).
    Returns ``{"triggered": bool, "small_files": int, ...stats}``.
    """
    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    cutoff = small_file_bytes if small_file_bytes is not None else target_file_bytes // 4
    prev_snap = os.path.join(table_path, base["snapshot"])
    small = sum(1 for _, sz in _data_files(prev_snap) if sz < cutoff)
    if small < min_small_files:
        return {"triggered": False, "small_files": small}
    stats = compact_small_files(
        spark,
        table_path,
        target_file_bytes=target_file_bytes,
        small_file_bytes=cutoff,
        retain=retain,
    )
    return {"triggered": True, "small_files": small, **stats}


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` (the path itself for a
    plain file). The in-flight-writer guard must key on the LAST write
    a candidate received, not on when its root dir was created: a
    writer whose data write runs longer than ``min_age_s`` before its
    CAS commit keeps touching files under the snapshot dir, and those
    touches are what prove it is still alive."""
    newest = os.path.getmtime(path)
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            for name in dirs + files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, name)))
                except OSError:
                    pass
    return newest


def gc_orphans(table_path: str, min_age_s: float = 86400.0) -> list[str]:
    """Remove ORPHAN artifacts from a snapshot table directory: data
    laid down by writers that never committed (a crashed writer's
    ``snapshot=`` dir whose name appears in neither the commit log nor
    the live pointer, or stray files dropped at the table root).

    This is the counterpart of :func:`~..io.sinks.vacuum`, which prunes
    OLD COMMITTED versions — orphan GC may only touch data the log has
    never heard of, so a bug here can never lose a committed row. The
    ``min_age_s`` guard (Iceberg's ``older_than``, default 24 h) keeps
    an in-flight writer's not-yet-committed snapshot safe: a writer
    writes, then CAS-commits, so anything younger than the guard may
    still be about to commit. Returns the removed entry names.
    """
    from datalake_polygonscan_spark.io.sinks import _load_log_entries

    meta = read_pointer(table_path)
    referenced = {e["snapshot"] for e in _load_log_entries(table_path) if "snapshot" in e}
    if meta is not None:
        referenced.add(meta["snapshot"])
    now = time.time()
    removed: list[str] = []
    for entry in sorted(os.listdir(table_path)):
        # underscore entries are SYSTEM namespaces (_log, _CURRENT and
        # its lock, the _changes CDF feed, _stream_chk checkpoints,
        # _posdeletes siblings, ...) — never GC candidates: orphan GC
        # may only ever touch writer DATA artifacts, i.e. snapshot=
        # dirs the log has never referenced and stray non-system files
        if entry.startswith("_") or entry.startswith("."):
            continue
        full = os.path.join(table_path, entry)
        if entry.startswith("snapshot=") and entry in referenced:
            continue
        if now - _newest_mtime(full) < min_age_s:
            continue
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            os.remove(full)
        removed.append(entry)
    return removed
