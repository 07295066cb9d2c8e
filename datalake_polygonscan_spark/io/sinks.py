"""Sinks — S4 (atomic overwrite / append), S5 (partitioned write).

The reference's "sink" is CSV-to-S3 + Redshift TRUNCATE + COPY
(``resources/redshift.py:62-74,76-87,89-112``). That refresh is
non-atomic: readers between TRUNCATE and COPY-commit see an empty
table, and a crash loses all data until the next weekly run.

Here snapshot-overwrite is ATOMIC without requiring Delta (not in this
environment): each overwrite writes a fresh immutable snapshot
directory ``snapshot=<n>-<token>``, then atomically renames a pointer
file (``_CURRENT``) to it — a minimal pointer-swap transaction log in
the spirit of Delta Lake's ``_delta_log`` (Armbrust et al., VLDB 2020).
Readers resolve the pointer first, so they always see a complete
snapshot; a crash mid-write leaves the previous snapshot live.

Concurrent writers get OPTIMISTIC CONCURRENCY (Delta-style): every
commit carries the pointer state the writer based its work on, and the
commit section — re-read pointer, compare, replace — runs under an
exclusive lock file, so a commit racing a finished writer raises
:class:`SnapshotConflict` instead of silently last-writer-winning.
Snapshot directory names carry a per-writer token, so two racing
writers never interleave files in one directory; the loser's orphan
directory is pruned by the next successful commit.

On a real deployment these become ``df.write.format("delta")`` — the
API here is shaped so that swap is one line.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_LOCK = "._pointer_lock"


class SnapshotConflict(RuntimeError):
    """The table's pointer moved between a writer's read and its
    commit — the optimistic-concurrency rejection (retry by re-reading
    the table and re-deriving the write)."""


def _pointer_path(table_path: str) -> str:
    return os.path.join(table_path, _POINTER)


def read_pointer(table_path: str) -> dict | None:
    """The live pointer metadata ({"snapshot": name, ...}) or None."""
    try:
        with open(_pointer_path(table_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def current_snapshot_path(table_path: str) -> str | None:
    """Resolve the live snapshot directory, or None if never written."""
    meta = read_pointer(table_path)
    return None if meta is None else os.path.join(table_path, meta["snapshot"])


def snapshot_version(meta: dict | None) -> int:
    return -1 if meta is None else int(meta["snapshot"].split("=")[1].split("-")[0])


def new_snapshot_name(base_meta: dict | None) -> str:
    """Next snapshot directory name: version derived from the base
    pointer + a per-writer token so racing writers never share a
    directory."""
    return f"snapshot={snapshot_version(base_meta) + 1}-{uuid.uuid4().hex[:8]}"


class _pointer_lock:
    """Exclusive lock file around the commit critical section (POSIX
    O_EXCL create). Held only for the pointer read+compare+replace —
    microseconds, never during data writes."""

    def __init__(self, table_path: str, timeout_s: float = 10.0):
        self.path = os.path.join(table_path, _LOCK)
        self.timeout_s = timeout_s

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                self.fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"pointer lock stuck at {self.path}")
                time.sleep(0.01)

    def __exit__(self, *exc):
        os.close(self.fd)
        os.unlink(self.path)


def commit_snapshot(
    table_path: str,
    snapshot_name: str,
    base_meta: dict | None,
    extra_meta: dict | None = None,
) -> None:
    """CAS pointer swap: atomically repoint ``_CURRENT`` to
    ``snapshot_name`` iff the pointer still equals ``base_meta`` (the
    state the writer read before deriving its snapshot). Raises
    :class:`SnapshotConflict` on mismatch — the caller re-reads the
    table and retries. On success, prunes all snapshot dirs except the
    new one and the immediately-previous one (grace window for
    in-flight readers; Spark scans open files lazily and POSIX/S3-like
    stores keep open/listed objects readable past unlink)."""
    meta = {"snapshot": snapshot_name, **(extra_meta or {})}
    with _pointer_lock(table_path):
        live = read_pointer(table_path)
        if live != base_meta:
            raise SnapshotConflict(
                f"pointer moved: expected {base_meta!r}, found {live!r} — re-derive and retry"
            )
        fd, tmp = tempfile.mkstemp(dir=table_path, prefix="._pointer_tmp_")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, _pointer_path(table_path))
    keep = {snapshot_name}
    if base_meta is not None:
        keep.add(base_meta["snapshot"])
    new_version = snapshot_version(meta)
    for entry in os.listdir(table_path):
        full = os.path.join(table_path, entry)
        if not (entry.startswith("snapshot=") and entry not in keep and os.path.isdir(full)):
            continue
        # prune only STRICTLY older versions: a racing writer may still
        # be writing data into its own same-version directory — it will
        # remove that orphan itself when its commit conflicts
        if int(entry.split("=")[1].split("-")[0]) < new_version:
            shutil.rmtree(full, ignore_errors=True)


def atomic_overwrite(
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
    extra_meta: dict | None = None,
) -> str:
    """S4 overwrite — write a new snapshot, then atomically repoint.

    Returns the new snapshot directory. Raises
    :class:`SnapshotConflict` (after removing its orphan directory) if
    another writer committed between this writer's pointer read and its
    commit."""
    os.makedirs(table_path, exist_ok=True)
    base = read_pointer(table_path)
    snap = new_snapshot_name(base)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(table_path, snap))
    try:
        commit_snapshot(table_path, snap, base, extra_meta)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
        raise
    return os.path.join(table_path, snap)


def append(df: DataFrame, table_path: str, partition_by: list[str] | None = None) -> str:
    """S4 append — append files into the current snapshot (creating one)."""
    snap = current_snapshot_path(table_path)
    if snap is None:
        return atomic_overwrite(df, table_path, partition_by)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snap)
    return snap


def write_partitioned(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """S5 — plain partitioned parquet write (hive-style directories),
    enabling partition pruning on read."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the live snapshot of an atomic table. The internal
    ``_bucket`` layout column of merge-bucketed tables (io/merge.py) is
    not part of the logical schema and is dropped."""
    snap = current_snapshot_path(table_path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    df = spark.read.parquet(snap)
    return df.drop("_bucket") if "_bucket" in df.columns else df
