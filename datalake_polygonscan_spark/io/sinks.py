"""Sinks — S4 (atomic overwrite / append), S5 (partitioned write).

The reference's "sink" is CSV-to-S3 + Redshift TRUNCATE + COPY
(``resources/redshift.py:62-74,76-87,89-112``). That refresh is
non-atomic: readers between TRUNCATE and COPY-commit see an empty
table, and a crash loses all data until the next weekly run.

Here snapshot-overwrite is ATOMIC without requiring Delta (not in this
environment): each overwrite writes a fresh immutable snapshot
directory ``snapshot=<n>``, then atomically renames a pointer file
(``_CURRENT``) to it — a minimal pointer-swap transaction log in the
spirit of Delta Lake's ``_delta_log`` (Armbrust et al., VLDB 2020).
Readers resolve the pointer first, so they always see a complete
snapshot; a crash mid-write leaves the previous snapshot live.

On a real deployment these become ``df.write.format("delta")`` — the
API here is shaped so that swap is one line.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _pointer_path(table_path: str) -> str:
    return os.path.join(table_path, _POINTER)


def current_snapshot_path(table_path: str) -> str | None:
    """Resolve the live snapshot directory, or None if never written."""
    try:
        with open(_pointer_path(table_path)) as f:
            meta = json.load(f)
    except FileNotFoundError:
        return None
    return os.path.join(table_path, meta["snapshot"])


def atomic_overwrite(
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
) -> str:
    """S4 overwrite — write a new snapshot, then atomically repoint.

    Returns the new snapshot directory. Old snapshots are pruned after
    the swap (best-effort; a concurrent reader holding the old pointer
    keeps a consistent view until its scan finishes on POSIX/S3-like
    stores where open files / listed objects survive unlink).
    """
    os.makedirs(table_path, exist_ok=True)
    prev = current_snapshot_path(table_path)
    prev_n = int(os.path.basename(prev).split("=")[1]) if prev else -1
    snap = f"snapshot={prev_n + 1}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(table_path, snap))

    # POSIX rename is atomic: write pointer to a temp file, rename over.
    fd, tmp = tempfile.mkstemp(dir=table_path, prefix="._pointer_")
    with os.fdopen(fd, "w") as f:
        json.dump({"snapshot": snap}, f)
    os.replace(tmp, _pointer_path(table_path))

    # retain the immediately-previous snapshot as a grace window for
    # in-flight readers (Spark scans open files lazily); prune older
    keep = {snap, f"snapshot={prev_n}"}
    for entry in os.listdir(table_path):
        full = os.path.join(table_path, entry)
        if entry.startswith("snapshot=") and entry not in keep and os.path.isdir(full):
            import shutil

            shutil.rmtree(full, ignore_errors=True)
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
    """Read the live snapshot of an atomic table."""
    snap = current_snapshot_path(table_path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    return spark.read.parquet(snap)
