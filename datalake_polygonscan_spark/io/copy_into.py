"""S42 — COPY INTO: idempotent bulk FILE ingest.

Delta Lake's ``COPY INTO`` semantics re-expressed on the snapshot
table layer: each source file is loaded EXACTLY ONCE, tracked by file
identity (path + size) in the commit log's metadata, so the command is
safely re-runnable — the retry/cron/backfill contract object-store
landing zones need. Re-running after new files arrive loads ONLY the
new files, as an O(new files) hard-link commit (existing table data is
linked through, never rewritten or rescanned).

Reference parity: the reference re-loads its full CSV export into
Redshift via TRUNCATE+COPY every run (resources/redshift.py:80,
98-104) — every retry reprocesses everything. COPY INTO is the
incremental, idempotent replacement: the loaded-files set IS the
watermark.

At 100 TB: the listing is one object-store list call per prefix; the
loaded-set membership check is a set difference over file names
(metadata-sized, kept in the commit log, readable from the newest
checkpoint + tail); the data work is proportional to NEW bytes only.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    _load_log_entries,
    commit_snapshot,
    new_snapshot_name,
    read_pointer,
)
from datalake_polygonscan_spark.io.tombstones import _link_tree


def _file_key(path: str) -> str:
    return f"{os.path.basename(path)}:{os.path.getsize(path)}"


def loaded_files(table_path: str) -> set[str]:
    """Union of file identities every prior COPY_INTO commit recorded."""
    out: set[str] = set()
    for entry in _load_log_entries(table_path):
        if entry.get("op") == "COPY_INTO":
            out.update(entry.get("copied_files", []))
    return out


def copy_into(
    spark: SparkSession,
    table_path: str,
    source_glob: str,
    fmt: str = "parquet",
) -> dict:
    """Load every not-yet-loaded file matching ``source_glob`` into the
    table as ONE versioned commit; return load statistics.

    Idempotent: a file identity (name + byte size) that any prior
    COPY_INTO commit recorded is skipped, so replays are no-ops and
    partial-failure retries never double-load. No commit is written
    when nothing is new (a no-op must not advance the version — that
    would break consumers keyed on table versions)."""
    matches = sorted(_glob.glob(source_glob))
    already = loaded_files(table_path)
    new = [p for p in matches if _file_key(p) not in already]
    skipped = len(matches) - len(new)
    if not new:
        return {"loaded_files": 0, "skipped_files": skipped, "rows_loaded": 0,
                "committed": False}

    reader = spark.read.format(fmt)
    batch: DataFrame = reader.load(new)
    rows = batch.count()

    os.makedirs(table_path, exist_ok=True)
    base = read_pointer(table_path)
    cur = None if base is None else os.path.join(table_path, base["snapshot"])
    snap = new_snapshot_name(base)
    snap_dir = os.path.join(table_path, snap)
    if cur is not None:
        _link_tree(cur, snap_dir, skip=set())
    else:
        os.makedirs(snap_dir, exist_ok=True)
    try:
        batch.write.mode("append").parquet(snap_dir)
        commit_snapshot(
            table_path, snap, base,
            {"op": "COPY_INTO", "copied_files": [_file_key(p) for p in new]},
        )
    except SnapshotConflict:
        shutil.rmtree(snap_dir, ignore_errors=True)
        raise
    return {"loaded_files": len(new), "skipped_files": skipped,
            "rows_loaded": rows, "committed": True}
