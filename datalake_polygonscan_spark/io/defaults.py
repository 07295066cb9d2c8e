"""S33 — ALTER TABLE ADD COLUMN ... DEFAULT as a METADATA-ONLY commit
(Iceberg's ``initial-default`` / Delta's ALTER ADD COLUMN semantics).

The semantics that matter (and that a naive COALESCE-on-read gets
wrong): rows written BEFORE the column existed read back as the
default, while rows written AFTER keep exactly what the writer put
there — including explicit NULL. No data file is rewritten at ALTER
time (old files are hard-linked into the new snapshot), and no
backfill job ever runs: at 100 TB, adding a column to a petabyte
table must be O(metadata).

Mechanism (Iceberg tracks a schema-id per data file; we track the
equivalent): the ALTER commit records, next to the default value, the
basenames of every data file present at that moment — exactly the
files that physically LACK the column. Hard links preserve basenames
across later merge/compaction commits, so the membership test stays
correct for as long as those files live. The read path
(io/sinks.py:read_snapshot) applies the default only to rows whose
``_metadata.file_path`` basename is in that set — a per-row codegen
IN-set probe, no join, no shuffle. (At Iceberg scale the set is a
schema-id column in the manifest rather than a name list; the read
predicate is the same.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    commit_snapshot,
    current_snapshot_path,
    new_snapshot_name,
    read_pointer,
)


def _data_files(snap_dir: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(snap_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def add_column_with_default(
    table_path: str, col_name: str, col_type: str, default
) -> None:
    """Metadata-only ADD COLUMN: hard-link every current data file
    into a new snapshot, extend the logical schema, and record
    ``(default, files-that-predate-the-column)`` in the commit
    metadata. Raises on CAS conflict like any other commit."""
    base = read_pointer(table_path)
    snap_dir = current_snapshot_path(table_path)
    if base is None or snap_dir is None:
        raise FileNotFoundError(f"no table at {table_path}")
    if not base.get("table_schema"):
        raise ValueError("defaults need a schema-tracked table")
    schema = T.StructType.fromJson(json.loads(base["table_schema"]))
    if col_name in schema.fieldNames():
        raise ValueError(f"column {col_name!r} already exists")
    new_schema = T.StructType(
        list(schema.fields) + [T.StructField(col_name, T._parse_datatype_string(col_type))]
    )

    new_snap = new_snapshot_name(base)
    new_dir = os.path.join(table_path, new_snap)
    os.makedirs(new_dir)
    absent = _data_files(snap_dir)
    for fname in absent:
        os.link(os.path.join(snap_dir, fname), os.path.join(new_dir, fname))

    defaults = dict(base.get("column_defaults") or {})
    defaults[col_name] = {"value": default, "absent_files": absent}
    meta = {
        "op": "ADD_COLUMN",
        "table_schema": new_schema.json(),
        "column_defaults": defaults,
    }
    try:
        commit_snapshot(table_path, new_snap, base, meta)
    except SnapshotConflict:
        import shutil

        shutil.rmtree(new_dir, ignore_errors=True)
        raise
