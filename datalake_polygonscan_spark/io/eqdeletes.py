"""S35 — EQUALITY-delete files (Iceberg v2 equality deletes).

The third merge-on-read delete encoding, completing the ladder:

- key tombstones (io/tombstones.py) — delete by PRIMARY KEY;
- position deletes (io/posdeletes.py) — delete specific (file, row)
  copies located by scanning;
- EQUALITY deletes (this module) — delete by VALUE TUPLE, written
  BLIND: the writer never reads the table. That is the property
  streaming upserts need at 100 TB — a CDC consumer can retire a key
  in O(1) without locating it first.

Sequence-number semantics (the part that makes blind deletes sound):
every data batch and every delete batch gets a monotonically
increasing SEQUENCE number; a delete row eliminates exactly the data
rows with a MATCHING equality tuple written at a STRICTLY LOWER
sequence. Rows (re)inserted after the delete therefore survive it —
delete-then-reinsert round-trips without any coordination.

Layout inside a snapshot dir (hard-link commits, zero rewrite):

    snapshot=V-x/_data/seq-N/part-*.parquet   data batches
    snapshot=V-x/_eqdel/seq-N/part-*.parquet  delete-value batches

Read = union over data batches, each broadcast-ANTI-joined against the
delete tuples with a higher sequence. Equality deletes are the
read-amplifying encoding (every scan re-applies them until OPTIMIZE
materializes) — the trade for O(1) writes, stated in the Iceberg spec
and preserved honestly here.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    commit_snapshot,
    new_snapshot_name,
    read_pointer,
)
from datalake_polygonscan_spark.io.tombstones import _link_tree

_DATA = "_data"
_EQDEL = "_eqdel"


def _seq_dirs(snap_dir: str, kind: str) -> list[tuple[int, str]]:
    root = os.path.join(snap_dir, kind)
    if not os.path.isdir(root):
        return []
    out = []
    for e in os.listdir(root):
        if e.startswith("seq-"):
            out.append((int(e.split("-")[1]), os.path.join(root, e)))
    return sorted(out)


def _next_seq(snap_dir: str) -> int:
    seqs = [s for s, _ in _seq_dirs(snap_dir, _DATA)] + [
        s for s, _ in _seq_dirs(snap_dir, _EQDEL)
    ]
    return (max(seqs) + 1) if seqs else 0


def _commit_linked(table_path: str, base: dict | None, op: str, write_into) -> str:
    """Hard-link the current snapshot into a new one, let ``write_into``
    add its batch dir, CAS-commit. Returns the new snapshot dir."""
    cur = None if base is None else os.path.join(table_path, base["snapshot"])
    snap = new_snapshot_name(base)
    snap_dir = os.path.join(table_path, snap)
    if cur is not None:
        _link_tree(cur, snap_dir, skip=set())
    else:
        os.makedirs(snap_dir, exist_ok=True)
    try:
        write_into(snap_dir)
        commit_snapshot(table_path, snap, base, {"op": op})
    except SnapshotConflict:
        shutil.rmtree(snap_dir, ignore_errors=True)
        raise
    return snap_dir


def eq_append(df: DataFrame, table_path: str) -> int:
    """Append a data batch at the next sequence number. Existing data
    and delete files hard-link through — zero rewrite."""
    os.makedirs(table_path, exist_ok=True)
    base = read_pointer(table_path)

    seq_holder = {}

    def write_into(snap_dir: str) -> None:
        seq = _next_seq(snap_dir)
        df.write.mode("overwrite").parquet(os.path.join(snap_dir, _DATA, f"seq-{seq}"))
        seq_holder["seq"] = seq

    _commit_linked(table_path, base, "EQ_APPEND", write_into)
    return seq_holder["seq"]


def eq_delete(spark: SparkSession, table_path: str, values: DataFrame) -> int:
    """BLIND equality delete: ``values``' columns are the equality
    columns; each row retires every earlier-sequence data row matching
    that tuple. The table's data is NEVER read or rewritten — the
    commit is one hard-link pass plus an O(|values|) parquet write,
    which is what lets a CDC stream retire keys at 100 TB without a
    table scan per batch."""
    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")

    seq_holder = {}

    def write_into(snap_dir: str) -> None:
        seq = _next_seq(snap_dir)
        values.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(snap_dir, _EQDEL, f"seq-{seq}")
        )
        seq_holder["seq"] = seq

    _commit_linked(table_path, base, "EQ_DELETE", write_into)
    return seq_holder["seq"]


def read_with_equality_deletes(spark: SparkSession, table_path: str) -> DataFrame:
    """Union of data batches, each minus the delete tuples written at a
    STRICTLY HIGHER sequence: one broadcast anti-join per data batch
    (delete sets are small until OPTIMIZE folds them in).

    Delete matching uses NULL-SAFE equality (``<=>``), per the Iceberg
    v2 equality-delete semantics: a delete tuple with a NULL value
    matches data rows whose value IS NULL — plain ``=`` would silently
    no-op such deletes."""
    meta = read_pointer(table_path)
    if meta is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    snap_dir = os.path.join(table_path, meta["snapshot"])
    dels = [
        (seq, spark.read.parquet(path)) for seq, path in _seq_dirs(snap_dir, _EQDEL)
    ]
    out: DataFrame | None = None
    for seq, path in _seq_dirs(snap_dir, _DATA):
        part = spark.read.parquet(path)
        for dseq, dvals in dels:
            if dseq > seq:
                cond = None
                for c in dvals.columns:
                    e = part[c].eqNullSafe(dvals[c])
                    cond = e if cond is None else cond & e
                part = part.join(F.broadcast(dvals), on=cond, how="left_anti")
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise FileNotFoundError(f"no data batches at {snap_dir}")
    return out
