"""S30 — atomic MULTI-TABLE transactions over the snapshot tables.

The single-table commit protocol (io/sinks.py) is a CAS pointer swap;
this module extends it to ALL-OR-NOTHING commits spanning several
tables — the lakehouse gap the single-table log cannot close (e.g. a
fact table and its aggregate rollup must never be visible in mixed
states).

Protocol (write-ahead intent + ordered CAS):
1. STAGE: every table's new snapshot directory is fully written with
   no pointer movement — crash here leaves only invisible orphans.
2. LOCK: acquire every table's pointer lock in CANONICAL path order
   (total order -> no deadlock against concurrent transactions).
3. VALIDATE: every table's live pointer must equal the base the
   writer derived from; any mismatch aborts the whole transaction
   (staged dirs removed, SnapshotConflict raised) — optimistic
   concurrency across the full table set.
4. COMMIT POINT: one INTENT file (state=committed, listing every
   table's base and target pointer meta) is os.replace'd into the
   transaction log. This single atomic rename IS the transaction.
5. APPLY: each table's pointer+commit-log entry is applied (the same
   `_apply_pointer_locked` the single-table path uses).
6. DONE: the intent is marked applied.

Crash atomicity: a crash BEFORE the commit point leaves staged
orphans only (rolled back by `recover`); a crash AFTER the commit
point but mid-apply is rolled FORWARD by `recover` (the intent holds
every target pointer) — so readers never observe a mixed state after
recovery, exactly the WAL contract. `recover` is idempotent and
safe to run at any time (e.g. on coordinator restart).

Scale notes: data volume costs are identical to N independent
commits (staging is the parallel Spark write); the critical section
adds only N pointer CASes + one intent rename — O(tables), zero data
I/O, so the protocol holds at any table size. Lock ordering bounds
coordinator concurrency, not executor work.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    _apply_pointer_locked,
    _pointer_lock,
    logical_schema_json,
    new_snapshot_name,
    read_pointer,
)

_TXN_STATE_STAGED = "staged"
_TXN_STATE_COMMITTED = "committed"
_TXN_STATE_APPLIED = "applied"


def _intent_path(txn_root: str, txn_id: str, state: str) -> str:
    return os.path.join(txn_root, f"txn-{txn_id}.{state}.json")


def _write_json_atomic(path: str, payload: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix="._txn_tmp_")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def txn_commit(
    spark: SparkSession,
    txn_root: str,
    writes: list[tuple[str, DataFrame]],
    extra_meta: dict | None = None,
    _crash_after_apply: int | None = None,
) -> str:
    """Atomically commit one new snapshot per (table_path, df) pair.
    Returns the transaction id. Raises SnapshotConflict (nothing
    applied, staging cleaned) if ANY table moved under the writer.

    ``_crash_after_apply`` is the failure-injection hook for the
    recovery tests: raise after applying that many table pointers
    (but after the commit point), simulating a coordinator crash."""
    txn_id = uuid.uuid4().hex[:12]
    # canonical order: all lock acquisition happens in sorted-path
    # order so concurrent transactions cannot deadlock
    writes = sorted(writes, key=lambda w: w[0])
    staged = []  # (table_path, base_meta, snap_name, meta)
    try:
        for table_path, df in writes:
            os.makedirs(table_path, exist_ok=True)
            base = read_pointer(table_path)
            snap = new_snapshot_name(base)
            df.write.mode("overwrite").parquet(os.path.join(table_path, snap))
            meta = {
                "snapshot": snap,
                "committed_at": time.time(),
                "op": "TXN_WRITE",
                "txn_id": txn_id,
                "table_schema": logical_schema_json(df),
                **(extra_meta or {}),
            }
            staged.append((table_path, base, snap, meta))
    except Exception:
        for table_path, _b, snap, _m in staged:
            shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
        raise

    with contextlib.ExitStack() as stack:
        try:
            for table_path, _b, _s, _m in staged:
                stack.enter_context(_pointer_lock(table_path))
            for table_path, base, _s, _m in staged:
                if read_pointer(table_path) != base:
                    raise SnapshotConflict(
                        f"txn {txn_id}: {table_path} moved under the transaction"
                    )
        except Exception:
            # pre-commit-point failure: nothing is visible yet, so the
            # whole transaction rolls BACK by deleting the staged dirs
            for table_path, _b, snap, _m in staged:
                shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
            raise

        # ---- COMMIT POINT: one atomic rename publishes the intent ----
        intent = {
            "txn_id": txn_id,
            "tables": [
                {"table_path": tp, "base": b, "meta": m} for tp, b, _s, m in staged
            ],
        }
        _write_json_atomic(_intent_path(txn_root, txn_id, _TXN_STATE_COMMITTED), intent)

        n_applied = 0
        for table_path, _b, _s, meta in staged:
            if _crash_after_apply is not None and n_applied >= _crash_after_apply:
                raise RuntimeError(f"txn {txn_id}: injected crash after {n_applied} applies")
            _apply_pointer_locked(table_path, meta)
            n_applied += 1

    _write_json_atomic(
        _intent_path(txn_root, txn_id, _TXN_STATE_APPLIED), {"txn_id": txn_id}
    )
    return txn_id


def recover(txn_root: str) -> dict:
    """Roll FORWARD every committed-but-unapplied transaction (apply
    the recorded target pointers to tables still at their base or
    already at target), then mark it applied. Idempotent. Returns
    {"rolled_forward": [...], "already_applied": n}."""
    if not os.path.isdir(txn_root):
        return {"rolled_forward": [], "already_applied": 0}
    rolled, done = [], 0
    for name in sorted(os.listdir(txn_root)):
        if not name.endswith(f".{_TXN_STATE_COMMITTED}.json"):
            continue
        txn_id = name.split("-", 1)[1].split(".", 1)[0]
        if os.path.exists(_intent_path(txn_root, txn_id, _TXN_STATE_APPLIED)):
            done += 1
            continue
        with open(os.path.join(txn_root, name)) as f:
            intent = json.load(f)
        for t in intent["tables"]:
            with _pointer_lock(t["table_path"]):
                live = read_pointer(t["table_path"])
                if live == t["meta"]:
                    continue  # this table already applied before the crash
                if live != t["base"]:
                    raise RuntimeError(
                        f"txn {txn_id}: {t['table_path']} diverged from both base "
                        f"and target — manual intervention required"
                    )
                _apply_pointer_locked(t["table_path"], t["meta"])
        _write_json_atomic(
            _intent_path(txn_root, txn_id, _TXN_STATE_APPLIED), {"txn_id": txn_id}
        )
        rolled.append(txn_id)
    return {"rolled_forward": rolled, "already_applied": done}
