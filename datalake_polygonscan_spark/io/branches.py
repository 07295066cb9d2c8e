"""S32 — named table branches + write-audit-publish (WAP) on the
snapshot pointer store (io/sinks.py).

Iceberg-style refs: ``main`` IS the ``_CURRENT`` pointer; every other
branch is a JSON ref under ``_refs/`` holding the same pointer shape
plus the main version it forked from. Branch creation is ZERO-COPY
(snapshot directories are immutable, the ref just names one); branch
commits write new snapshot directories in the same table dir and CAS
the ref file under the table's pointer lock; publishing fast-forwards
main to the branch head iff main has not moved since the fork — a
pointer swap, no data movement: Iceberg's fast-forward cherry-pick,
the mechanism behind the write-audit-publish pattern.

Why this matters vs the reference: the reference's weekly job loads
straight into the serving table (walletDataConsumer.py — the R11
full-refresh DELETE + R12 bulk load window, during which readers see
a half-loaded table). WAP is the at-scale replacement: stage the load
on a branch, audit it there, then publish atomically; readers never
observe an unaudited or partial state.

Branch commit history lives in a per-branch ``_refs/<name>.log.jsonl``
(NOT the main ``_log/``): branch versions share main's numbering line
only at publish time, so interleaving their entries into the main log
would corrupt time travel.

Pruning safety: :func:`publish_branch` widens the retention window so
the prune that follows a publish can never delete a snapshot some
OTHER live branch still references (retention is computed against the
oldest live ref, deterministically).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    _pointer_lock,
    commit_snapshot,
    logical_schema_json,
    new_snapshot_name,
    read_pointer,
    read_snapshot,
    snapshot_version,
)

_REFS = "_refs"


class BranchDiverged(RuntimeError):
    """Main moved since the branch forked — a fast-forward publish is
    impossible; rebase the branch (re-fork + re-apply) and re-audit."""


def _refs_dir(table_path: str) -> str:
    return os.path.join(table_path, _REFS)


def _ref_path(table_path: str, branch: str) -> str:
    if not branch or "/" in branch or branch.startswith("."):
        raise ValueError(f"bad branch name {branch!r}")
    return os.path.join(_refs_dir(table_path), f"{branch}.json")


def _write_ref_locked(table_path: str, branch: str, ref: dict) -> None:
    refs = _refs_dir(table_path)
    os.makedirs(refs, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=refs, prefix="._ref_tmp_")
    with os.fdopen(fd, "w") as f:
        json.dump(ref, f)
    os.replace(tmp, _ref_path(table_path, branch))
    with open(os.path.join(refs, f"{branch}.log.jsonl"), "a") as f:
        f.write(json.dumps(ref) + "\n")


def read_branch_pointer(table_path: str, branch: str) -> dict | None:
    """The branch head metadata, or None if the branch doesn't exist."""
    try:
        with open(_ref_path(table_path, branch)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def list_branches(table_path: str) -> dict[str, dict]:
    refs = _refs_dir(table_path)
    out: dict[str, dict] = {}
    if os.path.isdir(refs):
        for fn in sorted(os.listdir(refs)):
            if fn.endswith(".json") and not fn.startswith("."):
                with open(os.path.join(refs, fn)) as f:
                    out[fn[: -len(".json")]] = json.load(f)
    return out


def create_branch(table_path: str, branch: str) -> dict:
    """Fork ``branch`` from the current main head — zero-copy (the ref
    names main's immutable snapshot directory)."""
    with _pointer_lock(table_path):
        meta = read_pointer(table_path)
        if meta is None:
            raise FileNotFoundError(f"no table at {table_path} to branch")
        if read_branch_pointer(table_path, branch) is not None:
            raise ValueError(f"branch {branch!r} already exists")
        ref = {
            **meta,
            "branch": branch,
            "op": "BRANCH_CREATE",
            "forked_at_version": snapshot_version(meta),
            "committed_at": time.time(),
        }
        _write_ref_locked(table_path, branch, ref)
    return ref


def read_branch(spark: SparkSession, table_path: str, branch: str) -> DataFrame:
    ref = read_branch_pointer(table_path, branch)
    if ref is None:
        raise FileNotFoundError(f"no branch {branch!r} at {table_path}")
    return read_snapshot(spark, os.path.join(table_path, ref["snapshot"]), ref)


def commit_branch(
    df: DataFrame, table_path: str, branch: str, op: str = "WRITE"
) -> dict:
    """Write ``df`` as the branch's new head snapshot (full overwrite
    semantics, like atomic_overwrite; compose ``read_branch().union``
    for appends). CAS on the ref: raises :class:`SnapshotConflict` if
    another writer advanced the branch between read and commit."""
    base_ref = read_branch_pointer(table_path, branch)
    if base_ref is None:
        raise FileNotFoundError(f"no branch {branch!r} at {table_path}")
    snap = new_snapshot_name(base_ref)
    df.write.mode("overwrite").parquet(os.path.join(table_path, snap))
    with _pointer_lock(table_path):
        live = read_branch_pointer(table_path, branch)
        if live != base_ref:
            raise SnapshotConflict(
                f"branch {branch!r} moved: expected {base_ref!r}, found {live!r}"
            )
        ref = {
            "snapshot": snap,
            "branch": branch,
            "op": op,
            "forked_at_version": base_ref["forked_at_version"],
            "table_schema": logical_schema_json(df),
            "committed_at": time.time(),
        }
        _write_ref_locked(table_path, branch, ref)
    return ref


def publish_branch(table_path: str, branch: str, retain: int = 2) -> dict:
    """WAP publish: fast-forward main to the branch head — one pointer
    CAS, zero data movement. Requires main to still be at the branch's
    fork point (:class:`BranchDiverged` otherwise); the post-commit
    prune window is widened to cover every OTHER live ref, so a
    publish can never vacuum a snapshot some branch still names."""
    ref = read_branch_pointer(table_path, branch)
    if ref is None:
        raise FileNotFoundError(f"no branch {branch!r} at {table_path}")
    main = read_pointer(table_path)
    if snapshot_version(main) != ref["forked_at_version"]:
        raise BranchDiverged(
            f"main at v{snapshot_version(main)}, branch {branch!r} forked at "
            f"v{ref['forked_at_version']} — rebase required"
        )
    new_version = snapshot_version(ref)
    keep = retain
    for other, oref in list_branches(table_path).items():
        if other != branch:
            keep = max(keep, new_version - snapshot_version(oref) + 1)
    meta = {
        "op": "PUBLISH",
        "branch": branch,
        **({"table_schema": ref["table_schema"]} if "table_schema" in ref else {}),
    }
    commit_snapshot(table_path, ref["snapshot"], main, meta, retain=keep)
    return read_pointer(table_path)  # type: ignore[return-value]


def drop_branch(table_path: str, branch: str) -> None:
    """Remove the ref (and its log). Unpublished head snapshots stay
    on disk until a later commit's prune collects them — dropping a
    ref never deletes data another reader may be scanning."""
    with _pointer_lock(table_path):
        try:
            os.unlink(_ref_path(table_path, branch))
        except FileNotFoundError:
            pass
        try:
            os.unlink(os.path.join(_refs_dir(table_path), f"{branch}.log.jsonl"))
        except FileNotFoundError:
            pass
