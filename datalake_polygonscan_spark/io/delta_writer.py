"""S52 — WRITE-side Delta Lake interop: emit a minimal CONFORMANT
``_delta_log`` (delta-io PROTOCOL.md) so tables this engine exports
can be read by any Delta engine (delta-spark, delta-rs, Trino ...) —
the exact inverse of the S47 foreign reader's ``_replay``, closing
VERDICT r8 'What's missing' #4 ("interop is read-only").

Shape: the DATA write is Spark's own fully-parallel parquet writer
(hive ``col=val/`` layout under the table root — the layout every
mainstream Delta writer emits and the S47 reader's fast path expects);
the LOG commit is metadata-only driver work — list the files the
parquet job produced (before/after set diff), derive each file's
``partitionValues`` from its hive path, and append ONE ordered JSON
commit:

- v0 (create/overwrite-new): ``protocol`` (minReaderVersion 1,
  minWriterVersion 2 — no optional feature is used, so the log is
  readable by EVERY Delta reader), ``metaData`` (schemaString =
  Spark's schema JSON, which IS Delta's schema dialect),
  ``commitInfo``, one ``add`` per file
- append: a new version holding only ``add`` actions
- overwrite: a new version holding ``remove`` actions for every
  previously-live file plus the new ``add``s (the atomic
  REPLACE-TABLE commit — readers of the old snapshot keep working,
  exactly the TRUNCATE+COPY window fix of R11, now in an open format)

``validate_delta_log`` re-checks the emitted log against the protocol
doc's required-field list, independently of the writer.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.delta_reader import _commit_files, _hive_unescape


def _list_data_files(table_path: str) -> set[str]:
    out = set()
    for p in glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(p, table_path)
        if not rel.startswith("_delta_log"):
            out.add(rel)
    return out


def _partition_values(rel_path: str, partition_cols: list[str]) -> dict:
    vals = {}
    segs = rel_path.split(os.sep)
    for col, seg in zip(partition_cols, segs):
        eq = seg.find("=")
        if eq < 0 or seg[:eq] != col:
            raise ValueError(f"delta_writer: non-hive data path {rel_path!r}")
        raw = _hive_unescape(seg[eq + 1:])
        vals[col] = None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
    return vals


def _live_before(table_path: str) -> dict[str, dict]:
    """Replay the existing log (if any) for overwrite's remove set."""
    from datalake_polygonscan_spark.io.delta_reader import _replay

    try:
        _schema, _pcols, live, _v, _cm = _replay(table_path, None)
        return live
    except FileNotFoundError:
        return {}


def write_delta_table(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as a Delta table another engine can read. Returns
    {'version': committed version, 'n_added': .., 'n_removed': ..}."""
    partition_cols = list(partition_cols or ())
    if mode not in ("overwrite", "append"):
        raise ValueError(f"delta_writer: unsupported mode {mode!r}")
    log_dir = os.path.join(table_path, "_delta_log")
    commits = _commit_files(table_path) if os.path.isdir(log_dir) else []
    version = (commits[-1][0] + 1) if commits else 0
    prior_live = _live_before(table_path) if (commits and mode == "overwrite") else {}

    before = _list_data_files(table_path) if os.path.isdir(table_path) else set()
    writer = df.write.mode("append")  # log-level replace handles overwrite
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(table_path)
    new_files = sorted(_list_data_files(table_path) - before)

    actions: list[dict] = []
    now_ms = int(time.time() * 1000)
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append({"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": partition_cols,
            "configuration": {},
            "createdTime": now_ms,
        }})
    actions.append({"commitInfo": {
        "timestamp": now_ms,
        "operation": "WRITE",
        "operationParameters": {"mode": mode.upper()},
    }})
    for rel in sorted(prior_live):
        actions.append({"remove": {
            "path": rel.replace(os.sep, "/"),
            "deletionTimestamp": now_ms,
            "dataChange": True,
        }})
    for rel in new_files:
        full = os.path.join(table_path, rel)
        actions.append({"add": {
            "path": rel.replace(os.sep, "/"),
            "partitionValues": _partition_values(rel, partition_cols),
            "size": os.path.getsize(full),
            "modificationTime": int(os.path.getmtime(full) * 1000),
            "dataChange": True,
        }})
    os.makedirs(log_dir, exist_ok=True)
    # atomic publish: the log entry appears whole or not at all
    tmp = os.path.join(log_dir, f".{version:020d}.json.tmp")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.rename(tmp, os.path.join(log_dir, f"{version:020d}.json"))
    return {"version": version, "n_added": len(new_files),
            "n_removed": len(prior_live)}


#: required fields per action, straight from the protocol doc
_REQUIRED = {
    "protocol": ("minReaderVersion", "minWriterVersion"),
    "metaData": ("id", "format", "schemaString", "partitionColumns"),
    "add": ("path", "partitionValues", "size", "modificationTime", "dataChange"),
    "remove": ("path",),
}


def validate_delta_log(table_path: str) -> dict:
    """Independent conformance check of an emitted log: every commit
    parses as JSON-lines of known actions carrying the protocol doc's
    required fields; v0 declares protocol + metaData; every live
    add's file exists with the declared size. -> summary dict;
    raises ValueError on any violation."""
    commits = _commit_files(table_path)
    if not commits or commits[0][0] != 0:
        raise ValueError("delta log must start at version 0")
    if [v for v, _ in commits] != list(range(len(commits))):
        raise ValueError("delta log versions must be contiguous")
    n_actions = 0
    live: dict[str, dict] = {}
    saw_protocol = saw_metadata = False
    for v, path in commits:
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if len(action) != 1:
                raise ValueError(f"v{v}: action must hold exactly one key")
            kind, body = next(iter(action.items()))
            if kind == "commitInfo":
                continue
            if kind not in _REQUIRED:
                raise ValueError(f"v{v}: unknown action {kind!r}")
            missing = [k for k in _REQUIRED[kind] if k not in body]
            if missing:
                raise ValueError(f"v{v}: {kind} missing required {missing}")
            n_actions += 1
            if kind == "protocol":
                saw_protocol = True
            elif kind == "metaData":
                saw_metadata = True
                json.loads(body["schemaString"])  # must be valid schema JSON
            elif kind == "add":
                live[body["path"]] = body
            elif kind == "remove":
                live.pop(body["path"], None)
    if not (saw_protocol and saw_metadata):
        raise ValueError("log lacks protocol/metaData actions")
    for rel, add in live.items():
        full = os.path.join(table_path, rel)
        if not os.path.exists(full):
            raise ValueError(f"live add {rel!r} missing on disk")
        if os.path.getsize(full) != int(add["size"]):
            raise ValueError(f"live add {rel!r} size mismatch")
    return {"n_versions": len(commits), "n_actions": n_actions,
            "n_live_files": len(live)}
