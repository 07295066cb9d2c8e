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

from datalake_polygonscan_spark.tables import tiny_df  # noqa: E402

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


#: auto-checkpoint cadence: a classic checkpoint parquet is emitted
#: after every Nth commit (at versions N-1, 2N-1, ...), the
#: delta-spark default interval — so engines may CLEAN UP the JSON
#: prefix behind it and readers still resolve (round 10, VERDICT r9
#: 'Next round' #4)
CHECKPOINT_INTERVAL = 10


def write_checkpoint(table_path: str, version: int | None = None) -> dict:
    """Emit the classic ``{v:020d}.checkpoint.parquet`` +
    ``_last_checkpoint`` pointer for the given (default: latest)
    version — the protocol's "Checkpoints" shape the in-repo reader
    already consumes (delta_reader._checkpoint_state): one parquet row
    per replayed action, nullable ``protocol``/``metaData``/``add``/
    ``remove`` struct columns, partitionValues/configuration as
    map<string,string>."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir0 = os.path.join(table_path, "_delta_log")
    commits = _commit_files(table_path)
    protocol: dict | None = None
    metadata: dict | None = None
    live: dict[str, dict] = {}
    start_v = -1
    # seed from an existing checkpoint (a cleaned-up table may have no
    # JSON prefix left), then replay the JSON tail over it
    lc = os.path.join(log_dir0, "_last_checkpoint")
    if os.path.exists(lc):
        import pyarrow.parquet as _pq

        cpv = int(json.load(open(lc))["version"])
        cp_file = os.path.join(log_dir0, f"{cpv:020d}.checkpoint.parquet")
        if os.path.exists(cp_file) and (version is None or cpv <= int(version)):
            for row in _pq.read_table(cp_file).to_pylist():
                if row.get("protocol") is not None:
                    protocol = row["protocol"]
                elif row.get("metaData") is not None:
                    md = dict(row["metaData"])
                    for k in ("configuration",):
                        if isinstance(md.get(k), list):
                            md[k] = dict(md[k])
                    metadata = md
                elif row.get("add") is not None:
                    add = dict(row["add"])
                    if isinstance(add.get("partitionValues"), list):
                        add["partitionValues"] = dict(add["partitionValues"])
                    live[add["path"]] = add
                elif row.get("remove") is not None:
                    live.pop(row["remove"]["path"], None)
            start_v = cpv
    if not commits and start_v < 0:
        raise FileNotFoundError(f"no _delta_log commits under {table_path}")
    target = (max([start_v] + [v for v, _ in commits])
              if version is None else int(version))
    commits = [(v, p) for v, p in commits if v > start_v]
    for v, path in commits:
        if v > target:
            break
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if action.get("protocol") is not None:
                protocol = action["protocol"]
            elif action.get("metaData") is not None:
                metadata = action["metaData"]
            elif action.get("add") is not None:
                add = action["add"]
                if add.get("deletionVector"):
                    raise ValueError(
                        "delta_writer.write_checkpoint: deletion-vector adds "
                        "not representable in the classic checkpoint schema "
                        "this writer emits"
                    )
                live[add["path"]] = add
            elif action.get("remove") is not None:
                live.pop(action["remove"]["path"], None)
    if protocol is None or metadata is None:
        raise ValueError("delta_writer: log lacks protocol/metaData actions")

    pv_t = pa.map_(pa.string(), pa.string())
    schema = pa.schema([
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int64()),
            ("minWriterVersion", pa.int64())])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pv_t),
            ("createdTime", pa.int64())])),
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pv_t),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_())])),
        ("remove", pa.struct([
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_())])),
    ])
    rows: list[dict] = [
        {"protocol": {
            "minReaderVersion": int(protocol.get("minReaderVersion") or 1),
            "minWriterVersion": int(protocol.get("minWriterVersion") or 2)}},
        {"metaData": {
            "id": metadata.get("id"),
            "format": {"provider": (metadata.get("format") or {}).get(
                "provider", "parquet")},
            "schemaString": metadata["schemaString"],
            "partitionColumns": list(metadata.get("partitionColumns") or ()),
            "configuration": dict(metadata.get("configuration") or {}),
            "createdTime": int(metadata.get("createdTime") or 0)}},
    ]
    for rel in sorted(live):
        add = live[rel]
        rows.append({"add": {
            "path": add["path"],
            "partitionValues": dict(add.get("partitionValues") or {}),
            "size": int(add.get("size") or 0),
            "modificationTime": int(add.get("modificationTime") or 0),
            "dataChange": False,
        }})
    log_dir = os.path.join(table_path, "_delta_log")
    cp_path = os.path.join(log_dir, f"{target:020d}.checkpoint.parquet")
    tmp = cp_path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
    os.rename(tmp, cp_path)
    lc_tmp = os.path.join(log_dir, "._last_checkpoint.tmp")
    with open(lc_tmp, "w") as f:
        json.dump({"version": target, "size": len(rows)}, f)
    os.rename(lc_tmp, os.path.join(log_dir, "_last_checkpoint"))
    return {"version": target, "n_actions": len(rows),
            "n_live_files": len(live)}


def write_delta_table(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    checkpoint_interval: int | None = CHECKPOINT_INTERVAL,
) -> dict:
    """Write ``df`` as a Delta table another engine can read. Returns
    {'version': committed version, 'n_added': .., 'n_removed': ..,
    'checkpointed': bool}. A classic checkpoint parquet is emitted
    after every ``checkpoint_interval``-th commit (None disables)."""
    partition_cols = list(partition_cols or ())
    if mode not in ("overwrite", "append"):
        raise ValueError(f"delta_writer: unsupported mode {mode!r}")
    log_dir = os.path.join(table_path, "_delta_log")
    commits = _commit_files(table_path) if os.path.isdir(log_dir) else []
    last_v = commits[-1][0] if commits else -1
    # a cleaned-up table may have NO JSONs left: the checkpoint then
    # carries the latest version (protocol "Checkpoints")
    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        last_v = max(last_v, int(json.load(open(lc))["version"]))
    version = last_v + 1
    has_log = last_v >= 0
    prior_live = _live_before(table_path) if (has_log and mode == "overwrite") else {}

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
    checkpointed = bool(
        checkpoint_interval and (version + 1) % checkpoint_interval == 0
    )
    if checkpointed:
        write_checkpoint(table_path, version)
    return {"version": version, "n_added": len(new_files),
            "n_removed": len(prior_live), "checkpointed": checkpointed}


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


def delete_where(spark: SparkSession, table_path: str, predicate: str) -> dict:
    """Row-level DELETE via DELETION VECTORS (round 10 — the modern
    Delta shape): matching rows are recorded as per-file roaring
    bitmaps (io/roaring.py, storageType 'u' sidecars) instead of
    rewriting any data file — write amplification is O(deleted-row
    positions), not O(touched-file bytes).

    Mechanics (protocol "Deletion Vectors"):

    - one scan finds matching rows' ``_metadata.row_index`` per live
      file (Catalyst pushes ``predicate`` into the scan);
    - per touched file, ONE executor task merges the file's existing
      DV positions (if any) and writes a fresh
      ``deletion_vector_<uuid>.bin`` via the from-scratch codec —
      the driver only sees descriptors;
    - the commit emits ``remove`` + re-``add`` (same path, new
      ``deletionVector``) per touched file, upgrading the protocol to
      minReaderVersion 3 / readerFeatures [deletionVectors] on first
      use — exactly the action shape delta-spark emits.

    Returns {'version', 'n_deleted', 'n_dv_files'}; no-op (no commit)
    when nothing matches.
    """
    import uuid as _uuid

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datalake_polygonscan_spark.io.delta_reader import _replay
    from datalake_polygonscan_spark.io.roaring import read_dv

    schema, partition_cols, live, version, cm_mode = _replay(table_path, None)
    if cm_mode != "none":
        raise ValueError(
            "delta_writer.delete_where: column-mapped tables not supported")
    # key rows to files by RELATIVE path — Spark's parquet writer
    # reuses task filenames across partition dirs, so basenames alone
    # collide on this writer's own layout (the round-10 delta_reader
    # lesson). Uniform depth holds for every layout this writer emits.
    depths = {p.count("/") for p in live} or {0}
    if len(depths) != 1:
        raise ValueError(
            "delta_writer.delete_where: mixed data-path depths")
    rel_of = {p: p for p in live}

    # one scan, predicate pushed down, positions stamped from the
    # scan's own metadata columns; partition columns re-enter via the
    # broadcast file->partitionValues map so the predicate may name
    # them. Rows an existing DV already deleted may re-match — the
    # set union below makes that idempotent.
    data_fields = [f for f in schema.fields if f.name not in partition_cols]
    scan = (
        spark.read.schema(T.StructType(data_fields))
        .parquet(*[os.path.join(table_path, p) for p in live])
        .withColumn("__file", F.substring_index(
            F.col("_metadata.file_path"), "/", -(depths.pop() + 1)))
        .withColumn("__pos", F.col("_metadata.row_index"))
    )
    if partition_cols:
        ptypes = {f.name: f.dataType for f in schema.fields}
        map_rows = [
            (p,
             *[(a.get("partitionValues") or {}).get(c) for c in partition_cols])
            for p, a in live.items()
        ]
        map_schema = T.StructType(
            [T.StructField("__file", T.StringType())]
            + [T.StructField(f"__pv_{c}", T.StringType())
               for c in partition_cols]
        )
        scan = scan.join(
            F.broadcast(tiny_df(spark, map_rows, map_schema)), "__file")
        for c in partition_cols:
            scan = scan.withColumn(c, F.col(f"__pv_{c}").cast(ptypes[c]))
    hits = scan.filter(predicate).select("__file", "__pos")
    # existing DV positions merge in executor tasks; decode driver-side
    # once (DV bytes are small by design) and ship via the task rows
    old_positions = {
        p: read_dv(dict(a["deletionVector"]), table_path)
        for p, a in live.items() if a.get("deletionVector")
    }
    tp = table_path
    run_token = _uuid.uuid4().hex

    def _write_dvs(pdf):
        import pandas as _pd
        import uuid as _u

        from datalake_polygonscan_spark.io.roaring import (
            make_uuid_dv_name as _mk,
            write_dv_file as _wdv,
        )

        fname = pdf["__file"].iloc[0]
        new = set(int(p) for p in pdf["__pos"])
        old = set(old_positions.get(fname, ()))
        positions = sorted(new | old)
        u = _u.uuid5(_u.NAMESPACE_URL, run_token + "/" + fname)
        [desc] = _wdv(
            os.path.join(tp, f"deletion_vector_{u}.bin"), [positions])
        return _pd.DataFrame({
            "file": [fname],
            "path_or_inline": [_mk(u)],
            "offset": [desc["offset"]],
            "size_bytes": [desc["sizeInBytes"]],
            "cardinality": [desc["cardinality"]],
            "n_new": [int(len(new - old))],
        })

    descs = hits.groupBy("__file").applyInPandas(
        _write_dvs,
        "file string, path_or_inline string, offset long, size_bytes long, "
        "cardinality long, n_new long",
    ).collect()
    if not descs:
        return {"version": version, "n_deleted": 0, "n_dv_files": 0}

    now_ms = int(__import__("time").time() * 1000)
    actions: list[dict] = [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }},
        {"commitInfo": {"timestamp": now_ms, "operation": "DELETE",
                        "operationParameters": {"predicate": predicate}}},
    ]
    for d in sorted(descs, key=lambda r: r.file):
        rel = rel_of[d.file]
        add = dict(live[rel])
        actions.append({"remove": {
            "path": rel, "deletionTimestamp": now_ms, "dataChange": True}})
        add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": d.path_or_inline,
            "offset": int(d.offset),
            "sizeInBytes": int(d.size_bytes),
            "cardinality": int(d.cardinality),
        }
        add["dataChange"] = True
        actions.append({"add": add})
    log_dir = os.path.join(table_path, "_delta_log")
    new_v = version + 1
    tmp = os.path.join(log_dir, f".{new_v:020d}.json.tmp")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.rename(tmp, os.path.join(log_dir, f"{new_v:020d}.json"))
    return {
        "version": new_v,
        "n_deleted": int(sum(d.n_new for d in descs)),
        "n_dv_files": len(descs),
    }
