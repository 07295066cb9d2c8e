"""S26 — partition-spec EVOLUTION (Iceberg's signature table feature).

Hive-style tables freeze their partition layout at creation: changing
it means rewriting every byte. Iceberg instead versions the PARTITION
SPEC in table metadata — old data keeps its old layout, new data lands
in the new one, and scan planning prunes each file against the spec it
was written under (Iceberg spec §"Partition Evolution").

Same idea here on the snapshot/commit-log substrate (io/sinks.py):

- a snapshot directory holds one subdirectory per spec
  (``spec-00000/``, ``spec-00001/``, ...), each an ordinary hive
  layout for ITS partition columns;
- the commit metadata carries ``partition_specs`` — the ordered list
  of ``{"id", "partition_by"}`` — so every version self-describes
  which layouts it contains;
- :func:`evolve_partitioning` commits a new version whose spec dirs
  are ALL hard links (zero data movement — evolving a 100 TB table is
  an O(files) metadata commit) plus one new empty spec;
- :func:`append_with_spec` lands new rows in the NEWEST spec only;
- reads (:func:`read_spec_snapshot`, wired into
  ``sinks.read_snapshot``) scan each spec dir separately and union —
  so a predicate on a partition column of EITHER spec partition-prunes
  the scan of that spec (Spark's ``PartitionFilters``) and falls back
  to parquet row-group min/max pruning on the other. That is exactly
  Iceberg's behavior: pruning quality is per-spec, correctness is
  global.

The reference's one table is repartitioned-by-wallet forever
(``walletDataConsumer.py:51-83`` loops wallets serially); evolution is
what a 100 TB deployment needs the day the query mix shifts from
per-wallet lookups to time-range scans.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalake_polygonscan_spark.io.sinks import (
    SnapshotConflict,
    commit_snapshot,
    logical_schema_json,
    new_snapshot_name,
    read_pointer,
)


def _spec_dirname(spec_id: int) -> str:
    return f"spec-{spec_id:05d}"


def overwrite_with_spec(
    df: DataFrame,
    table_path: str,
    partition_by: list[str],
    retain: int = 2,
) -> str:
    """Create (or overwrite) an evolution-capable table: version 0 of
    the data lands under ``spec-00000/`` in the given hive layout, and
    the commit records spec 0. Returns the new snapshot dir."""
    os.makedirs(table_path, exist_ok=True)
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition column(s) {missing} not in {df.columns}")
    base = read_pointer(table_path)
    snap = new_snapshot_name(base)
    spec_dir = os.path.join(table_path, snap, _spec_dirname(0))
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(spec_dir)
    meta = {
        "op": "WRITE",
        "table_schema": logical_schema_json(df),
        "partition_specs": [{"id": 0, "partition_by": list(partition_by)}],
    }
    try:
        commit_snapshot(table_path, snap, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
        raise
    return os.path.join(table_path, snap)


def evolve_partitioning(
    table_path: str, new_partition_by: list[str], retain: int = 2
) -> int:
    """Commit a new version that ADDS a partition spec: every existing
    spec directory is hard-linked (zero bytes moved), and subsequent
    appends land in the new layout. Returns the new spec id."""
    from datalake_polygonscan_spark.io.tombstones import _link_tree

    base = read_pointer(table_path)
    if base is None or not base.get("partition_specs"):
        raise ValueError(
            f"{table_path} is not an evolution-capable table "
            "(create it with overwrite_with_spec)"
        )
    schema = T.StructType.fromJson(json.loads(base["table_schema"]))
    names = {f.name for f in schema.fields}
    missing = [c for c in new_partition_by if c not in names]
    if missing:
        raise ValueError(f"partition column(s) {missing} not in table schema {sorted(names)}")
    specs = list(base["partition_specs"])
    if list(new_partition_by) == list(specs[-1]["partition_by"]):
        raise ValueError(f"table already partitioned by {new_partition_by}")
    new_id = specs[-1]["id"] + 1
    snap = new_snapshot_name(base)
    prev = os.path.join(table_path, base["snapshot"])
    for spec in specs:
        d = _spec_dirname(spec["id"])
        _link_tree(os.path.join(prev, d), os.path.join(table_path, snap, d), skip=set())
    meta = {k: v for k, v in base.items() if k not in ("snapshot", "committed_at")}
    meta["op"] = "EVOLVE PARTITION SPEC"
    meta["partition_specs"] = specs + [{"id": new_id, "partition_by": list(new_partition_by)}]
    try:
        commit_snapshot(table_path, snap, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
        raise
    return new_id


def append_with_spec(df: DataFrame, table_path: str, retain: int = 2) -> str:
    """Append rows as a NEW COMMIT (unlike ``sinks.append``, which adds
    files to the live snapshot in place): prior spec dirs hard-link
    across, the batch lands in the newest spec's layout. Returns the
    new snapshot dir."""
    from datalake_polygonscan_spark.io.tombstones import _link_tree

    base = read_pointer(table_path)
    if base is None or not base.get("partition_specs"):
        raise ValueError(
            f"{table_path} is not an evolution-capable table "
            "(create it with overwrite_with_spec)"
        )
    schema = T.StructType.fromJson(json.loads(base["table_schema"]))
    names = [f.name for f in schema.fields]
    if set(df.columns) != set(names):
        raise ValueError(f"append schema {sorted(df.columns)} != table schema {sorted(names)}")
    specs = list(base["partition_specs"])
    latest = specs[-1]
    snap = new_snapshot_name(base)
    prev = os.path.join(table_path, base["snapshot"])
    for spec in specs:
        d = _spec_dirname(spec["id"])
        src = os.path.join(prev, d)
        if os.path.isdir(src):
            _link_tree(src, os.path.join(table_path, snap, d), skip=set())
    spec_dir = os.path.join(table_path, snap, _spec_dirname(latest["id"]))
    writer = df.select(*names).write.mode("append")
    if latest["partition_by"]:
        writer = writer.partitionBy(*latest["partition_by"])
    writer.parquet(spec_dir)
    meta = {k: v for k, v in base.items() if k not in ("snapshot", "committed_at")}
    meta["op"] = "APPEND"
    try:
        commit_snapshot(table_path, snap, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
        raise
    return os.path.join(table_path, snap)


def read_spec_snapshot(spark: SparkSession, snap_dir: str, meta: dict) -> DataFrame:
    """Union of one scan per spec dir, columns in logical-schema order.
    Each scan is an independent FileSourceScan, so a filter above the
    union reaches BOTH: as a partition-dir prune (``PartitionFilters``)
    where the column is that spec's partition key, as a parquet
    min/max pushdown otherwise."""
    schema = T.StructType.fromJson(json.loads(meta["table_schema"]))
    names = [f.name for f in schema.fields]
    parts = []
    for spec in meta["partition_specs"]:
        d = os.path.join(snap_dir, _spec_dirname(spec["id"]))
        if os.path.isdir(d):
            parts.append(spark.read.schema(schema).parquet(d).select(*names))
    if not parts:
        raise FileNotFoundError(f"no spec dirs under {snap_dir}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
