"""S53 — WRITE-side Apache Iceberg v2 interop: emit a SPEC-COMPLETE
metadata tree (metadata.json + manifest-list/manifest Avro, both
composed by the in-repo from-scratch Avro encoder) so tables this
engine exports can be read by any Iceberg engine — the Iceberg twin of
``io/delta_writer.py`` (S52), completing the round-9 story that
foreign-format interop goes both directions.

Spec-complete (ADVICE r9): the emitted Avro schemas carry the spec's
``field-id`` properties on every field, ``data_file.partition`` is the
TYPED r102 partition struct (one field per spec field, field-ids
1000+i) rather than a string map, the v2 manifest list carries all
required fields (``min_sequence_number``, added/existing/deleted file
and row counts, per-field ``partitions`` summaries with Appendix-D
single-value bounds), and metadata.json carries the required v2 keys
(``last-partition-id``, ``sort-orders``, ``default-sort-order-id``).
Partition tuple values from hive paths are %XX-unescaped and
``__HIVE_DEFAULT_PARTITION__`` maps to null (ADVICE r9 — mirroring
delta_writer), then cast to the column's Iceberg type for the r102
struct; partition column types outside the typed-struct set
(int/long/string/boolean/float/double) raise loudly rather than
emitting a lossy tuple.

Shape mirrors the Delta writer: the DATA write is Spark's own parallel
parquet writer under ``<table>/data/`` (hive layout when partitioned);
the COMMIT is metadata-only driver work —

- per new file, one ``manifest_entry`` (status ADDED, explicit
  sequence number) whose ``record_count`` comes from the parquet
  FOOTER alone (no data read) and whose partition tuple derives from
  the hive path;
- one new manifest Avro per commit, referenced from a fresh
  manifest-list Avro whose row carries real file/row counts and
  partition bounds (so a planner — ours included, see
  iceberg_reader._manifest_matches — can prune the manifest without
  opening it);
- a new ``vN.metadata.json`` carrying the full snapshot history +
  ``version-hint.text`` bump. ``append`` keeps prior manifests in the
  new manifest list; ``overwrite`` references ONLY the new manifest
  (the REPLACE commit — prior snapshots still time-travel).

Schema mapping is the exact inverse of the reader's ``_spark_type``
(primitives, decimal(P,S), nested struct/list/map with spec field
ids). Read-back through ``io/iceberg_reader.py`` plus
``snapshot_info``'s metadata-count agreement is the conformance check;
``tests/test_iceberg_writer.py`` additionally asserts the emitted Avro
schema shapes against the spec's required-field list.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalake_polygonscan_spark.io.avro import write_avro_file
from datalake_polygonscan_spark.io.delta_reader import _HIVE_NULL, _hive_unescape
from datalake_polygonscan_spark.io.iceberg_reader import encode_bound

_SPARK_TO_ICE = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "binary",
    T.DateType(): "date",
    T.TimestampNTZType(): "timestamp",
    T.TimestampType(): "timestamptz",
}

#: Iceberg primitive -> Avro primitive for the typed r102 partition
#: struct; partition columns outside this set gate loudly (their hive
#: path segments have no faithful typed representation here)
_PARTITION_AVRO_OF = {
    "int": "int", "long": "long", "string": "string",
    "boolean": "boolean", "float": "float", "double": "double",
}


def _ice_type_of(dtype: T.DataType, ids: list) -> object:
    """Spark type -> Iceberg schema-JSON type; ``ids`` allocates the
    spec's unique field/element/key/value ids."""
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision}, {dtype.scale})"
    if isinstance(dtype, T.StructType):
        fields = []
        for f in dtype.fields:
            ids.append(1)
            fid = len(ids)
            fields.append({"id": fid, "name": f.name,
                           "required": not f.nullable,
                           "type": _ice_type_of(f.dataType, ids)})
        return {"type": "struct", "fields": fields}
    if isinstance(dtype, T.ArrayType):
        ids.append(1)
        eid = len(ids)
        return {"type": "list", "element-id": eid,
                "element": _ice_type_of(dtype.elementType, ids),
                "element-required": not dtype.containsNull}
    if isinstance(dtype, T.MapType):
        ids.append(1)
        kid = len(ids)
        ids.append(1)
        vid = len(ids)
        return {"type": "map", "key-id": kid,
                "key": _ice_type_of(dtype.keyType, ids),
                "value-id": vid, "value": _ice_type_of(dtype.valueType, ids),
                "value-required": not dtype.valueContainsNull}
    if dtype in _SPARK_TO_ICE:
        return _SPARK_TO_ICE[dtype]
    raise ValueError(f"iceberg_writer: unsupported Spark type {dtype}")


def _ice_schema_of(schema: T.StructType) -> dict:
    ids: list = []
    fields = []
    for f in schema.fields:
        ids.append(1)
        fid = len(ids)
        fields.append({"id": fid, "name": f.name, "required": not f.nullable,
                       "type": _ice_type_of(f.dataType, ids)})
    return {"schema-id": 0, "type": "struct", "fields": fields}


def manifest_entry_schema(partition_fields: list[tuple[str, str]]) -> str:
    """The v2 ``manifest_entry`` Avro schema with the spec's field-id
    properties and the TYPED r102 partition struct — one nullable
    field per spec field (name, iceberg primitive type), field-ids
    1000+i. ``partition_fields=[]`` yields the spec's empty struct for
    unpartitioned tables."""
    pf = []
    for i, (name, t) in enumerate(partition_fields):
        if t not in _PARTITION_AVRO_OF:
            raise ValueError(
                f"iceberg_writer: partition column {name!r} of type {t!r} "
                "has no typed r102 representation (supported: "
                f"{sorted(_PARTITION_AVRO_OF)})"
            )
        pf.append({"name": name, "type": ["null", _PARTITION_AVRO_OF[t]],
                   "field-id": 1000 + i, "default": None})
    return json.dumps({
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "field-id": 4},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102", "fields": pf}},
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "equality_ids", "field-id": 135,
                     "type": ["null", {"type": "array", "items": "int",
                                       "element-id": 136}]},
                ]}},
        ]})


#: v2 ``manifest_file`` schema (spec "Manifest Lists") — every
#: required field, with field-ids
MANIFEST_LIST_SCHEMA = json.dumps({
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions", "field-id": 507, "type": ["null", {
            "type": "array", "element-id": 508, "items": {
                "type": "record", "name": "r508", "fields": [
                    {"name": "contains_null", "type": "boolean",
                     "field-id": 509},
                    {"name": "contains_nan", "type": ["null", "boolean"],
                     "field-id": 518},
                    {"name": "lower_bound", "type": ["null", "bytes"],
                     "field-id": 510},
                    {"name": "upper_bound", "type": ["null", "bytes"],
                     "field-id": 511},
                ]}}]},
    ]})


def _list_data_files(ddir: str) -> set[str]:
    return {
        os.path.relpath(p, ddir)
        for p in glob.glob(os.path.join(ddir, "**", "*.parquet"), recursive=True)
    }


#: hive helper-column prefix: Spark's partitionBy DROPS partition
#: columns from the data files, but the Iceberg spec requires data
#: files to carry ALL columns — so the writer partitions by DUPLICATED
#: helper columns and keeps the originals in the files
_P = "_p_"


def _partition_tuple(rel: str, partition_cols: list[str]) -> dict:
    """Hive path segments -> {col: unescaped string or None}. %XX
    escapes are undone and ``__HIVE_DEFAULT_PARTITION__`` maps to null
    (ADVICE r9 — delta_writer._partition_values parity; without this,
    values with spaces/colons were stored escaped and a later
    partition_filter silently pruned away matching files)."""
    out = {}
    segs = rel.split(os.sep)
    for col, seg in zip(partition_cols, segs):
        eq = seg.find("=")
        if eq < 0 or seg[:eq] != _P + col:
            raise ValueError(f"iceberg_writer: non-hive data path {rel!r}")
        raw = _hive_unescape(seg[eq + 1:])
        out[col] = None if raw == _HIVE_NULL else raw
    return out


def _typed_partition_value(raw: str | None, t: str):
    """Unescaped hive segment -> the column's Iceberg-typed value for
    the r102 struct."""
    if raw is None:
        return None
    if t in ("int", "long"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        return raw.lower() == "true"
    return raw  # string


def _partition_summaries(
    entries: list[dict], part_fields: list[tuple[str, str]]
) -> list[dict] | None:
    """field_summary rows (contains_null + Appendix-D bounds) over one
    manifest's entries, in spec-field order."""
    if not part_fields:
        return None
    out = []
    for name, t in part_fields:
        vals = [e["data_file"]["partition"].get(name) for e in entries]
        nn = [v for v in vals if v is not None]
        lo = hi = None
        if nn and t in ("int", "long", "string"):
            lo, hi = encode_bound(min(nn), t), encode_bound(max(nn), t)
        out.append({
            "contains_null": any(v is None for v in vals),
            "contains_nan": False,
            "lower_bound": lo, "upper_bound": hi,
        })
    return out


def write_iceberg_table(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as an Iceberg v2 table. Returns {'snapshot_id',
    'sequence_number', 'n_added'}."""
    import pyarrow.parquet as pq

    partition_cols = list(partition_cols or ())
    if mode not in ("overwrite", "append"):
        raise ValueError(f"iceberg_writer: unsupported mode {mode!r}")
    ddir = os.path.join(table_path, "data")
    mdir = os.path.join(table_path, "metadata")
    os.makedirs(mdir, exist_ok=True)

    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        cur_v = int(open(hint).read().strip())
        meta = json.load(open(os.path.join(mdir, f"v{cur_v}.metadata.json")))
    else:
        cur_v = 0
        meta = {
            "format-version": 2,
            "table-uuid": "spark-graft-export",
            "location": table_path,
            "last-sequence-number": 0,
            "last-updated-ms": 0,
            "last-column-id": 0,
            "current-schema-id": 0,
            "schemas": [_ice_schema_of(df.schema)],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": [
                {"name": c, "transform": "identity",
                 "source-id": i + 1, "field-id": 1000 + i}
                for i, c in enumerate(partition_cols)
            ]}],
            "last-partition-id": 999 + len(partition_cols),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "current-snapshot-id": -1,
            "snapshots": [],
        }
        meta["last-column-id"] = max(
            (f["id"] for f in meta["schemas"][0]["fields"]), default=0)

    # typed r102 partition struct needs the partition columns' Iceberg
    # types (from the CURRENT table schema, so append agrees with create)
    schema_types = {
        f["name"]: f["type"] for f in meta["schemas"][
            [s["schema-id"] for s in meta["schemas"]].index(
                meta.get("current-schema-id", 0))]["fields"]
        if isinstance(f["type"], str)
    }
    part_fields = []
    for c in partition_cols:
        t = schema_types.get(c)
        if t is None:
            raise ValueError(
                f"iceberg_writer: partition column {c!r} is not a primitive "
                "column of the table schema")
        part_fields.append((c, t))
    entry_schema = manifest_entry_schema(part_fields)

    before = _list_data_files(ddir) if os.path.isdir(ddir) else set()
    out_df = df
    if partition_cols:
        from pyspark.sql import functions as F

        for c in partition_cols:
            out_df = out_df.withColumn(_P + c, F.col(c))
    writer = out_df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*[_P + c for c in partition_cols])
    writer.parquet(ddir)
    new_files = sorted(_list_data_files(ddir) - before)

    seq = int(meta["last-sequence-number"]) + 1
    sid = seq  # monotone ids; uniqueness is what the spec needs
    entries = []
    for rel in new_files:
        full = os.path.join(ddir, rel)
        raw_tuple = _partition_tuple(rel, partition_cols)
        entries.append({
            "status": 1, "snapshot_id": sid, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0, "file_path": full, "file_format": "PARQUET",
                "partition": {
                    c: _typed_partition_value(raw_tuple[c], t)
                    for c, t in part_fields
                },
                # footer-only: no data pages are read for the count
                "record_count": pq.ParquetFile(full).metadata.num_rows,
                "file_size_in_bytes": os.path.getsize(full),
                "equality_ids": None,
            }})
    mpath = os.path.join(mdir, f"m-{seq:05d}.avro")
    msize = write_avro_file(mpath, entry_schema, entries)
    new_manifest = {
        "manifest_path": mpath, "manifest_length": msize,
        "partition_spec_id": 0, "content": 0,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": sid,
        "added_files_count": len(entries),
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": sum(
            e["data_file"]["record_count"] for e in entries),
        "existing_rows_count": 0, "deleted_rows_count": 0,
        "partitions": _partition_summaries(entries, part_fields),
    }

    prior_manifests: list[dict] = []
    if mode == "append" and meta.get("current-snapshot-id", -1) != -1:
        from datalake_polygonscan_spark.io.avro import read_avro_file

        snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
        cur = snaps[meta["current-snapshot-id"]]
        _, prior = read_avro_file(cur["manifest-list"])
        for m in prior:
            m_seq = int(m.get("sequence_number") or 0)
            prior_manifests.append({
                "manifest_path": m["manifest_path"],
                "manifest_length": int(m.get("manifest_length") or 0),
                "partition_spec_id": int(m.get("partition_spec_id") or 0),
                "content": int(m.get("content") or 0),
                "sequence_number": m_seq,
                "min_sequence_number": int(
                    m.get("min_sequence_number") or m_seq),
                "added_snapshot_id": int(m.get("added_snapshot_id") or 0),
                "added_files_count": int(m.get("added_files_count") or 0),
                "existing_files_count": int(m.get("existing_files_count") or 0),
                "deleted_files_count": int(m.get("deleted_files_count") or 0),
                "added_rows_count": int(m.get("added_rows_count") or 0),
                "existing_rows_count": int(m.get("existing_rows_count") or 0),
                "deleted_rows_count": int(m.get("deleted_rows_count") or 0),
                "partitions": m.get("partitions"),
            })
    ml_path = os.path.join(mdir, f"snap-{sid:05d}.avro")
    write_avro_file(ml_path, MANIFEST_LIST_SCHEMA,
                    prior_manifests + [new_manifest])

    meta["snapshots"] = list(meta["snapshots"]) + [{
        "snapshot-id": sid, "timestamp-ms": seq * 1000,
        "sequence-number": seq, "manifest-list": ml_path,
        "schema-id": meta.get("current-schema-id", 0),
        "summary": {"operation": "append" if mode == "append" else "overwrite"},
    }]
    meta["current-snapshot-id"] = sid
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = seq * 1000
    new_v = cur_v + 1
    # atomic publish: metadata.json then the hint flip
    tmp = os.path.join(mdir, f".v{new_v}.metadata.json.tmp")
    json.dump(meta, open(tmp, "w"))
    os.rename(tmp, os.path.join(mdir, f"v{new_v}.metadata.json"))
    tmp_h = hint + ".tmp"
    open(tmp_h, "w").write(str(new_v))
    os.rename(tmp_h, hint)
    return {"snapshot_id": sid, "sequence_number": seq, "n_added": len(new_files)}
