"""S53 — WRITE-side Apache Iceberg v2 interop: emit a conformant
metadata tree (metadata.json + manifest-list/manifest Avro, both
composed by the in-repo from-scratch Avro encoder) so tables this
engine exports can be read by any Iceberg engine — the Iceberg twin of
``io/delta_writer.py`` (S52), completing the round-9 story that
foreign-format interop goes both directions.

Shape mirrors the Delta writer: the DATA write is Spark's own parallel
parquet writer under ``<table>/data/`` (hive layout when partitioned);
the COMMIT is metadata-only driver work —

- per new file, one ``manifest_entry`` (status ADDED, explicit
  sequence number) whose ``record_count`` comes from the parquet
  FOOTER alone (no data read) and whose partition tuple derives from
  the hive path;
- one new manifest Avro per commit, referenced from a fresh
  manifest-list Avro;
- a new ``vN.metadata.json`` carrying the full snapshot history +
  ``version-hint.text`` bump. ``append`` keeps prior manifests in the
  new manifest list; ``overwrite`` references ONLY the new manifest
  (the REPLACE commit — prior snapshots still time-travel).

Schema mapping is the exact inverse of the reader's ``_spark_type``
(primitives, decimal(P,S), nested struct/list/map with spec field
ids). Read-back through ``io/iceberg_reader.py`` plus
``snapshot_info``'s metadata-count agreement is the conformance check.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalake_polygonscan_spark.io.avro import write_avro_file
from datalake_polygonscan_spark.io.iceberg_reader import (
    _MANIFEST_ENTRY_SCHEMA,
    _MANIFEST_FILE_SCHEMA,
)

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


def _partition_tuple(rel: str, partition_cols: list[str]) -> dict | None:
    if not partition_cols:
        return None
    out = {}
    segs = rel.split(os.sep)
    for col, seg in zip(partition_cols, segs):
        eq = seg.find("=")
        if eq < 0 or seg[:eq] != _P + col:
            raise ValueError(f"iceberg_writer: non-hive data path {rel!r}")
        out[col] = seg[eq + 1:]
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
            "current-snapshot-id": -1,
            "snapshots": [],
        }

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
        entries.append({
            "status": 1, "snapshot_id": sid, "sequence_number": seq,
            "data_file": {
                "content": 0, "file_path": full, "file_format": "PARQUET",
                "partition": _partition_tuple(rel, partition_cols),
                # footer-only: no data pages are read for the count
                "record_count": pq.ParquetFile(full).metadata.num_rows,
                "file_size_in_bytes": os.path.getsize(full),
                "equality_ids": None,
            }})
    mpath = os.path.join(mdir, f"m-{seq:05d}.avro")
    msize = write_avro_file(mpath, _MANIFEST_ENTRY_SCHEMA, entries)
    new_manifest = {"manifest_path": mpath, "manifest_length": msize,
                    "partition_spec_id": 0, "content": 0,
                    "sequence_number": seq, "added_snapshot_id": sid}

    prior_manifests: list[dict] = []
    if mode == "append" and meta.get("current-snapshot-id", -1) != -1:
        from datalake_polygonscan_spark.io.avro import read_avro_file

        snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
        cur = snaps[meta["current-snapshot-id"]]
        _, prior_manifests = read_avro_file(cur["manifest-list"])
        prior_manifests = [
            {k: m.get(k) for k in ("manifest_path", "manifest_length",
                                   "partition_spec_id", "content",
                                   "sequence_number", "added_snapshot_id")}
            for m in prior_manifests
        ]
    ml_path = os.path.join(mdir, f"snap-{sid:05d}.avro")
    write_avro_file(ml_path, _MANIFEST_FILE_SCHEMA,
                    prior_manifests + [new_manifest])

    meta["snapshots"] = list(meta["snapshots"]) + [{
        "snapshot-id": sid, "timestamp-ms": seq * 1000,
        "sequence-number": seq, "manifest-list": ml_path,
        "summary": {"operation": "append" if mode == "append" else "overwrite"},
    }]
    meta["current-snapshot-id"] = sid
    meta["last-sequence-number"] = seq
    new_v = cur_v + 1
    # atomic publish: metadata.json then the hint flip
    tmp = os.path.join(mdir, f".v{new_v}.metadata.json.tmp")
    json.dump(meta, open(tmp, "w"))
    os.rename(tmp, os.path.join(mdir, f"v{new_v}.metadata.json"))
    tmp_h = hint + ".tmp"
    open(tmp_h, "w").write(str(new_v))
    os.rename(tmp_h, hint)
    return {"snapshot_id": sid, "sequence_number": seq, "n_added": len(new_files)}
