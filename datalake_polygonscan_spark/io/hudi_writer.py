"""S54 — WRITE-side Apache Hudi Copy-on-Write interop (round 10,
VERDICT r9 'Next round' #8): emit ``hoodie.properties``, completed-
instant timeline commits, and CoW file slices in the spec's layout
(``<fileId>_<writeToken>_<instant>.parquet`` under hive partition
dirs, Hudi meta columns travelling INSIDE the files) so tables this
engine exports are readable by the in-repo foreign reader
(io/hudi_reader.py) and any Hudi engine — closing the write matrix
for all three open formats next to io/delta_writer.py (S52) and
io/iceberg_writer.py (S53).

Commit shapes:

- ``overwrite`` — a fresh table: ``.hoodie/hoodie.properties``
  (COPY_ON_WRITE, table version 6) + one base file PER PARTITION
  (one file group each), then the ``{instant}.commit`` marker —
  data first, marker last, the ordering the reader's completed-
  instant gate relies on for atomicity;
- ``insert`` — NEW file groups (fresh fileIds) holding the new rows,
  visible alongside the existing groups;
- ``upsert`` — the CoW update: file groups containing matched keys
  are REWRITTEN in place (same fileId, new instant — the reader's
  numeric instant order picks the new slice), unmatched keys insert
  as new groups per partition. Untouched groups' files are not
  rewritten — CoW write amplification is proportional to touched
  groups, not table size.

Scale shape: group files are written EXECUTOR-side — every row is
assigned its target file name as a column, and one
``groupBy(file).applyInPandas`` task writes each parquet via pyarrow
(the io/sinks.py blob-writer discipline); the upsert's key->group
resolution is a DataFrame join against the base files' own
``_hoodie_record_key`` + ``_metadata.file_path``, never a driver
loop. Driver work is timeline metadata only.

Records carry the spec's ``_hoodie_commit_time`` /
``_hoodie_record_key`` / ``_hoodie_partition_path`` meta columns
(the subset the MoR merge path needs; pruned on read unless
``keep_meta``). Keys are assumed unique per record and stable in
their partition (Hudi's partition-level index assumption).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN = "0-1-0"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
META_COLS = ("_hoodie_commit_time", "_hoodie_record_key",
             "_hoodie_partition_path")

_PA_OF = None


def _pa_type(dtype: T.DataType):
    import pyarrow as pa

    global _PA_OF
    if _PA_OF is None:
        _PA_OF = {
            T.LongType(): pa.int64(), T.IntegerType(): pa.int32(),
            T.ShortType(): pa.int16(), T.ByteType(): pa.int8(),
            T.DoubleType(): pa.float64(), T.FloatType(): pa.float32(),
            T.StringType(): pa.string(), T.BooleanType(): pa.bool_(),
            T.BinaryType(): pa.binary(), T.DateType(): pa.date32(),
            T.TimestampType(): pa.timestamp("us"),
            T.TimestampNTZType(): pa.timestamp("us"),
        }
    if isinstance(dtype, T.DecimalType):
        return pa.decimal128(dtype.precision, dtype.scale)
    t = _PA_OF.get(dtype)
    if t is None:
        raise ValueError(f"hudi_writer: unsupported column type {dtype}")
    return t


def _next_instant(hdir: str) -> str:
    nums = [
        int(f.split(".")[0]) for f in os.listdir(hdir)
        if f.split(".")[0].isdigit()
    ] if os.path.isdir(hdir) else []
    return f"{(max(nums) + 1) if nums else 1:014d}"


def _file_id_expr(seed: F.Column) -> F.Column:
    """Deterministic uuid-shaped fileId from a seed string — pure JVM
    expression (md5 hex re-grouped), no Python in the row path."""
    h = F.md5(seed)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
        F.substring(h, 17, 4), F.substring(h, 21, 12), F.lit("0"),
    )


def _with_meta(df: DataFrame, key_col: str, partition_col: str,
               instant: str) -> DataFrame:
    pdir = F.when(
        F.col(partition_col).isNull(),
        F.lit(f"{partition_col}={_HIVE_NULL}"),
    ).otherwise(F.concat(F.lit(f"{partition_col}="),
                         F.col(partition_col).cast("string")))
    return (
        df.withColumn("_hoodie_commit_time", F.lit(instant))
        .withColumn("_hoodie_record_key", F.col(key_col).cast("string"))
        .withColumn("_hoodie_partition_path", pdir)
    )


def _write_group_files(df: DataFrame, table_path: str,
                       data_schema: T.StructType) -> list:
    """One executor task per target file: ``__fname``/``__pdir``
    columns address the file, applyInPandas writes it via pyarrow
    under the Spark schema's arrow types (no pandas dtype drift),
    staged dot-name then atomic rename."""
    import pyarrow as pa

    pa_schema = pa.schema([
        (f.name, _pa_type(f.dataType)) for f in data_schema.fields
    ])
    tp = table_path
    names = [f.name for f in data_schema.fields]

    def _write(pdf):
        import os as _os

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        fname = pdf["__fname"].iloc[0]
        pdir = pdf["__pdir"].iloc[0]
        d = _os.path.join(tp, pdir) if pdir else tp
        _os.makedirs(d, exist_ok=True)
        body = (
            pdf[names]
            .sort_values("_hoodie_record_key", kind="mergesort")
            .reset_index(drop=True)
        )
        tmp = _os.path.join(d, "." + fname + ".tmp")
        _pq.write_table(
            _pa.Table.from_pandas(body, schema=pa_schema,
                                  preserve_index=False),
            tmp,
        )
        _os.replace(tmp, _os.path.join(d, fname))
        return _pd.DataFrame({"fname": [fname], "n": [len(body)]})

    return df.groupBy("__fname").applyInPandas(
        _write, "fname string, n long"
    ).collect()


def write_hudi_table(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    partition_col: str,
    key_col: str,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as (or into) a Hudi CoW table. Returns
    {'instant', 'n_written_files', 'n_rows'}."""
    if mode not in ("overwrite", "insert", "upsert"):
        raise ValueError(f"hudi_writer: unsupported mode {mode!r}")
    hdir = os.path.join(table_path, ".hoodie")
    exists = os.path.exists(os.path.join(hdir, "hoodie.properties"))
    if mode == "overwrite":
        import shutil

        shutil.rmtree(table_path, ignore_errors=True)
        os.makedirs(hdir)
        with open(os.path.join(hdir, "hoodie.properties"), "w") as f:
            f.write(
                "hoodie.table.name=spark-graft-export\n"
                "hoodie.table.type=COPY_ON_WRITE\n"
                "hoodie.table.version=6\n"
                f"hoodie.table.recordkey.fields={key_col}\n"
                f"hoodie.table.partition.fields={partition_col}\n"
            )
        exists = False
    elif not exists:
        raise FileNotFoundError(
            f"hudi_writer: no table at {table_path} to {mode} into")
    instant = _next_instant(hdir)

    stamped = _with_meta(df, key_col, partition_col, instant)
    data_schema = stamped.schema

    if mode in ("overwrite", "insert"):
        out = stamped.withColumn(
            "__pdir", F.col("_hoodie_partition_path")
        ).withColumn(
            "__fname",
            F.concat(
                _file_id_expr(F.concat(F.col("_hoodie_partition_path"),
                                       F.lit("#"), F.lit(instant))),
                F.lit(f"_{_TOKEN}_{instant}.parquet"),
            ),
        )
        stats = _write_group_files(out, table_path, data_schema)
    else:  # upsert: rewrite touched groups, insert the rest
        from datalake_polygonscan_spark.io.hudi_reader import _resolve_slices

        _done, slices = _resolve_slices(table_path, None)
        base_paths = sorted(s.base_path for s in slices if s.base_path)
        if any(s.logs for s in slices):
            raise ValueError(
                "hudi_writer: upsert into a MoR (log-bearing) table is not "
                "supported by this CoW writer")
        old = (
            spark.read.parquet(*base_paths)
            .withColumn("__bn", F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1))
            .withColumn("__fid", F.substring_index(F.col("__bn"), "_", 1))
            .drop("__bn")
        )
        new_keys = stamped.select(
            F.col("_hoodie_record_key").alias("__k")).distinct()
        # groups holding matched keys -> rewritten; tiny collect (one
        # row per TOUCHED file group, the set any CoW writer must know)
        touched = [
            r["__fid"] for r in old
            .join(new_keys, old["_hoodie_record_key"] == new_keys["__k"],
                  "left_semi")
            .select("__fid").distinct().collect()
        ]
        matched_map = (
            old.filter(F.col("__fid").isin(touched))
            .select(F.col("_hoodie_record_key").alias("__k"),
                    "__fid").distinct()
        )
        survivors = (
            old.filter(F.col("__fid").isin(touched))
            .join(new_keys, old["_hoodie_record_key"] == new_keys["__k"],
                  "left_anti")
            .select(*[f.name for f in data_schema.fields], "__fid")
        )
        new_rows = stamped.join(
            matched_map,
            stamped["_hoodie_record_key"] == matched_map["__k"], "left",
        ).drop("__k")
        matched_new = new_rows.filter(F.col("__fid").isNotNull())
        inserts = new_rows.filter(F.col("__fid").isNull()).drop("__fid")

        rewrite = survivors.unionByName(matched_new).withColumn(
            "__pdir", F.col("_hoodie_partition_path")
        ).withColumn(
            "__fname",
            F.concat(F.col("__fid"), F.lit(f"_{_TOKEN}_{instant}.parquet")),
        )
        ins_out = inserts.withColumn(
            "__pdir", F.col("_hoodie_partition_path")
        ).withColumn(
            "__fname",
            F.concat(
                _file_id_expr(F.concat(F.col("_hoodie_partition_path"),
                                       F.lit("#ins#"), F.lit(instant))),
                F.lit(f"_{_TOKEN}_{instant}.parquet"),
            ),
        )
        sel = [f.name for f in data_schema.fields] + ["__pdir", "__fname"]
        stats = _write_group_files(
            rewrite.select(sel).unionByName(ins_out.select(sel)),
            table_path, data_schema,
        )

    # marker LAST: the commit becomes visible atomically
    op = {"overwrite": "BULK_INSERT", "insert": "INSERT",
          "upsert": "UPSERT"}[mode]
    tmp = os.path.join(hdir, f".{instant}.commit.tmp")
    with open(tmp, "w") as f:
        json.dump({"operationType": op,
                   "writeStats": [{"fileName": s.fname, "numWrites": s.n}
                                  for s in sorted(stats)]}, f)
    os.replace(tmp, os.path.join(hdir, f"{instant}.commit"))
    return {
        "instant": instant,
        "n_written_files": len(stats),
        "n_rows": int(sum(s.n for s in stats)),
    }
