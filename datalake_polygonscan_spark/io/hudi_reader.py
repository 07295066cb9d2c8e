"""S50 — a foreign-table reader for APACHE HUDI Copy-on-Write tables,
from the public Hudi spec (hudi.apache.org/tech-specs): no hudi
runtime, no bundle jar. Completes the open-table-format interop
triptych next to S47 (Delta) and S48 (Iceberg).

Hudi's layout (spec "Timeline" / "File Layout"):

    <table>/.hoodie/hoodie.properties          table config
    <table>/.hoodie/<instant>.commit           completed commit (JSON)
    <table>/.hoodie/<instant>.commit.requested / .inflight
                                               in-progress states
    <partition>/<fileId>_<writeToken>_<instant>.parquet
                                               one FILE SLICE of a
                                               file group

Copy-on-Write snapshot resolution: every update rewrites a file
group's parquet in place under a NEW instant, so the live snapshot is,
per (partition, fileId) file group, the slice with the LATEST
COMPLETED instant — base files whose instant never completed (an
``.inflight`` crash leftover) are invisible, which is Hudi's
atomicity story and is verified here. Time travel (``as_of``
instant) is the same resolution over the timeline prefix.

Newer Hudi versions name completed instants
``<instant>_<completionTime>.commit``; both forms parse.

MERGE-ON-READ (round 9, VERDICT r8 'Next round' #3 — MoR is Hudi's
default for streaming ingest): a file slice may carry ``.log`` delta
files (``.<fileId>_<baseInstant>.log.<version>``, completed by
``.deltacommit`` timeline actions). The log block codec lives in
``io/hudi_log.py`` (spec-faithful frame format; avro data blocks
decoded by the in-repo from-scratch Avro layer). Snapshot = per
(file group, ``_hoodie_record_key``), the LATEST record across base
file and log blocks ordered by (instant, log version, block, record);
records flagged ``_hoodie_is_deleted`` drop (the payload-level delete
convention); blocks of never-completed deltacommits and blocks rolled
back by a command block stay invisible. Log-only file groups (MoR
insert-into-log) resolve without a base file. Unsupported block types
(hfile/parquet/kryo delete blocks) gate loudly at PLANNING time via a
content-skipping frame walk. The in-repo MoR ladder S15/S18/S34/S35
provides these semantics natively for this engine's own tables.

Scale: timeline listing + filename parsing is metadata-only driver
work, O(commits + files); the data scan is a plain parallel parquet
read. Log files decode EXECUTOR-side (one task per log file, Arrow
batches out of mapInPandas), and base files of groups without logs
bypass the merge — the merge shuffle is proportional to log-bearing
groups, not table size. Hudi's meta columns (``_hoodie_commit_time``,
``_hoodie_record_key``, ...) travel inside the parquet files and are
projected out unless ``keep_meta=True``.
"""

from __future__ import annotations

from datalake_polygonscan_spark.tables import tiny_df  # noqa: E402

import glob
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession


class HudiProtocolError(RuntimeError):
    """Table requires reader capabilities this resolver lacks."""


#: base-file name: <fileId>_<writeToken>_<instantTime>.parquet
#: (fileId is a uuid-with-dashes plus an optional -<index> suffix)
_BASE_FILE_RE = re.compile(r"^(?P<fid>[^_]+)_(?P<token>[^_]+)_(?P<instant>\d+)\.parquet$")

HOODIE_META_COLS = (
    "_hoodie_commit_time", "_hoodie_commit_seqno", "_hoodie_record_key",
    "_hoodie_partition_path", "_hoodie_file_name",
)


def _completed_instants(table_path: str) -> list[str]:
    """Completed instants from the timeline, sorted ascending numeric.
    Accepts ``<instant>.commit`` (CoW) and ``<instant>.deltacommit``
    (MoR log writes), each also in the 1.x
    ``<instant>_<completion>.<action>`` form."""
    out = []
    for action in ("commit", "deltacommit"):
        for p in glob.glob(os.path.join(table_path, ".hoodie", f"*.{action}")):
            stem = os.path.basename(p)[: -(len(action) + 1)]
            instant = stem.split("_", 1)[0]
            if instant.isdigit():
                out.append(instant)
    if not out:
        raise FileNotFoundError(f"no completed commits under {table_path}/.hoodie")
    return sorted(out, key=int)


#: log-file name: .<fileId>_<baseInstant>.log.<version>[_<writeToken>]
#: (hidden dot-file, per the spec's file layout)
_LOG_FILE_RE = re.compile(
    r"^\.(?P<fid>.+)_(?P<base>\d+)\.log\.(?P<version>\d+)(?:_(?P<token>.+))?$"
)


class _Slice:
    __slots__ = ("group", "base_instant", "base_path", "logs")

    def __init__(self, group, base_instant, base_path):
        self.group = group                  # "partition/fileId"
        self.base_instant = base_instant    # instant string
        self.base_path = base_path          # None for log-only slices
        self.logs: list[tuple[int, str]] = []  # (log version, path)


def _resolve_slices(table_path: str, as_of: str | None):
    """-> (done: set[str], slices: list[_Slice]). Per (partition,
    fileId) file group, the live slice is the base file with the
    LATEST COMPLETED instant plus the log files attached to THAT base
    instant (older-slice logs were superseded by compaction); a file
    group with logs but no base file is a LOG-ONLY slice (MoR
    insert-into-log). Unsupported log block types gate loudly at
    planning time via a content-skipping frame walk."""
    from datalake_polygonscan_spark.io.hudi_log import (
        AVRO_DATA_BLOCK,
        COMMAND_BLOCK,
        HudiLogFormatError,
        scan_log_block_headers,
    )

    done = set(_completed_instants(table_path))
    if as_of is not None:
        # numeric comparison: instants are 14-digit (second) or
        # 17-digit (millisecond) timestamps depending on Hudi version;
        # lexicographic compare misorders mixed widths
        done = {i for i in done if int(i) <= int(as_of)}
        if not done:
            raise ValueError(f"hudi_reader: no commits at or before {as_of}")
    bases: dict[tuple[str, str], tuple[str, str]] = {}
    logs: dict[tuple[str, str, str], list[tuple[int, str]]] = {}
    # logs are HIDDEN dot-files; glob skips leading dots, so walk.
    # Prune the .hoodie subtree IN PLACE: Hudi's internal metadata
    # table (.hoodie/metadata) is itself MoR and is not table data.
    for root, dirs, names in os.walk(table_path):
        if os.path.basename(root) == ".hoodie":
            dirs[:] = []
            continue
        rel_dir = os.path.relpath(root, table_path)
        rel_dir = "" if rel_dir == "." else rel_dir
        for n in names:
            p = os.path.join(root, n)
            m = _BASE_FILE_RE.match(n)
            if m:
                instant = m.group("instant")
                if instant not in done:  # inflight/failed: invisible
                    continue
                key = (rel_dir, m.group("fid"))
                cur = bases.get(key)
                if cur is None or int(instant) > int(cur[0]):
                    bases[key] = (instant, p)
                continue
            lm = _LOG_FILE_RE.match(n)
            if lm:
                # planning-time capability gate: every block type must
                # be implemented, or the scan would silently drop rows
                for btype, _hdr in scan_log_block_headers(p):
                    if btype not in (AVRO_DATA_BLOCK, COMMAND_BLOCK):
                        raise HudiProtocolError(
                            f"unsupported log block type {btype} in {n} "
                            "(this reader implements avro data + rollback "
                            "command blocks)"
                        )
                logs.setdefault(
                    (rel_dir, lm.group("fid"), lm.group("base")), []
                ).append((int(lm.group("version")), p))
    slices: list[_Slice] = []
    for (part, fid), (instant, path) in bases.items():
        s = _Slice(f"{part}/{fid}", instant, path)
        collected = list(logs.pop((part, fid, instant), []))
        # ADVICE r9: logs keyed to a NEWER base instant than the
        # chosen COMPLETED one belong to a PENDING compaction (their
        # base parquet is not yet committed) — their records must
        # merge onto the completed base, not silently vanish. Logs
        # keyed OLDER stay dropped: genuinely compacted away.
        for key in [k for k in list(logs)
                    if k[0] == part and k[1] == fid
                    and int(k[2]) > int(instant)]:
            collected.extend(logs.pop(key))
        s.logs = sorted(collected)
        slices.append(s)
    for (part, fid, base_instant), lpaths in logs.items():
        if (part, fid) in bases:
            continue  # superseded slice's logs (compacted away)
        s = _Slice(f"{part}/{fid}", base_instant, None)
        s.logs = sorted(lpaths)
        slices.append(s)
    return done, slices


def read_hudi_table(
    spark: SparkSession,
    table_path: str,
    as_of: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Scan the live snapshot (or the snapshot as of a timeline
    instant). Copy-on-Write slices are a plain parallel parquet read;
    Merge-on-Read slices (base + ``.log`` deltas) are merged at read
    time by :func:`_merge_on_read` — latest writer wins per record
    key, ``_hoodie_is_deleted`` rows drop."""
    done, slices = _resolve_slices(table_path, as_of)
    base_paths = sorted(s.base_path for s in slices if s.base_path)
    log_slices = [s for s in slices if s.logs]
    if not base_paths and not log_slices:
        raise FileNotFoundError(f"hudi_reader: no live file slices in {table_path}")
    if not log_slices:
        df = spark.read.parquet(*base_paths)
    else:
        df = _merge_on_read(spark, done, slices)
    if not keep_meta:
        df = df.drop(*[c for c in HOODIE_META_COLS if c in df.columns])
    return df


def _merge_on_read(spark: SparkSession, done: set, slices: list) -> DataFrame:
    """MoR snapshot = per (file group, record key), the LATEST record
    across the base file and its log blocks, ordered by (instant, log
    version, block index, record index); records flagged
    ``_hoodie_is_deleted`` drop.

    Scale shape: log files decode executor-side (one task per log
    file, Arrow-batched out of ``mapInPandas``); base files of groups
    WITHOUT logs never enter the merge — they bypass as a plain scan,
    so the merge shuffle is proportional to log-bearing groups, not
    table size. The only shuffle is the per-(group, key) window over
    touched groups + log records."""
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    base_paths = sorted(s.base_path for s in slices if s.base_path)
    log_slices = [s for s in slices if s.logs]

    if base_paths:
        base = spark.read.parquet(*base_paths)
        schema = base.schema
    else:
        # log-only table: schema from the first data block's header
        from datalake_polygonscan_spark.io.avro import avro_json_to_ddl
        from datalake_polygonscan_spark.io.hudi_log import (
            AVRO_DATA_BLOCK,
            SCHEMA,
            scan_log_block_headers,
        )

        base = None
        schema_json = None
        for s in log_slices:
            for _v, p in s.logs:
                for btype, hdr in scan_log_block_headers(p):
                    if btype == AVRO_DATA_BLOCK and SCHEMA in hdr:
                        schema_json = hdr[SCHEMA]
                        break
                if schema_json:
                    break
            if schema_json:
                break
        if schema_json is None:
            raise HudiProtocolError("log-only table with no data blocks")
        schema = T._parse_datatype_string(avro_json_to_ddl(schema_json))
    cols = schema.fieldNames()
    if "_hoodie_record_key" not in cols:
        raise HudiProtocolError(
            "MoR merge needs the _hoodie_record_key meta column in the data"
        )

    stamp_fields = [
        T.StructField("__group", T.StringType()),
        T.StructField("__i", T.LongType()),
        T.StructField("__v", T.LongType()),
        T.StructField("__b", T.LongType()),
        T.StructField("__r", T.LongType()),
    ]
    out_schema = T.StructType(list(schema.fields) + stamp_fields)

    # executor-side log decode: one input row (and one task) per file
    units = [
        (p, s.group, int(v))
        for s in log_slices
        for v, p in s.logs
    ]
    units_df = tiny_df(
        spark, units, "path string, group string, version long", slices=len(units)
    )
    done_set = frozenset(done)
    colnames = list(out_schema.fieldNames())

    def _parse(batches):
        from datalake_polygonscan_spark.io.hudi_log import read_log_records

        for pdf in batches:
            for path, group, version in pdf.itertuples(index=False):
                recs = read_log_records(
                    open(path, "rb").read(), done_set, path
                )
                if not recs:
                    continue
                rows = [
                    {**r, "__group": group, "__i": int(inst),
                     "__v": int(version), "__b": bi, "__r": ri}
                    for inst, bi, ri, r in recs
                ]
                yield pd.DataFrame(rows, columns=colnames)

    log_df = units_df.mapInPandas(_parse, out_schema)

    log_groups = sorted({s.group for s in log_slices})
    merged_src = log_df
    untouched = None
    if base is not None:
        bn_rows = [
            (os.path.basename(s.base_path), s.group, int(s.base_instant))
            for s in slices if s.base_path
        ]
        touched_bns = {bn for bn, g, _i in bn_rows if g in set(log_groups)}
        base_bn = base.withColumn(
            "__bn", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
        )
        # groups without logs bypass the merge shuffle entirely
        untouched = base_bn.filter(
            ~F.col("__bn").isin(sorted(touched_bns))
        ).select(cols)
        if touched_bns:
            bm = F.broadcast(tiny_df(
                spark,
                [r for r in bn_rows if r[0] in touched_bns],
                "__bn string, __group string, __i long",
            ))
            base_touched = (
                base_bn.filter(F.col("__bn").isin(sorted(touched_bns)))
                .join(bm, "__bn")
                .select(
                    *cols, "__group", "__i",
                    F.lit(-1).cast("long").alias("__v"),
                    F.lit(-1).cast("long").alias("__b"),
                    F.lit(-1).cast("long").alias("__r"),
                )
            )
            merged_src = base_touched.unionByName(log_df)

    w = Window.partitionBy("__group", "_hoodie_record_key").orderBy(
        F.desc("__i"), F.desc("__v"), F.desc("__b"), F.desc("__r")
    )
    latest = (
        merged_src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    if "_hoodie_is_deleted" in cols:
        latest = latest.filter(
            ~F.coalesce(F.col("_hoodie_is_deleted"), F.lit(False))
        )
    merged = latest.select(cols)
    return merged if untouched is None else untouched.unionByName(merged)


def timeline_info(table_path: str, as_of: str | None = None) -> dict:
    """Metadata-only: completed instants and live file-slice count."""
    instants = _completed_instants(table_path)
    _done, slices = _resolve_slices(table_path, as_of)
    return {
        "n_commits": len(instants),
        "latest_instant": instants[-1],
        "n_live_slices": len(slices),
        "n_log_files": sum(len(s.logs) for s in slices),
    }


# ---------------------------------------------------------------------------
# Fixture writer: compose a SPEC-FAITHFUL foreign CoW table by hand
# ---------------------------------------------------------------------------


def write_foreign_hudi_fixture(
    spark: SparkSession, df: DataFrame, table_path: str,
    partition_col: str, key_col: str,
) -> dict:
    """Stand-in for 'a table some other Hudi engine wrote'. Timeline:

      instant 001: inserts — one file group per partition (all rows,
                   value as written)
      instant 002: UPSERT rewriting partition-0's file group in place
                   (same fileId, new instant; affected rows' value
                   doubled) — the Copy-on-Write update
      instant 003: an ``.inflight`` leftover plus its orphan base file
                   (value zeroed) that must stay INVISIBLE

    Hudi meta columns travel inside the parquet files, as the spec
    requires.
    """
    import shutil
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    shutil.rmtree(table_path, ignore_errors=True)
    hdir = os.path.join(table_path, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.name=fixture\nhoodie.table.type=COPY_ON_WRITE\n"
        "hoodie.table.version=6\n"
    )

    pvals = sorted(
        (r[0] for r in df.select(partition_col).distinct().collect()), key=str
    )
    file_ids = {pv: f"{_uuid.UUID(int=i + 1)}-0" for i, pv in enumerate(pvals)}

    def write_slice(sub: DataFrame, pv, instant: str) -> str:
        part_dir = os.path.join(table_path, f"{partition_col}={pv}")
        os.makedirs(part_dir, exist_ok=True)
        name = f"{file_ids[pv]}_0-1-0_{instant}.parquet"
        pdf = (
            sub.withColumn("_hoodie_commit_time", F.lit(instant))
            .withColumn("_hoodie_record_key", F.col(key_col).cast("string"))
            .withColumn("_hoodie_partition_path", F.lit(f"{partition_col}={pv}"))
            .toPandas()
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(part_dir, name),
        )
        return name

    def commit(instant: str, completed: bool = True) -> None:
        if completed:
            json.dump({"operationType": "UPSERT"},
                      open(os.path.join(hdir, f"{instant}.commit"), "w"))
        else:
            open(os.path.join(hdir, f"{instant}.commit.inflight"), "w").write("")

    for pv in pvals:
        write_slice(df.filter(F.col(partition_col) == pv), pv, "001")
    commit("001")
    # CoW upsert: rewrite partition-0's whole file group under 002
    pv0 = pvals[0]
    upd = df.filter(F.col(partition_col) == pv0).withColumn(
        "value", F.col("value") * 2
    )
    write_slice(upd, pv0, "002")
    commit("002")
    # crash leftover: orphan base file + inflight marker, NOT completed
    junk = df.filter(F.col(partition_col) == pv0).withColumn("value", F.lit(0.0))
    write_slice(junk, pv0, "003")
    commit("003", completed=False)
    return {"partitions": [str(v) for v in pvals], "updated_partition": str(pv0)}


def write_foreign_hudi_mor_fixture(
    spark: SparkSession, df: DataFrame, table_path: str,
    partition_col: str, key_col: str,
    insert_key: int = 9001, log_only_keys: tuple[int, int] = (9100, 9105),
) -> dict:
    """Stand-in for 'a Merge-on-Read table a streaming Hudi writer
    wrote' (VERDICT r8 'Next round' #3 — MoR is Hudi's default for
    streaming ingest). Timeline:

      001 .commit       base file per partition (one file group each)
      002 .deltacommit  log block on partition-0's group: UPDATE rows
                        key%4==0 (value*3) + INSERT ``insert_key``;
                        plus a LOG-ONLY new file group in partition-1
                        with keys ``log_only_keys`` (callers must pick
                        keys that do not collide with existing ones)
      003 .deltacommit  second block in the same log: DELETE rows
                        key%6==0 of partition 0 (_hoodie_is_deleted)
      004 (inflight)    a junk block (values zeroed) whose deltacommit
                        never completed — must stay INVISIBLE

    Returns the touched key sets for oracle construction.
    """
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datalake_polygonscan_spark.io.avro import schema_to_avro_json
    from datalake_polygonscan_spark.io.hudi_log import write_avro_data_block

    shutil.rmtree(table_path, ignore_errors=True)
    hdir = os.path.join(table_path, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.name=fixture\nhoodie.table.type=MERGE_ON_READ\n"
        "hoodie.table.version=6\n"
    )

    full = (
        df.withColumn("_hoodie_commit_time", F.lit("001"))
        .withColumn("_hoodie_record_key", F.col(key_col).cast("string"))
        .withColumn("_hoodie_partition_path",
                    F.concat(F.lit(f"{partition_col}="), F.col(partition_col)))
        .withColumn("_hoodie_is_deleted", F.lit(False))
    )
    schema_json = schema_to_avro_json(full.schema)
    cols = full.schema.fieldNames()

    # ONE Spark job: the whole fixture input lands driver-side as a
    # single Arrow transfer, and every base file / log block derives
    # from pandas slices of it (optimization round 10: the previous
    # shape ran one filtered scan per partition for the base files plus
    # one collect per log block — ~12 jobs re-scanning the source; a
    # fixture builder's cost is all fixed overhead, so it is all
    # driver-side by design).
    pdf_full = full.toPandas()
    pvals = sorted(pdf_full[partition_col].drop_duplicates().tolist(), key=str)
    import uuid as _uuid

    file_ids = {pv: f"{_uuid.UUID(int=i + 1)}-0" for i, pv in enumerate(pvals)}

    arrow_schema = pa.Schema.from_pandas(pdf_full, preserve_index=False)
    for pv in pvals:
        part_dir = os.path.join(table_path, f"{partition_col}={pv}")
        os.makedirs(part_dir, exist_ok=True)
        part_pdf = pdf_full[pdf_full[partition_col] == pv]
        pq.write_table(
            pa.Table.from_pandas(
                part_pdf, schema=arrow_schema, preserve_index=False
            ),
            os.path.join(part_dir, f"{file_ids[pv]}_0-1-0_001.parquet"),
        )
    json.dump({"operationType": "UPSERT"},
              open(os.path.join(hdir, "001.commit"), "w"))

    int_cols = {
        f.name for f in full.schema.fields
        if isinstance(f.dataType, (T.ByteType, T.ShortType,
                                   T.IntegerType, T.LongType))
    }

    def rows_of(sub_pdf, **overrides):
        """pandas slice -> avro-encodable row dicts (numpy scalars to
        python natives; NaN/NaT to None), with column overrides applied
        per row. Container-valued cells (list/tuple/dict/ndarray) skip
        the pd.isna scalar check, and integer-typed Avro fields are
        coerced back from the float64 that Arrow toPandas produces for
        nullable long columns containing NULLs."""
        recs = []
        for rec in sub_pdf[cols].to_dict("records"):
            out = {}
            for c, v in rec.items():
                if (isinstance(v, (list, tuple, dict))
                        or getattr(v, "ndim", 0) > 0):
                    out[c] = v
                elif v is None or pd.isna(v):
                    out[c] = None
                elif isinstance(v, pd.Timestamp):
                    out[c] = v.to_pydatetime()
                elif hasattr(v, "item"):
                    v = v.item()
                    out[c] = int(v) if c in int_cols and isinstance(v, float) else v
                elif c in int_cols and isinstance(v, float):
                    out[c] = int(v)
                else:
                    out[c] = v
            out.update(overrides)
            recs.append(out)
        return recs

    other_cols = [
        c for c in df.columns if c not in (key_col, partition_col, "value")
    ]

    def synth_row(key: int, pv, value: float, commit: str) -> dict:
        return {
            key_col: key,
            **{c: None for c in other_cols},
            partition_col: pv,
            "value": value,
            "_hoodie_commit_time": commit,
            "_hoodie_record_key": str(key),
            "_hoodie_partition_path": f"{partition_col}={pv}",
            "_hoodie_is_deleted": False,
        }

    pv0, pv1 = pvals[0], pvals[1]
    p0 = pdf_full[pdf_full[partition_col] == pv0]
    # 002: updates (value*3 on key%4==0) + one insert, one avro block
    upd = p0[p0[key_col] % 4 == 0].assign(value=lambda x: x["value"] * 3)
    blk_002 = write_avro_data_block(
        "002", schema_json,
        rows_of(upd, _hoodie_commit_time="002")
        + [synth_row(insert_key, pv0, 42.0, "002")],
    )
    # 003: deletes (key%6==0) as _hoodie_is_deleted markers
    blk_003 = write_avro_data_block(
        "003", schema_json,
        rows_of(p0[p0[key_col] % 6 == 0],
                _hoodie_commit_time="003", _hoodie_is_deleted=True),
    )
    # 004: junk that must stay invisible (deltacommit only inflight)
    blk_004 = write_avro_data_block(
        "004", schema_json,
        rows_of(p0.assign(value=0.0), _hoodie_commit_time="004"),
    )
    log0 = os.path.join(table_path, f"{partition_col}={pv0}",
                        f".{file_ids[pv0]}_001.log.1_0-1-0")
    open(log0, "wb").write(blk_002 + blk_003 + blk_004)

    # log-only file group in partition 1 (MoR insert-into-log)
    fid_new = f"{_uuid.UUID(int=99)}-0"
    ins2 = [
        synth_row(k, pv1, k * 1.0, "002") for k in range(*log_only_keys)
    ]
    log1 = os.path.join(table_path, f"{partition_col}={pv1}",
                        f".{fid_new}_002.log.1_0-1-0")
    open(log1, "wb").write(write_avro_data_block("002", schema_json, ins2))

    json.dump({"operationType": "UPSERT"},
              open(os.path.join(hdir, "002.deltacommit"), "w"))
    json.dump({"operationType": "UPSERT"},
              open(os.path.join(hdir, "003.deltacommit"), "w"))
    open(os.path.join(hdir, "004.deltacommit.inflight"), "w").write("")

    return {
        "partitions": [str(v) for v in pvals],
        "updated_partition": str(pv0),
        "log_only_partition": str(pv1),
        "inserted_keys": [insert_key] + list(range(*log_only_keys)),
    }
