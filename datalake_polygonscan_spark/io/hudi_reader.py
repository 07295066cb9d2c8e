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
``<instant>_<completionTime>.commit``; both forms parse. MOR tables
(``.log`` delta files) are NOT implemented — their presence raises
loudly (the reader-capability discipline of S47/S48; the in-repo MoR
ladder S15/S18/S34/S35 provides those semantics natively).

Scale: timeline listing + filename parsing is metadata-only driver
work, O(commits + files); the data scan is a plain parallel parquet
read. Hudi's meta columns (``_hoodie_commit_time``,
``_hoodie_record_key``, ...) travel inside the parquet files and are
projected out unless ``keep_meta=True``.
"""

from __future__ import annotations

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
    """Completed commit instants from the timeline, sorted ascending.
    Accepts both ``<instant>.commit`` and the 1.x
    ``<instant>_<completion>.commit`` forms."""
    out = []
    for p in glob.glob(os.path.join(table_path, ".hoodie", "*.commit")):
        stem = os.path.basename(p)[: -len(".commit")]
        instant = stem.split("_", 1)[0]
        if instant.isdigit():
            out.append(instant)
    if not out:
        raise FileNotFoundError(f"no completed commits under {table_path}/.hoodie")
    return sorted(out, key=int)


def _live_slices(table_path: str, as_of: str | None) -> list[str]:
    done = set(_completed_instants(table_path))
    if as_of is not None:
        # numeric comparison: instants are 14-digit (second) or
        # 17-digit (millisecond) timestamps depending on Hudi version;
        # lexicographic compare misorders mixed widths
        done = {i for i in done if int(i) <= int(as_of)}
        if not done:
            raise ValueError(f"hudi_reader: no commits at or before {as_of}")
    # MoR delta logs may be HIDDEN dot-files (.<fileId>_<instant>.log.N);
    # glob skips leading dots, so walk explicitly. Prune the .hoodie
    # subtree IN PLACE: Hudi's internal metadata table
    # (.hoodie/metadata, default-enabled in modern Hudi) is itself MoR
    # with .log files and must not trip the gate for a CoW data table.
    for root, dirs, names in os.walk(table_path):
        if os.path.basename(root) == ".hoodie":
            dirs[:] = []
            continue
        for n in names:
            if ".log." in n:
                raise HudiProtocolError(
                    "Merge-on-Read log files present; this reader implements "
                    "Copy-on-Write only"
                )
    latest: dict[tuple[str, str], tuple[str, str]] = {}
    for p in glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(p, table_path)
        if rel.startswith(".hoodie" + os.sep):
            continue
        m = _BASE_FILE_RE.match(os.path.basename(p))
        if not m:
            continue
        instant = m.group("instant")
        if instant not in done:  # inflight/failed write: invisible
            continue
        key = (os.path.dirname(rel), m.group("fid"))
        cur = latest.get(key)
        if cur is None or int(instant) > int(cur[0]):
            latest[key] = (instant, p)
    return [p for _i, p in latest.values()]


def read_hudi_table(
    spark: SparkSession,
    table_path: str,
    as_of: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Scan the live Copy-on-Write snapshot (or the snapshot as of a
    timeline instant)."""
    paths = sorted(_live_slices(table_path, as_of))
    if not paths:
        raise FileNotFoundError(f"hudi_reader: no live base files in {table_path}")
    df = spark.read.parquet(*paths)
    if not keep_meta:
        df = df.drop(*[c for c in HOODIE_META_COLS if c in df.columns])
    return df


def timeline_info(table_path: str, as_of: str | None = None) -> dict:
    """Metadata-only: completed instants and live file-slice count."""
    instants = _completed_instants(table_path)
    return {
        "n_commits": len(instants),
        "latest_instant": instants[-1],
        "n_live_slices": len(_live_slices(table_path, as_of)),
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
