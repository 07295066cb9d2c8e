"""Sinks — S4 (atomic overwrite / append), S5 (partitioned write).

The reference's "sink" is CSV-to-S3 + Redshift TRUNCATE + COPY
(``resources/redshift.py:62-74,76-87,89-112``). That refresh is
non-atomic: readers between TRUNCATE and COPY-commit see an empty
table, and a crash loses all data until the next weekly run.

Here snapshot-overwrite is ATOMIC without requiring Delta (not in this
environment): each overwrite writes a fresh immutable snapshot
directory ``snapshot=<n>-<token>``, then atomically renames a pointer
file (``_CURRENT``) to it — a minimal pointer-swap transaction log in
the spirit of Delta Lake's ``_delta_log`` (Armbrust et al., VLDB 2020).
Readers resolve the pointer first, so they always see a complete
snapshot; a crash mid-write leaves the previous snapshot live.

Concurrent writers get OPTIMISTIC CONCURRENCY (Delta-style): every
commit carries the pointer state the writer based its work on, and the
commit section — re-read pointer, compare, replace — runs under an
exclusive lock file, so a commit racing a finished writer raises
:class:`SnapshotConflict` instead of silently last-writer-winning.
Snapshot directory names carry a per-writer token, so two racing
writers never interleave files in one directory; the loser's orphan
directory is pruned by the next successful commit.

Every successful commit appends one immutable JSON entry to the
table's ``_log/`` directory — a minimal commit log giving FULL TABLE
HISTORY: :func:`history` lists every version, :func:`read_version`
time-travels (``VERSION AS OF``), :func:`vacuum` prunes old data dirs
while the log survives. Retention is per-commit (``retain=``): the
default keeps the live + previous snapshot; maintenance jobs pass more.

On a real deployment these become ``df.write.format("delta")`` — the
API here is shaped so that swap is one line.
"""

from __future__ import annotations

from datalake_polygonscan_spark.tables import tiny_df  # noqa: E402

import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"
_LOCK = "._pointer_lock"
_LOG = "_log"

#: write a ``_log/checkpoint-<V>.json`` rollup every N commits: the
#: accumulated metadata of every version <= V in ONE file, so history
#: listing / time travel / CDF gap checks read O(N mod interval) + 1
#: files instead of walking every per-version entry (Delta writes
#: _last_checkpoint the same way). 32 keeps the tail short while
#: amortizing the rollup write to ~3% of commits.
CHECKPOINT_EVERY = 32


class SnapshotConflict(RuntimeError):
    """The table's pointer moved between a writer's read and its
    commit — the optimistic-concurrency rejection (retry by re-reading
    the table and re-deriving the write)."""


class SnapshotVacuumed(FileNotFoundError):
    """Time-travel target exists in the commit log but its data
    directory was pruned by retention — the log proves the version
    happened; only its files are gone."""


def _pointer_path(table_path: str) -> str:
    return os.path.join(table_path, _POINTER)


def read_pointer(table_path: str) -> dict | None:
    """The live pointer metadata ({"snapshot": name, ...}) or None."""
    try:
        with open(_pointer_path(table_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def current_snapshot_path(table_path: str) -> str | None:
    """Resolve the live snapshot directory, or None if never written."""
    meta = read_pointer(table_path)
    return None if meta is None else os.path.join(table_path, meta["snapshot"])


def snapshot_version(meta: dict | None) -> int:
    return -1 if meta is None else int(meta["snapshot"].split("=")[1].split("-")[0])


def new_snapshot_name(base_meta: dict | None) -> str:
    """Next snapshot directory name: version derived from the base
    pointer + a per-writer token so racing writers never share a
    directory."""
    return f"snapshot={snapshot_version(base_meta) + 1}-{uuid.uuid4().hex[:8]}"


class _pointer_lock:
    """Exclusive lock file around the commit critical section (POSIX
    O_EXCL create). Held only for the pointer read+compare+replace —
    microseconds, never during data writes."""

    def __init__(self, table_path: str, timeout_s: float = 10.0):
        self.path = os.path.join(table_path, _LOCK)
        self.timeout_s = timeout_s

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                self.fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"pointer lock stuck at {self.path}")
                time.sleep(0.01)

    def __exit__(self, *exc):
        os.close(self.fd)
        os.unlink(self.path)


def commit_snapshot(
    table_path: str,
    snapshot_name: str,
    base_meta: dict | None,
    extra_meta: dict | None = None,
    retain: int = 2,
) -> None:
    """CAS pointer swap: atomically repoint ``_CURRENT`` to
    ``snapshot_name`` iff the pointer still equals ``base_meta`` (the
    state the writer read before deriving its snapshot). Raises
    :class:`SnapshotConflict` on mismatch — the caller re-reads the
    table and retries.

    Every successful commit also appends an immutable entry to the
    ``_log/`` commit log (version -> snapshot dir + writer metadata) —
    the table's full history, Delta-``_delta_log`` style, readable via
    :func:`history` / :func:`read_version`.

    On success, prunes snapshot dirs older than the newest ``retain``
    versions (the default 2 keeps the new one plus the
    immediately-previous one as a grace window for in-flight readers;
    Spark scans open files lazily and POSIX/S3-like stores keep
    open/listed objects readable past unlink). Pass a larger ``retain``
    to keep time-travel targets readable; the log itself is never
    pruned."""
    # committed_at: wall-clock commit time (Delta's commit timestamp)
    # powering TIMESTAMP AS OF reads; callers may pin it via extra_meta
    # for reproducible tests
    meta = {"snapshot": snapshot_name, "committed_at": time.time(), **(extra_meta or {})}
    new_version = snapshot_version(meta)
    with _pointer_lock(table_path):
        live = read_pointer(table_path)
        if live != base_meta:
            raise SnapshotConflict(
                f"pointer moved: expected {base_meta!r}, found {live!r} — re-derive and retry"
            )
        _apply_pointer_locked(table_path, meta)
    _prune_snapshots(table_path, new_version, keep_names={snapshot_name} | ({base_meta["snapshot"]} if base_meta else set()), retain=retain)


def _apply_pointer_locked(table_path: str, meta: dict) -> None:
    """The pointer+log application itself — caller MUST hold the
    table's pointer lock. Factored out so the multi-table transaction
    protocol (io/txn.py) can apply several tables' pointers while
    holding all their locks at once."""
    new_version = snapshot_version(meta)
    fd, tmp = tempfile.mkstemp(dir=table_path, prefix="._pointer_tmp_")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _pointer_path(table_path))
    # commit-log entry: written under the lock so version files
    # appear in commit order; one immutable JSON per version
    log_dir = os.path.join(table_path, _LOG)
    os.makedirs(log_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=log_dir, prefix="._log_tmp_")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": new_version, **meta}, f)
    os.replace(tmp, os.path.join(log_dir, f"{new_version:012d}.json"))
    # periodic log checkpoint (still under the lock, so the rollup
    # is consistent): one file holding every entry <= this version;
    # building it reads only the previous checkpoint + the tail
    if CHECKPOINT_EVERY and new_version > 0 and new_version % CHECKPOINT_EVERY == 0:
        entries = _load_log_entries(table_path)
        fd, tmp = tempfile.mkstemp(dir=log_dir, prefix="._cp_tmp_")
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, os.path.join(log_dir, f"checkpoint-{new_version:012d}.json"))


def _prune_snapshots(table_path: str, new_version: int, keep_names: set[str], retain: int) -> None:
    """Remove snapshot dirs outside the newest ``retain`` versions.
    Only STRICTLY older versions are touched: a racing writer may still
    be writing data into its own same-version directory — it removes
    that orphan itself when its commit conflicts."""
    dirs = [
        (int(e.split("=")[1].split("-")[0]), e)
        for e in os.listdir(table_path)
        if e.startswith("snapshot=") and os.path.isdir(os.path.join(table_path, e))
    ]
    versions = sorted({v for v, _ in dirs} | {new_version}, reverse=True)
    retained_versions = set(versions[: max(retain, 1)])
    for version, entry in dirs:
        if entry in keep_names or version in retained_versions:
            continue
        if version < new_version:
            shutil.rmtree(os.path.join(table_path, entry), ignore_errors=True)


def _load_log_entries(table_path: str) -> list[dict]:
    """Every commit-log entry, oldest first, reading
    O(N mod CHECKPOINT_EVERY) + 1 files: the newest
    ``checkpoint-<V>.json`` rollup (all entries <= V in one read) plus
    only the per-version entries after it. Without a checkpoint (young
    table) it walks the per-version files."""
    log_dir = os.path.join(table_path, _LOG)
    if not os.path.isdir(log_dir):
        return []
    names = os.listdir(log_dir)
    cps = sorted(n for n in names if n.startswith("checkpoint-") and n.endswith(".json"))
    entries: list[dict] = []
    cp_version = -1
    if cps:
        with open(os.path.join(log_dir, cps[-1])) as f:
            entries = json.load(f)
        cp_version = entries[-1]["version"] if entries else -1
    for fname in sorted(names):
        if fname.startswith("checkpoint-") or not fname.endswith(".json"):
            continue
        if int(fname.split(".")[0]) <= cp_version:
            continue
        with open(os.path.join(log_dir, fname)) as f:
            entries.append(json.load(f))
    return entries


def history(table_path: str) -> list[dict]:
    """The table's commit log, oldest first: one dict per committed
    version (``version``, ``snapshot``, writer metadata) plus
    ``available`` — whether that version's data files still exist or
    retention pruned them (the log outlives the data, like Delta's).
    Reads the newest log checkpoint + the entry tail, never every
    per-version file (:func:`_load_log_entries`)."""
    out = []
    for entry in _load_log_entries(table_path):
        entry = dict(entry)
        entry["available"] = os.path.isdir(os.path.join(table_path, entry["snapshot"]))
        out.append(entry)
    return out


def compact_log(table_path: str) -> int:
    """Log retention: delete per-version entry files already covered
    by the newest checkpoint rollup. ``history()`` output is identical
    before and after (the checkpoint holds those entries); only the
    directory listing shrinks — the knob for tables accumulating
    millions of commits. Returns the number of files removed."""
    log_dir = os.path.join(table_path, _LOG)
    if not os.path.isdir(log_dir):
        return 0
    names = os.listdir(log_dir)
    cps = sorted(n for n in names if n.startswith("checkpoint-") and n.endswith(".json"))
    if not cps:
        return 0
    cp_version = int(cps[-1][len("checkpoint-"):].split(".")[0])
    removed = 0
    for n in names:
        if n.startswith(("checkpoint-", ".", "_")) or not n.endswith(".json"):
            continue
        if int(n.split(".")[0]) <= cp_version:
            os.unlink(os.path.join(log_dir, n))
            removed += 1
    return removed


def read_version(spark: SparkSession, table_path: str, version: int) -> DataFrame:
    """Time travel: read the table AS OF commit ``version`` (Delta's
    ``VERSION AS OF``). Negative versions index from the latest
    (``-1`` = live). Raises :class:`SnapshotVacuumed` when the version
    committed but retention already pruned its files, ``ValueError``
    when the version never happened."""
    log = history(table_path)
    if not log:
        raise FileNotFoundError(f"no commit log at {table_path}")
    by_version = {e["version"]: e for e in log}
    if version < 0:
        version = max(by_version) + 1 + version
    entry = by_version.get(version)
    if entry is None:
        raise ValueError(f"version {version} never committed at {table_path} (log has {sorted(by_version)})")
    if not entry["available"]:
        raise SnapshotVacuumed(
            f"version {version} ({entry['snapshot']}) was pruned by retention — "
            f"commit with a larger retain= to keep time-travel targets"
        )
    # each log entry carries the schema AS OF its commit, so time
    # travel returns the historical schema, not the current one
    df = read_snapshot(spark, os.path.join(table_path, entry["snapshot"]), entry)
    return df.drop("_bucket") if "_bucket" in df.columns else df


def vacuum(table_path: str, keep_last: int = 2) -> list[int]:
    """Prune data directories of all but the newest ``keep_last``
    versions (never the live snapshot); the commit log is kept in
    full. Returns the versions whose data was removed."""
    meta = read_pointer(table_path)
    live = set() if meta is None else {meta["snapshot"]}
    dirs = sorted(
        (
            (int(e.split("=")[1].split("-")[0]), e)
            for e in os.listdir(table_path)
            if e.startswith("snapshot=") and os.path.isdir(os.path.join(table_path, e))
        ),
        reverse=True,
    )
    removed = []
    for version, entry in dirs[max(keep_last, 1):]:
        if entry in live:
            continue
        shutil.rmtree(os.path.join(table_path, entry), ignore_errors=True)
        removed.append(version)
    return sorted(removed)


def atomic_overwrite(
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
    extra_meta: dict | None = None,
    retain: int = 2,
) -> str:
    """S4 overwrite — write a new snapshot, then atomically repoint.

    Returns the new snapshot directory. Raises
    :class:`SnapshotConflict` (after removing its orphan directory) if
    another writer committed between this writer's pointer read and its
    commit."""
    os.makedirs(table_path, exist_ok=True)
    base = read_pointer(table_path)
    snap = new_snapshot_name(base)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(table_path, snap))
    try:
        meta = {"op": "WRITE", "table_schema": logical_schema_json(df), **(extra_meta or {})}
        commit_snapshot(table_path, snap, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
        raise
    return os.path.join(table_path, snap)


def append(df: DataFrame, table_path: str, partition_by: list[str] | None = None) -> str:
    """S4 append — append files into the current snapshot (creating one)."""
    snap = current_snapshot_path(table_path)
    if snap is None:
        return atomic_overwrite(df, table_path, partition_by)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snap)
    return snap


def write_partitioned(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """S5 — plain partitioned parquet write (hive-style directories),
    enabling partition pruning on read."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def logical_schema_json(df: DataFrame) -> str:
    """The table's logical schema as JSON for the commit metadata — the
    layout-internal ``_bucket`` column is not part of it."""
    from pyspark.sql import types as T

    fields = [f for f in df.schema.fields if f.name != "_bucket"]
    return T.StructType(fields).json()


def read_snapshot(spark: SparkSession, snap_dir: str, meta: dict | None) -> DataFrame:
    """Read one snapshot directory. When the commit metadata carries
    ``table_schema`` (every commit since schema tracking), the read
    uses that EXPLICIT schema — files missing newer columns (untouched
    buckets hard-linked across a schema-evolving merge) surface them as
    NULL without any ``mergeSchema`` footer-merging scan, and hive
    partition columns (``_bucket``, user partitions) are appended from
    the directory names as usual. Falls back to footer discovery for
    pre-tracking snapshots.

    Merge-on-read deletes (io/tombstones.py): when the commit carries
    ``has_tombstones``, the snapshot's key tombstones are anti-joined
    out here — EVERY consumer (live reads, time travel, merge
    internals, compaction) sees deletes applied, from one place.

    Merge-on-read upserts (io/tombstones.py:append_upserts): when the
    commit carries ``has_deltas``, the ``_deltas/`` batches resolve
    latest-batch-wins per key in ONE scan (batch sequence parsed from
    the file path, a per-key window — no per-batch union), base rows
    shadowed by a delta key drop out, and delta rows of a bucketed
    layout get their ``_bucket`` recomputed so partition-dependent
    consumers (pruned merges, per-bucket compaction) stay correct.
    Tombstones apply AFTER delta resolution: a surviving tombstone
    postdates every delta batch (upserts clear their keys' tombstones
    at commit), so it must kill delta rows too."""
    if meta and meta.get("partition_specs"):
        # S26 partition evolution: the snapshot holds one hive layout
        # per spec — delegate to the per-spec union reader. Specs are a
        # plain-table feature (never combined with MoR/bucket/mapping
        # state, which only the merge path writes).
        from datalake_polygonscan_spark.io.partition_evolution import read_spec_snapshot

        return read_spec_snapshot(spark, snap_dir, meta)
    if meta and meta.get("table_schema"):
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["table_schema"]))
        df = spark.read.schema(schema).parquet(snap_dir)
        logical_reader = spark.read.schema(schema)
    else:
        df = spark.read.parquet(snap_dir)
        logical_reader = spark.read
    # S33 column defaults (io/defaults.py, Iceberg initial-default):
    # rows from files that PREDATE an added column read the recorded
    # default; rows written after keep what the writer put there —
    # explicit NULL included. A per-row codegen IN-set probe on the
    # source file's basename; no join, no shuffle.
    cdefs = (meta or {}).get("column_defaults")
    if cdefs:
        from pyspark.sql import functions as F

        fname = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
        for col, d in cdefs.items():
            if col in df.columns:
                df = df.withColumn(
                    col,
                    F.when(
                        fname.isin(list(d["absent_files"])) & F.col(col).isNull(),
                        F.lit(d["value"]),
                    ).otherwise(F.col(col)),
                )
    if meta and meta.get("has_deltas"):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from datalake_polygonscan_spark.io.tombstones import delta_dirs

        ddirs = delta_dirs(snap_dir)
        if ddirs:
            keys = meta["merge_keys"]
            deltas = logical_reader.parquet(*ddirs).withColumn(
                "_seq",
                F.regexp_extract(F.input_file_name(), r"batch-(\d{6})-", 1).cast("int"),
            )
            w = Window.partitionBy(*keys).orderBy(F.col("_seq").desc())
            resolved = (
                deltas.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_seq")
            )
            if "_bucket" in df.columns:
                resolved = resolved.withColumn(
                    "_bucket",
                    F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(meta["merge_buckets"])),
                )
            df = df.join(resolved.select(*keys).distinct(), keys, "left_anti").unionByName(
                resolved.select(*df.columns)
            )
    if meta and meta.get("has_tombstones"):
        from datalake_polygonscan_spark.io.tombstones import tombstone_dirs

        dirs = tombstone_dirs(snap_dir)
        if dirs:
            tomb = spark.read.parquet(*dirs)
            df = df.join(tomb, meta["merge_keys"], "left_anti")
    # S27 column mapping (Delta's columnMapping.mode=name): data files
    # keep their original PHYSICAL field names forever; the commit's
    # physical->logical map renames them at read time. Applied LAST so
    # everything layout-internal (tombstone/delta key joins, _bucket)
    # ran against physical names.
    cmap = (meta or {}).get("column_mapping")
    if cmap:
        from pyspark.sql import functions as F

        df = df.select(*[F.col(c).alias(cmap.get(c, c)) for c in df.columns])
    return df


def read_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the live snapshot of an atomic table (schema from the
    commit metadata when tracked). The internal ``_bucket`` layout
    column of merge-bucketed tables (io/merge.py) is not part of the
    logical schema and is dropped."""
    meta = read_pointer(table_path)
    if meta is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    df = read_snapshot(spark, os.path.join(table_path, meta["snapshot"]), meta)
    return df.drop("_bucket") if "_bucket" in df.columns else df


def restore_version(
    spark: SparkSession, table_path: str, version: int, retain: int = 2
) -> DataFrame:
    """Delta's ``RESTORE TABLE ... VERSION AS OF``: roll the table BACK
    by rolling FORWARD — a new commit whose content AND commit
    metadata (schema, bucket layout, MoR tombstone/delta state) are
    those of ``version``, with every file hard-linked (zero data
    movement). History is preserved: the commits being rolled back
    stay in the log and remain time-travel-readable, and the restore
    itself is a version with ``restored_from`` provenance. Negative
    versions index from the latest. Raises :class:`SnapshotVacuumed`
    if retention already pruned the target's files."""
    from datalake_polygonscan_spark.io.tombstones import _link_tree

    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    log = history(table_path)
    by_version = {e["version"]: e for e in log}
    if version < 0:
        version = max(by_version) + 1 + version
    entry = by_version.get(version)
    if entry is None:
        raise ValueError(
            f"version {version} never committed at {table_path} (log has {sorted(by_version)})"
        )
    if not entry["available"]:
        raise SnapshotVacuumed(
            f"version {version} ({entry['snapshot']}) was pruned by retention"
        )
    snap_name = new_snapshot_name(base)
    _link_tree(
        os.path.join(table_path, entry["snapshot"]),
        os.path.join(table_path, snap_name),
        skip=set(),
    )
    meta = {
        k: v for k, v in entry.items() if k not in ("version", "snapshot", "available")
    }
    meta["restored_from"] = version
    meta["op"] = "RESTORE"
    # the restore is CDF-enabled iff the table is (property rides the
    # restored metadata): its feed is the keyed diff live -> target,
    # so subscribers see the rollback as ordinary typed changes
    meta["cdf_enabled"] = bool(base.get("cdf_enabled") or meta.get("cdf_enabled"))
    if not meta["cdf_enabled"]:
        meta.pop("cdf_enabled")
    staged = None
    if meta.get("cdf_enabled"):
        from datalake_polygonscan_spark.io.merge import _pending_feed_dir
        from pyspark.sql import functions as F

        new_version = snapshot_version(base) + 1
        live = read_table(spark, table_path)
        target = read_snapshot(spark, os.path.join(table_path, entry["snapshot"]), entry)
        target = target.drop("_bucket") if "_bucket" in target.columns else target
        keys = meta.get("merge_keys") or base.get("merge_keys")
        cols = target.columns
        live_al = live.select(
            *[F.col(c) if c in live.columns else F.lit(None).alias(c) for c in cols]
        )
        if keys:
            # keyed diff (one full compare of the two snapshots — the
            # price of making a rollback replayable, same as Delta):
            # target-only keys -> insert, changed rows -> update,
            # live-only keys -> delete
            t_hash = target.withColumn("_h", F.xxhash64(*[F.col(c) for c in cols]))
            l_hash = live_al.withColumn("_h", F.xxhash64(*[F.col(c) for c in cols]))
            lk = l_hash.select(*keys, F.col("_h").alias("_lh"))
            joined = t_hash.join(lk, keys, "left")
            inserts = joined.filter(F.col("_lh").isNull()).select(*cols).withColumn(
                "_change_type", F.lit("insert")
            )
            updates_ = joined.filter(
                F.col("_lh").isNotNull() & (F.col("_h") != F.col("_lh"))
            ).select(*cols).withColumn("_change_type", F.lit("update"))
            deletes_ = live_al.join(target.select(*keys).distinct(), keys, "left_anti").select(
                *cols
            ).withColumn("_change_type", F.lit("delete"))
            feed = inserts.unionByName(updates_).unionByName(deletes_)
        else:
            # keyless table: the only faithful CDC form is
            # retract-all/assert-all
            feed = live_al.withColumn("_change_type", F.lit("delete")).unionByName(
                target.select(*cols).withColumn("_change_type", F.lit("insert"))
            )
        feed = feed.withColumn("_commit_version", F.lit(new_version).cast("long"))
        staged = _pending_feed_dir(table_path, snap_name)
        feed.write.mode("overwrite").parquet(staged)
    try:
        commit_snapshot(table_path, snap_name, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap_name), ignore_errors=True)
        if staged:
            shutil.rmtree(staged, ignore_errors=True)
        raise
    if staged:
        from datalake_polygonscan_spark.io.merge import publish_feed

        publish_feed(table_path, snap_name, snapshot_version(base) + 1)
    return read_table(spark, table_path)


def rename_columns(
    spark: SparkSession, table_path: str, renames: dict[str, str], retain: int = 2
) -> DataFrame:
    """S27 — metadata-only column RENAME (Delta's column mapping,
    ``columnMapping.mode = name``; Iceberg renames by field id): a new
    commit whose snapshot hard-links EVERY live data file (zero
    rewrite — the 100 TB rename is O(files) metadata, not O(bytes))
    and whose metadata carries a physical->logical name map that
    :func:`read_snapshot` applies after load. Time travel is
    name-faithful: each version resolves names through its OWN commit's
    map, so pre-rename versions read back with pre-rename names.

    ``renames`` maps current LOGICAL names to new ones. Renames
    compose: a second rename re-points the same physical field.
    :func:`~datalake_polygonscan_spark.io.maintenance.compact_snapshot`
    MATERIALIZES the map (rewrites files with logical names and drops
    it); MERGE on a mapped table is refused until then — its bucket
    internals address physical names (io/merge.py reads per-bucket
    files directly), and silently mixing namespaces is how engines
    corrupt tables. Tables with MoR state or CDF enabled refuse the
    rename for the same reason (their persisted key/feed schemas are
    physical): materialize via OPTIMIZE first.
    """
    from datalake_polygonscan_spark.io.tombstones import _link_tree

    base = read_pointer(table_path)
    if base is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    for feature in ("has_tombstones", "has_deltas", "cdf_enabled"):
        if base.get(feature):
            raise ValueError(
                f"table has {feature}; run compact_snapshot() to materialize "
                "MoR/CDF state before renaming columns"
            )
    if base.get("merge_buckets"):
        raise ValueError(
            "merge-bucketed table: run compact_snapshot() to materialize the "
            "layout before renaming columns (MERGE addresses physical names)"
        )
    if base.get("partition_specs"):
        raise ValueError(
            "partition-evolved table: spec layouts address physical partition "
            "dir names; rewrite via compact_snapshot()/overwrite_with_spec "
            "before renaming columns"
        )
    prev_map = dict(base.get("column_mapping") or {})
    # current logical view = physical names passed through prev_map
    live_cols = read_table(spark, table_path).columns
    unknown = [c for c in renames if c not in live_cols]
    if unknown:
        raise ValueError(f"no such column(s): {unknown} (table has {live_cols})")
    new_logical = [renames.get(c, c) for c in live_cols]
    dupes = {c for c in new_logical if new_logical.count(c) > 1}
    if dupes:
        raise ValueError(f"rename would duplicate column name(s): {sorted(dupes)}")
    # physical field set = keys of prev_map + logical names never mapped
    physical = {p: logical for p, logical in prev_map.items()}
    for c in live_cols:
        if c not in prev_map.values():
            physical[c] = c
    new_map = {}
    for phys, logical in physical.items():
        target = renames.get(logical, logical)
        if target != phys:
            new_map[phys] = target
    snap_name = new_snapshot_name(base)
    _link_tree(
        os.path.join(table_path, base["snapshot"]),
        os.path.join(table_path, snap_name),
        skip=set(),
    )
    meta = {k: v for k, v in base.items() if k not in ("snapshot", "committed_at")}
    meta["op"] = "RENAME COLUMN"
    meta["column_mapping"] = new_map
    try:
        commit_snapshot(table_path, snap_name, base, meta, retain=retain)
    except SnapshotConflict:
        shutil.rmtree(os.path.join(table_path, snap_name), ignore_errors=True)
        raise
    return read_table(spark, table_path)


def read_version_at_timestamp(spark: SparkSession, table_path: str, ts: float) -> DataFrame:
    """Time travel by WALL CLOCK: read the table as of the newest
    commit whose ``committed_at`` <= ``ts`` (Delta's ``TIMESTAMP AS
    OF``). Raises ``ValueError`` when ``ts`` predates the table (there
    is no state to return) and :class:`SnapshotVacuumed` when the
    resolved version's files were pruned by retention. Commits predating
    timestamp tracking sort as time 0 — always eligible."""
    log = history(table_path)
    if not log:
        raise FileNotFoundError(f"no commit log at {table_path}")
    eligible = [e for e in log if float(e.get("committed_at", 0.0)) <= ts]
    if not eligible:
        first = min(float(e.get("committed_at", 0.0)) for e in log)
        raise ValueError(
            f"timestamp {ts} predates the table's first commit ({first}) at {table_path}"
        )
    target = max(eligible, key=lambda e: e["version"])
    return read_version(spark, table_path, target["version"])


def shallow_clone(
    spark: SparkSession,
    source_path: str,
    clone_path: str,
    version: int | None = None,
) -> DataFrame:
    """Delta-style SHALLOW CLONE: a new, fully independent table whose
    v0 snapshot HARD-LINKS the source's live data files — zero data
    movement, zero duplicate bytes, instant. The clone gets its own
    pointer and its own commit log (seeded with the source's live
    metadata plus ``cloned_from`` provenance), so writes to either side
    never touch the other: the clone's merges rewrite only its own
    touched buckets (untouched buckets keep sharing inodes with the
    source), and the source's retention can prune ITS directories
    without harming the clone (hard links keep shared file data alive
    until the last referent drops). The dev/test workflow lever at
    100 TB: experiment against production data without copying it or
    endangering it.

    ``version`` clones a HISTORICAL snapshot instead of the live one
    (Delta's ``CLONE ... VERSION AS OF``; negative indexes from the
    latest) — reproduce-last-week's-pipeline against a frozen input.
    Raises :class:`SnapshotVacuumed` if retention already pruned it.
    """
    src_meta = read_pointer(source_path)
    if src_meta is None:
        raise FileNotFoundError(f"cannot clone: no table at {source_path}")
    if version is not None:
        by_version = {e["version"]: e for e in history(source_path)}
        if version < 0:
            version = max(by_version) + 1 + version
        entry = by_version.get(version)
        if entry is None:
            raise ValueError(
                f"version {version} never committed at {source_path} "
                f"(log has {sorted(by_version)})"
            )
        if not entry["available"]:
            raise SnapshotVacuumed(
                f"version {version} ({entry['snapshot']}) was pruned by retention"
            )
        src_meta = {k: v for k, v in entry.items() if k != "available"}
    from datalake_polygonscan_spark.io.tombstones import _link_tree

    os.makedirs(clone_path, exist_ok=True)
    if read_pointer(clone_path) is not None:
        raise FileExistsError(f"clone target {clone_path} is already a table")
    name = new_snapshot_name(None)  # the clone starts its OWN history at v0
    _link_tree(
        os.path.join(source_path, src_meta["snapshot"]), os.path.join(clone_path, name), set()
    )
    meta = {
        k: v
        for k, v in src_meta.items()
        if k not in ("snapshot", "committed_at", "version")
    }
    meta.update({"op": "CLONE", "cloned_from": os.path.abspath(source_path)})
    if version is not None:
        meta["cloned_version"] = version
    commit_snapshot(clone_path, name, None, meta)
    return read_table(spark, clone_path)


def table_history_df(spark: SparkSession, table_path: str) -> DataFrame:
    """S28 — ``DESCRIBE HISTORY`` as a DataFrame (Delta's history()
    relation / Iceberg's ``<table>.history`` metadata table): one row
    per commit — version, operation, snapshot dir, availability under
    retention, commit timestamp — queryable/joinable like any table.
    Metadata only: the row count is the commit count (checkpoint-
    bounded to read O(N mod interval) files), never table data."""
    from pyspark.sql import types as T

    entries = history(table_path)
    schema = T.StructType(
        [
            T.StructField("version", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("snapshot", T.StringType()),
            T.StructField("available", T.BooleanType()),
            T.StructField("committed_at", T.DoubleType()),
        ]
    )
    rows = [
        (
            int(e["version"]),
            e.get("op", "WRITE"),
            e["snapshot"],
            bool(e["available"]),
            float(e.get("committed_at") or 0.0),
        )
        for e in entries
    ]
    return tiny_df(spark, rows, schema)


def table_files_df(spark: SparkSession, table_path: str) -> DataFrame:
    """S28 — the live snapshot's data-file manifest as a DataFrame
    (Iceberg's ``<table>.files``): relative path, size, partition dir.
    Metadata only (an os.walk of one snapshot dir — the file LISTING,
    not the data); feeds maintenance decisions (small-file ratios,
    skew) as ordinary queries."""
    from pyspark.sql import types as T

    snap = current_snapshot_path(table_path)
    if snap is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    rows = []
    for dp, dirs, fs in os.walk(snap):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        for f in fs:
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(dp, f)
            rel = os.path.relpath(full, snap)
            part = os.path.dirname(rel)
            rows.append((rel, int(os.path.getsize(full)), part or None))
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("bytes", T.LongType()),
            T.StructField("partition", T.StringType()),
        ]
    )
    return tiny_df(spark, rows, schema)


def migrate_in_place(spark: SparkSession, source_dir: str, table_path: str) -> DataFrame:
    """S39 — MIGRATE an existing plain-parquet directory (flat or
    hive-partitioned) into the snapshot table format WITHOUT rewriting
    a byte: the table's v0 snapshot hard-links every source file
    (Iceberg's ``snapshot``/``migrate`` procedure, Delta's ``CONVERT
    TO DELTA``). The source directory keeps working for legacy readers
    — hard links mean both paths reference the same inodes until
    either side's retention drops its last referent — while the new
    table immediately gets the full commit-log feature set (time
    travel, CAS commits, CDF, retention). At 100 TB this is THE
    adoption path: converting a petabyte of historical parquet must
    cost O(files) metadata, never a rewrite."""
    from datalake_polygonscan_spark.io.tombstones import _link_tree

    if read_pointer(table_path) is not None:
        raise FileExistsError(f"migration target {table_path} is already a table")
    os.makedirs(table_path, exist_ok=True)
    name = new_snapshot_name(None)
    _link_tree(source_dir, os.path.join(table_path, name), set())
    df = spark.read.parquet(os.path.join(table_path, name))
    meta = {
        "op": "MIGRATE",
        "migrated_from": os.path.abspath(source_dir),
        "table_schema": logical_schema_json(df),
    }
    commit_snapshot(table_path, name, None, meta)
    return read_table(spark, table_path)
