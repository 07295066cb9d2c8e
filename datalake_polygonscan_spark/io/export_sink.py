"""R10-R12 — the reference's CSV export/upload path as a FIRST-CLASS
Spark sink (the Spark 4 Python DataSource WRITER API), with the
commit/abort protocol the reference lacks.

The reference serializes the whole frame to ONE in-memory CSV string
and PUTs it to object storage (``Redshift.upload_to_s3``,
resources/redshift.py:62-74 — a single-writer, single-object,
all-or-nothing-by-luck upload), then TRUNCATE+COPYs it into the
warehouse (:80,98-104) with a visible empty-table window. This module
expresses the same export Spark-natively and fixes both defects:

- every task streams ITS partition to a ``part-*.csv`` in a hidden
  ``_staging/`` dir (parallel upload, bounded memory — the 100 TB
  export the reference's StringIO could never hold) and returns a
  :class:`WriterCommitMessage` carrying the file name and row count;
- the driver's ``commit()`` moves the staged parts into a new
  ``export-N`` directory, writes a ``_MANIFEST.json`` (files + per-file
  row counts) and atomically republishes the ``_PUBLISHED`` pointer
  (os.replace — readers resolve THROUGH the manifest, so a torn job is
  invisible: no empty-table window, no partial export);
- ``abort()`` deletes the staged parts — failed jobs leave nothing.

CSV stays the interchange format deliberately (R10's compatibility
contract); the sink is registered as ``spark.write.format
("wallet_export")``.
"""

from __future__ import annotations

import csv
import io
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    WriterCommitMessage,
)


class ExportCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class WalletExportDataSource(DataSource):
    """``df.write.format("wallet_export").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "wallet_export"

    def writer(self, schema, overwrite: bool) -> "WalletExportWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("wallet_export requires .option('path', ...)")
        return WalletExportWriter(path, [f.name for f in schema.fields], overwrite)

    def schema(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("wallet_export requires .option('path', ...)")
        export = self.options.get("export")
        return export_schema_ddl(path, None if export is None else int(export))

    def reader(self, schema) -> "WalletExportReader":
        return WalletExportReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "WalletExportStreamWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("wallet_export requires .option('path', ...)")
        return WalletExportStreamWriter(path, [f.name for f in schema.fields], overwrite)


class WalletExportWriter(DataSourceArrowWriter):
    def __init__(self, root: str, columns: list[str], overwrite: bool):
        self.root = root
        self.columns = columns
        self.overwrite = overwrite

    # -- executor side -------------------------------------------------
    def write(self, iterator) -> ExportCommit:
        """Arrow-batched CSV encode (DataSourceArrowWriter: the task
        receives pyarrow RecordBatches, never Python rows — ~10x the
        row-at-a-time csv.writer throughput on wide exports), streamed
        batch-by-batch so executor memory stays one batch deep."""
        import pyarrow as pa
        import pyarrow.csv as pacsv

        os.makedirs(os.path.join(self.root, "_staging"), exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.csv"
        tmp = os.path.join(self.root, "_staging", "." + name)
        n = 0
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    writer = pacsv.CSVWriter(tmp, batch.schema)
                writer.write_batch(batch)
                n += batch.num_rows
            if writer is None:  # empty partition: header-only part
                schema = pa.schema([(c, pa.string()) for c in self.columns])
                writer = pacsv.CSVWriter(tmp, schema)
        finally:
            if writer is not None:
                writer.close()
        os.replace(tmp, os.path.join(self.root, "_staging", name))
        return ExportCommit(name, n)

    # -- driver side ---------------------------------------------------
    def _staged(self, messages):
        return [m for m in messages if m is not None]

    def commit(self, messages) -> None:
        msgs = self._staged(messages)
        pointer = os.path.join(self.root, "_PUBLISHED")
        prev = -1
        if os.path.exists(pointer) and not self.overwrite:
            with open(pointer) as f:
                prev = json.load(f)["export"]
        export = prev + 1 if not self.overwrite else 0
        dest = os.path.join(self.root, f"export-{export}")
        if self.overwrite:
            import shutil

            shutil.rmtree(dest, ignore_errors=True)  # stale rerun leftovers
        os.makedirs(dest, exist_ok=True)
        for m in msgs:
            os.replace(
                os.path.join(self.root, "_staging", m.filename),
                os.path.join(dest, m.filename),
            )
        manifest = {
            "files": sorted(m.filename for m in msgs),
            "rows": {m.filename: m.n_rows for m in msgs},
            "total_rows": sum(m.n_rows for m in msgs),
        }
        tmp = os.path.join(dest, "._manifest_tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(dest, "_MANIFEST.json"))
        tmp = os.path.join(self.root, "._published_tmp")
        with open(tmp, "w") as f:
            json.dump({"export": export}, f)
        os.replace(tmp, pointer)  # the atomic publish
        # self-heal: a PRIOR aborted job's zombie task may have staged
        # a part after that job's abort sweep (task cancellation is
        # asynchronous); such residue is invisible to readers (not in
        # any manifest) — sweep it here so staging never accretes
        staging = os.path.join(self.root, "_staging")
        if os.path.isdir(staging):
            for name in os.listdir(staging):
                try:
                    os.remove(os.path.join(staging, name))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        # messages only cover tasks whose commit message reached the
        # driver; tasks that staged a part but died mid-report leave
        # files no message names. Sweep the whole staging dir — the
        # sink is single-concurrent-writer per root (the reference's
        # weekly job shape), and unmanifested files are invisible to
        # readers regardless.
        staging = os.path.join(self.root, "_staging")
        if os.path.isdir(staging):
            for name in os.listdir(staging):
                try:
                    os.remove(os.path.join(staging, name))
                except FileNotFoundError:
                    pass


class WalletExportStreamWriter(WalletExportWriter, DataSourceStreamArrowWriter):
    """R10s — the STREAMING arm of the export sink (Spark 4
    ``DataSourceStreamArrowWriter``), completing the Python DataSource
    matrix: batch read (R1), stream read (R1s), batch write (R10w),
    stream write (R10s). Task side is IDENTICAL to the batch writer
    (Arrow-batched CSV staging, inherited); the driver commits once
    per MICRO-BATCH, publishing each batch as its own ``export-N``
    manifest directory and recording the batch id in the pointer.

    Exactly-once: Structured Streaming may re-deliver a micro-batch
    whose sink commit succeeded but whose checkpoint commit did not
    (failure in the window between the two). ``commit`` is therefore
    IDEMPOTENT on batch id — a replayed ``batchId <=`` the pointer's
    last committed id sweeps its staged files and leaves the published
    state untouched, so the export sequence never duplicates a batch.
    One root is bound to one query lineage (checkpoint), as with any
    exactly-once sink."""

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (Spark API)
        msgs = self._staged(messages)
        pointer = os.path.join(self.root, "_PUBLISHED")
        prev_export, prev_batch = -1, None
        if os.path.exists(pointer):
            with open(pointer) as f:
                meta = json.load(f)
            prev_export = meta["export"]
            prev_batch = meta.get("batch_id")
        if prev_batch is not None and batchId <= prev_batch:
            # replayed micro-batch: the prior attempt's publish stuck;
            # drop the redelivered staging and keep the committed state
            self.abort(messages, batchId)
            return
        export = prev_export + 1
        dest = os.path.join(self.root, f"export-{export}")
        os.makedirs(dest, exist_ok=True)
        for m in msgs:
            os.replace(
                os.path.join(self.root, "_staging", m.filename),
                os.path.join(dest, m.filename),
            )
        manifest = {
            "files": sorted(m.filename for m in msgs),
            "rows": {m.filename: m.n_rows for m in msgs},
            "total_rows": sum(m.n_rows for m in msgs),
            "batch_id": batchId,
        }
        tmp = os.path.join(dest, "._manifest_tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(dest, "_MANIFEST.json"))
        tmp = os.path.join(self.root, "._published_tmp")
        with open(tmp, "w") as f:
            json.dump({"export": export, "batch_id": batchId}, f)
        os.replace(tmp, pointer)  # the atomic per-batch publish

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (Spark API)
        WalletExportWriter.abort(self, messages)


def published_files(root: str) -> list[str]:
    """Resolve the LIVE export's data files through the manifest —
    the only sanctioned read path (stray/torn files are invisible)."""
    with open(os.path.join(root, "_PUBLISHED")) as f:
        export = json.load(f)["export"]
    dest = os.path.join(root, f"export-{export}")
    with open(os.path.join(dest, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    return [os.path.join(dest, name) for name in manifest["files"]]


class _ExportFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WalletExportReader(DataSourceReader):
    """Manifest-resolved reader: the versioned CSV exports become a
    queryable table (``spark.read.format("wallet_export")``), closing
    the loop the reference closes with Redshift COPY
    (resources/redshift.py:98-104) — but against the atomic manifest,
    so a torn or in-flight export is never visible.

    One :class:`InputPartition` per manifest file: a 1000-executor
    cluster reads a 1000-part export fully in parallel, and ONLY files
    the manifest names — stray staging residue or a newer half-written
    export directory are invisible by construction. ``option("export",
    N)`` pins a historical export (the dirs are immutable once
    published), defaulting to the live ``_PUBLISHED`` pointer.
    """

    def __init__(self, options):
        root = options["path"]
        pinned = options.get("export")
        if pinned is None:
            with open(os.path.join(root, "_PUBLISHED")) as f:
                pinned = json.load(f)["export"]
        dest = os.path.join(root, f"export-{int(pinned)}")
        with open(os.path.join(dest, "_MANIFEST.json")) as f:
            self.manifest = json.load(f)
        self.dest = dest

    def partitions(self):
        return [
            _ExportFilePartition(os.path.join(self.dest, name))
            for name in self.manifest["files"]
        ]

    def read(self, partition: _ExportFilePartition):
        """Arrow-native parse: pyarrow's C CSV reader, yielded as
        RecordBatches (the Spark 4 reader fast path — no per-row
        Python objects). All columns stay strings per the format's
        schema contract; empty fields come back as nulls, matching
        what the writer emits for None."""
        import pyarrow as pa
        import pyarrow.csv as pacsv

        with open(partition.path, newline="") as f:
            header = next(csv.reader(f), None)
        if not header:
            return
        table = pacsv.read_csv(
            partition.path,
            convert_options=pacsv.ConvertOptions(
                column_types={c: pa.string() for c in header},
                # ONLY the writer's empty-field encoding maps back to
                # null: pyarrow's default null_values would silently
                # nullify literal data like "NULL"/"nan"/"N/A", which
                # the writer emits verbatim for real string values
                # (round-trip fidelity, ADVICE r5).
                null_values=[""],
                strings_can_be_null=True,
            ),
        )
        yield from table.to_batches()


def export_schema_ddl(root: str, export: int | None = None) -> str:
    """All-string DDL from the export's own CSV header (CSV is untyped
    at rest; readers cast). Resolved through the manifest like reads."""
    if export is None:
        with open(os.path.join(root, "_PUBLISHED")) as f:
            export = json.load(f)["export"]
    dest = os.path.join(root, f"export-{int(export)}")
    with open(os.path.join(dest, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    first = os.path.join(dest, manifest["files"][0])
    with open(first, newline="") as f:
        header = next(csv.reader(f))
    return ", ".join(f"`{c}` string" for c in header)
