"""S36 — symlink-format manifest export (Delta's
``GENERATE symlink_format_manifest`` / Athena-Presto-Trino interop).

Engines that cannot read this repo's commit-log tables directly can
still query a SNAPSHOT of them through the industry-standard manifest:
a text file listing the absolute paths of every live data file. The
manifest pins the exact file set of the generating version — later
commits do not move it (stale-but-consistent reads, the documented
Delta semantics) until the manifest is regenerated.

The export costs one directory walk (no data reads); consumers plan
their scan from the listed paths alone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.sinks import read_pointer

_MANIFEST_DIR = "_symlink_format_manifest"


def write_symlink_manifest(table_path: str) -> list[str]:
    """Write ``<table>/_symlink_format_manifest/manifest`` listing the
    live snapshot's data files (absolute paths, one per line, sorted
    for determinism). Returns the listed paths."""
    meta = read_pointer(table_path)
    if meta is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    snap = os.path.join(table_path, meta["snapshot"])
    paths = []
    for dp, dirs, fs in os.walk(snap):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        for f in fs:
            if not f.startswith(("_", ".")) and f.endswith(".parquet"):
                paths.append(os.path.abspath(os.path.join(dp, f)))
    paths.sort()
    out_dir = os.path.join(table_path, _MANIFEST_DIR)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, ".manifest.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(paths) + "\n")
    os.replace(tmp, os.path.join(out_dir, "manifest"))  # atomic publish
    return paths


def read_via_manifest(spark: SparkSession, table_path: str) -> DataFrame:
    """Read a table exactly as a manifest consumer (Presto/Trino/
    Athena) would: plan the scan from the manifest's file list alone —
    no pointer read, no commit log, no directory listing."""
    manifest = os.path.join(table_path, _MANIFEST_DIR, "manifest")
    with open(manifest) as fh:
        paths = [ln.strip() for ln in fh if ln.strip()]
    if not paths:
        raise ValueError(f"empty manifest at {manifest}")
    return spark.read.parquet(*paths)
