"""File-level data skipping — per-file column statistics in the
snapshot, stats-pruned scans, and range-clustered writes.

Hive partitioning (io/sinks.py, io/merge.py) prunes DIRECTORIES; this
module prunes FILES inside a snapshot by min/max column statistics,
Delta data-skipping style. The 100 TB argument: a predicate on a
clustered column should not even OPEN the files it cannot match — on
object storage, per-file GET/footer latency dominates a selective scan
long before bytes do. Spark's parquet reader already skips ROW GROUPS
by footer stats, but only after listing and opening every file; the
stats manifest moves that decision into the planner.

Three pieces:

- ``cluster_by`` — range-partition + sort the frame on the skipping
  columns before writing (``repartitionByRange`` + ``
  sortWithinPartitions``), so each output file covers a narrow value
  range. Without clustering, every file spans the whole domain and
  stats prune nothing — skipping is a LAYOUT property.
- ``write_file_stats`` — one pass over the snapshot's parquet FOOTERS
  (pyarrow metadata, no row reads) collecting per-file min/max/nulls
  into an immutable ``_stats.json`` beside the data. Footer-only cost:
  at scale this runs as part of the write (the writer already knows its
  stats); here it is a post-commit step against the live snapshot.
- ``pruned_scan`` — keep only files whose [min, max] interval
  intersects the predicate ranges; returns the DataFrame over the kept
  files (log-tracked schema) plus the prune decision
  ``{"files_total", "files_read"}``. Callers still apply the exact
  filter — pruning is a superset by construction, so correctness never
  depends on the stats (the s13 oracle proves it).

Values are normalized for JSON (numbers as-is; dates/timestamps as ISO
strings — ISO order == chronological order, so string comparison is
faithful). Snapshots created by later commits (merge, compaction) don't
carry the manifest; ``pruned_scan`` then falls back to reading all
files — stale stats can never be applied to the wrong snapshot because
the manifest lives INSIDE its snapshot directory.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession

from datalake_polygonscan_spark.io.sinks import read_pointer, read_snapshot

_STATS = "_stats.json"
_BLOOM = "_bloom.json"


def cluster_by(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Arrange ``df`` so a subsequent write produces ``n_files`` files
    each covering a narrow range of ``cols`` (lexicographic): range
    shuffle + in-partition sort. This is the layout step that makes
    file stats selective; one shuffle, no driver work.

    Also forces modern timestamp output (TIMESTAMP_MICROS) for the
    session: legacy INT96 timestamps carry no parquet min/max
    statistics, which would silently disable skipping on time
    columns."""
    df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def zorder_by(df: DataFrame, cols: list[str], n_files: int, bits: int = 16) -> DataFrame:
    """Multi-dimensional clustering (Delta's ``OPTIMIZE ZORDER BY``):
    lexicographic ``cluster_by`` only makes stats selective on the
    LEADING column; Z-ordering interleaves the bits of every column's
    quantized value into one space-filling-curve key, so a range
    predicate on ANY of ``cols`` prunes files.

    Per column: min/max-normalize into ``2**bits`` buckets (one tiny
    metadata agg for the bounds — nulls map to bucket 0), then build
    the Z-value with pure codegen bit arithmetic (``shiftright``/``&``
    /``shiftleft`` — no UDF) and range-cluster on it. Quantization by
    value rather than rank keeps it one-pass; heavily skewed columns
    trade some balance for that (Delta makes the same trade)."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    max_bucket = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        num = F.coalesce(F.col(c), F.lit(lo)).cast("double") - F.lit(lo).cast("double")
        den = F.lit(hi).cast("double") - F.lit(lo).cast("double")
        q = F.when(F.lit(lo is None or hi is None or lo == hi), F.lit(0)).otherwise(
            F.floor(num / den * max_bucket)
        )
        quantized.append(F.least(F.greatest(q, F.lit(0)), F.lit(max_bucket)).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, q in enumerate(quantized):
            z = z + F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * len(cols) + ci)
    tagged = df.withColumn("_z", z)
    return tagged.repartitionByRange(n_files, "_z").sortWithinPartitions("_z").drop("_z")


def _norm(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def write_file_stats(table_path: str, stat_cols: list[str]) -> dict:
    """Collect per-file min/max/null_count for ``stat_cols`` from the
    parquet footers of the LIVE snapshot (no row reads) into
    ``<snapshot>/_stats.json``. Returns the manifest:
    ``{rel_path: {col: {"min": v, "max": v, "nulls": n}}}``."""
    import pyarrow.parquet as pq

    meta = read_pointer(table_path)
    if meta is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    snap = os.path.join(table_path, meta["snapshot"])
    manifest: dict[str, dict] = {}
    for dirpath, dirs, files in os.walk(snap):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        for fname in files:
            if fname.startswith(("_", ".")) or not fname.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, fname)
            md = pq.ParquetFile(full).metadata
            idx = {md.row_group(0).column(j).path_in_schema: j for j in range(md.num_columns)}
            per_col: dict[str, dict] = {}
            for col in stat_cols:
                if col not in idx:
                    continue
                lo = hi = None
                nulls = 0
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx[col]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                    nulls += st.null_count or 0
                if lo is not None:
                    per_col[col] = {"min": _norm(lo), "max": _norm(hi), "nulls": nulls}
            manifest[os.path.relpath(full, snap)] = per_col
    tmp = os.path.join(snap, f".{_STATS}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(snap, _STATS))
    return manifest


def _bloom_spark_positions(col: str, m_bits: int, k: int):
    """The k bloom bit positions of a column value as a Spark array
    expression — pure codegen (md5 + conv), no UDF. The SAME hash is
    computed Python-side at planning time (:func:`_bloom_py_positions`):
    position_i(v) = int(md5(f"{i}:{v}")[:15 hex], 16) % m. 15 hex
    digits = 60 bits, safely inside a signed long on both engines; the
    value is hashed through its canonical string form, so bloom columns
    must be string or integral (document types whose Spark/Python
    string forms differ — float, timestamp — are rejected at build)."""
    from pyspark.sql import functions as F

    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col(col).cast("string"))), 1, 15),
                16,
                10,
            )
            .cast("long")
            .__mod__(m_bits)
            for i in range(k)
        ]
    )


def _bloom_py_positions(value, m_bits: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def write_bloom_filters(
    spark: SparkSession,
    table_path: str,
    cols: list[str],
    m_bits: int = 1 << 17,
    k: int = 5,
) -> dict:
    """Per-file Bloom filters for point-lookup skipping (Delta's
    ``delta.bloomFilter`` / Iceberg puffin blobs). Min/max stats
    (:func:`write_file_stats`) only prune columns the LAYOUT is
    clustered by — a high-cardinality key that spans the whole domain
    in every file (the common case for every non-leading column) gets
    zero pruning from ranges. A bloom answers "might this file contain
    key = v?" with no false negatives, so an equality probe opens only
    the files that actually hold the key (plus an fpp-sized tail).

    Build is fully distributed and reads ONLY the bloom columns: one
    scan tagging rows with ``input_file_name()``, k codegen md5
    positions per value, ``collect_set`` per file (bounded by m, not by
    rows), bitmap packed driver-side into ``_bloom.json`` inside the
    snapshot (same stale-proofing as ``_stats.json``: later commits
    produce a new snapshot dir without the manifest, so stale blooms
    can never veto a file they didn't index). At 100 TB the writer
    folds this into the write itself — the aggregation shape
    (per-output-file set of bit positions) is exactly what the task
    that wrote the file already holds in memory.

    Sizing: default m = 128 Ki bits ≈ 16 KiB/file/col; at ~10 bits per
    distinct key that holds fpp ≈ 1% up to ~13k distinct keys per
    file. Returns the manifest ``{rel_path: {col: {"m", "k",
    "bitmap"(hex)}}}``."""
    from pyspark.sql import functions as F

    meta = read_pointer(table_path)
    if meta is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    snap = os.path.join(table_path, meta["snapshot"])
    df = read_snapshot(spark, snap, meta)
    for col in cols:
        kind = dict(df.dtypes)[col]
        if kind not in ("string", "tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"bloom column {col!r} has type {kind}; only string/integral "
                "columns have engine-portable canonical string forms"
            )
    df = df.withColumn("_file", F.input_file_name())
    manifest: dict[str, dict] = {}
    for col in cols:
        per_file = (
            df.filter(F.col(col).isNotNull())
            .select("_file", F.explode(_bloom_spark_positions(col, m_bits, k)).alias("p"))
            .groupBy("_file")
            .agg(F.collect_set("p").alias("ps"))
        )
        for row in per_file.collect():
            rel = os.path.relpath(urllib.parse.urlparse(row["_file"]).path, snap)
            bitmap = bytearray(m_bits // 8)
            for p in row["ps"]:
                bitmap[p // 8] |= 1 << (p % 8)
            manifest.setdefault(rel, {})[col] = {
                "m": m_bits,
                "k": k,
                "bitmap": bytes(bitmap).hex(),
            }
    tmp = os.path.join(snap, f".{_BLOOM}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(snap, _BLOOM))
    return manifest


def pruned_scan(
    spark: SparkSession,
    table_path: str,
    ranges: dict[str, tuple] | None = None,
    equals: dict[str, object] | None = None,
) -> tuple[DataFrame, dict]:
    """Plan a scan of the live snapshot keeping only files whose
    [min, max] stats intersect every ``col: (lo, hi)`` range (``None``
    bound = unbounded; files without stats for a column are kept —
    pruning is always a superset) AND whose bloom filter admits every
    ``col: value`` equality in ``equals`` (a file is dropped only when
    its bloom PROVES the key absent — false negatives are impossible,
    so this too is superset-safe). Returns ``(df, {"files_total",
    "files_read"})``; the caller applies the exact predicate on top."""
    ranges = ranges or {}
    equals = equals or {}
    meta = read_pointer(table_path)
    if meta is None:
        raise FileNotFoundError(f"no snapshot at {table_path}")
    snap = os.path.join(table_path, meta["snapshot"])
    stats_path = os.path.join(snap, _STATS)
    bloom_path = os.path.join(snap, _BLOOM)
    all_files = []
    for dp, dirs, fs in os.walk(snap):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        all_files.extend(
            os.path.join(dp, f)
            for f in fs
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        )
    if meta.get("has_tombstones") or meta.get("has_deltas"):
        # merge-on-read state must be resolved row-wise; raw kept-file
        # reads would resurrect deleted rows / miss delta rows. Serve
        # the resolved read unpruned (OPTIMIZE restores skipping).
        df = read_snapshot(spark, snap, meta)
        return df, {"files_total": len(all_files), "files_read": len(all_files)}
    stats_manifest = {}
    if ranges and os.path.exists(stats_path):
        with open(stats_path) as f:
            stats_manifest = json.load(f)
    bloom_manifest = {}
    if equals and os.path.exists(bloom_path):
        with open(bloom_path) as f:
            bloom_manifest = json.load(f)
    if not stats_manifest and not bloom_manifest:
        df = read_snapshot(spark, snap, meta)
        return df, {"files_total": len(all_files), "files_read": len(all_files)}

    def _keep(rel: str) -> bool:
        per_col = stats_manifest.get(rel)
        if per_col is not None:
            for col, (lo, hi) in ranges.items():
                st = per_col.get(col)
                if st is None:
                    continue
                if lo is not None and _norm(st["max"]) < _norm(lo):
                    return False
                if hi is not None and _norm(st["min"]) > _norm(hi):
                    return False
        per_bloom = bloom_manifest.get(rel)
        if per_bloom is not None:
            for col, value in equals.items():
                b = per_bloom.get(col)
                if b is None or value is None:
                    continue
                bitmap = bytes.fromhex(b["bitmap"])
                for p in _bloom_py_positions(value, b["m"], b["k"]):
                    if not (bitmap[p // 8] >> (p % 8)) & 1:
                        return False
        return True

    kept = [p for p in all_files if _keep(os.path.relpath(p, snap))]
    decision = {"files_total": len(all_files), "files_read": len(kept)}
    if not kept:
        from pyspark.sql import types as T

        schema = (
            T.StructType.fromJson(json.loads(meta["table_schema"]))
            if meta.get("table_schema")
            else read_snapshot(spark, snap, meta).schema
        )
        return spark.createDataFrame([], schema), decision
    reader = spark.read
    if meta.get("table_schema"):
        from pyspark.sql import types as T

        reader = reader.schema(T.StructType.fromJson(json.loads(meta["table_schema"])))
    return reader.parquet(*kept), decision


def hilbert_index_udf(bits: int):
    """Vectorized (Arrow-batched numpy) 2D Hilbert index: (x, y) in
    [0, 2**bits)^2 -> position along the Hilbert curve.

    Z-order is expressible as pure codegen bit-interleave (zorder_by),
    but the Hilbert transform carries an ORIENTATION STATE through its
    bit levels (each quadrant rotates/reflects the sub-curve), and
    unrolling that state into column expressions multiplies the tree
    ~3x per level — 6k+ nodes at 8 bits, a codegen-compile cliff. A
    numpy pandas UDF keeps the whole batch in vector registers
    (``bits`` iterations of vector ops, no per-row Python) and the
    cost sits on the WRITE path only, amortized over every read the
    better layout accelerates."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    # no type hints: skipping.py runs under `from __future__ import
    # annotations`, and the stringified pd.Series hints can't resolve
    # against this factory's local pandas import — the hint-free form
    # takes the scalar eval type directly
    @F.pandas_udf("long")
    def _hilbert(xs, ys):
        X = xs.to_numpy(dtype="int64", na_value=0).copy()
        Y = ys.to_numpy(dtype="int64", na_value=0).copy()
        d = np.zeros_like(X)
        s = 1 << (bits - 1)
        while s > 0:
            rx = ((X & s) > 0).astype("int64")
            ry = ((Y & s) > 0).astype("int64")
            d += s * s * ((3 * rx) ^ ry)
            # rotate the sub-quadrant so the curve stays continuous
            flip = (ry == 0) & (rx == 1)
            X[flip] = s - 1 - X[flip]
            Y[flip] = s - 1 - Y[flip]
            swap = ry == 0
            X[swap], Y[swap] = Y[swap], X[swap].copy()
            s >>= 1
        return pd.Series(d)

    return _hilbert


def hilbert_by(df: DataFrame, cols: list[str], n_files: int, bits: int = 8) -> DataFrame:
    """S43 — Hilbert-curve multi-dimensional clustering, the layout
    Delta's liquid clustering and Iceberg's hilbert sort order use
    where Z-order used to be the default: both are space-filling
    curves, but the Hilbert curve is CONTINUOUS (consecutive indexes
    are always adjacent cells — Z-order jumps across the space at
    every power-of-two boundary), so a file holding a contiguous index
    range covers a tighter bounding box and range predicates prune
    more files from the same file count.

    Same contract as :func:`zorder_by`: quantize each column into
    ``2**bits`` buckets (one metadata agg for the bounds, nulls to
    bucket 0), compute the curve index, range-cluster on it. 2-D only
    (the classic rotation algorithm); quantization by value keeps it
    one-pass."""
    from pyspark.sql import functions as F

    assert len(cols) == 2, "hilbert_by implements the classic 2-D transform"
    df.sparkSession.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    max_bucket = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        num = F.coalesce(F.col(c), F.lit(lo)).cast("double") - F.lit(lo).cast("double")
        den = F.lit(hi).cast("double") - F.lit(lo).cast("double")
        q = F.when(F.lit(lo is None or hi is None or lo == hi), F.lit(0)).otherwise(
            F.floor(num / den * max_bucket)
        )
        quantized.append(F.least(F.greatest(q, F.lit(0)), F.lit(max_bucket)).cast("long"))
    h = hilbert_index_udf(bits)(quantized[0], quantized[1])
    tagged = df.withColumn("_h", h)
    return tagged.repartitionByRange(n_files, "_h").sortWithinPartitions("_h").drop("_h")
