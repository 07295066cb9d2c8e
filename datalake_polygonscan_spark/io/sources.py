"""Sources — S1 (parquet), S2 (schema-enforced JSON), S3 (CSV).

Generalizes the reference's single source, a paginated HTTP scan of the
PolygonScan ``tokentx`` API (``walletDataConsumer.py:51-83``). At 100 TB
scale an HTTP API is never scanned from executors; the design is
"staged raw zone first": raw JSON lands in object storage, Spark scans
it. These readers are that scan.

Design rules:
- JSON/CSV always read with an explicit schema — inference is a full
  extra pass over the data and can silently retype columns.
- ``mode=FAILFAST`` by default: the reference swallows fetch errors into
  an empty list (``walletDataConsumer.py:74-80``) which, combined with
  its TRUNCATE-reload, silently deletes history. We fail loudly, with an
  opt-in quarantine path (``badRecordsPath``-style PERMISSIVE +
  corrupt-record column) for pipelines that must keep moving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """S1 — parquet scan. Column pruning via select keeps ReadSchema minimal."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    permissive: bool = False,
) -> DataFrame:
    """S2 — newline-delimited JSON with an enforced schema.

    ``permissive=True`` routes malformed rows into ``_corrupt_record``
    instead of failing the job; callers can split them into a
    quarantine table (see ``quarantine_split``).
    """
    if permissive:
        # copy: StructType.add mutates the receiver in place
        full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    timestamp_format: str | None = None,
) -> DataFrame:
    """S3 — CSV with an enforced schema (the reference's interchange
    format: ``df.to_csv`` at ``resources/redshift.py:69-70``)."""
    reader = spark.read.schema(schema).option("header", str(header).lower()).option("mode", "FAILFAST")
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantined) DataFrames.

    Caches the parsed batch first: Spark (by design) refuses plans that
    query only ``_corrupt_record`` straight off a raw file scan, and a
    one-pass materialization is also what you want at scale — parse the
    raw zone once, route both outputs from the same pass.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
