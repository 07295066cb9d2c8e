"""Testdata catalog: load the driver's parquet tables as DataFrames.

The scan is the plain parquet DataSource V2 path so Catalyst keeps
predicate pushdown / column pruning / partition coalescing. Nothing is
cached here — callers decide (caching a 100 TB scan is not a default).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor.
DIM_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def tiny_df(spark: SparkSession, rows: list, schema, slices: int = 1) -> DataFrame:
    """DataFrame from a SMALL local row list with an explicit partition
    count (default 1).

    Arrow-enabled ``createDataFrame`` slices even a one-row list into
    ``defaultParallelism`` partitions, so every consumer pays that many
    near-empty Python-worker conversions — and a later ``coalesce(1)``
    funnels them through ONE task serially (~5 s per sentinel write at
    local[32], measured round 11). Tiny fixture/lookup/sentinel frames
    belong in one partition from birth; task-per-row dispatch frames
    (one file decode per row) pass ``slices=len(rows)`` and skip the
    repartition shuffle."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, slices)), schema
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as epoch-nanos long (see session.py);
        # truncate to micros — same truncation DuckDB applies at fetch.
        # `div` = exact integer division (a double division would lose
        # sub-microsecond bits at epoch-nano magnitudes ~1.7e18)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
