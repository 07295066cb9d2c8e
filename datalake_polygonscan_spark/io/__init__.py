"""Sources (S1-S3) and sinks (S4-S6) with atomic table semantics."""

from datalake_polygonscan_spark.io.sources import read_csv, read_json, read_parquet
from datalake_polygonscan_spark.io.sinks import (
    atomic_overwrite,
    append,
    current_snapshot_path,
    read_table,
    write_partitioned,
)
from datalake_polygonscan_spark.io.merge import merge_upsert, next_start_block

__all__ = [
    "merge_upsert",
    "next_start_block",
    "read_parquet",
    "read_json",
    "read_csv",
    "atomic_overwrite",
    "append",
    "current_snapshot_path",
    "read_table",
    "write_partitioned",
]
