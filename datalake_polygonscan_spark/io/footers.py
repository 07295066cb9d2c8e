"""PR2 — distributed parquet FOOTER profiling: the row-group /
column-chunk statistics table every skipping and compaction decision
is made from, read as data.

``footer_profile`` fans a list of parquet files out across the
cluster and reads each file's FOOTER ONLY (pyarrow ParquetFile
metadata — a few KB per file, never the data pages), emitting one row
per (file, row group, column chunk) with the counts, null stats and
physical sizes. At 100 TB this is the shape that works: millions of
files profile as a map-only job moving kilobytes per task, where a
naive read-and-count would scan the lake.

The differential oracle is DuckDB's ``parquet_metadata()`` table
function over the same files — two independent footer parsers must
agree field-for-field.
"""

from __future__ import annotations

from datalake_polygonscan_spark.tables import tiny_df  # noqa: E402

from pyspark.sql import DataFrame, SparkSession


FOOTER_SCHEMA = (
    "file_name string, row_group_id long, path_in_schema string, "
    "num_values long, null_count long, "
    "total_compressed_size long, total_uncompressed_size long, "
    "row_group_num_rows long"
)


def footer_profile(spark: SparkSession, paths: list[str], parallelism: int = 8) -> DataFrame:
    """One row per (file, row group, column chunk), footer data only."""

    def scan(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                base = os.path.basename(path)
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        st = c.statistics
                        rows.append(
                            {
                                "file_name": base,
                                "row_group_id": rg,
                                "path_in_schema": c.path_in_schema,
                                "num_values": c.num_values,
                                "null_count": (
                                    st.null_count
                                    if st is not None and st.has_null_count
                                    else None
                                ),
                                "total_compressed_size": c.total_compressed_size,
                                "total_uncompressed_size": c.total_uncompressed_size,
                                "row_group_num_rows": g.num_rows,
                            }
                        )
            yield pd.DataFrame(rows, columns=[
                "file_name", "row_group_id", "path_in_schema", "num_values",
                "null_count", "total_compressed_size", "total_uncompressed_size",
                "row_group_num_rows",
            ])

    files = tiny_df(spark, [(p,) for p in sorted(paths)], "path string",
                    slices=min(parallelism, len(paths)))
    return files.mapInPandas(scan, FOOTER_SCHEMA)
