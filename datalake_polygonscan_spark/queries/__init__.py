"""Operator registry: SURVEY.md §2.2 id -> (Spark query, DuckDB oracle).

Each entry is an executable demonstration of one operator family over
the driver testdata, written DataFrame-first, paired with an ANSI-SQL
oracle DuckDB runs on the same parquet. Importing this package
populates the registry.
"""

from datalake_polygonscan_spark.queries.registry import REGISTRY, oracle_sql, queries

# import for registration side effects
from datalake_polygonscan_spark.queries import (  # noqa: F401,E402
    relational,
    windows,
    scalar_funcs,
    udfs,
    llm,
    sources_sinks,
    streaming_batch,
    reference_pipeline,
)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
