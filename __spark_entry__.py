"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's own report:
per-wallet transfer counts/totals) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the engine's operator registry
(datalake_polygonscan_spark/queries/) — one entry per implemented
operator from SURVEY.md §2.2, each paired with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_polygonscan_spark.queries import oracle_sql as _oracle_sql
from datalake_polygonscan_spark.queries import queries as _queries


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """Pin the confs correctness depends on, whatever session the
    driver hands us (UTC timestamps; nanos parquet readable)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; tables.py tolerates either
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_conf(spark)
    return _queries()["entry_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    fns = _queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure_conf(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _oracle_sql()
