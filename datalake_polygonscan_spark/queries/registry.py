"""Registry plumbing for the operator-coverage queries.

Contract (driver gate, ``__spark_entry__.py``):
- every entry name maps to a callable ``(spark, sf_dir) -> DataFrame``
- entries with an oracle also map to an ANSI-SQL string DuckDB runs on
  the same parquet (views pre-registered per table name)
- column names are aliased identically on both sides (the driver sorts
  columns by name before hashing)
- float outputs are rounded on BOTH sides (sums go through decimal
  casts so they are exact and order-insensitive)

Queries must be deterministic: any LIMIT/top-k carries a total order
with a unique tie-break key; dedup picks the min-key survivor, never
"whichever row came first".
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryEntry] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryEntry(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}
