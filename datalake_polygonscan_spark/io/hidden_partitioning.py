"""Hidden (transform) partitioning — Iceberg's headline layout idea.

The table is physically partitioned by TRANSFORMS of source columns
(``month(ts_col)``, ``bucket(n, key_col)``) that the query author never
references: they filter the RAW column, and the reader derives the
matching partition predicate automatically, so partition pruning
happens without the query knowing the layout (and the layout can later
change without breaking queries — the partition columns are an
implementation detail carried under a ``__p_`` prefix).

Reference behavior being re-expressed: the reference pins its weekly
job to hand-named date folders (walletDataConsumer.py's per-run output
paths); hidden partitioning is the lakehouse-native generalization —
derivation and pruning move into the table layer. Spark-first: the
derived columns are ordinary hive partition columns, so Catalyst's
``PartitionFilters`` does the actual pruning; this module only owns
predicate DERIVATION (raw filter -> transform filter), never scanning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MonthTransform:
    """Partition by calendar month of a timestamp column."""

    source: str
    part_col: str

    def derive(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.part_col, F.date_format(F.col(self.source), "yyyy-MM"))

    def range_predicate(self, lo: str, hi: str) -> Column:
        """Partition predicate implied by ``source BETWEEN lo AND hi``.

        'yyyy-MM' sorts lexicographically, so the month interval is a
        plain string BETWEEN on the partition column.
        """
        return F.col(self.part_col).between(lo[:7], hi[:7])


@dataclass(frozen=True)
class BucketTransform:
    """Partition by a modulo bucket of an integer key column."""

    source: str
    part_col: str
    n: int

    def derive(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.part_col, F.pmod(F.col(self.source), F.lit(self.n)))

    def eq_predicate(self, value: int) -> Column:
        """Partition predicate implied by ``source = value``."""
        return F.col(self.part_col) == value % self.n


def write_hidden(df: DataFrame, path: str, transforms) -> None:
    """Write ``df`` hive-partitioned by the derived transform columns.

    The data is repartitioned ON the derived keys first so each
    partition directory receives one file instead of one per upstream
    task — without this, an m-task write into p directories fans out
    to m*p small files, the classic partitioned-write mistake that
    turns a 100 TB table into a small-files incident."""
    out = df
    for t in transforms:
        out = t.derive(out)
    part_cols = [t.part_col for t in transforms]
    out.repartition(*[F.col(c) for c in part_cols]).write.mode("overwrite").partitionBy(
        *part_cols
    ).parquet(path)


def read_hidden(
    spark: SparkSession, path: str, partition_predicates=()
) -> DataFrame:
    """Read a hidden-partitioned table WITHOUT the layout columns.

    ``partition_predicates`` (built with the transform ``*_predicate``
    helpers) are applied BEFORE the layout columns are dropped, so
    Catalyst turns them into PartitionFilters; the returned schema then
    carries only the raw columns — the layout truly is hidden from
    queries, which is the whole point of transform partitioning.
    """
    df = spark.read.parquet(path)
    for pred in partition_predicates:
        df = df.filter(pred)
    return df.drop(*[c for c in df.columns if c.startswith("__p_")])


def scan_is_pruned(df: DataFrame, part_col: str) -> bool:
    """True when the executed plan pushes a partition filter on
    ``part_col`` (Catalyst lists it under PartitionFilters, meaning
    non-matching partition directories are never opened)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    at = plan.find("PartitionFilters: [")
    return at >= 0 and part_col in plan[at : plan.find("]", at) + 1]


@dataclass(frozen=True)
class TruncateTransform:
    """Partition by a fixed-width prefix of a string column (Iceberg's
    ``truncate[W]`` transform — the layout for prefix-searchable
    string keys)."""

    source: str
    part_col: str
    width: int

    def derive(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.part_col, F.substring(F.col(self.source), 1, self.width))

    def prefix_predicate(self, prefix: str) -> Column:
        """Partition predicate implied by ``source LIKE 'prefix%'``
        when ``len(prefix) >= width``: the partition value is exactly
        the prefix's first ``width`` chars. (Shorter prefixes imply a
        range predicate — callers with that shape should filter on
        ``between(prefix, prefix + chr(0x10FFFF))``.)"""
        if len(prefix) < self.width:
            raise ValueError(
                f"prefix {prefix!r} shorter than truncate width {self.width}"
            )
        return F.col(self.part_col) == prefix[: self.width]


@dataclass(frozen=True)
class DayTransform:
    """Partition by calendar day of a timestamp column (Iceberg's
    ``day`` transform — finer than MonthTransform, the layout for
    retention/replay windows)."""

    source: str
    part_col: str

    def derive(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.part_col, F.date_format(F.col(self.source), "yyyy-MM-dd"))

    def range_predicate(self, lo: str, hi: str) -> Column:
        """'yyyy-MM-dd' sorts lexicographically, so the day interval is
        a plain string BETWEEN on the partition column."""
        return F.col(self.part_col).between(lo[:10], hi[:10])
