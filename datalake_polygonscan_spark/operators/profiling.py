"""Table profiling: per-column statistics in ONE scan.

The data-quality / catalog primitive every lakehouse runs after a
load: row count, null count, distinct count, min/max per column,
emitted in long format (one row per column) so downstream checks are
table-shape-independent.

Scale notes (the 100 TB story):
- ONE pass: every statistic for every column is an aggregate in a
  single global ``agg`` — Spark plans one scan; the multiple exact
  ``count_distinct`` aggregates become an Expand (input multiplied by
  #columns) feeding one partial+final aggregation. At real corpus
  scale swap exact distinct for ``approx_count_distinct`` (HLL) and
  the Expand collapses back to plain partial aggregation — the A2
  swap, per column.
- The unpivot to long format is a ``stack`` over the single result
  row — driver-side-trivial, no extra job.
- min/max are computed on the NATIVE column type and cast to string
  only at the boundary, so numeric ordering (not lexicographic) is
  what's profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile over ``columns`` in one scan.

    Output: (col_name, n_rows, n_nulls, n_distinct, min_value,
    max_value) — min/max as strings of the native-type extrema.
    """
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', _n_rows, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in columns
    )
    return row.select(
        F.expr(
            f"stack({len(columns)}, {parts}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )
