"""Temporal operators Spark has no built-in for: the as-of join.

``asof_join`` matches each left row to the LATEST right row with
``right_ts <= left_ts`` within the same partition key — the
time-series point-in-time join (pandas ``merge_asof``, kdb ``aj``,
DuckDB ``ASOF JOIN``).

Spark-first formulation — the union-and-window trick, NOT a join:
tag both sides, union them, sort each key's timeline once, and carry
the most recent right row forward with ``last(..., ignorenulls=True)``.

Scale notes (the 100 TB story):
- Cost is ONE shuffle on the partition key + a per-partition sort —
  the same work any engine must do, with no join at all, so there is
  no candidate-pair blowup on busy keys (a naive
  ``left.ts >= right.ts`` range join is quadratic per key before its
  groupBy-max collapses it).
- The window frame is running (unbounded preceding -> current row),
  which Spark evaluates streaming over the sorted partition — O(n)
  memory-bounded, spill-friendly.
- Skewed keys behave like any windowed computation (one key = one
  task); salting does not apply because the semantics need the full
  per-key timeline, but AQE still balances partition packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of-backward join: every ``left`` row, plus the columns of
    the latest ``right`` row (``right_ts <= left_ts``, same ``on`` key),
    NULLs when no prior right row exists.

    Right rows sort BEFORE left rows at equal timestamps (inclusive
    ``<=``), and among equal-timestamp right rows the greatest
    ``right_tiebreak`` wins — fully deterministic output.

    Right columns are emitted as ``<prefix><col>``.
    """
    right_cols = [c for c in right.columns if c not in on]
    r_struct = F.struct(*[F.col(c) for c in right_cols])
    r_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        F.col(right_tiebreak).cast("long").alias("_tie"),
        F.lit(None).cast(tagged_l.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    # order: time asc; at equal ts right rows first (is_r desc) so the
    # inclusive match is visible to the left row; among equal-ts right
    # rows ascending tiebreak makes the LAST seen (= max) win
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged_l.unionByName(tagged_r).withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_is_r") == 0).select(
        "_l.*",
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out
