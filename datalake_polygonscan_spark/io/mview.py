"""Incremental materialized-view maintenance — aggregate MVs refreshed
from a CDC change feed, never by rescanning the base table.

The 100 TB story: a grouped aggregate over a 100 TB fact table is cheap
to SERVE from a small MV table but prohibitive to RECOMPUTE per batch.
Count/sum (and anything derivable from them: avg, revenue, balances)
are self-maintainable aggregates — a merge batch's effect on the MV is
exactly the signed contribution of its change rows:

    insert / update_postimage  ->  +1 row, +value
    delete / update_preimage   ->  -1 row, -value

so the refresh cost scales with the BATCH (feed -> one small hash agg
-> joined against only the touched MV buckets -> bucket-pruned merge),
not the base table. This is the classic incremental view maintenance
algorithm (delta propagation for distributive aggregates) running on
the repo's own lakehouse primitives: the retraction-shaped
``change_feed(retractions=True)`` (io/merge.py) supplies the deltas,
``merge_upsert`` applies the refreshed groups atomically, and groups
whose row count reaches zero are removed through the MERGE delete arm.

Sums are carried in ``DECIMAL(38,6)`` with per-row quantization to
``DECIMAL(18,6)`` — addition/subtraction is exact in decimal, so an MV
maintained through any sequence of merges is bit-equal to a full
recompute over the final table state (the mv1 oracle proves this in
closed form; tests replay randomized merge sequences).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.merge import _bucket_col, merge_upsert
from datalake_polygonscan_spark.io.sinks import read_pointer, read_table

#: per-row quantization applied before every sum/retraction — MUST be
#: identical at build and refresh time or retractions won't cancel
_QUANT = "decimal(18,6)"
#: accumulator type: wide enough that billions of 18,6 values can't
#: overflow the running sum
_ACC = "decimal(38,6)"


def _sum_col(c: str) -> str:
    return f"sum_{c}"


def build_aggregate(
    spark: SparkSession,
    mv_path: str,
    base: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """One-time full build of the aggregate MV (``n_rows`` +
    ``sum_<col>`` per group) — the only scan of the base table the MV
    ever needs. Written through ``merge_upsert`` so the table is laid
    out in group-key hash buckets from day one and every later refresh
    is bucket-pruned."""
    mv = base.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.col(c).cast(_QUANT)).cast(_ACC).alias(_sum_col(c))
            for c in sum_cols
        ],
    )
    return merge_upsert(spark, mv_path, mv, keys=group_cols, n_buckets=n_buckets)


def refresh_aggregate(
    spark: SparkSession,
    mv_path: str,
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
    txn_id: int | None = None,
) -> DataFrame:
    """Fold one merge batch's retraction-shaped change feed
    (``change_feed(retractions=True)``) into the MV at ``mv_path``.

    Cost model: one hash agg over the feed (batch-sized), one join of
    the delta groups against ONLY the MV buckets they touch (partition-
    pruned scan of the bucketed MV layout), one bucket-pruned merge.
    The base table is never read. Groups whose row count reaches zero
    are deleted from the MV (a served aggregate must not report empty
    groups); negative counts raise — they mean the feed was not derived
    against the MV's base state.

    ``txn_id`` is Delta's ``txnAppId/txnVersion`` idempotence pattern
    for streaming writers: the id of the last applied refresh rides the
    MV's commit metadata, and a refresh whose ``txn_id`` is <= the
    applied one is a NO-OP — a replayed micro-batch (at-least-once
    delivery) cannot double-count its deltas."""
    if txn_id is not None:
        applied = (read_pointer(mv_path) or {}).get("applied_txn", -1)
        if txn_id <= applied:
            return read_table(spark, mv_path)
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
        .otherwise(F.lit(None))
    )
    deltas = (
        feed.withColumn("_sign", sign)
        .groupBy(*group_cols)
        .agg(
            F.sum("_sign").alias("_d_rows"),
            *[
                F.sum(F.col("_sign") * F.col(c).cast(_QUANT)).cast(_ACC).alias(f"_d_{c}")
                for c in sum_cols
            ],
        )
    )

    current = _read_touched_groups(spark, mv_path, deltas, group_cols, sum_cols, n_buckets)
    refreshed = deltas.join(current, group_cols, "left").select(
        *group_cols,
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("_d_rows")).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(_sum_col(c)), F.lit(0).cast(_ACC))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0).cast(_ACC))
            )
            .cast(_ACC)
            .alias(_sum_col(c))
            for c in sum_cols
        ],
    )

    bad = refreshed.filter(F.col("n_rows") < 0).limit(1).collect()
    if bad:
        raise ValueError(
            f"negative group count after refresh ({bad[0].asDict()}): "
            "the feed was not derived against this MV's base state"
        )
    upserts = refreshed.filter(F.col("n_rows") > 0)
    emptied = refreshed.filter(F.col("n_rows") == 0).select(*group_cols)
    return merge_upsert(
        spark, mv_path, upserts, keys=group_cols, n_buckets=n_buckets, deletes=emptied,
        extra_meta=None if txn_id is None else {"applied_txn": txn_id},
    )


def _read_touched_groups(
    spark: SparkSession,
    mv_path: str,
    deltas: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    n_buckets: int,
) -> DataFrame:
    """Current MV rows, scanning only the hash buckets the delta groups
    live in (hive partition pruning over the merge layout) — the MV
    read cost follows the batch, not the MV size. Falls back to a full
    read when the layout isn't bucketed with ``n_buckets``."""
    base = read_pointer(mv_path)
    if base is None:
        # bootstrap refresh against an empty MV: every group is new
        empty = deltas.select(*group_cols).limit(0)
        empty = empty.withColumn("n_rows", F.lit(0).cast("long"))
        for c in sum_cols:
            empty = empty.withColumn(_sum_col(c), F.lit(0).cast(_ACC))
        return empty
    if base.get("merge_buckets") != n_buckets:
        return read_table(spark, mv_path)
    touched = sorted(
        r["_b"]
        for r in deltas.select(_bucket_col(group_cols, n_buckets).alias("_b")).distinct().collect()
    )
    snap = os.path.join(mv_path, base["snapshot"])
    return spark.read.parquet(snap).filter(F.col("_bucket").isin(touched)).drop("_bucket")
