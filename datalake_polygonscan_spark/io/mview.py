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
    n_buckets: int | None = None,
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
    n_buckets: int | None = None,
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


def build_minmax(
    spark: SparkSession,
    mv_path: str,
    base: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """One-time build of a MIN/MAX MV (``n_rows``, ``min_v``, ``max_v``
    per group). Values are quantized to ``DECIMAL(18,6)`` so the MV and
    any oracle recompute compare exactly."""
    mv = base.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        F.min(F.col(value_col).cast(_QUANT)).alias("min_v"),
        F.max(F.col(value_col).cast(_QUANT)).alias("max_v"),
    )
    return merge_upsert(spark, mv_path, mv, keys=group_cols, n_buckets=n_buckets)


def refresh_minmax(
    spark: SparkSession,
    mv_path: str,
    feed: DataFrame,
    base_after: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_buckets: int | None = None,
) -> tuple[DataFrame, dict]:
    """Fold one merge batch's retraction-shaped change feed into a
    MIN/MAX MV. Unlike count/sum (MV1), MIN/MAX is NOT self-maintainable
    under deletion — removing a non-extreme row is a pure delta, but
    removing the row HOLDING the extremum leaves the new extremum
    unknown without looking at the data. The classic IVM treatment:

    - inserts / update_postimages only IMPROVE extrema -> fold with
      ``least``/``greatest`` (no base access);
    - a delete / update_preimage strictly INSIDE the group's current
      (min, max) open interval -> pure count delta (no base access);
    - a delete touching the group's current min or max -> that group
      lands in the RECOMPUTE set, re-aggregated from ``base_after``
      restricted to those groups (a semi-join — with the base clustered
      or partitioned by the group key this scan is pruned I/O; it is
      never the full table unless every group lost its extremum).

    Returns ``(mv, {"groups_refreshed", "groups_recomputed"})`` so
    callers can observe that the cheap path carried the batch.

    Groups whose count reaches zero are deleted from the MV; negative
    counts raise (feed not derived against this MV's base state)."""
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
        .otherwise(F.lit(None))
    )
    v = F.col(value_col).cast(_QUANT)
    deltas = (
        feed.withColumn("_sign", sign)
        .groupBy(*group_cols)
        .agg(
            F.sum("_sign").alias("_d_rows"),
            F.min(F.when(F.col("_sign") == 1, v)).alias("_ins_min"),
            F.max(F.when(F.col("_sign") == 1, v)).alias("_ins_max"),
            F.min(F.when(F.col("_sign") == -1, v)).alias("_del_min"),
            F.max(F.when(F.col("_sign") == -1, v)).alias("_del_max"),
        )
    )
    current = _read_touched_mv(spark, mv_path, deltas, group_cols, n_buckets)
    joined = deltas.join(current, group_cols, "left").withColumn(
        "_new_rows", F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("_d_rows")
    )
    bad = joined.filter(F.col("_new_rows") < 0).limit(1).collect()
    if bad:
        raise ValueError(
            f"negative group count after refresh ({bad[0].asDict()}): "
            "the feed was not derived against this MV's base state"
        )
    # a delete at (or beyond — impossible on a consistent feed, but <=
    # is the safe direction) the stored extremum invalidates it
    needs_recompute = (
        F.col("n_rows").isNotNull()
        & (F.col("_new_rows") > 0)
        & (
            (F.col("_del_min").isNotNull() & (F.col("_del_min") <= F.col("min_v")))
            | (F.col("_del_max").isNotNull() & (F.col("_del_max") >= F.col("max_v")))
        )
    )
    folded = joined.filter(~needs_recompute & (F.col("_new_rows") > 0)).select(
        *group_cols,
        F.col("_new_rows").alias("n_rows"),
        F.least(F.coalesce(F.col("min_v"), F.col("_ins_min")), F.coalesce(F.col("_ins_min"), F.col("min_v"))).alias("min_v"),
        F.greatest(F.coalesce(F.col("max_v"), F.col("_ins_max")), F.coalesce(F.col("_ins_max"), F.col("max_v"))).alias("max_v"),
    )
    recompute_keys = joined.filter(needs_recompute).select(*group_cols)
    n_recompute = recompute_keys.count()
    if n_recompute:
        recomputed = (
            base_after.join(recompute_keys, group_cols, "left_semi")
            .groupBy(*group_cols)
            .agg(
                F.count("*").alias("n_rows"),
                F.min(v).alias("min_v"),
                F.max(v).alias("max_v"),
            )
        )
        upserts = folded.unionByName(recomputed)
    else:
        upserts = folded
    emptied = joined.filter(F.col("_new_rows") == 0).select(*group_cols)
    mv = merge_upsert(
        spark, mv_path, upserts, keys=group_cols, n_buckets=n_buckets, deletes=emptied,
    )
    stats = {"groups_refreshed": deltas.count(), "groups_recomputed": n_recompute}
    return mv, stats


def _read_touched_mv(
    spark: SparkSession,
    mv_path: str,
    deltas: DataFrame,
    group_cols: list[str],
    n_buckets: int | None,
) -> DataFrame:
    """Current (n_rows, min_v, max_v) MV rows for the delta groups'
    buckets only — same bucket-pruned scan as :func:`_read_touched_groups`."""
    base = read_pointer(mv_path)
    if n_buckets is None and base is not None:
        n_buckets = base.get("merge_buckets")
    if base is None:
        return (
            deltas.select(*group_cols)
            .limit(0)
            .withColumn("n_rows", F.lit(0).cast("long"))
            .withColumn("min_v", F.lit(None).cast(_QUANT))
            .withColumn("max_v", F.lit(None).cast(_QUANT))
        )
    if base.get("merge_buckets") != n_buckets:
        return read_table(spark, mv_path)
    touched = sorted(
        r["_b"]
        for r in deltas.select(_bucket_col(group_cols, n_buckets).alias("_b")).distinct().collect()
    )
    snap = os.path.join(mv_path, base["snapshot"])
    return spark.read.parquet(snap).filter(F.col("_bucket").isin(touched)).drop("_bucket")


def _read_touched_groups(
    spark: SparkSession,
    mv_path: str,
    deltas: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    n_buckets: int | None,
) -> DataFrame:
    """Current MV rows, scanning only the hash buckets the delta groups
    live in (hive partition pruning over the merge layout) — the MV
    read cost follows the batch, not the MV size. Falls back to a full
    read when the layout isn't bucketed with ``n_buckets``."""
    base = read_pointer(mv_path)
    if n_buckets is None and base is not None:
        n_buckets = base.get("merge_buckets")
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


def build_distinct_sketch(
    spark: SparkSession,
    mv_path: str,
    base: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Approx-DISTINCT MV: per group, a DataSketches HLL sketch of the
    values seen plus its estimate. COUNT(DISTINCT) is the canonical
    non-self-maintainable aggregate — no per-row delta can tell you
    whether an arriving value is new — but the SKETCH is mergeable
    state: union(sketch(A), sketch(B)) == sketch(A ∪ B) exactly (HLL
    registers merge by max), so incremental maintenance degrades to a
    per-batch sketch + one union against the stored state. Deletes
    cannot retract from an HLL (the MV answers "distinct values EVER
    seen" — the append-stream semantics sketches exist for)."""
    mv = base.groupBy(*group_cols).agg(F.hll_sketch_agg(distinct_col).alias("sketch"))
    mv = mv.withColumn("n_distinct_est", F.hll_sketch_estimate("sketch"))
    return merge_upsert(spark, mv_path, mv, keys=group_cols, n_buckets=n_buckets)


def refresh_distinct_sketch(
    spark: SparkSession,
    mv_path: str,
    batch: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """Fold an insert batch into the approx-distinct MV: sketch the
    batch (one hash agg, map-side combined — HLL partials merge on the
    combiners too), read ONLY the touched MV buckets, union the
    sketches, merge back. Cost follows the batch; the base table is
    never read. Update postimages count as inserts of their values;
    deletes are no-ops by sketch semantics (documented in
    :func:`build_distinct_sketch`)."""
    deltas = batch.groupBy(*group_cols).agg(F.hll_sketch_agg(distinct_col).alias("_new_sketch"))
    current = _read_touched_mv_generic(
        spark, mv_path, deltas, group_cols, ["sketch", "n_distinct_est"], n_buckets
    )
    refreshed = (
        deltas.join(current, group_cols, "left")
        .withColumn(
            "sketch",
            F.when(
                F.col("sketch").isNull(), F.col("_new_sketch")
            ).otherwise(
                # hll_union is the pairwise expression form of hll_union_agg
                F.expr("hll_union(sketch, _new_sketch)")
            ),
        )
        .withColumn("n_distinct_est", F.hll_sketch_estimate("sketch"))
        .select(*group_cols, "sketch", "n_distinct_est")
    )
    return merge_upsert(spark, mv_path, refreshed, keys=group_cols, n_buckets=n_buckets)


def _read_touched_mv_generic(
    spark: SparkSession,
    mv_path: str,
    deltas: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    n_buckets: int | None,
) -> DataFrame:
    """Bucket-pruned read of arbitrary MV value columns (the shared
    shape of _read_touched_groups / _read_touched_mv)."""
    from pyspark.sql import types as T

    base = read_pointer(mv_path)
    if n_buckets is None and base is not None:
        n_buckets = base.get("merge_buckets")
    if base is None:
        empty = deltas.select(*group_cols).limit(0)
        schema_map = {"sketch": T.BinaryType(), "n_distinct_est": T.LongType()}
        for c in value_cols:
            empty = empty.withColumn(c, F.lit(None).cast(schema_map.get(c, T.DoubleType())))
        return empty
    if base.get("merge_buckets") != n_buckets:
        return read_table(spark, mv_path)
    touched = sorted(
        r["_b"]
        for r in deltas.select(_bucket_col(group_cols, n_buckets).alias("_b")).distinct().collect()
    )
    snap = os.path.join(mv_path, base["snapshot"])
    return spark.read.parquet(snap).filter(F.col("_bucket").isin(touched)).drop("_bucket")


# ---------------------------------------------------------------------------
# MV5: incremental JOIN materialized view (delta-join maintenance)
# ---------------------------------------------------------------------------


def build_join(
    spark: SparkSession,
    mv_path: str,
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: list[str],
    join_keys: list[str],
    n_buckets: int | None = None,
) -> DataFrame:
    """One-time full build of a fact⋈dim JOIN MV — the denormalized
    view ``fact LEFT JOIN dim ON join_keys`` stored as a keyed lakehouse
    table (key = ``fact_keys``, the fact's primary key, so the join
    must be N:1 fact->dim; a fact key maps to exactly one MV row).

    This is the ONLY full scan of either input the MV ever needs:
    every later change folds in through :func:`refresh_join` at cost
    proportional to the change feed (fact side) or to the fan-out of
    the changed dim keys (dim side), never a re-join of the bases.
    """
    mv = fact.join(dim, join_keys, "left")
    return merge_upsert(spark, mv_path, mv, keys=fact_keys, n_buckets=n_buckets)


def refresh_join(
    spark: SparkSession,
    mv_path: str,
    fact_keys: list[str],
    join_keys: list[str],
    fact_feed: DataFrame | None = None,
    dim_feed: DataFrame | None = None,
    dim_current: DataFrame | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Fold change feeds of the join's inputs into the MV — classic
    delta-join view maintenance (ΔV = ΔR ⋈ S, then R' ⋈ ΔS), each side
    expressed on the repo's lakehouse primitives.

    Fact-side changes (``fact_feed`` = ``change_feed`` rows over the
    fact table, types insert/update/delete):
      * insert/update rows are re-joined against ``dim_current``
        restricted to ONLY the dim keys the batch touches (broadcast
        semi-filtered lookup — batch-sized, never a dim scan) and
        merge-upserted by fact key.
      * delete rows become MERGE delete keys.
      Cost: O(batch) + bucket-pruned MV rewrite.

    Dim-side changes (``dim_feed`` = ``change_feed`` rows over the dim
    table): every MV row referencing a changed dim key is re-joined
    against the feed's postimages (dim DELETEs null the dim columns,
    preserving LEFT JOIN semantics — no fact row disappears because its
    dimension did). Cost: O(fan-out of the changed dim keys) — the MV
    read is a broadcast semi-join on ``join_keys``, the rewrite is
    bucket-pruned by fact key. The base tables are never re-joined.

    The 100 TB story: fact churn (the overwhelming majority of writes
    in a fact⋈dim star) costs batch-sized work; dim churn costs its
    true fan-out, which no maintenance scheme can beat — a repriced
    customer OWNS those order rows. Apply order matters and mirrors
    commit order: each feed folds against the MV state its
    ``change_feed`` was derived on.
    """
    live = None
    if fact_feed is not None:
        if dim_current is None:
            raise ValueError("fact_feed refresh needs dim_current for the lookup join")
        upserts_fact = fact_feed.filter(
            F.col("_change_type").isin("insert", "update", "update_postimage")
        ).drop("_change_type")
        deletes = (
            fact_feed.filter(F.col("_change_type") == "delete")
            .select(*fact_keys)
        )
        # dim lookup restricted to the batch's join keys: semi-filter
        # then broadcast — batch-sized, never a dim-side scan
        touched_dim = dim_current.join(
            F.broadcast(upserts_fact.select(*join_keys).distinct()), join_keys, "leftsemi"
        )
        # localCheckpoint (lazy): the feed-derived batch plan is a
        # window + several joins over base scans, and the merge runs
        # 2 jobs over it (bucket probe, snapshot write) — truncating
        # the lineage computes it once (round 11, guide §5; unlike the
        # r10-rejected checkpoint of CHEAP batches inside _merge_once,
        # these frames are expensive and batch-sized)
        upserts = (
            upserts_fact.join(F.broadcast(touched_dim), join_keys, "left")
            .localCheckpoint(eager=False)
        )
        deletes = deletes.localCheckpoint(eager=False)
        live = merge_upsert(
            spark, mv_path, upserts, keys=fact_keys, n_buckets=n_buckets, deletes=deletes
        )
    if dim_feed is not None:
        post = dim_feed.filter(
            F.col("_change_type").isin("insert", "update", "update_postimage")
        ).drop("_change_type")
        changed_keys = dim_feed.select(*join_keys).distinct()
        mv_now = read_table(spark, mv_path)
        dim_cols = [c for c in post.columns if c not in join_keys]
        affected = mv_now.join(F.broadcast(changed_keys), join_keys, "leftsemi")
        # same lineage truncation as the fact side: the fan-out rejoin
        # feeds 2 merge jobs
        refreshed = (
            affected.drop(*dim_cols).join(F.broadcast(post), join_keys, "left")
            .localCheckpoint(eager=False)
        )
        live = merge_upsert(spark, mv_path, refreshed, keys=fact_keys, n_buckets=n_buckets)
    if live is None:
        raise ValueError("refresh_join called with no feed")
    return live


def rewrite_groupby_agg(
    spark: SparkSession,
    mv_path: str,
    mv_group_cols: list[str],
    mv_sum_cols: list[str],
    want_group_cols: list[str],
    want_aggs: list[tuple[str, str, str]],
) -> DataFrame | None:
    """MV6 — transparent aggregate QUERY REWRITE (the Oracle/BigQuery/
    Databricks 'automatic MV matching' feature): a groupBy/agg query
    against the BASE table is answered from this aggregate MV when

    - every requested grouping column is one of the MV's group keys
      (coarser groupings re-aggregate the MV's partial states), and
    - every requested aggregate is count(*)/sum(c)/avg(c) over a
      column the MV carries sums for (all three derive from the
      (n_rows, sum_c) state pair: counts add, sums add, avg = sum of
      sums / sum of counts).

    Returns the rewritten DataFrame reading ONLY the MV (group
    cardinality rows instead of the base table — the 100 TB win), or
    None when the query doesn't match (grouping key or aggregate the
    MV state can't derive) — the caller falls back to the base scan.
    Soundness note: avg must recompute from the summed states, never
    average the per-group averages.

    ``want_aggs``: (func, col, alias) with func in {count, sum, avg}.
    """
    if not set(want_group_cols) <= set(mv_group_cols):
        return None
    for func, col, _alias in want_aggs:
        if func == "count":
            continue
        if func in ("sum", "avg") and col in mv_sum_cols:
            continue
        return None
    from datalake_polygonscan_spark.io.sinks import read_table

    mv = read_table(spark, mv_path)
    exprs = []
    for func, col, alias in want_aggs:
        if func == "count":
            exprs.append(F.sum("n_rows").cast("long").alias(alias))
        elif func == "sum":
            exprs.append(F.sum(_sum_col(col)).alias(alias))
        else:  # avg — exact states, one final divide
            exprs.append(
                (F.sum(_sum_col(col)).cast("double") / F.sum("n_rows")).alias(alias)
            )
    return mv.groupBy(*want_group_cols).agg(*exprs)
