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


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    tolerance_seconds: int,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """J6b — the as-of join's two production knobs (pandas
    ``merge_asof`` parity): ``tolerance`` voids any match further than
    ``tolerance_seconds`` from the left timestamp (stale state must
    read as ABSENT, not as an arbitrarily old value), and ``direction=
    'forward'`` matches the EARLIEST right row at-or-after the left
    timestamp instead of the latest at-or-before.

    Same union-and-window shape as :func:`asof_join` — one shuffle on
    the key, one sorted pass, no join operator at all; 'forward' is
    the time-mirrored frame (first following right row), and tolerance
    is a post-projection null-out, so neither knob adds a shuffle.
    """
    right_cols = [c for c in right.columns if c not in on]
    out = (
        asof_join(left, right, on, left_ts, right_ts, right_tiebreak, prefix)
        if direction == "backward"
        else _asof_forward(left, right, on, left_ts, right_ts, right_tiebreak, prefix)
    )
    ts_r = F.col(f"{prefix}{right_ts}")
    gap = (
        F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(ts_r)
        if direction == "backward"
        else F.unix_timestamp(ts_r) - F.unix_timestamp(F.col(left_ts))
    )
    keep = ts_r.isNotNull() & (gap <= tolerance_seconds)
    return out.select(
        *[c for c in out.columns if not c.startswith(prefix)],
        *[
            F.when(keep, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def _asof_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    prefix: str,
) -> DataFrame:
    """Earliest right row with ``right_ts >= left_ts`` per key: the
    time-mirror of the backward pass — right rows sort AFTER left rows
    at equal ts would break inclusivity, so right sorts first with
    ascending tiebreak and the frame looks FORWARD (first following
    non-null)."""
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
    # time asc; at equal ts LEFT rows first (is_r asc) so an equal-ts
    # right row is inside the left row's FOLLOWING frame (inclusive
    # >=); among equal-ts right rows ascending tiebreak puts the MIN
    # tiebreak first — the deterministic 'earliest' winner. Executed
    # as the REVERSED-sort RUNNING frame (last-non-null over DESC,
    # unbounded..current == first-non-null over ASC,
    # current..unboundedFollowing): Spark streams the running frame in
    # O(n) per partition but rescans the tail per row — O(n^2) — for
    # an unbounded-FOLLOWING frame
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").desc(), F.col("_is_r").desc(), F.col("_tie").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged_l.unionByName(tagged_r).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("_is_r") == 0).select(
        "_l.*",
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_seconds: int,
) -> DataFrame:
    """Hypertable-style rollup with gap fill: downsample each key's
    event stream onto a fixed epoch-aligned grid (``step_seconds``
    buckets), keep the LAST value per bucket (ordered by
    ``(ts, tiebreak)`` — deterministic), emit EVERY bucket between the
    key's first and last event, and forward-fill empty buckets from
    the latest earlier bucket.

    Output: (key, bucket_start epoch-seconds, value, is_gap) —
    ``is_gap=1`` marks carried-forward rows.

    Scale notes (the 100 TB story):
    - last-per-bucket is ``max_by`` in a hash aggregate — map-side
      partial combine collapses the raw stream BEFORE the shuffle, so
      the shuffle carries one row per (key, bucket), not per event.
    - The grid comes from per-key min/max + ``sequence``/``explode``
      — array size is span/step per key (bounded by retention/step
      choice; for pathological spans generate the grid from a range
      join instead). No driver-side actions anywhere.
    - The forward fill is ONE running window per key (streaming
      evaluation, O(1) state); everything shuffles on the key exactly
      once after the pre-aggregation.
    """
    step = int(step_seconds)
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast("long")
    per_bucket = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket_start"),
            F.struct(F.col(ts_col), F.col(tiebreak_col)).alias("_ord"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("key", "bucket_start")
        .agg(F.max_by("_v", "_ord").alias("_v"))
    )
    grid = (
        per_bucket.groupBy("key")
        .agg(F.min("bucket_start").alias("_mn"), F.max("bucket_start").alias("_mx"))
        .select(
            "key",
            F.explode(F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step).cast("long"))).alias(
                "bucket_start"
            ),
        )
    )
    w_ff = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, ["key", "bucket_start"], "left")
        .select(
            F.col("key").alias(key_col),
            "bucket_start",
            F.last("_v", ignorenulls=True).over(w_ff).alias(value_col),
            F.col("_v").isNull().cast("int").alias("is_gap"),
        )
    )


def resample_linear_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_seconds: int,
) -> DataFrame:
    """TS5 — like :func:`resample_forward_fill` but gaps are LINEARLY
    INTERPOLATED between the surrounding observed buckets instead of
    carried forward: the fill a metrics/telemetry store (Timescale's
    ``interpolate()``, InfluxDB ``fill(linear)``) does for charting
    and rate math.

    For a gap bucket t between observed buckets (pb, pv) and (nb, nv):
    ``value = pv + (nv - pv) * (t - pb) / (nb - pv_b)``. The grid
    spans each key's min..max OBSERVED bucket, so a gap always has
    both neighbors (edges are observed by construction; no
    extrapolation semantics to argue about).

    Determinism at scale: the neighbor lookups are two window passes
    over the same per-key sort (last/ignorenulls looking back,
    first/ignorenulls looking forward — Catalyst plans one Exchange +
    one Sort, the second window reuses them), and the interpolation
    is a single IEEE expression over exact bucket integers and the
    two neighbor doubles — no accumulation, so any partitioning gives
    bit-identical results and the oracle can replay the same formula.
    """
    step = int(step_seconds)
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast("long")
    per_bucket = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket_start"),
            F.struct(F.col(ts_col), F.col(tiebreak_col)).alias("_ord"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("key", "bucket_start")
        .agg(F.max_by("_v", "_ord").alias("_v"))
    )
    grid = (
        per_bucket.groupBy("key")
        .agg(F.min("bucket_start").alias("_mn"), F.max("bucket_start").alias("_mx"))
        .select(
            "key",
            F.explode(F.sequence(F.col("_mn"), F.col("_mx"), F.lit(step).cast("long"))).alias(
                "bucket_start"
            ),
        )
    )
    w_back = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward neighbor as a RUNNING frame over the REVERSED sort:
    # last-non-null over (DESC, unbounded..current) == first-non-null
    # over (ASC, current..unboundedFollowing), but Spark executes the
    # running frame in O(n) per partition while the unbounded-FOLLOWING
    # frame rescans the tail per row — O(n^2), 16 s vs ~4 s at sf0.1
    w_fwd_rev = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket_start").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_b = F.when(F.col("_v").isNotNull(), F.col("bucket_start"))
    joined = grid.join(per_bucket, ["key", "bucket_start"], "left").select(
        "key",
        "bucket_start",
        "_v",
        F.last("_v", ignorenulls=True).over(w_back).alias("_pv"),
        F.last(obs_b, ignorenulls=True).over(w_back).alias("_pb"),
        F.last("_v", ignorenulls=True).over(w_fwd_rev).alias("_nv"),
        F.last(obs_b, ignorenulls=True).over(w_fwd_rev).alias("_nb"),
    )
    frac = (F.col("bucket_start") - F.col("_pb")) / (F.col("_nb") - F.col("_pb"))
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_start",
        F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(interp).alias(value_col),
        F.col("_v").isNull().cast("int").alias("is_gap"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    bin_seconds: int,
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """J9 — interval OVERLAP join with NO equi key, made hash-joinable
    by time binning (the technique behind Databricks' range-join hint
    and bioinformatics interval libraries): explode each interval into
    the coarse bins it covers, equi-join on the bin, verify the true
    overlap predicate, and dedup pairs that met in several bins.

    Why: the naive plan for ``a.s <= b.e AND b.s <= a.e`` is a
    BroadcastNestedLoop/cartesian — O(|a|x|b|) comparisons, dead at
    scale. Binning makes the work Σ (intervals x bins-per-interval) +
    true-match verification: pick ``bin_seconds`` near the median
    interval length so most intervals cover 1-2 bins.

    Inputs need (id, s, e) integer-second columns with ``s <= e``
    (an inverted interval would make Spark's ``sequence`` count
    DOWNWARD while a SQL oracle's generate_series returns empty —
    validate upstream); returns (a_id, b_id, overlap_s) with exact
    integer overlap lengths — fully deterministic, so a theta-join
    oracle checks it row-for-row.
    """
    step = int(bin_seconds)

    def binned(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(start_col).alias(f"{tag}_s"),
            F.col(end_col).alias(f"{tag}_e"),
        ).withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{tag}_s") / step).cast("long"),
                    F.floor(F.col(f"{tag}_e") / step).cast("long"),
                )
            ),
        )

    pa, pb = binned(a, "a"), binned(b, "b")
    return (
        pa.join(pb, "_bin")
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .select(
            "a_id",
            "b_id",
            (F.least("a_e", "b_e") - F.greatest("a_s", "b_s")).cast("long").alias(
                "overlap_s"
            ),
        )
        .distinct()
    )


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: per key, the earliest step-1 event,
    then the earliest step-2 event AT-OR-AFTER it, and so on —
    ``t_<step>`` is NULL from the first step the key never completes,
    and ``funnel_depth`` counts completed steps.

    Output: (key, t_<step>..., funnel_depth).

    Scale: the chained step times are windows over the SAME
    ``partitionBy(key)`` — Catalyst plans ONE exchange and evaluates
    the per-key mins in a single pass per window stage (no orderBy =
    no sort). The final per-key row is a distinct over columns that
    are constant within the key. Event streams with billions of rows
    funnel fine: everything is keyed by user, nothing is global.
    """
    w = Window.partitionBy(key_col)
    proj = df
    prev: str | None = None
    ts_cols: list[str] = []
    for step in steps:
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        name = f"t_{step}"
        proj = proj.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
        ts_cols.append(name)
    # deepest completed step wins: ascending build wraps the deepest
    # check outermost (the chain is monotone anyway — step i+1's
    # condition references t_<step i>, so a null can never be followed
    # by a non-null)
    depth: F.Column = F.lit(0)
    for i, name in enumerate(ts_cols):
        depth = F.when(F.col(name).isNotNull(), F.lit(i + 1)).otherwise(depth)
    return (
        proj.select(F.col(key_col), *ts_cols)
        .distinct()
        .withColumn("funnel_depth", depth.cast("int"))
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period: str = "week",
    period_days: int = 7,
) -> DataFrame:
    """AN2 — cohort retention matrix: cohort = the period of each
    entity's FIRST event; for every (cohort, periods_since) cell, the
    number of distinct entities from that cohort active in that period
    and the retention ratio vs the cohort size.

    Plan shape (the 100 TB story): ONE pass over the events — a
    map-side-combined min-per-key agg for the cohort assignment, one
    key-hash join back (the small per-entity side broadcasts or
    co-partitions), one distinct-agg over (cohort, offset). The cohort
    SIZE needs no second scan: every entity is by construction active
    in its own first period, so size(cohort) IS the n_active of the
    (cohort, 0) cell — the denominator joins back from the tiny cell
    table itself (broadcast). Never a window over the raw event
    stream, no per-period scans.
    Output: (cohort, periods_since, n_active, cohort_size, retention).
    """
    firsts = df.groupBy(key_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("_cohort")
    )
    cells = (
        df.select(key_col, F.date_trunc(period, F.col(ts_col)).alias("_p"))
        .join(firsts, key_col)
        .select(
            key_col,
            F.col("_cohort").alias("cohort"),
            (F.datediff(F.col("_p"), F.col("_cohort")) / period_days)
            .cast("int")
            .alias("periods_since"),
        )
        .groupBy("cohort", "periods_since")
        .agg(F.countDistinct(key_col).alias("n_active"))
    )
    sizes = cells.filter(F.col("periods_since") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "periods_since",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def _stream_series(
    dec_in: DataFrame,
    order_cols: list[str],
    out_schema: str,
    out_names: list[str],
    init,
    step,
    pre_partitioned: bool,
) -> DataFrame:
    """Run an ordered per-key recurrence as ONE mapInPandas pass over
    key-contiguous partitions, many series per Arrow batch, state
    carried across batch boundaries.

    Why not groupBy().applyInPandas: that shape pays ~ms of Arrow/
    pandas setup PER GROUP, which dominates when series are small and
    numerous (measured: 1,500 trailing-24 series = 20k rows took ~9 s
    as per-group calls, ~1 s streamed). Telemetry data is exactly that
    shape at any scale — millions of short series — so the streaming
    form is the 100 TB design, not a micro-optimization.

    Requirements: each key's rows all live in one partition
    (``pre_partitioned=True`` when an upstream window already hash-
    partitioned on ``_k``; otherwise this repartitions), and
    ``sortWithinPartitions`` makes keys contiguous and rows ordered —
    no second exchange. ``step(state, x) -> (state, (out, ...))``
    runs in ``decimal.Decimal`` arithmetic, preserving the exact-
    determinism contract of the per-group form bit-for-bit.
    """
    if not pre_partitioned:
        dec_in = dec_in.repartition("_k")
    ordered = dec_in.sortWithinPartitions("_k", *order_cols)

    def run(batches):
        import pandas as pd

        cur_key = object()  # sentinel unequal to any real key
        state = None
        i = 0
        for pdf in batches:
            if not len(pdf):
                continue
            idx: list[int] = []
            outs: list[list] = [[] for _ in out_names]
            for k0, x in zip(pdf["_k"].tolist(), pdf["_x"].tolist()):
                if k0 != cur_key:
                    cur_key = k0
                    state = init()
                    i = 0
                state, vals = step(state, x)
                i += 1
                idx.append(i)
                for lst, v in zip(outs, vals):
                    lst.append(v)
            out = pd.DataFrame({"_k": pdf["_k"].values})
            out["i"] = pd.array(idx, dtype="int64")
            for c in order_cols:
                out[c] = pdf[c].values
            out["_x"] = pdf["_x"].values
            for name, lst in zip(out_names, outs):
                out[name] = lst
            yield out

    return ordered.mapInPandas(run, out_schema)


def ewma(
    df: DataFrame,
    key: str,
    value_col: str,
    order_cols: list[str],
    alpha: str = "0.25",
    last_k: int | None = None,
    scale: int = 12,
) -> DataFrame:
    """TS4 — exponentially weighted moving average per series: the
    per-key ORDERED recurrence y_i = α·x_i + (1−α)·y_{i−1} (seeded
    y_1 = x_1), which no built-in window function expresses (the
    weights depend on each row's distance from the current row).

    EXACT-DECIMAL determinism contract (same as operators/graph.py:
    pagerank and operators/regression.py): x enters as DECIMAL(18,6),
    every step quantizes α·x + (1−α)·y to ``scale`` decimal places
    HALF-UP in ``decimal.Decimal`` arithmetic — no binary floats
    anywhere in the recurrence — so the result is bit-identical under
    any partitioning AND a SQL engine can replay the recurrence with
    DECIMAL round(), value-checking the iterative op exactly.

    Scale notes (the 100 TB story):
    - ONE shuffle on the series key, then a streamed mapInPandas
      pass (_stream_series) with O(1) state per series — many series
      per Arrow batch, never one Python call per group; series are
      independent so skew = the longest single series.
    - ``last_k`` caps each series to its trailing-k rows (dropping
      the older tail BEFORE the recurrence) — the telemetry shape
      where only the recent window matters; it also bounds the depth
      a replaying oracle must recurse to.
    - Python is unavoidable here (data-dependent recurrence), so the
      boundary is Arrow-batched applyInPandas, never a row UDF.

    Returns (key, i, order_cols..., x DECIMAL(18,6), y DECIMAL(28,12))
    with i the 1-based position within the (possibly capped) series.
    """
    from decimal import ROUND_HALF_UP, Decimal

    a = Decimal(alpha)
    b = Decimal(1) - a
    q = Decimal(1).scaleb(-scale)
    dec_in = df.select(
        F.col(key).alias("_k"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast("decimal(18,6)").alias("_x"),
    )
    if last_k is not None:
        rdesc = F.row_number().over(
            Window.partitionBy("_k").orderBy(*[F.col(c).desc() for c in order_cols])
        )
        dec_in = dec_in.withColumn("_rdesc", rdesc).filter(F.col("_rdesc") <= last_k).drop("_rdesc")

    out_schema = (
        f"_k long, i long, "
        + ", ".join(f"{c} {t}" for c, t in zip(order_cols, _order_types(df, order_cols)))
        + ", _x decimal(18,6), _y decimal(28,12)"
    )

    def step(y, x):
        y = x if y is None else (a * x + b * y).quantize(q, ROUND_HALF_UP)
        return y, (y,)

    return _stream_series(
        dec_in, order_cols, out_schema, ["_y"],
        init=lambda: None, step=step, pre_partitioned=last_k is not None,
    ).withColumnsRenamed({"_k": key, "_x": "x", "_y": "y"})


def _order_types(df: DataFrame, cols: list[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[c] for c in cols]


def cusum(
    df: DataFrame,
    key: str,
    value_col: str,
    order_cols: list[str],
    target: str = "40",
    slack: str = "10",
    threshold: str = "400",
    last_k: int | None = None,
) -> DataFrame:
    """TS8 — two-sided CUSUM drift detection per series (Page '54):
    the sequential change-point statistic SPC/telemetry stacks run on
    every metric stream —

        hi_i = max(0, hi_{i-1} + (x_i - target - slack))
        lo_i = max(0, lo_{i-1} + (target - slack - x_i))

    alarming when either side exceeds ``threshold``. Like
    :func:`ewma` this is a data-dependent ordered recurrence no window
    function expresses; UNLIKE ewma it needs no multiplication at all,
    so the recurrence is pure DECIMAL add/subtract/max — exact with no
    quantization step, bit-identical under any partitioning, and a
    recursive CTE replays it verbatim.

    Scale shape: one shuffle on the series key, streamed via
    _stream_series (many series per Arrow batch — not one Python call
    per group), O(1) state per series; ``last_k`` caps each series to
    its trailing-k rows, bounding both memory and the replaying
    oracle's recursion.
    """
    from decimal import Decimal

    t = Decimal(target)
    k = Decimal(slack)
    h = Decimal(threshold)
    zero = Decimal(0)
    dec_in = df.select(
        F.col(key).alias("_k"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast("decimal(18,6)").alias("_x"),
    )
    if last_k is not None:
        rdesc = F.row_number().over(
            Window.partitionBy("_k").orderBy(*[F.col(c).desc() for c in order_cols])
        )
        dec_in = dec_in.withColumn("_rdesc", rdesc).filter(F.col("_rdesc") <= last_k).drop("_rdesc")

    out_schema = (
        "_k long, i long, "
        + ", ".join(f"{c} {t_}" for c, t_ in zip(order_cols, _order_types(df, order_cols)))
        + ", _x decimal(18,6), hi decimal(28,6), lo decimal(28,6), alarm int"
    )

    def step(state, x):
        hi, lo = state
        hi = max(zero, hi + (x - t - k))
        lo = max(zero, lo + (t - k - x))
        return (hi, lo), (hi, lo, 1 if (hi > h or lo > h) else 0)

    return _stream_series(
        dec_in, order_cols, out_schema, ["hi", "lo", "alarm"],
        init=lambda: (zero, zero), step=step, pre_partitioned=last_k is not None,
    )


def holt_linear(
    df: DataFrame,
    key: str,
    value_col: str,
    order_cols: list[str],
    alpha: str = "0.5",
    beta: str = "0.25",
    last_k: int | None = None,
    scale: int = 12,
) -> DataFrame:
    """TS10 — Holt double-exponential smoothing per series: EWMA plus a
    TREND state, the minimal forecasting recurrence —

        l_i = α·x_i + (1−α)·(l_{i−1} + b_{i−1})
        b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}

    seeded l_1 = x_1, b_1 = 0; one-step-ahead forecast = l_i + b_i.
    Same exact-decimal contract as :func:`ewma` (every state update
    quantizes to ``scale`` decimals HALF-UP in decimal arithmetic, no
    binary floats in the recurrence) so the two-state loop is
    bit-identical under any partitioning and a recursive CTE replays
    it verbatim. One shuffle, streamed via _stream_series, O(1)
    state per series.
    """
    from decimal import ROUND_HALF_UP, Decimal

    a = Decimal(alpha)
    na = Decimal(1) - a
    b_ = Decimal(beta)
    nb = Decimal(1) - b_
    q = Decimal(1).scaleb(-scale)
    dec_in = df.select(
        F.col(key).alias("_k"),
        *[F.col(c) for c in order_cols],
        F.col(value_col).cast("decimal(18,6)").alias("_x"),
    )
    if last_k is not None:
        rdesc = F.row_number().over(
            Window.partitionBy("_k").orderBy(*[F.col(c).desc() for c in order_cols])
        )
        dec_in = dec_in.withColumn("_rdesc", rdesc).filter(F.col("_rdesc") <= last_k).drop("_rdesc")

    out_schema = (
        "_k long, i long, "
        + ", ".join(f"{c} {t_}" for c, t_ in zip(order_cols, _order_types(df, order_cols)))
        + ", _x decimal(18,6), level decimal(28,12), trend decimal(28,12)"
    )

    def step(state, x):
        if state is None:
            lev, tr = Decimal(x), Decimal(0)
        else:
            prev, tr = state
            lev = (a * x + na * (prev + tr)).quantize(q, ROUND_HALF_UP)
            tr = (b_ * (lev - prev) + nb * tr).quantize(q, ROUND_HALF_UP)
        return (lev, tr), (lev, tr)

    return _stream_series(
        dec_in, order_cols, out_schema, ["level", "trend"],
        init=lambda: None, step=step, pre_partitioned=last_k is not None,
    )


def km_survival(
    grouped: DataFrame,
    key: str,
    t_col: str,
    d_col: str,
    n_col: str,
    scale_pow: int = 12,
) -> DataFrame:
    """AN10 — Kaplan-Meier product-limit survival estimator per
    cohort: S(t) = Π over event times u <= t of (1 - d_u / n_u).

    Input is the PRE-AGGREGATED life table — one row per (cohort,
    time): ``d_col`` deaths/churns at t, ``n_col`` at-risk count
    entering t (both integers; the at-risk column is a plain window
    cumulative subtraction upstream, no recurrence needed there).
    Only the cumulative PRODUCT is inherently sequential, and it runs
    in EXACT integer arithmetic: survival is carried as the scaled
    integer s (s_0 = 10**scale_pow) with

        s_t = (s_{t-1} * (n_t - d_t)) // n_t

    — floor division of exact integers, so any partitioning
    reproduces the same table bit-for-bit and a recursive CTE replays
    it verbatim with BIGINT ``//``. Rows with d_t = 0 (pure censoring)
    leave s EXACTLY unchanged (s*n//n == s). One shuffle on the
    cohort key, streamed via _stream_series, O(1) state per cohort.

    Returns (_k, i, <t_col>, _x, s) where _x = [d, n] and s is the
    scaled survival integer.
    """
    dec_in = grouped.select(
        F.col(key).alias("_k"),
        F.col(t_col),
        F.array(F.col(d_col).cast("long"), F.col(n_col).cast("long")).alias("_x"),
    )
    s0 = 10 ** scale_pow
    out_schema = (
        "_k string, i long, "
        + f"{t_col} long, _x array<long>, s long"
    )

    def step(state, x):
        d, n = int(x[0]), int(x[1])
        s = s0 if state is None else state
        s = (s * (n - d)) // n
        return s, (s,)

    return _stream_series(
        dec_in, [t_col], out_schema, ["s"], lambda: None, step, pre_partitioned=False
    )


def dtw_to_reference(
    series: DataFrame,
    reference: list[int],
    band: int = 2,
    key_col: str = "user_id",
    slot_col: str = "sl",
    value_col: str = "c",
) -> DataFrame:
    """TS15 — banded DYNAMIC TIME WARPING distance (Sakoe & Chiba 1978)
    from each key's integer series to a shared reference series: the
    alignment-tolerant similarity the plain L2 grid distance misses
    (a shifted-by-one-slot activity pattern scores near-0 under DTW,
    huge under pointwise distance) — the trajectory/seasonality
    matcher of a behavioral-analytics pipeline.

    DTW's recurrence is non-associative per key, so this is the
    textbook ``applyInPandas`` slot: one shuffle groups each key's L
    slots, then the O(L*band) DP runs Arrow-batched per key,
    embarrassingly parallel across keys — the per-key work is CONSTANT
    (L and band are fixed), so 100 TB of keys scales linearly with no
    cross-key communication. All arithmetic is exact integers
    (|a_i - b_j| costs, integer min), replayable by a staged
    anti-diagonal SQL oracle.
    """
    import pandas as pd

    ref = [int(v) for v in reference]
    n = len(ref)
    inf = 10**15

    def one_key(pdf: "pd.DataFrame") -> "pd.DataFrame":
        a = [0] * n
        for sl, c in zip(pdf[slot_col], pdf[value_col]):
            sl = int(sl)
            if not 0 <= sl < n:
                raise ValueError(
                    f"dtw_to_reference: slot {sl} outside reference length {n}"
                )
            a[sl] = int(c)
        # banded DP over (i, j), 1-indexed
        prev2: dict[tuple[int, int], int] = {}
        prev1: dict[tuple[int, int], int] = {}
        cur: dict[tuple[int, int], int] = {}
        for k in range(2, 2 * n + 1):
            cur = {}
            lo = max(1, k - n)
            for i in range(lo, min(n, k - 1) + 1):
                j = k - i
                if abs(i - j) > band:
                    continue
                cost = abs(a[i - 1] - ref[j - 1])
                if i == 1 and j == 1:
                    cur[(i, j)] = cost
                else:
                    best = min(
                        prev1.get((i - 1, j), inf),
                        prev1.get((i, j - 1), inf),
                        prev2.get((i - 1, j - 1), inf),
                    )
                    cur[(i, j)] = cost + best
            prev2, prev1 = prev1, cur
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "dtw": [cur[(n, n)]]}
        )

    key_type = dict(series.dtypes)[key_col]
    return series.groupBy(key_col).applyInPandas(
        one_key, schema=f"{key_col} {key_type}, dtw long"
    )
