"""ML3 — distributed logistic regression by full-batch gradient
descent, on Catalyst expressions only.

The Spark-native way to train a small linear model over a 100 TB
corpus: each iteration is ONE map-side-combined aggregate computing
the exact gradient (the shuffle carries a handful of partial sums, the
driver holds only the weight vector), the driver applies the update,
and the next iteration's plan embeds the new weights as literals. No
Python in the row path, no MLlib dependency, no data movement beyond
d+1 partial aggregates per iteration — the same shape as the k-means
tier (operators/clustering.py) applied to supervised learning.

Determinism contract (the reason a DuckDB oracle can replay training
bit-exactly): features and sigmoids are quantized to 6 decimals, so
every per-row product err*x is exact in a double (≤ 12 significant
decimal digits < 2^53) and converts exactly to DECIMAL(28,12); the
gradient is an EXACT decimal sum (order-insensitive — a float sum over
a shuffled corpus would not reproduce run-to-run, an exact decimal sum
does); the weight update w -= lr * g happens in exact decimal
arithmetic with a decimal learning rate, so the weights after any
number of iterations are exact rationals both engines agree on to the
last digit.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalake_polygonscan_spark.tables import tiny_df

#: learning rate as an exact decimal: weight updates stay exact
#: rationals (scale 12 + 3 = 15, stable across iterations)
LR = Decimal("0.001")
N_ITER = 5


def _zq(features: list[Column], weights: list[Decimal], bias: Decimal) -> Column:
    z = F.lit(float(bias))
    for w, x in zip(weights, features):
        z = z + F.lit(float(w)) * x
    return F.round(z, 6)


def sigmoid6(z: Column) -> Column:
    """round(1/(1+exp(-z)), 6): the quantized logistic link. Both
    engines compute exp within 1 ulp; rounding to 6 decimals makes a
    cross-engine flip astronomically unlikely (~1e-10 per value)."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def logistic_regression_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: Decimal = LR,
    n_iter: int = N_ITER,
) -> tuple[list[Decimal], Decimal]:
    """Train by full-batch GD; returns (weights, bias) as exact
    Decimals. ``feature_cols`` must already be 6-decimal-quantized
    doubles (see module docstring); ``label_col`` is 0.0/1.0."""
    # materialize the feature frame once: the loop would otherwise
    # re-derive it (scan + feature expressions) every iteration
    df = df.localCheckpoint(eager=True)
    feats = [F.col(c) for c in feature_cols]
    w = [Decimal(0) for _ in feature_cols]
    b = Decimal(0)
    for _ in range(n_iter):
        err = sigmoid6(_zq(feats, w, b)) - F.col(label_col)
        aggs = [
            F.sum(F.round(err * x, 12).cast("decimal(28,12)")).alias(f"g{i}")
            for i, x in enumerate(feats)
        ]
        aggs.append(F.sum(F.round(err, 12).cast("decimal(28,12)")).alias("gb"))
        row = df.agg(*aggs).collect()[0]
        w = [wi - lr * row[f"g{i}"] for i, wi in enumerate(w)]
        b = b - lr * row["gb"]
    return w, b


def predict(
    df: DataFrame, feature_cols: list[str], weights: list[Decimal], bias: Decimal
) -> Column:
    """Predicted probability column for the trained model — pure
    codegen, broadcast-free (the model IS the plan's literals)."""
    return sigmoid6(_zq([F.col(c) for c in feature_cols], weights, bias))


def boosted_regression_stumps(
    pts: DataFrame,
    rounds: int = 3,
    m_scale: int = 1024,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """ML14 — GRADIENT BOOSTING with depth-1 regression trees (Friedman
    2001, squared loss), the additive-ensemble recipe behind
    XGBoost/LightGBM, distributed the way those libraries do it: the
    raw rows collapse ONCE into per-feature-bin sufficient statistics
    (cnt, sum-residual, sum-residual-squared — the "hist" strategy),
    and every boosting round then runs entirely on that bounded bin
    table: one cumulative window scores all splits, the argmax is
    collected, and the bin statistics update in closed form
    (S' = S - cnt*u;  SS' = SS - 2*u*S + cnt*u^2), so per-round cost
    is O(bins), never another pass over the data.

    Exactness contract: residuals live in integer micro-units
    (``m_scale``x), leaf values are floor divisions (eta = 1/2 applied
    as a second floor-halving), and all updates are exact BIGINT — a
    SQL oracle replays every round verbatim. The split criterion
    S_L^2/n_L + S_R^2/n_R is evaluated as ONE IEEE-double expression
    over exact integers (bit-identical on any engine — floats only
    diverge when aggregation REORDERS them), ties to the smaller
    threshold.

    Returns a tagged union: one 'round' row per boosting round
    (threshold, leaf deltas, sizes) and one 'final' row with the exact
    integer SSE before/after and the monotone-improvement verdict.
    """
    spark = pts.sparkSession
    d = pts.groupBy(F.col(x_col).alias("x")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(y_col).cast("long").alias("sy"),
        F.sum(F.col(y_col) * F.col(y_col)).cast("long").alias("syy"),
    )
    tot = d.agg(
        F.sum("cnt").alias("n"), F.sum("sy").alias("sy"), F.sum("syy").alias("syy")
    ).collect()[0]
    n_total, sy_t = int(tot["n"]), int(tot["sy"])
    f0 = (sy_t * m_scale) // n_total  # floor division, exact
    m = m_scale
    d = d.select(
        "x", "cnt",
        (F.lit(m) * F.col("sy") - F.col("cnt") * F.lit(f0)).alias("s"),
        (
            F.lit(m * m) * F.col("syy")
            - F.lit(2 * f0 * m) * F.col("sy")
            + F.col("cnt") * F.lit(f0 * f0)
        ).alias("ss"),
    ).localCheckpoint(eager=True)
    sse0 = int(d.agg(F.sum("ss")).collect()[0][0])

    from pyspark.sql import Window

    cum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    glob = Window.partitionBy()
    round_rows = []
    for t in range(1, rounds + 1):
        c = d.select(
            "x",
            F.sum("cnt").over(cum).alias("n_l"),
            F.sum("s").over(cum).alias("s_l"),
            F.sum("cnt").over(glob).alias("n"),
            F.sum("s").over(glob).alias("s_t"),
        ).filter(F.col("n_l") < F.col("n"))
        crit = (
            F.col("s_l").cast("double") * F.col("s_l").cast("double") / F.col("n_l")
            + (F.col("s_t") - F.col("s_l")).cast("double")
            * (F.col("s_t") - F.col("s_l")).cast("double")
            / (F.col("n") - F.col("n_l"))
        )
        best = (
            c.select("x", "n_l", "s_l", "n", "s_t", crit.alias("crit"))
            .orderBy(F.desc("crit"), F.asc("x"))
            .limit(1)
            .collect()[0]
        )
        thr = int(best["x"])
        n_l, s_l = int(best["n_l"]), int(best["s_l"])
        n_r, s_r = int(best["n"]) - n_l, int(best["s_t"]) - s_l
        u_l = (s_l // n_l) // 2  # leaf value, then eta=1/2 — both floor
        u_r = (s_r // n_r) // 2
        round_rows.append((t, thr, u_l, u_r, n_l, n_r))
        u = F.when(F.col("x") <= thr, F.lit(u_l)).otherwise(F.lit(u_r))
        d = d.select(
            "x", "cnt",
            (F.col("s") - F.col("cnt") * u).alias("s"),
            (F.col("ss") - F.lit(2) * u * F.col("s") + F.col("cnt") * u * u).alias("ss"),
        ).localCheckpoint(eager=True)

    sse_final = int(d.agg(F.sum("ss")).collect()[0][0])
    out_rounds = tiny_df(
        spark,
        round_rows,
        "round_no long, thr long, u_l long, u_r long, n_left long, n_right long",
    ).select(
        F.lit("round").alias("mode"), "round_no", "thr", "u_l", "u_r",
        "n_left", "n_right",
        F.lit(None).cast("long").alias("sse0"),
        F.lit(None).cast("long").alias("sse_final"),
        F.lit(None).cast("boolean").alias("improved"),
    )
    final = tiny_df(
        spark,
        [(sse0, sse_final, sse_final <= sse0)], "sse0 long, sse_final long, improved boolean"
    ).select(
        F.lit("final").alias("mode"),
        *[F.lit(None).cast("long").alias(c)
          for c in ("round_no", "thr", "u_l", "u_r", "n_left", "n_right")],
        "sse0", "sse_final", "improved",
    )
    return out_rounds.unionByName(final)


def isotonic_fit_grouped(
    buckets: DataFrame,
    group_col: str = "grp",
    x_col: str = "x",
    weight_col: str = "w",
    ysum_col: str = "s",
) -> DataFrame:
    """ML19 — EXACT isotonic regression per group by POOL-ADJACENT-
    VIOLATORS (Ayer et al. 1955; the calibration mapping of Zadrozny &
    Elkan 2002): fit the least-squares NON-DECREASING step function to
    per-bucket (weight, y-sum) pairs ordered by ``x_col``.

    Input is the already-collapsed bucket table (one partial-agg
    shuffle upstream turns N rows into |groups x buckets| rows), so
    the per-group PAV runs over a CONSTANT-size series inside ONE
    applyInPandas shuffle — the TS15/DTW slot: per-group work is O(n)
    with exact INTEGER block arithmetic (violator comparison by
    cross-multiplication ``s_prev * w_cur > s_cur * w_prev`` — no
    float drift can merge the wrong blocks), embarrassingly parallel
    across groups, zero cross-group communication.

    The fitted value of a bucket is its final block's s/w — emitted as
    exact BIGINT (block_s, block_w) plus the IEEE-double ratio, which
    is correctly-rounded division of exact integers and therefore
    bit-identical in any engine evaluating the same rational (what
    lets the max-min-formula SQL oracle replay the fit exactly:
    fit_i = max_{j<=i} min_{k>=i} avg(y[j..k]) is the textbook
    closed form of PAV).

    Returns (group, x, w, s, block_s, block_w, fit).
    """
    import pandas as pd

    def pav(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        # blocks: [w, s, count] with exact ints; merge while decreasing
        blocks: list[list[int]] = []
        for w, s in zip(pdf[weight_col], pdf[ysum_col]):
            blocks.append([int(w), int(s), 1])
            while len(blocks) >= 2:
                w2, s2, c2 = blocks[-1]
                w1, s1, c1 = blocks[-2]
                if s1 * w2 > s2 * w1:  # prev mean > cur mean: violator
                    blocks[-2] = [w1 + w2, s1 + s2, c1 + c2]
                    blocks.pop()
                else:
                    break
        bs, bw = [], []
        for w, s, c in blocks:
            bs += [s] * c
            bw += [w] * c
        out = pdf.copy()
        out["block_s"] = bs
        out["block_w"] = bw
        out["fit"] = [s / w for s, w in zip(bs, bw)]
        return out

    schema = (
        f"{group_col} string, {x_col} long, {weight_col} long, {ysum_col} long, "
        "block_s long, block_w long, fit double"
    )
    return (
        buckets.select(group_col, x_col, weight_col, ysum_col)
        .groupBy(group_col)
        .applyInPandas(pav, schema=schema)
    )
