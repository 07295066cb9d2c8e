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
