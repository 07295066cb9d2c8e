"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

Used by L3 similarity search. Staying in higher-order functions
(``zip_with`` + ``aggregate``) keeps the math inside whole-stage
codegen: no Python round-trip, no Arrow batch hop, and the expressions
vectorize per-row on the JVM. A pandas-UDF fallback exists in
operators/similarity.py for matrix-shaped batches (BLAS beats per-row
loops when k*dim is large), but for 64-dim embeddings the expression
path wins by avoiding serialization entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as double."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a|·|b|); NULL when either norm is 0."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, d / denom)
