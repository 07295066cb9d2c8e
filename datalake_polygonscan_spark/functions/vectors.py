"""Vector math over ``array<float>`` columns.

Two tiers, used by L2/L3 similarity operators:

- Catalyst expressions (``zip_with`` + ``aggregate``) — zero
  serialization, fine when a query evaluates them a bounded number of
  times per row (a cosine against a handful of broadcast queries).
- ``dot_pandas`` — Arrow-batched numpy for the *bulk pair-scoring*
  path: higher-order array functions are interpreted per element on
  the JVM, so half a million candidate pairs x 64 dims is ~2x slower
  than one einsum over the Arrow batch. Measured at sf0.1 (465k
  pairs): HOF dot ~7 s, numpy dot ~4 s end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


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


@pandas_udf(T.DoubleType())
def dot_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Σ aᵢ·bᵢ over an Arrow batch as one numpy einsum — the bulk
    pair-scoring tier (see module docstring). Rows where the two
    arrays differ in length are scored over the common prefix."""
    try:
        A = np.vstack(a.values).astype(float)
        B = np.vstack(b.values).astype(float)
        return pd.Series(np.einsum("ij,ij->i", A, B))
    except ValueError:  # ragged batch: fall back to per-row dots
        return pd.Series(
            [
                float(np.dot(np.asarray(x, dtype=float)[: min(len(x), len(y))],
                             np.asarray(y, dtype=float)[: min(len(x), len(y))]))
                for x, y in zip(a.values, b.values)
            ]
        )
