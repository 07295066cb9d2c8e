"""A6 — distributed HEAVY HITTERS via mergeable frequency summaries.

The 100 TB problem: "which keys exceed θ of the table" via a plain
``groupBy(key).count()`` shuffles EVERY distinct key — at billions of
distinct keys the shuffle is the table. The sketch route (Misra-Gries
/ SpaceSaving family; Agarwal et al., "Mergeable Summaries", PODS '12)
keeps k counters per partition, so the shuffle carries at most
k × partitions candidate rows regardless of key cardinality.

Two phases, both exact in what they claim:

1. **Candidate generation** (one scan, Arrow-batched): each partition
   emits its top-k keys with the (k+1)-th count subtracted — the
   classic deficiency trick that turns an exact partition count into a
   Misra-Gries-equivalent summary with per-partition error
   <= n_p/(k+1). Summed across partitions the deficiency telescopes:
   any key with GLOBAL count C > n/(k+1) has
   Σ_p max(c_p - n_p/(k+1), 0) >= C - n/(k+1) > 0, so it surfaces in
   at least one partition's summary. With k >= ceil(1/θ) the
   candidate set provably contains EVERY θ-heavy key (full recall by
   pigeonhole, no probabilistic qualifier).

2. **Exact recount** (one scan): the candidate keys — a set bounded
   by k × partitions, broadcast — are exactly counted and filtered by
   the threshold. False candidates die here, so the OUTPUT is exactly
   ``HAVING count(*) >= ceil(θ·n)``: a closed-form SQL oracle checks
   it value-for-value, unlike estimate-emitting sketches.

The same shape at 100 TB: phase 1's shuffle is O(k × partitions),
phase 2's is O(candidates); the full key cardinality never shuffles.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key_col: str, threshold_frac: float, k: int | None = None
) -> DataFrame:
    """Keys of ``df[key_col]`` occurring in at least ``threshold_frac``
    of all rows (count >= ceil(threshold_frac * n)), found with
    bounded-size mergeable summaries + an exact recount.

    ``k`` (counters per partition) defaults to ``ceil(1/threshold_frac)``,
    the smallest value guaranteeing full recall of θ-heavy keys.
    Returns (key, cnt, frac) — exact counts, deterministic.
    """
    if not (0 < threshold_frac <= 1):
        raise ValueError(f"threshold_frac must be in (0,1], got {threshold_frac}")
    k = k if k is not None else math.ceil(1.0 / threshold_frac)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    keyed = df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull())
    out_schema = keyed.schema

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Misra-Gries merge applied INCREMENTALLY per Arrow batch: the
        # running summary never exceeds k counters, so executor memory
        # is O(k + batch-distinct), not O(partition-distinct). Each
        # reduce-to-k subtracts the (k+1)-th count — deficiencies
        # telescope, total error <= n_p/(k+1) (Agarwal et al. PODS'12
        # merge theorem), so every theta-heavy key still surfaces.
        counts: pd.Series | None = None
        for pdf in batches:
            c = pdf["key"].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
            if len(counts) > k:
                counts = counts.sort_values(ascending=False)
                err = int(counts.iloc[k])
                counts = counts.head(k) - err
                counts = counts[counts > 0]
        if counts is None or counts.empty:
            return
        # emit each surviving key once — candidates only; the exact
        # count comes from phase 2, so the summary's lower bounds
        # never leak into the output
        yield pd.DataFrame({"key": counts.index.to_numpy()})

    candidates = keyed.mapInPandas(summarize, schema=out_schema).distinct()

    total = keyed.agg(F.count("*").alias("_n"))
    exact = (
        keyed.join(F.broadcast(candidates), "key", "inner")
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(threshold_frac) * F.col("_n")))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_n"), 6).alias("frac"),
        )
    )
    return exact


# ---------------------------------------------------------------------------
# A7 — KLL quantile sketch (Karnin, Lang, Liberty: "Optimal Quantile
# Approximation in Streams", FOCS 2016), built from scratch.
#
# The 100 TB problem: exact quantiles need a global sort (the whole
# table through one shuffle). Spark's percentile_approx (A5b) solves
# it with a Greenwald-Khanna-family sketch; this is the modern
# replacement every warehouse (Druid, DataSketches, DuckDB's
# approx_quantile) converged on: a hierarchy of fixed-capacity
# compactors where level i holds items of weight 2^i. Per-partition
# sketches are O(k log(n/k)) floats; merging is concatenate+compact.
# The rank error is eps*n with eps = O(1/k), so k=256 gives ~0.4%
# rank error regardless of n — the sketch size NEVER depends on the
# table size, which is the whole point at 100 TB.
#
# This implementation is DETERMINISTIC for a fixed partitioning: the
# classic KLL flips a fair coin per compaction to pick the surviving
# parity; we alternate parity per level instead (the derandomization
# noted in the paper's practical follow-up, DataSketches' default
# "deterministic bit pattern" mode). Bounds degrade from
# probabilistic to empirical, so the graded entry VERIFIES the rank
# error against the data (A5b's measured-metric pattern) instead of
# trusting the constant.
# ---------------------------------------------------------------------------

import numpy as np


class KLLSketch:
    """Mergeable KLL quantile sketch over float64 values.

    ``levels[i]`` holds retained items of weight ``2**i``; level 0 is
    the raw buffer. Capacity of level i shrinks geometrically (ratio
    2/3) from the top, so total retained items are <= ~3k + 8 per
    level — independent of n.
    """

    C = 2.0 / 3.0

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def _capacity(self, lvl: int, height: int) -> int:
        # top level gets k, each level below shrinks by C, floor 8
        return max(8, int(math.ceil(self.k * (self.C ** (height - 1 - lvl)))))

    def update_batch(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()

    def _compress(self) -> None:
        while True:
            h = len(self.levels)
            for i in range(h):
                if self.levels[i].size > self._capacity(i, h):
                    self._compact(i)
                    break
            else:
                return

    def _compact(self, i: int) -> None:
        buf = np.sort(self.levels[i], kind="stable")
        if buf.size % 2 == 1:
            # keep the max at this level so the compacted count is
            # even (weights must double exactly)
            keep, buf = buf[-1:], buf[:-1]
        else:
            keep = np.empty(0, dtype=np.float64)
        survivors = buf[self.parity[i]:: 2]
        self.parity[i] ^= 1  # deterministic alternating parity
        self.levels[i] = keep
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], survivors])

    def retained(self) -> int:
        return int(sum(lv.size for lv in self.levels))

    def quantiles(self, qs: list[float]) -> list[float]:
        if self.n == 0:
            raise ValueError("empty sketch")
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(lv.size, 1 << i, dtype=np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        out = []
        for q in qs:
            if not (0.0 <= q <= 1.0):
                raise ValueError(f"quantile must be in [0,1], got {q}")
            target = q * self.n
            idx = int(np.searchsorted(cum, target, side="left"))
            out.append(float(vals[min(idx, vals.size - 1)]))
        return out

    # -- Spark serialization -------------------------------------------------

    def to_row(self) -> dict:
        return {
            "n": self.n,
            "levels": [lv.tolist() for lv in self.levels],
        }

    @classmethod
    def from_row(cls, row, k: int) -> "KLLSketch":
        sk = cls(k)
        sk.n = int(row["n"])
        sk.levels = [np.asarray(lv, dtype=np.float64) for lv in row["levels"]]
        sk.parity = [0] * len(sk.levels)
        return sk


def kll_partials(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """One serialized KLL sketch row per partition of ``df[value_col]``.

    The map side of the mergeable-summaries shape (same as
    ``heavy_hitters``): each partition streams its Arrow batches into
    a local sketch and emits ONE row of O(k log(n_p/k)) doubles — the
    only data that ever leaves the executor.
    """
    sel = df.select(F.col(value_col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = KLLSketch(k)
        for pdf in batches:
            sk.update_batch(pdf["v"].to_numpy(dtype=np.float64))
        if sk.n:
            row = sk.to_row()
            yield pd.DataFrame({"n": [row["n"]], "levels": [row["levels"]]})

    return sel.mapInPandas(build, schema="n long, levels array<array<double>>")


def kll_quantiles(
    df: DataFrame, value_col: str, qs: list[float], k: int = 256
) -> tuple[int, list[float], int]:
    """Estimate quantiles ``qs`` of ``df[value_col]`` with a KLL sketch.

    Returns ``(n, estimates, retained)``: the exact non-null count,
    one estimate per q, and the total items the merged sketch
    retained (to assert the O(k log(n/k)) bound). The driver merge is
    over at most #partitions sketch rows — bytes shipped are
    O(partitions * k log(n/k)), never O(n).
    """
    rows = kll_partials(df, value_col, k).collect()
    if not rows:
        raise ValueError(f"no non-null values in {value_col}")
    merged = KLLSketch.from_row(rows[0], k)
    for r in rows[1:]:
        merged.merge(KLLSketch.from_row(r, k))
    merged._compress()
    return merged.n, merged.quantiles(qs), merged.retained()


def kll_grouped_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs: list[float],
    k: int = 256,
) -> DataFrame:
    """Per-group quantile estimates, one KLL sketch per key, built in
    a single shuffle: applyInPandas groups on the key, each group
    streams through its own compactor hierarchy, and only the
    estimates leave the executor (one row per key — never the group's
    values). At 100 TB this is THE grouped-quantile plan: the
    alternative exact per-group sort ships every row; this ships
    O(keys x |qs|) doubles.

    Returns (key, n, q_<pct>... one column per requested quantile).
    """
    import numpy as np

    qcols = [f"q_{int(round(q * 100)):02d}" for q in qs]
    schema = (
        f"key {dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[key_col]}, "
        "n long, " + ", ".join(f"{c} double" for c in qcols)
    )
    sel = df.select(
        F.col(key_col).alias("key"), F.col(value_col).cast("double").alias("v")
    ).filter(F.col("v").isNotNull())

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k)
        sk.update_batch(pdf["v"].to_numpy(dtype=np.float64))
        est = sk.quantiles(qs)
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "n": [sk.n],
             **{c: [e] for c, e in zip(qcols, est)}}
        )

    return sel.groupBy("key").applyInPandas(per_group, schema=schema)


# ---------------------------------------------------------------------------
# A10 — KMV ("k minimum values" / bottom-k, the theta-sketch family:
# Beyer et al. SIGMOD'07; Dasgupta et al., "Theta sketches") for
# distinct counting WITH SET OPERATIONS. HLL (A2/MV4) unions cleanly
# but cannot intersect; KMV keeps the k smallest distinct hash values,
# so two sketches can be intersected: the union sketch's threshold
# theta = k-th smallest of the merged mins, est_distinct = (k-1)/theta
# (hashes uniform in [0,1)), and the Jaccard estimate is the fraction
# of the union's retained mins present in BOTH input sketches.
# ---------------------------------------------------------------------------

_KMV_SCALE = float(1 << 63)  # xxhash64 & MAX_LONG mapped into [0, 1)


def kmv_partials(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition bottom-k distinct hash sets: one mapInPandas scan,
    each partition emits <= k longs — the mergeable-summary shape
    (same as heavy_hitters / kll_partials)."""
    hashed = df.select(
        F.abs(F.xxhash64(F.col(key_col).cast("string"))).alias("h")
    ).filter(F.col("h").isNotNull())

    def bottom_k(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        best: np.ndarray | None = None
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64)
            cand = h if best is None else np.concatenate([best, h])
            cand = np.unique(cand)  # sorted distinct
            best = cand[:k]
        if best is not None and best.size:
            yield pd.DataFrame({"h": best})

    return hashed.mapInPandas(bottom_k, schema="h long")


def kmv_sketch(df: DataFrame, key_col: str, k: int = 1024) -> list[int]:
    """The k smallest distinct hashes of ``df[key_col]`` (fewer if the
    column has fewer distincts). Driver merge is over <= partitions*k
    longs."""
    import numpy as np

    rows = kmv_partials(df, key_col, k).collect()
    if not rows:
        return []
    merged = np.unique(np.array([r["h"] for r in rows], dtype=np.int64))
    return [int(x) for x in merged[:k]]


def kmv_estimate(mins: list[int], k: int) -> float:
    """Distinct-count estimate (k-1)/theta; exact len() when the
    sketch never filled (every distinct hash is retained)."""
    if len(mins) < k:
        return float(len(mins))
    theta = mins[k - 1] / _KMV_SCALE
    return (k - 1) / theta


def kmv_intersection(a: list[int], b: list[int], k: int) -> float:
    """Estimated distinct count of A ∩ B from two same-k sketches:
    union sketch = k smallest of (a ∪ b); Jaccard-hat = fraction of
    the union's retained mins present in both; est = jaccard * est(U)."""
    import numpy as np

    ua = np.array(a, dtype=np.int64)
    ub = np.array(b, dtype=np.int64)
    union = np.unique(np.concatenate([ua, ub]))[:k]
    in_both = np.intersect1d(union, np.intersect1d(ua, ub, assume_unique=True))
    jac = in_both.size / union.size if union.size else 0.0
    return jac * kmv_estimate([int(x) for x in union], k)


# ---------------------------------------------------------------------------
# A11 — HyperLogLog from scratch (Flajolet et al., AofA'07)
# ---------------------------------------------------------------------------

def hll_registers(df: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """Dense HLL register table for ``df[key_col]``: bucket = low ``p``
    bits of xxhash64, rho = leading-zero run of the remaining 64-p bits
    + 1, registers = ``groupBy(bucket).max(rho)``.

    100 TB shape: the register build is ONE map-side-combinable
    groupBy whose shuffle carries at most 2^p rows per partition
    regardless of input cardinality — the canonical mergeable-sketch
    contract (merging two registers tables is the same max-groupBy).
    All-JVM: xxhash64 + bit ops + length(bin()) — bin() is an exact
    bit-length (no float log2 off-by-one at power-of-two boundaries).
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    keyed = df.select(F.col(key_col).alias("k")).filter(F.col("k").isNotNull())
    h = F.xxhash64(F.col("k"))
    w = F.expr(f"shiftrightunsigned(xxhash64(k), {p})")
    rho = (
        F.when(w == 0, F.lit(64 - p + 1))
        .otherwise(F.lit(64 - p + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        keyed.select(h.bitwiseAND(F.lit(m - 1)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate(registers: DataFrame, p: int = 12) -> float:
    """Distinct-count estimate from a register table: raw HLL
    harmonic mean with the standard small-range linear-counting
    correction (E <= 2.5m with empty registers). Deterministic given
    the fixed xxhash64 — the same input always yields the same
    estimate on any cluster/partitioning."""
    import math as _math

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    row = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("s"),
        F.count("*").alias("present"),
    ).collect()[0]
    s = float(row["s"] or 0.0)
    zeros = m - int(row["present"])
    e = alpha * m * m / (s + zeros)  # absent registers contribute 2^-0 = 1
    if e <= 2.5 * m and zeros > 0:
        return m * _math.log(m / zeros)
    return e


# ---------------------------------------------------------------------------
# A12 — count-min sketch (Cormode & Muthukrishnan, J.Alg'05)
# ---------------------------------------------------------------------------

def cms_build(df: DataFrame, key_col: str, depth: int = 4, width: int = 2048) -> DataFrame:
    """Count-min sketch as a (row, bucket, cnt) table: ``depth``
    independent xxhash64 seeds (seed folded in as a literal first
    column), each key increments one bucket per row.

    100 TB shape: one posexplode + map-side-combinable groupBy; the
    shuffle carries at most depth x width rows per partition no matter
    the key cardinality, and two sketches merge by summing cells."""
    buckets = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(width))
            for i in range(depth)
        ]
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimates(
    cms: DataFrame, keys_df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Point-frequency estimates for ``keys_df[key_col]``: min over the
    ``depth`` rows of the sketch cell each key hashes into. The sketch
    side is tiny (<= depth*width rows) and broadcast; estimates carry
    the one-sided CM guarantee est >= exact, est <= exact + eps*N
    w.h.p. (eps = e/width)."""
    probes = keys_df.select(
        F.col(key_col).alias("key"),
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(width))
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est"))
    )
