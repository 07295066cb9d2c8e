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
