"""ER1 — ENTITY RESOLUTION / record linkage: blocked fuzzy matching.

The classic structured-data dedup problem (Fellegi-Sunter record
linkage; Christen, "Data Matching", 2012): find record pairs that
refer to the same entity despite typos — names, addresses, product
titles. The naive form is an O(n²) all-pairs edit-distance scan; the
production form is BLOCKING (Christen's survey, TKDE 2012): a cheap
deterministic key partitions records so only within-block pairs are
compared — the same shuffle shape as the MinHash/LSH text tier
(operators/dedup.py), but for structured strings with edit-distance
semantics built-ins can score (``levenshtein`` is JVM codegen in
Spark AND exists in DuckDB, so the whole pipeline is oracle-checkable
value-for-value — no engine-local hashing anywhere).

At 100 TB: the block key is the shuffle key (never all-pairs); block
sizes bound the quadratic term at Σ b_i² like every blocked join in
this repo; skewed blocks are visible in the output (n_candidates per
block) and fixable by refining the key.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_key: Column,
    max_edit: int = 1,
) -> DataFrame:
    """Within-block candidate pairs scored by Levenshtein distance:
    records sharing ``block_key`` equi-join (id_a < id_b normalizes),
    pairs with distance <= ``max_edit`` survive. Returns
    (block, id_a, id_b, name_a, name_b, edit_distance)."""
    keyed = df.select(
        block_key.alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    )
    a = keyed.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("name_a"),
    )
    b = keyed.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("name_b"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= max_edit)
        .select(
            F.col("_blk").alias("block"),
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            "edit_distance",
        )
    )


def block_match_profile(
    df: DataFrame, block_key: Column, pairs: DataFrame
) -> DataFrame:
    """Per-block linkage profile: record count, candidate-pair count
    (the quadratic term the blocking strategy must keep bounded — the
    skew report), and surviving match count."""
    cand = (
        df.select(block_key.alias("block"))
        .groupBy("block")
        .agg(F.count("*").alias("n_records"))
        .withColumn(
            "n_candidates",
            (F.col("n_records") * (F.col("n_records") - 1) / 2).cast("long"),
        )
    )
    matched = pairs.groupBy("block").agg(F.count("*").alias("n_matches"))
    return cand.join(matched, "block", "left").select(
        "block",
        "n_records",
        "n_candidates",
        F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
    )


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """From-scratch Jaro-Winkler similarity (Winkler '90) — the other
    canonical linkage scorer (edit distance treats transpositions as
    two errors; JW half-credits nearby-character matches and boosts
    shared prefixes, the right bias for names/titles).

    Implements the textbook definition exactly: match window
    max(|a|,|b|)/2 - 1, greedy left-to-right match flags,
    transpositions = half the out-of-order matched chars, Winkler
    prefix boost (<= 4 chars) applied only above the 0.7 jaro
    threshold. Verified bit-identical to DuckDB's builtin
    jaro_winkler_similarity across boost/no-boost/empty cases — the
    oracle cross-validates this implementation value-for-value."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    win = max(l1, l2) // 2 - 1
    if win < 0:
        win = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = 0 if i < win else i - win
        hi = min(l2, i + win + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > boost_threshold:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        return j + l * prefix_scale * (1.0 - j)
    return j


def blocked_jw_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_key: Column,
    min_sim: float = 0.9,
) -> DataFrame:
    """Within-block candidate pairs scored by the from-scratch
    Jaro-Winkler above via an Arrow-batched pandas UDF (the scorer has
    no JVM builtin, so this IS the legitimate Python-boundary case —
    one vectorized batch transfer per partition, never row-at-a-time
    Py4J). Same blocking shuffle shape as :func:`blocked_fuzzy_pairs`:
    the quadratic term stays Σ b_i² within blocks."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    keyed = df.select(
        block_key.alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    )
    a = keyed.select("_blk", F.col("_id").alias("id_a"), F.col("_txt").alias("name_a"))
    b = keyed.select("_blk", F.col("_id").alias("id_b"), F.col("_txt").alias("name_b"))
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jw", _jw(F.col("name_a"), F.col("name_b")))
        .filter(F.col("jw") >= min_sim)
        .select(F.col("_blk").alias("block"), "id_a", "id_b", "jw")
    )
