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
