"""A2 approx_count_distinct validation: the HLL++ estimate must land
within a small multiple of the requested relative standard deviation of
the exact distinct count (the sketch's accuracy contract — the reason
it is safe to substitute for countDistinct at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF, "lineitem")
    rsd = 0.01
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
    ).collect()[0]
    for col in ("orders", "parts"):
        exact, approx = row[f"exact_{col}"], row[f"approx_{col}"]
        # 5 sigma: deterministic sketch, so this either passes forever
        # or flags a real regression
        assert abs(approx - exact) <= max(5 * rsd * exact, 1), (col, exact, approx)


def test_approx_count_distinct_coarser_rsd_still_bounded(spark):
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.countDistinct("l_suppkey").alias("exact"),
        F.approx_count_distinct("l_suppkey", 0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(5 * 0.05 * row["exact"], 1)


def test_profile_table_one_scan_stats(spark):
    from datalake_polygonscan_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")],
        ["k", "s"],
    )
    out = {r.col_name: r for r in profile_table(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 1
    assert out["k"].n_distinct == 2          # distinct excludes NULL
    assert (out["k"].min_value, out["k"].max_value) == ("1", "2")
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")


def test_heavy_hitters_exact_vs_groupby_truth(spark):
    """A6: sketch candidates + exact recount must equal the plain
    groupBy/HAVING truth exactly, under adversarial partitioning."""
    from datalake_polygonscan_spark.operators.sketches import heavy_hitters

    rows = (
        [("hot",)] * 500
        + [("warm",)] * 120
        + [(f"cold_{i}",) for i in range(400)]
        + [(None,)] * 10
    )
    df = spark.createDataFrame(rows, "key string").repartition(16)  # scatter the hot key
    got = {
        (r.key, r.cnt)
        for r in heavy_hitters(df, "key", threshold_frac=0.05).collect()
    }
    n = 500 + 120 + 400  # nulls excluded
    truth = {("hot", 500), ("warm", 120)}
    assert got == truth
    # threshold boundary: exactly at ceil(theta*n) qualifies
    theta = 120 / n
    got2 = {r.key for r in heavy_hitters(df, "key", theta).collect()}
    assert got2 == {"hot", "warm"}


def test_heavy_hitters_full_recall_guarantee(spark):
    """Every theta-heavy key surfaces even when k is at the guarantee
    floor ceil(1/theta) and keys are spread across many partitions."""
    import random

    from datalake_polygonscan_spark.operators.sketches import heavy_hitters

    rng = random.Random(7)
    rows = []
    for hh in range(5):  # 5 heavy keys, 300 each
        rows += [(f"h{hh}",)] * 300
    rows += [(f"tail_{i}",) for i in range(3000)]  # long tail
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "key string").repartition(32)
    theta = 250 / len(rows)
    got = {r.key for r in heavy_hitters(df, "key", theta).collect()}
    assert got == {f"h{i}" for i in range(5)}


def test_heavy_hitters_rejects_bad_threshold(spark):
    import pytest

    from datalake_polygonscan_spark.operators.sketches import heavy_hitters

    df = spark.range(10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="threshold_frac"):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError, match="threshold_frac"):
        heavy_hitters(df, "k", 1.5)


def test_blocked_fuzzy_pairs_semantics(spark):
    """ER1: a within-block typo pair is found; identical-distance
    pairs in DIFFERENT blocks are never compared (blocking is a
    recall/cost trade the caller makes explicitly)."""
    from datalake_polygonscan_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "alice smith"),
            (2, "alice smyth"),   # 1 edit, same block 'ali'
            (3, "bob jones"),
            (4, "bob jonez"),     # 1 edit, same block 'bob'
            (5, "ali baba"),      # block 'ali', far from alice
            (6, "alice smitt"),   # 1 edit from #1, same block
        ],
        "id long, name string",
    )
    pairs = blocked_fuzzy_pairs(df, "id", "name", F.substring("name", 1, 3), max_edit=1)
    got = {(r.id_a, r.id_b, r.edit_distance) for r in pairs.collect()}
    assert (1, 2, 1) in got and (3, 4, 1) in got and (1, 6, 1) in got
    assert all(p[:2] != (1, 5) for p in got)  # same block, too far
    # (2,6): smyth->smitt is 2 edits — filtered
    assert all(p[:2] != (2, 6) for p in got)
