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


# ---------------------------------------------------------------------------
# A7 — from-scratch KLL quantile sketch
# ---------------------------------------------------------------------------


def _kll_rank_interval(data, est):
    """True rank of est as [P(x < est), P(x <= est)] — tie-aware: with
    heavy duplicates a single value legitimately spans a rank range."""
    import numpy as np

    a = np.asarray(data, dtype=float)
    return float((a < est).mean()), float((a <= est).mean())


def test_kll_rank_error_across_distributions():
    """Merged per-chunk sketches answer every decile within eps of the
    true rank, across shapes (normal/uniform/lognormal/sorted/dups)."""
    import numpy as np

    from datalake_polygonscan_spark.operators.sketches import KLLSketch

    rng = np.random.default_rng(11)
    datasets = {
        "normal": rng.normal(100, 15, 150_000),
        "uniform": rng.uniform(-5, 5, 150_000),
        "sorted_lognormal": np.sort(rng.lognormal(3, 1, 150_000)),
        "reverse_sorted": np.sort(rng.normal(0, 1, 150_000))[::-1].copy(),
        "heavy_dups": np.repeat(rng.integers(0, 50, 4000), 40).astype(float),
    }
    eps = 0.01
    for label, data in datasets.items():
        chunks = np.array_split(data, 32)
        merged = KLLSketch(512)
        for c in chunks:
            part = KLLSketch(512)
            part.update_batch(c)
            merged.merge(part)
        assert merged.n == len(data), label
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            (est,) = merged.quantiles([q])
            lo, hi = _kll_rank_interval(data, est)
            assert lo - eps <= q <= hi + eps, (label, q, est, lo, hi)


def test_kll_size_bound_independent_of_n():
    """Retained items stay O(k log(n/k)) <= 3k + 8*levels no matter how
    much data flows through — the property that makes the sketch a
    100 TB citizen."""
    import numpy as np

    from datalake_polygonscan_spark.operators.sketches import KLLSketch

    rng = np.random.default_rng(5)
    for k in (64, 256):
        for n in (10_000, 400_000):
            sk = KLLSketch(k)
            for c in np.array_split(rng.normal(0, 1, n), 8):
                sk.update_batch(c)
            assert sk.retained() <= 3 * k + 8 * len(sk.levels), (k, n, sk.retained())
            assert sk.n == n


def test_kll_weight_conservation_and_determinism():
    """Total weight always equals n (compaction halves count, doubles
    weight, exactly), and the alternating-parity compactor is
    bit-deterministic for a fixed feed order."""
    import numpy as np

    from datalake_polygonscan_spark.operators.sketches import KLLSketch

    rng = np.random.default_rng(3)
    data = rng.exponential(2.0, 60_000)

    def build():
        sk = KLLSketch(128)
        for c in np.array_split(data, 16):
            sk.update_batch(c)
        return sk

    a, b = build(), build()
    tot = sum(lv.size * (1 << i) for i, lv in enumerate(a.levels))
    assert tot == a.n == len(data)
    assert len(a.levels) == len(b.levels)
    for la, lb in zip(a.levels, b.levels):
        assert np.array_equal(la, lb)
    assert a.quantiles([0.5]) == b.quantiles([0.5])


def test_kll_spark_end_to_end_vs_exact(spark):
    """kll_quantiles over the lineitem parquet lands within the band of
    the exact percentiles, and ships only O(partitions * k) bytes."""
    from datalake_polygonscan_spark.operators.sketches import kll_quantiles

    li = load_table(spark, SF, "lineitem").repartition(16)
    n, est, retained = kll_quantiles(li, "l_extendedprice", [0.5, 0.9, 0.99], k=512)
    exact_n = li.filter(F.col("l_extendedprice").isNotNull()).count()
    assert n == exact_n
    assert retained <= 3 * 512 + 8 * 32
    vals = [r[0] for r in li.select(F.col("l_extendedprice").cast("double")).collect()]
    for q, e in zip((0.5, 0.9, 0.99), est):
        lo, hi = _kll_rank_interval(vals, e)
        assert lo - 0.01 <= q <= hi + 0.01, (q, e, lo, hi)


def test_an4_apriori_prune_is_lossless(spark):
    """AN4: computing rules after the a-priori item prune yields
    exactly the rules the unpruned computation finds above minsup —
    monotonicity means no frequent pair is lost."""
    import itertools

    rows = []
    # 40 baskets of frequent items, plus rare items that must prune away
    for i in range(40):
        rows += [(i, "A"), (i, "B")] if i % 2 == 0 else [(i, "A"), (i, "C")]
        if i < 2:
            rows.append((i, f"rare_{i}"))
    df = spark.createDataFrame(rows, "basket int, item string").distinct()
    n = 40
    minsup = 5
    # unpruned truth in plain python
    baskets = {}
    for b, it in rows:
        baskets.setdefault(b, set()).add(it)
    from collections import Counter

    pair_cnt = Counter()
    for its in baskets.values():
        for x, y in itertools.combinations(sorted(its), 2):
            pair_cnt[(x, y)] += 1
    truth = {p: c for p, c in pair_cnt.items() if c >= minsup}

    item_cnt = df.groupBy("item").count()
    freq = item_cnt.filter(F.col("count") >= minsup).select("item")
    fitems = df.join(F.broadcast(freq), "item")
    a = fitems.select("basket", F.col("item").alias("x"))
    b = fitems.select("basket", F.col("item").alias("y"))
    got = {
        (r.x, r.y): r.cnt
        for r in a.join(b, "basket")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= minsup)
        .collect()
    }
    assert got == truth
    assert n == 40


def test_kll_grouped_matches_exact_within_band(spark):
    """A7g: per-group sketch estimates land within the rank band of
    each group's own distribution, for skewed unequal group sizes."""
    import numpy as np

    from datalake_polygonscan_spark.operators.sketches import kll_grouped_quantiles

    rng = np.random.default_rng(23)
    rows = []
    for grp, n, mu in (("a", 30_000, 10.0), ("b", 2_000, 500.0), ("c", 120, -3.0)):
        for v in rng.normal(mu, abs(mu) * 0.1 + 1, n):
            rows.append((grp, float(v)))
    df = spark.createDataFrame(rows, "key string, v double").repartition(16)
    est = {
        r.key: (r.n, r.q_50, r.q_90)
        for r in kll_grouped_quantiles(df, "key", "v", [0.5, 0.9], k=512).collect()
    }
    by_grp = {}
    for grp, v in rows:
        by_grp.setdefault(grp, []).append(v)
    for grp, vals in by_grp.items():
        a = np.asarray(vals)
        n, e50, e90 = est[grp]
        assert n == len(vals)
        for q, e in ((0.5, e50), (0.9, e90)):
            lo, hi = float((a < e).mean()), float((a <= e).mean())
            assert lo - 0.01 <= q <= hi + 0.01, (grp, q, e)


def test_kmv_sketch_estimates_and_intersection(spark):
    """A10: KMV distinct estimates within 5x rse of truth; small sets
    below k are EXACT; intersection estimate tracks true overlap."""
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.sketches import (
        kmv_estimate,
        kmv_intersection,
        kmv_sketch,
    )

    k = 512
    # A = 0..19999, B = 10000..29999 -> |A|=|B|=20000, inter=10000
    a = spark.range(0, 20_000).select(F.col("id").alias("key")).repartition(8)
    b = spark.range(10_000, 30_000).select(F.col("id").alias("key")).repartition(8)
    sa, sb = kmv_sketch(a, "key", k), kmv_sketch(b, "key", k)
    rse = 5.0 / (k - 2) ** 0.5
    assert abs(kmv_estimate(sa, k) - 20_000) <= 20_000 * rse
    assert abs(kmv_estimate(sb, k) - 20_000) <= 20_000 * rse
    est_i = kmv_intersection(sa, sb, k)
    assert abs(est_i - 10_000) <= 30_000 * rse  # error scales with union
    # below-k set: sketch retains every distinct hash -> exact
    small = spark.range(0, 100).select(F.col("key") if False else F.col("id").alias("key"))
    ss = kmv_sketch(small, "key", k)
    assert kmv_estimate(ss, k) == 100.0
    # duplicates don't inflate the estimate
    dup = small.union(small).union(small)
    assert kmv_estimate(kmv_sketch(dup, "key", k), k) == 100.0
