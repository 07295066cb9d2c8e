"""ML3 — distributed logistic regression (operators/regression.py):
exact-decimal gradient descent must be deterministic, the gradient
must match a numpy reference, and the registry entry's model must
genuinely learn (beat the majority-class baseline)."""

from __future__ import annotations

from decimal import Decimal

import numpy as np

from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.regression import (
    logistic_regression_gd,
    predict,
)


def _toy(spark, n=200, seed=3):
    rng = np.random.RandomState(seed)
    x0 = np.round(rng.uniform(-0.5, 0.5, n), 6)
    x1 = np.round(rng.uniform(-0.3, 0.3, n), 6)
    y = (x0 + 0.5 * x1 > 0).astype(float)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x0, x1, y)]
    return spark.createDataFrame(rows, ["x0", "x1", "y"]), x0, x1, y


def test_gd_learns_separable_toy(spark):
    df, x0, x1, y = _toy(spark)
    w, b = logistic_regression_gd(df, ["x0", "x1"], "y", lr=Decimal("0.01"), n_iter=10)
    p = predict(df, ["x0", "x1"], w, b)
    acc = df.select(
        F.avg(F.when((p >= 0.5) == (F.col("y") == 1.0), 1.0).otherwise(0.0)).alias("a")
    ).collect()[0]["a"]
    base = max(y.mean(), 1 - y.mean())
    assert acc > base + 0.1, (acc, base)
    assert float(w[0]) > 0 and float(w[1]) > 0  # learned the true signs


def test_gd_is_deterministic_across_runs_and_partitionings(spark):
    df, *_ = _toy(spark)
    w1, b1 = logistic_regression_gd(df.repartition(7), ["x0", "x1"], "y", n_iter=3)
    w2, b2 = logistic_regression_gd(df.repartition(2), ["x0", "x1"], "y", n_iter=3)
    # exact-decimal gradients: bit-identical whatever the partitioning
    assert w1 == w2 and b1 == b2


def test_first_gradient_matches_numpy_reference(spark):
    df, x0, x1, y = _toy(spark)
    w, b = logistic_regression_gd(df, ["x0", "x1"], "y", lr=Decimal("0.01"), n_iter=1)
    # p = round(sigmoid(round(0,6)),6) = 0.5 exactly on iteration 1
    err = 0.5 - y
    g0 = np.sum(np.round(err * x0, 12))
    g1 = np.sum(np.round(err * x1, 12))
    gb = np.sum(np.round(err, 12))
    assert abs(float(w[0]) - (-0.01 * g0)) < 1e-9
    assert abs(float(w[1]) - (-0.01 * g1)) < 1e-9
    assert abs(float(b) - (-0.01 * gb)) < 1e-9


def test_registry_model_beats_majority_baseline(spark):
    from datalake_polygonscan_spark.queries.registry import REGISTRY

    row = REGISTRY["ml3_logreg_quality"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    share = docs.select(
        F.avg(F.when(F.length("text") >= 300, 1.0).otherwise(0.0)).alias("s")
    ).collect()[0]["s"]
    base = max(share, 1 - share)
    assert row["train_accuracy"] > base + 0.2, (row["train_accuracy"], base)


def test_bench_headline_names_resolve():
    """bench.py is driver-executed; a renamed registry entry must fail
    HERE, not in the round's one benchmark run."""
    import bench

    from datalake_polygonscan_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench.HEADLINE references unknown entries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dupes


def test_kfold_cv_moment_subtraction_equals_direct_training(spark, tmp_path):
    """The crux of ML12: train-fold sufficient statistics obtained by
    SUBTRACTING the held-out fold from the totals must produce exactly
    the model a direct train-only regression would — verified against
    numpy lstsq per fold at 1e-9."""
    import datetime as dtm

    import numpy as np

    from datalake_polygonscan_spark.queries import REGISTRY

    rng = np.random.RandomState(5)
    base = dtm.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        xs = int(rng.randint(0, 10_000))
        val = 0.5 + 0.003 * xs + float(rng.randn()) * 0.2
        rows.append((i, base + dtm.timedelta(seconds=xs), int(i % 13),
                     "purchase", round(val, 4), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(f"{tmp_path}/events.parquet")
    got = {r["fold"]: r for r in REGISTRY["ml12_kfold_cv"].fn(spark, str(tmp_path)).collect()}
    pts = [(int((r[1] - base).total_seconds()), int(np.floor(r[4] * 10000 + 0.5)), r[0] % 5)
           for r in rows]
    for f in range(5):
        train = [(x, y) for x, y, ff in pts if ff != f]
        A = np.array([[x, 1.0] for x, _ in train])
        b = np.array([float(y) for _, y in train])
        slope, intercept = np.linalg.lstsq(A, b, rcond=None)[0]
        assert abs(got[f]["slope_ticks_per_sec"] - slope) < 1e-6
        assert abs(got[f]["intercept"] - intercept / 10000.0) < 1e-5
        assert got[f]["n_train"] == len(train)


def test_boosted_stumps_match_pure_python_replay(spark):
    """Every boosting round (threshold, leaf values, sizes) and the
    final SSE must match an independent pure-Python replay over the
    same points — and SSE must never increase."""
    from datalake_polygonscan_spark.operators.regression import (
        boosted_regression_stumps,
    )

    rows = [((i * 7) % 13, (i * 3) % 5 + 1) for i in range(300)]
    pts = spark.createDataFrame(rows, "x long, y long")
    out = boosted_regression_stumps(pts, rounds=3, m_scale=1024).collect()
    got_rounds = {int(r["round_no"]): r for r in out if r["mode"] == "round"}
    got_final = next(r for r in out if r["mode"] == "final")

    # pure-Python replay on per-bin sufficient statistics
    import collections

    m = 1024
    agg = collections.defaultdict(lambda: [0, 0, 0])  # cnt, sy, syy
    for x, y in rows:
        a = agg[x]
        a[0] += 1
        a[1] += y
        a[2] += y * y
    n = sum(a[0] for a in agg.values())
    f0 = (sum(a[1] for a in agg.values()) * m) // n
    d = {x: (a[0], m * a[1] - a[0] * f0,
             m * m * a[2] - 2 * f0 * m * a[1] + a[0] * f0 * f0)
         for x, a in agg.items()}
    sse0 = sum(v[2] for v in d.values())
    for t in range(1, 4):
        xs = sorted(d)
        n_t = sum(d[x][0] for x in xs)
        s_t = sum(d[x][1] for x in xs)
        best, best_crit = None, None
        n_l = s_l = 0
        for x in xs:
            n_l += d[x][0]
            s_l += d[x][1]
            if n_l >= n_t:
                break
            crit = float(s_l) * float(s_l) / n_l \
                + float(s_t - s_l) * float(s_t - s_l) / (n_t - n_l)
            if best_crit is None or crit > best_crit:
                best_crit, best = crit, (x, n_l, s_l)
        thr, n_l, s_l = best
        n_r, s_r = n_t - n_l, s_t - s_l
        u_l, u_r = (s_l // n_l) // 2, (s_r // n_r) // 2
        g = got_rounds[t]
        assert (g["thr"], g["u_l"], g["u_r"], g["n_left"], g["n_right"]) == (
            thr, u_l, u_r, n_l, n_r
        )
        d = {x: (c, s - c * (u_l if x <= thr else u_r),
                 ss - 2 * (u_l if x <= thr else u_r) * s
                 + c * (u_l if x <= thr else u_r) ** 2)
             for x, (c, s, ss) in d.items()}
    sse_final = sum(v[2] for v in d.values())
    assert got_final["sse0"] == sse0
    assert got_final["sse_final"] == sse_final
    assert got_final["improved"] is True
    assert sse_final <= sse0


def test_als_alternation_minimizes_regularized_objective(spark):
    """The closed-form user solve must beat p=0 AND beat small
    perturbations of itself on the regularized objective (it is the
    exact minimizer up to micro quantization)."""
    from datalake_polygonscan_spark.queries import REGISTRY

    out = REGISTRY["ml15_als_recommender"].fn(spark, "/root/testdata/sf0.001").collect()
    assert all(r["improved"] for r in out)
    assert all(r["obj1"] <= r["obj0"] for r in out)
    # factors are finite micro-ints and at least one user has a
    # non-trivial solve (px or py != 0)
    assert any(r["px_micro"] != 0 or r["py_micro"] != 0 for r in out)


def test_isotonic_pav_exact_semantics(spark):
    """ML19 PAV: known fixture — decreasing pair pools to its weighted
    mean, already-monotone tail untouched, exact integer block sums."""
    from datalake_polygonscan_spark.operators.regression import isotonic_fit_grouped

    b = spark.createDataFrame(
        # rates 0.8, 0.2, 0.5, 0.9: (0.8,0.2) pool to 9/15=0.6, which
        # still exceeds 0.5 -> CASCADING second pool to 14/25=0.56
        [("g", 0, 10, 8), ("g", 1, 5, 1), ("g", 2, 10, 5), ("g", 3, 10, 9)],
        "grp string, x long, w long, s long",
    )
    out = {r.x: r for r in isotonic_fit_grouped(b).collect()}
    for i in range(3):
        assert (out[i].block_s, out[i].block_w) == (14, 25)
        assert out[i].fit == 14 / 25
    assert (out[3].block_s, out[3].block_w) == (9, 10) and out[3].fit == 0.9
    fits = [out[i].fit for i in range(4)]
    assert fits == sorted(fits)  # non-decreasing by construction
