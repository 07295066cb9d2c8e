"""Embedding-clustering registry entries (operators/clustering.py).

The driver's ``embeddings`` fixture is geometrically unstructured (max
pairwise cosine ~0.51 at sf0.01, labels uncorrelated with geometry),
so these entries grade the ALGORITHMIC invariants — which hold on any
dataset — rather than a dataset-specific clustering: the closed-form
part of each oracle is the vector count, and the measured verdicts
(monotone inertia, within-tolerance nearest-centroid assignment,
recall vs brute force) ride the value hash as booleans, the same
pattern as the ANN recall entries (queries/extras.py). The structural
ground-truth checks (exact blob recovery, near-dup pair discovery)
live in tests/test_clustering.py where the geometry is constructed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table

_K = 8


@register(
    "ml1_kmeans_clusters",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(8 AS BIGINT) AS k,
           TRUE AS clusters_in_range,
           TRUE AS inertia_monotone,
           TRUE AS self_consistent
    FROM embeddings
    """,
    doc="ML1 distributed Lloyd's k-means (operators/clustering.py:kmeans): Arrow-batched matmul argmin assignment (no shuffle, no driver per-row work), posexplode+avg centroid update (map-side combine caps the exchange at partitions x k x dim rows), driver holds k x dim floats only; deterministic md5-order seeding. Graded invariants: every cluster id in [0,k), per-iteration inertia non-increasing (Lloyd's guarantee), and SELF-CONSISTENCY cross-checked by an INDEPENDENT codegen path — the broadcast-array F.aggregate distance (ivf_topk's form) re-derives each vector's nearest final centroid and the UDF's assignment must be within 1e-6 of optimal",
)
def ml1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.clustering import kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids, inertia = kmeans(emb, "vec_id", "embedding", k=_K, n_iter=3)

    # independent re-derivation of the nearest-centroid distance with
    # pure codegen (no numpy): centroids as ONE broadcast array row
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cid int, cvec array<double>"
    )
    cent_arr = cent_df.agg(F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("cents"))
    sq_dist = lambda v, c: F.aggregate(  # noqa: E731
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda a, x: a + x
    )
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_vec"))
    checked = (
        assigned.join(vecs, "vec_id")
        .crossJoin(F.broadcast(cent_arr))
        .withColumn(
            "_min_dist",
            F.array_min(F.transform("cents", lambda c: sq_dist(F.col("_vec"), c["cvec"]))),
        )
        .withColumn(
            "_my_dist", sq_dist(F.col("_vec"), F.element_at("cents", F.col("cluster") + 1)["cvec"])
        )
    )
    # n_vectors states the FULL table count (matches the closed-form
    # oracle even if a grading set carried null vectors, which kmeans
    # excludes); the assignment invariants aggregate the assigned rows
    n_total = emb.count()
    inv = checked.agg(
        F.count("*").alias("_n_assigned"),
        (F.min("cluster") >= 0).__and__(F.max("cluster") < _K).alias("clusters_in_range"),
        F.max(F.col("_my_dist") - F.col("_min_dist")).alias("_worst_gap"),
    ).select(
        F.lit(n_total).cast("long").alias("n_vectors"),
        F.lit(_K).cast("long").alias("k"),
        "clusters_in_range",
        F.lit(all(inertia[i + 1] <= inertia[i] + 1e-9 for i in range(len(inertia) - 1))).alias(
            "inertia_monotone"
        ),
        (F.col("_worst_gap") <= 1e-6).alias("self_consistent"),
    )
    return inv


@register(
    "ml2_semantic_dedup",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           TRUE AS pairs_verified,
           TRUE AS recall_ok,
           TRUE AS partition_complete
    FROM embeddings
    """,
    doc="ML2 SemDeDup semantic near-dedup (operators/clustering.py:semantic_dedup; Abbas et al. 2023): L2-normalize, k-means, candidate pairs ONLY within a cluster (sum n_c^2, never n^2) with nprobe=2 soft assignment so boundary pairs stay reachable, exact-dot verify, keep-lowest-id survivors. Graded invariants: every emitted pair's cosine >= threshold (precision is exact by construction), recall@threshold vs exact truth computed for pairs incident to 64 md5-selected PROBE vectors in the same job (broadcast probe crossJoin, O(probes x n) — the former brute-force all-pairs truth was the one quadratic stage left in a graded plan) >= 0.7 (1.0 when no probe-incident true pairs exist — the driver fixture's case), and survivors+losers partition the corpus; full-geometry ground truth on constructed blobs in tests/test_clustering.py",
)
def ml2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.functions.vectors import cosine_similarity
    from datalake_polygonscan_spark.operators.clustering import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    threshold = 0.8
    # k scales with the corpus (SemDeDup uses k ~ n/100s at web scale:
    # candidate volume is sum n_c^2 ~ n^2/k, so fixed k degrades to
    # all-pairs as n grows). The graded output is k-independent.
    k = max(_K, emb.count() // 100)
    pairs, marked = semantic_dedup(emb, threshold=threshold, k=k, n_iter=2, nprobe=2)
    # probe-restricted exact truth (O(probes x n), broadcast probe
    # side) — estimates recall without an all-pairs stage in this job
    probes = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(64)
        .select(F.col("vec_id").alias("p_id"), F.col("embedding").alias("p_vec"))
    )
    truth = (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(probes), F.col("vec_id") != F.col("p_id"))
        .withColumn("_cos", cosine_similarity("embedding", "p_vec"))
        .filter(F.col("_cos") >= threshold)
        .select(
            F.least("vec_id", "p_id").alias("id_a"),
            F.greatest("vec_id", "p_id").alias("id_b"),
        )
        .distinct()
    )
    n_truth = truth.count()
    n_hit = truth.join(pairs, ["id_a", "id_b"], "left_semi").count()
    recall = 1.0 if n_truth == 0 else n_hit / n_truth
    bad_pairs = pairs.filter(F.col("cosine") < threshold).count()
    # the dedup scope is vectors with a usable direction (non-null,
    # norm > 0); n_vectors states the full table count for the oracle
    from datalake_polygonscan_spark.functions.vectors import l2_norm

    n_total = emb.count()
    n_scoped = emb.filter(F.col("embedding").isNotNull() & (l2_norm("embedding") > 0)).count()
    return marked.agg(F.count("*").alias("n_marked")).select(
        F.lit(n_total).cast("long").alias("n_vectors"),
        F.lit(bad_pairs == 0).alias("pairs_verified"),
        F.lit(recall >= 0.7).alias("recall_ok"),
        (F.col("n_marked") == n_scoped).alias("partition_complete"),
    )
