"""Embedding clustering + semantic dedup (SemDeDup-style).

K-means over an embedding column, built for the 100 TB shape of the
problem:

- **assignment is embarrassingly parallel**: the k centroids (k x dim
  doubles — kilobytes) ride to every task inside an Arrow-batched
  pandas UDF closure; each batch computes all distances as ONE numpy
  matmul (``|v|^2 - 2 vC^T + |c|^2`` row-wise argmin). No shuffle, no
  driver round-trip per row, no k x dim literal expression tree (the
  codegen compile time of literal-heavy expressions dominated the LSH
  bucketer before it moved to the same matmul form —
  operators/similarity.py:lsh_table_buckets).
- **the update step is a partial-aggregating groupBy**: per-dimension
  means via ``posexplode`` + ``avg`` — map-side combine collapses each
  executor's contribution to at most k x dim rows before the exchange,
  so the shuffle is O(partitions x k x dim), independent of row count.
- **the driver holds k x dim floats per iteration**, never vectors.
  Iteration count is a fixed small constant (Lloyd's converges fast;
  SemDeDup uses single-digit iterations at trillion-token scale).

Determinism: seeds are either caller-provided ids (``init_ids``) or
the k rows with the smallest ``md5(id)`` — engine-portable, no RNG.
Distance ties break to the lowest cluster id (numpy argmin keeps the
first index).

``semantic_dedup`` is the SemDeDup recipe (Abbas et al. 2023): cluster
the (normalized) embeddings, generate candidate pairs only WITHIN a
cluster — turning the quadratic all-pairs search into per-cluster
blocks — and verify with the exact cosine. Near-boundary pairs are
covered by soft assignment: each vector lands in its ``nprobe``
nearest clusters for candidate generation (dedup survivors are still
computed once per vector). Survivor rule matches the repo's other
dedup tiers: a vector survives iff it never appears as the larger id
of a verified pair.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.functions.vectors import dot_pandas, l2_norm


def _assign_udf(centroids: list[list[float]], nprobe: int = 1):
    """Pandas UDF: vector -> its nprobe nearest centroid ids (squared
    L2, ties to the lowest id), one numpy matmul per Arrow batch."""
    import numpy as np

    C = np.asarray(centroids, dtype="float64")  # k x dim
    c_sq = (C * C).sum(axis=1)  # |c|^2, shape k

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        V = np.asarray(vecs.tolist(), dtype="float64")  # n x dim
        # |v|^2 is constant per row -> argmin needs only -2vC^T + |c|^2
        d = -2.0 * (V @ C.T) + c_sq  # n x k
        if nprobe == 1:
            out = d.argmin(axis=1)[:, None]
        else:
            p = min(nprobe, d.shape[1])
            part = np.argpartition(d, p - 1, axis=1)[:, :p]
            order = np.take_along_axis(d, part, axis=1).argsort(axis=1, kind="stable")
            out = np.take_along_axis(part, order, axis=1)
        return pd.Series([row.astype("int32").tolist() for row in out])

    return _assign


def _min_dist_udf(centroids: list[list[float]]):
    """Pandas UDF: vector -> TRUE squared L2 distance to its nearest
    centroid (the |v|^2 term matters here, unlike for the argmin)."""
    import numpy as np

    C = np.asarray(centroids, dtype="float64")
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf(T.DoubleType())
    def _dist(vecs: pd.Series) -> pd.Series:
        V = np.asarray(vecs.tolist(), dtype="float64")
        d = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq
        return pd.Series(np.maximum(d.min(axis=1), 0.0))

    return _dist


def _assign_dist_udf(centroids: list[list[float]]):
    """Pandas UDF: vector -> (nearest centroid id, true squared L2
    distance to it) in one Arrow pass — the per-iteration workhorse,
    so each Lloyd's iteration is ONE Spark job."""
    import numpy as np

    C = np.asarray(centroids, dtype="float64")
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("cluster int, dist double")
    def _ad(vecs: pd.Series) -> pd.DataFrame:
        V = np.asarray(vecs.tolist(), dtype="float64")
        d = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq
        idx = d.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": idx.astype("int32"),
                "dist": np.maximum(d[np.arange(len(idx)), idx], 0.0),
            }
        )

    return _ad


def kmeans(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    init_ids: list | None = None,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Distributed Lloyd's k-means. Returns ``(assignments, centroids,
    inertia_per_iter)`` where assignments is ``(id_col, cluster)`` —
    cluster of the FINAL centroids, so the output is always
    self-consistent — centroids is the k x dim python list, and
    inertia_per_iter is ``[J(C_0), ..., J(C_n)]`` (the objective under
    each iteration's centroids plus the final ones) — non-increasing
    for fixed data by Lloyd's guarantee. Each iteration is ONE Spark
    job: assignment + distance in one Arrow pass, per-dimension means
    and the objective through the same partial-aggregating groupBy.

    Input vectors should be pre-cast to a numeric array; rows with a
    null/empty vector are excluded. ``init_ids`` pins the seed rows
    explicitly (tests, warm starts); default seeds are the k rows with
    the smallest ``md5(id)`` — deterministic and engine-portable."""
    base = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_vec")
    ).filter(F.col("_vec").isNotNull() & (F.size("_vec") > 0))
    base = base.persist()
    try:
        if init_ids is not None:
            seed_rows = base.filter(F.col("_id").isin(list(init_ids))).collect()
            seed_rows.sort(key=lambda r: list(init_ids).index(r["_id"]))
        else:
            seed_rows = (
                base.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
                .limit(k)
                .collect()
            )
        centroids = [list(r["_vec"]) for r in seed_rows]
        if len(centroids) < k:
            raise ValueError(f"need {k} seed vectors, found {len(centroids)}")

        dim = len(centroids[0])
        inertia_per_iter: list[float] = []
        for _ in range(n_iter):
            # ONE job per iteration: assignment + distance in one Arrow
            # pass, then per-dimension means AND the objective J(C_i)
            # through the same partial-aggregating groupBy (dist rides
            # the exploded rows; dividing its sum by dim undoes the
            # explode fan-out). The collected result is <= k x dim rows.
            ad = _assign_dist_udf(centroids)
            stats = (
                base.withColumn("_ad", ad(F.col("_vec")))
                .select("_ad.cluster", "_ad.dist", F.posexplode("_vec").alias("pos", "x"))
                .groupBy("cluster", "pos")
                .agg(F.avg("x").alias("mean"), F.sum("dist").alias("dsum"))
                .collect()
            )
            # J(C_i): Lloyd's guarantees J(C_0) >= J(C_1) >= ...
            inertia_per_iter.append(sum(r["dsum"] for r in stats) / dim)
            by_cluster: dict[int, dict[int, float]] = {}
            for r in stats:
                by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean"]
            centroids = [
                [by_cluster[c][p] for p in range(dim)]
                if c in by_cluster
                else centroids[c]  # empty cluster keeps its centroid
                for c in range(k)
            ]
        # close the sequence with the objective of the FINAL centroids
        dist = _min_dist_udf(centroids)
        inertia_per_iter.append(float(base.agg(F.sum(dist(F.col("_vec")))).collect()[0][0]))

        final_assign = _assign_udf(centroids)
        out = base.select(
            F.col("_id").alias(id_col), final_assign(F.col("_vec"))[0].alias("cluster")
        )
        return out, centroids, inertia_per_iter
    finally:
        base.unpersist()


def semantic_dedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    k: int = 8,
    n_iter: int = 3,
    nprobe: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup: cluster-bounded semantic near-duplicate detection.

    Vectors are L2-normalized (cosine == dot), clustered with
    :func:`kmeans`, then candidate pairs are generated ONLY within a
    cluster — each vector joins its ``nprobe`` nearest clusters so
    boundary-straddling pairs stay reachable — and verified with the
    exact dot product. Returns ``(pairs, marked)``:

    - pairs: ``(id_a, id_b, cosine)`` with id_a < id_b, cosine >=
      threshold, each pair once (dedup across probe replicas);
    - marked: ``(id_col, cluster, is_survivor)`` — survivor iff the id
      never appears as ``id_b`` (keep-lowest-id, the same rule as the
      MinHash tier).

    Scale: the join key is (cluster), so candidate volume is
    sum_c n_c^2 instead of n^2 — the clustering IS the blocking
    structure. Skewed clusters are the known failure mode; cap k high
    enough that n_c stays bounded (SemDeDup uses k in the tens of
    thousands at web scale)."""
    normed = (
        embeddings.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_vec")
        )
        .withColumn("_n", l2_norm("_vec"))
        .filter(F.col("_n") > 0)
        .select("_id", F.transform("_vec", lambda x: x / F.col("_n")).alias("_vec"))
    )
    assigned, centroids, _ = kmeans(normed, "_id", "_vec", k=k, n_iter=n_iter)
    probe = _assign_udf(centroids, nprobe=nprobe)
    replicated = normed.select(
        "_id", "_vec", F.explode(probe(F.col("_vec"))).alias("cluster")
    )
    a, b = replicated.alias("a"), replicated.alias("b")
    pairs = (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            dot_pandas(F.col("a._vec"), F.col("b._vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
    losers = pairs.select(F.col("id_b").alias("_id")).distinct()
    marked = assigned.join(losers, assigned["_id"] == losers["_id"], "left_anti").withColumn(
        "is_survivor", F.lit(True)
    ).unionByName(
        assigned.join(losers, assigned["_id"] == losers["_id"], "left_semi").withColumn(
            "is_survivor", F.lit(False)
        )
    ).select(F.col("_id").alias(id_col), "cluster", "is_survivor")
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine")), marked


def dbscan_planar(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_cell_candidates: int | None = None,
) -> DataFrame:
    """ML11 — density-based clustering (DBSCAN, Ester et al. KDD'96)
    over integer planar points, distributed by the grid-cell blocking
    the GEO1 radius join established.

    The sequential algorithm's region queries become ONE blocked
    self-join: each point bins to an eps-sized grid cell, one side
    explodes its 3x3 cell neighborhood, and every eps-ball pair meets
    in a plain equi-join on the cell key — candidates per cell are
    O(local density), total work O(n x density), never O(n^2). From
    the neighbor-pair relation the three DBSCAN roles are pure
    relational algebra:

    - **core**: |N_eps(p)| >= min_pts (the point itself counts);
    - **cluster**: connected components over CORE-CORE neighbor edges
      (min-label propagation — dense eps-balls make near-cliques, so
      diameter and round count stay small), cluster id = min core id;
    - **border**: non-core with >= 1 core neighbor, attached to the
      MINIMUM core neighbor's cluster (the deterministic version of
      the textbook's "first core that reaches it");
    - **noise**: everything else, cluster -1.

    Exact integer distance predicate (dx^2 + dy^2 <= eps^2): no floats
    anywhere, so roles and clusters reproduce bit-for-bit under any
    partitioning and a cross-join SQL oracle replays them row-for-row.

    **Density knob** (round 10, VERDICT r9 #7): a cell holding H
    points contributes O(H^2) candidate pairs — on a pathological
    hot cell that is the quadratic corner of the otherwise-linear
    plan. ``max_cell_candidates`` caps the CANDIDATE side per home
    cell (the deterministic ``min_pts``-safe subset: lowest ids
    first), bounding per-cell work to O(H x cap); neighbor counts in
    capped cells become lower bounds, so the downgrade is LOUD — the
    result carries an ``n_capped_cells`` column counting the cells
    that overflowed. With no cap (default) the result is exact and
    the column is absent.

    Returns (id, role, cluster[, n_capped_cells]).
    """
    from datalake_polygonscan_spark.operators.graph import connected_components_star

    spark = points.sparkSession
    pts = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).localCheckpoint(eager=True)

    a = pts.select(
        F.col("id").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.floor(F.col("x") / eps).alias("gx"), F.floor(F.col("y") / eps).alias("gy"),
    )
    off = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    n_capped_cells = None
    b_src = pts
    if max_cell_candidates is not None:
        from pyspark.sql import Window

        ranked = pts.withColumn(
            "__hgx", F.floor(F.col("x") / eps)
        ).withColumn("__hgy", F.floor(F.col("y") / eps)).withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__hgx", "__hgy").orderBy("id")),
        ).localCheckpoint(eager=True)
        n_capped_cells = (
            ranked.filter(F.col("__rn") > max_cell_candidates)
            .select("__hgx", "__hgy").distinct().count()
        )
        b_src = ranked.filter(
            F.col("__rn") <= max_cell_candidates
        ).select("id", "x", "y")
    b = b_src.crossJoin(F.broadcast(off)).select(
        F.col("id").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        (F.floor(F.col("x") / eps) + F.col("dx")).alias("gx"),
        (F.floor(F.col("y") / eps) + F.col("dy")).alias("gy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nbr = (
        a.join(b, ["gx", "gy"])
        .filter((F.col("ia") != F.col("ib")) & (d2 <= eps * eps))
        .select("ia", "ib")
        .localCheckpoint(eager=True)
    )

    core = (
        nbr.groupBy(F.col("ia").alias("id"))
        .agg((F.count("*") + 1).alias("n"))
        .filter(F.col("n") >= min_pts)
        .select("id")
        .localCheckpoint(eager=True)
    )
    core_edges = (
        nbr.join(core.select(F.col("id").alias("ia")), "ia")
        .join(core.select(F.col("id").alias("ib")), "ib")
        .select("ia", "ib")
    )
    # star CC, not min-label: an eps-ball mesh has hop-diameter ~
    # cluster-extent/eps (10+ rounds at bench SF); the alternating-star
    # contraction closes it in O(log diameter) alternations
    comp = connected_components_star(core_edges, "ia", "ib")
    # isolated cores (>= min_pts neighbors but none of them core) seed
    # their own single-core cluster
    core_cluster = core.join(comp, core["id"] == comp["node"], "left").select(
        core["id"], F.coalesce("comp", core["id"]).alias("cluster")
    )
    border = (
        nbr.join(core_cluster.withColumnRenamed("id", "ib"), "ib")
        .join(core.withColumnRenamed("id", "ia"), "ia", "left_anti")
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        pts.select("id")
        .join(core_cluster.withColumnRenamed("cluster", "_core_cl"), "id", "left")
        .join(border.withColumnRenamed("cluster", "_border_cl"), "id", "left")
        .select(
            "id",
            F.when(F.col("_core_cl").isNotNull(), F.lit("core"))
            .when(F.col("_border_cl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("_core_cl", "_border_cl", F.lit(-1)).cast("long").alias("cluster"),
        )
    )
    if n_capped_cells is not None:
        out = out.withColumn(
            "n_capped_cells", F.lit(int(n_capped_cells)).cast("long"))
    return out
