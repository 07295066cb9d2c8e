"""Similarity search over embedding columns (L3).

Three tiers:
- ``brute_force_topk`` — exact: broadcast the (small) query set against
  the corpus, cosine in codegen, per-query top-k via ranking window.
  The correct baseline, and the verifier for the approximate tiers.
- ``lsh_bucketed_topk`` — signed-random-projection LSH: deterministic
  hyperplanes (seeded numpy, shipped as literal arrays — no RNG state
  on executors), bucket = sign bits; candidates are corpus vectors in
  any probed bucket. Sub-linear candidate sets; the 100 TB path where
  the corpus side is bucketed once (write-time partitioning by bucket)
  and each query probes a handful of partitions.
- ``ivf_topk`` — inverted-file index: coarse centroids (deterministic
  farthest-point-ish sample), corpus assigned to nearest centroid
  (broadcast argmin, no shuffle), query probes ``nprobe`` nearest
  lists. The FAISS-IVF pattern in DataFrame form.

Recall of both approximate tiers vs brute force is asserted in
tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.functions.vectors import _c, cosine_similarity, dot


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast-cross-join queries x corpus.

    Shuffle-free: the query side is broadcast, the final top-k is one
    shuffle on query_id (or none under AQE when the scored set is
    small). Each side's L2 norm is computed ONCE per vector BEFORE the
    cross join — the norms are per-vector facts, and higher-order
    array lambdas are interpreted per element on the JVM, so
    re-deriving both norms per PAIR triples the dominant cost
    (measured 5.1 s -> 1.8 s at 190k pairs x 64 dims). The per-pair
    dot keeps :func:`~..functions.vectors.dot`'s left-to-right fold,
    so cosines are bit-identical to the naive form.
    """
    from datalake_polygonscan_spark.functions.vectors import dot, l2_norm

    qn = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    ).withColumn("_qn", l2_norm("query_vec"))
    cn = corpus.select(
        F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding")
    ).withColumn("_cn", l2_norm("embedding"))
    denom = F.col("_qn") * F.col("_cn")
    scored = (
        cn.crossJoin(F.broadcast(qn))
        .withColumn(
            "cosine",
            F.when(denom != 0, dot("query_vec", "embedding") / denom),
        )
        .drop("_qn", "_cn")
    )
    return _topk_per_query(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_table_buckets(vec_col, dim: int, n_planes: int, n_tables: int, seed: int):
    """All ``n_tables`` sign-bit bucket ids for one vector, as
    ``array<long>`` with element t encoding ``t * 2^32 + bucket_t``.

    Computed as ONE Arrow-batched numpy matmul (batch_rows x dim @
    dim x (tables*planes)) instead of tables*planes inlined
    ``zip_with``/``aggregate`` expressions: the expression form
    generates megabytes of Java whose janino compilation dominates the
    query (10+ s observed at 16x6), while the BLAS path is
    milliseconds. The planes are seeded literals baked into the UDF
    closure — no RNG state on executors, deterministic across runs."""
    from pyspark.sql.functions import pandas_udf

    planes = np.vstack(
        [np.asarray(_hyperplanes(dim, n_planes, seed + 1000 * t)) for t in range(n_tables)]
    )  # (n_tables*n_planes) x dim
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    table_tag = (np.arange(n_tables).astype(np.int64) << 32)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.zeros((len(vecs), dim))
        for i, v in enumerate(vecs.values):
            a = np.asarray(v, dtype=float)
            mat[i, : min(dim, a.shape[0])] = a[:dim]
        signs = (mat @ planes.T) > 0  # n x (tables*planes)
        ids = signs.reshape(len(vecs), n_tables, n_planes) @ weights + table_tag
        return pd.Series(list(ids))

    return _buckets(vec_col)


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id: bit i set iff plane_i . v > 0. Planes are
    literal arrays, so the dot products are pure codegen."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    multiprobe_bits: int = 1,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via signed random projections.

    ``n_tables`` independent hash tables (OR-amplification — one b-bit
    table alone has vanishing recall on high-dim data: per-bit collision
    p for a true neighbor gives p^b per table, so recall is built by
    probing several independent tables); within each table every query
    probes its own bucket plus, with ``multiprobe_bits >= 1``, every
    bucket at hamming distance 1 (flip-one-bit multiprobe for boundary
    vectors). The corpus is hashed once per table (a write-time
    partitioning at scale); the candidate join is an equi-join on
    (table, bucket), candidates deduped before scoring so a vector found
    by two tables is scored once.
    """
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding"))
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec"))

    c_buckets = []
    q_probes = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        c_buckets.append(F.struct(F.lit(t).alias("t"), _bucket_expr("embedding", planes).alias("b")))
        b0 = _bucket_expr("query_vec", planes)
        q_probes.append(F.struct(F.lit(t).alias("t"), b0.alias("b")))
        if multiprobe_bits >= 1:
            q_probes += [
                F.struct(F.lit(t).alias("t"), b0.bitwiseXOR(F.lit(1 << i)).alias("b"))
                for i in range(n_planes)
            ]

    c = c.withColumn("tb", F.explode(F.array(*c_buckets)))
    q = q.withColumn("tb", F.explode(F.array(*q_probes)))
    candidates = c.join(F.broadcast(q), "tb").dropDuplicates(["query_id", "vec_id"])
    scored = candidates.withColumn("cosine", cosine_similarity("query_vec", "embedding"))
    return _topk_per_query(scored, k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF (FAISS-style inverted file) in DataFrame form, built to scale:

    - centroids: one representative per hash bucket —
      ``pmod(xxhash64(id), nlist)`` buckets, ``min_by(vec, id)`` per
      bucket (a partial-aggregating groupBy over nlist keys; a k-means
      refinement can slot in later). Deterministic, NO driver-side
      ``count()``/collect, NO partition-less window.
    - assignment: the nlist centroids are collected into ONE array row,
      broadcast, and the per-row argmax runs as a codegen'd
      ``aggregate`` over that array — zero shuffle on the corpus side.
    - probing: queries (the small side) rank centroids with a window
      partitioned by query_id and keep ``nprobe`` lists; candidates come
      from a broadcast equi-join on list_id.
    """
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("embedding"))
    bucketed = c.withColumn("_bkt", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nlist)))
    centroids = bucketed.groupBy("_bkt").agg(F.min_by("embedding", "vec_id").alias("centroid_vec")).select(
        F.col("_bkt").cast("long").alias("centroid_id"), "centroid_vec"
    )
    # one row holding all centroids, sorted by id (struct sort is
    # lexicographic -> first field = centroid_id), so the argmax scan
    # below keeps the LOWEST centroid id on cosine ties
    centroid_arr = centroids.agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "centroid_vec"))).alias("cents")
    )

    def argmax_list(vec_col: str):
        best = F.aggregate(
            F.col("cents"),
            F.struct(F.lit(-2.0).cast("double").alias("sim"), F.lit(-1).cast("long").alias("cid")),
            lambda acc, cent: F.when(
                F.coalesce(cosine_similarity(F.col(vec_col), cent["centroid_vec"]), F.lit(-2.0)) > acc["sim"],
                F.struct(
                    F.coalesce(cosine_similarity(F.col(vec_col), cent["centroid_vec"]), F.lit(-2.0)).alias("sim"),
                    cent["centroid_id"].alias("cid"),
                ),
            ).otherwise(acc),
        )
        return best["cid"]

    assigned = c.crossJoin(F.broadcast(centroid_arr)).withColumn("list_id", argmax_list("embedding")).drop("cents")

    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec"))
    probe_scored = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine_similarity("query_vec", "centroid_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("centroid_id").asc())
    probed = (
        probe_scored.withColumn("_cr", F.row_number().over(wq))
        .filter(F.col("_cr") <= nprobe)
        .select("query_id", "query_vec", F.col("centroid_id").alias("list_id"))
    )
    scored = assigned.join(F.broadcast(probed), "list_id").withColumn(
        "cosine", cosine_similarity("query_vec", "embedding")
    )
    return _topk_per_query(scored, k)


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """L3q — symmetric per-vector INT8 scalar quantization: scale =
    max|v|/127, q_i = round(v_i/scale) stored as ``array<tinyint>`` —
    4x smaller than float32 (the difference between an embedding
    corpus fitting in cluster memory or not). Entirely codegen; the
    rounding is engine-neutral (round-half-away-from-zero in both
    Spark and DuckDB), so a SQL oracle reproduces the quantized codes
    bit-exactly. Output: (id, qvec array<tinyint>, scale double).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = F.greatest(F.array_max(F.transform(v, F.abs)) / F.lit(127.0), F.lit(1e-12))
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(v, lambda x: F.round(x / s, 0).cast("tinyint")).alias("qvec"),
        s.alias("scale"),
    )


def _qdot(a, b):
    """Σ qaᵢ·qbᵢ over int8 codes as double — every partial sum is an
    exact integer (≤ 127²·dim « 2^53), so the result is the same
    double in any summation order and any engine."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def quantized_topk(
    queries_full: DataFrame,
    corpus_full: DataFrame,
    k: int = 10,
    shortlist: int = 50,
) -> DataFrame:
    """Exact-rerank INT8 search: score the whole corpus with the
    QUANTIZED cosine (qdot/√(qdot_aa)·√(qdot_bb) — the scales cancel,
    leaving pure integer arithmetic: deterministic to the bit), keep a
    ``shortlist`` per query, then re-rank ONLY the shortlist with
    full-precision cosine and emit top-``k`` plus the per-query
    recall@k of the int8 tier against the exact ranking (computed in
    the same job from the broadcast probe set — O(probes × n), never
    quadratic).

    The 100 TB story: the first pass — the one that touches every
    vector — reads 1/4 the bytes and does integer math; the float
    vectors are fetched for ``shortlist`` rows per query only.
    Inputs: (vec_id/query vec_id, embedding) frames; queries are
    broadcast.
    """
    qcorp = quantize_embeddings(corpus_full)
    qquer = quantize_embeddings(queries_full.select(F.col("query_id").alias("vec_id"), F.col("query_vec").alias("embedding")))
    qq = F.broadcast(qquer.select(F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_q")))
    scored = qcorp.select("vec_id", "qvec").crossJoin(qq).withColumn(
        "cq",
        _qdot("q_q", "qvec")
        / F.greatest(F.sqrt(_qdot("q_q", "q_q")) * F.sqrt(_qdot("qvec", "qvec")), F.lit(1e-12)),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("cq").desc(), F.col("vec_id").asc())
    short = (
        scored.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "vec_id")
    )
    qv = F.broadcast(
        queries_full.select(F.col("query_id"), F.col("query_vec"))
    )
    rer = (
        short.join(corpus_full.select("vec_id", "embedding"), "vec_id")
        .join(qv, "query_id")
        .withColumn("cosine", cosine_similarity("query_vec", "embedding"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    topk = (
        rer.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
    # in-job exact truth for the probe queries (broadcast × corpus)
    exact = (
        corpus_full.select("vec_id", "embedding")
        .crossJoin(qv)
        .withColumn("xc", cosine_similarity("query_vec", "embedding"))
    )
    wx = Window.partitionBy("query_id").orderBy(F.col("xc").desc(), F.col("vec_id").asc())
    truth = (
        exact.withColumn("xr", F.row_number().over(wx))
        .filter(F.col("xr") <= k)
        .select("query_id", "vec_id")
    )
    rec = (
        truth.join(topk.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.round(F.count("*") / F.lit(float(k)), 6).alias("recall_at_k"))
    )
    return topk.join(rec, "query_id", "left").select(
        "query_id",
        "vec_id",
        "cosine",
        "rank",
        F.coalesce("recall_at_k", F.lit(0.0)).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# L3pq — PRODUCT QUANTIZATION (Jégou, Douze, Schmid: "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS
# default for billion-scale ANN). The vector splits into m subspaces;
# each subspace gets a ksub-word codebook; a vector compresses to m
# small codes (16 nibble codes for a 64-dim float32 vector = 64x less
# scored data). Search is ADC (asymmetric distance computation): per
# query, one m x ksub lookup table of subspace dot products; each
# corpus vector scores as m table lookups — its floats never read.
#
# Spark mapping, deliberately zero-Python in the hot path:
# - training: driver-side Lloyd on a deterministic md5-ordered SAMPLE
#   (FAISS trains on samples too; the codebook is m*ksub*dsub floats —
#   trivially driver-held, like kmeans' centroids)
# - encoding: the full codebook rides the plan as ONE nested array
#   LITERAL; per-subspace L2 argmin is a nested-lambda transform —
#   one codegen projection over the corpus, no shuffle, no UDF
# - ADC: the query's lookup table comes from the same literal in one
#   projection; scoring is aggregate(zip_with(lut, codes, element_at))
#   — whole-stage codegen, broadcast queries, shortlist window, exact
#   re-rank of the shortlist only (same tail as quantized_topk).
#
# Implementation note: every per-subspace expression lives inside ONE
# outer ``transform(all_books, (bj, j) -> ...)`` lambda. Building m
# separate transform()+aggregate() lambdas in Python and assembling
# them with F.array mis-resolves the nested lambda variables (values
# silently read the wrong lambda's slot — observed, not theoretical);
# a single nested-lambda tree scopes correctly.
# ---------------------------------------------------------------------------


def pq_train_codebooks(
    corpus: DataFrame,
    m: int = 16,
    ksub: int = 16,
    sample: int = 256,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks of ksub words each on a
    deterministic md5-ordered sample (bounded driver work: sample x dim
    floats in, m x ksub x dsub floats out)."""
    rows = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(sample)
        .collect()
    )
    X = np.asarray([list(r._v) for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        # deterministic init: first ksub distinct subvectors in sample
        # order (the sample itself is md5-shuffled, so this is a
        # uniform draw); fewer distinct than ksub -> pad by repeats
        seen, init = set(), []
        for row in S:
            key = tuple(np.round(row, 9))
            if key not in seen:
                seen.add(key)
                init.append(row)
            if len(init) == ksub:
                break
        while len(init) < ksub:
            init.append(init[len(init) % max(len(init), 1)])
        C = np.asarray(init)
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books.append([[float(x) for x in row] for row in C])
    return books


def _all_books_lit(codebooks: list[list[list[float]]]):
    """The full codebook set as one nested array literal:
    array<array<array<double>>> indexed [subspace][word][component].
    (Kept for reference/tests; the query paths attach the codebooks
    via :func:`_with_books_col` instead — see its docstring.)"""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in w]) for w in bj])
            for bj in codebooks
        ]
    )


def _with_books_col(df: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Attach the full codebook set as ONE broadcast COLUMN
    (``_all_books array<array<array<double>>>``) via a 1-row cross
    join. The value crosses as DATA, not as an expression tree: the
    nested literal form is ~m*ksub*dsub Literal nodes (1024 for the
    L3pq defaults) that Catalyst re-analyzes and Janino re-compiles at
    every use site — the dominant cost of l3pq at bench scale
    (round 11, guide §4.1). Same doubles, same lambda fold order, so
    results are bit-identical to the literal form."""
    from datalake_polygonscan_spark.tables import tiny_df

    cb = tiny_df(
        df.sparkSession, [(codebooks,)], "_all_books array<array<array<double>>>"
    )
    return df.crossJoin(F.broadcast(cb))


def _hof_dot(a, b):
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _hof_l2sq(a, b):
    diff = F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _unit_vec(df: DataFrame, vec_col: str) -> DataFrame:
    from datalake_polygonscan_spark.functions.vectors import l2_norm

    n = F.greatest(l2_norm(vec_col), F.lit(1e-12))
    return df.withColumn(vec_col, F.transform(F.col(vec_col), lambda x: x.cast("double") / n))


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — per-subspace L2 argmin against the
    literal codebooks, entirely codegen (ties break to the lowest code
    via array_position-of-min). One nested-lambda transform."""
    dsub = len(codebooks[0][0])
    v = F.col(vec_col)

    def per_subspace(bj, jdx):
        dists = F.transform(bj, lambda w: _hof_l2sq(F.slice(v, jdx * dsub + 1, dsub), w))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    codes = F.transform(F.col("_all_books"), per_subspace)
    return _with_books_col(corpus, codebooks).select(
        F.col(id_col).alias("vec_id"), codes.alias("codes")
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    k: int = 10,
    shortlist: int = 128,
) -> DataFrame:
    """ADC search + exact re-rank: score every corpus CODE against each
    broadcast query's lookup table (codegen table lookups — the corpus
    floats are never read in the first pass), keep ``shortlist`` per
    query, re-rank only those with full-precision cosine.

    Both sides are L2-normalized before training/encoding so the ADC
    dot estimate IS a cosine estimate (the re-rank uses true cosine
    either way). Output (query_id, vec_id, cosine, rank).
    """
    corpus_n = _unit_vec(corpus.select("vec_id", "embedding"), "embedding")
    queries_n = _unit_vec(queries.select("query_id", "query_vec"), "query_vec")
    if codebooks is None:
        codebooks = pq_train_codebooks(corpus_n)
    dsub = len(codebooks[0][0])
    enc = pq_encode(corpus_n, codebooks)

    qv = F.col("query_vec")
    luts = F.transform(
        F.col("_all_books"),
        lambda bj, jdx: F.transform(
            bj, lambda w: _hof_dot(F.slice(qv, jdx * dsub + 1, dsub), w)
        ),
    )
    q = _with_books_col(queries_n, codebooks).withColumn("lut", luts)

    scored = enc.crossJoin(F.broadcast(q.select("query_id", "lut"))).withColumn(
        "adc",
        F.aggregate(
            F.zip_with(
                F.col("lut"),
                F.col("codes"),
                lambda l, c: F.element_at(l, (c + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("vec_id").asc())
    short = (
        scored.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "vec_id")
    )
    rer = (
        short.join(corpus.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(queries.select("query_id", "query_vec")), "query_id")
        .withColumn("cosine", cosine_similarity("query_vec", "embedding"))
    )
    return _topk_per_query(rer, k)


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    k: int = 10,
    shortlist: int = 128,
    nlist: int = 16,
    nprobe: int = 8,
) -> DataFrame:
    """IVF-PQ — the FAISS billion-scale composite (IndexIVFPQ): the
    coarse inverted file restricts each query to ``nprobe`` of
    ``nlist`` lists (sub-linear candidates), and the candidates are
    scored by PQ ADC table lookups (compressed codes — floats
    untouched), then the shortlist re-ranks at full precision. At
    100 TB this is the only tier where BOTH the candidate count and
    the bytes-per-candidate shrink; pq_topk alone still scans every
    code, ivf_topk alone still reads every candidate's floats.

    Same hash-bucket coarse quantizer as :func:`ivf_topk` (derministic,
    no driver actions); same normalized-cosine PQ as :func:`pq_topk`.
    """
    corpus_n = _unit_vec(corpus.select("vec_id", "embedding"), "embedding")
    queries_n = _unit_vec(queries.select("query_id", "query_vec"), "query_vec")
    if codebooks is None:
        codebooks = pq_train_codebooks(corpus_n)
    dsub = len(codebooks[0][0])

    # coarse quantizer: hash-bucket representatives (ivf_topk's scheme)
    bucketed = corpus_n.withColumn("_bkt", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nlist)))
    centroids = bucketed.groupBy("_bkt").agg(
        F.min_by("embedding", "vec_id").alias("centroid_vec")
    ).select(F.col("_bkt").cast("long").alias("centroid_id"), "centroid_vec")
    centroid_arr = centroids.agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "centroid_vec"))).alias("cents")
    )

    def argmax_list(vec_col: str):
        best = F.aggregate(
            F.col("cents"),
            F.struct(F.lit(-2.0).cast("double").alias("sim"), F.lit(-1).cast("long").alias("cid")),
            lambda acc, cent: F.when(
                F.coalesce(cosine_similarity(F.col(vec_col), cent["centroid_vec"]), F.lit(-2.0))
                > acc["sim"],
                F.struct(
                    F.coalesce(
                        cosine_similarity(F.col(vec_col), cent["centroid_vec"]), F.lit(-2.0)
                    ).alias("sim"),
                    cent["centroid_id"].alias("cid"),
                ),
            ).otherwise(acc),
        )
        return best["cid"]

    enc = pq_encode(corpus_n, codebooks)
    assigned = (
        corpus_n.crossJoin(F.broadcast(centroid_arr))
        .withColumn("list_id", argmax_list("embedding"))
        .select("vec_id", "list_id")
        .join(enc, "vec_id")
    )

    probe_scored = queries_n.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine_similarity("query_vec", "centroid_vec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("centroid_id").asc())
    qv = F.col("query_vec")
    luts = F.transform(
        F.col("_all_books"),
        lambda bj, jdx: F.transform(
            bj, lambda w: _hof_dot(F.slice(qv, jdx * dsub + 1, dsub), w)
        ),
    )
    probed = (
        _with_books_col(
            probe_scored.withColumn("_cr", F.row_number().over(wq))
            .filter(F.col("_cr") <= nprobe)
            .select("query_id", "query_vec", F.col("centroid_id").alias("list_id")),
            codebooks,
        )
        .withColumn("lut", luts)
        .select("query_id", "list_id", "lut")
    )
    scored = assigned.join(F.broadcast(probed), "list_id").withColumn(
        "adc",
        F.aggregate(
            F.zip_with(
                F.col("lut"),
                F.col("codes"),
                lambda l, c: F.element_at(l, (c + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("vec_id").asc())
    short = (
        scored.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "vec_id")
    )
    rer = (
        short.join(corpus.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(queries.select("query_id", "query_vec")), "query_id")
        .withColumn("cosine", cosine_similarity("query_vec", "embedding"))
    )
    return _topk_per_query(rer, k)


def mmr_rerank(
    shortlist: DataFrame,
    pair_sims: DataFrame,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """L14 — Maximal Marginal Relevance re-ranking (Carbonell &
    Goldstein, SIGIR'98): greedily pick the candidate maximizing
    ``lam * relevance - (1 - lam) * max-similarity-to-already-picked``
    — the diversity stage every retrieval/curation pipeline bolts onto
    its ANN top-k so the k results aren't k near-duplicates.

    Inputs (both tiny — this runs AFTER the ANN stage has cut the
    corpus to a per-query shortlist):
    - ``shortlist``: (query_id, vec_id, rel) — rel pre-quantized
      (round 6) so both engines order identically;
    - ``pair_sims``: (query_id, ca, cb, s) — candidate-candidate
      similarity within each query's shortlist, same quantization.

    The greedy loop unrolls into k relational steps — each one
    left-anti (drop picked) + left-join picked + left-join sims +
    groupBy max + row_number argmax, all JVM-side, zero Python in the
    row path — so a staged-CTE oracle replays the selection verbatim.
    Step 1 falls out of the SAME formula: an empty picked set makes
    max-sim coalesce to 0 and the score lam * rel.

    Deterministic: score ties break to the lowest vec_id. Work is
    O(queries x k x shortlist^2) — shortlist is a constant (the ANN
    k'), so this is linear in query count at any corpus scale.

    Returns (query_id, rank, vec_id, rel, mmr_score).
    """
    # materialize both inputs once: every unrolled step references
    # them, and without the checkpoint step i re-executes the whole
    # ANN shortlist + pair-sim lineage i times over
    cand = shortlist.select(
        "query_id", F.col("vec_id").alias("c"), "rel"
    ).localCheckpoint(eager=True)
    sims = pair_sims.select("query_id", "ca", "cb", "s").localCheckpoint(eager=True)
    picked: DataFrame | None = None
    out: DataFrame | None = None
    for i in range(1, k + 1):
        remaining = cand
        if picked is not None:
            remaining = cand.join(picked, ["query_id", "c"], "left_anti")
        if picked is None:
            scored = remaining.withColumn("_maxsim", F.lit(0.0))
        else:
            p = picked.select("query_id", F.col("c").alias("pc"))
            scored = (
                remaining.join(p, "query_id", "left")
                .join(
                    sims,
                    (sims["query_id"] == remaining["query_id"])
                    & (sims["ca"] == remaining["c"])
                    & (sims["cb"] == F.col("pc")),
                    "left",
                )
                .groupBy(remaining["query_id"], "c", "rel")
                .agg(F.coalesce(F.max("s"), F.lit(0.0)).alias("_maxsim"))
            )
        scored = scored.withColumn(
            "score", F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("_maxsim")
        )
        w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("c").asc())
        pick_i = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("query_id", "c", "rel", "score", F.lit(i).alias("rank"))
            # one row per query: keep later steps' plans one step deep
            .localCheckpoint(eager=True)
        )
        picked = pick_i.select("query_id", "c") if picked is None else picked.unionByName(
            pick_i.select("query_id", "c")
        )
        out = pick_i if out is None else out.unionByName(pick_i)
    assert out is not None
    return out.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("c").alias("vec_id"),
        "rel",
        F.round("score", 6).alias("mmr_score"),
    )
