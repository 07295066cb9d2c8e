"""Similarity-search quality: exact top-k vs numpy; ANN recall vs the
brute-force baseline on real testdata embeddings."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_bucketed_topk
from datalake_polygonscan_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _queries(emb, n=5):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _recall(approx_rows, exact_rows) -> float:
    from collections import defaultdict

    exact, approx = defaultdict(set), defaultdict(set)
    for r in exact_rows:
        exact[r.query_id].add(r.vec_id)
    for r in approx_rows:
        approx[r.query_id].add(r.vec_id)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total


def test_brute_force_matches_numpy(spark):
    emb = load_table(spark, SF, "embeddings")
    got = brute_force_topk(_queries(emb, 3), emb, k=5).collect()
    mat = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    for qid in range(3):
        q = mat[qid]
        sims = {
            vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))) for vid, v in mat.items()
        }
        want = sorted(sims, key=lambda v: (-sims[v], v))[:5]
        have = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
        assert have == want


def test_lsh_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _queries(emb, 10)
    exact = brute_force_topk(q, emb, k=10).collect()
    approx = lsh_bucketed_topk(q, emb, k=10, n_planes=6, n_tables=8, dim=64, multiprobe_bits=1).collect()
    # random embeddings are the adversarial case for SRP-LSH (all angles
    # near 90°): 6-bit signatures x 8 OR'd tables + flip-1 multiprobe
    assert _recall(approx, exact) >= 0.5


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _queries(emb, 10)
    exact = brute_force_topk(q, emb, k=10).collect()
    approx = ivf_topk(q, emb, k=10, nlist=8, nprobe=4).collect()
    assert _recall(approx, exact) >= 0.6  # probing half the lists


def test_int8_quantization_reconstruction_error_bounded(spark):
    """Symmetric int8: |v_i - q_i*scale| <= scale/2 = max|v|/254 per
    element — the standard scalar-quantization error bound."""
    import numpy as np

    from datalake_polygonscan_spark.operators.similarity import quantize_embeddings

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.uniform(-2, 2, 16)]) for i in range(20)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = {r["vec_id"]: (r["qvec"], r["scale"]) for r in quantize_embeddings(df).collect()}
    for i, v in vecs:
        q, s = out[i]
        assert all(abs(x - qi * s) <= s / 2 + 1e-12 for x, qi in zip(v, q))
        assert all(-127 <= qi <= 127 for qi in q)


def test_quantized_topk_matches_exact_on_random_corpus(spark):
    """int8 first pass + exact re-rank with a 5x shortlist must
    recover the exact top-k on a random corpus (recall 1.0) — the
    shortlist absorbs quantization rank noise."""
    import numpy as np

    from datalake_polygonscan_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    rng = np.random.RandomState(5)
    corpus = [(i, [float(x) for x in rng.normal(0, 1, 24)]) for i in range(300)]
    df = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in quantized_topk(q, df, k=5, shortlist=25).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in brute_force_topk(q, df, k=5).collect()
    }
    assert got == want


def test_pq_topk_recall_floor(spark, sf_dir):
    """L3pq: PQ ADC + exact re-rank must recover >= 0.7 of the exact
    top-10 (measured 0.88 at this SF)."""
    from datalake_polygonscan_spark.operators import similarity as S
    from datalake_polygonscan_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.brute_force_topk(q, emb, k=10).select("query_id", "vec_id")
    approx = S.pq_topk(q, emb, k=10).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert hits / exact.count() >= 0.7


def test_pq_encode_matches_numpy_argmin(spark, sf_dir):
    """The codegen nested-lambda encoder must equal the numpy L2
    argmin bit-for-bit (this is the regression test for the
    multi-lambda scoping bug: separately-built transform lambdas
    assembled with F.array silently mis-resolve)."""
    import numpy as np

    from datalake_polygonscan_spark.operators import similarity as S
    from datalake_polygonscan_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    corpus_n = S._unit_vec(emb.select("vec_id", "embedding"), "embedding")
    books = S.pq_train_codebooks(corpus_n, m=8, ksub=8, sample=64)
    B = np.asarray(books)
    m, _, dsub = B.shape
    rows = corpus_n.collect()
    ids = [r.vec_id for r in rows]
    X = np.asarray([list(r.embedding) for r in rows])
    truth = np.stack(
        [
            ((X[:, j * dsub : (j + 1) * dsub][:, None, :] - B[j][None, :, :]) ** 2)
            .sum(2)
            .argmin(1)
            for j in range(m)
        ],
        axis=1,
    )
    got = {r.vec_id: list(r.codes) for r in S.pq_encode(corpus_n, books).collect()}
    got_m = np.asarray([got[i] for i in ids])
    assert (got_m == truth).all()


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from datalake_polygonscan_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_train_codebooks(df, m=2)


def test_ivf_pq_recall_floor(spark, sf_dir):
    """L3ivfpq: sub-linear candidates + compressed scoring must still
    recover >= 0.7 of the exact top-10 (measured 0.94-0.96)."""
    from datalake_polygonscan_spark.operators import similarity as S
    from datalake_polygonscan_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.brute_force_topk(q, emb, k=10).select("query_id", "vec_id")
    approx = S.ivf_pq_topk(q, emb, k=10).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert hits / exact.count() >= 0.7


def test_mmr_rerank_diversifies_near_duplicate_shortlist(spark):
    """Constructed shortlist where plain top-k returns 3 near-identical
    candidates first: MMR must interleave the distinct one ahead of the
    duplicates. rel(A1)=.99, rel(A2)=.98, rel(A3)=.97 (mutual sim .99),
    rel(B)=.90 (sim to A* = 0.0). Scores: step1 -> A1; step2: A2 =
    .7*.98-.3*.99=.389 vs B = .7*.9=.63 -> B wins despite lower rel."""
    from datalake_polygonscan_spark.operators.similarity import mmr_rerank

    shortlist = spark.createDataFrame(
        [(1, 11, 0.99), (1, 12, 0.98), (1, 13, 0.97), (1, 20, 0.90)],
        "query_id long, vec_id long, rel double",
    )
    dup = [(1, a, b, 0.99) for a in (11, 12, 13) for b in (11, 12, 13) if a != b]
    cross = [(1, a, 20, 0.0) for a in (11, 12, 13)] + [(1, 20, a, 0.0) for a in (11, 12, 13)]
    sims = spark.createDataFrame(dup + cross, "query_id long, ca long, cb long, s double")
    out = [(r["rank"], r["vec_id"]) for r in
           mmr_rerank(shortlist, sims, k=4, lam=0.7).orderBy("rank").collect()]
    assert out == [(1, 11), (2, 20), (3, 12), (4, 13)]
