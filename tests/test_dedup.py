"""Dedup operator quality tests (L1/L2): idempotence, MinHash accuracy,
SimHash locality, planted near-duplicates recovered end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_dedup,
    minhash_lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("lazy", "sleepy")  # one-token edit => high jaccard
    far = "completely different content about spark shuffles and columnar execution engines at scale"
    rows = [
        (1, base),
        (2, base),                     # exact dup of 1 (after normalization)
        (3, "  THE  quick brown fox jumps over the lazy dog and runs far away into the woods tonight "),
        (4, near),                     # near dup of 1
        (5, far),
        (6, far.upper()),              # exact dup of 5 after normalization
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_min_id_survivor_and_idempotent(spark):
    docs = _docs(spark)
    out = exact_dedup(docs, "text", "doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 4, 5]  # {1,2,3} -> 1, {5,6} -> 5, 4 unique
    again = sorted(r.doc_id for r in exact_dedup(out.drop("text_hash"), "text", "doc_id").collect())
    assert again == kept  # dedup(dedup(x)) == dedup(x)


def test_minhash_estimates_jaccard(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs, "text", "doc_id", num_perm=64, shingle_k=3)
    rows = {r.doc_id: r.signature for r in sigs.collect()}
    est_same = sum(a == b for a, b in zip(rows[1], rows[3])) / 64.0
    est_near = sum(a == b for a, b in zip(rows[1], rows[4])) / 64.0
    est_far = sum(a == b for a, b in zip(rows[1], rows[5])) / 64.0
    assert est_same == 1.0
    assert est_near > 0.5
    assert est_far < 0.2


def test_lsh_candidates_find_planted_pair(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs, "text", "doc_id", num_perm=16, shingle_k=3)
    cand = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidate_pairs(sigs, bands=8).collect()}
    assert (1, 2) in cand and (1, 3) in cand
    assert (1, 4) in cand  # near-dup must surface as candidate


def test_ngram_jaccard_exact_values(spark):
    docs = _docs(spark)
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 < pairs[(1, 4)] < 1.0
    assert (1, 5) not in pairs or pairs[(1, 5)] < 0.1


def test_minhash_lsh_dedup_end_to_end(spark):
    docs = _docs(spark)
    kept = sorted(r.doc_id for r in minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.5).collect())
    assert kept == [1, 5]  # 2,3 exact dups; 4 near dup of 1; 6 dup of 5


def test_simhash_locality(spark):
    docs = _docs(spark)
    fp = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id").collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(fp[1], fp[3]) == 0  # same normalized token set
    assert ham(fp[1], fp[4]) <= 12  # one-token edit: few bits flip
    assert ham(fp[1], fp[5]) > 12  # unrelated docs: ~32 expected


def test_simhash_near_pairs_blocking(spark):
    docs = _docs(spark)
    fp = simhash(docs, "text", "doc_id")
    pairs = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(fp, max_hamming=12).collect()}
    assert (1, 3) in pairs
    assert (1, 5) not in pairs


def test_embedding_near_duplicates_planted(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r.id_a, r.id_b) for r in embedding_near_duplicates(df, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_embedding_lsh_recovers_all_exact_pairs(spark):
    """The LSH-bucketed path (the registry/scale default) must find
    every pair the exact all-pairs oracle finds at the registry's
    threshold — this is the recall contract behind keeping the exact
    SQL oracle on l2_embedding_near_dup."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((2 * i, v))
        if i % 3 == 0:  # planted near-dup: tiny perturbation
            rows.append((2 * i + 1, [x + rng.gauss(0, 0.02) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r.id_a, r.id_b) for r in embedding_near_duplicates(df, threshold=0.8, method="exact").collect()}
    lsh = {(r.id_a, r.id_b) for r in embedding_near_duplicates(df, threshold=0.8, method="lsh").collect()}
    assert exact, "fixture must plant at least one near-dup pair"
    assert lsh >= exact  # superset: LSH candidates verified exactly
    assert lsh == exact  # and no false positives (cosine verify)


def test_simhash_narrow_bits_and_empty_docs(spark):
    # bits<64: the top bit of a 32-bit fingerprint is a plain mask test
    # (bit 31), never the int64 sign bit; the value fits in [0, 2^32)
    docs = _docs(spark)
    fp32 = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id", bits=32).collect()}
    assert all(0 <= v < 2**32 for v in fp32.values())
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp32[1], fp32[3]) == 0
    assert ham(fp32[1], fp32[5]) > 6
    # blocking over 32-bit fingerprints only uses the meaningful chunks
    pairs = simhash_near_pairs(simhash(docs, "text", "doc_id", bits=32), max_hamming=6, bits=32)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 3) in got and (1, 5) not in got

    # empty / whitespace-only docs keep a row (simhash=0, n_tokens=0)
    with_empty = spark.createDataFrame([(1, "real content here"), (2, ""), (3, "   ")], ["doc_id", "text"])
    out = {r.doc_id: (r.simhash, r.n_tokens) for r in simhash(with_empty, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == (0, 0) and out[3] == (0, 0)
    assert out[1][1] > 0


# ---------------------------------------------------------------------------
# L8 winnowing fingerprints (operators/dedup.py:winnowing_fingerprints)
# ---------------------------------------------------------------------------


def test_winnowing_guarantee_shared_run_yields_shared_print(spark):
    """The SIGMOD'03 locality guarantee: two docs sharing a run of
    >= w + k - 1 consecutive words MUST share at least one
    fingerprint, however different the rest of the text is."""
    from datalake_polygonscan_spark.operators.dedup import winnowing_fingerprints

    k, w = 3, 4
    shared_run = "alpha bravo charlie delta echo foxtrot"  # w+k-1 = 6 words
    docs = spark.createDataFrame(
        [
            (1, f"completely unrelated opening text {shared_run} and a different tail"),
            (2, f"{shared_run} begins this other document with its own words after"),
            (3, "no overlap at all here just distinct vocabulary throughout the doc"),
        ],
        ["doc_id", "text"],
    )
    fp = {
        r["doc_id"]: set(r["fingerprints"])
        for r in winnowing_fingerprints(docs, "text", "doc_id", k=k, w=w).collect()
    }
    assert fp[1] & fp[2], "shared 6-word run must produce a shared fingerprint"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])


def test_winnowing_short_doc_still_fingerprints(spark):
    from datalake_polygonscan_spark.operators.dedup import winnowing_fingerprints

    docs = spark.createDataFrame([(1, "tiny"), (2, "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in winnowing_fingerprints(docs, "text", "doc_id").collect()}
    assert len(rows[1]["fingerprints"]) == 1 and len(rows[2]["fingerprints"]) == 1


def test_winnowing_overlap_pairs_cap_and_containment(spark):
    """A fingerprint shared by more than max_df docs is boilerplate —
    it may not create pairs by itself; a genuinely duplicated doc pair
    scores containment 1.0."""
    from datalake_polygonscan_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    dup = "one two three four five six seven eight nine ten eleven twelve"
    boiler = "shared boilerplate footer common to every document in the corpus"
    rows = [(1, dup), (2, dup)] + [(i, f"doc {i} unique words here {boiler}") for i in range(3, 10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnowing_fingerprints(docs, "text", "doc_id")
    pairs = winnowing_overlap_pairs(fp, min_shared=2, threshold=0.5, max_df=3).collect()
    got = {(r["id_a"], r["id_b"]): r["overlap"] for r in pairs}
    assert got.get((1, 2)) == 1.0
    # boilerplate-only pairs (3..9 share only >max_df prints) are out
    assert all(p == (1, 2) for p in got)


def test_incremental_lsh_equals_global_restricted(spark):
    """L12's incremental path must find EXACTLY the candidate pairs the
    global banding finds between batch and corpus — persisting the
    index and probing it with only the batch's band rows is a pure
    refactoring of the one-shot join, never a recall trade."""
    from datalake_polygonscan_spark.operators.dedup import (
        banded_signatures,
        incremental_lsh_candidates,
        minhash_lsh_candidate_pairs,
        minhash_signatures,
    )
    from datalake_polygonscan_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    sigs_all = minhash_signatures(docs, "text", "doc_id", num_perm=16, shingle_k=3)
    global_pairs = minhash_lsh_candidate_pairs(sigs_all, bands=8)
    global_cross = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in global_pairs.collect()
        if (r.doc_a % 3 == 0) != (r.doc_b % 3 == 0)
    }

    idx = banded_signatures(
        minhash_signatures(corpus, "text", "doc_id", num_perm=16, shingle_k=3), 8
    )
    probe = banded_signatures(
        minhash_signatures(batch, "text", "doc_id", num_perm=16, shingle_k=3), 8
    )
    incremental = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in incremental_lsh_candidates(probe, idx).collect()
    }
    assert incremental == global_cross
    assert incremental  # non-vacuous: the fixture contains near-dups


def test_containment_catches_quotation_jaccard_misses(spark):
    """L15's reason to exist: a 10-token doc quoted verbatim inside a
    200-token doc has containment 1.0 but Jaccard ~ 0.05 — below any
    sane L2 threshold. Both operators run on the same corpus; the
    quote pair must appear ONLY in the containment output."""
    from datalake_polygonscan_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = " ".join(f"tok{i}" for i in range(12))
    long_doc = (
        " ".join(f"body{i}" for i in range(100))
        + " " + quote + " "
        + " ".join(f"tail{i}" for i in range(100))
    )
    other = " ".join(f"noise{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, other)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(df, "text", "doc_id", threshold=0.5).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["doc_contained"], r["doc_container"]) == (1, 2)
    assert r["containment"] == 1.0
    jacc = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5).collect()
    assert jacc == []  # Jaccard structurally blind to the quotation


def test_ensure_parallelism_gate(spark, tmp_path):
    """The round-robin exchange is GATED on the catalog file index:
    a well-split input (>= shuffle.partitions files) skips it, an
    under-split one keeps it (VERDICT r7 #5)."""
    from datalake_polygonscan_spark.operators.dedup import _ensure_parallelism

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows = spark.range(200).selectExpr("id AS doc_id", "concat('doc ', id) AS text")

    few = str(tmp_path / "few")
    rows.coalesce(1).write.parquet(few)
    under = spark.read.parquet(few)
    assert "REPARTITION_BY_NUM" in _ensure_parallelism(under)._jdf.queryExecution().logical().toString() or \
        "Repartition" in _ensure_parallelism(under)._jdf.queryExecution().logical().toString()

    many = str(tmp_path / "many")
    rows.repartition(target).write.parquet(many)
    well = spark.read.parquet(many)
    assert len(well.inputFiles()) >= target
    gated = _ensure_parallelism(well)
    assert "Repartition" not in gated._jdf.queryExecution().logical().toString()
    # correctness unchanged: same rows either way
    assert gated.count() == 200


def test_duplicate_token_spans_exact_boundaries(spark):
    """L17: token-exact maximal span boundaries — a 23-token shared
    stretch is found at its exact positions in both docs; within-doc
    A+A repetition coalesces to one span covering both copies."""
    from datalake_polygonscan_spark.operators.dedup import duplicate_token_spans

    base = [f"x{i}" for i in range(30)]
    doc1 = " ".join(base)
    doc2 = "y0 y1 " + " ".join(base[5:28]) + " z0"
    rep = [f"a{i}" for i in range(20)]
    doc3 = " ".join(rep + rep)
    other = " ".join(f"n{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, other)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in duplicate_token_spans(df, "text", "doc_id", min_len=20).collect()}
    assert (out[1].n_spans, out[1].dup_tokens, out[1].first_start) == (1, 23, 6)
    assert (out[2].n_spans, out[2].dup_tokens, out[2].first_start) == (1, 23, 3)
    assert (out[3].n_spans, out[3].dup_tokens, out[3].longest_span, out[3].first_start) == (1, 40, 40, 1)
    assert (out[4].n_spans, out[4].dup_tokens) == (0, 0)
    # scale shape: never a cartesian product
    plan = duplicate_token_spans(df, "text", "doc_id", min_len=20)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_remove_duplicate_spans_rewrite(spark):
    """L19: every occurrence of a duplicated span is cut (the paper's
    policy), survivors keep exact positional order, fully-duplicated
    docs collapse to empty."""
    from datalake_polygonscan_spark.operators.dedup import remove_duplicate_spans

    shared = " ".join(f"x{i}" for i in range(20))
    d1 = "a1 a2 " + shared + " a3"
    d2 = "b1 " + shared
    d3 = " ".join(f"u{i}" for i in range(25))
    df = spark.createDataFrame([(1, d1), (2, d2), (3, d3)], "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicate_spans(df, "text", "doc_id", min_len=20).collect()}
    assert out[1].cleaned_text == "a1 a2 a3" and out[1].n_removed == 20
    assert out[2].cleaned_text == "b1" and out[2].n_removed == 20
    assert out[3].n_removed == 0 and out[3].cleaned_text == d3
    # a doc that IS the shared span exactly vanishes
    df2 = spark.createDataFrame([(1, shared), (2, shared)], "doc_id long, text string")
    out2 = {r.doc_id: r for r in remove_duplicate_spans(df2, "text", "doc_id", min_len=20).collect()}
    assert out2[1].cleaned_text == "" and out2[1].n_removed == 20
