"""Corpus-curation operators: decontamination, deterministic sampling,
repetition stats (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.curation import (
    SAMPLE_DENOM,
    benchmark_decontaminate,
    boilerplate_ngrams,
    deterministic_stratified_sample,
    pack_sequences,
    pii_redact,
    repetition_stats,
    tfidf_top_terms,
    vocab_top_terms,
)


def test_decontaminate_flags_benchmark_copy(spark):
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris and the capital of italy is rome")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "the capital of france is paris and the capital of italy is rome"),  # verbatim leak
            (2, "spark shuffles partition data between executors during wide transformations"),
            (3, "quiz answer: the capital of france is paris everyone knows that fact today"),  # partial leak
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in benchmark_decontaminate(corpus, bench, "text", "doc_id").collect()}
    assert rows[1].contaminated == 1 and rows[1].overlap_frac == 1.0
    assert rows[2].contaminated == 0 and rows[2].n_overlap == 0
    assert 0 < rows[3].overlap_frac < 1.0  # shares the leaked clause only


def test_stratified_sample_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)], ["doc_id", "lang"]
    )
    rates = {"en": 1.0, "zh": 0.25}
    s1 = deterministic_stratified_sample(df, "doc_id", "lang", rates)
    s2 = deterministic_stratified_sample(df, "doc_id", "lang", rates)
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in s2.collect())
    assert ids1 == ids2  # seedless determinism: identical across runs
    by_lang = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == 1000  # rate 1.0 keeps everything
    assert 150 <= by_lang.get("zh", 0) <= 350  # ~250 expected at rate 0.25
    buckets = [r.sample_bucket for r in s1.limit(50).collect()]
    assert all(0 <= b < SAMPLE_DENOM for b in buckets)


def test_stratified_sample_unknown_stratum_uses_default(spark):
    df = spark.createDataFrame([(1, "xx"), (2, "xx")], ["doc_id", "lang"])
    assert deterministic_stratified_sample(df, "doc_id", "lang", {"en": 1.0}).count() == 0
    assert deterministic_stratified_sample(df, "doc_id", "lang", {}, default_rate=1.0).count() == 2


def test_pack_sequences_boundaries_and_strata(spark):
    # en: 3 docs of 600 tokens into 1000-token packs -> cumsum-before 0/600/1200
    # => packs 0,0,1 with offsets 0,600,200. zh gets its own pack numbering.
    df = spark.createDataFrame(
        [(1, "en", 600), (2, "en", 600), (3, "en", 600), (4, "zh", 999)],
        ["doc_id", "lang", "n"],
    )
    rows = {
        r.doc_id: r
        for r in pack_sequences(
            df, "doc_id", F.col("n"), context_len=1000, strata_col="lang"
        ).collect()
    }
    assert (rows[1].pack_id, rows[1].pack_offset) == (0, 0)
    assert (rows[2].pack_id, rows[2].pack_offset) == (0, 600)
    assert (rows[3].pack_id, rows[3].pack_offset) == (1, 200)
    assert (rows[4].pack_id, rows[4].pack_offset) == (0, 0)  # zh stratum restarts


def test_pii_redact_scrubs_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice@corp.io or bob.smith@mail.example.org host 192.168.1.20 call +44 020-794-6000"),
            (2, "no personal data in this row at all"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in pii_redact(df, "text", "doc_id").collect()}
    assert rows[1].redacted == "mail <EMAIL> or <EMAIL> host <IP> call <PHONE>"
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (2, 1, 1)
    assert rows[2].redacted == "no personal data in this row at all"
    assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_phone) == (0, 0, 0)


def test_vocab_top_terms_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "red red blue"), (2, "red green blue")], ["doc_id", "text"]
    )
    rows = vocab_top_terms(df, "text", "doc_id", k=10).collect()
    assert [(r.rank, r.term, r.n_occurrences, r.doc_freq) for r in rows] == [
        (1, "red", 3, 2),
        (2, "blue", 2, 2),  # blue before green: tie on count, term asc
        (3, "green", 1, 1),
    ]


def test_boilerplate_ngrams_df_threshold(spark):
    # "click here" appears in 2/3 docs (df_frac 0.667 >= 0.5);
    # doc 3 repeats "spam spam" internally but DISTINCT-per-doc keeps its df at 1/3.
    df = spark.createDataFrame(
        [(1, "click here now"), (2, "click here today"), (3, "spam spam spam spam")],
        ["doc_id", "text"],
    )
    out = {r.shingle: r for r in boilerplate_ngrams(df, "text", "doc_id", 2, 0.5).collect()}
    assert "click here" in out and out["click here"].doc_freq == 2
    assert round(out["click here"].df_frac, 3) == 0.667
    assert "spam spam" not in out


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [(1, "common zebra common"), (2, "common common plain"), (3, "common words only")],
        ["doc_id", "text"],
    )
    rows = [r for r in tfidf_top_terms(df, "text", "doc_id", k=1).collect() if r.doc_id == 1]
    assert rows[0].term == "zebra"  # df=1 beats 'common' (df=3) despite tf 1 vs 2


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now " * 20),  # pure loop: near-total shingle duplication
            (2, "each word here appears exactly once with no repeated trigram anywhere today"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert rows[1].flagged_repetitive == 1 and rows[1].dup_shingle_frac > 0.9
    assert rows[2].flagged_repetitive == 0 and rows[2].dup_shingle_frac == 0.0


def test_curate_corpus_reason_precedence(spark):
    from datalake_polygonscan_spark.operators.curation import curate_corpus

    good = "each word here appears exactly once with no repeated trigram anywhere today ok"
    rows = [
        (1, "en", good),                      # survivor of the 1/3 pair, en rate 1.0 -> kept
        (3, "en", good),                      # same normalized text, higher id -> duplicate
        (5, "en", "too short"),               # quality gate fires first
        (7, "en", ("loop loop " * 12).strip()),  # repetitive
        (9, "xx", good + " unique tail"),     # stratum with rate 0 -> sampled_out
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r.doc_id: r for r in curate_corpus(df, "text", "doc_id", "lang", {"en": 1.0}).collect()}
    assert out[1].reason == "kept" and out[1].kept == 1
    assert out[3].reason == "duplicate"
    assert out[5].reason == "quality"
    assert out[7].reason == "repetitive"
    assert out[9].reason == "sampled_out"
    assert all(r.kept == 0 for d, r in out.items() if d != 1)


def test_weighted_sample_rate_tracks_weight(spark):
    from datalake_polygonscan_spark.operators.curation import deterministic_weighted_sample

    df = spark.createDataFrame([(i, 1.0 if i < 1000 else 0.1) for i in range(2000)], ["doc_id", "w"])
    kept = deterministic_weighted_sample(df, "doc_id", F.col("w")).collect()
    full = sum(1 for r in kept if r.doc_id < 1000)
    tenth = sum(1 for r in kept if r.doc_id >= 1000)
    assert full == 1000            # weight 1.0 keeps everything
    assert 50 <= tenth <= 180      # ~100 expected at weight 0.1
    again = deterministic_weighted_sample(df, "doc_id", F.col("w")).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in kept)  # reproducible


def test_chunk_documents_overlap_and_coverage(spark):
    import pytest
    from datalake_polygonscan_spark.operators.curation import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")], ["doc_id", "text"])
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    # doc 1: stride 2, starts 0,2,4,6 (start=8 suppressed: adds no new
    # tokens beyond overlap) -> every consecutive pair shares 2 tokens
    chunks = [t.split() for _, t in sorted(by_doc[1])]
    assert [c[:2] for c in chunks[1:]] == [c[-2:] for c in chunks[:-1]]
    assert chunks[0][0] == "t0" and chunks[-1][-1] == "t9"
    assert len(chunks) == 4
    # short and empty docs still emit exactly one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0][1] == "a b"
    assert len(by_doc[3]) == 1
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_lm_perplexity_orders_quality_and_handles_oov(spark):
    from datalake_polygonscan_spark.operators.curation import ngram_lm_perplexity

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 5) for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),          # in-domain
            (101, "zzz qqq xxx vvv www yyy"),          # all OOV
            (102, "the"),                              # 1 token: no bigrams
            (103, ""),                                 # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_lm_perplexity(docs, train).collect()}
    assert set(out) == {100, 101}  # <2-token docs excluded
    assert out[100]["nll"] < out[101]["nll"]  # in-domain scores better
    assert out[100]["ppl"] < out[101]["ppl"]
    assert out[100]["n_bigrams"] == 5 and out[101]["n_bigrams"] == 5
    # smoothing keeps OOV finite
    import math
    assert math.isfinite(out[101]["ppl"])


def test_exact_quota_sample_hard_counts(spark):
    from datalake_polygonscan_spark.operators.curation import exact_quota_sample

    docs = spark.createDataFrame(
        [(i, "a" if i < 50 else "b") for i in range(60)], "doc_id long, lang string"
    )
    out = exact_quota_sample(docs, ["lang"], quota=20)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"a": 20, "b": 10}  # min(quota, n) exactly
    # determinism: same result twice
    again = exact_quota_sample(docs, ["lang"], quota=20)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_token_budget_mixture_semantics(spark):
    from datalake_polygonscan_spark.operators.curation import token_budget_mixture

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh", 100) for i in range(40)],
        "doc_id long, lang string, n_tokens long",
    )
    out = token_budget_mixture(docs, "lang", {"en": 350}, "n_tokens").collect()
    # zh has no budget -> excluded entirely
    assert all(r["lang"] == "en" for r in out)
    # 100-token docs against a 350 budget: 4 docs (the 4th crosses)
    assert len(out) == 4
    assert max(r["_cum_tokens"] for r in out) == 400  # overshoot <= one doc
    # every non-empty budget yields at least one doc even if tiny
    tiny = token_budget_mixture(docs, "lang", {"zh": 1}, "n_tokens").collect()
    assert len(tiny) == 1 and tiny[0]["lang"] == "zh"


def test_leakage_free_split_colocates_duplicates(spark):
    """L5n: duplicates (same normalized text) always land on the same
    split side; the fraction is approximately train_frac."""
    from datalake_polygonscan_spark.operators.curation import leakage_free_split

    rows = [(i, f"doc number {i % 200}  extra   SPACES") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_free_split(df, "text", train_frac=0.8, buckets=1000)
    # every duplicate group is entirely train or entirely test
    sides = (
        out.groupBy(out.text).agg(
            __import__("pyspark.sql.functions", fromlist=["countDistinct"]).countDistinct("split").alias("n")
        )
    )
    assert sides.filter("n > 1").count() == 0
    frac = out.filter("split = 'train'").count() / 1000
    assert 0.6 < frac < 0.95  # 200 groups, binomial-ish spread
    import pytest

    with pytest.raises(ValueError, match="train_frac"):
        leakage_free_split(df, "text", train_frac=1.5)


def test_duplicated_span_fraction_hand_fixture(spark):
    """Two docs sharing one 4-token chunk verbatim, one unique doc:
    shared chunks are duplicated (cross-doc), unique chunks are not,
    and the token fraction attributes exactly."""
    from datalake_polygonscan_spark.operators.curation import duplicated_span_fraction

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one text here"),
            (2, "alpha beta gamma delta other tail words xx"),
            (3, "totally different content with no shared span"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicated_span_fraction(
        docs, "text", "doc_id", chunk_tokens=4).collect()}
    # docs 1 and 2: chunk[0] = 'alpha beta gamma delta' shared -> dup;
    # chunk[1] (4 tokens) unique -> 4/8 of tokens duplicated
    for d in (1, 2):
        assert out[d].n_chunks == 2 and out[d].n_dup_chunks == 1
        assert out[d].total_tokens == 8
        assert abs(out[d].dup_token_fraction - 0.5) < 1e-9
    assert out[3].n_dup_chunks == 0 and out[3].dup_token_fraction == 0.0


def test_bpe_train_greedy_and_deterministic(spark):
    """Greedy leftmost merge on repeated pairs ("aaaa" + (a,a) ->
    [aa, aa]), deterministic lexicographic tie-break, convergence
    flag true within the pass budget."""
    from datalake_polygonscan_spark.operators.curation import bpe_train

    df = spark.createDataFrame([(1, "aaaa aaaa"), (2, "aaaa")], "doc_id long, text string")
    merges, words = bpe_train(df, "text", n_merges=2)
    assert merges[0][1:4] == ("a", "a", "aa") and merges[0][4] == 9  # 3 pairs x 3 words
    # round 2: (aa,aa) and (aa,</w>) tie at 3 -> '</w>' sorts first
    assert merges[1][1:4] == ("aa", "</w>", "aa</w>")
    row = words.collect()[0]
    assert row["s"] == "aa aa</w>" and row["ok"] is True
