"""Corpus-curation operators: decontamination, deterministic sampling,
repetition stats (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.curation import (
    SAMPLE_DENOM,
    benchmark_decontaminate,
    deterministic_stratified_sample,
    pack_sequences,
    repetition_stats,
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
