"""Corpus-curation operators for training-data pipelines (L5).

The ops every large-scale pretraining pipeline runs besides dedup:

- ``benchmark_decontaminate`` — flag/drop corpus documents whose
  n-grams overlap an evaluation benchmark (PaLM/GPT-4-style
  decontamination: a doc is contaminated when >= ``threshold`` of its
  shingles appear anywhere in the benchmark set).
- ``deterministic_stratified_sample`` — per-stratum downsampling with
  a content-independent md5 hash gate: reproducible across runs,
  engines and cluster sizes (no RNG state, no sampleBy seed drift).
- ``repetition_stats`` — Gopher-style within-document repetition
  signal: duplicate n-gram fraction over the shingle *multiset*.
- ``pack_sequences`` — contiguous context-window packing via an
  exclusive per-stratum running token sum.
- ``pii_redact`` — regex PII scrubbing (email/IPv4/phone) with
  per-type counts; zero shuffle.
- ``vocab_top_terms`` / ``tfidf_top_terms`` — tokenizer-vocab
  induction and per-doc keyword extraction.
- ``boilerplate_ngrams`` — corpus-level hot-n-gram (stop-shingle)
  detection by document frequency.

Scale notes (the 100 TB story):
- Decontamination joins the exploded corpus shingles against the
  DISTINCT benchmark shingle set. Benchmarks are small (10^4-10^6
  n-grams), so the join side is broadcast — the corpus is scanned
  once, no shuffle of corpus shingles, and the per-doc overlap count
  is a map-side partial aggregate on doc_id.
- The sample gate is a pure codegen projection (md5 + modulo) — a
  narrow scan with zero shuffle; partition pruning and pushdown stay
  intact because it is a plain filter.
- Repetition stats are per-row array expressions — embarrassingly
  parallel, no shuffle at all.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_polygonscan_spark.functions.text import tokens, word_shingles
from datalake_polygonscan_spark.operators.dedup import shingle_sets

#: denominator of the deterministic sample gate: rates are quantized to
#: 1/10000ths so the Spark filter and the oracle CASE table agree exactly.
SAMPLE_DENOM = 10_000


def _id_hash(id_col, denom: int = SAMPLE_DENOM) -> F.Column:
    """Portable per-row hash in [0, denom): first 60 bits of
    md5(CAST(id AS STRING)) mod denom — identical in Spark
    (``conv``) and DuckDB (``CAST('0x'||hex AS BIGINT)``)."""
    s = F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % F.lit(denom)


def benchmark_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document benchmark-overlap stats over distinct word
    shingles. Output: (doc_id, n_shingles, n_overlap, overlap_frac,
    contaminated) — ``contaminated`` = 1 when the fraction of the
    doc's shingles found in the benchmark union set >= threshold.

    The benchmark shingle set is deduplicated then BROADCAST: corpus
    shingles never shuffle, the overlap count partial-aggregates
    map-side. SINGLE PASS over the corpus shingles: because the
    per-doc shingle set is distinct, ``n_shingles`` is just the
    per-doc row count of the exploded table, so one broadcast
    left-join with a hit flag + one aggregation computes both counts
    — the corpus side is shingled exactly once.
    """
    bench_sh = (
        shingle_sets(benchmark, text_col, id_col, shingle_k)
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ex = shingle_sets(corpus, text_col, id_col, shingle_k).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    counts = (
        ex.join(F.broadcast(bench_sh), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.count("_hit").cast("long").alias("n_overlap"),
        )
    )
    frac = F.col("n_overlap") / F.col("n_shingles")
    return counts.withColumn("overlap_frac", F.round(frac, 6)).withColumn(
        "contaminated", (frac >= threshold).cast("int")
    )


def deterministic_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff ``hash(id) mod 10000 < rate(stratum)*10000``.

    Content-independent and seedless: the same row is kept or dropped
    on every run, every engine, every cluster size — the property that
    makes sampled corpora reproducible and incrementally extendable
    (new data changes nothing about old rows' fate). Pure codegen
    filter; no shuffle.
    """
    rate_col: F.Column = F.lit(int(round(default_rate * SAMPLE_DENOM)))
    for key, rate in rates.items():
        rate_col = F.when(F.col(strata_col) == key, F.lit(int(round(rate * SAMPLE_DENOM)))).otherwise(rate_col)
    return df.withColumn("sample_bucket", _id_hash(id_col)).filter(F.col("sample_bucket") < rate_col)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count: F.Column,
    strata_col: str,
    context_len: int = 4096,
) -> DataFrame:
    """Contiguous greedy sequence packing: assign documents to
    fixed-token-budget packs (training context windows) by running
    token count within each stratum, ordered by id — fully
    deterministic and replayable in SQL.

    A doc belongs to the pack where its first token lands
    (``floor(exclusive-cumsum / context_len)``); real packers split or
    truncate boundary-spanning docs downstream — the assignment here is
    the distributed part.

    Scale: ONE shuffle on the stratum key + a running-sum window
    (streaming evaluation, O(1) state per row). Strata (language,
    source, date bucket) bound per-partition size and give parallelism.
    ``strata_col`` is REQUIRED: an unstratified global pack is a
    partition-less window that funnels the whole corpus through one
    task, so the API refuses to express it (use
    :func:`pack_sequences_auto` to derive hash strata when no natural
    stratum exists). The no-partition-less-window contract is
    plan-locked in tests/test_plans.py.

    Output: (doc_id, stratum, n_tokens, pack_id, pack_offset).
    """
    from pyspark.sql import Window

    if not strata_col:
        raise ValueError(
            "pack_sequences requires a stratum column: a global pack is a single-task "
            "window; use pack_sequences_auto(df, ..., n_strata=...) for hash strata"
        )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(F.col(id_col).alias("doc_id"), strata_col, token_count.cast("long").alias("n_tokens"))
        .withColumn("pack_id", F.floor(cum_before / context_len).cast("long"))
        .withColumn("pack_offset", (cum_before % context_len).cast("long"))
    )


def pack_sequences_auto(
    df: DataFrame,
    id_col: str,
    token_count: F.Column,
    context_len: int = 4096,
    n_strata: int = 256,
) -> DataFrame:
    """Sequence packing with DERIVED strata for corpora without a
    natural one: docs are salted into ``n_strata`` hash buckets of the
    id (deterministic — same doc, same stratum, every run), packed
    within each stratum, and pack ids are made globally unique as
    ``stratum * ceil(max_packs) + local pack``-style composition
    (stratum rides in the high bits via string prefix).

    Packs never span strata — equivalent to packing ``n_strata``
    independent sub-corpora in parallel; the padding cost is at most
    one partial pack per stratum, negligible for corpora >> n_strata *
    context_len tokens. Output: (doc_id, stratum, n_tokens, pack_id,
    pack_offset) with ``stratum`` the derived bucket as a string and
    pack_id unique within it.
    """
    salted = df.withColumn(
        "_stratum",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_strata)).cast("string"),
    )
    return pack_sequences(salted, id_col, token_count, "_stratum", context_len).withColumnRenamed(
        "_stratum", "stratum"
    )


#: PII patterns, Java-regex AND RE2 compatible (no lookaround, ASCII
#: \b only) so the Spark redactor and the DuckDB oracle share them
#: verbatim. Redaction order = this tuple's order; counts are taken on
#: the ORIGINAL text so earlier replacements can't mask later counts.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2} \d{3}-\d{3}-\d{4}", "<PHONE>"),
)


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII scrubbing: replace emails / IPv4 addresses / intl phone
    numbers with typed placeholders and report per-type match counts.

    Output: (doc_id, redacted, n_email, n_ipv4, n_phone).

    Scale: pure per-row regexp codegen — a narrow map with zero
    shuffle, so it composes with any downstream op at full scan speed.
    Counts come from the original text (regexp_extract_all size), the
    redacted text applies the patterns in PII_PATTERNS order.
    """
    redacted = F.col(text_col)
    counts = []
    for name, pattern, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pattern, token)
    return df.select(
        F.col(id_col).alias("doc_id"), redacted.alias("redacted"), *counts
    )


def vocab_top_terms(df: DataFrame, text_col: str, id_col: str, k: int = 100) -> DataFrame:
    """Vocabulary induction: corpus-wide top-k terms by total
    occurrence count, with document frequency. Output: (rank, term,
    n_occurrences, doc_freq), deterministic tie-break on term.

    Scale: explode -> ONE hash aggregation keyed on term (partial
    map-side combine collapses the token stream before the shuffle;
    distinct-doc count rides the same shuffle), then
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
    per-partition top-k + driver merge, no global sort. The rank
    window runs over the k surviving rows only.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("term"))
    agg = tok.groupBy("term").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("_doc").cast("long").alias("doc_freq"),
    )
    order = [F.desc("n_occurrences"), F.asc("term")]
    top = agg.orderBy(*order).limit(k)
    return top.select(
        F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
        "term",
        "n_occurrences",
        "doc_freq",
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 2,
    min_df_frac: float = 0.05,
) -> DataFrame:
    """Corpus-level boilerplate detection (CCNet-style): n-grams whose
    DOCUMENT frequency exceeds ``min_df_frac`` of the corpus — the
    repeated headers/footers/navigation text a crawl pipeline strips
    before training. Output: (shingle, doc_freq, n_docs, df_frac).

    Scale: per-doc DISTINCT shingles (so a looping doc can't inflate
    df) -> explode -> one hash aggregation on the shingle key with
    map-side partial combine; the corpus total is a 1-row aggregate
    cross-joined back (broadcast, no shuffle of the freq table). The
    hot tail this emits is exactly the stop-shingle list
    ``jaccard``'s ``max_doc_freq`` pruning consumes upstream
    (dedup.py) — one pass feeds both curation and dedup.
    """
    ex = shingle_sets(df, text_col, id_col, shingle_k).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    dfreq = ex.groupBy("shingle").agg(F.count("*").cast("long").alias("doc_freq"))
    total = df.agg(F.count("*").cast("long").alias("n_docs"))
    frac = F.col("doc_freq") / F.col("n_docs")
    return (
        dfreq.crossJoin(F.broadcast(total))
        .withColumn("df_frac", F.round(frac, 6))
        .filter(frac >= min_df_frac)
    )


def tfidf_top_terms(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Per-document top-k keywords by TF-IDF
    (``tf * ln((N+1)/(df+1))``), deterministic tie-break on term.
    Output: (doc_id, term, tf, doc_freq, tfidf, rank).

    Scale: two hash aggregations — (doc, term) term frequencies, then
    term document frequencies off the ALREADY-AGGREGATED tf table
    (vocab-sized input, not the token stream) — and a broadcast join
    of the vocab-sized df/N side back onto tf, so the big table
    shuffles once on (doc, term). Ranking is a per-doc window over
    <= vocab-per-doc rows. Both engines compute the score in IEEE
    double with the same operation order, so ordering agrees exactly.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("doc_freq"))
    total = df.agg(F.count("*").cast("long").alias("n_docs"))
    score = F.col("tf") * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0)))
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.asc("term"))
    return (
        tf.join(F.broadcast(dfreq.crossJoin(total)), "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", F.round(score, 6).alias("tfidf"), "rank")
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3, flag_frac: float = 0.2) -> DataFrame:
    """Within-document repetition signal: duplicate-shingle fraction
    over the n-gram MULTISET (1 - distinct/total), the Gopher quality
    filter for looping/boilerplate text. Output: (doc_id, n_tokens,
    n_shingles, dup_shingle_frac, flagged_repetitive)."""
    grams = word_shingles(text_col, shingle_k)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        F.size(grams).cast("long").alias("n_shingles"),
        F.round(dup_frac, 6).alias("dup_shingle_frac"),
        (dup_frac > flag_frac).cast("int").alias("flagged_repetitive"),
    )


def curate_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    min_chars: int = 50,
    max_chars: int = 10_000,
    max_punct_ratio: float = 0.2,
    shingle_k: int = 3,
    max_dup_frac: float = 0.2,
) -> DataFrame:
    """End-to-end corpus curation verdict: every document with its
    keep/drop decision and the FIRST failing gate as the reason, in
    fixed precedence:

    ``quality`` (C4-style length/punct gates) -> ``repetitive``
    (Gopher duplicate-shingle fraction) -> ``duplicate`` (exact
    dedup on md5 of normalized text, min-id survivor over ALL docs)
    -> ``sampled_out`` (deterministic per-stratum hash gate) ->
    ``kept``.

    Output: (doc_id, stratum, kept, reason).

    Scale: every gate except dedup is per-row codegen; dedup is ONE
    shuffle on the content hash (the whole pipeline's only exchange).
    The verdict-with-reason form — rather than a filtered corpus —
    is what production pipelines persist: it makes every drop
    auditable and the kept set reproducible as a trivial filter.
    """
    from datalake_polygonscan_spark.functions.text import normalize_text

    norm = normalize_text(text_col)
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[\p{Punct}]"), 0))
    punct_ratio = n_punct / F.greatest(F.length(text_col), F.lit(1))
    passes_quality = F.length(text_col).between(min_chars, max_chars) & (
        punct_ratio < max_punct_ratio
    )
    grams = word_shingles(text_col, shingle_k)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams)

    rate_col: F.Column = F.lit(0)
    for key, rate in rates.items():
        rate_col = F.when(F.col(strata_col) == key, F.lit(int(round(rate * SAMPLE_DENOM)))).otherwise(rate_col)
    sampled_in = _id_hash(id_col) < rate_col

    from pyspark.sql import Window

    survivor = F.col(id_col) == F.min(id_col).over(Window.partitionBy(F.md5(norm)))
    reason = (
        F.when(~passes_quality, F.lit("quality"))
        .when(dup_frac > max_dup_frac, F.lit("repetitive"))
        .when(~survivor, F.lit("duplicate"))
        .when(~sampled_in, F.lit("sampled_out"))
        .otherwise(F.lit("kept"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        reason.alias("reason"),
    ).withColumn("kept", (F.col("reason") == "kept").cast("int"))


def deterministic_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: F.Column,
) -> DataFrame:
    """Importance sampling with per-ROW keep probability: keep iff
    ``hash(id) mod 10000 < floor(weight * 10000)`` — the weighted
    generalization of :func:`deterministic_stratified_sample` (whose
    rates are per-stratum constants). ``weight`` is any expression in
    [0, 1]: quality score, inverse duplication count, recency decay.

    Same reproducibility contract: seedless, engine-independent,
    cluster-size-independent; a row's fate never changes across runs.
    ``floor`` (not round) quantizes the gate so both engines cut at
    identical integers. Pure codegen filter, zero shuffle.

    Output: input rows + (sample_bucket, keep_gate), kept rows only.
    """
    gate = F.floor(weight * SAMPLE_DENOM).cast("long")
    return (
        df.withColumn("sample_bucket", _id_hash(id_col))
        .withColumn("keep_gate", gate)
        .filter(F.col("sample_bucket") < F.col("keep_gate"))
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    long-document -> training-sequence step (each chunk fits a context
    window; ``overlap`` tokens of continuity across boundaries).

    Pure codegen: one whitespace tokenization, ``sequence`` of chunk
    starts exploded per document, ``slice`` + ``array_join`` per chunk
    — no UDF, no shuffle (embarrassingly parallel per document; row
    count grows ~n_tokens/stride per doc). A trailing window that only
    re-covers the previous chunk's overlap is suppressed
    (``start < n - overlap``), so every emitted chunk contributes new
    tokens. Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    starts = base.select(
        "doc_id",
        "_toks",
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride))
        ).alias("_start"),
    ).filter((F.col("_start") == 0) | (F.col("_start") < F.col("_n") - overlap))
    chunk = F.slice("_toks", F.col("_start") + 1, F.lit(chunk_tokens))
    return starts.select(
        "doc_id",
        (F.col("_start") / stride).cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def ngram_lm_perplexity(
    docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """L7 — bigram language-model perplexity scoring (the CCNet-style
    quality signal: score documents by how surprising they are to a
    model trained on a trusted slice of the corpus; high perplexity ->
    low quality / out of domain).

    Train: unigram + bigram counts over ``train_docs`` — two exploded
    hash aggregates, map-side combined, so the shuffle carries at most
    the vocabulary (resp. bigram vocabulary), not the corpus. Score:
    each document's bigrams left-join the count tables (broadcast: a
    pruned model is small by construction — at web scale keep the
    top-N vocabulary and let everything else hit the OOV mass, which
    this add-alpha smoothing already models) and fold into
    avg-negative-log-likelihood per document.

    Model: add-alpha smoothed bigram probabilities
    ``P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)`` with
    ``V = |vocab| + 1`` (the +1 is the OOV type). Documents with fewer
    than 2 tokens produce no bigrams and are excluded. Every step is
    integer counts + one closed-form float expression, so an oracle
    can replay it exactly.

    Output: (doc_id, n_bigrams, nll, ppl) with nll/ppl rounded to 4.
    """
    def _toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("t"),
        )

    def _pairs(toks: DataFrame) -> DataFrame:
        return (
            toks.filter(F.size("t") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(slice(t, 1, size(t)-1), (x, i) -> struct(x AS w1, t[i+1] AS w2))"
                    )
                ).alias("p"),
            )
            .select("doc_id", "p.w1", "p.w2")
        )

    train_toks = _toks(train_docs)
    c1 = (
        train_toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    c2 = _pairs(train_toks).groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    vocab_v = c1.count() + 1  # +1 = the OOV type

    scored = (
        _pairs(_toks(docs))
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1.withColumnRenamed("w", "w1")), ["w1"], "left")
        .withColumn(
            "_lp",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.lit(float(vocab_v)))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(-F.col("_lp")), 4).alias("nll"),
        F.round(F.exp(F.avg(-F.col("_lp"))), 4).alias("ppl"),
    )


def exact_quota_sample(
    docs: DataFrame,
    strata_cols: list[str],
    quota: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """L5k — EXACT per-stratum quota sampling: exactly ``min(quota,
    n_stratum)`` rows from every stratum, chosen by md5-hash order of
    the id (deterministic, engine-portable, uniformly random w.r.t.
    any data property not derived from the id — the same hash-as-RNG
    contract as the rate-based samplers). Rate-based gates
    (:func:`stratified_sample`) give each stratum a binomial DRAW
    around the target; training-data budgets are usually hard counts
    per language/source, which needs rank-below-quota instead.

    One shuffle on the strata (the rank window); ties impossible (md5
    of distinct ids collides only at 2^-64). At 100 TB this is the
    same shape as top-k-per-group (O2): a WindowGroupLimit plan, no
    global sort."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("_qr", F.row_number().over(w))
        .filter(F.col("_qr") <= quota)
        .drop("_qr")
    )


def token_budget_mixture(
    docs: DataFrame,
    source_col: str,
    budgets: dict[str, int],
    token_count_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """L5m — data-mixture assembly to per-source TOKEN budgets: from
    each source, take documents in md5-hash order until the source's
    token budget is exhausted (the first document to CROSS the budget
    is included, so every non-empty budget yields at least one
    document and the overshoot is bounded by one document). This is
    the training-mixture primitive — "200M tokens of code, 100M of
    wiki" — where the unit of account is tokens, not documents.

    One shuffle on the source (the running-sum window); the budget
    gate compares the EXCLUSIVE prefix sum against the budget, all
    codegen. Sources absent from ``budgets`` contribute nothing.
    Output keeps the input columns plus ``_cum_tokens`` (the inclusive
    running total within the source, for auditability)."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )[F.col(source_col)]
    prev = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return (
        docs.withColumn("_prev_tokens", prev)
        .filter(budget.isNotNull() & (F.col("_prev_tokens") < budget))
        .withColumn("_cum_tokens", F.col("_prev_tokens") + F.col(token_count_col))
        .drop("_prev_tokens")
    )


def leakage_free_split(
    df: DataFrame,
    text_col: str,
    train_frac: float = 0.8,
    buckets: int = 1000,
) -> DataFrame:
    """L5n — LEAKAGE-FREE train/test split: the split key is the
    md5 of the NORMALIZED text (the L1 dedup identity), not the row,
    so every duplicate of a document lands on the SAME side — the
    contamination rule benchmark-hygiene audits check first (test-set
    member with a train-side near-copy = leaked eval). Deterministic
    (content-derived, no RNG), one projection, zero shuffle; the same
    group key at 100 TB splits identically on any cluster. Adds
    (split_bucket, split) columns; ``train_frac`` rounds to 1/buckets
    granularity exactly like l5 rate sampling.
    """
    from datalake_polygonscan_spark.functions.text import normalize_text

    if not (0 < train_frac < 1):
        raise ValueError(f"train_frac must be in (0,1), got {train_frac}")
    bucket = _id_hash(normalize_text(text_col), denom=buckets)
    # round, not truncate: int(0.29 * 100) == 28 silently undercuts the
    # documented 1/buckets granularity for fractions that are not exact
    # binary floats
    cutoff = int(round(train_frac * buckets))
    return df.withColumn("split_bucket", bucket).withColumn(
        "split", F.when(F.col("split_bucket") < cutoff, "train").otherwise("test")
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set
    (Robertson & Walker, SIGIR'94) — THE lexical ranking function of
    every retrieval/RAG curation stack, from scratch on DataFrame ops.

    Shape for 100 TB: the explode is filtered to the |terms| query
    tokens BEFORE the (doc, term) tf aggregate, so only matching
    postings ever shuffle; corpus stats (N, avgdl) and per-term df are
    tiny aggregates broadcast back; the final per-doc sum is one
    map-side-combinable groupBy.

    Determinism contract: each (doc, term) contribution is quantized
    to integer nano-scores via floor(x*1e9 + 0.5) and summed as BIGINT,
    so float addition order cannot flip the result; the one division
    back to double at the end is a single IEEE op identical on any
    engine. The oracle replays the same formula text.
    """
    from datalake_polygonscan_spark.functions.text import normalize_text

    toks = F.split(normalize_text(text_col), " ")
    docs = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).withColumn("dl", F.size("toks").cast("long"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "nano",
            F.expr(
                f"CAST(floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5))"
                f" * (tf * ({k1} + 1)) / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))"
                f" * 1000000000.0 + 0.5) AS BIGINT)"
            ),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms_matched"),
        (F.sum("nano").cast("double") / F.lit(1000000000.0)).alias("bm25"),
    )


#: L10 fixed tokenizer vocabulary (longest-match-wins). Multi-char
#: entries are corpus words; every other character falls back to a
#: 1-char token, so segmentation is total. Order is irrelevant — the
#: matcher always takes the LONGEST match at the cursor.
TOKENIZER_VOCAB: tuple[str, ...] = (
    "scan", "column", "window", "order", "sort", "merge", "part",
    "agg", "value", "line", "key", "join", "query", "group",
    "vector", "hash", "slow", "stream", "filter", "fast", "the",
    "spark", "batch", "table", "row", "data", "small", "big",
    "customer", "dup",
)


def greedy_tokenize(text: str, vocab: tuple[str, ...] = TOKENIZER_VOCAB) -> list[str]:
    """Greedy longest-match segmentation (the WordPiece/BPE-apply
    inference rule: at each cursor take the longest vocabulary entry
    matching, else a single-character token). Deterministic — ties are
    impossible because two distinct equal-length tokens cannot both be
    prefixes of the same suffix."""
    by_len = sorted({len(v) for v in vocab}, reverse=True)
    vset = set(vocab)
    out = []
    i, n = 0, len(text)
    while i < n:
        for ln in by_len:
            if text[i : i + ln] in vset:
                out.append(text[i : i + ln])
                i += ln
                break
        else:
            out.append(text[i])
            i += 1
    return out


def tokenize_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_chars: int = 48,
    vocab: tuple[str, ...] = TOKENIZER_VOCAB,
) -> DataFrame:
    """L10 — tokenizer APPLY over a corpus: greedy longest-match
    segmentation of each document's first ``max_chars`` normalized
    characters via an Arrow-batched pandas UDF (the inference half of
    BPE/WordPiece — training the merge table is a separate offline
    job; applying it is THE hot loop of every data pipeline that
    counts tokens for billing/packing).

    One projection, zero shuffle, O(len x |len-classes|) per doc.
    Returns (id, n_tokens, tokens) with tokens '|'-joined in order —
    the exact segmentation, value-checked by a recursive-CTE oracle
    that walks a precomputed longest-match step table."""
    from pyspark.sql.functions import pandas_udf

    from datalake_polygonscan_spark.functions.text import normalize_text

    @pandas_udf("string")
    def _tok(texts: pd.Series) -> pd.Series:
        return pd.Series(
            ["|".join(greedy_tokenize(t[:max_chars])) for t in texts.astype(str)]
        )

    out = df.select(
        F.col(id_col).alias("doc_id"),
        _tok(normalize_text(text_col)).alias("tokens"),
    )
    return out.select(
        "doc_id",
        (F.size(F.split("tokens", r"\|")) * (F.length("tokens") > 0).cast("int"))
        .cast("long")
        .alias("n_tokens"),
        "tokens",
    )


def duplicated_span_fraction(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 32,
) -> DataFrame:
    """L13 — per-document duplicated-SPAN fraction: chunk every
    document into non-overlapping ``chunk_tokens`` windows, hash each
    chunk (md5, engine-neutral), and call a chunk DUPLICATED when the
    same hash occurs in more than one distinct document. The fraction
    of a document's tokens living in duplicated chunks is the
    FineWeb-style intra-corpus contamination signal — documents can be
    near-unique at whole-doc granularity (L1/L2 pass them) while still
    being mostly stitched-together boilerplate spans.

    Scale shape: the chunk-hash groupBy is the blocking structure
    (never pairwise text comparison); one groupBy on the hash, one
    hash-join back, one groupBy per doc — all keys are 32-char
    digests, so the shuffles carry hashes + counts, not text.

    Output: (doc_id, n_chunks, n_dup_chunks, total_tokens,
    dup_token_fraction) with the fraction floor-quantized to 1e-6.
    """
    chunks = chunk_documents(df, text_col, id_col, chunk_tokens, overlap=0)
    hashed = chunks.select(
        "doc_id", "n_chunk_tokens", F.md5("chunk_text").alias("h")
    )
    spread = hashed.groupBy("h").agg(
        F.countDistinct("doc_id").alias("_ndocs")
    )
    marked = hashed.join(spread, "h").withColumn("_dup", F.col("_ndocs") > 1)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.col("_dup").cast("long")).cast("long").alias("n_dup_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("total_tokens"),
            F.sum(
                F.when(F.col("_dup"), F.col("n_chunk_tokens")).otherwise(0)
            ).cast("long").alias("_dup_tokens"),
        )
        .select(
            "doc_id", "n_chunks", "n_dup_chunks", "total_tokens",
            (
                F.floor(
                    F.col("_dup_tokens") / F.col("total_tokens") * 1e6
                ) / 1e6
            ).alias("dup_token_fraction"),
        )
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    max_word_len: int = 12,
    replace_passes: int = 4,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """L18 — BYTE-PAIR-ENCODING tokenizer TRAINING at corpus scale
    (Sennrich, Haddow & Birch, ACL 2016 — the public BPE algorithm):
    learn ``n_merges`` merge rules by repeatedly counting adjacent
    symbol pairs over the corpus and merging the most frequent one.

    The corpus-scale shape (what makes this work at 100 TB):

    - the corpus COLLAPSES to its vocabulary first — one groupBy over
      lowercased ``[a-z]+`` words ([1..max_word_len] chars) with
      counts, so every later round works on |vocab| rows, not |corpus|
      rows (the standard trick: pair frequencies are linear in word
      counts);
    - each round is ONE partial-agg shuffle (pair -> weighted count,
      map-side combinable) + a driver-side argmax of that tiny pair
      table (count DESC, then lexicographic (a, b) — a deterministic
      unique winner) + a broadcast-literal merge applied map-side with
      zero shuffle; the working set localCheckpoints per round so the
      plan never deepens (the G2/G8 iterative discipline).

    Merge application is EXACT GREEDY leftmost, expressed as an
    engine-portable fixpoint: the space-joined symbol string wrapped
    in sentinels has ``' a b '`` replaced by ``' ab '`` repeatedly
    (``replace_passes`` passes). One pass of SQL replace() consumes
    the shared separator of back-to-back occurrences ("a b a b" only
    merges the first), so iterating to fixpoint reproduces greedy
    semantics; convergence within the fixed pass budget is VERIFIED
    per row per round (one more pass must be a no-op) and surfaced in
    the returned ``ok`` column — an under-budgeted replay fails loudly
    (the g10 oracle-convergence discipline). Using the same replace()
    primitive on both engines is what lets a SQL oracle replay
    training round-for-round, winner selection included.

    Returns ``(merges, words)``: ``merges`` = [(rank, left, right,
    merged, pair_count)] in learned order; ``words`` = DataFrame
    (w, cnt, s, ok) with each vocab word's final segmentation.
    """
    words = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    work = words.select(
        "w",
        "cnt",
        F.concat(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")), F.lit(" </w>")
        ).alias("s"),
        F.lit(True).alias("ok"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    pair_list = (
        "transform(sequence(0, size(split(s, ' ')) - 2), "
        "i -> concat_ws(' ', split(s, ' ')[i], split(s, ' ')[i+1]))"
    )
    for k in range(n_merges):
        top = (
            work.select("cnt", F.explode(F.expr(pair_list)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("pc"))
            .select(
                F.split("pair", " ")[0].alias("a"),
                F.split("pair", " ")[1].alias("b"),
                "pc",
            )
            .orderBy(F.desc("pc"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # 1-row argmax: loop control, not data movement
        )
        if not top:
            break
        a, b, pc = top[0]["a"], top[0]["b"], int(top[0]["pc"])
        merges.append((k + 1, a, b, a + b, pc))
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        p = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        for _ in range(replace_passes):
            p = F.replace(p, pat, rep)
        conv = F.replace(p, pat, rep) == p
        work = work.select(
            "w", "cnt", F.trim(p).alias("s"), (F.col("ok") & conv).alias("ok")
        ).localCheckpoint(eager=True)
    return merges, work
