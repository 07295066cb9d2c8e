"""L5 corpus-curation registry entries (decontamination, deterministic
sampling, repetition filtering) — tail entries with FULL DuckDB oracles
(the graded top-50 covers the SURVEY §2.2 inventory; these extend the
training-pipeline surface and are value-checked by the local sweep and
tests/test_curation.py).

The benchmark set for the decontamination entry is carved from the
documents table itself (doc_id % 25 == 7) so the op runs on driver
testdata without a second table; in production the benchmark side is
its own (small) table and the operator takes it as a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators import curation as C
from datalake_polygonscan_spark.operators.curation import SAMPLE_DENOM
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table, tiny_df

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

#: per-language sample rates for the stratified-sample entry, shared
#: with the oracle CASE generator below.
SAMPLE_RATES: dict[str, float] = {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.25}

_HASH_SQL = f"CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % {SAMPLE_DENOM}"


def _rates_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {int(round(r * SAMPLE_DENOM))}" for k, r in SAMPLE_RATES.items()
    )
    return f"CASE lang {whens} ELSE 0 END"


@register(
    "l5_decontaminate",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 2, 1)),
                   i -> array_to_string(toks[i:i+2], ' ')
               )) AS sh
        FROM norm
    ), bench AS (
        SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 25 = 7
    ), corpus AS (
        SELECT doc_id, sh FROM sh WHERE doc_id % 25 <> 7
    ), ex AS (
        SELECT doc_id, unnest(sh) AS s FROM corpus
    ), ov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM ex JOIN bench USING (s) GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(len(c.sh) AS BIGINT) AS n_shingles,
           coalesce(o.n_overlap, 0) AS n_overlap,
           ROUND(coalesce(o.n_overlap, 0) / len(c.sh), 6) AS overlap_frac,
           CAST(coalesce(o.n_overlap, 0) / len(c.sh) >= 0.5 AS INTEGER) AS contaminated
    FROM corpus c LEFT JOIN ov o USING (doc_id)
    """,
    doc="L5 benchmark decontamination: distinct 3-word-shingle overlap of each corpus doc against the union shingle set of a benchmark split (doc_id%25==7), contaminated at >=50% overlap; benchmark side deduped + BROADCAST so corpus shingles never shuffle (operators/curation.py:benchmark_decontaminate)",
)
def l5_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 25 == 7)
    corpus = docs.filter(F.col("doc_id") % 25 != 7)
    return C.benchmark_decontaminate(corpus, bench, "text", "doc_id", shingle_k=3, threshold=0.5)


@register(
    "l5_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source, {_HASH_SQL} AS sample_bucket
    FROM documents
    WHERE {_HASH_SQL} < {_rates_case_sql()}
    """,
    doc="L5 deterministic stratified sampling: per-language keep rates gated on md5(doc_id) mod 10000 — seedless, reproducible across engines/runs/cluster sizes, pure codegen filter (operators/curation.py:deterministic_stratified_sample)",
)
def l5_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.deterministic_stratified_sample(docs, "doc_id", "lang", SAMPLE_RATES).select(
        "doc_id", "lang", "source", "sample_bucket"
    )


@register(
    "l5_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(floor(coalesce(SUM(n_tokens) OVER (
                PARTITION BY lang ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS pack_id,
           CAST(coalesce(SUM(n_tokens) OVER (
                PARTITION BY lang ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 2048 AS BIGINT) AS pack_offset
    FROM toks
    """,
    doc="L5 sequence packing: per-language contiguous greedy assignment of docs to 2048-token context-window packs via an exclusive running token sum — one stratum shuffle + a streaming window, deterministic and SQL-replayable (operators/curation.py:pack_sequences)",
)
def l5_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F2
    from datalake_polygonscan_spark.functions.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F2.size(F2.split(normalize_text("text"), " "))
    return C.pack_sequences(docs, "doc_id", n_tokens, context_len=2048, strata_col="lang")


#: deterministic synthetic PII injected per doc_id so the redactor has
#: real matches to scrub on the (PII-free) synthetic corpus; shared
#: shape between the Spark derivation and the oracle SQL below.
_PII_EMAIL_COND = "doc_id % 3 = 0"
_PII_IP_COND = "doc_id % 4 = 1"
_PII_PHONE_COND = "doc_id % 5 = 2"


@register(
    "l5_pii_redact",
    oracle=f"""
    WITH pii AS (
        SELECT doc_id,
               text
               || CASE WHEN {_PII_EMAIL_COND}
                       THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
               || CASE WHEN {_PII_IP_COND}
                       THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END
               || CASE WHEN {_PII_PHONE_COND}
                       THEN ' call +1 555-123-4567' ELSE '' END AS t
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
               '\\+\\d{{1,2}} \\d{{3}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '\\+\\d{{1,2}} \\d{{3}}-\\d{{3}}-\\d{{4}}')) AS BIGINT) AS n_phone
    FROM pii
    """,
    doc="L5 PII scrubbing: email/IPv4/phone regex redaction with per-type counts over deterministically-injected synthetic PII (the corpus itself is PII-free); patterns are Java+RE2 compatible and shared verbatim with the oracle; pure per-row codegen, zero shuffle (operators/curation.py:pii_redact)",
)
def l5_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, F.concat(F.lit(" mail user"), did.cast("string"), F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(did % 4 == 1, F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".7"))).otherwise(F.lit("")),
        F.when(did % 5 == 2, F.lit(" call +1 555-123-4567")).otherwise(F.lit("")),
    )
    return C.pii_redact(docs.select("doc_id", pii_text.alias("text")), "text", "doc_id")


@register(
    "l5_vocab_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ), agg AS (
        SELECT term,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM tok GROUP BY term
    )
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, term ASC) AS BIGINT) AS rank,
           term, n_occurrences, doc_freq
    FROM agg
    ORDER BY n_occurrences DESC, term ASC
    LIMIT 100
    """,
    doc="L5 vocabulary induction: corpus top-100 terms by occurrence count with doc frequency — explode + one map-side-combined hash agg, then orderBy().limit() = TakeOrderedAndProject (no global sort); rank numbered over the 100 survivors only (operators/curation.py:vocab_top_terms)",
)
def l5_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.vocab_top_terms(docs, "text", "doc_id", k=100)


@register(
    "l5_boilerplate_ngrams",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(toks) - 1, 1)),
                   i -> array_to_string(toks[i:i+1], ' ')
               )) AS g
        FROM norm
    ), ex AS (
        SELECT doc_id, unnest(g) AS shingle FROM sh
    ), dfreq AS (
        SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq FROM ex GROUP BY shingle
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT shingle, doc_freq, n_docs, ROUND(doc_freq / n_docs, 6) AS df_frac
    FROM dfreq, n
    WHERE doc_freq / n_docs >= 0.05
    """,
    doc="L5 corpus boilerplate detection (CCNet-style): 2-grams present in >=5% of documents — per-doc DISTINCT shingles so loops can't inflate df, explode + one hash agg on the shingle key, 1-row corpus total broadcast back; emits the stop-shingle list dedup's max_doc_freq pruning consumes (operators/curation.py:boilerplate_ngrams)",
)
def l5_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.boilerplate_ngrams(docs, "text", "doc_id", shingle_k=2, min_df_frac=0.05)


@register(
    "l5_tfidf_keywords",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY term
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
               tf.tf * ln((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0)) AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, term, tf, doc_freq, s,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY s DESC, term ASC) AS BIGINT) AS rank
        FROM scored
    )
    SELECT doc_id, term, tf, doc_freq, ROUND(s, 6) AS tfidf, rank
    FROM ranked WHERE rank <= 3
    """,
    doc="L5 per-doc keyword extraction: top-3 terms by TF-IDF (tf * ln((N+1)/(df+1))) — (doc,term) hash agg, doc-freq off the already-aggregated tf table (vocab-sized), broadcast df/N back, per-doc ranking window; identical IEEE-double op order on both engines so ordering agrees exactly (operators/curation.py:tfidf_top_terms)",
)
def l5_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.tfidf_top_terms(docs, "text", "doc_id", k=3)


@register(
    "l5_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           {_HASH_SQL} AS sample_bucket,
           CAST(floor(least(1.0, n_chars / 500.0) * {SAMPLE_DENOM}) AS BIGINT) AS keep_gate
    FROM documents
    WHERE {_HASH_SQL} < CAST(floor(least(1.0, n_chars / 500.0) * {SAMPLE_DENOM}) AS BIGINT)
    """,
    doc="L5 deterministic WEIGHTED sampling: per-row keep probability least(1, n_chars/500) gated on md5(doc_id) — importance sampling (quality/recency/inverse-dup weights) with the stratified sampler's reproducibility contract; floor-quantized gate so both engines cut at identical integers; pure codegen filter, zero shuffle (operators/curation.py:deterministic_weighted_sample)",
)
def l5_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    weight = F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0))
    return C.deterministic_weighted_sample(docs, "doc_id", weight)


@register(
    "l6_curate_corpus",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, lang, text, {_NORM_SQL} AS norm FROM documents
    ), metrics AS (
        SELECT doc_id, lang, text, norm,
               len(regexp_extract_all(text, '[[:punct:]]')) / greatest(length(text), 1) AS punct_ratio,
               min(doc_id) OVER (PARTITION BY md5(norm)) AS survivor_id,
               {_HASH_SQL} AS bucket
        FROM base
    ), grams AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(len(string_split(norm, ' ')) - 2, 1)),
                   i -> array_to_string(string_split(norm, ' ')[i:i+2], ' ')
               ) AS g
        FROM base
    ), verdict AS (
        SELECT m.doc_id, m.lang,
               CASE WHEN NOT (length(m.text) BETWEEN 50 AND 10000 AND m.punct_ratio < 0.2)
                         THEN 'quality'
                    WHEN 1.0 - len(list_distinct(g.g)) / len(g.g) > 0.2 THEN 'repetitive'
                    WHEN m.doc_id <> m.survivor_id THEN 'duplicate'
                    WHEN m.bucket >= {_rates_case_sql()} THEN 'sampled_out'
                    ELSE 'kept' END AS reason
        FROM metrics m JOIN grams g ON m.doc_id = g.doc_id
    )
    SELECT doc_id, lang AS stratum, reason,
           CAST(reason = 'kept' AS INTEGER) AS kept
    FROM verdict
    """,
    doc="L6 end-to-end corpus curation verdict: C4 quality gates -> Gopher repetition -> exact-dedup survivor -> deterministic stratified sample, first failing gate as auditable reason; every gate is per-row codegen except dedup's single content-hash shuffle (operators/curation.py:curate_corpus)",
)
def l6_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.curate_corpus(docs, "text", "doc_id", "lang", SAMPLE_RATES)


@register(
    "l5_repetition_score",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), grams AS (
        SELECT doc_id, len(toks) AS n_toks,
               list_transform(
                   generate_series(1, greatest(len(toks) - 2, 1)),
                   i -> array_to_string(toks[i:i+2], ' ')
               ) AS g
        FROM norm
    )
    SELECT doc_id,
           CAST(n_toks AS BIGINT) AS n_tokens,
           CAST(len(g) AS BIGINT) AS n_shingles,
           ROUND(1.0 - len(list_distinct(g)) / len(g), 6) AS dup_shingle_frac,
           CAST(1.0 - len(list_distinct(g)) / len(g) > 0.2 AS INTEGER) AS flagged_repetitive
    FROM grams
    """,
    doc="L5 repetition / boilerplate signal: duplicate 3-gram fraction over the shingle MULTISET (Gopher-style quality filter), flag at >20%; per-row array expressions, zero shuffle (operators/curation.py:repetition_stats)",
)
def l5_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.repetition_stats(docs, "text", "doc_id", shingle_k=3, flag_frac=0.2)


@register(
    "l5_doc_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks,
               CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n
        FROM documents
    ),
    s AS (
        SELECT doc_id, toks, n, unnest(range(0, CAST(n AS BIGINT), 48)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST(start / 48 AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, start + 1, start + 64)) AS INTEGER) AS n_chunk_tokens,
           array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text
    FROM s
    WHERE start = 0 OR start < n - 16
    """,
    doc="L5 document chunking for training sequences (operators/curation.py:chunk_documents): each doc split into 64-token windows with 16-token overlap (stride 48) — one tokenization, sequence-of-starts explode, slice + array_join, all codegen, zero shuffle; trailing windows that add no new tokens are suppressed. Oracle replays the identical slicing in DuckDB list arithmetic",
)
def l5_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=16)


@register(
    "l7_lm_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ),
    c1 AS (
      SELECT u AS w, count(*) AS c FROM toks, UNNEST(t) AS z(u)
      WHERE doc_id % 2 = 0 GROUP BY u
    ),
    c2 AS (
      SELECT w1, w2, count(*) AS c FROM pairs WHERE doc_id % 2 = 0 GROUP BY w1, w2
    ),
    v AS (SELECT count(*) + 1 AS v FROM c1),
    scored AS (
      SELECT p.doc_id,
             ln((COALESCE(c2.c, 0) + 0.5) / (COALESCE(c1.c, 0) + 0.5 * v.v)) AS lp
      FROM pairs p
      LEFT JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
      LEFT JOIN c1 ON p.w1 = c1.w
      CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-lp), 4) AS nll,
           ROUND(EXP(AVG(-lp)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    doc="L7 bigram language-model perplexity scoring (operators/curation.py:ngram_lm_perplexity; the CCNet quality signal): unigram+bigram counts trained on the doc_id%2==0 half of the corpus (two map-side-combined hash aggregates — the shuffle carries the vocabulary, not the corpus), add-0.5 smoothing with V=|vocab|+1 (the OOV type), every document scored by avg negative log-likelihood over its bigrams via two BROADCAST model joins. Integer counts + one closed-form float expression, so the oracle replays the identical arithmetic in DuckDB SQL",
)
def l7(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    return C.ngram_lm_perplexity(docs, train, "doc_id", "text", alpha=0.5)


@register(
    "l5_quota_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) <= 30
    """,
    doc="L5k EXACT per-stratum quota sampling (operators/curation.py:exact_quota_sample): exactly min(30, n) documents per language, chosen by md5-hash order of the id — hard per-stratum budgets (the usual training-data contract) instead of the binomial draw a rate gate gives; deterministic and engine-portable, one WindowGroupLimit-shaped shuffle, no global sort. Oracle replays the identical rank in DuckDB QUALIFY",
)
def l5_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.exact_quota_sample(docs, ["lang"], quota=30).select("doc_id", "lang")


@register(
    "l5_token_mixture",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE lang IN ('en', 'zh')
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t
    )
    SELECT doc_id, lang, n_tokens, CAST(prev + n_tokens AS BIGINT) AS cum_tokens
    FROM c
    WHERE prev < CASE lang WHEN 'en' THEN 5000 ELSE 2000 END
    """,
    doc="L5m data-mixture assembly to per-source TOKEN budgets (operators/curation.py:token_budget_mixture): 5000 tokens of English, 2000 of Chinese, other languages excluded — documents taken in md5-hash order until the EXCLUSIVE prefix token sum crosses the budget (the crossing document is included, overshoot bounded by one doc); the training-mixture primitive where the unit of account is tokens, not documents. One running-sum window per language, all codegen; oracle replays the identical prefix-sum gate",
)
def l5_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).cast("long"),
    )
    out = C.token_budget_mixture(
        docs, "lang", {"en": 5000, "zh": 2000}, "n_tokens", "doc_id"
    )
    return out.select("doc_id", "lang", "n_tokens", F.col("_cum_tokens").cast("long").alias("cum_tokens"))


@register(
    "l5n_leakage_free_split",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT) % 1000 AS b
        FROM documents
    )
    SELECT CASE WHEN b < 800 THEN 'train' ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT b) AS BIGINT) AS n_buckets
    FROM keyed GROUP BY 1, lang
    """,
    doc=(
        "L5n LEAKAGE-FREE train/test split (operators/curation.py:"
        "leakage_free_split): the split key is md5 of the NORMALIZED "
        "text — the L1 dedup identity — so every duplicate of a "
        "document lands on the SAME side (a test doc with a train-side "
        "copy is a leaked eval, the first benchmark-hygiene rule). "
        "Content-derived, no RNG, one projection, zero shuffle, "
        "identical assignment on any cluster. The oracle replays the "
        "hash bucketing and the per-(split,lang) rollup exactly"
    ),
)
def l5n_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.curation import leakage_free_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        leakage_free_split(docs, "text", train_frac=0.8, buckets=1000)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("split_bucket").alias("n_buckets"),
        )
    )


_BM25_TERMS = ("vector", "spark", "merge", "window", "scan")


@register(
    "l9_bm25_scoring",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), dl AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
    ), st AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
    ), tf AS (
        SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
        WHERE term IN {_BM25_TERMS!r}
        GROUP BY 1, 2, 3
    ), dfs AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), c AS (
        SELECT t.doc_id,
               CAST(floor(ln(1 + (st.n_docs - f.df + 0.5) / (f.df + 0.5))
                 * (t.tf * (1.2 + 1)) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / st.avgdl))
                 * 1000000000.0 + 0.5) AS BIGINT) AS nano
        FROM tf t JOIN dfs f USING (term) CROSS JOIN st
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_matched,
           CAST(sum(nano) AS DOUBLE) / 1000000000.0 AS bm25
    FROM c GROUP BY doc_id
    """,
    doc=(
        "L9 Okapi BM25 relevance scoring from scratch (operators/"
        "curation.py:bm25_scores) — the lexical ranking function of "
        "retrieval/RAG curation, k1=1.2 b=0.75 over a 5-term query. "
        "Postings are filtered to the query terms BEFORE the (doc,term) "
        "tf shuffle; N/avgdl and per-term df are broadcast; per-(doc,"
        "term) contributions quantize to integer nano-scores before the "
        "per-doc BIGINT sum so float addition order cannot flip the "
        "result on any partitioning. Oracle replays the identical "
        "formula text"
    ),
)
def l9_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.curation import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, "text", "doc_id", list(_BM25_TERMS))


from datalake_polygonscan_spark.operators.curation import TOKENIZER_VOCAB

_L10_VOCAB_VALUES = ", ".join(f"('{t}')" for t in TOKENIZER_VOCAB)


@register(
    "l10_tokenizer_apply",
    oracle=f"""
    WITH RECURSIVE vocab(tok) AS (
        VALUES {_L10_VOCAB_VALUES}
    ), docs AS (
        SELECT doc_id, substr({_NORM_SQL}, 1, 48) AS txt FROM documents
    ), pos AS (
        SELECT doc_id, txt, unnest(generate_series(1, length(txt))) AS p
        FROM docs WHERE length(txt) > 0
    ), match AS (
        SELECT o.doc_id, o.p,
               coalesce(arg_max(v.tok, length(v.tok)),
                        min(substr(o.txt, CAST(o.p AS INT), 1))) AS tok
        FROM pos o LEFT JOIN vocab v
          ON substr(o.txt, CAST(o.p AS INT), length(v.tok)) = v.tok
        GROUP BY o.doc_id, o.p
    ), rec(doc_id, p, tok, ord) AS (
        SELECT doc_id, p, tok, 1 FROM match WHERE p = 1
        UNION ALL
        SELECT m.doc_id, m.p, m.tok, r.ord + 1
        FROM rec r JOIN match m
          ON m.doc_id = r.doc_id AND m.p = r.p + length(r.tok)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           md5(string_agg(tok, '|' ORDER BY ord)) AS tokens_md5
    FROM rec GROUP BY doc_id
    """,
    doc=(
        "L10 tokenizer APPLY — greedy longest-match segmentation "
        "(operators/curation.py:greedy_tokenize; the WordPiece/"
        "BPE-inference rule: longest vocabulary entry at the cursor, "
        "1-char fallback, ties impossible) over each doc's first 48 "
        "normalized chars, the hot loop of every token-counting/"
        "packing pipeline. Arrow-batched pandas UDF, zero shuffle. "
        "The oracle value-checks the EXACT segmentation: a "
        "precomputed longest-match table for every (doc, position) "
        "feeds a recursive CTE that replays the cursor walk, and the "
        "md5 of the ordered token string must match byte-for-byte"
    ),
)
def l10_tokenizer_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.functions.text import normalize_text
    from datalake_polygonscan_spark.operators.curation import tokenize_corpus

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(normalize_text("text")) > 0
    )
    out = tokenize_corpus(docs, "text", "doc_id", max_chars=48)
    return out.select("doc_id", "n_tokens", F.md5("tokens").alias("tokens_md5"))


@register(
    "l11_inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term
        FROM documents
    ), postings AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE length(term) >= 3 GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS cf,
           md5(string_agg(concat(doc_id, ':', tf), ',' ORDER BY doc_id)) AS postings_md5
    FROM postings GROUP BY term
    """,
    doc=(
        "L11 inverted-index build — the retrieval structure BM25 (L9) "
        "queries against, materialized as sorted posting lists: one "
        "explode + (term, doc) tf aggregate + per-term ordered "
        "doc-list assembly. The doc_id-ordered postings string is "
        "md5'd per term, so the EXACT posting list (ids AND "
        "term frequencies, in order) is value-checked — a dropped "
        "posting, wrong tf or unsorted list all hash-mismatch. Scale "
        "shape: both aggregates are map-side combinable; per-term "
        "posting lists are the only per-key state (the same bound an "
        "index shard carries), and terms shorter than 3 chars are "
        "stoplisted before the shuffle"
    ),
)
def l11_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.functions.text import normalize_text

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term")
    ).filter(F.length("term") >= 3)
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    return (
        postings.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("cf"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "tf"))
                        ),
                        lambda s: F.concat(
                            s["doc_id"].cast("string"), F.lit(":"), s["tf"].cast("string")
                        ),
                    ),
                    ",",
                )
            ).alias("postings_md5"),
        )
    )


@register(
    "l13_span_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks,
               CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n
        FROM documents
    ), s AS (
        SELECT doc_id, toks, n, unnest(range(0, CAST(n AS BIGINT), 32)) AS start
        FROM t
    ), chunks AS (
        SELECT doc_id,
               CAST(len(list_slice(toks, start + 1, start + 32)) AS BIGINT) AS n_chunk_tokens,
               md5(array_to_string(list_slice(toks, start + 1, start + 32), ' ')) AS h
        FROM s WHERE start = 0 OR start < n
    ), spread AS (
        SELECT h, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY h
    ), marked AS (
        SELECT c.doc_id, c.n_chunk_tokens, (sp.ndocs > 1) AS dup
        FROM chunks c JOIN spread sp ON c.h = sp.h
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           CAST(sum(n_chunk_tokens) AS BIGINT) AS total_tokens,
           floor(sum(CASE WHEN dup THEN n_chunk_tokens ELSE 0 END)
                 / sum(n_chunk_tokens) * 1e6) / 1e6 AS dup_token_fraction,
           CAST(sum(CASE WHEN dup THEN n_chunk_tokens ELSE 0 END)
                / sum(n_chunk_tokens) >= 0.5 AS BOOLEAN) AS flagged
    FROM marked GROUP BY doc_id
    """,
    doc=(
        "L13 duplicated-SPAN fraction per document "
        "(operators/curation.py:duplicated_span_fraction) — the "
        "FineWeb-style contamination signal whole-document dedup "
        "misses: documents assembled mostly from boilerplate spans "
        "pass L1/L2 (each whole text is unique) while most of their "
        "TOKENS live in 32-token chunks that also occur in other "
        "documents. Chunking reuses L5's codegen slicer (no overlap, "
        "so token attribution is exact); the chunk-hash groupBy is "
        "the blocking structure — shuffles carry md5 digests and "
        "counts, never text pairs. Docs with >=50%% duplicated tokens "
        "are flagged for the curation gate. The oracle replays "
        "chunking, hashing, cross-doc spread and the roll-up in SQL, "
        "value-for-value"
    ),
)
def l13_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = C.duplicated_span_fraction(docs, "text", "doc_id", chunk_tokens=32)
    return out.select(
        "doc_id", "n_chunks", "n_dup_chunks", "total_tokens",
        "dup_token_fraction",
        (F.col("dup_token_fraction") >= 0.5).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# L18: BPE tokenizer TRAINING (Sennrich et al. 2016), oracled round-for-round
# ---------------------------------------------------------------------------

_BPE_MERGES = 8
_BPE_PASSES = 4
_BPE_MAXLEN = 12
_BPE_TOPK = 20


def _l18_oracle_sql(
    n_merges: int = _BPE_MERGES,
    passes: int = _BPE_PASSES,
    max_word_len: int = _BPE_MAXLEN,
    topk: int = _BPE_TOPK,
) -> str:
    """Replays BPE training as staged MATERIALIZED CTEs — one
    (pair-count, argmax winner, merge-application) triple per round,
    winner selection INCLUDED, so a wrong pair count, a broken
    tie-break or a non-greedy merge all value-fail. The merge is the
    same replace()-to-fixpoint expression the Spark side runs; the
    convergence flag proves the pass budget sufficed (g10
    discipline)."""
    p_chain = "p0"
    for _ in range(passes):
        p_chain = f"replace({p_chain}, pat, rep)"
    parts = [f"""
    words AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
            FROM documents
        ) WHERE len(w) BETWEEN 1 AND {max_word_len}
        GROUP BY w
    ), seq0 AS MATERIALIZED (
        SELECT w, cnt,
               concat(trim(regexp_replace(w, '(.)', '\\1 ', 'g')), ' </w>') AS s,
               TRUE AS ok
        FROM words
    )"""]
    for k in range(1, n_merges + 1):
        parts.append(f""", pc{k} AS MATERIALIZED (
        SELECT string_split(pair, ' ')[1] AS a,
               string_split(pair, ' ')[2] AS b,
               SUM(cnt) AS pc
        FROM (
            SELECT cnt,
                   unnest(list_transform(
                       generate_series(1, len(string_split(s, ' ')) - 1),
                       i -> array_to_string(string_split(s, ' ')[i:i+1], ' ')
                   )) AS pair
            FROM seq{k - 1}
        ) GROUP BY 1, 2
    ), win{k} AS MATERIALIZED (
        SELECT a, b, CAST(pc AS BIGINT) AS pc
        FROM pc{k} ORDER BY pc DESC, a, b LIMIT 1
    ), seq{k} AS MATERIALIZED (
        SELECT w, cnt, trim(p_fix) AS s,
               ok AND (replace(p_fix, pat, rep) = p_fix) AS ok
        FROM (
            SELECT w, cnt, ok, pat, rep, {p_chain} AS p_fix
            FROM (
                SELECT q.w, q.cnt, q.ok,
                       ' ' || win{k}.a || ' ' || win{k}.b || ' ' AS pat,
                       ' ' || win{k}.a || win{k}.b || ' ' AS rep,
                       ' ' || q.s || ' ' AS p0
                FROM seq{k - 1} q CROSS JOIN win{k}
            )
        )
    )""")
    merge_rows = "\nUNION ALL\n".join(
        f"        SELECT {k} AS k, a, b, pc FROM win{k}" for k in range(1, n_merges + 1)
    )
    parts.append(f""", allok AS (
        SELECT CAST(bool_and(ok) AS INTEGER) AS flag FROM seq{n_merges}
    )
    SELECT 'merge' AS part, CAST(k AS BIGINT) AS rank, a AS left_sym,
           b AS right_sym, a || b AS merged, pc AS cnt,
           CAST(NULL AS VARCHAR) AS tokenized,
           CAST(NULL AS INTEGER) AS all_converged
    FROM (
{merge_rows}
    )
    UNION ALL
    SELECT 'word', CAST(rn AS BIGINT), w, CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), cnt, s, (SELECT flag FROM allok)
    FROM (
        SELECT w, cnt, s, row_number() OVER (ORDER BY cnt DESC, w) AS rn
        FROM seq{n_merges}
    ) WHERE rn <= {topk}
    """)
    return "WITH " + "".join(parts)


@register(
    "l18_bpe_train",
    oracle=_l18_oracle_sql(),
    doc=(
        "L18 BPE tokenizer TRAINING at corpus scale (Sennrich et al. "
        "ACL 2016, the public byte-pair-encoding algorithm; "
        "operators/curation.py:bpe_train): the corpus collapses to "
        "its weighted vocabulary ONCE, then each of the 8 rounds is "
        "one partial-agg pair-count shuffle + a deterministic argmax "
        "(count DESC, lexicographic tie-break) + a broadcast-literal "
        "greedy merge with zero shuffle — the corpus-scale shape "
        "(count pairs -> pick max -> broadcast merge rule). Greedy "
        "merge is an engine-portable replace()-to-fixpoint whose "
        "convergence within the pass budget is verified per row per "
        "round and graded (all_converged). The oracle replays "
        "TRAINING ITSELF round-for-round — pair counts, winner "
        "selection, merge application — as staged MATERIALIZED CTEs, "
        "then checks the learned merge table AND the top-{k} word "
        "segmentations. VERDICT r7 'Next round' #7"
        .format(k=_BPE_TOPK)
    ),
)
def l18_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    merges, words = C.bpe_train(
        docs, "text", n_merges=_BPE_MERGES,
        max_word_len=_BPE_MAXLEN, replace_passes=_BPE_PASSES,
    )
    all_ok = bool(words.agg(F.bool_and("ok")).collect()[0][0])
    merges_df = tiny_df(
        spark,
        [(r, a, b, m, c) for r, a, b, m, c in merges],
        "rank long, left_sym string, right_sym string, merged string, cnt long",
    ).select(
        F.lit("merge").alias("part"), "rank", "left_sym", "right_sym", "merged",
        "cnt", F.lit(None).cast("string").alias("tokenized"),
        F.lit(None).cast("int").alias("all_converged"),
    )
    # vocab is corpus-collapsed (small by construction), so the global
    # ranking window is metadata-sized, not data-sized
    w_rank = Window.orderBy(F.desc("cnt"), F.asc("w"))
    word_rows = (
        words.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= _BPE_TOPK)
        .select(
            F.lit("word").alias("part"), "rank", F.col("w").alias("left_sym"),
            F.lit(None).cast("string").alias("right_sym"),
            F.lit(None).cast("string").alias("merged"), "cnt",
            F.col("s").alias("tokenized"),
            F.lit(all_ok).cast("int").alias("all_converged"),
        )
    )
    return merges_df.unionByName(word_rows)
