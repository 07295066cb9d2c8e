"""Corpus-curation operators for training-data pipelines (L5).

Three ops every large-scale pretraining pipeline runs besides dedup:

- ``benchmark_decontaminate`` — flag/drop corpus documents whose
  n-grams overlap an evaluation benchmark (PaLM/GPT-4-style
  decontamination: a doc is contaminated when >= ``threshold`` of its
  shingles appear anywhere in the benchmark set).
- ``deterministic_stratified_sample`` — per-stratum downsampling with
  a content-independent md5 hash gate: reproducible across runs,
  engines and cluster sizes (no RNG state, no sampleBy seed drift).
- ``repetition_stats`` — Gopher-style within-document repetition
  signal: duplicate n-gram fraction over the shingle *multiset*.

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

from pyspark.sql import DataFrame
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
    context_len: int = 4096,
    strata_col: str | None = None,
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
    source, date bucket) bound per-partition size and give
    parallelism; an unstratified global pack would funnel the corpus
    through one task — pass a stratum for real corpora.

    Output: (doc_id, [stratum], n_tokens, pack_id, pack_offset).
    """
    from pyspark.sql import Window

    part = Window.partitionBy(strata_col) if strata_col else Window.partitionBy()
    w = part.orderBy(F.col(id_col).asc()).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    cols = [F.col(id_col).alias("doc_id")] + ([strata_col] if strata_col else [])
    return (
        df.select(*cols, token_count.cast("long").alias("n_tokens"))
        .withColumn("pack_id", F.floor(cum_before / context_len).cast("long"))
        .withColumn("pack_offset", (cum_before % context_len).cast("long"))
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
