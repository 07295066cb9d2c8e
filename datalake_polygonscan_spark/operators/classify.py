"""ML5 — multinomial Naive Bayes text classification (language ID).

The classic distributed-trainable classifier: training is nothing but
COUNTING (class priors, per-class token counts, vocabulary size), so
it parallelizes as two map-side-combined hash aggregates whose shuffle
carries the vocabulary, not the corpus — the same shape as the L7
bigram LM (queries/corpus_ops.py). Scoring joins each token occurrence
against the BROADCAST model (|vocab| x |classes| rows, bounded) and
sums per-(doc, class) log-likelihoods.

Determinism contract (the AN3/ML3 discipline): every log-prob TERM is
rounded to 9 dp and summed as DECIMAL(28,9), so the float-addition
order a shuffle would randomize never touches a score; the argmax
compares exact decimals with a lexicographic class tie-break. ln() on
identical IEEE doubles agrees across engines for these inputs (the
same bet L7's perplexity and TF-IDF already make), so a DuckDB oracle
replays training AND scoring exactly.

Reference scope: the reference repo (walletDataConsumer.py) has no ML
tier; this extends the engine's training-data-pipeline surface
(language ID is the first gate of a corpus-curation pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(28,9)"


def naive_bayes_language_id(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train multinomial NB on the ``id % 2 == 0`` half of ``docs`` and
    predict ``label_col`` for every tokenized document.

    Returns (doc_id, <label_col> actual, pred, correct int, n_tokens)
    — one row per document with at least one whitespace token.
    Laplace add-1 smoothing with V = |train vocab| + 1 (the OOV type).
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).alias("actual"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    train = toks.filter(F.col("doc_id") % 2 == 0)

    tok_c = train.groupBy(F.col("actual").alias("cls"), "w").agg(
        F.count("*").alias("c")
    )
    tot = train.groupBy(F.col("actual").alias("cls")).agg(F.count("*").alias("tot"))
    vv = train.agg((F.countDistinct("w") + 1).alias("v"))
    pri = (
        docs.filter(F.col(id_col) % 2 == 0)
        .groupBy(F.col(label_col).alias("cls"))
        .agg(F.count("*").alias("nd"))
    )
    ntr = docs.filter(F.col(id_col) % 2 == 0).agg(F.count("*").alias("nt"))

    lp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("tot") + F.col("v"))
    )
    scored = (
        toks.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vv))
        .join(F.broadcast(tok_c), ["cls", "w"], "left")
        .groupBy("doc_id", "actual", "cls")
        .agg(
            F.sum(F.round(lp, 9).cast(DEC)).alias("ll"),
            F.count("*").alias("n_tok"),
        )
    )
    prior_lp = F.round(
        F.log(F.col("nd").cast("double") / F.col("nt")), 9
    ).cast(DEC)
    final = (
        scored.join(F.broadcast(pri), "cls")
        .crossJoin(F.broadcast(ntr))
        .select(
            "doc_id", "actual", "cls", "n_tok",
            (F.col("ll") + prior_lp).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cls").asc())
    return (
        final.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "doc_id",
            F.col("actual").alias("lang"),
            F.col("cls").alias("pred"),
            (F.col("actual") == F.col("cls")).cast("int").alias("correct"),
            F.col("n_tok").cast("long").alias("n_tokens"),
        )
    )
