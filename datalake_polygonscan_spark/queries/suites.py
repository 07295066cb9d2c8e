"""Round-5 graded-window consolidation: merged suite entries.

Each suite packs several already-oracled registry entries into ONE
graded slot as a NULL-padded tagged union (the round-4b x2_x3_x4_x6
pattern, generalized): the per-arm entries stay registered for the
local sweep, the suite reuses their Spark callables AND their oracle
SQL verbatim, and a shared layout table generates the padding on both
engines so the two sides cannot drift.

The composer below is data-driven:
- ``layout`` is the union column list [(name, spark_type, duckdb_type)]
- each arm is (mode_tag, registry_entry, {layout_col: expr}) where
  ``expr`` is a single SQL-expression string valid in BOTH Spark and
  DuckDB (bare column names, '||' concat, CAST) or a (spark, duckdb)
  pair when the dialects differ; unmapped layout columns NULL-pad with
  the layout's types. A mode_tag of None passes the arm's own ``mode``
  column through (arms whose rows are already tagged).

Freed slots fund the round-5 rotation: the round-4 operator tier
(MV5, J7, J8, L8, G2/G4, DQ1, ER1, R10w, R1s-E7) moves into the
driver-graded window (VERDICT r4 'Next round' #1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.queries.registry import REGISTRY, register
from datalake_polygonscan_spark.queries.scalar_funcs import _XA_COLS, _XB_COLS

Layout = list[tuple[str, str, str]]  # (col, spark type, duckdb type)
Arm = tuple[str | None, str, dict[str, str | tuple[str, str]]]

#: suite name -> the registry entries its arms reuse verbatim; the
#: graded-coverage guard (tests/test_oracle_sweep.py) walks this map
#: transitively from GRADED_PREFIX, so an entry that silently drops
#: out of every graded suite fails the build
SUITE_ARMS: dict[str, tuple[str, ...]] = {}


def _spark_expr(e: str | tuple[str, str]) -> str:
    return e[0] if isinstance(e, tuple) else e


def _duck_expr(e: str | tuple[str, str]) -> str:
    return e[1] if isinstance(e, tuple) else e


def _suite(name: str, doc: str, layout: Layout, arms: list[Arm]) -> None:
    SUITE_ARMS[name] = tuple(entry for _mode, entry, _mapping in arms)
    parts = []
    for mode, entry, mapping in arms:
        inner = REGISTRY[entry].oracle
        if inner is None:  # pragma: no cover - composer misuse guard
            raise ValueError(f"suite arm {entry!r} has no oracle")
        if mode is None:
            # passthrough tag: the arm's own tag column, mapped via the
            # 'mode' key when the inner column isn't literally `mode`
            items = [f"{_duck_expr(mapping.get('mode', 'mode'))} AS mode"]
        else:
            items = [f"'{mode}' AS mode"]
        for col, _st, dt in layout:
            if col in mapping:
                items.append(f"{_duck_expr(mapping[col])} AS {col}")
            else:
                items.append(f"CAST(NULL AS {dt}) AS {col}")
        parts.append("    SELECT " + ",\n           ".join(items) + f"\n    FROM (\n{inner}\n    ) _arm")
    oracle = "\nUNION ALL\n".join(parts)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out: DataFrame | None = None
        for mode, entry, mapping in arms:
            df = REGISTRY[entry].fn(spark, sf_dir)
            if mode is None:
                tag = F.expr(_spark_expr(mapping.get("mode", "mode")))
            else:
                tag = F.lit(mode)
            sel = [tag.alias("mode")]
            for col, st, _dt in layout:
                if col in mapping:
                    sel.append(F.expr(_spark_expr(mapping[col])).alias(col))
                else:
                    sel.append(F.lit(None).cast(st).alias(col))
            part = df.select(*sel)
            out = part if out is None else out.unionByName(part)
        assert out is not None
        return out

    fn.__name__ = name
    register(name, oracle=oracle, doc=doc)(fn)


# ---------------------------------------------------------------------------
# J1-J5: every join form in one slot
# ---------------------------------------------------------------------------

_suite(
    "j1_j5_join_suite",
    doc=(
        "J1 inner equi-join + J2 outer + J3 semi/anti + J4 broadcast "
        "dim join + J5 range join as one tagged union — the whole join "
        "surface in one graded slot (merged round 5; per-id entries "
        "stay in the local sweep). Arms are the existing oracled "
        "entries verbatim. Round 6 adds J10 NULL-SAFE equi-join "
        "(`<=>` / IS NOT DISTINCT FROM — NULL keys match each other, "
        "planned as a plain hash join) as a fourth arm"
    ),
    layout=[
        ("c_custkey", "long", "BIGINT"),
        ("label", "string", "VARCHAR"),
        ("n_orders", "long", "BIGINT"),
        ("total_spend", "double", "DOUBLE"),
    ],
    arms=[
        (None, "j2_j3_j5_join_suite", {
            ("mode"): ("side", "side"),
            "c_custkey": "c_custkey", "label": "label",
            "n_orders": "n_orders", "total_spend": "total_spend",
        }),
        ("inner", "j1_inner_equijoin", {
            "label": "o_orderpriority", "n_orders": "n_items",
            "total_spend": "total_price",
        }),
        ("broadcast", "j4_broadcast_dim_join", {
            "label": "r_name || '/' || n_name", "n_orders": "n_customers",
            "total_spend": "total_acctbal",
        }),
        ("null_safe", "j10_null_safe_join", {
            "c_custkey": "o_orderkey",
            "label": ("CAST(k AS STRING)", "CAST(k AS VARCHAR)"),
            "n_orders": "n_cust", "total_spend": "sum_bal",
        }),
    ],
)

# the j2_j3_j5 arm tags rows via its own `side` column
# (outer/semi/anti/range); the composer's mode=None passthrough reads
# a column literally named `mode`, so map it explicitly above.


# ---------------------------------------------------------------------------
# A1-A4: grouped agg + distinct + rollup/cube + global agg
# ---------------------------------------------------------------------------

_suite(
    "a1_a4_agg_suite",
    doc=(
        "A1 hash group-by (TPC-H Q1 shape) + A2 exact grouped "
        "count(DISTINCT) + A3 rollup/cube + A4 global aggregate as one "
        "tagged union — the aggregation surface in one graded slot "
        "(merged round 5)"
    ),
    layout=[
        ("l_returnflag", "string", "VARCHAR"),
        ("l_linestatus", "string", "VARCHAR"),
        ("sum_qty", "double", "DOUBLE"),
        ("sum_base_price", "double", "DOUBLE"),
        ("sum_disc_price", "double", "DOUBLE"),
        ("avg_qty", "double", "DOUBLE"),
        ("avg_disc", "double", "DOUBLE"),
        ("n_suppliers", "long", "BIGINT"),
        ("count_order", "long", "BIGINT"),
        ("gid", "long", "BIGINT"),
        ("roll_n_rows", "long", "BIGINT"),
        ("roll_sum_qty", "double", "DOUBLE"),
        ("g_n_rows", "long", "BIGINT"),
        ("g_n_suppliers", "long", "BIGINT"),
        ("g_total_price", "double", "DOUBLE"),
        ("g_first_ship", "timestamp", "TIMESTAMP"),
        ("g_last_ship", "timestamp", "TIMESTAMP"),
    ],
    arms=[
        ("q1", "a1_a2_groupby_agg_distinct", {
            "l_returnflag": "l_returnflag", "l_linestatus": "l_linestatus",
            "sum_qty": "sum_qty", "sum_base_price": "sum_base_price",
            "sum_disc_price": "sum_disc_price", "avg_qty": "avg_qty",
            "avg_disc": "avg_disc", "n_suppliers": "n_suppliers",
            "count_order": "count_order",
        }),
        (None, "a3_a4_rollup_cube_global", {
            "mode": "mode",
            "l_returnflag": "l_returnflag", "l_linestatus": "l_linestatus",
            "gid": "gid", "roll_n_rows": "n_rows", "roll_sum_qty": "sum_qty",
            "g_n_rows": "g_n_rows", "g_n_suppliers": "g_n_suppliers",
            "g_total_price": "g_total_price", "g_first_ship": "g_first_ship",
            "g_last_ship": "g_last_ship",
        }),
        ("gsets", "a3b_grouping_sets", {
            "l_returnflag": "l_returnflag", "l_linestatus": "l_linestatus",
            "gid": "gid", "roll_n_rows": "n_rows", "roll_sum_qty": "sum_qty",
        }),
    ],
)


# ---------------------------------------------------------------------------
# T1-T2 set ops + O1-O2 sort/top-k
# ---------------------------------------------------------------------------

_suite(
    "t1_t2_o1_o2_set_sort_suite",
    doc=(
        "T1 union all/distinct + T2 intersect/except + O1 global "
        "top-100 (TakeOrderedAndProject) + O2 per-group top-k as one "
        "tagged union (modes all/distinct/intersect/except/global/"
        "per_group are disjoint across the two arms) — merged round 5"
    ),
    layout=[
        ("key", "long", "BIGINT"),
        ("grp", "string", "VARCHAR"),
        ("price", "double", "DOUBLE"),
        ("rn", "long", "BIGINT"),
    ],
    arms=[
        (None, "t1_t2_set_ops", {"mode": "mode", "key": "key"}),
        (None, "o1_o2_sort_topk", {
            "mode": "mode", "key": "o_orderkey", "grp": "grp",
            "price": "o_totalprice", "rn": "rn",
        }),
    ],
)


# ---------------------------------------------------------------------------
# L2: MinHash-LSH text dedup + embedding near-dup LSH scale path
# ---------------------------------------------------------------------------

_suite(
    "l2_dedup_suite",
    doc=(
        "L2 MinHash-LSH end-to-end text dedup + n-gram Jaccard pairs "
        "(value-oracled, md5-deterministic pipeline replayed in SQL) + "
        "the embedding near-dup LSH SCALE PATH with its probe-recall "
        "measured oracle, merged into one graded slot (round 5). "
        "Round 7 adds L12 INCREMENTAL dedup: a new batch probed "
        "against the persisted banded-LSH index, verified pairs "
        "graded, index appended O(batch) as a versioned commit — and "
        "L13 duplicated-span fractions: per-doc token share living in "
        "cross-document 32-token chunks, the contamination signal "
        "whole-doc dedup misses. Round 8 adds L15 n-gram CONTAINMENT "
        "pairs — the asymmetric |A∩B|/|A| signal that catches a short "
        "doc quoted inside a long one (Jaccard ~ 0 there), same "
        "df-bounded shingle blocking, deterministic orientation"
    ),
    layout=[
        ("doc_a", "long", "BIGINT"),
        ("doc_b", "long", "BIGINT"),
        ("jaccard", "double", "DOUBLE"),
        ("n_vectors", "long", "BIGINT"),
        ("pairs_verified", "int", "INTEGER"),
        ("recall_ok", "int", "INTEGER"),
    ],
    arms=[
        (None, "l2_minhash_ngram_dedup", {
            "mode": "kind", "doc_a": "doc_a", "doc_b": "doc_b",
            "jaccard": "jaccard",
        }),
        ("emb_lsh", "l2_embedding_near_dup_lsh", {
            "n_vectors": "n_vectors", "pairs_verified": "pairs_verified",
            "recall_ok": "recall_ok",
        }),
        ("containment", "l15_containment_pairs", {
            "doc_a": "doc_contained", "doc_b": "doc_container",
            "jaccard": "containment",
            "pairs_verified": (
                "CAST(size_contained AS INT)", "CAST(size_contained AS INTEGER)",
            ),
            "recall_ok": (
                "CAST(size_container AS INT)", "CAST(size_container AS INTEGER)",
            ),
        }),
        ("span", "l13_span_dedup", {
            "doc_a": "doc_id", "doc_b": "n_chunks",
            "n_vectors": "total_tokens", "jaccard": "dup_token_fraction",
            "pairs_verified": (
                "CAST(n_dup_chunks AS INT)", "CAST(n_dup_chunks AS INTEGER)",
            ),
            "recall_ok": (
                "CAST(flagged AS INT)", "CAST(flagged AS INTEGER)",
            ),
        }),
        # round 8: L19 ExactSubstr removal APPLIED — cleaned-text md5
        # graded as two 28-bit int slices (layout has no string slot)
        ("span_removal", "l19_span_removal", {
            "doc_a": "doc_id", "doc_b": "n_removed",
            "n_vectors": "n_tokens",
            "pairs_verified": (
                "CAST(conv(substring(cleaned_md5, 1, 7), 16, 10) AS INT)",
                "CAST(CAST('0x' || substr(cleaned_md5, 1, 7) AS BIGINT) AS INTEGER)",
            ),
            "recall_ok": (
                "CAST(conv(substring(cleaned_md5, 8, 7), 16, 10) AS INT)",
                "CAST(CAST('0x' || substr(cleaned_md5, 8, 7) AS BIGINT) AS INTEGER)",
            ),
        }),
        # round 8: L17 token-exact duplicate spans (ExactSubstr) —
        # per-doc maximal-span stats graded (VERDICT r7 #6)
        ("exact_spans", "l17_duplicate_spans", {
            "doc_a": "doc_id", "doc_b": "n_spans",
            "n_vectors": "n_tokens", "jaccard": "dup_frac",
            "pairs_verified": (
                "CAST(dup_tokens AS INT)", "CAST(dup_tokens AS INTEGER)",
            ),
            "recall_ok": (
                "CAST(longest_span AS INT)", "CAST(longest_span AS INTEGER)",
            ),
        }),
        ("incremental", "l12_incremental_dedup", {
            "doc_a": "corpus_doc", "doc_b": "batch_doc", "jaccard": "jacc",
            "pairs_verified": (
                "CAST(index_grew_by_batch AS INT)",
                "CAST(index_grew_by_batch AS INTEGER)",
            ),
            "recall_ok": (
                "CAST(store_version_advanced AS INT)",
                "CAST(store_version_advanced AS INTEGER)",
            ),
        }),
    ],
)


# ---------------------------------------------------------------------------
# ML1-ML3: k-means + SemDeDup + exact-decimal logistic regression
# ---------------------------------------------------------------------------

_suite(
    "ml1_ml2_ml3_suite",
    doc=(
        "ML1 distributed k-means (invariant-oracled) + ML2 SemDeDup "
        "(probe-restricted recall oracle, no quadratic stage) + ML3 "
        "logistic regression by exact-decimal codegen GD (the SQL "
        "replays the entire 5-iteration loop bit-exactly) in one "
        "graded slot (merged round 5) + ML4 distributed PCA (one-pass "
        "mergeable Gramian partials, exact-decimal per-dim moments "
        "value-checked, eigen invariants riding the hash; added "
        "round 6) + ML5 multinomial Naive Bayes language ID "
        "(count-only training, broadcast-model scoring, per-document "
        "MAP decisions oracled value-for-value) + ML7 decision stump "
        "(optimal CART split via division-free exact-BIGINT weighted "
        "Gini over a cumulative window) + ML8 k-NN majority-vote "
        "classifier (held-out queries, L3's top-k operator, voting "
        "replayed in SQL) + ML6 closed-form per-group OLS regression "
        "(exact DECIMAL(38,0) moment sums, Cramer's-rule slope/"
        "intercept/R², one partial-agg exchange) + ML9 chi-square "
        "feature selection (per-(term,language) contingency cells "
        "over the top-df vocabulary, zero cells preserved via a "
        "broadcast grid, exact cross-products, boundary-only IEEE "
        "division; all added round 6). Round 7 adds ML10, the stock "
        "pyspark.ml Pipeline surface (VectorAssembler -> "
        "StandardScaler -> LogisticRegression), graded on held-out "
        "counts, a 0.9 accuracy floor on a separable target, and "
        "transform() re-run bit-identity. Round 8 adds ML11 DBSCAN — "
        "grid-blocked region queries (O(n x density), never O(n^2)), "
        "exact-integer eps predicate, core/border/noise roles and "
        "min-core-id clusters replayed row-for-row by a cross-join + "
        "recursive-closure oracle — and ML12 k-fold CV by mergeable-"
        "moment SUBTRACTION (train = total - held-out fold, exact "
        "DECIMAL sufficient statistics): 5-fold OLS validation from "
        "one scan + one broadcast scoring join, not 2k scans — and "
        "ML13 the hashing trick (signed feature-hashed bag-of-words, "
        "no vocabulary pass, exact integer features via the "
        "engine-portable md5/conv bridge)"
    ),
    layout=[
        ("n_vectors", "long", "BIGINT"),
        ("dim", "long", "BIGINT"),
        ("mean", "double", "DOUBLE"),
        ("variance", "double", "DOUBLE"),
        ("k", "long", "BIGINT"),
        ("clusters_in_range", "boolean", "BOOLEAN"),
        ("inertia_monotone", "boolean", "BOOLEAN"),
        ("self_consistent", "boolean", "BOOLEAN"),
        ("pairs_verified", "boolean", "BOOLEAN"),
        ("recall_ok", "boolean", "BOOLEAN"),
        ("partition_complete", "boolean", "BOOLEAN"),
        ("w0", "double", "DOUBLE"),
        ("w1", "double", "DOUBLE"),
        ("w2", "double", "DOUBLE"),
        ("w3", "double", "DOUBLE"),
        ("bias", "double", "DOUBLE"),
        ("n_docs", "long", "BIGINT"),
        ("train_accuracy", "double", "DOUBLE"),
        ("lang", "string", "VARCHAR"),
        ("pred", "string", "VARCHAR"),
        ("correct", "int", "INTEGER"),
    ],
    arms=[
        ("kmeans", "ml1_kmeans_clusters", {
            "n_vectors": "n_vectors", "k": "k",
            "clusters_in_range": "clusters_in_range",
            "inertia_monotone": "inertia_monotone",
            "self_consistent": "self_consistent",
        }),
        ("semdedup", "ml2_semantic_dedup", {
            "n_vectors": "n_vectors", "pairs_verified": "pairs_verified",
            "recall_ok": "recall_ok",
            "partition_complete": "partition_complete",
        }),
        ("logreg", "ml3_logreg_quality", {
            "w0": "w0", "w1": "w1", "w2": "w2", "w3": "w3",
            "bias": "bias", "n_docs": "n_docs",
            "train_accuracy": "train_accuracy",
        }),
        ("pca", "ml4_distributed_pca", {
            "dim": "dim", "mean": "mean", "variance": "variance",
            "clusters_in_range": "trace_matches",
            "inertia_monotone": "eigen_orthonormal",
            "self_consistent": "eigen_sorted",
        }),
        ("nbayes", "ml5_naive_bayes_langid", {
            "n_vectors": "doc_id", "lang": "lang", "pred": "pred",
            "correct": "correct", "n_docs": "n_tokens",
        }),
        ("knn_clf", "ml8_knn_classifier", {
            "n_vectors": "query_id",
            "lang": ("CAST(true_label AS STRING)", "CAST(true_label AS VARCHAR)"),
            "pred": ("CAST(pred_label AS STRING)", "CAST(pred_label AS VARCHAR)"),
            "n_docs": "n_votes", "correct": "correct",
        }),
        ("stump", "ml7_decision_stump", {
            "mean": "threshold", "n_vectors": "n_left",
            "dim": "pos_left", "k": "n_right", "n_docs": "pos_right",
            "variance": ("CAST(gini_crit AS DOUBLE)", "CAST(gini_crit AS DOUBLE)"),
        }),
        ("ols", "ml6_ols_regression", {
            "lang": "event_type", "n_docs": "n",
            "w0": "slope_ticks_per_sec", "w1": "intercept", "w2": "r2",
        }),
        ("chi2_fs", "ml9_chi2_feature_selection", {
            "pred": "term", "lang": "lang",
            "n_vectors": "a", "dim": "b", "k": "c", "n_docs": "d",
            "variance": "chi2",
        }),
        ("sparkml", "ml10_sparkml_pipeline", {
            "n_vectors": "n_scored", "n_docs": "n_positive",
            "clusters_in_range": "accuracy_ok",
            "self_consistent": "rerun_identical",
        }),
        ("dbscan", "ml11_dbscan", {
            "n_vectors": "id", "dim": "x", "k": "y",
            "lang": "role", "n_docs": "cluster",
        }),
        # round 10: ML11c constant-density DBSCAN — same blocked plan
        # over an area-scaling fixture (the near-linear-scaling arm)
        ("dbscan_const", "ml11c_dbscan_const_density", {
            "n_vectors": "id", "dim": "x", "k": "y",
            "lang": "role", "n_docs": "cluster",
        }),
        ("kfold_cv", "ml12_kfold_cv", {
            "lang": "event_type", "dim": "fold",
            "n_vectors": "n_train", "n_docs": "n_test",
            "w0": "slope_ticks_per_sec", "w1": "intercept",
            "variance": "test_mse_ticks2",
        }),
        ("feat_hash", "ml13_feature_hashing", {
            "n_vectors": "doc_id", "dim": "bucket",
            "k": "feat", "n_docs": "n_tokens",
        }),
        # round 9: ML14 gradient-boosted stumps — tagged passthrough
        # (round/final rows); documented column reuse: thr/u_l/u_r ->
        # n_vectors/dim/k, sizes -> n_docs/correct-as-long via w-cols
        # round 9: ML15 ALS closed-form alternation (d=2 Cramer solve)
        ("als", "ml15_als_recommender", {
            "n_vectors": "user_id", "dim": "n_items",
            "k": "px_micro", "n_docs": "py_micro",
            "w0": "obj0", "w1": "obj1", "recall_ok": "improved",
        }),
        # round 9: ML18 ranking metrics — AP + nDCG@20 (nano-quantized)
        ("ranking", "ml18_ranking_metrics", {
            "lang": "grp", "n_vectors": "n", "dim": "n_pos",
            "mean": "avg_precision", "w0": "dcg20", "w1": "idcg20",
            "variance": "ndcg20",
        }),
        # round 8: ML19 exact isotonic regression (PAV) — fitted step
        # function replayed by the max-min closed form; monotone verdict
        ("isotonic", "ml19_isotonic_calibration", {
            "lang": "grp", "n_vectors": "x", "dim": "w", "k": "s",
            "mean": "fit", "correct": "monotone",
        }),
        # round 9: ML17 calibration eval — reliability bins, exact
        # integer-micro ECE + Brier
        ("calibration", "ml17_calibration_eval", {
            "n_vectors": "bin", "dim": "n", "k": "pos",
            "n_docs": "conf_sum", "mean": "acc", "variance": "conf",
            "w0": "ece", "w1": "brier",
            "w2": ("CAST(ece_micro AS DOUBLE)", "CAST(ece_micro AS DOUBLE)"),
        }),
        # round 9: ML16 exact tie-corrected AUC (Mann-Whitney)
        ("auc", "ml16_exact_auc", {
            "lang": "grp", "n_vectors": "n_pos", "dim": "n_neg",
            "k": "u2", "variance": "auc",
        }),
        (None, "ml14_gradient_boosting", {
            "mode": "mode",
            "n_vectors": "round_no", "dim": "thr", "k": "u_l",
            "n_docs": "u_r", "w0": ("CAST(n_left AS DOUBLE)", "CAST(n_left AS DOUBLE)"),
            "w1": ("CAST(n_right AS DOUBLE)", "CAST(n_right AS DOUBLE)"),
            "w2": ("CAST(sse0 AS DOUBLE)", "CAST(sse0 AS DOUBLE)"),
            "w3": ("CAST(sse_final AS DOUBLE)", "CAST(sse_final AS DOUBLE)"),
            "recall_ok": "improved",
        }),
    ],
)


# ---------------------------------------------------------------------------
# A5 exact percentiles + A6 mergeable-summary heavy hitters
# ---------------------------------------------------------------------------

_suite(
    "a5_a6_advanced_agg_suite",
    doc=(
        "A5 exact grouped percentiles (p50/p90/p99, linear "
        "interpolation == quantile_cont) + A6 distributed heavy "
        "hitters via Misra-Gries-family mergeable summaries with exact "
        "recount + A5b approx_percentile with rank-verified error "
        "bounds, one graded slot (merged round 5) + A7 from-scratch "
        "KLL quantile sketch (mergeable compactor hierarchy, "
        "rank-verified AND size-bound-verified) and its GROUPED form "
        "(one sketch per key in a single applyInPandas shuffle, "
        "per-group rank-verified) plus A9 exact weighted median "
        "(integer cumulative-weight threshold, division-free) and A10 "
        "KMV bottom-k sketches with SET INTERSECTION estimates — the "
        "operation HLL cannot express — plus A11 HyperLogLog itself "
        "from scratch (p=12 dense registers, linear-counting "
        "correction, 7%-bound measured grading) and A12 count-min "
        "sketch point frequencies (4x2048 cells, graded on the CM "
        "inequality est in [exact, exact + eps*N]) (all round 6); "
        "round 7 adds A14 exact distinct via the bitmap function "
        "family, bucketed map-side bitmaps + bitmap_or_agg merge"
    ),
    layout=[
        ("l_returnflag", "string", "VARCHAR"),
        ("p50_qty", "double", "DOUBLE"),
        ("p90_qty", "double", "DOUBLE"),
        ("p99_price", "double", "DOUBLE"),
        ("n", "long", "BIGINT"),
        ("key", "long", "BIGINT"),
        ("cnt", "long", "BIGINT"),
        ("frac", "double", "DOUBLE"),
        ("rank_ok_p50", "int", "INTEGER"),
        ("rank_ok_p90", "int", "INTEGER"),
        ("rank_ok_p99", "int", "INTEGER"),
        ("sketch_bounded", "int", "INTEGER"),
    ],
    arms=[
        ("pctl", "a5_percentiles", {
            "l_returnflag": "l_returnflag", "p50_qty": "p50_qty",
            "p90_qty": "p90_qty", "p99_price": "p99_price", "n": "n",
        }),
        ("heavy", "a6_heavy_hitters", {
            "key": "key", "cnt": "cnt", "frac": "frac",
        }),
        ("approx", "a5b_approx_percentiles", {
            "n": "n_rows", "rank_ok_p50": "rank_ok_p50",
            "rank_ok_p90": "rank_ok_p90", "rank_ok_p99": "rank_ok_p99",
        }),
        ("kll", "a7_kll_quantiles", {
            "n": "n_rows", "rank_ok_p50": "rank_ok_p50",
            "rank_ok_p90": "rank_ok_p90", "rank_ok_p99": "rank_ok_p99",
            "sketch_bounded": "sketch_bounded",
        }),
        ("kmv", "a10_kmv_set_intersection", {
            "n": "exact_a", "key": "exact_b", "cnt": "exact_inter",
            "rank_ok_p50": "est_a_ok", "rank_ok_p90": "est_b_ok",
            "rank_ok_p99": "est_inter_ok",
        }),
        ("wmedian", "a9_weighted_median", {
            "l_returnflag": "l_returnflag", "n": "total_weight",
            "p50_qty": "weighted_median",
        }),
        ("kll_grouped", "a7g_kll_grouped_quantiles", {
            "l_returnflag": "l_returnflag", "n": "n",
            "rank_ok_p50": "rank_ok_p50", "rank_ok_p90": "rank_ok_p90",
        }),
        ("hll", "a11_hll_distinct", {
            "n": "exact_orders", "key": "exact_parts", "cnt": "exact_custs",
            "rank_ok_p50": "est_orders_ok", "rank_ok_p90": "est_parts_ok",
            "rank_ok_p99": "est_custs_ok",
        }),
        ("countmin", "a12_countmin_freq", {
            "key": "key", "cnt": "exact_cnt",
            "rank_ok_p50": "lower_ok", "rank_ok_p90": "upper_ok",
        }),
        ("exact_mode", "a13_exact_mode", {
            "l_returnflag": "l_returnflag || '/' || modal_status",
            "key": "modal_qty_band", "cnt": "modal_count",
        }),
        ("bitmap", "a14_bitmap_distinct", {
            "l_returnflag": "o_orderstatus", "n": "n_customers",
        }),
        ("mad", "a15_exact_mad", {
            "l_returnflag": "event_type", "n": "n",
            "p50_qty": "median", "p90_qty": "mad",
            "p99_price": "sigma_robust",
        }),
        # round 9: A17 modern aggregate surface (FILTER/count_if/
        # bool aggs/deterministic argmin) — casts documented
        ("filter_aggs", "a17_filter_clause_aggs", {
            "l_returnflag": "o_orderpriority", "n": "n",
            "key": "n_big", "cnt": "n_f",
            "rank_ok_p50": ("CAST(any_huge AS INT)",
                            "CAST(any_huge AS INTEGER)"),
            "rank_ok_p90": ("CAST(all_above_floor AS INT)",
                            "CAST(all_above_floor AS INTEGER)"),
            "p50_qty": ("CAST(priciest_order AS DOUBLE)",
                        "CAST(priciest_order AS DOUBLE)"),
            "p90_qty": ("CAST(cheapest_order AS DOUBLE)",
                        "CAST(cheapest_order AS DOUBLE)"),
        }),
        # round 9: A16 exact skewness/kurtosis from integer power sums
        ("shape", "a16_skew_kurtosis", {
            "l_returnflag": "grp", "n": "n", "key": "s1", "cnt": "s2",
            "p50_qty": "skewness", "p90_qty": "kurtosis_excess",
            "rank_ok_p50": ("CAST(s3 % 1000000 AS INT)",
                            "CAST(s3 % 1000000 AS INTEGER)"),
            "rank_ok_p90": ("CAST(s4 % 1000000 AS INT)",
                            "CAST(s4 % 1000000 AS INTEGER)"),
        }),
        # round 8: A20 the built-in DataSketches HLL surface — grouped
        # sketches + no-rescan union merge, error-envelope graded
        ("hll_builtin", "a20_hll_sketch_builtin", {
            "l_returnflag": "l_returnflag", "n": "exact",
            "key": "exact_global",
            "rank_ok_p50": "est_ok", "rank_ok_p90": "union_est_ok",
        }),
        # round 8: P4 DataFrame .pivot() with an explicit value list —
        # the last SURVEY §2.2 id outside the graded window (VERDICT r7
        # 'Next round' #4); decimal-exact sums, rounded-double boundary
        ("pivot", "p4_pivot", {
            "l_returnflag": "l_returnflag",
            "p50_qty": "qty_O", "p90_qty": "qty_F",
        }),
    ],
)


# ---------------------------------------------------------------------------
# E5 + E8: both applyInPandasWithState stateful streams
# ---------------------------------------------------------------------------

_suite(
    "e5_e8_stateful_stream_suite",
    doc=(
        "E5 per-key running totals (applyInPandasWithState, update "
        "mode, cross-batch state) + E8 sessionization with EVENT-TIME "
        "TIMEOUTS (sessions close by gap proof or watermark timeout, "
        "idle keys evict) — both run REAL multi-micro-batch streams; "
        "one graded slot (merged round 5). Round 6 adds E12, the "
        "state-store READER: the checkpointed aggregation state of a "
        "finished stream queried back as a DataFrame via the Spark 4 "
        "statestore/state-metadata sources, oracled against the "
        "closed-form aggregate — and E13, CHAINED stateful operators: "
        "two event-time window aggs in one append-mode query (10-min "
        "rolled into 30-min via window_time), sentinel-flushed through "
        "both state stores, exact vs the two-level batch rollup. "
        "Round 7 adds E18: the SAME running-totals operator under the "
        "RocksDB state-store provider, with offsets-log provider "
        "pinning and on-disk RocksDB snapshot artifacts as graded "
        "verdicts — the state backend a 100 TB deployment tunes"
    ),
    layout=[
        ("user_id", "long", "BIGINT"),
        ("n_events", "long", "BIGINT"),
        ("total_value", "double", "DOUBLE"),
        ("session_start", "timestamp", "TIMESTAMP"),
        ("session_end", "timestamp", "TIMESTAMP"),
        ("session_value", "double", "DOUBLE"),
        ("event_type", "string", "VARCHAR"),
        ("operator_name", "string", "VARCHAR"),
    ],
    arms=[
        ("totals", "e5_stateful_running_totals", {
            "user_id": "user_id", "n_events": "n_events",
            "total_value": "total_value",
        }),
        ("session", "e8_stateful_sessionize", {
            "user_id": "user_id", "session_start": "session_start",
            "session_end": "session_end", "n_events": "n_events",
            "session_value": "session_value",
        }),
        ("state_reader", "e12_state_store_reader", {
            "event_type": "event_type", "n_events": "n_state",
            "total_value": "sum_state", "operator_name": "operator_name",
        }),
        ("chained", "e13_chained_window_agg", {
            "session_start": "w30_start", "event_type": "event_type",
            "n_events": "n_events", "total_value": "total_value",
        }),
        ("rocksdb", "e18_rocksdb_state_backend", {
            "user_id": "user_id", "n_events": "n_events",
            "total_value": "total_value",
            # verdicts ride as strings in the tag-free layout
            "event_type": ("CAST(provider_pinned AS STRING)",
                           "CAST(provider_pinned AS VARCHAR)"),
            "operator_name": ("CAST(rocksdb_files_present AS STRING)",
                              "CAST(rocksdb_files_present AS VARCHAR)"),
        }),
        # round 8: E20 transformWithStateInPandas (typed ValueState +
        # MapState) running through the from-scratch state-protocol
        # runtime — n_types proves the MapState persisted across
        # batches (VERDICT r7 #8)
        ("tws_typed", "e20_tws_typed_state", {
            "user_id": "user_id", "n_events": "n_events",
            "total_value": "total_value",
            "session_value": ("CAST(n_types AS DOUBLE)",
                              "CAST(n_types AS DOUBLE)"),
            "event_type": ("CAST(typed_state_ran AS STRING)",
                           "CAST(typed_state_ran AS VARCHAR)"),
        }),
        # round 8: E21 event-time TIMERS — sessions close on watermark
        # progress with no input for the key; the whole timer protocol
        # family rides the hash
        ("tws_timers", "e21_tws_event_timers", {
            "user_id": "user_id", "n_events": "n_events",
            "session_value": ("CAST(closed AS DOUBLE)",
                              "CAST(closed AS DOUBLE)"),
        }),
    ],
)


# ---------------------------------------------------------------------------
# L5 decontamination + L6 end-to-end curation verdict
# ---------------------------------------------------------------------------

_suite(
    "l5_l6_curation_suite",
    doc=(
        "L5a benchmark decontamination (shingle overlap vs broadcast "
        "benchmark set) + L6 end-to-end curation verdict (quality -> "
        "repetition -> dedup -> sampling gates with auditable "
        "first-failure reason), one graded slot (merged round 5)"
    ),
    layout=[
        ("doc_id", "long", "BIGINT"),
        ("n_shingles", "long", "BIGINT"),
        ("n_overlap", "long", "BIGINT"),
        ("overlap_frac", "double", "DOUBLE"),
        ("contaminated", "int", "INTEGER"),
        ("stratum", "string", "VARCHAR"),
        ("reason", "string", "VARCHAR"),
        ("kept", "int", "INTEGER"),
    ],
    arms=[
        ("decontam", "l5_decontaminate", {
            "doc_id": "doc_id", "n_shingles": "n_shingles",
            "n_overlap": "n_overlap", "overlap_frac": "overlap_frac",
            "contaminated": "contaminated",
        }),
        ("curate", "l6_curate_corpus", {
            "doc_id": "doc_id", "stratum": "stratum", "reason": "reason",
            "kept": "kept",
        }),
    ],
)


# ---------------------------------------------------------------------------
# X2-X8 + P5: the full scalar/type surface (extends the round-4b x suite)
# ---------------------------------------------------------------------------

_suite(
    "x2_x8_p5_scalar_suite",
    doc=(
        "X2 date + X3 math + X4 array HOFs + X6 CASE (the round-4b "
        "suite, passthrough) + X7 Spark 4 VARIANT type + X8 collated "
        "strings (UTF8_LCASE) + P5 unpivot/melt in one graded slot "
        "(merged round 5)"
    ),
    layout=(
        [("k", "long", "BIGINT")]
        + [(c, st, dt) for c, st, dt in _XA_COLS]
        + [(c, st, dt) for c, st, dt in _XB_COLS]
        + [
            ("str_key", "string", "VARCHAR"),
            ("n_events", "long", "BIGINT"),
            ("sum_k", "long", "BIGINT"),
            ("max_k", "long", "BIGINT"),
            ("n_missing", "long", "BIGINT"),
            ("n_customers", "long", "BIGINT"),
            ("n_building_ci", "long", "BIGINT"),
            ("val", "double", "DOUBLE"),
        ]
    ),
    arms=[
        (None, "x2_x3_x4_x6_scalar_suite", dict(
            {"mode": "mode", "k": "k"},
            **{c: c for c, _, _ in _XA_COLS},
            **{c: c for c, _, _ in _XB_COLS},
        )),
        ("variant", "x7_variant_type", {
            "str_key": "event_type", "n_events": "n_events",
            "sum_k": "sum_k", "max_k": "max_k", "n_missing": "n_missing",
        }),
        ("collated", "x8_collated_strings", {
            # the arm's segment column carries UTF8_LCASE collation,
            # which won't UNION with plain strings — collate it back
            "str_key": ("collate(segment, 'UTF8_BINARY')", "segment"),
            "n_customers": "n_customers",
            "n_building_ci": "n_building_ci",
        }),
        ("unpivot", "p5_unpivot_melt", {
            "k": "o_orderkey", "str_key": "metric", "val": "val",
        }),
    ],
)


# ---------------------------------------------------------------------------
# M1-M6 + BMP/PNG/WAV/AVI: media metadata + real codec decode triple
# ---------------------------------------------------------------------------

_suite(
    "m1_m6_media_decode_suite",
    doc=(
        "M1-M3 media metadata/payload-dedup/header-parse (passthrough) "
        "+ M4 frame sampling + M5 resize metadata + M6 byte-histogram "
        "features + REAL compressed-PNG pixel decode (stdlib zlib, all "
        "five filter types) + RIFF/WAVE 16-bit PCM decode + RIFF/AVI "
        "frame decode — the full image/audio/video modality surface "
        "with zero external codec libs, one graded slot (merged round "
        "5). Round 6 adds PROGRESSIVE JPEG (SOF2 successive "
        "approximation) as its own arm, sharing the baseline arm's "
        "closed-form oracle: both coding paths must land on identical "
        "pixels; and IMA ADPCM compressed audio (fmt 0x11, predictive "
        "coding — the fourth compression family), its oracle a "
        "recursive CTE replaying the step-adaptive recurrence; and "
        "TIFF with from-scratch PackBits RLE (the fifth compression "
        "family: run-length + a tag-tree container, javax.imageio "
        "cross-validated). Round 9 adds M7 PERCEPTUAL-hash image "
        "near-dup: 64-bit aHash/dHash over exact-integer "
        "nearest-neighbor downsampled decoded pixels, 16-bit banded "
        "Hamming blocking (the image twin of MinHash-LSH), exact "
        "bit_count(xor) verification — the whole pipeline replayed "
        "by the oracle from the fixture hex"
    ),
    layout=[
        ("media_id", "long", "BIGINT"),
        ("n_bytes", "long", "BIGINT"),
        ("content_md5", "string", "VARCHAR"),
        ("sniffed_mime", "string", "VARCHAR"),
        ("width", "long", "BIGINT"),
        ("height", "long", "BIGINT"),
        ("n_pixels", "long", "BIGINT"),
        ("payload_bytes", "long", "BIGINT"),
        ("payload_md5", "string", "VARCHAR"),
        ("is_survivor", "int", "INTEGER"),
        ("sum_b", "long", "BIGINT"),
        ("sum_g", "long", "BIGINT"),
        ("sum_r", "long", "BIGINT"),
        ("mean_luma", "double", "DOUBLE"),
        ("sample_rate", "long", "BIGINT"),
        ("n_samples", "long", "BIGINT"),
        ("duration_ms", "long", "BIGINT"),
        ("peak", "long", "BIGINT"),
        ("sum_abs", "long", "BIGINT"),
        ("n_frames", "long", "BIGINT"),
        ("frames_match_header", "boolean", "BOOLEAN"),
        ("frame_idx", "long", "BIGINT"),
        ("frame_md5", "string", "VARCHAR"),
        ("f_mean", "double", "DOUBLE"),
        ("f_std", "double", "DOUBLE"),
        ("f_q0", "double", "DOUBLE"),
        ("f_q1", "double", "DOUBLE"),
        ("f_q2", "double", "DOUBLE"),
        ("f_q3", "double", "DOUBLE"),
        ("f_q4", "double", "DOUBLE"),
        ("f_q5", "double", "DOUBLE"),
        ("sum_luma", "long", "BIGINT"),
    ],
    arms=[
        ("frames", "m4_media_frame_sample", {
            "media_id": "media_id", "frame_idx": "frame_idx",
            "frame_md5": "frame_md5",
        }),
        ("resize", "m5_media_resize", {
            "media_id": "media_id", "sniffed_mime": "sniffed_mime",
            "width": "width", "height": "height",
            "content_md5": "content_md5",
        }),
        ("bytefeat", "m6_media_byte_features", {
            "media_id": "media_id", "f_mean": "f_mean", "f_std": "f_std",
            "f_q0": "f_q0", "f_q1": "f_q1", "f_q2": "f_q2",
            "f_q3": "f_q3", "f_q4": "f_q4", "f_q5": "f_q5",
        }),
        ("meta", "m1_m3_media_meta_decode", {
            "media_id": "media_id", "n_bytes": "n_bytes",
            "content_md5": "content_md5", "sniffed_mime": "sniffed_mime",
            "width": "width", "height": "height", "n_pixels": "n_pixels",
            "payload_bytes": "payload_bytes", "payload_md5": "payload_md5",
            "is_survivor": "is_survivor",
        }),
        ("bmp", "m_bmp_pixel_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_b": "sum_b", "sum_g": "sum_g",
            "sum_r": "sum_r", "mean_luma": "mean_luma",
        }),
        ("png", "m_png_pixel_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_b": "sum_b", "sum_g": "sum_g",
            "sum_r": "sum_r", "mean_luma": "mean_luma",
        }),
        # round 9: the same PNG decode over the FROM-SCRATCH inflate
        ("png_scratch", "m_png_scratch_inflate", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_b": "sum_b", "sum_g": "sum_g",
            "sum_r": "sum_r", "mean_luma": "mean_luma",
        }),
        ("gif", "m_gif_pixel_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_b": "sum_b", "sum_g": "sum_g",
            "sum_r": "sum_r", "mean_luma": "mean_luma",
        }),
        ("jpeg", "m_jpeg_pixel_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_luma": "sum_luma",
            "mean_luma": "mean_luma",
        }),
        ("jpeg_prog", "m_jpegp_pixel_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_luma": "sum_luma",
            "mean_luma": "mean_luma",
        }),
        ("tiff", "m_tiff_pixel_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_pixels": "n_pixels", "sum_luma": "sum_v",
            "mean_luma": "mean_luma",
        }),
        ("wav", "m_wav_pcm_decode", {
            "media_id": "media_id", "sample_rate": "sample_rate",
            "n_samples": "n_samples", "duration_ms": "duration_ms",
            "peak": "peak", "sum_abs": "sum_abs",
        }),
        ("adpcm", "m_adpcm_pcm_decode", {
            "media_id": "media_id", "sample_rate": "sample_rate",
            "n_samples": "n_samples", "peak": "peak",
            "sum_abs": "sum_abs",
        }),
        ("avi", "m_avi_frame_decode", {
            "media_id": "media_id", "width": "width", "height": "height",
            "n_frames": "n_frames", "duration_ms": "duration_ms",
            "sum_b": "sum_b", "sum_g": "sum_g", "sum_r": "sum_r",
            "frames_match_header": "frames_match_header",
        }),
        # round 9: M7 perceptual-hash near-dup — hash halves and pair
        # ids ride the suite's free BIGINT columns (documented reuse:
        # a_hi/a_lo/d_hi/d_lo -> sum_b/sum_g/sum_r/sum_luma,
        # doc_a/doc_b -> frame_idx/n_frames, hammings -> peak/sum_abs)
        (None, "m7_phash_near_dup", {
            "mode": "mode", "media_id": "media_id",
            "sum_b": "a_hi", "sum_g": "a_lo", "sum_r": "d_hi",
            "sum_luma": "d_lo", "frame_idx": "doc_a",
            "n_frames": "doc_b", "peak": "hamming_a",
            "sum_abs": "hamming_d",
        }),
        # round 9: M8 audio features — exact zcr/energy + derived RMS
        # + the dual-DFT centroid verdict (column reuse documented:
        # zcr -> peak, sum_sq -> sum_abs, rms -> mean_luma)
        ("audio_feat", "m8_audio_features", {
            "media_id": "media_id", "n_samples": "n_samples",
            "peak": "zcr", "sum_abs": "sum_sq", "mean_luma": "rms",
            "frames_match_header": "centroid_consistent",
        }),
        # round 9: M9 scene cuts (SAD over consecutive raw frames) and
        # M10 silence windows (exact energy gate) — column reuse noted
        ("scene", "m9_scene_change_detect", {
            "media_id": "media_id", "n_frames": "n_frames",
            "frame_idx": "frame_idx", "sum_luma": "sad",
            "is_survivor": "is_cut", "n_samples": "n_scenes",
        }),
        ("silence", "m10_silence_detect", {
            "media_id": "media_id", "frame_idx": "win_idx",
            "sum_abs": "win_abs", "is_survivor": "is_silent",
            "peak": "n_silent", "n_samples": "n_windows",
        }),
    ],
)


# ---------------------------------------------------------------------------
# U1-U5: the full Python-function surface
# ---------------------------------------------------------------------------

_suite(
    "u1_u5_python_fn_suite",
    doc=(
        "U1 pandas UDF + U2 grouped UDAF + U3 mapInPandas UDTF "
        "(passthrough) + U4 the real Spark 4 @udtf class via SQL "
        "LATERAL + U5 the Arrow-optimized Python UDF + U6 the "
        "POLYMORPHIC UDTF (analyze-time schema derived from the TABLE "
        "argument's struct, round 6) + U7 the pure-Arrow pair "
        "(mapInArrow batch derivation + applyInArrow grouped agg, "
        "zero pandas; round 6) — the whole Python-function "
        "surface in one graded slot"
    ),
    layout=[
        ("k1", "long", "BIGINT"),
        ("k2", "long", "BIGINT"),
        ("val", "double", "DOUBLE"),
        ("val2", "double", "DOUBLE"),
        ("token", "string", "VARCHAR"),
        ("pos", "int", "INTEGER"),
        ("status_tag", "string", "VARCHAR"),
        ("has_seven", "boolean", "BOOLEAN"),
    ],
    arms=[
        (None, "u1_u3_udf_udaf_udtf", {
            "mode": "mode", "k1": "k1", "k2": "k2", "val": "val",
        }),
        ("udtf_class", "u4_python_udtf", {
            "k1": "doc_id", "token": "token", "pos": "pos",
        }),
        ("arrow_udf", "u5_arrow_python_udf", {
            "k1": "o_orderkey", "k2": "CAST(n_dashes AS BIGINT)",
            "status_tag": "status_tag", "has_seven": "has_seven",
        }),
        ("poly_udtf", "u6_polymorphic_udtf", {
            "k1": "k", "token": "col", "val": "val",
        }),
        ("arrow_native", "u7_apply_in_arrow", {
            "k1": "n_rows", "k2": "sum_qty",
            "token": "l_returnflag", "status_tag": "l_linestatus",
            "val": "min_disc_price", "val2": "max_disc_price",
        }),
        # round 9: U8 iterator-of-series (SCALAR_ITER) pandas UDF —
        # per-partition model init, exact-integer scored aggregate
        ("scalar_iter", "u8_scalar_iter_udf", {
            "status_tag": "o_orderpriority", "k1": "n_orders",
            "k2": "score_sum",
        }),
    ],
)


# ---------------------------------------------------------------------------
# S9/S19/S23/S24/S25: the table-lifecycle tier
# ---------------------------------------------------------------------------

_suite(
    "s9_s19_s23_s25_lifecycle_suite",
    doc=(
        "S9 VERSION AS OF time travel + S19 RESTORE (passthrough) + "
        "S23 TIMESTAMP AS OF + S24 VACUUM retention + S25 shallow "
        "clone — the whole commit-log lifecycle (travel, rollback, "
        "retention, zero-copy clone) in one graded slot (merged "
        "round 5); zero-copy/isolation/raise verdicts ride the hash. "
        "Round 6 adds S36 symlink-format manifest export (the Athena/"
        "Presto/Trino interop contract: snapshot-pinned file-list "
        "manifests, stale-but-consistent until regenerated), S38 "
        "orphan-file GC (Iceberg's remove_orphan_files: only "
        "never-committed data is removable, min_age in-flight-writer "
        "guard exercised, committed versions byte-identical after GC) "
        "and S39 in-place MIGRATION (plain hive parquet becomes a "
        "snapshot table by hard-linking every file — inode-asserted "
        "zero rewrite, legacy path intact, v0 time-travels)"
    ),
    layout=[
        ("o_orderstatus", "string", "VARCHAR"),
        ("n_rows", "long", "BIGINT"),
        ("sum_v0", "double", "DOUBLE"),
        ("sum_live", "double", "DOUBLE"),
        ("n_versions", "long", "BIGINT"),
        ("bad_version_still_readable", "boolean", "BOOLEAN"),
        ("sum_asof", "double", "DOUBLE"),
        ("resolved_v0", "boolean", "BOOLEAN"),
        ("live_resolves_latest", "boolean", "BOOLEAN"),
        ("n_versions_logged", "long", "BIGINT"),
        ("n_vacuumed", "long", "BIGINT"),
        ("vacuumed_raise", "boolean", "BOOLEAN"),
        ("survivor_readable", "boolean", "BOOLEAN"),
        ("source_sum", "double", "DOUBLE"),
        ("clone_sum", "double", "DOUBLE"),
        ("zero_copy_clone", "boolean", "BOOLEAN"),
        ("source_isolated", "boolean", "BOOLEAN"),
    ],
    arms=[
        ("travel_restore", "s9_s19_time_travel_restore", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_v0": "sum_v0", "sum_live": "sum_live",
            "n_versions": "n_versions",
            "bad_version_still_readable": "bad_version_still_readable",
        }),
        ("ts_asof", "s23_timestamp_time_travel", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_asof": "sum_asof", "resolved_v0": "resolved_v0",
            "live_resolves_latest": "live_resolves_latest",
        }),
        ("vacuum", "s24_vacuum_retention", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live",
            "n_versions_logged": "n_versions_logged",
            "n_vacuumed": "n_vacuumed",
            "vacuumed_raise": "vacuumed_raise",
            "survivor_readable": "survivor_readable",
        }),
        ("clone", "s25_shallow_clone", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "source_sum": "source_sum", "clone_sum": "clone_sum",
            "zero_copy_clone": "zero_copy_clone",
            "source_isolated": "source_isolated",
        }),
        ("migrate", "s39_migrate_in_place", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_v0": "sum_v0", "sum_live": "sum_live",
            "zero_copy_clone": "zero_copy_migration",
            "source_isolated": "legacy_path_intact",
            "resolved_v0": "v0_time_travels",
        }),
        # round 9: S50m foreign Hudi MERGE-ON-READ reader — log-block
        # latest-wins merge, deletes, log-only groups, inflight blocks
        ("foreign_hudi_mor", "s50m_hudi_mor_reader", {
            "o_orderstatus": "event_type", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v2",
            "n_vacuumed": "n_rows_v2",
            "n_versions_logged": "n_log_files",
            "resolved_v0": "inflight_block_invisible",
            "bad_version_still_readable": "log_only_group_read",
        }),
        # round 8: S50 foreign Hudi CoW reader — latest-completed-
        # instant file-slice resolution, inflight invisibility, MoR gate
        ("foreign_hudi", "s50_hudi_reader", {
            "o_orderstatus": "event_type", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v1",
            "n_versions_logged": "n_commits",
            "bad_version_still_readable": "mor_gate_raises",
            "resolved_v0": "inflight_invisible",
        }),
        # round 9: S53 WRITE-side Iceberg interop — emitted metadata
        # tree round-trips through the foreign reader; manifest
        # pruning works on our own export
        ("iceberg_export", "s53_iceberg_export_interop", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v1",
            "n_vacuumed": "n_rows_v1",
            "n_versions_logged": "n_snapshots",
            "resolved_v0": "meta_count_matches",
            "bad_version_still_readable": "prune_works",
        }),
        # round 10: S54 WRITE-side Hudi CoW interop — timeline +
        # file slices round-trip through the foreign reader; upsert
        # rewrites only touched groups
        ("hudi_export", "s54_hudi_export_interop", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v1",
            "n_vacuumed": "n_rows_v1",
            "n_versions_logged": "n_commits",
            "resolved_v0": "untouched_files_intact",
            "bad_version_still_readable": "meta_cols_travel",
        }),
        # round 9: S52 WRITE-side Delta interop — emitted _delta_log
        # round-trips through the foreign reader + validates
        ("delta_export", "s52_delta_export_interop", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v0",
            "n_vacuumed": "n_rows_v0",
            "n_versions_logged": "n_versions",
            "resolved_v0": "log_validates",
            "bad_version_still_readable": "overwrite_is_atomic",
        }),
        # round 10: S55 WRITE-side Delta deletion vectors — predicate
        # DELETE emits roaring sidecars, no data file rewritten
        ("delta_dv_export", "s55_delta_dv_export", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v0",
            "n_vacuumed": "n_rows_v0",
            "n_versions_logged": "n_versions",
            "resolved_v0": "no_data_rewrite",
            "bad_version_still_readable": "log_validates",
        }),
        # round 9: S47d Delta DELETION VECTORS — from-scratch roaring
        # codec, 'u' and 'i' storage types, v0 time travel intact
        ("foreign_delta_dv", "s47d_delta_deletion_vectors", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v0",
            "n_vacuumed": "n_rows_v0",
            "n_versions_logged": "n_deleted",
            "resolved_v0": "uuid_dv_applied",
            "bad_version_still_readable": "inline_dv_applied",
        }),
        # round 9: S48d foreign Iceberg v2 ROW-LEVEL DELETES —
        # position deletes (seq-inherited), equality deletes with the
        # strict-less rule vs a same-sequence re-add
        ("foreign_iceberg_del", "s48d_iceberg_v2_deletes", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_s2",
            "n_vacuumed": "n_rows_s2",
            "n_versions_logged": "n_delete_files",
            "resolved_v0": "seq_inheritance_ok",
            "bad_version_still_readable": "readd_survives",
        }),
        # round 8: S48 foreign Iceberg v2 reader — manifests decoded
        # by the from-scratch Avro layer; metadata-only COUNT(*) and
        # the delete-manifest gate graded
        ("foreign_iceberg", "s48_iceberg_reader", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v2",
            "n_versions": "meta_count",
            "n_versions_logged": "n_snapshots",
            "n_vacuumed": "n_rows_v2",
            "bad_version_still_readable": "delete_gate_raises",
            "resolved_v0": "meta_count_matches",
        }),
        # round 8: S47 foreign Delta-log reader — live snapshot +
        # VERSION AS OF + metadata file count + the protocol gate
        ("foreign_delta", "s47_delta_log_reader", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_live": "sum_live", "sum_v0": "sum_v0",
            "n_versions": "n_files_live",
            "n_versions_logged": "resolved_version",
            "n_vacuumed": "n_rows_v0",
            "bad_version_still_readable": "protocol_gate_raises",
        }),
        ("orphan_gc", "s38_orphan_file_gc", {
            "o_orderstatus": "c_mktsegment", "n_rows": "n_rows",
            "sum_live": "sum_live", "n_vacuumed": "n_orphans_removed",
            "vacuumed_raise": "age_guard_held",
            "survivor_readable": "committed_v0_readable",
            "source_isolated": "stray_file_gone",
        }),
        ("manifest", "s36_symlink_manifest", {
            "o_orderstatus": "l_returnflag", "n_rows": "n_rows",
            "sum_live": "sum_price",
            "resolved_v0": ("manifest_pinned = 1", "manifest_pinned = 1"),
            "live_resolves_latest": ("regenerated_sees_new = 1",
                                      "regenerated_sees_new = 1"),
        }),
    ],
)


# ---------------------------------------------------------------------------
# TS1 + TS2: resample/gap-fill + OHLC candles
# ---------------------------------------------------------------------------

_suite(
    "ts1_ts2_timeseries_suite",
    doc=(
        "TS1 hypertable resample + forward-fill gap grid + TS2 OHLC "
        "candle resample (min_by/max_by argmin aggregation, "
        "deterministic under ties) in one graded slot (merged round 5)"
    ),
    layout=[
        ("user_id", "long", "BIGINT"),
        ("bucket_start", "long", "BIGINT"),
        ("value", "double", "DOUBLE"),
        ("is_gap", "int", "INTEGER"),
        ("open", "double", "DOUBLE"),
        ("high", "double", "DOUBLE"),
        ("low", "double", "DOUBLE"),
        ("close", "double", "DOUBLE"),
        ("n_events", "long", "BIGINT"),
    ],
    arms=[
        ("gapfill", "ts1_resample_gapfill", {
            "user_id": "user_id", "bucket_start": "bucket_start",
            "value": "value", "is_gap": "is_gap",
        }),
        ("ohlc", "ts2_ohlc_resample", {
            "user_id": "user_id", "bucket_start": "bucket_start",
            "open": ("`open`", "open"), "high": "high", "low": "low",
            "close": ("`close`", "close"), "n_events": "n_events",
        }),
    ],
)


# ---------------------------------------------------------------------------
# G2 + G4: iterative PageRank + WITH RECURSIVE
# ---------------------------------------------------------------------------

_suite(
    "g2_g4_graph_suite",
    doc=(
        "G2 PageRank with exact-decimal propagation (the SQL replays "
        "all 5 iterations as MATERIALIZED CTEs bit-identically) + G4 "
        "recursive CTE hierarchy walk (identical WITH RECURSIVE text "
        "through spark.sql and DuckDB) + G3 exact triangle counting by "
        "degree-ordered orientation (skew-proof wedge enumeration, "
        "O(m^1.5) total; added round 6) — iteration-as-API, "
        "iteration-as-SQL and multi-join motif counting in one graded "
        "slot (merged round 5); G5 label-propagation communities "
        "(deterministic argmax tie-break, round-replayed oracle) and "
        "G6 frontier BFS shortest hops (O(m) total across rounds, "
        "bounded-depth recursive-CTE oracle) joined round 6; round 8 "
        "adds G7 alternating large-star/small-star CC (Kiveris et al. "
        "— O(log n) rounds on the adversarial-diameter chains that "
        "kill min-label propagation, closed-form chain-min oracle) "
        "and G8 weighted SSSP by frontier-restricted Bellman-Ford "
        "(exact integer distances, 12-round staged-CTE replay oracle) "
        "and G9 PERSONALIZED PageRank (teleport mass on a seed set — "
        "proximity-to-seeds scoring; unreachable nodes score exactly "
        "0 under the exact-decimal contract)"
    ),
    layout=[
        ("node", "long", "BIGINT"),
        ("rank", "double", "DOUBLE"),
        ("n_nodes", "long", "BIGINT"),
        ("n_edges", "long", "BIGINT"),
        ("depth", "long", "BIGINT"),
        ("depth_bal", "double", "DOUBLE"),
        ("n_tri", "long", "BIGINT"),
        ("clustering", "double", "DOUBLE"),
    ],
    arms=[
        ("pagerank", "g2_pagerank", {
            "node": "node", "rank": "rank", "n_nodes": "n_nodes",
            "n_edges": "n_edges",
        }),
        ("recursive", "g4_recursive_cte", {
            "n_nodes": "n_nodes", "depth": "CAST(depth AS BIGINT)",
            "depth_bal": "depth_bal",
        }),
        ("triangles", "g3_triangle_count", {
            "node": "node", "depth": "deg", "n_tri": "n_tri",
            "clustering": "clustering", "n_nodes": "total_triangles",
        }),
        ("communities", "g5_label_propagation", {
            "node": "node", "depth": "community",
            "n_edges": "community_size", "n_nodes": "n_communities",
        }),
        ("bfs", "g6_bfs_shortest_hops", {
            "node": "node", "depth": "CAST(dist AS BIGINT)",
            "n_edges": "n_reached", "n_nodes": "n_nodes",
        }),
        ("star_cc", "g7_cc_largestar", {
            "node": "node", "depth": "component",
            "n_edges": "comp_size", "n_nodes": "n_components",
        }),
        ("sssp", "g8_sssp", {
            "node": "node", "depth": "CAST(dist AS BIGINT)",
            "n_edges": "n_reached", "n_nodes": "n_nodes",
        }),
        ("ppr", "g9_personalized_pagerank", {
            "node": "node", "rank": "rank",
            "n_nodes": "n_nodes", "n_edges": "n_seeds",
        }),
        # round 9: G10 k-core by iterative peeling (cascade-proof
        # pendant-path fixture; staged-CTE replay oracle)
        ("kcore", "g10_kcore", {
            "node": "node", "depth": "core_deg", "n_nodes": "n_core",
        }),
    ],
)


# ---------------------------------------------------------------------------
# Q-SQL surface: Q3 composite + Q4 correlated EXISTS + Q17 correlated scalar
# ---------------------------------------------------------------------------

_suite(
    "q_sql_suite",
    doc=(
        "The spark.sql entry point running four TPC-H-shape ANSI texts "
        "IDENTICALLY in both engines: Q3 shipping priority (3-way join + "
        "top-10), Q4 correlated EXISTS / NOT EXISTS (plan-locked to "
        "decorrelate to LeftSemi/LeftAnti joins), Q17 correlated "
        "scalar-average subquery (plan-locked to an aggregate-join, no "
        "per-row subquery), and Q21 double correlated quantifier — "
        "EXISTS + NOT EXISTS into the SAME table with non-equi "
        "correlated conjuncts, the hardest decorrelation case — plus the "
        "Q20-shape nested-IN pyramid (IN over IN + correlated scalar "
        "AVG, two LeftSemi + aggregate-join plan-locked) and the "
        "Q22 shape (uncorrelated scalar bound + NOT EXISTS LeftAnti; "
        "both round 6): the "
        "optimizer's decorrelation surface in one graded slot (round 5). "
        "Round 6 adds the Spark 4 SQL-language tier as four more arms: "
        "QP pipe syntax (Q1 pricing summary via |> operators), QF "
        "SQL-defined functions (inlined at analysis time, zero-UDF "
        "plan), QS SQL scripting (BEGIN/DECLARE/SET compound), QE "
        "parameterized SQL (named :marker binds) — each oracled against "
        "its hand-lowered ANSI equivalent — and QG GROUP BY ALL / "
        "ORDER BY ALL (the modern-SQL shorthand, identical text both "
        "engines), plus the Q7 symmetric-OR nation-pair snowflake "
        "(the shape that defeats single-sided pushdown), the Q8 "
        "conditional-aggregate market-share ratio (exact decimal "
        "sums, boundary-only division), QL the LATERAL correlated "
        "top-n subquery (decorrelated, never per-row execution) and "
        "QV the SQL PIVOT clause (parser-surface rotation lowered to "
        "one conditional-agg scan; all round 6). Round 7 adds QD, the "
        "session-catalog DDL surface: CTAS -> INSERT INTO -> "
        "metadata-only ALTER TABLE ADD COLUMNS (inode-asserted) -> "
        "catalog read-back. Round 8 adds QW, the named-WINDOW clause "
        "— two windows declared once, referenced by several "
        "over-clauses, plan-locked to ONE shared hash exchange. "
        "Round 9 adds QX, the session-variable + dynamic-SQL tier: "
        "DECLARE/SET VARIABLE (assignment from a scalar subquery), "
        "EXECUTE IMMEDIATE with positional USING binds, and the "
        "injection-safe IDENTIFIER() table-name resolution — the "
        "oracle hand-lowers the whole flow to static ANSI"
    ),
    layout=[
        ("l_orderkey", "long", "BIGINT"),
        ("revenue", "double", "DOUBLE"),
        ("o_orderdate", "timestamp", "TIMESTAMP"),
        ("o_orderpriority", "string", "VARCHAR"),
        ("order_count", "long", "BIGINT"),
        ("avg_yearly", "double", "DOUBLE"),
        ("n_small_lines", "long", "BIGINT"),
        ("s_name", "string", "VARCHAR"),
        ("numwait", "long", "BIGINT"),
        ("sum_qty", "double", "DOUBLE"),
        ("sum_base", "double", "DOUBLE"),
        ("avg_disc", "double", "DOUBLE"),
        ("band", "string", "VARCHAR"),
        ("n_above", "long", "BIGINT"),
        ("cutoff", "double", "DOUBLE"),
        ("n_above_total", "long", "BIGINT"),
    ],
    arms=[
        ("q3", "q_sql_q3_passthrough", {
            "l_orderkey": "l_orderkey", "revenue": "revenue",
            "o_orderdate": "o_orderdate",
            "o_orderpriority": "o_orderpriority",
        }),
        (None, "q4_exists_correlated", {
            "mode": "mode", "o_orderpriority": "o_orderpriority",
            "order_count": "order_count",
        }),
        ("q17", "q17_correlated_scalar_avg", {
            "avg_yearly": "avg_yearly", "n_small_lines": "n_small_lines",
        }),
        ("q21", "q21_multi_exists", {
            "s_name": "s_name", "numwait": "numwait",
        }),
        ("q20", "q20_nested_in_scalar", {
            "l_orderkey": "s_suppkey", "s_name": "s_name",
        }),
        ("q22", "q22_global_scalar_notexists", {
            "l_orderkey": "cntry_band", "order_count": "numcust",
            "revenue": "totacctbal",
        }),
        ("qp", "qp_pipe_syntax", {
            "s_name": "l_returnflag || '/' || l_linestatus",
            "order_count": "count_order", "sum_qty": "sum_qty",
            "sum_base": "sum_base", "revenue": "sum_disc_price",
            "avg_disc": "avg_disc",
        }),
        ("qf", "qf_sql_udf", {
            "band": "band", "order_count": "n_lines",
            "revenue": "disc_total",
        }),
        ("qs", "qs_sql_scripting", {
            "o_orderpriority": "o_orderpriority",
            "order_count": "n_orders", "n_above": "n_above",
            "cutoff": "cutoff", "n_above_total": "n_above_total",
        }),
        ("qe", "qe_parameterized_sql", {
            "o_orderpriority": "o_orderpriority",
            "order_count": "n_orders", "revenue": "segment_total",
        }),
        ("qg", "qg_group_by_all", {
            "s_name": "l_returnflag || '/' || l_linestatus",
            "order_count": "n_lines", "sum_qty": "sum_qty",
            "sum_base": "sum_base",
        }),
        ("q7", "q7_volume_shipping", {
            "o_orderpriority": "supp_nation", "s_name": "cust_nation",
            "l_orderkey": ("CAST(l_year AS LONG)", "CAST(l_year AS BIGINT)"),
            "order_count": "n_rows", "revenue": "revenue",
        }),
        ("q8", "q8_market_share", {
            "l_orderkey": ("CAST(o_year AS LONG)", "CAST(o_year AS BIGINT)"),
            "order_count": "n_rows", "avg_disc": "mkt_share",
        }),
        ("ql", "ql_lateral_topn", {
            "order_count": "c_custkey", "l_orderkey": "o_orderkey",
            "revenue": "price",
        }),
        ("qv", "qv_sql_pivot", {
            "o_orderpriority": "o_orderstatus",
            "order_count": "urgent_n", "revenue": "urgent_s",
            "numwait": "low_n", "avg_yearly": "low_s",
        }),
        ("qd", "qd_catalog_ddl", {
            "o_orderpriority": "o_orderstatus",
            "order_count": "n_orders", "revenue": "total_spend",
            "n_above": (
                "CAST(table_registered AS LONG)",
                "CAST(table_registered AS BIGINT)",
            ),
            "n_above_total": (
                "CAST(alter_was_metadata_only AS LONG)",
                "CAST(alter_was_metadata_only AS BIGINT)",
            ),
        }),
        ("qw", "qw_window_clause", {
            "l_orderkey": "user_id", "order_count": "event_id",
            "numwait": "rnk", "revenue": "value",
            "n_small_lines": "n_user_events", "avg_yearly": "user_total",
        }),
        # round 8: QA1 the ANSI mode surface — strict raises proven,
        # try_* lenient results value-checked closed-form
        ("qa1", "qa1_ansi_mode", {
            "o_orderpriority": "o_orderstatus", "order_count": "n",
            "numwait": "n_cast_null", "n_small_lines": "n_div_null",
            "revenue": "sum_div_ticks",
            "n_above": (
                "CAST(strict_cast_raises AS LONG)",
                "CAST(strict_cast_raises AS BIGINT)",
            ),
            "n_above_total": (
                "CAST(strict_div_raises AS LONG) + CAST(strict_overflow_raises AS LONG)",
                "CAST(strict_div_raises AS BIGINT) + CAST(strict_overflow_raises AS BIGINT)",
            ),
        }),
        # round 8: QLA lateral column aliases — chained select-list
        # derivations over aggregate aliases, identical text both engines
        ("qla", "qla_lateral_column_alias", {
            "o_orderpriority": "o_orderpriority", "order_count": "n",
            "numwait": "n_doubled", "revenue": "total",
            "avg_yearly": "avg_price", "avg_disc": "avg_k",
        }),
        # round 9: QU the SQL UNPIVOT clause (QV's parser twin)
        ("qu", "qu_sql_unpivot", {
            "l_orderkey": "o_orderkey", "s_name": "metric",
            "revenue": "val",
        }),
        # round 9: QX session variables + EXECUTE IMMEDIATE + IDENTIFIER()
        ("qx_vars", "qx_session_variables", {
            "s_name": "segment", "order_count": "n_orders",
            "revenue": "revenue", "cutoff": "cutoff_used",
        }),
    ],
)


# ---------------------------------------------------------------------------
# J7 + J8: the runtime-filter pair (DPP + bloom join)
# ---------------------------------------------------------------------------

_suite(
    "j7_j8_runtime_filter_suite",
    doc=(
        "J7 dynamic partition pruning (runtime dim-filter reused as a "
        "PartitionFilter on the fact scan; verdict rides the executed "
        "plan's dynamicpruningexpression) + J8 runtime bloom-filter "
        "join (row-group-level pushdown of the build side's key set) — "
        "Spark's two runtime-filter optimizations in one graded slot "
        "(merged round 5) + J11 AQE skew-join handling (80%-hot-key "
        "fact re-planned mid-shuffle, SortMergeJoin 'skew=true' "
        "asserted from the executed adaptive plan; round 6)"
    ),
    layout=[
        ("ship_month", "string", "VARCHAR"),
        ("o_orderpriority", "string", "VARCHAR"),
        ("n_items", "long", "BIGINT"),
        ("revenue", "double", "DOUBLE"),
        ("verdict", "boolean", "BOOLEAN"),
    ],
    arms=[
        ("dpp", "j7_dynamic_partition_pruning", {
            "ship_month": "ship_month", "n_items": "n_items",
            "revenue": "revenue", "verdict": "dpp_pruned",
        }),
        ("bloom", "j8_runtime_bloom_join", {
            "o_orderpriority": "o_orderpriority", "n_items": "n_items",
            "revenue": "revenue", "verdict": "bloom_filter_injected",
        }),
        ("skew", "j11_aqe_skew_join", {
            "o_orderpriority": "segment", "n_items": "n_rows",
            "revenue": "revenue", "verdict": "skew_split_applied",
        }),
    ],
)


# ---------------------------------------------------------------------------
# L3 ANN ladder: brute force + int8 + PQ + IVF-PQ in one graded slot
# ---------------------------------------------------------------------------

_suite(
    "l3_ann_ladder_suite",
    doc=(
        "The ANN ladder in one graded slot: L3 brute-force cosine top-k "
        "(exact, value-oracled) + L3q int8-quantized KNN (integer-exact "
        "first pass, full-precision re-rank, measured recall@k) + L3pq "
        "product-quantization ADC scoring + L3ivfpq the IVF-PQ composite "
        "(sub-linear candidates AND compressed scoring — the "
        "billion-scale pair), each with its measured-recall floor "
        "verdict riding the hash (merged round 5). Round 8 adds L14 "
        "MMR diversified re-ranking — the greedy lam*rel - "
        "(1-lam)*max-sim selection unrolled into 5 JVM relational "
        "steps, staged-CTE-replayed verbatim"
    ),
    layout=[
        ("query_id", "long", "BIGINT"),
        ("vec_id", "long", "BIGINT"),
        ("cosine", "double", "DOUBLE"),
        ("rank", "long", "BIGINT"),
        ("recall_at_k", "double", "DOUBLE"),
        ("n_queries", "long", "BIGINT"),
        ("k", "long", "BIGINT"),
        ("meets_recall_floor", "int", "INTEGER"),
    ],
    arms=[
        ("brute", "l3_knn_brute_force", {
            "query_id": "query_id", "vec_id": "vec_id",
            "cosine": "cosine", "rank": "rank",
        }),
        ("int8", "l3q_int8_quantized_knn", {
            "query_id": "query_id", "vec_id": "vec_id",
            "cosine": "cosine", "rank": "rank",
            "recall_at_k": "recall_at_k",
        }),
        ("pq", "l3pq_ann", {
            "n_queries": "n_queries", "k": "k",
            "meets_recall_floor": "meets_recall_floor",
        }),
        ("ivfpq", "l3ivfpq_ann", {
            "n_queries": "n_queries", "k": "k",
            "meets_recall_floor": "meets_recall_floor",
        }),
        ("mmr", "l14_mmr_rerank", {
            "query_id": "query_id", "vec_id": "vec_id",
            "cosine": "rel", "rank": ("CAST(rank AS LONG)", "CAST(rank AS BIGINT)"),
            "recall_at_k": "mmr_score",
        }),
    ],
)


# ---------------------------------------------------------------------------
# MV1-MV4: all four materialized-view strategies
# ---------------------------------------------------------------------------

_suite(
    "mv1_mv4_mv_suite",
    doc=(
        "All four MV strategies in one graded slot: MV1 incremental "
        "aggregate + MV3 delete-aware MIN/MAX (passthrough arms) + MV2 "
        "exactly-once STREAMING maintenance (real readStream, "
        "checkpointed) + MV4 approx-distinct via mergeable HLL sketches "
        "with the tolerance verdict riding the hash (merged round 5) "
        "+ MV6 transparent aggregate query REWRITE (coarser groupings "
        "answered from MV partial states, plan-asserted MV-only scans, "
        "sound fallback when the grouping key is missing; round 6)"
    ),
    layout=[
        ("grp", "string", "VARCHAR"),
        ("n_rows", "long", "BIGINT"),
        ("v1", "double", "DOUBLE"),
        ("v2", "double", "DOUBLE"),
        ("flags_ok", "boolean", "BOOLEAN"),
    ],
    arms=[
        (None, "mv1_mv3_incremental_mvs", {
            "mode": "mode", "grp": "grp", "n_rows": "n_rows",
            "v1": "v1", "v2": "v2", "flags_ok": "flags_ok",
        }),
        ("stream_mv", "mv2_streaming_agg_mv", {
            "grp": "event_type", "n_rows": "n_rows", "v1": "sum_value",
        }),
        ("sketch_mv", "mv4_distinct_sketch_mv", {
            "grp": "o_orderstatus", "n_rows": "n_exact",
            "flags_ok": "within_tolerance",
        }),
        ("rewrite", "mv6_query_rewrite", {
            "grp": ("q || '/' || grp", "q || '/' || grp"),
            "n_rows": "n_rows", "v1": "sum_price", "v2": "avg_price",
            "flags_ok": ("answered_from_mv = 1", "answered_from_mv = 1"),
        }),
    ],
)


# ---------------------------------------------------------------------------
# S6 + S10 + S6v: the whole MERGE family
# ---------------------------------------------------------------------------

_suite(
    "s6_s10_s6v_merge_suite",
    doc=(
        "The MERGE family in one graded slot: S6 bucket-pruned keyed "
        "upsert + S10 small-file OPTIMIZE into a CAS-committed version "
        "(closed-form final-table oracle with the file-count-drop "
        "verdict) + S6v the version-CONDITIONAL merge that proves "
        "stale-batch writes cannot regress committed rows (merged "
        "round 5)"
    ),
    layout=[
        ("o_orderkey", "long", "BIGINT"),
        ("o_custkey", "long", "BIGINT"),
        ("o_totalprice", "double", "DOUBLE"),
        ("compacted_fewer_files", "boolean", "BOOLEAN"),
        ("k", "long", "BIGINT"),
        ("rev", "long", "BIGINT"),
        ("val", "double", "DOUBLE"),
    ],
    arms=[
        ("merge_optimize", "s6_s10_merge_compaction", {
            "o_orderkey": "o_orderkey", "o_custkey": "o_custkey",
            "o_totalprice": "o_totalprice",
            "compacted_fewer_files": "compacted_fewer_files",
        }),
        ("version_gate", "s6v_version_conditional_merge", {
            "k": "k", "rev": "rev", "val": "val",
        }),
    ],
)


# ---------------------------------------------------------------------------
# Q5 + Q18: the TPC-H composite pair
# ---------------------------------------------------------------------------

_suite(
    "q5_q18_tpch_suite",
    doc=(
        "THE FULL TPC-H SURFACE in one graded slot (merged round 5, "
        "completed round 7): Q5 local-supplier-volume (6-table "
        "snowflake, join cycle closed on nation equality) + Q18 "
        "large-volume-customer (aggregate-as-predicate, top-100), "
        "joined round 7 by the 12 remaining spec queries — Q1 wide "
        "map-side-combine aggregate, Q2 correlated-MIN decorrelation, "
        "Q6 pure pushdown, Q9 5-table star profit, Q10 deterministic "
        "top-20 (TakeOrderedAndProject), Q11 HAVING vs global scalar "
        "subquery, Q12 interval-predicate conditional counts, Q13 "
        "outer-join count histogram, Q14 conditional-numerator ratio, "
        "Q15 CTE + MAX scalar equality, Q16 COUNT(DISTINCT) with NOT "
        "IN anti-join, Q19 OR-of-ANDs disjunctive pushdown. The "
        "remaining spec queries (Q3/Q4/Q7/Q8/Q17/Q20/Q21/Q22) ride "
        "the q_sql suite; with this suite all 22 are driver-graded. "
        "Plan locks for the distinctive surfaces live in "
        "tests/test_plans.py (q6/q2/q10/q19/q15)"
    ),
    layout=[
        ("n_name", "string", "VARCHAR"),
        ("revenue", "double", "DOUBLE"),
        ("c_name", "string", "VARCHAR"),
        ("c_custkey", "long", "BIGINT"),
        ("o_orderkey", "long", "BIGINT"),
        ("o_orderdate", "timestamp", "TIMESTAMP"),
        ("total_price", "double", "DOUBLE"),
        ("sum_qty", "double", "DOUBLE"),
        ("grp1", "string", "VARCHAR"),
        ("grp2", "string", "VARCHAR"),
        ("key1", "long", "BIGINT"),
        ("key2", "long", "BIGINT"),
        ("val1", "double", "DOUBLE"),
        ("val2", "double", "DOUBLE"),
        ("val3", "double", "DOUBLE"),
        ("val4", "double", "DOUBLE"),
        ("cnt", "long", "BIGINT"),
    ],
    arms=[
        ("q5", "q5_local_supplier_volume", {
            "n_name": "n_name", "revenue": "revenue",
        }),
        ("q18", "q18_large_volume_customer", {
            "c_name": "c_name", "c_custkey": "c_custkey",
            "o_orderkey": "o_orderkey", "o_orderdate": "o_orderdate",
            "total_price": "total_price", "sum_qty": "sum_qty",
        }),
        ("q1", "q1_pricing_summary", {
            "grp1": "l_returnflag", "grp2": "l_linestatus",
            "val1": "sum_qty", "val2": "sum_base_price",
            "val3": "sum_disc_price", "val4": "sum_charge",
            "revenue": "avg_price", "total_price": "avg_qty",
            "sum_qty": "avg_disc", "cnt": "count_order",
        }),
        ("q2", "q2_min_cost_supplier", {
            "key1": "p_partkey", "key2": "s_suppkey",
            "grp1": "s_name", "grp2": "n_name", "val1": "cost",
        }),
        ("q6", "q6_forecast_revenue", {"val1": "revenue", "cnt": "n_rows"}),
        ("q9", "q9_product_profit", {
            "grp1": "supp_nation", "key1": "CAST(o_year AS BIGINT)",
            "val1": "profit", "cnt": "n_rows",
        }),
        ("q10", "q10_returned_items", {
            "key1": "c_custkey", "grp1": "c_name", "grp2": "n_name",
            "val1": "revenue",
        }),
        ("q11", "q11_important_stock", {"key1": "part_key", "val1": "value"}),
        ("q12", "q12_late_shipments", {
            "grp1": "flag_bucket", "cnt": "high_line_count",
            "key1": "low_line_count",
        }),
        ("q13", "q13_customer_distribution", {"key1": "c_count", "cnt": "custdist"}),
        ("q14", "q14_promo_effect", {"val1": "promo_revenue_pct", "cnt": "n_rows"}),
        ("q15", "q15_top_supplier", {
            "key1": "s_suppkey", "grp1": "s_name", "val1": "total_revenue",
        }),
        ("q16", "q16_parts_supplier_relation", {
            "grp1": "p_brand", "grp2": "p_type",
            "key1": "CAST(p_size AS BIGINT)", "cnt": "supplier_cnt",
        }),
        ("q19", "q19_disjunctive_revenue", {"val1": "revenue", "cnt": "n_rows"}),
    ],
)


# ---------------------------------------------------------------------------
# DQ1 + DQ2: declarative expectations + piggyback observation metrics
# ---------------------------------------------------------------------------

_suite(
    "dq1_dq2_quality_suite",
    doc=(
        "DQ1 declarative expectation suite (single-scan, plan-locked; "
        "null-rate/range/pattern/set/referential checks with "
        "per-expectation verdicts) + DQ2 piggyback metrics via "
        "df.observe riding another job's pass (CollectMetrics node, "
        "zero extra scans) — standalone and embedded data quality in "
        "one graded slot (merged round 5) + DQ3 table-health monitors "
        "(complete day spine, trailing-mean volume drops, gap days, "
        "staleness) + ER2 from-scratch Jaro-Winkler linkage scored in "
        "an Arrow-batched pandas UDF and cross-validated bit-for-bit "
        "against DuckDB's independent C++ builtin + DQ4 the atomic "
        "QUARANTINE dead-letter flow (good + quarantine tables "
        "committed in ONE multi-table txn, first-failed-reason ledger, "
        "partition-complete and same-txn-id verdicts; all round 6). "
        "Round 9 adds ER3 Soundex phonetic blocking: the JVM "
        "soundex() builtin cross-validated against a from-scratch "
        "SQL reimplementation (H/W adjacency rule included)"
    ),
    layout=[
        ("check_name", "string", "VARCHAR"),
        ("day", "date", "DATE"),
        ("trailing_avg", "double", "DOUBLE"),
        ("staleness_days", "long", "BIGINT"),
        ("col_name", "string", "VARCHAR"),
        ("metric", "double", "DOUBLE"),
        ("threshold", "double", "DOUBLE"),
        ("passed", "int", "INTEGER"),
        ("n_rows", "long", "BIGINT"),
        ("n_big", "long", "BIGINT"),
        ("total_price", "double", "DOUBLE"),
        ("from_observation", "boolean", "BOOLEAN"),
        ("single_scan", "boolean", "BOOLEAN"),
    ],
    arms=[
        ("expectations", "dq1_expectation_suite", {
            "check_name": "check_name", "col_name": "col_name",
            "metric": "metric", "threshold": "threshold",
            "passed": "passed",
        }),
        ("observe", "dq2_observe_metrics", {
            "n_rows": "n_rows", "n_big": "n_big",
            "total_price": "total_price",
            "from_observation": "from_observation",
            "single_scan": "single_scan",
        }),
        ("health", "dq3_health_monitors", {
            "day": "day", "n_rows": "n_rows",
            "trailing_avg": "trailing_avg", "passed": "volume_drop",
            "n_big": "is_gap", "staleness_days": "staleness_days",
        }),
        ("jw_linkage", "er2_jaro_winkler", {
            "check_name": "block", "n_rows": "id_a", "n_big": "id_b",
            "metric": "jw",
        }),
        # round 9: ER3 Soundex phonetic blocking — builtin vs a
        # from-scratch SQL reimplementation of the American variant
        ("soundex_block", "er3_soundex_blocking", {
            "check_name": "sx", "col_name": "word",
            "n_rows": "p_partkey", "n_big": "block_n",
        }),
        # round 9: X15 thresholded levenshtein (early-exit fuzzy pairs)
        ("lv_bounded", "x15_bounded_levenshtein", {
            "check_name": "blk", "n_rows": "id_a", "n_big": "id_b",
            "col_name": "w_a",
            "metric": ("CAST(lv3 AS DOUBLE)", "CAST(lv3 AS DOUBLE)"),
            "from_observation": "within_bound",
        }),
        (None, "dq4_quarantine_flow", {
            "mode": ("'dl_' || mode", "'dl_' || mode"),
            "check_name": "grp", "n_rows": "n_rows",
            "metric": "sum_value",
            "from_observation": "partition_complete",
            "single_scan": "atomic_pair",
        }),
    ],
)


# ---------------------------------------------------------------------------
# E6 + E9 + E10 + E11: the streaming join/dedup tier
# ---------------------------------------------------------------------------

_suite(
    "e6_e9_e10_e11_stream_join_suite",
    doc=(
        "The streaming join/dedup tier in one graded slot, every arm a "
        "REAL multi-micro-batch stream: E6 stream-stream INNER interval "
        "join (watermark-bounded state) + E9 the LEFT OUTER variant "
        "(null-padded unmatched rows emitted only once the watermark "
        "proves no match can arrive) + E10 dropDuplicatesWithinWatermark "
        "+ E11 stream-static broadcast enrichment (merged round 5)"
    ),
    layout=[
        ("user_id", "long", "BIGINT"),
        ("l_event_id", "long", "BIGINT"),
        ("l_ts", "timestamp", "TIMESTAMP"),
        ("r_event_id", "long", "BIGINT"),
        ("r_ts", "timestamp", "TIMESTAMP"),
        ("r_value", "double", "DOUBLE"),
        ("event_id", "long", "BIGINT"),
        ("ts", "timestamp", "TIMESTAMP"),
        ("event_type", "string", "VARCHAR"),
        ("value", "double", "DOUBLE"),
        ("c_mktsegment", "string", "VARCHAR"),
        ("n_events", "long", "BIGINT"),
        ("total_value", "double", "DOUBLE"),
    ],
    arms=[
        ("inner_join", "e6_stream_interval_join", {
            "user_id": "user_id", "l_event_id": "l_event_id",
            "l_ts": "l_ts", "r_event_id": "r_event_id",
            "r_ts": "r_ts", "r_value": "r_value",
        }),
        ("outer_join", "e9_stream_outer_join", {
            "user_id": "user_id", "l_event_id": "l_event_id",
            "l_ts": "l_ts", "r_event_id": "r_event_id",
            "r_ts": "r_ts", "r_value": "r_value",
        }),
        ("wm_dedup", "e10_dedup_within_watermark", {
            "event_id": "event_id", "ts": "ts", "user_id": "user_id",
            "event_type": "event_type", "value": "value",
        }),
        ("static_enrich", "e11_stream_static_enrich", {
            "c_mktsegment": "c_mktsegment", "event_type": "event_type",
            "n_events": "n_events", "total_value": "total_value",
        }),
        ("state_audit", "e14_join_state_audit", {
            "user_id": "user_id", "n_events": "n_pairs",
            "event_type": (
                "concat(CAST(left_state_subset AS STRING), '/',"
                " CAST(right_state_subset AS STRING), '/',"
                " CAST(state_bounded AS STRING), '/',"
                " CAST(retained_after_cutoff AS STRING))",
                "concat(CAST(left_state_subset AS VARCHAR), '/',"
                " CAST(right_state_subset AS VARCHAR), '/',"
                " CAST(state_bounded AS VARCHAR), '/',"
                " CAST(retained_after_cutoff AS VARCHAR))",
            ),
        }),
        # round 9: E19 listener metrics — order-free passthrough
        (None, "e19_stream_listener_metrics", {
            "mode": ("'listener_' || mode", "'listener_' || mode"),
            "user_id": "size_rank", "l_event_id": "input_rows",
            "event_id": "n_batches", "n_events": "total_rows",
            "event_type": ("CAST(listener_complete AS STRING)",
                           "CAST(listener_complete AS VARCHAR)"),
        }),
    ],
)


# ---------------------------------------------------------------------------
# AN1 + AN2 + PR1: the product-analytics tier
# ---------------------------------------------------------------------------

_suite(
    "an1_an2_pr1_analytics_suite",
    doc=(
        "AN1 funnel analysis (ordered-step timestamps per user, depth "
        "from step presence) + AN2 cohort retention matrix (first-seen "
        "cohort x periods-since, retention ratios) + PR1 one-scan table "
        "profiling (per-column nulls/distincts/min/max in a single "
        "pass) — the product-analytics tier in one graded slot (merged "
        "round 5) + AN3 A/B statistical testing (Welch t + chi-square "
        "from exact-decimal moments, order-deterministic) + AN5 "
        "event-sequence pattern matching (MATCH_RECOGNIZE-lite "
        "adjacency via a lead() chain, one window pass; both added "
        "round 6) + PR2 distributed parquet-footer profiling "
        "(footer-only KB-per-file scan; counts must equal the data) "
        "+ AN4 market-basket association rules (a-priori prune before "
        "the bounded within-basket self-join) + PR3 equi-depth "
        "histogram (8 ntile quantile buckets over a deterministic "
        "total order — the CBO-statistics structure) + AN6 multi-touch "
        "attribution (first/last/linear models over trailing-7-day "
        "touch paths, nano-quantized order-deterministic credits) + "
        "PR4 pairwise Pearson correlation matrix (one stacked scan, "
        "exact-decimal moments) + AN7 RFM quartile segmentation "
        "(deterministic ntile scoring, wall-clock-free recency) + AN8 "
        "first-order Markov transition matrix (one lead() pass, exact "
        "BIGINT counts, windowed source-total normalization) + PR5 "
        "distribution-drift monitor (per-category TVD + chi-square "
        "from exact DECIMAL cross-products, one scan, single "
        "output-boundary division) + AN9 Lorenz/Gini revenue "
        "concentration (rank-weighted exact-decimal closed form, "
        "decile shares, O(customers) sort; all round 6). Round 8 adds "
        "AN10 Kaplan-Meier survival curves — censoring-aware churn "
        "estimation with the cumulative product as an exact-integer "
        "floor-division recurrence, recursive-CTE-replayed — and AN11 "
        "DAU/WAU stickiness: EXACT sliding-window distinct via "
        "interval-coalesced +1/-1 boundary prefix sums (never a 7x "
        "fan-out, never a set in window state), brute-force "
        "range-join cross-proof"
    ),
    layout=[
        ("user_id", "long", "BIGINT"),
        ("t_view", "timestamp", "TIMESTAMP"),
        ("t_click", "timestamp", "TIMESTAMP"),
        ("t_purchase", "timestamp", "TIMESTAMP"),
        ("funnel_depth", "int", "INTEGER"),
        ("cohort", "timestamp", "TIMESTAMP"),
        ("periods_since", "int", "INTEGER"),
        ("n_active", "long", "BIGINT"),
        ("cohort_size", "long", "BIGINT"),
        ("retention", "double", "DOUBLE"),
        ("col_name", "string", "VARCHAR"),
        ("n_rows", "long", "BIGINT"),
        ("n_nulls", "long", "BIGINT"),
        ("n_distinct", "long", "BIGINT"),
        ("min_value", "string", "VARCHAR"),
        ("max_value", "string", "VARCHAR"),
        ("chi2_stat", "double", "DOUBLE"),
        ("conf_ab", "double", "DOUBLE"),
        ("conf_ba", "double", "DOUBLE"),
    ],
    arms=[
        ("funnel", "an1_funnel_steps", {
            "user_id": "user_id", "t_view": "t_view",
            "t_click": "t_click", "t_purchase": "t_purchase",
            "funnel_depth": "funnel_depth",
        }),
        ("cohort", "an2_cohort_retention", {
            "cohort": "cohort", "periods_since": "periods_since",
            "n_active": "n_active", "cohort_size": "cohort_size",
            "retention": "retention",
        }),
        ("profile", "pr1_table_profile", {
            "col_name": "col_name", "n_rows": "n_rows",
            "n_nulls": "n_nulls", "n_distinct": "n_distinct",
            "min_value": "min_value", "max_value": "max_value",
        }),
        ("footers", "pr2_footer_profile", {
            "col_name": "path_in_schema", "min_value": "file_name",
            "n_rows": "n_values", "n_nulls": "n_nulls",
        }),
        ("pattern", "an5_sequence_pattern", {
            "user_id": "user_id", "t_view": "start_ts",
            "n_rows": "start_event_id", "n_active": "end_event_id",
            "n_distinct": "duration_s",
        }),
        ("ab_tests", "an3_ab_stat_tests", {
            "n_rows": "n_a", "n_active": "n_b",
            "retention": "t_stat", "chi2_stat": "chi2_stat",
            "min_value": ("CAST(mean_a AS STRING)", "CAST(mean_a AS VARCHAR)"),
            "max_value": ("CAST(mean_b AS STRING)", "CAST(mean_b AS VARCHAR)"),
        }),
        ("rules", "an4_association_rules", {
            "col_name": "brand_a", "max_value": "brand_b",
            "n_rows": "pair_cnt", "retention": "support",
            "conf_ab": "conf_ab", "conf_ba": "conf_ba",
            "chi2_stat": "lift",
        }),
        ("histogram", "pr3_equidepth_histogram", {
            "funnel_depth": "bucket", "n_rows": "n_rows",
            "retention": "lo", "conf_ab": "hi",
        }),
        ("attribution", "an6_attribution", {
            "col_name": "model", "max_value": "channel",
            "n_rows": "n_credits", "retention": "credited_revenue",
        }),
        ("correlation", "pr4_correlation_matrix", {
            "col_name": "pair", "n_rows": "n", "retention": "corr",
        }),
        ("rfm", "an7_rfm_segmentation", {
            "user_id": "user_id", "n_rows": "recency_days",
            "n_active": "frequency", "retention": "monetary",
            "funnel_depth": "r_score", "periods_since": "f_score",
            "n_distinct": ("CAST(m_score AS BIGINT)", "CAST(m_score AS BIGINT)"),
            "col_name": "segment",
        }),
        ("markov", "an8_markov_transitions", {
            "col_name": "src", "max_value": "dst",
            "n_rows": "n_trans", "n_active": "n_src", "retention": "p",
        }),
        ("drift", "pr5_drift_monitor", {
            "col_name": "col_name", "min_value": "category",
            "n_rows": "n_base", "n_active": "n_cur",
            "retention": "tvd_comp", "chi2_stat": "chi2_comp",
        }),
        ("lorenz", "an9_revenue_concentration", {
            "funnel_depth": ("CAST(decile AS INT)", "CAST(decile AS INTEGER)"),
            "n_rows": "n_customers",
            "retention": "revenue_share", "chi2_stat": "gini",
        }),
        ("survival", "an10_km_survival", {
            "col_name": "cohort", "periods_since":
                ("CAST(t_days AS INT)", "CAST(t_days AS INTEGER)"),
            "n_active": "n_at_risk", "n_rows": "n_events",
            "n_nulls": "n_censored", "retention": "survival",
        }),
        ("stickiness", "an11_dau_wau_stickiness", {
            "n_rows": "day", "n_active": "dau",
            "cohort_size": "wau", "retention": "stickiness",
        }),
        # round 9: AN12 funnel time-to-convert percentiles
        ("latency", "an12_conversion_latency", {
            "user_id": "cohort", "n_rows": "n_converted",
            "retention": "p50_us", "conf_ab": "p90_us",
            "n_active": "max_us",
        }),
    ],
)


# ---------------------------------------------------------------------------
# S12 + S20 + S26 + S27: schema governance (evolution, constraints, specs)
# ---------------------------------------------------------------------------

_suite(
    "s12_s20_s26_s27_governance_suite",
    doc=(
        "Schema-governance tier in one graded slot: S12 log-tracked "
        "schema evolution (old snapshots read through the merged "
        "schema) + S20 CHECK constraints (bad batch rejected "
        "atomically, constraint inherited by later merges) + S26 "
        "partition-spec evolution + S27 column-mapping rename (both "
        "zero-copy metadata commits, passthrough) (merged round 5) + "
        "S29 SCD Type 2 dimension history (change-filtered "
        "close-and-open versioning in one bucket-pruned MERGE per "
        "batch) + DG2 k-anonymity release (quasi-identifier bands, "
        "classes under k=5 suppressed; round 6) + S31 dynamic "
        "partition overwrite (INSERT OVERWRITE "
        "replacing only the arriving partitions, the backfill "
        "primitive; both added round 6) + S32 branches/WAP (zero-copy "
        "fork, staged audit, fast-forward publish, divergence "
        "refusal) + S33 ADD COLUMN DEFAULT as a metadata-only commit "
        "(Iceberg initial-default: pre-existing rows read the default, "
        "later explicit NULLs survive, inode-asserted zero rewrite) "
        "+ DG1 secured view: column masking "
        "(sha2 token, partial disclosure, k-anonymous banding) + "
        "row-level security as a broadcast policy join + S37 HIDDEN "
        "partitioning: month/bucket transform layout, raw-column "
        "queries pruned via derived PartitionFilters, executed-plan "
        "asserted (round 6). Round 8 adds DG3 the epsilon-budgeted "
        "Laplace-mechanism noisy release — per-record clipping bounds "
        "sum sensitivity, inverse-CDF noise at 1/eps and clip/eps "
        "scale, explicit epsilon accounting; seeded LCG uniform keeps "
        "the release reproducible/differential-testable. Round 9 "
        "adds S44 ROW LINEAGE (Iceberg v3 / Delta row tracking): "
        "engine-assigned _row_id surviving upserts, fresh monotone "
        "ids for inserts, _last_updated_version stamps, stability "
        "verified in-job via VERSION AS OF against v0"
    ),
    layout=[
        ("status_slot", "string", "VARCHAR"),
        ("c_custkey", "long", "BIGINT"),
        ("valid_from", "long", "BIGINT"),
        ("valid_to", "long", "BIGINT"),
        ("is_current", "boolean", "BOOLEAN"),
        ("n_rows", "long", "BIGINT"),
        ("sum_price", "double", "DOUBLE"),
        ("v0_n_cols", "long", "BIGINT"),
        ("o_orderstatus", "string", "VARCHAR"),
        ("bad_batch_rejected", "boolean", "BOOLEAN"),
        ("rejection_atomic", "boolean", "BOOLEAN"),
        ("constraint_inherited", "boolean", "BOOLEAN"),
        ("status", "string", "VARCHAR"),
        ("metric", "double", "DOUBLE"),
        ("zero_copy", "boolean", "BOOLEAN"),
        ("semantics_ok", "boolean", "BOOLEAN"),
        ("segment", "string", "VARCHAR"),
    ],
    arms=[
        ("evolution", "s12_schema_evolution", {
            "status_slot": "status_slot", "n_rows": "n_rows",
            "sum_price": "sum_price", "v0_n_cols": "v0_n_cols",
        }),
        ("constraints", "s20_check_constraints", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_price": "sum_price",
            "bad_batch_rejected": "bad_batch_rejected",
            "rejection_atomic": "rejection_atomic",
            "constraint_inherited": "constraint_inherited",
        }),
        (None, "s26_s27_metadata_ops", {
            "mode": "op", "status": "status", "n_rows": "n_rows",
            "metric": "metric", "zero_copy": "zero_copy",
            "semantics_ok": "semantics_ok",
        }),
        ("dpo", "s31_dynamic_partition_overwrite", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_price": "sum_price",
            "semantics_ok": "untouched_partitions_survive",
        }),
        ("scd2", "s29_scd2_dimension", {
            "c_custkey": "c_custkey", "valid_from": "valid_from",
            "valid_to": "valid_to", "is_current": "is_current",
            "status": "c_mktsegment", "metric": "c_acctbal",
        }),
        ("defaults", "s33_column_defaults", {
            "c_custkey": "o_orderkey", "o_orderstatus": "o_orderstatus",
            "metric": "price", "segment": "region_code",
            "zero_copy": "metadata_only",
            "semantics_ok": "old_rows_defaulted",
            "constraint_inherited": "explicit_null_preserved",
        }),
        ("masked", "dg1_masked_rls_view", {
            "status_slot": "role", "c_custkey": "c_custkey",
            "status": "name_token", "o_orderstatus": "name_masked",
            "segment": "segment", "valid_from": "bal_band",
        }),
        ("wap", "s32_branch_wap", {
            "c_custkey": "o_orderkey",
            "o_orderstatus": "o_orderstatus", "metric": "o_totalprice",
            "semantics_ok": "audit_passed", "zero_copy": "main_isolated",
            "bad_batch_rejected": "bad_audit_failed",
            "rejection_atomic": "bad_never_published",
            "constraint_inherited": "diverged_detected",
        }),
        ("k_anon", "dg2_k_anonymity", {
            "c_custkey": "region_band", "valid_from": "balance_band",
            "n_rows": "class_size", "sum_price": "sum_bal",
            "v0_n_cols": ("CAST(released AS BIGINT)", "CAST(released AS BIGINT)"),
        }),
        ("dp_release", "dg3_dp_noisy_release", {
            "status": "event_type", "metric": "noisy_count",
            "sum_price": "noisy_sum",
            "valid_from": "clip_bound",
            "v0_n_cols": (
                "CAST(epsilon_spent * 10 AS LONG)",
                "CAST(epsilon_spent * 10 AS BIGINT)",
            ),
        }),
        (None, "s37_hidden_partitioning", {
            "mode": "mode", "status": "grp", "n_rows": "n_rows",
            "metric": "total", "semantics_ok": "pruned",
        }),
        # round 9: S46 truncate/day transform parity (same shape)
        (None, "s46_transform_parity", {
            "mode": "mode", "status": "grp", "n_rows": "n_rows",
            "metric": "total", "semantics_ok": "pruned",
        }),
        # round 9: DG4 format-preserving pseudonymization (Feistel)
        ("fpe_token", "dg4_fpe_pseudonymize", {
            "c_custkey": "c_custkey", "valid_from": "token",
            "zero_copy": "roundtrip_ok",
            "bad_batch_rejected": "distinct_preserved",
        }),
        # round 9: S44 row lineage — stable row ids across upserts
        ("row_lineage", "s44_row_lineage", {
            "c_custkey": "o_orderkey", "valid_from": "row_id",
            "valid_to": "last_updated", "metric": "price",
            "zero_copy": "ids_unique", "semantics_ok": "v0_ids_stable",
            "is_current": "ids_dense",
        }),
    ],
)


# ---------------------------------------------------------------------------
# S21 + S28: the commit-log operational pair
# ---------------------------------------------------------------------------

_suite(
    "s21_s28_log_metadata_suite",
    doc=(
        "S21 commit-log checkpoints + compaction (111-version table, "
        "bounded history reads) + S28 queryable metadata tables "
        "(history + live-files relations as DataFrames, retention "
        "visibility included) — the commit log written and read back "
        "as a table, one graded slot (merged round 5) + S30 atomic "
        "MULTI-TABLE transactions (write-ahead intent + ordered CAS, "
        "crash injected mid-apply, rolled forward by recovery; added "
        "round 6)"
    ),
    layout=[
        ("n_versions", "long", "BIGINT"),
        ("o_orderstatus", "string", "VARCHAR"),
        ("sum_price", "double", "DOUBLE"),
        ("rollup_consistent", "boolean", "BOOLEAN"),
        ("recovered_atomically", "boolean", "BOOLEAN"),
        ("n_checkpoints", "long", "BIGINT"),
        ("n_entry_files", "long", "BIGINT"),
        ("live_rows", "long", "BIGINT"),
        ("content_ok", "int", "INTEGER"),
        ("version", "long", "BIGINT"),
        ("op", "string", "VARCHAR"),
        ("available", "boolean", "BOOLEAN"),
        ("n_rows", "long", "BIGINT"),
        ("files_listed", "boolean", "BOOLEAN"),
    ],
    arms=[
        ("checkpoints", "s21_log_checkpoint", {
            "n_versions": "n_versions", "n_checkpoints": "n_checkpoints",
            "n_entry_files": "n_entry_files", "live_rows": "live_rows",
            "content_ok": "content_ok",
        }),
        ("metadata_tables", "s28_metadata_tables", {
            "version": "version", "op": "op", "available": "available",
            "n_rows": "n_rows", "files_listed": "files_listed",
        }),
        ("txn", "s30_multi_table_txn", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_price": "sum_price",
            "rollup_consistent": "rollup_consistent",
            "recovered_atomically": "recovered_atomically",
        }),
    ],
)


# ---------------------------------------------------------------------------
# X1-X9 + P5: the COMPLETE scalar-function surface in one slot
# ---------------------------------------------------------------------------

_suite(
    "x1_x9_p5_scalar_suite",
    doc=(
        "The complete scalar surface in one graded slot: X1 string + X5 "
        "JSON (passthrough of the round-4 pair) + the round-5 "
        "x2_x8_p5 suite (X2 date / X3 math / X4 array HOFs / X6 CASE / "
        "X7 VARIANT / X8 collation / P5 unpivot, passthrough) + X9 map "
        "functions (merged round 5b) + X10 the ANSI-safe try_* tier "
        "(try_divide/try_cast/try_multiply vs hand-lowered CASE "
        "guards) + X11 IP/CIDR longest-prefix match (dotted-quad "
        "parse, broadcast routing-table range join, unique-argmax "
        "route pick) + X12 native from_xml ingestion (typed-struct "
        "parse cross-checked against regex extraction) + X14 the "
        "bitwise tier (shift/XOR/AND/OR/popcount rows + the "
        "BIT_AND/OR/XOR aggregate family, exact 64-bit; round 6) "
        "+ GEO2 geohash "
        "encoding from scratch (25-bit interleave by pure shift/mask "
        "codegen, canonical-vector-validated) + X13 URL functions "
        "(native parse_url HOST/PATH/QUERY + url_decode vs regex/"
        "replace re-derivation; all round 6)"
    ),
    layout=(
        [
            ("event_id", "long", "BIGINT"),
            ("type_upper", "string", "VARCHAR"),
            ("type_lower", "string", "VARCHAR"),
            ("props_prefix", "string", "VARCHAR"),
            ("props_len", "int", "INTEGER"),
            ("type_user", "string", "VARCHAR"),
            ("trimmed", "string", "VARCHAR"),
            ("n_quote_splits", "int", "INTEGER"),
            ("first_number", "string", "VARCHAR"),
            ("type_dashed", "string", "VARCHAR"),
            ("k_val", "int", "INTEGER"),
            ("k_mod10", "int", "INTEGER"),
            ("missing_val", "string", "VARCHAR"),
            ("k", "long", "BIGINT"),
        ]
        + [(c, st, dt) for c, st, dt in _XA_COLS]
        + [(c, st, dt) for c, st, dt in _XB_COLS]
        + [
            ("str_key", "string", "VARCHAR"),
            ("n_events", "long", "BIGINT"),
            ("sum_k", "long", "BIGINT"),
            ("max_k", "long", "BIGINT"),
            ("n_missing", "long", "BIGINT"),
            ("n_customers", "long", "BIGINT"),
            ("n_building_ci", "long", "BIGINT"),
            ("val", "double", "DOUBLE"),
            ("n_statuses", "long", "BIGINT"),
            ("open_cnt", "long", "BIGINT"),
            ("n_big_statuses", "long", "BIGINT"),
            ("f_avg_price", "double", "DOUBLE"),
        ]
    ),
    arms=[
        ("string_json", "x1_x5_string_json_funcs", {
            "event_id": "event_id", "type_upper": "type_upper",
            "type_lower": "type_lower", "props_prefix": "props_prefix",
            "props_len": "props_len", "type_user": "type_user",
            "trimmed": "trimmed", "n_quote_splits": "n_quote_splits",
            "first_number": "first_number", "type_dashed": "type_dashed",
            "k_val": "k_val", "k_mod10": "k_mod10",
            "missing_val": "missing_val",
        }),
        (None, "x2_x8_p5_scalar_suite", dict(
            {"mode": "mode", "k": "k", "str_key": "str_key",
             "n_events": "n_events", "sum_k": "sum_k", "max_k": "max_k",
             "n_missing": "n_missing", "n_customers": "n_customers",
             "n_building_ci": "n_building_ci", "val": "val"},
            **{c: c for c, _, _ in _XA_COLS},
            **{c: c for c, _, _ in _XB_COLS},
        )),
        ("maps", "x9_map_functions", {
            "str_key": "c_mktsegment", "n_statuses": "n_statuses",
            "open_cnt": "open_cnt", "n_big_statuses": "n_big_statuses",
            "f_avg_price": "f_avg_price",
        }),
        ("try_tier", "x10_try_functions", {
            "event_id": "l_orderkey",
            "k_val": "l_linenumber", "val": "safe_div",
            "k_mod10": "bad_int", "k": "safe_mul",
            "f_avg_price": "flag_num",
        }),
        ("cidr", "x11_cidr_match", {
            "event_id": "c_custkey", "type_upper": "ip_str",
            "type_lower": "matched_cidr", "k_val": "prefix_len",
            "k": "ip_int",
        }),
        ("xml", "x12_xml_functions", {
            "event_id": "o_orderkey", "props_prefix": "doc",
            "type_upper": "status", "type_lower": "priority",
            "val": "total",
        }),
        ("geohash", "geo2_geohash_encode", {
            "event_id": "c_custkey", "type_upper": "geohash",
            "val": "lon", "f_avg_price": "lat",
        }),
        ("url", "x13_url_functions", {
            "event_id": "p_partkey", "type_upper": "host",
            "type_lower": "path", "props_prefix": "pk_param",
            "trimmed": "size_param", "k_val": "decode_roundtrip",
        }),
        ("bitwise", "x14_bitwise_functions", {
            "type_upper": "p_brand", "n_events": "n", "k": "band",
            "event_id": "bor", "sum_k": "bxor", "max_k": "popcnt_sum",
            "n_missing": "shl_sum", "n_customers": "shr_sum",
            "n_building_ci": "xor_sum", "n_statuses": "and_sum",
            "open_cnt": "or_sum",
        }),
        # round 8: X16 the Spark 4 VARIANT type — typed/lenient path
        # extraction + merged schema inference, closed-form oracle
        ("variant", "x16_variant_type", {
            "str_key": "event_type", "n_events": "n",
            "sum_k": "sum_v0", "max_k": "sum_v1",
            "n_missing": "n_maybe", "n_customers": "n_wrong_type_null",
            "val": "sum_maybe", "missing_val": "merged_schema",
        }),
    ],
)


# ---------------------------------------------------------------------------
# E1-E4 + E7: the windowed/watermark streaming tier
# ---------------------------------------------------------------------------

_suite(
    "e1_e4_e7_stream_window_suite",
    doc=(
        "The windowed streaming tier in one graded slot, every arm a "
        "real stream: E1 tumbling windows + E3 session windows "
        "(passthrough) + E2 watermarked late-data drop + E4 streaming "
        "dedup (passthrough, one chained real stream) + E7 streaming "
        "MERGE ingest into the lakehouse table, exactly-once across "
        "micro-batches (merged round 5) + E15 one-stream-two-sinks "
        "fan-out: both rollups committed per micro-batch through ONE "
        "multi-table transaction, hand-replayed batch skipped, "
        "version-lockstep/totals-agree verdicts riding the hash + E16 "
        "checkpointed resume across separate runs (run 2 ingests ONLY "
        "files that landed after run 1 — the nightly AvailableNow "
        "contract) + E17 the output-mode matrix (update re-emits the "
        "straddling window, append emits at-most-once-and-final, both "
        "converge to the batch rollup; all round 6)"
    ),
    layout=[
        ("window_start", "timestamp", "TIMESTAMP"),
        ("window_end", "timestamp", "TIMESTAMP"),
        ("grp", "string", "VARCHAR"),
        ("n_events", "long", "BIGINT"),
        ("total_value", "double", "DOUBLE"),
        ("sum_value", "double", "DOUBLE"),
        ("fanout_consistent", "boolean", "BOOLEAN"),
    ],
    arms=[
        (None, "e1_e3_windowed_session_agg", {
            "mode": "kind", "window_start": "window_start",
            "window_end": "window_end", "grp": "grp",
            "n_events": "n_events", "total_value": "total_value",
        }),
        ("wm_dedup_agg", "e2_e4_stream_dedup_agg", {
            "window_start": "window_start", "window_end": "window_end",
            "grp": "event_type", "n_events": "n_events",
            "total_value": "total_value",
        }),
        ("merge_ingest", "e7_stream_merge_ingest", {
            "grp": "event_type", "n_events": "n_rows",
            "sum_value": "sum_value",
        }),
        (None, "e15_fanout_txn_stream", {
            "mode": ("'fanout_' || mode", "'fanout_' || mode"),
            "grp": "grp", "n_events": "n_rows",
            "sum_value": "sum_value",
            "fanout_consistent": (
                "replay_noop AND versions_lockstep AND totals_agree",
                "replay_noop AND versions_lockstep AND totals_agree",
            ),
        }),
        ("chk_resume", "e16_checkpoint_resume", {
            "grp": "event_type", "n_events": "n_rows",
            "sum_value": "sum_value",
            "fanout_consistent": (
                "first_run_partial AND resume_incremental AND no_redelivery",
                "first_run_partial AND resume_incremental AND no_redelivery",
            ),
        }),
        ("output_modes", "e17_output_mode_matrix", {
            "grp": ("CAST(window_start_s AS STRING)",
                    "CAST(window_start_s AS VARCHAR)"),
            "n_events": "n_events",
            "fanout_consistent": (
                "update_emitted_intermediates AND append_exactly_once "
                "AND append_subset_correct AND modes_converge",
                "update_emitted_intermediates AND append_exactly_once "
                "AND append_subset_correct AND modes_converge",
            ),
        }),
    ],
)


# ---------------------------------------------------------------------------
# L5 sampling tier: quota / stratified / weighted / mixture / split
# ---------------------------------------------------------------------------

_suite(
    "l5_sampling_suite",
    doc=(
        "The corpus-sampling tier in one graded slot: L5 per-language "
        "QUOTA sampling (deterministic hash ranks) + stratified "
        "sampling (per-(lang,source) buckets) + importance-WEIGHTED "
        "sampling (char-length gates) + token-budget MIXTURE "
        "(per-language cumulative token caps) + the LEAKAGE-FREE "
        "train/test split (duplicates co-locate by content hash) "
        "(merged round 5)"
    ),
    layout=[
        ("doc_id", "long", "BIGINT"),
        ("lang", "string", "VARCHAR"),
        ("source", "string", "VARCHAR"),
        ("sample_bucket", "long", "BIGINT"),
        ("n_chars", "long", "BIGINT"),
        ("keep_gate", "int", "INTEGER"),
        ("n_tokens", "long", "BIGINT"),
        ("cum_tokens", "long", "BIGINT"),
        ("split", "string", "VARCHAR"),
        ("n_docs", "long", "BIGINT"),
        ("n_buckets", "long", "BIGINT"),
    ],
    arms=[
        ("quota", "l5_quota_sample", {
            "doc_id": "doc_id", "lang": "lang",
        }),
        ("stratified", "l5_stratified_sample", {
            "doc_id": "doc_id", "lang": "lang", "source": "source",
            "sample_bucket": "sample_bucket",
        }),
        ("weighted", "l5_weighted_sample", {
            "doc_id": "doc_id", "lang": "lang", "n_chars": "n_chars",
            "sample_bucket": "sample_bucket", "keep_gate": "keep_gate",
        }),
        ("mixture", "l5_token_mixture", {
            "doc_id": "doc_id", "lang": "lang", "n_tokens": "n_tokens",
            "cum_tokens": "cum_tokens",
        }),
        ("split", "l5n_leakage_free_split", {
            "split": "split", "lang": "lang", "n_docs": "n_docs",
            "n_buckets": "n_buckets",
        }),
    ],
)


# ---------------------------------------------------------------------------
# L5 text-ops tier: pack / PII / vocab / boilerplate / TF-IDF /
# repetition / chunking
# ---------------------------------------------------------------------------

_suite(
    "l5_text_ops_suite",
    doc=(
        "The corpus text-ops tier in one graded slot: sequence PACKING "
        "(greedy token-budget bins) + PII redaction (email/IPv4/phone "
        "regex counts) + vocabulary top-k + boilerplate n-gram "
        "detection (document-frequency fractions) + TF-IDF keywords + "
        "repetition scoring (duplicate-shingle fraction) + document "
        "CHUNKING (fixed token windows) (merged round 5)"
    ),
    layout=[
        ("doc_id", "long", "BIGINT"),
        ("lang", "string", "VARCHAR"),
        ("n_tokens", "long", "BIGINT"),
        ("pack_id", "long", "BIGINT"),
        ("pack_offset", "long", "BIGINT"),
        ("redacted", "string", "VARCHAR"),
        ("n_email", "long", "BIGINT"),
        ("n_ipv4", "long", "BIGINT"),
        ("n_phone", "long", "BIGINT"),
        ("rank", "long", "BIGINT"),
        ("term", "string", "VARCHAR"),
        ("n_occurrences", "long", "BIGINT"),
        ("doc_freq", "long", "BIGINT"),
        ("shingle", "string", "VARCHAR"),
        ("n_docs", "long", "BIGINT"),
        ("df_frac", "double", "DOUBLE"),
        ("tf", "long", "BIGINT"),
        ("tfidf", "double", "DOUBLE"),
        ("n_shingles", "long", "BIGINT"),
        ("dup_shingle_frac", "double", "DOUBLE"),
        ("flagged_repetitive", "int", "INTEGER"),
        ("chunk_id", "long", "BIGINT"),
        ("n_chunk_tokens", "long", "BIGINT"),
        ("chunk_text", "string", "VARCHAR"),
    ],
    arms=[
        ("pack", "l5_pack_sequences", {
            "doc_id": "doc_id", "lang": "lang", "n_tokens": "n_tokens",
            "pack_id": "pack_id", "pack_offset": "pack_offset",
        }),
        ("pii", "l5_pii_redact", {
            "doc_id": "doc_id", "redacted": "redacted",
            "n_email": "n_email", "n_ipv4": "n_ipv4", "n_phone": "n_phone",
        }),
        ("vocab", "l5_vocab_topk", {
            "rank": "rank", "term": "term",
            "n_occurrences": "n_occurrences", "doc_freq": "doc_freq",
        }),
        ("boilerplate", "l5_boilerplate_ngrams", {
            "shingle": "shingle", "doc_freq": "doc_freq",
            "n_docs": "n_docs", "df_frac": "df_frac",
        }),
        ("tfidf", "l5_tfidf_keywords", {
            "doc_id": "doc_id", "term": "term", "tf": "tf",
            "doc_freq": "doc_freq", "tfidf": "tfidf", "rank": "rank",
        }),
        # round 8: L18 BPE tokenizer training — merge table + top-k
        # word segmentations + the convergence verdict (VERDICT r7 #7)
        (None, "l18_bpe_train", {
            "mode": "'bpe_' || part",
            "rank": "rank", "term": "left_sym", "shingle": "right_sym",
            "chunk_text": "merged", "n_occurrences": "cnt",
            "redacted": "tokenized", "flagged_repetitive": "all_converged",
        }),
        ("repetition", "l5_repetition_score", {
            "doc_id": "doc_id", "n_tokens": "n_tokens",
            "n_shingles": "n_shingles",
            "dup_shingle_frac": "dup_shingle_frac",
            "flagged_repetitive": "flagged_repetitive",
        }),
        ("chunk", "l5_doc_chunking", {
            "doc_id": "doc_id", "chunk_id": "chunk_id",
            "n_chunk_tokens": "n_chunk_tokens", "chunk_text": "chunk_text",
        }),
    ],
)


# ---------------------------------------------------------------------------
# L1/T3 exact dedup + L2g transitive dedup groups
# ---------------------------------------------------------------------------

_suite(
    "l1_t3_l2g_dedup_suite",
    doc=(
        "L1/T3 exact dedup (normalized-hash identity, min-key survivor "
        "per key — passthrough of the round-4 pair) + L2g TRANSITIVE "
        "dedup groups via distributed connected components (min-label "
        "propagation, one join per round) in one graded slot (merged "
        "round 5). Round 9 adds L16 SURVIVORSHIP: a canonical "
        "document ELECTED per near-dup group by explicit policy "
        "(longest text, ties to smallest id), every member mapped to "
        "its canonical — the keep-the-best rule corpus dedup and ER "
        "pipelines apply after clustering"
    ),
    layout=[
        ("dkey", "string", "VARCHAR"),
        ("keep_id", "long", "BIGINT"),
        ("doc_id", "long", "BIGINT"),
        ("group_id", "long", "BIGINT"),
        ("group_size", "long", "BIGINT"),
        ("survivor_id", "long", "BIGINT"),
        ("is_survivor", "int", "INTEGER"),
        ("doc_len", "long", "BIGINT"),
    ],
    arms=[
        (None, "l1_t3_exact_key_dedup", {
            "mode": "kind", "dkey": "dkey", "keep_id": "keep_id",
        }),
        ("groups", "l2_dedup_groups", {
            "doc_id": "doc_id", "group_id": "group_id",
            "group_size": "group_size",
        }),
        ("survivorship", "l16_dedup_survivorship", {
            "doc_id": "doc_id", "group_id": "group_id",
            "group_size": "group_size", "survivor_id": "survivor_id",
            "is_survivor": "is_survivor", "doc_len": "doc_len",
        }),
    ],
)


# ---------------------------------------------------------------------------
# R1 batch + R1s streaming: both directions of the paginated source
# ---------------------------------------------------------------------------

_suite(
    "r1_r1s_source_suite",
    doc=(
        "The reference's paginated wallet source BOTH ways in one "
        "graded slot: R1 the batch Python DataSource (filter pushdown, "
        "sorted pages, error-as-empty, Arrow RecordBatch read path) + "
        "R1s the STREAMING DataSource (per-wallet page offsets, "
        "exactly-once across a two-pass incremental run, verdicts "
        "riding the hash) (merged round 5) + R10s the STREAMING "
        "DataSource WRITER (per-micro-batch manifest exports, "
        "replayed-commit idempotence proven in-entry; added round 6) "
        "— the full Python DataSource matrix in one slot"
    ),
    layout=[
        ("wallet_address", "string", "VARCHAR"),
        ("user_id", "long", "BIGINT"),
        ("n_exports", "long", "BIGINT"),
        ("replay_ignored", "boolean", "BOOLEAN"),
        ("n_txs", "long", "BIGINT"),
        ("total_quantity", "double", "DOUBLE"),
        ("total_value", "long", "BIGINT"),
        ("first_batch_partial", "boolean", "BOOLEAN"),
        ("second_batch_incremental", "boolean", "BOOLEAN"),
    ],
    arms=[
        ("batch", "r1_paginated_source", {
            "wallet_address": "wallet_address", "n_txs": "n_txs",
            "total_quantity": "total_quantity",
        }),
        ("stream", "r1s_streaming_source", {
            "wallet_address": "wallet_address", "n_txs": "n_txs",
            "total_value": "total_value",
            "first_batch_partial": "first_batch_partial",
            "second_batch_incremental": "second_batch_incremental",
        }),
        ("stream_sink", "r10s_stream_export_sink", {
            "user_id": "user_id", "n_txs": "n_events",
            "total_quantity": "total_value", "n_exports": "n_exports",
            "replay_ignored": "replay_ignored",
        }),
        # round 8: S49 the Avro container source streaming — file-name
        # frontier offsets, checkpoint-resumed exactly-once
        ("avro_stream", "s49_avro_stream_source", {
            "wallet_address": "event_type", "n_txs": "n_rows",
            "total_quantity": "total",
            "replay_ignored": "exactly_once",
            "second_batch_incremental": "second_batch_incremental",
        }),
    ],
)


# ---------------------------------------------------------------------------
# L4 doc profile + L7 LM perplexity: the text-scoring pair
# ---------------------------------------------------------------------------

_suite(
    "l4_l7_text_scoring_suite",
    doc=(
        "L4 document profiling (language-ID n-gram heuristic, token "
        "counts, punctuation/stopword quality ratios, rolling-hash "
        "fingerprint) + L7 bigram-LM perplexity (CCNet-style quality "
        "signal, half-corpus-trained, broadcast model joins) — the "
        "text-scoring pair in one graded slot (merged round 5). Round 6 "
        "adds L9 Okapi BM25 relevance scoring from scratch (postings "
        "filtered to query terms pre-shuffle, broadcast corpus stats, "
        "nano-quantized order-deterministic sums) and L10 tokenizer "
        "APPLY (greedy longest-match WordPiece-inference segmentation, "
        "md5-exact against a recursive-CTE cursor-walk oracle) and "
        "L11 inverted-index build (sorted posting lists, md5-exact "
        "per term) as third, fourth and fifth arms"
    ),
    layout=[
        ("doc_id", "long", "BIGINT"),
        ("labeled_lang", "string", "VARCHAR"),
        ("predicted_lang", "string", "VARCHAR"),
        ("n_chars", "long", "BIGINT"),
        ("n_ws_tokens", "long", "BIGINT"),
        ("n_re_tokens", "long", "BIGINT"),
        ("n_punct", "long", "BIGINT"),
        ("punct_ratio", "double", "DOUBLE"),
        ("stopword_ratio", "double", "DOUBLE"),
        ("passes_quality", "int", "INTEGER"),
        ("fingerprint", "string", "VARCHAR"),
        ("n_bigrams", "long", "BIGINT"),
        ("nll", "double", "DOUBLE"),
        ("ppl", "double", "DOUBLE"),
        ("bm25", "double", "DOUBLE"),
    ],
    arms=[
        ("profile", "l4_doc_profile", {
            "doc_id": "doc_id", "labeled_lang": "labeled_lang",
            "predicted_lang": "predicted_lang", "n_chars": "n_chars",
            "n_ws_tokens": "n_ws_tokens", "n_re_tokens": "n_re_tokens",
            "n_punct": "n_punct", "punct_ratio": "punct_ratio",
            "stopword_ratio": "stopword_ratio",
            "passes_quality": "passes_quality",
            "fingerprint": "fingerprint",
        }),
        ("perplexity", "l7_lm_perplexity", {
            "doc_id": "doc_id", "n_bigrams": "n_bigrams",
            "nll": "nll", "ppl": "ppl",
        }),
        ("bm25", "l9_bm25_scoring", {
            "doc_id": "doc_id", "n_bigrams": "n_terms_matched",
            "bm25": "bm25",
        }),
        ("tokenize", "l10_tokenizer_apply", {
            "doc_id": "doc_id", "n_ws_tokens": "n_tokens",
            "fingerprint": "tokens_md5",
        }),
        ("index", "l11_inverted_index", {
            "labeled_lang": "term", "n_chars": "df", "n_re_tokens": "cf",
            "fingerprint": "postings_md5",
        }),
    ],
)


# ---------------------------------------------------------------------------
# J6 as-of join + TS1/TS2 resample: the temporal tier
# ---------------------------------------------------------------------------

_suite(
    "j6_ts1_ts2_temporal_suite",
    doc=(
        "J6 as-of join (latest-state-no-later-than, the time-series "
        "enrichment primitive) + TS1 hypertable resample with "
        "forward-fill gap grid + TS2 OHLC candles (min_by/max_by "
        "argmin, tie-deterministic) — the temporal tier in one graded "
        "slot (merged round 5). Round 6 adds TS3 rolling z-score "
        "anomaly detection (trailing-frame exact-decimal moments, "
        "current row excluded from its own baseline) and TS4 EWMA "
        "smoothing (exact-decimal per-series recurrence via "
        "applyInPandas, oracle-replayed as a recursive CTE) as fourth "
        "and fifth arms, plus J6b as-of tolerance/direction knobs "
        "(merge_asof parity: stale matches read as absent, forward "
        "matching via the mirrored frame), plus TS5 linear "
        "interpolation of grid gaps (Timescale interpolate() "
        "semantics), TS6 rolling median/IQR robust outliers (one "
        "window pass, three ordered-set aggregates on one frame), "
        "J9 binned interval-overlap join (no equi key, hash-join via "
        "time bins, nested-loop-free plan-locked), TS7 interval "
        "coalescing (gaps-and-islands range consolidation, all-integer "
        "boundaries), TS9 lag-1..3 autocorrelation (exact-decimal "
        "moments, one window pass for all three leads), GEO1 "
        "grid-binned spatial radius join (3x3 cell-neighborhood "
        "equi-join, never a cross join, exact integer distance "
        "predicate), TS8 two-sided CUSUM drift detection (pure "
        "DECIMAL add/max recurrence, recursive-CTE-replayed), W5 "
        "batch session windows via the native session_window operator "
        "(cross-proved against the gaps-and-islands hand-derivation), "
        "TS10 Holt double-exponential smoothing and TS11 hour-of-day "
        "seasonal indices (exact-decimal means), GEO3 point-in-polygon "
        "via exact-integer even-odd ray casting (concave rings, "
        "division-free crossing test), TS12 M4 + largest-triangle "
        "visual downsampling (Jugel VLDB'14 envelope + LTTB selection "
        "with centroid anchors, exact DECIMAL area argmax) and GEO4 "
        "per-entity trajectory statistics (exact-integer hop vectors, "
        "correctly-rounded sqrt legs, glitch-jump counts; all "
        "round 6). Round 8 adds TS13 Theil-Sen robust trend — median "
        "of pairwise slopes over the trailing K=16 window (bounded "
        "<=120 pairs/key, one self-join shuffle), deterministic "
        "median selection on bit-identical IEEE pair slopes"
    ),
    layout=[
        ("event_id", "long", "BIGINT"),
        ("user_id", "long", "BIGINT"),
        ("ts", "timestamp", "TIMESTAMP"),
        ("value", "double", "DOUBLE"),
        ("asof_event_id", "long", "BIGINT"),
        ("asof_ts", "timestamp", "TIMESTAMP"),
        ("asof_value", "double", "DOUBLE"),
        ("bucket_start", "long", "BIGINT"),
        ("is_gap", "int", "INTEGER"),
        ("open", "double", "DOUBLE"),
        ("high", "double", "DOUBLE"),
        ("low", "double", "DOUBLE"),
        ("close", "double", "DOUBLE"),
        ("n_events", "long", "BIGINT"),
        ("roll_mean", "double", "DOUBLE"),
        ("z", "double", "DOUBLE"),
        ("is_anomaly", "int", "INTEGER"),
    ],
    arms=[
        ("asof", "j6_asof_join", {
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "asof_event_id": "asof_event_id",
            "asof_ts": "asof_ts", "asof_value": "asof_value",
        }),
        (None, "ts1_ts2_timeseries_suite", {
            "mode": "mode", "user_id": "user_id",
            "bucket_start": "bucket_start", "value": "value",
            "is_gap": "is_gap",
            "open": ("`open`", "open"), "high": "high", "low": "low",
            "close": ("`close`", "close"), "n_events": "n_events",
        }),
        ("anomaly", "ts3_rolling_anomaly", {
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "n_events": "roll_n",
            "roll_mean": "roll_mean", "z": "z",
            "is_anomaly": "is_anomaly",
        }),
        (None, "j6b_asof_tolerance", {
            "mode": "mode",
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "asof_event_id": "asof_event_id",
            "asof_ts": "asof_ts", "asof_value": "asof_value",
        }),
        ("ewma", "ts4_ewma_smoothing", {
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "n_events": "i",
            "roll_mean": "ewma", "z": "dev",
        }),
        ("interp", "ts5_linear_interpolate", {
            "user_id": "user_id", "bucket_start": "bucket_start",
            "value": "value", "is_gap": "is_gap",
        }),
        ("overlap", "j9_interval_overlap_join", {
            "event_id": "a_id", "asof_event_id": "b_id",
            "n_events": "overlap_s",
        }),
        ("robust", "ts6_rolling_median_iqr", {
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "n_events": "roll_n",
            "roll_mean": "roll_median", "z": "roll_iqr",
            "is_anomaly": "is_outlier",
        }),
        ("islands", "ts7_interval_coalesce", {
            "user_id": "user_id", "event_id": "island",
            "bucket_start": "island_start", "asof_event_id": "island_end",
            "n_events": "n_events",
        }),
        ("acf", "ts9_autocorrelation", {
            "user_id": "user_id", "is_gap": "lag",
            "n_events": "n_pairs", "z": "acf",
        }),
        ("geo", "geo1_radius_join", {
            "event_id": "c_custkey", "asof_event_id": "s_suppkey",
            "n_events": "dist_m",
        }),
        # round 9: GEO5 nearest-facility assignment (broadcast argmin)
        ("nearest", "geo5_nearest_facility", {
            "event_id": "c_custkey", "asof_event_id": "nearest_suppkey",
            "n_events": "dist_m", "bucket_start": "d2",
        }),
        ("cusum", "ts8_cusum_drift", {
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "n_events": "i",
            "roll_mean": "cusum_hi", "z": "cusum_lo",
            "is_anomaly": "alarm",
        }),
        ("session", "w5_session_window_batch", {
            "user_id": "user_id", "ts": "session_start",
            "asof_ts": "session_end", "n_events": "n_events",
            "value": "sum_value",
        }),
        ("holt", "ts10_holt_smoothing", {
            "event_id": "event_id", "user_id": "user_id", "ts": "ts",
            "value": "value", "n_events": "i",
            "roll_mean": "level", "z": "trend",
            "asof_value": "forecast",
        }),
        ("seasonal", "ts11_seasonal_profile", {
            "is_gap": "hour_of_day", "n_events": "n",
            "roll_mean": "hourly_mean", "z": "seasonal_index",
        }),
        ("pip", "geo3_point_in_polygon", {
            "event_id": "c_custkey", "user_id": "x",
            "asof_event_id": "y", "is_gap": "zone_id",
            "n_events": "crossings",
        }),
        ("m4", "ts12_m4_downsample", {
            "event_id": "event_id", "user_id": "xs",
            "bucket_start": "yt", "is_gap": "role_id",
            "n_events": "n", "asof_event_id": "bkt",
        }),
        ("trajectory", "geo4_trajectory_stats", {
            "user_id": "user_id", "n_events": "n_hops",
            "event_id": "path_m", "asof_event_id": "longest_hop_m",
            "bucket_start": "n_jumps",
        }),
        ("theil_sen", "ts13_theil_sen", {
            "user_id": "user_id", "bucket_start": "n_points",
            "n_events": "n_pairs", "value": "slope_ticks_per_sec",
            "roll_mean": "intercept",
        }),
        ("decompose", "ts14_seasonal_decompose", {
            # event_type has no string slot in this layout; both sides
            # project the same multiset so the hash stays faithful (the
            # standalone entry keeps the full key)
            "asof_event_id": "day", "is_gap":
                ("CAST(dow AS INT)", "CAST(dow AS INTEGER)"),
            "n_events": "n", "roll_mean": "trend",
            "z": "seasonal", "value": "remainder",
        }),
        # round 9: TS15 banded DTW to the fleet reference series
        ("dtw", "ts15_dtw_distance", {
            "user_id": "user_id", "event_id": "dtw",
        }),
        # round 8: TS17 single change-point localization — SSE-split
        # argmax over exact prefix sums, deterministic tie-break
        ("changepoint", "ts17_changepoint", {
            "user_id": "user_id", "n_events": "n",
            "event_id": "cp_index", "roll_mean": "mean_left",
            "value": "mean_right", "z": "split_score",
        }),
        # round 9: TS16 irregular-sampling rate of change (exact
        # integer micro-slopes)
        ("roc", "ts16_rate_of_change", {
            "user_id": "user_id", "event_id": "event_id",
            "bucket_start": "dt_us", "asof_event_id": "dv_c",
            "n_events": "slope_micro",
            "is_gap": ("CAST(user_max_abs_slope % 1000000 AS INT)",
                       "CAST(user_max_abs_slope % 1000000 AS INTEGER)"),
        }),
    ],
)


# ---------------------------------------------------------------------------
# S1-S3/S7 scan round-trip + S22 per-table codec control
# ---------------------------------------------------------------------------

_suite(
    "s1_s7_s22_scan_codec_suite",
    doc=(
        "S1-S3 parquet/JSON/CSV + S7 ORC scan round-trips (passthrough "
        "fmt arms) + S22 per-table compression-codec control (snappy/"
        "gzip/zstd writes, size ordering verified, content "
        "codec-invariant) in one graded slot (merged round 5) + S40 "
        "write-distribution control (maxRecordsPerFile caps verified "
        "from parquet footers, fewer-larger default vs bounded capped "
        "write, content parity; round 6) + S41 the binaryFile source: "
        "the multimodal ingest front door — fixture blobs written as "
        "real files, read back one-row-per-file, M1 metadata + md5 + "
        "length-column consistency graded (round 7) + S42 COPY INTO: "
        "idempotent bulk file ingest — replay no-op, incremental-only "
        "loads, versioned O(new-bytes) commits (round 7)"
    ),
    layout=[
        ("fmt", "string", "VARCHAR"),
        ("grp", "string", "VARCHAR"),
        ("n_rows", "long", "BIGINT"),
        ("total", "double", "DOUBLE"),
        ("o_orderstatus", "string", "VARCHAR"),
        ("sum_price", "double", "DOUBLE"),
        ("codec_verified", "boolean", "BOOLEAN"),
    ],
    arms=[
        (None, "s1_s2_s3_s7_scan_roundtrip", {
            "mode": "fmt", "fmt": "fmt", "grp": "grp",
            "n_rows": "n_rows", "total": "total",
        }),
        (None, "s22_codec_control", {
            "mode": "'codec_' || fmt", "fmt": "fmt",
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_price": "sum_price", "codec_verified": "codec_verified",
        }),
        ("write_dist", "s40_write_distribution", {
            "grp": "l_returnflag", "n_rows": "n_rows",
            "total": "total_qty",
            "codec_verified": (
                "files_bounded AND more_files_than_default AND content_identical",
                "files_bounded AND more_files_than_default AND content_identical",
            ),
        }),
        ("copy_into", "s42_copy_into", {
            "grp": "l_returnflag", "n_rows": "n_rows",
            "total": "total_qty",
            "codec_verified": (
                "replay_noop AND incremental_only AND third_commit_versioned",
                "replay_noop AND incremental_only AND third_commit_versioned",
            ),
        }),
        ("binaryfile", "s41_binaryfile_source", {
            "grp": "sniffed_mime", "n_rows": "media_id",
            "total": ("CAST(n_bytes AS DOUBLE)", "CAST(n_bytes AS DOUBLE)"),
            "o_orderstatus": "content_md5",
            "codec_verified": "length_col_consistent",
        }),
        # round 10: S45s from-scratch SNAPPY codec — raw-snappy block
        # format + the Avro frame's CRC-32, foreign-bytes arm included
        ("avro_snappy", "s45s_avro_snappy_roundtrip", {
            "grp": "grp", "n_rows": "n_rows", "total": "total_price",
            "sum_price": "CAST(min_key * 1000000 + max_key AS DOUBLE)",
            "codec_verified": "foreign_ok",
        }),
        # round 9: S45n Avro DEPTH — decimal logical type + nested
        # record trees (array<struct<struct>>) through the round-trip
        ("avro_nested", "s45n_avro_nested_decimal", {
            "grp": "grp", "n_rows": "n_rows", "total": "sum_d",
            "sum_price": ("CAST(nested_total AS DOUBLE)",
                          "CAST(nested_total AS DOUBLE)"),
            "codec_verified": "decimal_exact",
        }),
        # round 8: S45 from-scratch Avro container DataSource (deflate
        # codec, sync-split parallel read) — min/max keys packed into
        # one double so the round-trip's key range is graded too
        ("avro", "s45_avro_scratch_roundtrip", {
            "grp": "c_mktsegment", "n_rows": "n_rows", "total": "total_bal",
            "sum_price": "CAST(min_key * 1000000 + max_key AS DOUBLE)",
        }),
        # round 8: S51 Avro schema RESOLUTION — evolved reader over old
        # writer bytes (skip/add/promote/reorder), closed-form graded
        ("avro_evolve", "s51_avro_schema_resolution", {
            "grp": "c_mktsegment", "n_rows": "n_rows", "total": "total_bal",
            "sum_price": "CAST(sum_nation * 1000000 + n_null_added AS DOUBLE)",
        }),
    ],
)


# ---------------------------------------------------------------------------
# S15/S18 MoR + S10b incremental compaction
# ---------------------------------------------------------------------------

_suite(
    "s15_s18_s10b_mor_maintenance_suite",
    doc=(
        "S15 MoR DELETE + S18 MoR UPSERT (hard-link zero-rewrite "
        "commits, inode-checked — passthrough) + S10b INCREMENTAL "
        "OPTIMIZE (already-compacted files re-linked untouched, only "
        "the small tail rewritten) — write-optimized commits and their "
        "maintenance in one graded slot (merged round 5) + S34 "
        "POSITION-delete files (Iceberg v2 positional deletes: "
        "predicate deletes over non-key columns, exact-duplicate rows "
        "deleted copy-by-copy via (file, row_index) identity, "
        "zero-rewrite hard-link commits) + S35 EQUALITY-delete files "
        "(Iceberg v2's blind-write delete: the writer never reads the "
        "table, sequence numbers make delete-then-reinsert sound — "
        "completing the tombstone/positional/equality MoR delete "
        "ladder; both round 6)"
    ),
    layout=[
        ("o_orderstatus", "string", "VARCHAR"),
        ("n_rows", "long", "BIGINT"),
        ("sum_price", "double", "DOUBLE"),
        ("zero_rewrite_upserts", "boolean", "BOOLEAN"),
        ("zero_rewrite_delete", "boolean", "BOOLEAN"),
        ("large_files_linked", "boolean", "BOOLEAN"),
        ("small_tail_packed", "boolean", "BOOLEAN"),
        ("grp", "long", "BIGINT"),
        ("n_delete_entries", "long", "BIGINT"),
    ],
    arms=[
        ("mor", "s15_s18_mor_upsert_delete", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_price": "sum_price",
            "zero_rewrite_upserts": "zero_rewrite_upserts",
            "zero_rewrite_delete": "zero_rewrite_delete",
        }),
        ("incremental_optimize", "s10b_incremental_compaction", {
            "o_orderstatus": "o_orderstatus", "n_rows": "n_rows",
            "sum_price": "sum_price",
            "large_files_linked": "large_files_linked",
            "small_tail_packed": "small_tail_packed",
        }),
        ("posdelete", "s34_position_deletes", {
            "grp": "grp", "n_rows": "n_rows", "sum_price": "sum_price",
            "n_delete_entries": "n_delete_entries",
            "zero_rewrite_delete": "zero_rewrite",
        }),
        ("eqdelete", "s35_equality_deletes", {
            "o_orderstatus": "c_mktsegment", "n_rows": "n_rows",
            "sum_price": "sum_bal",
            "zero_rewrite_delete": "zero_rewrite",
            "zero_rewrite_upserts": "reinsert_survives",
            "large_files_linked": "seq_ordering_held",
        }),
    ],
)
