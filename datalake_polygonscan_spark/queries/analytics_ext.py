"""Extended analytics registry entries (tail, fully oracled):

- ``j6_asof_join``     — point-in-time as-of join (operators/temporal.py)
- ``a5_percentiles``   — exact grouped percentiles (sort-based; the
                         100 TB path is approx_percentile, entry
                         a2_approx_count_distinct's HLL analog)
- ``p4_pivot``         — pivot with EXPLICIT value list (no extra
                         discovery pass over the fact table)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.operators.temporal import asof_join, resample_forward_fill
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table, tiny_df

DEC = T.DecimalType(18, 6)


@register(
    "j6_asof_join",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, ROUND(c.value, 4) AS value,
           e.event_id AS asof_event_id,
           e.ts       AS asof_ts,
           ROUND(e.value, 4) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN LATERAL (
        SELECT event_id, ts, value
        FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id AND e.ts <= c.ts
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
    ) e ON TRUE
    """,
    doc="J6 as-of (point-in-time) join: each click event matched to the latest error event at-or-before it for the same user, NULL when none — union+sorted-window formulation, ONE shuffle on user_id, no range-join pair blowup (operators/temporal.py:asof_join); oracle = DuckDB LATERAL top-1",
)
def j6_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("value")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts", F.round("value", 4).alias("value")
    )
    return asof_join(
        clicks, errors, on=["user_id"], left_ts="ts", right_ts="ts", right_tiebreak="event_id"
    )


@register(
    "ts1_resample_gapfill",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch(CAST(ts AS TIMESTAMP)) AS es, ts, event_id, value
        FROM events WHERE event_type = 'error'
    ), b AS (
        SELECT user_id,
               CAST(floor(es / 3600) * 3600 AS BIGINT) AS bucket_start,
               value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(floor(es / 3600) * 3600 AS BIGINT)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
    ), last_b AS (
        SELECT user_id, bucket_start, value FROM b WHERE rn = 1
    ), rng AS (
        SELECT user_id, min(bucket_start) AS mn, max(bucket_start) AS mx
        FROM last_b GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS bucket_start FROM rng
    )
    SELECT g.user_id, g.bucket_start,
           ROUND(last_value(l.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS value,
           CAST(l.value IS NULL AS INTEGER) AS is_gap
    FROM grid g LEFT JOIN last_b l USING (user_id, bucket_start)
    """,
    doc="TS1 hypertable rollup + gap fill: per-user 'error' stream onto an hourly epoch grid — max_by last-per-bucket (map-side combine BEFORE the shuffle), per-key sequence/explode grid, one running forward-fill window; is_gap marks carried-forward buckets (operators/temporal.py:resample_forward_fill)",
)
def ts1_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    out = resample_forward_fill(
        ev, "user_id", "ts", "value", "event_id", step_seconds=3600
    )
    return out.withColumn("value", F.round("value", 4))


@register(
    "a5_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4)       AS p50_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 4)       AS p90_qty,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
           CAST(count(*) AS BIGINT)                       AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="A5 exact grouped percentiles (linear interpolation, identical in Spark percentile() and DuckDB quantile_cont). Exact percentile is a sort-based aggregate — fine per group; at 100 TB swap to approx_percentile (t-digest) the same way A2 swaps count_distinct for HLL",
)
def a5_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99_price"),
        F.count("*").alias("n"),
    )


@register(
    "p4_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE), 4) AS qty_O,
           ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE), 4) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="P4 pivot with an EXPLICIT value list (skips Spark's value-discovery pass over the fact table — one aggregate, no extra job); decimal-exact sums inside, rounded-double boundary; oracle = conditional aggregation",
)
def p4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 4))
    )
    return pv.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@register(
    "an1_funnel_steps",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_type FROM events
    ), w1 AS (
        SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM base GROUP BY user_id
    ), w2 AS (
        SELECT b.user_id, w1.t_view,
               min(CASE WHEN b.event_type = 'click' AND b.ts >= w1.t_view THEN b.ts END) AS t_click
        FROM base b JOIN w1 USING (user_id) GROUP BY b.user_id, w1.t_view
    ), w3 AS (
        SELECT b.user_id, w2.t_view, w2.t_click,
               min(CASE WHEN b.event_type = 'purchase' AND b.ts >= w2.t_click THEN b.ts END) AS t_purchase
        FROM base b JOIN w2 USING (user_id) GROUP BY b.user_id, w2.t_view, w2.t_click
    )
    SELECT user_id,
           CAST(t_view AS TIMESTAMP) AS t_view,
           CAST(t_click AS TIMESTAMP) AS t_click,
           CAST(t_purchase AS TIMESTAMP) AS t_purchase,
           CASE WHEN t_purchase IS NOT NULL THEN 3
                WHEN t_click IS NOT NULL THEN 2
                WHEN t_view IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth
    FROM w3
    """,
    doc="AN1 ordered funnel (view -> click -> purchase): per-user earliest step-1 time, earliest step-2 at-or-after it, etc., with completed-step depth — chained per-key windows over ONE exchange, no orderBy/sort, final distinct over key-constant columns (operators/temporal.py:funnel)",
)
def an1_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


#: columns profiled by pr1 — long/string/date only (double min/max
#: string-formatting differs between engines; profile numerics via the
#: typed A-family aggregates instead).
_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]


def _profile_oracle_sql() -> str:
    parts = [
        f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM orders"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register(
    "pr1_table_profile",
    oracle=_profile_oracle_sql(),
    doc="PR1 table profiling: per-column n_rows/nulls/distinct/min/max over orders in ONE scan (single agg with Expand for the exact multi-column distinct; at 100 TB swap to approx_count_distinct per column and Expand disappears), stack-unpivoted to long format (operators/profiling.py:profile_table)",
)
def pr1_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.profiling import profile_table

    o = load_table(spark, sf_dir, "orders")
    return profile_table(o, _PROFILE_COLS)


@register(
    "sk_salted_join",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="SK skew-salted join with SELF-TUNING fan-out (operators/skew.py:salted_join, salt_n=None): a deterministic content-hash sample sketches the key-frequency distribution, sizes the salt from the hottest key's share (ceil(share x shuffle.partitions), capped), and skips replication when nothing is hot; the fact side then gets a content-derived salt, the dim side replicates via explode(sequence), and the join key becomes (key, salt). The oracle is the PLAIN unsalted join — detection and salting must both be semantically invisible, which is exactly what the value check proves",
)
def sk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.skew import salted_join

    c = load_table(spark, sf_dir, "customer")
    dim = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = salted_join(c, dim, on="c_nationkey", salt_n=None)
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 4).alias("total_acctbal"),
    )


@register(
    "an2_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY user_id
    ), cells AS (
        SELECT f.cohort,
               CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7 AS INTEGER) AS periods_since,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    ), sizes AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM firsts GROUP BY cohort
    )
    SELECT CAST(c.cohort AS TIMESTAMP) AS cohort, c.periods_since, c.n_active, s.cohort_size,
           ROUND(c.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM cells c JOIN sizes s USING (cohort)
    """,
    doc=(
        "AN2 cohort retention matrix (operators/temporal.py:cohort_retention): "
        "cohort = the week of each user's FIRST event; every (cohort, weeks_since) "
        "cell counts distinct returning users with the retention ratio vs cohort "
        "size — the product-analytics companion to AN1's funnel. One min-per-key "
        "agg, one key-partitioned join back (exchange reused), one distinct-agg; "
        "never a window over the raw stream"
    ),
)
def an2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")


@register(
    "a6_heavy_hitters",
    oracle="""
    WITH keyed AS (SELECT o_custkey AS key FROM orders WHERE o_custkey IS NOT NULL),
    n AS (SELECT count(*) AS n FROM keyed)
    SELECT key, CAST(count(*) AS BIGINT) AS cnt,
           ROUND(count(*) * 1.0 / (SELECT n FROM n), 6) AS frac
    FROM keyed GROUP BY key
    HAVING count(*) >= CEIL(0.0012 * (SELECT n FROM n))
    """,
    doc=(
        "A6 distributed heavy hitters via mergeable Misra-Gries-family "
        "summaries + exact recount (operators/sketches.py:heavy_hitters; "
        "Agarwal et al. PODS '12): each partition emits at most k "
        "candidate keys (top-k with the (k+1)-th count subtracted — "
        "deficiency telescopes, so every theta-heavy key provably "
        "surfaces), then ONLY the candidate set is broadcast and "
        "exactly recounted. The shuffle carries k x partitions rows, "
        "never the full key cardinality — at billions of distinct keys "
        "a plain groupBy's shuffle IS the table; this one is O(k). "
        "Output is exactly HAVING count >= ceil(theta*n), so the "
        "oracle value-checks it with no verdict thresholds"
    ),
)
def a6_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.sketches import heavy_hitters

    o = load_table(spark, sf_dir, "orders")
    return heavy_hitters(o, "o_custkey", threshold_frac=0.0012)


@register(
    "a5b_approx_percentiles",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS INTEGER) AS rank_ok_p50,
           CAST(1 AS INTEGER) AS rank_ok_p90,
           CAST(1 AS INTEGER) AS rank_ok_p99
    FROM lineitem
    """,
    doc=(
        "A5b approximate percentiles via Spark's mergeable quantile "
        "sketch (percentile_approx, Greenwald-Khanna family) — the "
        "100 TB path where A5's exact per-group sort-based percentile "
        "is the small-data tier. Graded as a MEASURED metric: the "
        "sketch estimates p50/p90/p99 of l_extendedprice, then ONE "
        "conditional-count aggregate computes each estimate's true "
        "RANK in the data, and the verdicts assert the rank lands "
        "within +-0.01 of the target quantile (the sketch guarantees "
        "rank error <= 1/accuracy = 1e-4; the band leaves headroom). "
        "A broken sketch driver-fails; a rows-only check would pass it"
    ),
)
def a5b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    est = li.agg(
        F.percentile_approx("v", [0.5, 0.9, 0.99], 10000).alias("est")
    ).select(
        F.col("est")[0].alias("e50"), F.col("est")[1].alias("e90"), F.col("est")[2].alias("e99")
    )
    ranked = (
        li.crossJoin(F.broadcast(est))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((F.col("v") <= F.col("e50")).cast("long")).alias("r50"),
            F.sum((F.col("v") <= F.col("e90")).cast("long")).alias("r90"),
            F.sum((F.col("v") <= F.col("e99")).cast("long")).alias("r99"),
        )
    )
    def ok(r, q):
        return (
            (F.col(r) / F.col("n_rows") >= q - 0.01)
            & (F.col(r) / F.col("n_rows") <= q + 0.01)
        ).cast("int")
    return ranked.select(
        "n_rows",
        ok("r50", 0.5).alias("rank_ok_p50"),
        ok("r90", 0.9).alias("rank_ok_p90"),
        ok("r99", 0.99).alias("rank_ok_p99"),
    )


@register(
    "an4_association_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), nb AS (
        SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM items
    ), item_cnt AS (
        SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY item
    ), freq AS (
        SELECT item, cnt FROM item_cnt CROSS JOIN nb
        WHERE cnt >= CAST(ceil(0.005 * n_baskets) AS BIGINT)
    ), fitems AS (
        SELECT i.basket, i.item FROM items i JOIN freq f ON i.item = f.item
    ), pairs AS (
        SELECT a.item AS brand_a, b.item AS brand_b,
               CAST(count(*) AS BIGINT) AS pair_cnt
        FROM fitems a JOIN fitems b
          ON a.basket = b.basket AND a.item < b.item
        GROUP BY a.item, b.item
    )
    SELECT p.brand_a, p.brand_b, p.pair_cnt,
           ROUND(CAST(p.pair_cnt AS DOUBLE) / nb.n_baskets, 6) AS support,
           ROUND(CAST(p.pair_cnt AS DOUBLE) / fa.cnt, 6) AS conf_ab,
           ROUND(CAST(p.pair_cnt AS DOUBLE) / fb.cnt, 6) AS conf_ba,
           ROUND(CAST(p.pair_cnt AS DOUBLE) * nb.n_baskets
                 / (CAST(fa.cnt AS DOUBLE) * fb.cnt), 6) AS lift
    FROM pairs p
    JOIN freq fa ON fa.item = p.brand_a
    JOIN freq fb ON fb.item = p.brand_b
    CROSS JOIN nb
    WHERE p.pair_cnt >= CAST(ceil(0.005 * nb.n_baskets) AS BIGINT)
    """,
    doc=(
        "AN4 market-basket association rules (the a-priori co-"
        "occurrence primitive): baskets = orders, items = part brands "
        "(broadcast dim join), support/confidence/lift over "
        "distinct-reduced (basket, item) pairs. The 100 TB shape: the "
        "ONLY quadratic stage is the within-basket self-join, bounded "
        "by basket size (never table size), and it runs AFTER the "
        "a-priori prune — infrequent items are removed by a broadcast "
        "semi-join first, the monotonicity guarantee (a pair can't be "
        "frequent if either item isn't) that makes the pair explosion "
        "collapse at scale. Counts are exact ints; every ratio is one "
        "IEEE division of exact ints, so the output is deterministic "
        "under any partitioning"
    ),
)
def an4_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    items = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_baskets = items.select("basket").distinct().count()
    minsup = int(-(-0.005 * n_baskets // 1))  # ceil
    item_cnt = items.groupBy("item").agg(F.count("*").cast("long").alias("cnt"))
    freq = item_cnt.filter(F.col("cnt") >= minsup)
    fitems = items.join(F.broadcast(freq.select("item")), "item")
    a = fitems.select(F.col("basket"), F.col("item").alias("brand_a"))
    b = fitems.select(F.col("basket"), F.col("item").alias("brand_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= minsup)
    )
    fa = freq.select(F.col("item").alias("brand_a"), F.col("cnt").alias("cnt_a"))
    fb = freq.select(F.col("item").alias("brand_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(fa), "brand_a")
        .join(F.broadcast(fb), "brand_b")
        .select(
            "brand_a", "brand_b", "pair_cnt",
            F.round(F.col("pair_cnt") / F.lit(n_baskets), 6).alias("support"),
            F.round(F.col("pair_cnt") / F.col("cnt_a"), 6).alias("conf_ab"),
            F.round(F.col("pair_cnt") / F.col("cnt_b"), 6).alias("conf_ba"),
            F.round(
                F.col("pair_cnt") * F.lit(float(n_baskets))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")), 6
            ).alias("lift"),
        )
    )


@register(
    "a7_kll_quantiles",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS INTEGER) AS rank_ok_p50,
           CAST(1 AS INTEGER) AS rank_ok_p90,
           CAST(1 AS INTEGER) AS rank_ok_p99,
           CAST(1 AS INTEGER) AS sketch_bounded
    FROM lineitem WHERE l_extendedprice IS NOT NULL
    """,
    doc=(
        "A7 KLL quantile sketch BUILT FROM SCRATCH (Karnin-Lang-"
        "Liberty FOCS'16; operators/sketches.py:KLLSketch) — the "
        "mergeable-summaries quantile path a 100 TB engine actually "
        "ships: per-partition compactor hierarchies of O(k log(n/k)) "
        "floats built in ONE mapInPandas scan, merged on the driver "
        "(bytes shipped are O(partitions x k), never O(n)), "
        "deterministic alternating-parity compaction instead of coin "
        "flips. Graded as a MEASURED metric like A5b: the estimates' "
        "true ranks must land within +-0.01 of p50/p90/p99 (k=512 "
        "measures <=0.004 worst-case), and the merged sketch must "
        "retain <= 3k + 8*32 items — the size bound that makes the "
        "sketch independent of table size. A broken compactor or a "
        "size leak driver-fails"
    ),
)
def a7_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.sketches import kll_quantiles

    k = 512
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    n, (e50, e90, e99), retained = kll_quantiles(li, "v", [0.5, 0.9, 0.99], k=k)
    bounded = 1 if retained <= 3 * k + 8 * 32 else 0
    ranked = li.agg(
        F.count("*").alias("n_rows"),
        F.sum((F.col("v") <= F.lit(e50)).cast("long")).alias("r50"),
        F.sum((F.col("v") <= F.lit(e90)).cast("long")).alias("r90"),
        F.sum((F.col("v") <= F.lit(e99)).cast("long")).alias("r99"),
    )

    def ok(r, q):
        return (
            (F.col(r) / F.col("n_rows") >= q - 0.01)
            & (F.col(r) / F.col("n_rows") <= q + 0.01)
        ).cast("int")

    return ranked.select(
        "n_rows",
        ok("r50", 0.5).alias("rank_ok_p50"),
        ok("r90", 0.9).alias("rank_ok_p90"),
        ok("r99", 0.99).alias("rank_ok_p99"),
        F.lit(bounded).cast("int").alias("sketch_bounded"),
    )


@register(
    "a7g_kll_grouped_quantiles",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(1 AS INTEGER) AS rank_ok_p50,
           CAST(1 AS INTEGER) AS rank_ok_p90
    FROM lineitem WHERE l_extendedprice IS NOT NULL
    GROUP BY l_returnflag
    """,
    doc=(
        "A7g GROUPED KLL quantiles (operators/sketches.py:"
        "kll_grouped_quantiles) — the per-key form that replaces "
        "exact per-group sorts at 100 TB: ONE applyInPandas shuffle "
        "builds a compactor hierarchy per key and ships only the "
        "estimates (O(keys x qs) doubles, never the values). Graded "
        "like A7/A5b: one conditional-count scan joins the broadcast "
        "estimates back and asserts each group's p50/p90 estimate "
        "ranks within +-0.01 of target inside ITS OWN group"
    ),
)
def a7g_kll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.sketches import kll_grouped_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    est = kll_grouped_quantiles(li, "l_returnflag", "v", [0.5, 0.9], k=512).select(
        F.col("key").alias("l_returnflag"), "q_50", "q_90"
    )
    ranked = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("v") <= F.col("q_50")).cast("long")).alias("r50"),
            F.sum((F.col("v") <= F.col("q_90")).cast("long")).alias("r90"),
        )
    )

    def ok(r, q):
        return (
            (F.col(r) / F.col("n") >= q - 0.01) & (F.col(r) / F.col("n") <= q + 0.01)
        ).cast("int")

    return ranked.select(
        "l_returnflag", "n",
        ok("r50", 0.5).alias("rank_ok_p50"),
        ok("r90", 0.9).alias("rank_ok_p90"),
    )


@register(
    "a10_kmv_set_intersection",
    oracle="""
    WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'),
         b AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'N')
    SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
           CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
           CAST((SELECT count(*) FROM a JOIN b USING (l_orderkey)) AS BIGINT) AS exact_inter,
           CAST(1 AS INTEGER) AS est_a_ok,
           CAST(1 AS INTEGER) AS est_b_ok,
           CAST(1 AS INTEGER) AS est_inter_ok
    """,
    doc=(
        "A10 KMV / theta-family sketch BUILT FROM SCRATCH (operators/"
        "sketches.py:kmv_sketch; Beyer et al. SIGMOD'07): bottom-k "
        "distinct hashes per partition (one mapInPandas scan, <= k "
        "longs leave each partition), driver merge, distinct estimate "
        "(k-1)/theta — and the operation HLL cannot do: SET "
        "INTERSECTION between two sketches via the union sketch's "
        "Jaccard fraction. Estimates the distinct-order overlap "
        "between returnflag A and N populations WITHOUT joining them; "
        "graded as a measured metric (A5b pattern): each estimate "
        "must land within 15 percent (~5 sigma at k=1024) of the "
        "exact value the oracle computes, so a broken sketch or "
        "intersection driver-fails"
    ),
)
def a10_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.sketches import (
        kmv_estimate,
        kmv_intersection,
        kmv_sketch,
    )

    k = 1024
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    b = li.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    sa, sb = kmv_sketch(a, "l_orderkey", k), kmv_sketch(b, "l_orderkey", k)
    est_a, est_b = kmv_estimate(sa, k), kmv_estimate(sb, k)
    est_i = kmv_intersection(sa, sb, k)

    exact = (
        a.distinct()
        .agg(F.count("*").alias("exact_a"))
        .crossJoin(b.distinct().agg(F.count("*").alias("exact_b")))
        .crossJoin(
            a.intersect(b).agg(F.count("*").alias("exact_inter"))
        )
    )

    def ok(est, col):
        return (
            (F.lit(est) >= F.col(col) * 0.85) & (F.lit(est) <= F.col(col) * 1.15)
        ).cast("int")

    return exact.select(
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        F.col("exact_inter").cast("long").alias("exact_inter"),
        ok(est_a, "exact_a").alias("est_a_ok"),
        ok(est_b, "exact_b").alias("est_b_ok"),
        ok(est_i, "exact_inter").alias("est_inter_ok"),
    )


@register(
    "a9_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag AS flag,
               l_extendedprice AS price,
               CAST(l_quantity AS BIGINT) AS wt
        FROM lineitem
    ), cum AS (
        SELECT flag, price, wt,
               SUM(wt) OVER (PARTITION BY flag ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(wt) OVER (PARTITION BY flag) AS total_w
        FROM w
    )
    SELECT flag AS l_returnflag,
           CAST(max(total_w) AS BIGINT) AS total_weight,
           ROUND(min(CASE WHEN 2 * cw >= total_w THEN price END), 4) AS weighted_median
    FROM cum GROUP BY flag
    """,
    doc=(
        "A9 exact WEIGHTED median (lower weighted median: the "
        "smallest value whose cumulative weight reaches half the "
        "total) — quantity-weighted price per return flag, the "
        "inventory-weighted statistic plain percentile() cannot "
        "express. One windowed cumulative sum over the per-group sort "
        "(the same Exchange+Sort a grouped percentile needs anyway) "
        "+ one aggregate; ALL arithmetic is integer weights and a "
        "monotone threshold (2*cum >= W, no division), so ties and "
        "partitioning cannot flip the answer and the oracle replays "
        "the identical formula"
    ),
)
def a9_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    wc = Window.partitionBy("flag").orderBy("price").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("flag")
    cum = li.select(
        "flag", "price",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt).alias("total_w"),
    )
    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.max("total_w").cast("long").alias("total_weight"),
        F.round(
            F.min(F.when(2 * F.col("cw") >= F.col("total_w"), F.col("price"))), 4
        ).alias("weighted_median"),
    )


@register(
    "dq1_expectation_suite",
    oracle="""
    WITH m AS (
      SELECT
        ROUND(CAST(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) AS DOUBLE), 6) AS comp,
        ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(o_orderkey), 6) AS uniq,
        ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 6) AS minp,
        ROUND(CAST(AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END) AS DOUBLE), 6) AS pat,
        ROUND(CAST(AVG(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END) AS DOUBLE), 6) AS inset
      FROM orders
    ), fk AS (
      SELECT ROUND(1.0 - CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*), 6) AS ri,
             SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS orphans
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      WHERE o_custkey IS NOT NULL
    )
    SELECT 'completeness' AS check_name, 'o_custkey' AS col_name,
           comp AS metric, CAST(1.0 AS DOUBLE) AS threshold,
           CAST(comp >= 1.0 AS INTEGER) AS passed FROM m
    UNION ALL SELECT 'uniqueness', 'o_orderkey', uniq, CAST(1.0 AS DOUBLE), CAST(uniq >= 1.0 AS INTEGER) FROM m
    UNION ALL SELECT 'min', 'o_totalprice', minp, CAST(0.0 AS DOUBLE), CAST(minp >= 0.0 AS INTEGER) FROM m
    UNION ALL SELECT 'pattern', 'o_orderpriority', pat, CAST(1.0 AS DOUBLE), CAST(pat >= 1.0 AS INTEGER) FROM m
    UNION ALL SELECT 'in_set', 'o_orderstatus', inset, CAST(1.0 AS DOUBLE), CAST(inset >= 1.0 AS INTEGER) FROM m
    UNION ALL SELECT 'referential_integrity', 'o_custkey', ri, CAST(1.0 AS DOUBLE),
                     CAST(orphans = 0 AS INTEGER) FROM fk
    """,
    doc=(
        "DQ1 declarative data-quality EXPECTATION suite "
        "(operators/quality.py — Deequ/Great-Expectations shape): "
        "completeness, key uniqueness, min bound, regex pattern rate, "
        "and value-set membership ALL compile into ONE aggregation over "
        "one scan of orders (stack-pivoted to a row per check), plus a "
        "referential-integrity check (o_custkey into customer) as one "
        "broadcast anti-join count. Unlike S20's hard CHECK gates these "
        "MEASURE — metric, threshold, pass flag per row, the shape an "
        "ingest pipeline logs and alerts on. Oracle restates every "
        "metric closed-form"
    ),
)
def dq1_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.quality import (
        expectations,
        referential_integrity,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    suite = expectations(
        o,
        [
            {"check": "completeness", "column": "o_custkey", "min_ratio": 1.0},
            {"check": "uniqueness", "column": "o_orderkey", "min_ratio": 1.0},
            {"check": "min", "column": "o_totalprice", "at_least": 0.0},
            {"check": "pattern", "column": "o_orderpriority", "regex": "^[1-5]-", "min_ratio": 1.0},
            {"check": "in_set", "column": "o_orderstatus", "values": ["O", "F", "P"], "min_ratio": 1.0},
        ],
    )
    fk = referential_integrity(o, "o_custkey", c, "c_custkey")
    return suite.unionByName(fk)


@register(
    "ts2_ohlc_resample",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch(CAST(ts AS TIMESTAMP)) AS es, ts, event_id, value
        FROM events WHERE event_type = 'click'
    ), b AS (
        SELECT user_id,
               CAST(floor(es / 3600) * 3600 AS BIGINT) AS bucket_start,
               value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(floor(es / 3600) * 3600 AS BIGINT)
                   ORDER BY ts ASC, event_id ASC) AS rn_a,
               row_number() OVER (
                   PARTITION BY user_id, CAST(floor(es / 3600) * 3600 AS BIGINT)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT user_id, bucket_start,
           ROUND(CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DOUBLE), 4) AS open,
           ROUND(CAST(MAX(value) AS DOUBLE), 4) AS high,
           ROUND(CAST(MIN(value) AS DOUBLE), 4) AS low,
           ROUND(CAST(MAX(CASE WHEN rn_d = 1 THEN value END) AS DOUBLE), 4) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY user_id, bucket_start
    """,
    doc=(
        "TS2 OHLC candle resample (the finance/telemetry rollup TS1's "
        "gap fill composes with): per (user, hourly bucket) "
        "open/high/low/close/count in ONE map-side-combined aggregate "
        "— open/close via min_by/max_by keyed on a (ts, event_id) "
        "struct (deterministic under timestamp ties, lexicographic "
        "struct ordering), never a per-row window over the raw "
        "stream. The oracle replays it with rank windows; equality "
        "proves the argmin/argmax formulation"
    ),
)
def ts2_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.col("user_id"), bucket.alias("bucket_start"))
        .agg(
            F.round(F.min_by("value", order_key).cast("double"), 4).alias("open"),
            F.round(F.max("value").cast("double"), 4).alias("high"),
            F.round(F.min("value").cast("double"), 4).alias("low"),
            F.round(F.max_by("value", order_key).cast("double"), 4).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "er1_record_linkage",
    oracle="""
    WITH keyed AS (
        SELECT substr(c_name, 1, length(c_name) - 1) AS block,
               c_custkey AS id, c_name AS name
        FROM customer
    ), pairs AS (
        SELECT a.block, a.id AS id_a, b.id AS id_b,
               levenshtein(a.name, b.name) AS d
        FROM keyed a JOIN keyed b ON a.block = b.block AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 1
    )
    SELECT k.block,
           CAST(count(DISTINCT k.id) AS BIGINT) AS n_records,
           CAST(count(DISTINCT k.id) * (count(DISTINCT k.id) - 1) / 2 AS BIGINT) AS n_candidates,
           CAST(COALESCE(p.n_matches, 0) AS BIGINT) AS n_matches
    FROM keyed k
    LEFT JOIN (SELECT block, count(*) AS n_matches FROM pairs GROUP BY block) p
      ON k.block = p.block
    GROUP BY k.block, p.n_matches
    """,
    doc=(
        "ER1 ENTITY RESOLUTION / record linkage via blocking + edit "
        "distance (operators/linkage.py — Fellegi-Sunter shape, "
        "Christen TKDE'12 blocking): customer names block on "
        "all-but-last-2 chars (the cheap deterministic key that keeps "
        "the quadratic term at sum(b_i^2), never all-pairs — the "
        "structured-string sibling of the MinHash/LSH text tier), "
        "within-block pairs score by codegen levenshtein and survive "
        "at distance <= 1. Output is the per-block linkage PROFILE "
        "(records, candidate pairs = the skew report, surviving "
        "matches) — Levenshtein exists in both engines, so the whole "
        "pipeline is value-oracled with no engine-local hashing"
    ),
)
def er1_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.linkage import (
        block_match_profile,
        blocked_fuzzy_pairs,
    )

    c = load_table(spark, sf_dir, "customer")
    # block on all-but-ONE trailing char: blocking keys must keep
    # blocks near-constant-size (sum b_i^2 is the cost) — the previous
    # 2-char suffix made 100-row blocks, 10x the scored pairs for the
    # same scorer-parity demonstration
    block = F.expr("substr(c_name, 1, length(c_name) - 1)")
    pairs = blocked_fuzzy_pairs(c, "c_custkey", "c_name", block, max_edit=1)
    return block_match_profile(c, block, pairs)


@register(
    "dq2_observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS BIGINT) AS n_big,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_price,
           TRUE AS from_observation,
           TRUE AS single_scan
    FROM orders
    """,
    doc=(
        "DQ2 piggyback metrics via df.observe / Observation: data-quality "
        "counters (row count, threshold violations, control total) collected "
        "DURING another job's pass — the CollectMetrics plan node rides the "
        "existing scan, so at 100 TB quality monitoring costs ZERO extra "
        "jobs (DQ1's expectation suite is the standalone single-scan "
        "sibling; this is the embedded form). The entry runs a noop-sink "
        "write as the 'production' action, harvests the observation, and "
        "returns the metrics as the graded row: from_observation rides the "
        "values' provenance, single_scan asserts CollectMetrics in the "
        "executed plan"
    ),
)
def dq2_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation
    from pyspark.sql import types as T

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("dq2_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4).alias("total_price"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the production pass
    plan = observed._jdf.queryExecution().executedPlan().toString()
    m = obs.get
    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_big", T.LongType()),
            T.StructField("total_price", T.DoubleType()),
            T.StructField("from_observation", T.BooleanType()),
            T.StructField("single_scan", T.BooleanType()),
        ]
    )
    return tiny_df(
        spark,
        [
            (
                m["n_rows"],
                m["n_big"],
                float(m["total_price"]),
                True,
                "CollectMetrics" in plan,
            )
        ],
        schema,
    )


@register(
    "ts3_rolling_anomaly",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             CAST(count(*) OVER roll AS BIGINT) AS roll_n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER roll AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER roll AS DOUBLE) AS s2
      FROM events WHERE event_type = 'purchase'
      WINDOW roll AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ), z AS (
      SELECT event_id, user_id, ts, value, roll_n,
             CASE WHEN roll_n >= 10 THEN s1 / roll_n END AS mu,
             CASE WHEN roll_n >= 10 AND (s2 - s1 * s1 / roll_n) / roll_n > 0
                  THEN (value - s1 / roll_n) / sqrt((s2 - s1 * s1 / roll_n) / roll_n) END AS zs
      FROM w
    )
    SELECT event_id, user_id, ts,
           ROUND(CAST(value AS DOUBLE), 4) AS value,
           roll_n,
           ROUND(CAST(mu AS DOUBLE), 4) AS roll_mean,
           ROUND(CAST(zs AS DOUBLE), 4) AS z,
           CAST(CASE WHEN zs IS NOT NULL AND abs(zs) > 3.0 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM z
    """,
    doc=(
        "TS3 rolling-window anomaly detection (the telemetry outlier "
        "primitive): per-user trailing-20-event z-score with the current row "
        "EXCLUDED from its own baseline (ROWS 20 PRECEDING .. 1 PRECEDING), "
        "flagged when |z| > 3 with a >=10-sample warmup guard. One window "
        "pass, no self-join, no shuffle beyond the per-user sort — the shape "
        "that scales to 100 TB of events because state is a bounded frame. "
        "Rolling moments are EXACT decimal sums (value and value^2) so both "
        "engines divide identical IEEE doubles; stddev never touches a "
        "float accumulation order"
    ),
)
def ts3_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    roll = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-20, -1)
    )
    dec = F.col("value").cast("decimal(18,6)")
    w = ev.select(
        "event_id", "user_id", "ts", "value",
        F.count(F.lit(1)).over(roll).alias("roll_n"),
        F.sum(dec).over(roll).cast("double").alias("s1"),
        F.sum(dec * dec).over(roll).cast("double").alias("s2"),
    )
    n = F.col("roll_n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / n
    mu = F.col("s1") / n
    zs = F.when((n >= 10) & (var > 0), (F.col("value") - mu) / F.sqrt(var))
    return w.select(
        "event_id", "user_id", "ts",
        F.round(F.col("value").cast("double"), 4).alias("value"),
        "roll_n",
        F.round(F.when(n >= 10, mu).cast("double"), 4).alias("roll_mean"),
        F.round(zs.cast("double"), 4).alias("z"),
        F.when(zs.isNotNull() & (F.abs(zs) > 3.0), 1).otherwise(0).cast("int").alias("is_anomaly"),
    )


@register(
    "ts4_ewma_smoothing",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,6)) AS x,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rdesc
        FROM events WHERE event_type = 'purchase'
    ), lastk AS (
        SELECT event_id, user_id, ts, x,
               row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS i
        FROM base WHERE rdesc <= 24
    ), rec(user_id, i, event_id, ts, x, y) AS (
        SELECT user_id, i, event_id, ts, x, CAST(x AS DECIMAL(28,12)) FROM lastk WHERE i = 1
        UNION ALL
        SELECT l.user_id, l.i, l.event_id, l.ts, l.x,
               CAST(round(0.25 * l.x + 0.75 * r.y, 12) AS DECIMAL(28,12))
        FROM rec r JOIN lastk l ON l.user_id = r.user_id AND l.i = r.i + 1
    )
    SELECT event_id, user_id, ts, CAST(i AS BIGINT) AS i,
           CAST(round(x, 4) AS DOUBLE) AS value,
           CAST(round(y, 6) AS DOUBLE) AS ewma,
           CAST(round(x - y, 6) AS DOUBLE) AS dev
    FROM rec
    """,
    doc=(
        "TS4 exponentially weighted moving average (operators/temporal.py:"
        "ewma): the per-series ORDERED recurrence y_i = alpha*x_i + "
        "(1-alpha)*y_(i-1) that no built-in window function expresses — "
        "computed per user over the trailing 24 purchase events via ONE "
        "applyInPandas shuffle with O(1) state per series. EXACT-DECIMAL "
        "contract: every step quantizes to 12 decimal places half-up in "
        "decimal arithmetic (no binary floats in the recurrence), so the "
        "result is bit-identical under any partitioning AND the oracle "
        "replays the full recurrence as a recursive CTE over DECIMAL — the "
        "iterative smoothing is value-checked exactly, like PageRank and "
        "the ADPCM decoder"
    ),
)
def ts4_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import ewma

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    sm = ewma(ev, key="user_id", value_col="value", order_cols=["ts", "event_id"],
              alpha="0.25", last_k=24)
    return sm.select(
        "event_id", "user_id", "ts",
        F.col("i").cast("long").alias("i"),
        F.round("x", 4).cast("double").alias("value"),
        F.round("y", 6).cast("double").alias("ewma"),
        F.round(F.col("x") - F.col("y"), 6).cast("double").alias("dev"),
    )


@register(
    "ts5_linear_interpolate",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch(CAST(ts AS TIMESTAMP)) AS es, ts, event_id, value
        FROM events WHERE event_type = 'error'
    ), b AS (
        SELECT user_id,
               CAST(floor(es / 3600) * 3600 AS BIGINT) AS bucket_start,
               value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(floor(es / 3600) * 3600 AS BIGINT)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
    ), last_b AS (
        SELECT user_id, bucket_start, value FROM b WHERE rn = 1
    ), rng AS (
        SELECT user_id, min(bucket_start) AS mn, max(bucket_start) AS mx
        FROM last_b GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS bucket_start FROM rng
    ), j AS (
        SELECT g.user_id, g.bucket_start, l.value AS v,
               last_value(l.value IGNORE NULLS) OVER wback AS pv,
               last_value(CASE WHEN l.value IS NOT NULL THEN g.bucket_start END
                          IGNORE NULLS) OVER wback AS pb,
               first_value(l.value IGNORE NULLS) OVER wfwd AS nv,
               first_value(CASE WHEN l.value IS NOT NULL THEN g.bucket_start END
                           IGNORE NULLS) OVER wfwd AS nb
        FROM grid g LEFT JOIN last_b l USING (user_id, bucket_start)
        WINDOW wback AS (PARTITION BY g.user_id ORDER BY g.bucket_start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wfwd AS (PARTITION BY g.user_id ORDER BY g.bucket_start
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket_start,
           floor((CASE WHEN v IS NOT NULL THEN v
                       ELSE pv + ((nv - pv) * (CAST(bucket_start - pb AS DOUBLE) / (nb - pb)))
                  END) * 1000000.0 + 0.5) / 1000000.0 AS value,
           CAST(v IS NULL AS INTEGER) AS is_gap
    FROM j
    """,
    doc=(
        "TS5 hypertable resample with LINEAR interpolation "
        "(operators/temporal.py:resample_linear_interpolate) — TS1's "
        "grid (last-per-bucket max_by with map-side combine, per-key "
        "sequence/explode span) but gaps are interpolated between the "
        "surrounding observed buckets (Timescale interpolate() / "
        "InfluxDB fill(linear) semantics) instead of carried forward. "
        "Neighbor lookups are back/forward window passes over ONE "
        "per-key sort (one Exchange, one Sort, both windows reuse "
        "them); the fill itself is a single IEEE expression over "
        "exact bucket integers, so results are bit-identical under "
        "any partitioning and the oracle replays the same formula"
    ),
)
def ts5_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import resample_linear_interpolate

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    out = resample_linear_interpolate(
        ev, "user_id", "ts", "value", "event_id", step_seconds=3600
    )
    # quantize via floor(x*1e6 + 0.5)/1e6 rather than round(): round()
    # resolves exact half-way doubles differently across engines
    # (Spark: exact BigDecimal HALF_UP; DuckDB: IEEE multiply first) —
    # this formula is the same IEEE op sequence everywhere
    return out.withColumn(
        "value", F.floor(F.col("value") * 1000000.0 + 0.5) / 1000000.0
    )


@register(
    "j9_interval_overlap_join",
    oracle="""
    WITH a AS (
        SELECT event_id AS id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                 + CAST(floor(value * 10) AS BIGINT) AS e
        FROM events WHERE event_type = 'error'
    ), b AS (
        SELECT event_id AS id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                 + CAST(floor(value * 10) AS BIGINT) AS e
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.id AS a_id, b.id AS b_id,
           CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) AS overlap_s
    FROM a JOIN b ON a.s <= b.e AND b.s <= a.e
    """,
    doc=(
        "J9 interval OVERLAP join with no equi key (operators/"
        "temporal.py:interval_overlap_join): error windows x purchase "
        "windows ([ts, ts+10*value] seconds) that overlap in time. "
        "The naive theta-join is a nested loop — O(|a|x|b|), dead at "
        "scale; the operator explodes intervals into 600 s bins, "
        "hash-joins on the bin, verifies the true predicate and "
        "dedups multi-bin pairs, so work follows interval density, "
        "not the cross product (plan-locked: no nested-loop/cartesian "
        "node). Integer-second arithmetic end to end; the oracle IS "
        "the naive theta-join, fine at oracle scale"
    ),
)
def j9_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")

    def intervals(kind: str) -> DataFrame:
        s = F.unix_timestamp(F.col("ts")).cast("long")
        return ev.filter(F.col("event_type") == kind).select(
            F.col("event_id").alias("id"),
            s.alias("s"),
            (s + F.floor(F.col("value") * 10).cast("long")).alias("e"),
        )

    return interval_overlap_join(
        intervals("error"), intervals("purchase"), bin_seconds=600
    )


@register(
    "ts6_rolling_median_iqr",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ), r AS (
        SELECT event_id, user_id, ts, value,
               count(*)                 OVER roll AS roll_n,
               quantile_cont(value, 0.5)  OVER roll AS med,
               quantile_cont(value, 0.25) OVER roll AS q25,
               quantile_cont(value, 0.75) OVER roll AS q75
        FROM p
        WINDOW roll AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts,
           floor(value * 1000000.0 + 0.5) / 1000000.0 AS value,
           CAST(roll_n AS BIGINT) AS roll_n,
           CASE WHEN roll_n >= 10
                THEN floor(med * 1000000.0 + 0.5) / 1000000.0 END AS roll_median,
           CASE WHEN roll_n >= 10
                THEN floor((q75 - q25) * 1000000.0 + 0.5) / 1000000.0 END AS roll_iqr,
           CAST(CASE WHEN roll_n >= 10 AND (q75 - q25) > 0
                     AND value > med + 3.0 * (q75 - q25)
                THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
    FROM r
    """,
    doc=(
        "TS6 rolling-median / IQR robust outlier detection — TS3's "
        "z-score sibling for heavy-tailed telemetry where mean/stddev "
        "are themselves corrupted by the outliers: per-user trailing-"
        "20-event median and interquartile range (current row "
        "EXCLUDED from its own baseline), flag when value > median + "
        "3*IQR with a 10-sample warmup. ONE window pass computes all "
        "three ordered-set aggregates over the same frame (one "
        "Exchange + one Sort; bounded O(frame) state per row). "
        "Spark's percentile() and DuckDB's quantile_cont use the "
        "identical linear-interpolation formula on identical doubles; "
        "boundaries quantized by floor(x*1e6+0.5) (the TS5 half-way "
        "lesson, not round())"
    ),
)
def ts6_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    roll = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-20, -1)
    )
    r = ev.select(
        "event_id", "user_id", "ts", "value",
        F.count(F.lit(1)).over(roll).alias("roll_n"),
        F.percentile("value", F.lit(0.5)).over(roll).alias("med"),
        F.percentile("value", F.lit(0.25)).over(roll).alias("q25"),
        F.percentile("value", F.lit(0.75)).over(roll).alias("q75"),
    )
    n, med, iqr = F.col("roll_n"), F.col("med"), F.col("q75") - F.col("q25")

    def q6(c):
        return F.floor(c * 1000000.0 + 0.5) / 1000000.0

    return r.select(
        "event_id", "user_id", "ts",
        q6(F.col("value")).alias("value"),
        n.cast("long").alias("roll_n"),
        F.when(n >= 10, q6(med)).alias("roll_median"),
        F.when(n >= 10, q6(iqr)).alias("roll_iqr"),
        F.when((n >= 10) & (iqr > 0) & (F.col("value") > med + 3.0 * iqr), 1)
        .otherwise(0).cast("int").alias("is_outlier"),
    )


@register(
    "an3_ab_stat_tests",
    oracle="""
    WITH p AS (
        SELECT user_id % 2 AS grp, CAST(value AS DECIMAL(18,6)) AS v
        FROM events WHERE event_type = 'purchase'
    ), m AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(v) AS DOUBLE) AS s1,
               CAST(SUM(v * v) AS DOUBLE) AS s2
        FROM p GROUP BY grp
    ), ab AS (
        SELECT
            (SELECT n FROM m WHERE grp = 0) AS na,
            (SELECT n FROM m WHERE grp = 1) AS nb,
            (SELECT s1 FROM m WHERE grp = 0) AS s1a,
            (SELECT s2 FROM m WHERE grp = 0) AS s2a,
            (SELECT s1 FROM m WHERE grp = 1) AS s1b,
            (SELECT s2 FROM m WHERE grp = 1) AS s2b
    ), t AS (
        SELECT na, nb,
               s1a / na AS mean_a, s1b / nb AS mean_b,
               (s2a - s1a * s1a / na) / (na - 1) AS var_a,
               (s2b - s1b * s1b / nb) / (nb - 1) AS var_b
        FROM ab
    ), cont AS (
        SELECT event_type, user_id % 2 AS grp, CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, user_id % 2
    ), totals AS (
        SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_t FROM cont GROUP BY event_type
    ), gtot AS (
        SELECT CAST(SUM(o) AS BIGINT) AS g,
               CAST(SUM(CASE WHEN grp = 0 THEN o ELSE 0 END) AS BIGINT) AS col0,
               CAST(SUM(CASE WHEN grp = 1 THEN o ELSE 0 END) AS BIGINT) AS col1
        FROM cont
    ), chi AS (
        SELECT CAST(SUM(CAST(round(
                   (CAST(c.o AS DOUBLE)
                    - (CAST(t2.row_t AS DOUBLE)
                       * CAST(CASE WHEN c.grp = 0 THEN g2.col0 ELSE g2.col1 END AS DOUBLE)
                       / CAST(g2.g AS DOUBLE)))
                   * (CAST(c.o AS DOUBLE)
                      - (CAST(t2.row_t AS DOUBLE)
                         * CAST(CASE WHEN c.grp = 0 THEN g2.col0 ELSE g2.col1 END AS DOUBLE)
                         / CAST(g2.g AS DOUBLE)))
                   / (CAST(t2.row_t AS DOUBLE)
                      * CAST(CASE WHEN c.grp = 0 THEN g2.col0 ELSE g2.col1 END AS DOUBLE)
                      / CAST(g2.g AS DOUBLE)), 9) AS DECIMAL(28,9))) AS DOUBLE) AS chi2,
               CAST(count(*) AS BIGINT) - 2 AS dof_cells
        FROM cont c JOIN totals t2 ON t2.event_type = c.event_type CROSS JOIN gtot g2
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           ROUND(t.mean_a, 6) AS mean_a,
           ROUND(t.mean_b, 6) AS mean_b,
           ROUND((t.mean_a - t.mean_b) / sqrt(t.var_a / t.na + t.var_b / t.nb), 6) AS t_stat,
           ROUND(chi.chi2, 6) AS chi2_stat
    FROM t CROSS JOIN chi
    """,
    doc=(
        "AN3 A/B experiment analysis — Welch's t statistic over purchase "
        "values (groups = user_id parity) and a chi-square independence test "
        "of event_type vs group, both computed DETERMINISTICALLY at cluster "
        "scale: moments are exact DECIMAL sums (one partial-agg pass), the "
        "statistics then use only IEEE +,-,*,/,sqrt on identical scalars "
        "(correctly-rounded in every engine), and the chi-square CELL TERMS "
        "are rounded to 9 dp and summed as DECIMAL so the float-addition "
        "ORDER a shuffle would randomize never touches the result. The same "
        "formulas run verbatim in the oracle"
    ),
)
def an3_ab_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("grp"), F.col("value").cast("decimal(18,6)").alias("v")
    )
    m = p.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("double").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("s2"),
    )
    row = {r["grp"]: r for r in m.collect()}
    na, nb = row[0]["n"], row[1]["n"]
    s1a, s2a, s1b, s2b = row[0]["s1"], row[0]["s2"], row[1]["s1"], row[1]["s2"]
    mean_a, mean_b = s1a / na, s1b / nb
    var_a = (s2a - s1a * s1a / na) / (na - 1)
    var_b = (s2b - s1b * s1b / nb) / (nb - 1)
    import math

    t_stat = (mean_a - mean_b) / math.sqrt(var_a / na + var_b / nb)

    cont = ev.groupBy("event_type", (F.col("user_id") % 2).alias("grp")).agg(
        F.count("*").cast("long").alias("o")
    )
    totals = cont.groupBy("event_type").agg(F.sum("o").cast("long").alias("row_t"))
    g = cont.agg(
        F.sum("o").cast("long").alias("g"),
        F.sum(F.when(F.col("grp") == 0, F.col("o")).otherwise(0)).cast("long").alias("col0"),
        F.sum(F.when(F.col("grp") == 1, F.col("o")).otherwise(0)).cast("long").alias("col1"),
    )
    e = (
        F.col("row_t").cast("double")
        * F.when(F.col("grp") == 0, F.col("col0")).otherwise(F.col("col1")).cast("double")
        / F.col("g").cast("double")
    )
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    chi2 = (
        cont.join(totals, "event_type")
        .crossJoin(F.broadcast(g))
        .agg(F.sum(F.round(term, 9).cast("decimal(28,9)")).cast("double").alias("chi2"))
        .collect()[0]["chi2"]
    )
    return tiny_df(
        spark, [(na, nb)], "n_a long, n_b long"
    ).select(
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        F.round(F.lit(mean_a), 6).alias("mean_a"),
        F.round(F.lit(mean_b), 6).alias("mean_b"),
        F.round(F.lit(t_stat), 6).alias("t_stat"),
        F.round(F.lit(chi2), 6).alias("chi2_stat"),
    )


@register(
    "an5_sequence_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type, event_id,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(ts, 2) OVER w AS ts2,
               lead(event_id, 2) OVER w AS eid2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, event_id AS start_event_id, ts AS start_ts,
           eid2 AS end_event_id,
           CAST(floor(epoch(ts2)) - floor(epoch(ts)) AS BIGINT) AS duration_s
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      AND ts2 <= ts + INTERVAL 30 MINUTE
    """,
    doc=(
        "AN5 event-SEQUENCE pattern matching (MATCH_RECOGNIZE-lite): find "
        "every view -> click -> purchase run of three CONSECUTIVE events in "
        "a user's timeline completing within 30 minutes — ADJACENCY, not "
        "mere presence-ordering (AN1's funnel), so an intervening event "
        "breaks the match. Implemented as a lead() chain over one per-user "
        "window pass: no self-joins, no candidate blowup — at 100 TB the "
        "cost is one shuffle on user_id + a streaming frame scan, identical "
        "to any window query; pattern length generalizes by adding leads. "
        "Same window text runs in the oracle"
    ),
)
def an5_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id", "ts", "event_type", "event_id",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
        F.lead("event_id", 2).over(w).alias("eid2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
            & (F.col("ts2") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            F.col("ts").alias("start_ts"),
            F.col("eid2").alias("end_event_id"),
            (F.unix_timestamp("ts2") - F.unix_timestamp("ts"))
            .cast("long")
            .alias("duration_s"),
        )
    )


@register(
    "dq3_health_monitors",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), bounds AS (
        SELECT min(d) AS mn, max(d) AS mx FROM daily
    ), spine AS (
        SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ), grid AS (
        SELECT s.d, coalesce(dy.n, 0) AS n
        FROM spine s LEFT JOIN daily dy ON dy.d = s.d
    ), w AS (
        SELECT d, n,
               CAST(count(*) OVER roll AS BIGINT) AS roll_n,
               CAST(SUM(n) OVER roll AS BIGINT) AS roll_sum
        FROM grid
        WINDOW roll AS (ORDER BY d ASC ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT d AS day, n AS n_rows,
           ROUND(CASE WHEN roll_n = 7 THEN CAST(roll_sum AS DOUBLE) / 7 END, 4) AS trailing_avg,
           CAST(CASE WHEN roll_n = 7 AND n * 2 < CAST(roll_sum AS DOUBLE) / 7 THEN 1 ELSE 0 END AS INTEGER) AS volume_drop,
           CAST(CASE WHEN n = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_gap,
           CAST((SELECT mx FROM bounds) - d AS BIGINT) AS staleness_days
    FROM w
    """,
    doc=(
        "DQ3 table-health monitors — the pipeline-observability tier "
        "DQ1/DQ2 (row expectations, in-flight metrics) don't cover: a "
        "COMPLETE day spine (sequence + explode, so silent gap days appear "
        "as rows rather than vanishing), per-day volume vs the trailing "
        "7-day mean with a 2x-drop flag (integer-exact: n*2 < sum/7 avoids "
        "float accumulation), gap detection, and per-day staleness against "
        "the freshest partition. One scan + one broadcast-sized spine join "
        "+ one window pass — at 100 TB this reads only partition-level "
        "counts, the day grid stays tiny regardless of data volume"
    ),
)
def dq3_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").cast("long").alias("n"))
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    spine = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d")
    )
    grid = spine.join(daily, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    roll = W.orderBy(F.col("d").asc()).rowsBetween(-7, -1)
    w = grid.select(
        "d", "n",
        F.count(F.lit(1)).over(roll).cast("long").alias("roll_n"),
        F.sum("n").over(roll).cast("long").alias("roll_sum"),
    )
    mx = bounds.collect()[0]["mx"]
    trailing = F.when(F.col("roll_n") == 7, F.col("roll_sum").cast("double") / 7)
    return w.select(
        F.col("d").alias("day"),
        F.col("n").alias("n_rows"),
        F.round(trailing, 4).alias("trailing_avg"),
        F.when(
            (F.col("roll_n") == 7) & (F.col("n") * 2 < F.col("roll_sum").cast("double") / 7), 1
        ).otherwise(0).cast("int").alias("volume_drop"),
        F.when(F.col("n") == 0, 1).otherwise(0).cast("int").alias("is_gap"),
        F.datediff(F.lit(mx), F.col("d")).cast("long").alias("staleness_days"),
    )


@register(
    "j6b_asof_tolerance",
    oracle="""
    SELECT 'backward_tol' AS mode,
           c.event_id, c.user_id, c.ts, ROUND(c.value, 4) AS value,
           e.event_id AS asof_event_id, e.ts AS asof_ts,
           ROUND(e.value, 4) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN LATERAL (
        SELECT event_id, ts, value
        FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id
          AND e.ts <= c.ts
          AND floor(epoch(c.ts)) - floor(epoch(e.ts)) <= 3600
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
    ) e ON TRUE
    UNION ALL
    SELECT 'forward_tol',
           c.event_id, c.user_id, c.ts, ROUND(c.value, 4) AS value,
           e.event_id, e.ts, ROUND(e.value, 4)
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN LATERAL (
        SELECT event_id, ts, value
        FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id
          AND e.ts >= c.ts
          AND floor(epoch(e.ts)) - floor(epoch(c.ts)) <= 3600
        ORDER BY e.ts ASC, e.event_id ASC
        LIMIT 1
    ) e ON TRUE
    """,
    doc=(
        "J6b as-of join with the two production knobs (pandas merge_asof "
        "parity; operators/temporal.py:asof_join_tolerance): TOLERANCE — a "
        "match further than 1 hour from the left row reads as ABSENT, not "
        "as an arbitrarily stale value (the staleness bug point-in-time "
        "enrichment ships without it) — and DIRECTION=forward, the earliest "
        "right row at-or-after the left (min-(ts,id) deterministic winner) "
        "via the time-mirrored window frame. Both knobs ride the same "
        "union+sorted-window shape: one shuffle on the key, no range-join "
        "pair blowup, tolerance is a post-projection null-out. Oracle = "
        "DuckDB LATERAL top-1 per direction with the gap predicate"
    ),
)
def j6b_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import asof_join_tolerance

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("eid"),
        F.col("value").alias("evalue"),
    )
    def shape(df, mode):
        return df.select(
            F.lit(mode).alias("mode"),
            "event_id", "user_id", "ts",
            F.round("value", 4).alias("value"),
            F.col("asof_eid").alias("asof_event_id"),
            F.col("asof_ets").alias("asof_ts"),
            F.round("asof_evalue", 4).alias("asof_value"),
        )

    back = asof_join_tolerance(
        clicks, errors, on=["user_id"], left_ts="ts", right_ts="ets",
        right_tiebreak="eid", tolerance_seconds=3600, direction="backward",
    )
    fwd = asof_join_tolerance(
        clicks, errors, on=["user_id"], left_ts="ts", right_ts="ets",
        right_tiebreak="eid", tolerance_seconds=3600, direction="forward",
    )
    return shape(back, "backward_tol").unionByName(shape(fwd, "forward_tol"))


@register(
    "ts7_interval_coalesce",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 1800 AS e
        FROM events WHERE event_type IN ('view', 'click')
    ), m AS (
        SELECT user_id, event_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
        FROM iv
    ), isl AS (
        SELECT user_id, s, e,
               SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY s, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM m
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(min(s) AS BIGINT) AS island_start,
           CAST(max(e) AS BIGINT) AS island_end,
           CAST(max(e) - min(s) AS BIGINT) AS duration_s,
           CAST(count(*) AS BIGINT) AS n_events
    FROM isl GROUP BY user_id, island
    """,
    doc=(
        "TS7 interval coalescing (gaps-and-islands): merge each user's "
        "overlapping-or-touching 30-minute activity intervals into "
        "maximal islands — the range-consolidation primitive behind "
        "sessionized billing, on-call coverage and CDC window merging. "
        "Single per-key sort feeds BOTH window passes (trailing "
        "max-end, then cumulative island counter — one Exchange, one "
        "Sort) and the final island rollup; all arithmetic is integer "
        "epoch seconds, so island boundaries are bit-deterministic "
        "under any partitioning. Strictly-greater comparison makes "
        "touching intervals merge; ties ordered by (start, event_id)"
    ),
)
def ts7_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    iv = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "user_id", "event_id",
            F.unix_timestamp("ts").alias("s"),
            (F.unix_timestamp("ts") + 1800).alias("e"),
        )
    )
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max = order.rowsBetween(Window.unboundedPreceding, -1)
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = iv.withColumn("prev_max_e", F.max("e").over(prev_max)).withColumn(
        "island",
        F.sum(
            F.when(F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1)
            .otherwise(0)
        ).over(cum),
    )
    return isl.groupBy("user_id", F.col("island").cast("long").alias("island")).agg(
        F.min("s").cast("long").alias("island_start"),
        F.max("e").cast("long").alias("island_end"),
        (F.max("e") - F.min("s")).cast("long").alias("duration_s"),
        F.count("*").cast("long").alias("n_events"),
    )


@register(
    "ts9_autocorrelation",
    oracle="""
    WITH x AS (
        SELECT user_id, CAST(floor(value * 10000 + 0.5) AS BIGINT) AS xs, ts, event_id
        FROM events WHERE event_type = 'purchase'
    ), led AS (
        SELECT user_id, xs,
               lead(xs, 1) OVER w AS y1,
               lead(xs, 2) OVER w AS y2,
               lead(xs, 3) OVER w AS y3
        FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), lagged AS (
        SELECT user_id, 1 AS lag, xs, y1 AS ys FROM led
        UNION ALL SELECT user_id, 2 AS lag, xs, y2 AS ys FROM led
        UNION ALL SELECT user_id, 3 AS lag, xs, y3 AS ys FROM led
    ), s AS (
        SELECT user_id, lag,
               CAST(count(ys) AS BIGINT) AS m,
               CAST(sum(CASE WHEN ys IS NOT NULL THEN xs END) AS DECIMAL(38,0)) AS sx,
               CAST(sum(ys) AS DECIMAL(38,0)) AS sy,
               sum(CAST(CASE WHEN ys IS NOT NULL THEN xs * xs END AS DECIMAL(38,0))) AS sxx,
               sum(CAST(ys * ys AS DECIMAL(38,0))) AS syy,
               sum(CAST(xs * ys AS DECIMAL(38,0))) AS sxy
        FROM lagged GROUP BY user_id, lag
    )
    SELECT user_id, CAST(lag AS INTEGER) AS lag, m AS n_pairs,
           CASE WHEN m >= 8
                     AND m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                     AND m * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN floor((m * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (m * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     * 1000000.0 + 0.5) / 1000000.0
           END AS acf
    FROM s
    """,
    doc=(
        "TS9 lag-k autocorrelation (ACF for k=1..3) per purchase "
        "series — the seasonality/trend diagnostic behind forecasting "
        "feature pipelines. Values quantize to integer 1e4-ticks, all "
        "five moments accumulate as exact DECIMAL(38,0) (order-"
        "insensitive under any partitioning), and the Pearson ratio is "
        "one identical IEEE expression over those exact sums on both "
        "engines; series shorter than 8 overlapping pairs or with zero "
        "variance emit NULL. All three lead(k) columns ride ONE window "
        "over one per-user sort (one Exchange, one Sort), then stack "
        "into (lag, pair) rows — never a per-lag re-sort"
    ),
)
def ts9_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    x = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id",
            F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("xs"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    led = x.select(
        "user_id", "xs",
        F.lead("xs", 1).over(w).alias("y1"),
        F.lead("xs", 2).over(w).alias("y2"),
        F.lead("xs", 3).over(w).alias("y3"),
    )
    lagged = led.selectExpr(
        "user_id", "xs", "stack(3, 1, y1, 2, y2, 3, y3) AS (lag, ys)"
    )
    pair = F.col("ys").isNotNull()
    d38 = "decimal(38,0)"
    s = lagged.groupBy("user_id", "lag").agg(
        F.count("ys").alias("m"),
        F.sum(F.when(pair, F.col("xs"))).cast(d38).alias("sx"),
        F.sum("ys").cast(d38).alias("sy"),
        F.sum(F.when(pair, F.col("xs") * F.col("xs")).cast(d38)).alias("sxx"),
        F.sum((F.col("ys") * F.col("ys")).cast(d38)).alias("syy"),
        F.sum((F.col("xs") * F.col("ys")).cast(d38)).alias("sxy"),
    )
    return s.select(
        "user_id",
        F.col("lag").cast("int").alias("lag"),
        F.col("m").cast("long").alias("n_pairs"),
        F.expr(
            "CASE WHEN m >= 8"
            "          AND m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0"
            "          AND m * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0"
            "     THEN CAST(floor((m * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            "          / sqrt((m * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
            "                 * (m * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
            "          * 1e6 + 0.5) AS DOUBLE) / 1e6 END"
        ).alias("acf"),
    )


@register(
    "pr3_equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT o_totalprice,
               ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(min(o_totalprice) AS DOUBLE), 4) AS lo,
           ROUND(CAST(max(o_totalprice) AS DOUBLE), 4) AS hi
    FROM b GROUP BY bucket
    """,
    doc=(
        "PR3 equi-depth histogram (8 quantile buckets over order "
        "totals) — the optimizer-statistics structure CBO range "
        "estimates ride on; unlike equi-WIDTH bins it bounds per-bucket "
        "row counts regardless of skew. ntile over a total order "
        "(value, key) makes bucket assignment deterministic across "
        "engines even at duplicate boundary values. The global sort is "
        "the honest cost at this output fidelity; the 100 TB path for "
        "approximate depth histograms is the mergeable KLL sketch "
        "already shipped as A7/A7g"
    ),
)
def pr3_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    b = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.ntile(8).over(Window.orderBy("o_totalprice", "o_orderkey")).alias("bucket"),
    )
    return b.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(F.min("o_totalprice").cast("double"), 4).alias("lo"),
        F.round(F.max("o_totalprice").cast("double"), 4).alias("hi"),
    )


@register(
    "a11_hll_distinct",
    oracle="""
    SELECT CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT) AS exact_orders,
           CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS exact_parts,
           CAST((SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT) AS exact_custs,
           CAST(1 AS INTEGER) AS est_orders_ok,
           CAST(1 AS INTEGER) AS est_parts_ok,
           CAST(1 AS INTEGER) AS est_custs_ok
    """,
    doc=(
        "A11 HyperLogLog BUILT FROM SCRATCH (operators/sketches.py:"
        "hll_registers; Flajolet et al. AofA'07): p=12 dense registers "
        "via one map-side-combinable groupBy (bucket = low 12 hash "
        "bits, rho = exact leading-zero run via length(bin()) — no "
        "float log2 off-by-one), harmonic-mean estimate with the "
        "standard linear-counting small-range correction. The shuffle "
        "carries <= 4096 rows per partition regardless of input "
        "cardinality, and registers merge by the same max-groupBy — "
        "the sketch behind every approx_count_distinct, here "
        "re-derived and graded as a measured metric (A10 pattern): "
        "each of three estimates must land within 7 percent (~4 sigma "
        "at m=4096) of the exact count the oracle computes, so a "
        "broken register build or correction branch driver-fails"
    ),
)
def a11_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.sketches import hll_estimate, hll_registers

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    est_o = hll_estimate(hll_registers(li, "l_orderkey"))
    est_p = hll_estimate(hll_registers(li, "l_partkey"))
    est_c = hll_estimate(hll_registers(od, "o_custkey"))

    exact = (
        li.agg(F.countDistinct("l_orderkey").cast("long").alias("exact_orders"),
               F.countDistinct("l_partkey").cast("long").alias("exact_parts"))
        .crossJoin(od.agg(F.countDistinct("o_custkey").cast("long").alias("exact_custs")))
    )

    def ok(est, col):
        return (
            (F.lit(est) >= F.col(col) * 0.93) & (F.lit(est) <= F.col(col) * 1.07)
        ).cast("int")

    return exact.select(
        "exact_orders", "exact_parts", "exact_custs",
        ok(est_o, "exact_orders").alias("est_orders_ok"),
        ok(est_p, "exact_parts").alias("est_parts_ok"),
        ok(est_c, "exact_custs").alias("est_custs_ok"),
    )


_CMS_KEYS = (1, 2, 3, 5, 8, 13)


@register(
    "a12_countmin_freq",
    oracle=f"""
    SELECT l_partkey AS key,
           CAST(count(*) AS BIGINT) AS exact_cnt,
           CAST(1 AS INTEGER) AS lower_ok,
           CAST(1 AS INTEGER) AS upper_ok
    FROM lineitem WHERE l_partkey IN {_CMS_KEYS!r}
    GROUP BY l_partkey
    """,
    doc=(
        "A12 count-min sketch BUILT FROM SCRATCH (operators/sketches."
        "py:cms_build; Cormode & Muthukrishnan J.Alg'05): depth=4 "
        "width=2048 cells via one posexplode + map-side-combinable "
        "groupBy (<= depth*width rows shuffle per partition at ANY key "
        "cardinality; sketches merge by cell sum), point estimates = "
        "min over the 4 seeded-xxhash64 cells, broadcast probe join. "
        "Graded as the CM inequality itself: for each probed key, "
        "est >= exact (structural one-sided error) AND est <= exact + "
        "ceil(e/width * N) (the eps*N bound, holds w.h.p. and "
        "deterministically reproducible under the fixed hash); a "
        "broken cell build violates one side and driver-fails"
    ),
)
def a12_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from datalake_polygonscan_spark.operators.sketches import (
        cms_build,
        cms_point_estimates,
    )

    width = 2048
    li = load_table(spark, sf_dir, "lineitem")
    cms = cms_build(li, "l_partkey", depth=4, width=width)
    keys = tiny_df(spark, [(int(k),) for k in _CMS_KEYS], "l_partkey long")
    est = cms_point_estimates(cms, keys, "l_partkey", depth=4, width=width)
    exact = (
        li.filter(F.col("l_partkey").isin(*_CMS_KEYS))
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count("*").cast("long").alias("exact_cnt"))
    )
    n_rows = li.count()
    slack = int(math.ceil(math.e / width * n_rows))
    return (
        exact.join(est, "key")
        .select(
            "key", "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).cast("int").alias("lower_ok"),
            (F.col("est") <= F.col("exact_cnt") + slack).cast("int").alias("upper_ok"),
        )
    )


@register(
    "geo1_radius_join",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               (c_custkey * 48271) % 100000 AS x,
               (c_custkey * 69621) % 100000 AS y
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               (s_suppkey * 16807) % 100000 AS x,
               (s_suppkey * 39916801) % 100000 AS y
        FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           CAST(floor(sqrt(CAST((c.x - s.x) * (c.x - s.x)
                               + (c.y - s.y) * (c.y - s.y) AS DOUBLE))) AS BIGINT) AS dist_m
    FROM c, s
    WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 3000 * 3000
    """,
    doc=(
        "GEO1 spatial RADIUS join (find all (customer, supplier) pairs "
        "within 3 km on a 100 km planar grid; coordinates derived "
        "deterministically from keys since the test tables carry no "
        "geometry): the Spark side NEVER cross-joins — each point bins "
        "to a radius-sized grid cell, one side explodes its 3x3 "
        "neighborhood, and candidates meet in a plain equi-join on the "
        "cell key (the standard distributed spatial-join decomposition "
        "— candidates per cell are O(density), total work O(n) not "
        "O(n^2) at 100 TB). The distance predicate is EXACT integer "
        "arithmetic and the reported distance floor(sqrt(int)) rides "
        "IEEE-mandated correctly-rounded sqrt, so both engines agree "
        "bit-for-bit. The oracle replays the semantic definition as a "
        "cross-join filter — quadratic there, which is exactly why the "
        "graded plan is the binned one"
    ),
)
def geo1_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    radius = 3000
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 100000).alias("x"),
        ((F.col("c_custkey") * 69621) % 100000).alias("y"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 16807) % 100000).alias("x"),
        ((F.col("s_suppkey") * 39916801) % 100000).alias("y"),
    )
    cb = c.select(
        "c_custkey", F.col("x").alias("cx_m"), F.col("y").alias("cy_m"),
        F.floor(F.col("x") / radius).alias("gx"),
        F.floor(F.col("y") / radius).alias("gy"),
    )
    # supplier side fans out to its 3x3 cell neighborhood so every pair
    # within `radius` shares at least one (gx, gy) candidate cell
    off = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    sb = s.crossJoin(F.broadcast(off)).select(
        "s_suppkey", F.col("x").alias("sx_m"), F.col("y").alias("sy_m"),
        (F.floor(F.col("x") / radius) + F.col("dx")).alias("gx"),
        (F.floor(F.col("y") / radius) + F.col("dy")).alias("gy"),
    )
    d2 = (F.col("cx_m") - F.col("sx_m")) * (F.col("cx_m") - F.col("sx_m")) + (
        F.col("cy_m") - F.col("sy_m")
    ) * (F.col("cy_m") - F.col("sy_m"))
    return (
        cb.join(sb, ["gx", "gy"])
        .filter(d2 <= radius * radius)
        .select(
            "c_custkey", "s_suppkey",
            F.floor(F.sqrt(d2.cast("double"))).cast("long").alias("dist_m"),
        )
    )


@register(
    "er2_jaro_winkler",
    oracle="""
    WITH keyed AS (
        SELECT substr(c_name, 1, length(c_name) - 1) AS block,
               c_custkey AS id, c_name AS name
        FROM customer
    )
    SELECT a.block, a.id AS id_a, b.id AS id_b,
           ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS jw
    FROM keyed a JOIN keyed b ON a.block = b.block AND a.id < b.id
    WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9
    """,
    doc=(
        "ER2 record linkage by FROM-SCRATCH Jaro-Winkler (operators/"
        "linkage.py:jaro_winkler — textbook Winkler '90: greedy "
        "windowed matches, half-credit transpositions, <=4-char prefix "
        "boost above the 0.7 jaro threshold), scored inside the same "
        "blocked shuffle as ER1 via an Arrow-batched pandas UDF (no "
        "JVM builtin exists — the legitimate Python-boundary case). "
        "CROSS-VALIDATED: the oracle scores the identical pairs with "
        "DuckDB's INDEPENDENT C++ jaro_winkler_similarity builtin and "
        "the two implementations must agree bit-for-bit at 6 decimals "
        "on every surviving pair — a genuinely adversarial oracle, "
        "like the media codecs' javax.imageio cross-validation"
    ),
)
def er2_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.linkage import blocked_jw_pairs

    c = load_table(spark, sf_dir, "customer")
    # block on all-but-ONE trailing char: blocking keys must keep
    # blocks near-constant-size (sum b_i^2 is the cost) — the previous
    # 2-char suffix made 100-row blocks, 10x the scored pairs for the
    # same scorer-parity demonstration
    block = F.expr("substr(c_name, 1, length(c_name) - 1)")
    pairs = blocked_jw_pairs(c, "c_custkey", "c_name", block, min_sim=0.9)
    return pairs.select("block", "id_a", "id_b", F.round("jw", 6).alias("jw"))


@register(
    "ts8_cusum_drift",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,6)) AS x,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rdesc
        FROM events WHERE event_type = 'purchase'
    ), lastk AS (
        SELECT event_id, user_id, ts, x,
               row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS i
        FROM base WHERE rdesc <= 24
    ), rec(user_id, i, event_id, ts, x, hi, lo) AS (
        SELECT user_id, i, event_id, ts, x,
               greatest(CAST(0 AS DECIMAL(28,6)), CAST(x - 40 - 10 AS DECIMAL(28,6))),
               greatest(CAST(0 AS DECIMAL(28,6)), CAST(40 - 10 - x AS DECIMAL(28,6)))
        FROM lastk WHERE i = 1
        UNION ALL
        SELECT l.user_id, l.i, l.event_id, l.ts, l.x,
               greatest(CAST(0 AS DECIMAL(28,6)), CAST(r.hi + (l.x - 40 - 10) AS DECIMAL(28,6))),
               greatest(CAST(0 AS DECIMAL(28,6)), CAST(r.lo + (40 - 10 - l.x) AS DECIMAL(28,6)))
        FROM rec r JOIN lastk l ON l.user_id = r.user_id AND l.i = r.i + 1
    )
    SELECT event_id, user_id, ts, CAST(i AS BIGINT) AS i,
           CAST(round(x, 4) AS DOUBLE) AS value,
           CAST(round(hi, 4) AS DOUBLE) AS cusum_hi,
           CAST(round(lo, 4) AS DOUBLE) AS cusum_lo,
           CAST(CASE WHEN hi > 400 OR lo > 400 THEN 1 ELSE 0 END AS INTEGER) AS alarm
    FROM rec
    """,
    doc=(
        "TS8 two-sided CUSUM drift detection (operators/temporal.py:"
        "cusum; Page '54) — the sequential change-point statistic SPC "
        "and telemetry monitors run on every metric stream: "
        "hi_i = max(0, hi_{i-1} + (x - target - slack)), mirrored low "
        "side, alarm above the decision interval h. A data-dependent "
        "ordered recurrence (like EWMA) but with NO multiplication — "
        "pure DECIMAL add/max, exact with no quantization anywhere, "
        "bit-identical on any partitioning; one applyInPandas shuffle, "
        "O(1) state per series, trailing-24 cap bounds the replaying "
        "recursive-CTE oracle's depth"
    ),
)
def ts8_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import cusum

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = cusum(ev, key="user_id", value_col="value", order_cols=["ts", "event_id"],
                target="40", slack="10", threshold="400", last_k=24)
    return out.select(
        "event_id", F.col("_k").alias("user_id"), "ts",
        F.col("i").cast("long").alias("i"),
        F.round("_x", 4).cast("double").alias("value"),
        F.round("hi", 4).cast("double").alias("cusum_hi"),
        F.round("lo", 4).cast("double").alias("cusum_lo"),
        F.col("alarm").cast("int").alias("alarm"),
    )


@register(
    "w5_session_window_batch",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE event_type = 'click'
    ), marked AS (
        SELECT user_id, ts, value,
               CASE WHEN prev_ts IS NULL
                         OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM e
    ), isl AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
    FROM isl GROUP BY user_id, sess
    """,
    doc=(
        "W5 BATCH session windows via Spark's built-in session_window "
        "(dynamic-gap gap-session aggregation in one groupBy — no "
        "window function, no self-join; the same operator the "
        "streaming tier runs in E3, here proven in batch): sessions "
        "close 30 minutes after their LAST event. The oracle replays "
        "the semantics as the classic gaps-and-islands SQL (lag + "
        "cumulative new-session counter), so Spark's native operator "
        "is cross-proved against the hand-derivation — a session "
        "starts exactly when the gap to the previous event reaches "
        "the timeout, window end = last event + gap"
    ),
)
def w5_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


@register(
    "ts10_holt_smoothing",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,6)) AS x,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rdesc
        FROM events WHERE event_type = 'purchase'
    ), lastk AS (
        SELECT event_id, user_id, ts, x,
               row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS i
        FROM base WHERE rdesc <= 24
    ), rec(user_id, i, event_id, ts, x, lev, tr) AS (
        SELECT user_id, i, event_id, ts, x,
               CAST(x AS DECIMAL(28,12)), CAST(0 AS DECIMAL(28,12))
        FROM lastk WHERE i = 1
        UNION ALL
        SELECT l.user_id, l.i, l.event_id, l.ts, l.x,
               CAST(round(0.5 * l.x + 0.5 * (r.lev + r.tr), 12) AS DECIMAL(28,12)),
               CAST(round(0.25 * (CAST(round(0.5 * l.x + 0.5 * (r.lev + r.tr), 12) AS DECIMAL(28,12)) - r.lev)
                          + 0.75 * r.tr, 12) AS DECIMAL(28,12))
        FROM rec r JOIN lastk l ON l.user_id = r.user_id AND l.i = r.i + 1
    )
    SELECT event_id, user_id, ts, CAST(i AS BIGINT) AS i,
           CAST(round(x, 4) AS DOUBLE) AS value,
           CAST(round(lev, 6) AS DOUBLE) AS level,
           CAST(round(tr, 6) AS DOUBLE) AS trend,
           CAST(round(lev + tr, 6) AS DOUBLE) AS forecast
    FROM rec
    """,
    doc=(
        "TS10 Holt double-exponential smoothing (operators/temporal.py:"
        "holt_linear) — EWMA plus a TREND state, the minimal "
        "forecasting recurrence (level/trend coupled updates, "
        "one-step-ahead forecast = level + trend): alpha=0.5 beta=0.25 "
        "over each user's trailing 24 purchases. TWO coupled decimal "
        "states quantized half-up at 12 places per step — the oracle "
        "recursive CTE replays the coupled update verbatim (the level "
        "expression appears inside the trend update exactly as the "
        "operator computes it), so a reordered or float-contaminated "
        "recurrence driver-fails; one applyInPandas shuffle, O(1) "
        "state per series"
    ),
)
def ts10_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import holt_linear

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    out = holt_linear(ev, key="user_id", value_col="value",
                      order_cols=["ts", "event_id"], alpha="0.5", beta="0.25", last_k=24)
    return out.select(
        "event_id", F.col("_k").alias("user_id"), "ts",
        F.col("i").cast("long").alias("i"),
        F.round("_x", 4).cast("double").alias("value"),
        F.round("level", 6).cast("double").alias("level"),
        F.round("trend", 6).cast("double").alias("trend"),
        F.round(F.col("level") + F.col("trend"), 6).cast("double").alias("forecast"),
    )


@register(
    "an6_attribution",
    oracle="""
    WITH conv AS (
        SELECT event_id AS conv_id, user_id, ts AS conv_ts, value AS revenue
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT event_id AS touch_id, user_id, ts AS touch_ts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ), paths AS (
        SELECT c.conv_id, c.revenue, t.touch_id, t.channel,
               row_number() OVER (PARTITION BY c.conv_id
                                  ORDER BY t.touch_ts DESC, t.touch_id DESC) AS rn_last,
               row_number() OVER (PARTITION BY c.conv_id
                                  ORDER BY t.touch_ts ASC, t.touch_id ASC) AS rn_first,
               count(*) OVER (PARTITION BY c.conv_id) AS n_touches
        FROM conv c JOIN touch t
          ON c.user_id = t.user_id
         AND t.touch_ts < c.conv_ts
         AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    ), credits AS (
        SELECT 'first_touch' AS model, channel,
               CAST(floor(revenue * 1000000000.0 + 0.5) AS BIGINT) AS nano
        FROM paths WHERE rn_first = 1
        UNION ALL
        SELECT 'last_touch' AS model, channel,
               CAST(floor(revenue * 1000000000.0 + 0.5) AS BIGINT) AS nano
        FROM paths WHERE rn_last = 1
        UNION ALL
        SELECT 'linear' AS model, channel,
               CAST(floor(revenue / n_touches * 1000000000.0 + 0.5) AS BIGINT) AS nano
        FROM paths
    )
    SELECT model, channel,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(nano) AS DOUBLE) / 1000000000.0 AS credited_revenue
    FROM credits GROUP BY model, channel
    """,
    doc=(
        "AN6 multi-touch marketing attribution — first-touch, "
        "last-touch and linear models over each purchase's trailing "
        "7-day view/click path, the ROAS pipeline every growth team "
        "runs: per-conversion touch paths come from ONE user-key "
        "equi-join bounded by the time window (per-user cardinality, "
        "never cross-join), both endpoint models ride row_number over "
        "the same partition, and every credit quantizes to integer "
        "nano-revenue before the BIGINT sum — fractional linear splits "
        "(revenue/n_touches, one IEEE divide) cannot reorder into "
        "different totals on any partitioning"
    ),
)
def an6_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id",
        F.col("ts").alias("conv_ts"), F.col("value").alias("revenue"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"), "user_id",
        F.col("ts").alias("touch_ts"), F.col("event_type").alias("channel"),
    )
    paths = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("touch_ts") < F.col("conv_ts"))
            & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
        )
    )
    by_conv = Window.partitionBy("conv_id")
    paths = paths.select(
        "conv_id", "revenue", "channel",
        F.row_number().over(by_conv.orderBy(F.col("touch_ts").desc(), F.col("touch_id").desc())).alias("rn_last"),
        F.row_number().over(by_conv.orderBy(F.col("touch_ts").asc(), F.col("touch_id").asc())).alias("rn_first"),
        F.count("*").over(by_conv).alias("n_touches"),
    )
    nano_full = F.floor(F.col("revenue") * 1e9 + 0.5).cast("long")
    nano_lin = F.floor(F.col("revenue") / F.col("n_touches") * 1e9 + 0.5).cast("long")
    credits = (
        paths.filter(F.col("rn_first") == 1).select(F.lit("first_touch").alias("model"), "channel", nano_full.alias("nano"))
        .unionByName(paths.filter(F.col("rn_last") == 1).select(F.lit("last_touch").alias("model"), "channel", nano_full.alias("nano")))
        .unionByName(paths.select(F.lit("linear").alias("model"), "channel", nano_lin.alias("nano")))
    )
    return credits.groupBy("model", "channel").agg(
        F.count("*").cast("long").alias("n_credits"),
        (F.sum("nano").cast("double") / F.lit(1e9)).alias("credited_revenue"),
    )


@register(
    "pr4_correlation_matrix",
    oracle="""
    WITH x AS (
        SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p,
               CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS d
        FROM lineitem
    ), pairs AS (
        SELECT 'quantity~price' AS pair, q AS a, p AS b FROM x
        UNION ALL SELECT 'quantity~discount', q, d FROM x
        UNION ALL SELECT 'price~discount', p, d FROM x
    ), s AS (
        SELECT pair, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a) AS DECIMAL(38,0)) AS sa,
               CAST(sum(b) AS DECIMAL(38,0)) AS sb,
               sum(CAST(a * a AS DECIMAL(38,0))) AS saa,
               sum(CAST(b * b AS DECIMAL(38,0))) AS sbb,
               sum(CAST(a * b AS DECIMAL(38,0))) AS sab
        FROM pairs GROUP BY pair
    )
    SELECT pair, n,
           floor((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * (n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS corr
    FROM s
    """,
    doc=(
        "PR4 pairwise Pearson correlation matrix over the numeric "
        "columns (quantity, price, discount) — the feature-screening "
        "profile every training pipeline computes before model "
        "selection: values quantize to integer ticks, all five moments "
        "per pair accumulate as exact DECIMAL(38,0) in ONE scan (the "
        "three pairs stack before the aggregate, so a single "
        "map-side-combinable groupBy carries the whole matrix), and "
        "the correlation is one identical IEEE expression over exact "
        "sums on both engines — the TS9 determinism contract applied "
        "column-pairwise"
    ),
)
def pr4_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("p"),
        F.floor(F.col("l_discount") * 10000 + 0.5).cast("long").alias("d"),
    )
    pairs = x.selectExpr(
        "stack(3, 'quantity~price', q, p,"
        " 'quantity~discount', q, d,"
        " 'price~discount', p, d) AS (pair, a, b)"
    )
    d38 = "decimal(38,0)"
    s = pairs.groupBy("pair").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast(d38).alias("sa"),
        F.sum("b").cast(d38).alias("sb"),
        F.sum((F.col("a") * F.col("a")).cast(d38)).alias("saa"),
        F.sum((F.col("b") * F.col("b")).cast(d38)).alias("sbb"),
        F.sum((F.col("a") * F.col("b")).cast(d38)).alias("sab"),
    )
    return s.select(
        "pair", "n",
        F.expr(
            "CAST(floor((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
            " / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
            "        * (n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))"
            " * 1e6 + 0.5) AS DOUBLE) / 1e6"
        ).alias("corr"),
    )


_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


@register(
    "geo2_geohash_encode",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               ((c_custkey * 48271) % 100000) * 0.0036 - 180.0 AS lon,
               ((c_custkey * 69621) % 100000) * 0.0018 - 90.0  AS lat
        FROM customer
    ), q AS (
        SELECT c_custkey, lon, lat,
               CAST(least(floor((lon + 180.0) / 360.0 * 8192), 8191) AS BIGINT) AS ix,
               CAST(least(floor((lat + 90.0) / 180.0 * 4096), 4095) AS BIGINT) AS iy
        FROM pts
    ), z AS (
        SELECT c_custkey, lon, lat,
               ({" + ".join(f"(((ix >> {12 - b}) & 1) << {24 - 2 * b}) + (((iy >> {11 - b if b < 12 else 0}) & 1) << {23 - 2 * b})" if b < 12 else f"(((ix >> {12 - b}) & 1) << {24 - 2 * b})" for b in range(13))}) AS g
        FROM q
    )
    SELECT c_custkey,
           floor(lon * 1e4 + 0.5) / 1e4 AS lon,
           floor(lat * 1e4 + 0.5) / 1e4 AS lat,
           concat(
               substr('{_GEOHASH_B32}', CAST((g >> 20) & 31 AS INT) + 1, 1),
               substr('{_GEOHASH_B32}', CAST((g >> 15) & 31 AS INT) + 1, 1),
               substr('{_GEOHASH_B32}', CAST((g >> 10) & 31 AS INT) + 1, 1),
               substr('{_GEOHASH_B32}', CAST((g >> 5) & 31 AS INT) + 1, 1),
               substr('{_GEOHASH_B32}', CAST(g & 31 AS INT) + 1, 1)
           ) AS geohash
    FROM z
    """,
    doc=(
        "GEO2 geohash encoding from scratch (Niemeyer '08) — the "
        "prefix-searchable spatial key every geo index shards on: "
        "lon/lat (key-derived, the tables carry no geometry) quantize "
        "to 13+12 bisection bits, interleave lon-first into a 25-bit "
        "curve value by pure shift/mask/add codegen (no UDF — same "
        "device as the Z-order clustering), then map 5-bit groups "
        "through the base32 alphabet. Every step is exact integer "
        "arithmetic replayed verbatim by the oracle, so a single "
        "off-by-one in any of the 25 bit positions flips a character "
        "and hash-fails. Standard 5-char precision (~4.9 km cells) — "
        "rows sharing a prefix are spatial neighbors, the property "
        "GEO1's explicit grid join exploits"
    ),
)
def geo2_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 48271) % 100000) * 0.0036 - 180.0).alias("lon"),
        (((F.col("c_custkey") * 69621) % 100000) * 0.0018 - 90.0).alias("lat"),
    )
    q = pts.select(
        "c_custkey", "lon", "lat",
        F.least(F.floor((F.col("lon") + 180.0) / 360.0 * 8192), F.lit(8191)).cast("long").alias("ix"),
        F.least(F.floor((F.col("lat") + 90.0) / 180.0 * 4096), F.lit(4095)).cast("long").alias("iy"),
    )
    g = F.lit(0).cast("long")
    for b in range(13):
        g = g + F.shiftleft(F.shiftright("ix", 12 - b).bitwiseAND(F.lit(1)), 24 - 2 * b)
        if b < 12:
            g = g + F.shiftleft(F.shiftright("iy", 11 - b).bitwiseAND(F.lit(1)), 23 - 2 * b)
    z = q.select("c_custkey", "lon", "lat", g.alias("g"))
    alpha = F.lit(_GEOHASH_B32)
    chars = [
        F.substring(alpha, 1, 32).substr(
            (F.shiftright("g", sh).bitwiseAND(F.lit(31)) + 1).cast("int"), F.lit(1)
        )
        for sh in (20, 15, 10, 5, 0)
    ]
    return z.select(
        "c_custkey",
        (F.floor(F.col("lon") * 1e4 + 0.5) / 1e4).alias("lon"),
        (F.floor(F.col("lat") * 1e4 + 0.5) / 1e4).alias("lat"),
        F.concat(*chars).alias("geohash"),
    )


@register(
    "an7_rfm_segmentation",
    oracle="""
    WITH mx AS (
        SELECT max(ts) AS now_ts FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT user_id,
               CAST(floor(date_diff('second', max(ts), (SELECT now_ts FROM mx)) / 86400) AS BIGINT) AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), scored AS (
        SELECT user_id, recency_days, frequency, monetary,
               5 - ntile(4) OVER (ORDER BY recency_days, user_id) AS r_score,
               ntile(4) OVER (ORDER BY frequency, user_id)  AS f_score,
               ntile(4) OVER (ORDER BY monetary, user_id)   AS m_score
        FROM per_user
    )
    SELECT user_id, recency_days, frequency, monetary,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CASE WHEN r_score = 4 AND f_score = 4 THEN 'champion'
                WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
                WHEN r_score <= 1 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 1 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored
    """,
    doc=(
        "AN7 RFM customer segmentation — the recency/frequency/"
        "monetary quartile model behind retention marketing: one "
        "groupBy builds the per-user profile (exact-decimal monetary "
        "sum), three ntile(4) windows score the quartiles over "
        "deterministic (value, user_id) total orders (recency "
        "inverted: most recent = best), and the classic "
        "champion/loyal/at_risk/hibernating bands fall out of a CASE. "
        "Recency is measured against the corpus max timestamp so the "
        "entry is reproducible (no wall clock); identical formula both "
        "engines, integer day arithmetic"
    ),
)
def an7_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = p.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").cast("long").alias("frequency"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("monetary"),
    ).crossJoin(F.broadcast(p.agg(F.max("ts").alias("now_ts"))))
    per_user = per_user.select(
        "user_id",
        F.floor(
            (F.unix_timestamp("now_ts") - F.unix_timestamp("last_ts")) / 86400
        ).cast("long").alias("recency_days"),
        "frequency", "monetary",
    )
    scored = per_user.select(
        "*",
        (5 - F.ntile(4).over(Window.orderBy("recency_days", "user_id"))).alias("r_score"),
        F.ntile(4).over(Window.orderBy("frequency", "user_id")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary", "user_id")).alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") == 4) & (F.col("f_score") == 4), "champion")
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 1) & (F.col("f_score") >= 3), "at_risk")
        .when((F.col("r_score") <= 1) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return scored.select(
        "user_id", "recency_days", "frequency", "monetary",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        seg.alias("segment"),
    )


@register(
    "ts11_seasonal_profile",
    oracle="""
    WITH x AS (
        SELECT CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour_of_day,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), hourly AS (
        SELECT hour_of_day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS DECIMAL(38,0)) AS sv
        FROM x GROUP BY hour_of_day
    ), total AS (
        SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sv) AS DECIMAL(38,0)) AS tsv
        FROM hourly
    )
    SELECT hour_of_day, n,
           floor(CAST(sv AS DOUBLE) / n / 10000.0 * 1e6 + 0.5) / 1e6 AS hourly_mean,
           floor((CAST(sv AS DOUBLE) / n) / (CAST(tsv AS DOUBLE) / tn) * 1e6 + 0.5) / 1e6
               AS seasonal_index
    FROM hourly CROSS JOIN total
    """,
    doc=(
        "TS11 seasonal profile (multiplicative hour-of-day "
        "decomposition — the load-shaping/forecast-baseline primitive): "
        "seasonal index = hourly mean / global mean over purchase "
        "values. Values quantize to integer ticks and both means come "
        "from exact DECIMAL(38,0) sums, so the two divisions and one "
        "ratio are the same IEEE ops on both engines; one map-side "
        "combinable groupBy + a broadcast 1-row total — no second "
        "scan, no window"
    ),
)
def ts11_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.hour("ts").cast("int").alias("hour_of_day"),
            F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("v"),
        )
    )
    hourly = x.groupBy("hour_of_day").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("decimal(38,0)").alias("sv"),
    )
    total = hourly.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("sv").cast("decimal(38,0)").alias("tsv"),
    )
    return hourly.crossJoin(F.broadcast(total)).select(
        "hour_of_day", "n",
        (F.floor(F.col("sv").cast("double") / F.col("n") / 10000.0 * 1e6 + 0.5) / 1e6)
        .alias("hourly_mean"),
        (
            F.floor(
                (F.col("sv").cast("double") / F.col("n"))
                / (F.col("tsv").cast("double") / F.col("tn"))
                * 1e6 + 0.5
            ) / 1e6
        ).alias("seasonal_index"),
    )


@register(
    "an8_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               lead(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ) AS dst
        FROM events
    ), trans AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n_trans
        FROM seq WHERE dst IS NOT NULL
        GROUP BY src, dst
    )
    SELECT src, dst, n_trans,
           CAST(sum(n_trans) OVER (PARTITION BY src) AS BIGINT) AS n_src,
           floor(CAST(n_trans AS DOUBLE)
                 / CAST(sum(n_trans) OVER (PARTITION BY src) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS p
    FROM trans
    """,
    doc=(
        "AN8 first-order Markov transition matrix over per-user event "
        "timelines — the behavioral model behind next-action "
        "prediction and anomalous-session scoring: adjacent "
        "(src, dst) event pairs via one lead() over the (ts, event_id) "
        "total order, exact BIGINT transition counts, row-transition "
        "probability normalized by an exact windowed source total "
        "(|states|^2 rows, so the second window is noise). At 100 TB: "
        "one shuffle on user_id for the lead, one combinable groupBy "
        "on (src,dst) — the matrix itself never exceeds |states|^2 "
        "rows regardless of data size. Same text runs in the oracle"
    ),
)
def an8_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    trans = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type", 1).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n_trans"))
    )
    per_src = W.partitionBy("src")
    n_src = F.sum("n_trans").over(per_src).cast("long")
    return trans.select(
        "src", "dst", "n_trans",
        n_src.alias("n_src"),
        (
            F.floor(
                F.col("n_trans").cast("double") / n_src.cast("double") * 1e6 + 0.5
            ) / 1e6
        ).alias("p"),
    )


#: GEO3 polygon rings: (zone_id, zone, [(x, y), ...]) — integer planar
#: vertices on GEO1's 100 km grid; zones 1 and 3 are CONCAVE so the
#: even-odd crossing parity actually matters (a bounding-box or convex
#: test would misclassify points in the notch).
_GEO3_POLYGONS: list[tuple[int, str, list[tuple[int, int]]]] = [
    (1, "delta", [(10000, 10000), (45000, 10000), (45000, 25000),
                  (25000, 25000), (25000, 45000), (10000, 45000)]),
    (2, "mesa", [(55000, 55000), (90000, 60000), (85000, 90000),
                 (65000, 95000), (50000, 75000)]),
    (3, "wedge", [(60000, 5000), (95000, 20000), (60000, 35000),
                  (75000, 20000)]),
]


def _geo3_edges_sql() -> str:
    rows = []
    for zone_id, zone, ring in _GEO3_POLYGONS:
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            rows.append(f"({zone_id}, '{zone}', {x1}, {y1}, {x2}, {y2})")
    return ",\n               ".join(rows)


@register(
    "geo3_point_in_polygon",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey * 48271) % 100000 AS px,
               (c_custkey * 69621) % 100000 AS py
        FROM customer
    ), edges(zone_id, zone, x1, y1, x2, y2) AS (
        VALUES {_geo3_edges_sql()}
    ), hits AS (
        SELECT p.c_custkey, p.px, p.py, e.zone_id, e.zone,
               CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                         AND (((p.py - e.y1) * (e.x2 - e.x1)
                               - (p.px - e.x1) * (e.y2 - e.y1) > 0)
                              = (e.y2 > e.y1))
                    THEN 1 ELSE 0 END AS crossing
        FROM pts p CROSS JOIN edges e
    )
    SELECT c_custkey, zone_id, zone,
           CAST(px AS BIGINT) AS x, CAST(py AS BIGINT) AS y,
           CAST(sum(crossing) AS BIGINT) AS crossings
    FROM hits
    GROUP BY c_custkey, zone_id, zone, px, py
    HAVING sum(crossing) % 2 = 1
    """,
    doc=(
        "GEO3 point-in-polygon via even-odd ray casting — the "
        "geofencing primitive (which delivery zone / tax region / "
        "coverage cell contains this point): customers take GEO1's "
        "deterministic planar coordinates, three literal polygon "
        "rings (two CONCAVE, so crossing parity is load-bearing) "
        "broadcast as an edge table, and each (point, edge) pair "
        "evaluates the EXACT-integer crossing test — the px < "
        "x-intersect comparison cross-multiplied so no division ever "
        "happens: ((py-y1)(x2-x1) - (px-x1)(y2-y1) > 0) == (y2 > y1). "
        "Inside = odd crossing count per (point, ring). At 100 TB "
        "this is a broadcast nested-loop against a ~15-row edge "
        "table then one combinable groupBy — O(n·edges), no shuffle "
        "of the points beyond the agg; a real geo index would bin "
        "rings to cells first (GEO1's decomposition composes). The "
        "oracle replays the identical integer arithmetic"
    ),
)
def geo3_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 100000).alias("px"),
        ((F.col("c_custkey") * 69621) % 100000).alias("py"),
    )
    edge_rows = []
    for zone_id, zone, ring in _GEO3_POLYGONS:
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            edge_rows.append((zone_id, zone, x1, y1, x2, y2))
    edges = tiny_df(
        spark, edge_rows, "zone_id int, zone string, x1 long, y1 long, x2 long, y2 long"
    )
    crossing = (
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & (
            (
                (F.col("py") - F.col("y1")) * (F.col("x2") - F.col("x1"))
                - (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
                > 0
            )
            == (F.col("y2") > F.col("y1"))
        )
    ).cast("int")
    return (
        pts.crossJoin(F.broadcast(edges))
        .select("c_custkey", "px", "py", "zone_id", "zone", crossing.alias("crossing"))
        .groupBy("c_custkey", "zone_id", "zone", "px", "py")
        .agg(F.sum("crossing").cast("long").alias("crossings"))
        .filter(F.col("crossings") % 2 == 1)
        .select(
            "c_custkey", "zone_id", "zone",
            F.col("px").cast("long").alias("x"),
            F.col("py").cast("long").alias("y"),
            "crossings",
        )
    )


@register(
    "ts12_m4_downsample",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS xs,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS yt,
               event_id
        FROM events
    ), bp AS (
        SELECT event_type, CAST(floor(xs / 3600) AS BIGINT) AS bkt,
               xs, yt, event_id
        FROM pts
    ), b AS (
        SELECT event_type, bkt,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xs) AS DECIMAL(38,0)) AS sx,
               CAST(sum(yt) AS DECIMAL(38,0)) AS sy
        FROM bp GROUP BY event_type, bkt
    ), nb AS (
        SELECT event_type, bkt, n,
               lag(n)  OVER w AS np, lag(sx) OVER w AS sxp, lag(sy) OVER w AS syp,
               lead(n) OVER w AS nn, lead(sx) OVER w AS sxn, lead(sy) OVER w AS syn
        FROM b
        WINDOW w AS (PARTITION BY event_type ORDER BY bkt ASC)
    ), m4 AS (
        SELECT event_type, bkt, xs, yt, event_id,
               row_number() OVER (PARTITION BY event_type, bkt
                                  ORDER BY xs ASC, event_id ASC) AS rn_first,
               row_number() OVER (PARTITION BY event_type, bkt
                                  ORDER BY xs DESC, event_id DESC) AS rn_last,
               row_number() OVER (PARTITION BY event_type, bkt
                                  ORDER BY yt ASC, event_id ASC) AS rn_min,
               row_number() OVER (PARTITION BY event_type, bkt
                                  ORDER BY yt DESC, event_id ASC) AS rn_max
        FROM bp
    ), lt AS (
        SELECT p.event_type, p.bkt, p.xs, p.yt, p.event_id,
               row_number() OVER (
                   PARTITION BY p.event_type, p.bkt
                   ORDER BY abs(  n2.sxp * (CAST(p.yt AS DECIMAL(38,0)) * n2.nn - n2.syn)
                                + CAST(p.xs AS DECIMAL(38,0))
                                      * (n2.syn * n2.np - n2.syp * n2.nn)
                                + n2.sxn * (n2.syp - CAST(p.yt AS DECIMAL(38,0)) * n2.np)
                               ) DESC, p.event_id ASC
               ) AS rn_lt
        FROM bp p JOIN nb n2 ON n2.event_type = p.event_type AND n2.bkt = p.bkt
        WHERE n2.np IS NOT NULL AND n2.nn IS NOT NULL
    ), roles AS (
        SELECT event_type, bkt, 1 AS role_id, 'first' AS role, event_id, xs, yt
        FROM m4 WHERE rn_first = 1
        UNION ALL
        SELECT event_type, bkt, 2, 'last', event_id, xs, yt FROM m4 WHERE rn_last = 1
        UNION ALL
        SELECT event_type, bkt, 3, 'vmin', event_id, xs, yt FROM m4 WHERE rn_min = 1
        UNION ALL
        SELECT event_type, bkt, 4, 'vmax', event_id, xs, yt FROM m4 WHERE rn_max = 1
        UNION ALL
        SELECT event_type, bkt, 5, 'lt', event_id, xs, yt FROM lt WHERE rn_lt = 1
    )
    SELECT r.event_type, r.bkt, r.role_id, r.role, r.event_id, r.xs, r.yt, b.n
    FROM roles r JOIN b ON b.event_type = r.event_type AND b.bkt = r.bkt
    """,
    doc=(
        "TS12 visualization-oriented downsampling: M4 (Jugel et al., "
        "VLDB'14 — per fixed time bucket keep first/last/min/max, the "
        "lossless envelope for line rendering) + the largest-triangle "
        "representative (Steinarsson's LTTB selection rule with "
        "prev/next BUCKET-CENTROID anchors, which removes LTTB's "
        "sequential dependency so the whole operator is one shuffle). "
        "All selections are deterministic row_number totals orders; "
        "the triangle area comparison is EXACT — multiplied through "
        "by np*nn so the centroid rationals never divide, DECIMAL"
        "(38,0) terms bounded ~1e21 at 1e4 rows/bucket. At 100 TB: "
        "one (event_type,bkt) hash shuffle, window passes + a "
        "bucket-level lag/lead join — no per-point Python. The "
        "oracle replays bucketing, all four M4 orders AND the exact "
        "area argmax verbatim"
    ),
)
def ts12_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    bp = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("xs"),
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("yt"),
        "event_id",
    ).withColumn("bkt", F.floor(F.col("xs") / 3600).cast("long"))
    b = bp.groupBy("event_type", "bkt").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xs").cast(dec).alias("sx"),
        F.sum("yt").cast(dec).alias("sy"),
    )
    wb = W.partitionBy("event_type").orderBy(F.col("bkt").asc())
    nb = b.select(
        "event_type", "bkt", "n",
        F.lag("n").over(wb).alias("np"), F.lag("sx").over(wb).alias("sxp"),
        F.lag("sy").over(wb).alias("syp"),
        F.lead("n").over(wb).alias("nn"), F.lead("sx").over(wb).alias("sxn"),
        F.lead("sy").over(wb).alias("syn"),
    )
    pb = W.partitionBy("event_type", "bkt")
    m4 = bp.select(
        "event_type", "bkt", "xs", "yt", "event_id",
        F.row_number().over(pb.orderBy(F.col("xs").asc(), F.col("event_id").asc())).alias("rn_first"),
        F.row_number().over(pb.orderBy(F.col("xs").desc(), F.col("event_id").desc())).alias("rn_last"),
        F.row_number().over(pb.orderBy(F.col("yt").asc(), F.col("event_id").asc())).alias("rn_min"),
        F.row_number().over(pb.orderBy(F.col("yt").desc(), F.col("event_id").asc())).alias("rn_max"),
    )
    area = F.abs(
        F.col("sxp") * (F.col("yt").cast(dec) * F.col("nn") - F.col("syn"))
        + F.col("xs").cast(dec) * (F.col("syn") * F.col("np") - F.col("syp") * F.col("nn"))
        + F.col("sxn") * (F.col("syp") - F.col("yt").cast(dec) * F.col("np"))
    )
    lt = (
        bp.join(nb, ["event_type", "bkt"])
        .filter(F.col("np").isNotNull() & F.col("nn").isNotNull())
        .withColumn(
            "rn_lt",
            F.row_number().over(pb.orderBy(area.desc(), F.col("event_id").asc())),
        )
    )
    def role(df, rn, role_id, name):
        return df.filter(F.col(rn) == 1).select(
            "event_type", "bkt",
            F.lit(role_id).alias("role_id"), F.lit(name).alias("role"),
            "event_id", "xs", "yt",
        )
    roles = (
        role(m4, "rn_first", 1, "first")
        .unionByName(role(m4, "rn_last", 2, "last"))
        .unionByName(role(m4, "rn_min", 3, "vmin"))
        .unionByName(role(m4, "rn_max", 4, "vmax"))
        .unionByName(role(lt, "rn_lt", 5, "lt"))
    )
    return roles.join(b.select("event_type", "bkt", "n"), ["event_type", "bkt"]).select(
        "event_type", "bkt", "role_id", "role", "event_id", "xs", "yt", "n"
    )


@register(
    "pr5_drift_monitor",
    oracle="""
    WITH tagged AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                    THEN 'base' ELSE 'cur' END AS era,
               o_orderpriority AS cat_p,
               'b' || CAST(least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9)
                           AS VARCHAR) AS cat_b
        FROM orders
    ), stacked AS (
        SELECT era, 'priority' AS col_name, cat_p AS category FROM tagged
        UNION ALL
        SELECT era, 'price_bucket', cat_b FROM tagged
    ), cnt AS (
        SELECT col_name, category,
               CAST(sum(CASE WHEN era = 'base' THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS nb,
               CAST(sum(CASE WHEN era = 'cur' THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS nc
        FROM stacked GROUP BY col_name, category
    ), tot AS (
        SELECT col_name, category, nb, nc,
               CAST(sum(nb) OVER (PARTITION BY col_name) AS DECIMAL(38,0)) AS tb,
               CAST(sum(nc) OVER (PARTITION BY col_name) AS DECIMAL(38,0)) AS tc
        FROM cnt
    )
    SELECT col_name, category,
           CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
           floor(CAST(abs(nb * tc - nc * tb) AS DOUBLE)
                 / CAST(2 * tb * tc AS DOUBLE) * 1e6 + 0.5) / 1e6 AS tvd_comp,
           CASE WHEN nb = 0 THEN CAST(NULL AS DOUBLE)
                ELSE floor(CAST((nc * tb - nb * tc) * (nc * tb - nb * tc) AS DOUBLE)
                           / CAST(nb * tc * tb AS DOUBLE) * 1e6 + 0.5) / 1e6
           END AS chi2_comp
    FROM tot
    """,
    doc=(
        "PR5 distribution-DRIFT monitor between table eras (the "
        "pre-retrain check of every production ML pipeline): orders "
        "split at 1998-01-01 into base/current, two stacked "
        "categorical views (priority, price bucket) profiled in ONE "
        "scan; per-category total-variation and chi-square "
        "components from EXACT DECIMAL cross-products (|nb·tc − "
        "nc·tb| never divides until the single per-row IEEE division "
        "at the output boundary, so engine-order float accumulation "
        "can't diverge — the an3/pr4 moment discipline). At 100 TB: "
        "one combinable groupBy over |categories| cells + a window "
        "over the tiny profile — the drift table is O(categories) "
        "regardless of data size. Same text in the oracle"
    ),
)
def pr5_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    o = load_table(spark, sf_dir, "orders")
    tagged = o.select(
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"),
            F.lit("base"),
        ).otherwise(F.lit("cur")).alias("era"),
        F.col("o_orderpriority").alias("cat_p"),
        F.concat(
            F.lit("b"),
            F.least(F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(9)).cast("string"),
        ).alias("cat_b"),
    )
    # stack via explode-of-structs, NOT a self-union: the union form
    # scans orders once per profiled column; this is one scan total
    stacked = tagged.select(
        "era",
        F.explode(
            F.array(
                F.struct(
                    F.lit("priority").alias("col_name"), F.col("cat_p").alias("category")
                ),
                F.struct(
                    F.lit("price_bucket").alias("col_name"), F.col("cat_b").alias("category")
                ),
            )
        ).alias("x"),
    ).select("era", F.col("x.col_name").alias("col_name"), F.col("x.category").alias("category"))
    cnt = stacked.groupBy("col_name", "category").agg(
        F.sum(F.when(F.col("era") == "base", 1).otherwise(0)).cast(dec).alias("nb"),
        F.sum(F.when(F.col("era") == "cur", 1).otherwise(0)).cast(dec).alias("nc"),
    )
    wcol = W.partitionBy("col_name")
    tot = cnt.select(
        "col_name", "category", "nb", "nc",
        F.sum("nb").over(wcol).cast(dec).alias("tb"),
        F.sum("nc").over(wcol).cast(dec).alias("tc"),
    )
    cross = F.col("nc") * F.col("tb") - F.col("nb") * F.col("tc")
    return tot.select(
        "col_name", "category",
        F.col("nb").cast("long").alias("n_base"),
        F.col("nc").cast("long").alias("n_cur"),
        (
            F.floor(
                F.abs(F.col("nb") * F.col("tc") - F.col("nc") * F.col("tb")).cast("double")
                / (F.lit(2).cast(dec) * F.col("tb") * F.col("tc")).cast("double")
                * 1e6 + 0.5
            ) / 1e6
        ).alias("tvd_comp"),
        F.when(F.col("nb") == 0, F.lit(None).cast("double")).otherwise(
            F.floor(
                (cross * cross).cast("double")
                / (F.col("nb") * F.col("tc") * F.col("tb")).cast("double")
                * 1e6 + 0.5
            ) / 1e6
        ).alias("chi2_comp"),
    )


@register(
    "a13_exact_mode",
    oracle="""
    WITH cnt AS (
        SELECT l_returnflag, l_linestatus,
               CAST(floor(l_quantity / 10) AS BIGINT) AS qty_band,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus, floor(l_quantity / 10)
    ), ranked AS (
        SELECT l_returnflag, l_linestatus, qty_band, n,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY n DESC, l_linestatus ASC, qty_band ASC
               ) AS rnk
        FROM cnt
    )
    SELECT l_returnflag, l_linestatus AS modal_status,
           qty_band AS modal_qty_band, n AS modal_count
    FROM ranked WHERE rnk = 1
    """,
    doc=(
        "A13 exact grouped MODE — the most-frequent-value statistic "
        "(imputation defaults, category baselines) that Spark has no "
        "builtin for: count per (group, value) with one combinable "
        "groupBy, then a deterministic row_number argmax (count desc, "
        "value asc — 'whichever came first' is not an answer) over "
        "the tiny count table. Two shuffles total, the second over "
        "O(|groups| x |values|) rows; same text in the oracle"
    ),
)
def a13_exact_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cnt = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag", "l_linestatus",
            F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_band"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    rnk = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy(
            F.col("n").desc(), F.col("l_linestatus").asc(), F.col("qty_band").asc()
        )
    )
    return (
        cnt.withColumn("rnk", rnk)
        .filter(F.col("rnk") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("modal_status"),
            F.col("qty_band").alias("modal_qty_band"),
            F.col("n").alias("modal_count"),
        )
    )


@register(
    "dq4_quarantine_flow",
    oracle="""
    WITH src AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN event_id % 13 = 0 THEN -value ELSE value END AS value,
               CASE WHEN event_id % 17 = 0 THEN NULL ELSE user_id END AS uid
        FROM events
    ), tagged AS (
        SELECT *,
               CASE WHEN uid IS NULL THEN 'null_user'
                    WHEN value <= 0 THEN 'non_positive_value'
               END AS reason
        FROM src
    )
    SELECT 'good' AS mode, event_type AS grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value,
           TRUE AS partition_complete, TRUE AS atomic_pair
    FROM tagged WHERE reason IS NULL GROUP BY event_type
    UNION ALL
    SELECT 'quarantine', reason,
           CAST(count(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4),
           TRUE, TRUE
    FROM tagged WHERE reason IS NOT NULL GROUP BY reason
    """,
    doc=(
        "DQ4 atomic QUARANTINE flow (the dead-letter pattern every "
        "ingest pipeline needs): a batch with injected defects "
        "(negated values for id%13, null users for id%17) splits "
        "against the DQ1-style expectation set — passing rows to the "
        "good table, failing rows to a quarantine table WITH their "
        "first-failed-reason column — and BOTH tables commit through "
        "one S30 multi-table transaction, so no reader can see the "
        "cleaned table without its quarantine ledger (audit "
        "completeness). partition_complete (good + quarantined == "
        "input, nothing dropped or double-counted) and atomic_pair "
        "(both tables advanced exactly one version with the same "
        "txn id) ride the hash. One scan, two filter branches, "
        "O(batch) staging; the oracle replays the split in closed "
        "form"
    ),
)
def dq4_quarantine_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from datalake_polygonscan_spark.io.sinks import history, read_table
    from datalake_polygonscan_spark.queries.sources_sinks import _dbl_sum, _scratch
    from datalake_polygonscan_spark.io.txn import txn_commit

    ev = load_table(spark, sf_dir, "events")
    root = _scratch("dq4_quarantine", "x")
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    t_good = _scratch("dq4_quarantine", "events_good")
    t_quar = _scratch("dq4_quarantine", "events_quarantine")

    src = ev.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 13 == 0, -F.col("value"))
        .otherwise(F.col("value")).alias("value"),
        F.when(F.col("event_id") % 17 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id")).alias("uid"),
    )
    reason = (
        F.when(F.col("uid").isNull(), F.lit("null_user"))
        .when(F.col("value") <= 0, F.lit("non_positive_value"))
    )
    tagged = src.withColumn("reason", reason)
    good = tagged.filter(F.col("reason").isNull()).drop("reason")
    quarantine = tagged.filter(F.col("reason").isNotNull())
    txn_root = _scratch("dq4_quarantine", "_txn")
    txn_commit(spark, txn_root, [(t_good, good), (t_quar, quarantine)])

    g = read_table(spark, t_good)
    q = read_table(spark, t_quar)
    n_in = ev.count()
    n_g, n_q = g.count(), q.count()
    hg, hq = history(t_good), history(t_quar)
    atomic_pair = (
        len(hg) == 1 and len(hq) == 1
        and hg[0].get("txn_id") == hq[0].get("txn_id")
        and hg[0].get("txn_id") is not None
    )
    flags = {
        "partition_complete": F.lit(n_g + n_q == n_in),
        "atomic_pair": F.lit(bool(atomic_pair)),
    }
    out_g = g.groupBy(F.col("event_type").alias("grp")).agg(
        F.count("*").cast("long").alias("n_rows"), _dbl_sum("value", "sum_value")
    ).select(F.lit("good").alias("mode"), "grp", "n_rows", "sum_value",
             *[v.alias(k) for k, v in flags.items()])
    out_q = q.groupBy(F.col("reason").alias("grp")).agg(
        F.count("*").cast("long").alias("n_rows"), _dbl_sum("value", "sum_value")
    ).select(F.lit("quarantine").alias("mode"), "grp", "n_rows", "sum_value",
             *[v.alias(k) for k, v in flags.items()])
    return out_g.unionByName(out_q)


@register(
    "geo4_trajectory_stats",
    oracle="""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               (event_id * 48271) % 100000 AS x,
               (event_id * 69621) % 100000 AS y
        FROM events
    ), hops AS (
        SELECT user_id,
               x - lag(x) OVER w AS dx,
               y - lag(y) OVER w AS dy
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), d AS (
        SELECT user_id,
               CAST(floor(sqrt(CAST(dx * dx + dy * dy AS DOUBLE))) AS BIGINT) AS hop_m
        FROM hops WHERE dx IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_hops,
           CAST(sum(hop_m) AS BIGINT) AS path_m,
           CAST(max(hop_m) AS BIGINT) AS longest_hop_m,
           CAST(sum(CASE WHEN hop_m > 50000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_jumps
    FROM d GROUP BY user_id
    """,
    doc=(
        "GEO4 trajectory statistics per moving entity — the "
        "fleet/telemetry primitive (distance travelled, longest leg, "
        "implausible-jump count for GPS-glitch detection): event "
        "positions derive deterministically from ids on GEO1's planar "
        "grid, consecutive-hop vectors come from one lag() pass over "
        "the (ts, event_id) total order, and each hop length is "
        "floor(sqrt(exact-integer d2)) — IEEE-mandated correctly-"
        "rounded sqrt of an exactly-representable integer, so both "
        "engines agree bit-for-bit and the BIGINT path sums are "
        "order-insensitive. One user_id shuffle + one combinable "
        "groupBy; O(1) state per hop at any trajectory length"
    ),
)
def geo4_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pts = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        ((F.col("event_id") * 48271) % 100000).alias("x"),
        ((F.col("event_id") * 69621) % 100000).alias("y"),
    )
    hops = pts.select(
        "user_id",
        (F.col("x") - F.lag("x").over(w)).alias("dx"),
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
    ).filter(F.col("dx").isNotNull())
    hop_m = F.floor(
        F.sqrt((F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")).cast("double"))
    ).cast("long")
    return (
        hops.select("user_id", hop_m.alias("hop_m"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_hops"),
            F.sum("hop_m").cast("long").alias("path_m"),
            F.max("hop_m").cast("long").alias("longest_hop_m"),
            F.sum(F.when(F.col("hop_m") > 50000, 1).otherwise(0)).cast("long").alias("n_jumps"),
        )
    )


@register(
    "an9_revenue_concentration",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS r
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT r,
               row_number() OVER (ORDER BY r ASC, o_custkey ASC) AS i
        FROM rev
    ), tot AS (
        SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
               CAST(SUM(r) AS DECIMAL(38,6)) AS s,
               CAST(SUM(CAST(i AS DECIMAL(38,0)) * r) AS DECIMAL(38,6)) AS si
        FROM ranked
    ), deciles AS (
        SELECT CAST(ntile(10) OVER (ORDER BY i ASC) AS BIGINT) AS decile, r
        FROM ranked
    )
    SELECT d.decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(CAST(SUM(d.r) AS DOUBLE) / CAST(t.s AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS revenue_share,
           floor((2.0 * CAST(t.si AS DOUBLE) / (CAST(t.n AS DOUBLE) * CAST(t.s AS DOUBLE))
                  - (CAST(t.n AS DOUBLE) + 1.0) / CAST(t.n AS DOUBLE)) * 1e6 + 0.5) / 1e6
               AS gini
    FROM deciles d CROSS JOIN tot t
    GROUP BY d.decile, t.n, t.s, t.si
    """,
    doc=(
        "AN9 revenue CONCENTRATION — the Lorenz/Gini economics of a "
        "customer base (how much of revenue the top decile carries; "
        "the whale-dependence metric every marketplace tracks): "
        "per-customer revenue in exact decimals, ranked over the "
        "deterministic (revenue, custkey) total order, Gini from the "
        "classic rank-weighted closed form G = 2·Σi·x_i/(n·Σx) − "
        "(n+1)/n with every sum an exact DECIMAL and only boundary "
        "IEEE divisions (1e-6 quantized); decile revenue shares from "
        "the same ranking. One groupBy + one global sort of the "
        "per-customer rollup (O(customers), not O(orders)) + a "
        "broadcast 1-row total. Same text in the oracle"
    ),
)
def an9_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("decimal(38,6)").alias("r"))
    )
    ranked = rev.select(
        "r",
        F.row_number().over(W.orderBy(F.col("r").asc(), F.col("o_custkey").asc())).alias("i"),
    )
    tot = ranked.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("r").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("r")).cast("decimal(38,6)").alias("si"),
    )
    deciles = ranked.select(
        F.ntile(10).over(W.orderBy(F.col("i").asc())).cast("long").alias("decile"), "r"
    )
    gini = (
        F.floor(
            (
                2.0 * F.col("si").cast("double") / (F.col("n").cast("double") * F.col("s").cast("double"))
                - (F.col("n").cast("double") + 1.0) / F.col("n").cast("double")
            ) * 1e6 + 0.5
        ) / 1e6
    )
    return (
        deciles.crossJoin(F.broadcast(tot))
        .groupBy("decile", "n", "s", "si")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("r").cast("decimal(38,6)").alias("dr"),
        )
        .select(
            "decile", "n_customers",
            (F.floor(F.col("dr").cast("double") / F.col("s").cast("double") * 1e6 + 0.5) / 1e6)
            .alias("revenue_share"),
            gini.alias("gini"),
        )
    )


@register(
    "a14_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_totalprice > 1000.0
    GROUP BY o_orderstatus
    UNION ALL
    SELECT '__all__' AS o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_totalprice > 1000.0
    """,
    doc=(
        "A14 EXACT distinct counting via the Spark 3.5+ bitmap "
        "function family (bitmap_bucket_number / bitmap_bit_position "
        "/ bitmap_construct_agg / bitmap_count / bitmap_or_agg) — the "
        "scale-out alternative to COUNT(DISTINCT): a plain distinct "
        "shuffles raw keys (the exchange carries O(rows)), while the "
        "bitmap form partial-aggregates each 32k-key bucket into a "
        "<=4 KB bitmap MAP-SIDE so the exchange carries O(groups x "
        "buckets) bitmaps — HLL-shaped cost, exact answer. The entry "
        "also proves MERGEABILITY, the property that makes bitmaps an "
        "incremental-MV building block: the per-status bucket bitmaps "
        "are bitmap_or_agg-merged into a global distinct count "
        "('__all__' row) WITHOUT rescanning the fact — a re-scan "
        "would be the giveaway that the sketch isn't really "
        "mergeable. Oracle: plain COUNT(DISTINCT) closed forms, so "
        "bit-position collisions or bucket-boundary bugs value-fail"
    ),
)
def a14_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 1000.0)
    buckets = (
        o.groupBy(
            "o_orderstatus",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm")
        )
    )
    per_status = buckets.groupBy("o_orderstatus").agg(
        F.expr("sum(bitmap_count(bm))").cast("long").alias("n_customers")
    )
    merged = (
        buckets.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm_all"))
        .agg(F.expr("sum(bitmap_count(bm_all))").cast("long").alias("n_customers"))
        .select(F.lit("__all__").alias("o_orderstatus"), "n_customers")
    )
    return per_status.unionByName(merged)


# ---------------------------------------------------------------------------
# TS13 Theil-Sen robust trend: median of pairwise slopes
# ---------------------------------------------------------------------------

_TS13_K = 16  # trailing points per series -> <= 120 pairs, O(K^2) bounded


@register(
    "ts13_theil_sen",
    oracle=f"""
    WITH base AS (
        SELECT event_id, user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - 1704067200 AS xs,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS yt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rdesc
        FROM events WHERE event_type = 'purchase'
    ), lastk AS (
        SELECT * FROM base WHERE rdesc <= {_TS13_K}
    ), pairs AS (
        SELECT a.user_id,
               a.event_id AS ea, b.event_id AS eb,
               CAST(b.yt - a.yt AS DOUBLE) / CAST(b.xs - a.xs AS DOUBLE) AS sl
        FROM lastk a JOIN lastk b
          ON a.user_id = b.user_id AND a.rdesc > b.rdesc AND a.xs <> b.xs
    ), ranked AS (
        SELECT user_id, sl,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY sl, ea, eb) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_pairs
        FROM pairs
    ), med AS (
        SELECT user_id, sl AS slope, n_pairs
        FROM ranked WHERE rn = CAST(floor((n_pairs + 1) / 2.0) AS BIGINT)
    ), resid AS (
        SELECT l.user_id, m.slope, m.n_pairs,
               CAST(l.yt AS DOUBLE) - m.slope * CAST(l.xs AS DOUBLE) AS r,
               l.event_id,
               count(*) OVER (PARTITION BY l.user_id) AS n_points
        FROM lastk l JOIN med m ON m.user_id = l.user_id
    ), ranked_r AS (
        SELECT user_id, slope, n_pairs, n_points, r,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY r, event_id) AS rn
        FROM resid
    )
    SELECT user_id,
           CAST(n_points AS BIGINT) AS n_points,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           floor(slope * 1e9 + 0.5) / 1e9 AS slope_ticks_per_sec,
           floor(r / 10000.0 * 1e6 + 0.5) / 1e6 AS intercept
    FROM ranked_r
    WHERE rn = CAST(floor((n_points + 1) / 2.0) AS BIGINT)
    """,
    doc=(
        "TS13 Theil-Sen robust trend estimation — the median-of-"
        "pairwise-slopes regressor (29.3%% breakdown point vs OLS's "
        "zero: one fat-finger tick cannot move it), the robust "
        "sibling of ML6's closed-form OLS: per user, all C(K,2) "
        "slopes over the trailing K=16 purchases (the trailing-window "
        "bound makes the quadratic pair stage a CONSTANT <=120 pairs "
        "per key — one self-join shuffle on user_id, never "
        "cross-key), slope = lower median by deterministic (slope, "
        "event-pair) order, intercept = matching median residual. "
        "Pair slopes are single IEEE divisions of exact integer "
        "deltas — bit-identical both engines — so the median "
        "SELECTION (rank on the quantized-identical sort key) picks "
        "the same element, and only the reported values round. "
        "Same-timestamp pairs (dx=0) are excluded per the standard "
        "estimator"
    ),
)
def ts13_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = ev.select(
        "event_id", "user_id",
        (F.unix_timestamp("ts") - F.lit(1704067200)).cast("long").alias("xs"),
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("yt"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
        ).alias("rdesc"),
    ).filter(F.col("rdesc") <= _TS13_K)

    a = base.select(
        "user_id", F.col("event_id").alias("ea"), F.col("xs").alias("xa"),
        F.col("yt").alias("ya"), F.col("rdesc").alias("ra"),
    )
    b = base.select(
        F.col("user_id").alias("ub"), F.col("event_id").alias("eb"),
        F.col("xs").alias("xb"), F.col("yt").alias("yb"), F.col("rdesc").alias("rb"),
    )
    pairs = (
        a.join(b, (a["user_id"] == b["ub"]) & (a["ra"] > b["rb"]) & (a["xa"] != b["xb"]))
        .select(
            "user_id", "ea", "eb",
            ((F.col("yb") - F.col("ya")).cast("double")
             / (F.col("xb") - F.col("xa")).cast("double")).alias("sl"),
        )
    )
    wp = Window.partitionBy("user_id")
    ranked = pairs.select(
        "user_id", "sl",
        F.row_number().over(wp.orderBy("sl", "ea", "eb")).alias("rn"),
        F.count("*").over(wp).alias("n_pairs"),
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2.0).cast("long")
    ).select("user_id", F.col("sl").alias("slope"), "n_pairs")

    resid = base.join(med, "user_id").select(
        "user_id", "slope", "n_pairs", "event_id",
        (F.col("yt").cast("double") - F.col("slope") * F.col("xs").cast("double")).alias("r"),
        F.count("*").over(wp).alias("n_points"),
    )
    ranked_r = resid.withColumn(
        "rn", F.row_number().over(wp.orderBy("r", "event_id"))
    )
    return ranked_r.filter(
        F.col("rn") == F.floor((F.col("n_points") + 1) / 2.0).cast("long")
    ).select(
        "user_id",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        (F.floor(F.col("slope") * 1e9 + 0.5) / 1e9).alias("slope_ticks_per_sec"),
        (F.floor(F.col("r") / 10000.0 * 1e6 + 0.5) / 1e6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# AN10 Kaplan-Meier survival / churn curves
# ---------------------------------------------------------------------------

_KM_SCALE = 10**12


@register(
    "an10_km_survival",
    oracle=f"""
    WITH RECURSIVE per_subject AS (
        SELECT user_id, event_type,
               min(CAST(ts AS TIMESTAMP)) AS first_ts,
               max(CAST(ts AS TIMESTAMP)) AS last_ts
        FROM events GROUP BY user_id, event_type
    ), gmax AS (
        SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events
    ), lives AS (
        SELECT event_type AS cohort,
               CAST(floor((epoch(last_ts) - epoch(first_ts)) / 86400) AS BIGINT) AS t_days,
               CASE WHEN last_ts < (SELECT m FROM gmax) - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END AS churned
        FROM per_subject
    ), lt AS (
        SELECT cohort, t_days,
               CAST(sum(churned) AS BIGINT) AS d,
               CAST(count(*) - sum(churned) AS BIGINT) AS c
        FROM lives GROUP BY cohort, t_days
    ), ordered AS (
        SELECT cohort, t_days, d, c,
               row_number() OVER (PARTITION BY cohort ORDER BY t_days) AS rn,
               sum(d + c) OVER (PARTITION BY cohort)
                 - coalesce(sum(d + c) OVER (PARTITION BY cohort ORDER BY t_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
        FROM lt
    ), rec(cohort, rn, t_days, d, c, n, s) AS (
        SELECT cohort, rn, t_days, d, c, n,
               ({_KM_SCALE} * (n - d)) // n
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.cohort, o.rn, o.t_days, o.d, o.c, o.n,
               (r.s * (o.n - o.d)) // o.n
        FROM rec r JOIN ordered o ON o.cohort = r.cohort AND o.rn = r.rn + 1
    )
    SELECT cohort, t_days, CAST(n AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
           CAST(s AS DOUBLE) / {_KM_SCALE}.0 AS survival
    FROM rec
    """,
    doc=(
        "AN10 Kaplan-Meier product-limit survival curves (the churn/"
        "retention estimator every subscription business runs, with "
        "CENSORING done right — users still active at the observation "
        "horizon aren't counted as churned, they just leave the risk "
        "set): per-user lifetimes from first/last event, churn = "
        "inactive for the last 7 days of the horizon; subjects are "
        "(user, event_type) engagement pairs cohorted by type — does "
        "purchase engagement survive longer than ad-click engagement. The life table (deaths d_t, censored c_t, "
        "at-risk n_t) is pure groupBy + window arithmetic — only the "
        "cumulative PRODUCT S(t) = prod(1 - d_u/n_u) is sequential, "
        "and it runs in EXACT integer arithmetic (scaled s_t = "
        "s_(t-1)*(n_t-d_t) // n_t, floor division — censoring-only "
        "rows leave s exactly unchanged since s*n//n == s) through "
        "the one-pass streamed recurrence runner (operators/temporal."
        "py:km_survival), so the curve reproduces bit-for-bit under "
        "any partitioning and the oracle replays it verbatim with "
        "BIGINT // in a recursive CTE. One shuffle on the cohort key"
    ),
)
def an10_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from datalake_polygonscan_spark.operators.temporal import km_survival

    ev = load_table(spark, sf_dir, "events")
    per_subject = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    gmax = ev.agg(F.max("ts")).collect()[0][0]
    lives = per_subject.select(
        F.col("event_type").alias("cohort"),
        F.floor(
            (F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")) / 86400
        ).cast("long").alias("t_days"),
        F.when(
            F.col("last_ts") < F.lit(gmax) - F.expr("INTERVAL 7 DAY"), F.lit(1)
        ).otherwise(F.lit(0)).alias("churned"),
    )
    lt = lives.groupBy("cohort", "t_days").agg(
        F.sum("churned").cast("long").alias("d"),
        (F.count("*") - F.sum("churned")).cast("long").alias("c"),
    )
    wc = Window.partitionBy("cohort")
    wcum = wc.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    ordered = lt.select(
        "cohort", "t_days", "d", "c",
        (F.sum(F.col("d") + F.col("c")).over(wc)
         - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wcum), F.lit(0))).alias("n"),
    )
    km = km_survival(ordered, "cohort", "t_days", "d", "n")
    return (
        km.select(F.col("_k").alias("cohort"), "t_days", "s")
        .join(ordered, ["cohort", "t_days"])
        .select(
            "cohort", "t_days",
            F.col("n").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            (F.col("s").cast("double") / F.lit(float(_KM_SCALE))).alias("survival"),
        )
    )


# ---------------------------------------------------------------------------
# TS14 classical seasonal decomposition: trend + seasonal + remainder
# ---------------------------------------------------------------------------


@register(
    "ts14_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, 2
    ), tr AS (
        SELECT event_type, day, n,
               sum(n) OVER w AS wsum,
               count(*) OVER w AS wn
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
        SELECT event_type, day, day % 7 AS dow, n,
               CAST(wsum AS DOUBLE) / 7.0 AS trend,
               CAST(floor((CAST(n AS DOUBLE) - CAST(wsum AS DOUBLE) / 7.0)
                          * 1000000 + 0.5) AS BIGINT) AS micro
        FROM tr WHERE wn = 7
    ), seas AS (
        SELECT event_type, dow,
               CAST(floor(CAST(sum(micro) AS DOUBLE) / count(*)) AS BIGINT) AS smicro
        FROM det GROUP BY event_type, dow
    )
    SELECT d.event_type, d.day, CAST(d.dow AS BIGINT) AS dow, d.n,
           floor(d.trend * 1e6 + 0.5) / 1e6 AS trend,
           CAST(s.smicro AS DOUBLE) / 1e6 AS seasonal,
           CAST(d.micro - s.smicro AS DOUBLE) / 1e6 AS remainder
    FROM det d JOIN seas s ON s.event_type = d.event_type AND s.dow = d.dow
    """,
    doc=(
        "TS14 classical additive seasonal decomposition (the "
        "moving-average method behind every STL dashboard): daily "
        "per-type event counts split into TREND (7-day centered "
        "moving average — an event-day RANGE frame, gap-safe, only "
        "complete 7-point windows emit), SEASONAL (day-of-week mean "
        "of the detrended series) and REMAINDER. Exactness ladder: "
        "counts are integers, the trend divides an exact integer "
        "window sum by 7.0 (one IEEE op, bit-identical both "
        "engines), detrended values quantize to integer MICRO-units "
        "before the seasonal mean so that cross-day aggregation is "
        "an order-insensitive exact integer sum with floor division, "
        "and the remainder is an exact integer difference — the "
        "decomposition reproduces bit-for-bit under any "
        "partitioning. Two window passes + one groupBy join; "
        "per-key state is O(period) at any scale"
    ),
)
def ts14_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-3, 3)
    )
    tr = daily.select(
        "event_type", "day", "n",
        F.sum("n").over(w).alias("wsum"),
        F.count("*").over(w).alias("wn"),
    )
    trend = F.col("wsum").cast("double") / 7.0
    det = tr.filter(F.col("wn") == 7).select(
        "event_type", "day", (F.col("day") % 7).alias("dow"), "n",
        trend.alias("trend"),
        F.floor((F.col("n").cast("double") - trend) * 1000000 + 0.5)
        .cast("long").alias("micro"),
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.floor(F.sum("micro").cast("double") / F.count("*")).cast("long").alias("smicro")
    )
    return det.join(seas, ["event_type", "dow"]).select(
        "event_type", "day",
        F.col("dow").cast("long").alias("dow"), "n",
        (F.floor(F.col("trend") * 1e6 + 0.5) / 1e6).alias("trend"),
        (F.col("smicro").cast("double") / 1e6).alias("seasonal"),
        ((F.col("micro") - F.col("smicro")).cast("double") / 1e6).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# A15 exact grouped MAD: the robust scale estimator
# ---------------------------------------------------------------------------


@register(
    "a15_exact_mad",
    oracle="""
    WITH x AS (
        SELECT event_type, event_id,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS t
        FROM events
    ), ranked AS (
        SELECT event_type, t,
               row_number() OVER (PARTITION BY event_type ORDER BY t, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM x
    ), med AS (
        SELECT event_type, t AS m, n
        FROM ranked WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
    ), dev AS (
        SELECT x.event_type, x.event_id, m.m, m.n, abs(x.t - m.m) AS d
        FROM x JOIN med m ON m.event_type = x.event_type
    ), ranked_d AS (
        SELECT event_type, m, n, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d, event_id) AS rn
        FROM dev
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(m AS DOUBLE) / 10000.0 AS median,
           CAST(d AS DOUBLE) / 10000.0 AS mad,
           floor(d * 1.4826 / 10000.0 * 1e6 + 0.5) / 1e6 AS sigma_robust
    FROM ranked_d
    WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
    """,
    doc=(
        "A15 exact grouped MAD — median absolute deviation, the "
        "robust scale estimator (50%% breakdown point vs the standard "
        "deviation's zero; the denominator every robust z-score "
        "needs): per event_type, the lower median of tick-quantized "
        "values by deterministic (value, event_id) rank selection, "
        "then the lower median of |x - median| by the same device — "
        "two window rank picks over exact integers, zero float "
        "accumulation anywhere, so the estimate reproduces "
        "bit-for-bit under any partitioning and the oracle replays "
        "both selections verbatim. sigma_robust = 1.4826 * MAD (the "
        "Gaussian consistency constant, identical literal both "
        "engines, one IEEE multiply at the boundary). Completes the "
        "robust-statistics tier beside A9's weighted median, A13's "
        "exact mode and TS13's Theil-Sen slope; cost = two "
        "sort-window passes on the group key"
    ),
)
def a15_exact_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    x = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("t"),
    )
    wt = Window.partitionBy("event_type")
    ranked = x.select(
        "event_type", "t",
        F.row_number().over(wt.orderBy("t", "event_id")).alias("rn"),
        F.count("*").over(wt).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2.0).cast("long")
    ).select("event_type", F.col("t").alias("m"), "n")
    dev = x.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "m", "n", F.abs(F.col("t") - F.col("m")).alias("d")
    )
    ranked_d = dev.withColumn(
        "rn", F.row_number().over(wt.orderBy("d", "event_id"))
    )
    return ranked_d.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2.0).cast("long")
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("m").cast("double") / 10000.0).alias("median"),
        (F.col("d").cast("double") / 10000.0).alias("mad"),
        (F.floor(F.col("d") * 1.4826 / 10000.0 * 1e6 + 0.5) / 1e6).alias("sigma_robust"),
    )


# ---------------------------------------------------------------------------
# AN11 DAU/WAU stickiness: EXACT sliding-window distinct at scale
# ---------------------------------------------------------------------------


@register(
    "an11_dau_wau_stickiness",
    oracle="""
    WITH pres AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM pres
    ), wau AS (
        SELECT w.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM days w JOIN pres p ON p.day BETWEEN w.day - 6 AND w.day
        GROUP BY w.day
    ), dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM pres GROUP BY day
    )
    SELECT d.day, d.dau, u.wau,
           floor(CAST(d.dau AS DOUBLE) / u.wau * 1e6 + 0.5) / 1e6 AS stickiness
    FROM dau d JOIN wau u ON u.day = d.day
    """,
    doc=(
        "AN11 DAU/WAU stickiness — EXACT sliding-window distinct "
        "users, the engagement ratio every product dashboard tracks, "
        "computed the way that survives 100 TB: a SLIDING distinct "
        "cannot use W10's first-occurrence trick (users LEAVE the "
        "window) and the naive form fans every presence row out to "
        "all 7 windows it supports. Instead each user's presence "
        "days become coverage intervals [d, d+6], consecutive days "
        "<= 7 apart COALESCE into one interval (gaps-and-islands, "
        "one per-user window pass — TS7's device), and each merged "
        "interval contributes just +1/-1 BOUNDARY deltas on the "
        "window-end axis; the per-day sliding distinct is then one "
        "global prefix sum over ~2 rows per user-burst, not 7x the "
        "data. Exact integers end to end (one boundary IEEE divide "
        "for the ratio); the oracle cross-proves against the "
        "brute-force range-join COUNT(DISTINCT) — an independent "
        "formulation, so a wrong merge, off-by-one window edge or "
        "leaked boundary value-fails"
    ),
)
def an11_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pres = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).distinct()

    # gaps-and-islands per user: presence days <= 7 apart share a
    # coverage interval (each day covers window-ends [d, d+6])
    wu = Window.partitionBy("user_id").orderBy("day")
    flagged = pres.select(
        "user_id", "day",
        F.when(
            F.col("day") > F.lag("day").over(wu) + 7, F.lit(1)
        ).otherwise(F.lit(0)).alias("brk"),
    ).withColumn(
        "island",
        F.sum("brk").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = flagged.groupBy("user_id", "island").agg(
        F.min("day").alias("s"), (F.max("day") + 7).alias("e1")  # exclusive end
    )
    # +1/-1 boundary deltas on the window-end axis, then one prefix sum
    bounds = intervals.select(F.col("s").alias("pt"), F.lit(1).alias("delta")).unionByName(
        intervals.select(F.col("e1").alias("pt"), F.lit(-1).alias("delta"))
    )
    deltas = bounds.groupBy("pt").agg(F.sum("delta").alias("d"))
    days = pres.select("day").distinct()
    axis = days.select(F.col("day").alias("pt"), F.lit(0).alias("d")).unionByName(
        deltas.select("pt", "d")
    )
    wax = Window.orderBy("pt").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        axis.groupBy("pt").agg(F.sum("d").alias("d"))
        .withColumn("wau", F.sum("d").over(wax).cast("long"))
    )
    dau = pres.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    return (
        dau.join(cum.select(F.col("pt").alias("day"), "wau"), "day")
        .select(
            "day", "dau", "wau",
            (F.floor(F.col("dau").cast("double") / F.col("wau") * 1e6 + 0.5) / 1e6)
            .alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# TS15: banded dynamic time warping to a reference series
# ---------------------------------------------------------------------------

_DTW_L = 8
_DTW_BAND = 2


def _ts15_oracle_sql(n: int = _DTW_L, band: int = _DTW_BAND) -> str:
    """Replays the banded DTW dynamic program as staged MATERIALIZED
    CTEs, one per ANTI-DIAGONAL (cells on i+j = k depend only on
    diagonals k-1 and k-2), so the non-associative recurrence becomes
    a fixed join chain — the same staged-replay pattern as G8/ML14."""
    big = 10**15
    parts = [f"""
    WITH slots AS (SELECT unnest(generate_series(0, {n - 1})) AS sl
    ), users AS MATERIALIZED (SELECT DISTINCT user_id AS u FROM events
    ), cnts AS MATERIALIZED (
        SELECT user_id AS u, hour(ts) % {n} AS sl, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), a AS MATERIALIZED (
        SELECT users.u, slots.sl, COALESCE(cnts.c, 0) AS c
        FROM users CROSS JOIN slots
        LEFT JOIN cnts ON cnts.u = users.u AND cnts.sl = slots.sl
    ), nu AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM users
    ), r AS MATERIALIZED (
        SELECT sl, CAST(sum(c) // (SELECT nn FROM nu) AS BIGINT) AS rc
        FROM a GROUP BY sl
    ), cells AS MATERIALIZED (
        SELECT a.u, a.sl + 1 AS i, r.sl + 1 AS j,
               CAST(abs(a.c - r.rc) AS BIGINT) AS cost
        FROM a JOIN r ON abs(a.sl - r.sl) <= {band}
    ), diag1 AS (
        SELECT CAST(NULL AS BIGINT) AS u, 0 AS i, 0 AS j,
               CAST(0 AS BIGINT) AS d
        WHERE FALSE
    )"""]
    for k in range(2, 2 * n + 1):
        pm1 = "diag1" if k == 2 else f"diag{k - 1}"
        pm2 = "diag1" if k <= 3 else f"diag{k - 2}"
        parts.append(f""", diag{k} AS MATERIALIZED (
        SELECT c.u, c.i, c.j,
               CASE WHEN c.i = 1 AND c.j = 1 THEN c.cost
                    ELSE c.cost + least(
                        COALESCE(p1.d, {big}), COALESCE(p2.d, {big}),
                        COALESCE(p0.d, {big}))
               END AS d
        FROM cells c
        LEFT JOIN {pm1} p1 ON p1.u = c.u AND p1.i = c.i - 1 AND p1.j = c.j
        LEFT JOIN {pm1} p2 ON p2.u = c.u AND p2.i = c.i AND p2.j = c.j - 1
        LEFT JOIN {pm2} p0 ON p0.u = c.u AND p0.i = c.i - 1 AND p0.j = c.j - 1
        WHERE c.i + c.j = {k}
    )""")
    parts.append(f"""
    SELECT u AS user_id, CAST(d AS BIGINT) AS dtw
    FROM diag{2 * n} WHERE i = {n} AND j = {n}
    """)
    return "".join(parts)


@register(
    "ts15_dtw_distance",
    oracle=_ts15_oracle_sql(),
    doc=(
        "TS15 banded DYNAMIC TIME WARPING (Sakoe-Chiba band 2) from "
        "each user's hourly-slot activity series to the fleet "
        "reference series — the alignment-tolerant similarity a "
        "pointwise grid distance misses (operators/temporal.py:"
        "dtw_to_reference). The non-associative per-key DP is the "
        "textbook applyInPandas slot: one shuffle groups each key's "
        "L=8 slots, the O(L*band) recurrence runs Arrow-batched per "
        "key with CONSTANT per-key work, linear in keys with zero "
        "cross-key communication. All costs and minima are exact "
        "integers; the oracle replays the DP as staged MATERIALIZED "
        "CTEs, one per anti-diagonal (cells on i+j=k depend only on "
        "k-1 and k-2) — so a band, indexing or tie bug value-fails"
    ),
)
def ts15_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import dtw_to_reference

    ev = load_table(spark, sf_dir, "events")
    cnts = ev.groupBy(
        "user_id", (F.hour("ts") % _DTW_L).alias("sl")
    ).agg(F.count("*").cast("long").alias("c"))
    users = ev.select("user_id").distinct()
    slots = spark.range(_DTW_L).select(F.col("id").cast("long").alias("sl"))
    a = (
        users.crossJoin(slots)
        .join(cnts, ["user_id", "sl"], "left")
        .select("user_id", "sl", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    n_users = users.count()
    ref_rows = (
        a.groupBy("sl")
        .agg(F.expr(f"CAST(sum(c) div {n_users} AS LONG)").alias("rc"))
        .collect()
    )
    reference = [0] * _DTW_L
    for row in ref_rows:
        reference[int(row["sl"])] = int(row["rc"])
    return dtw_to_reference(a, reference, band=_DTW_BAND)


# ---------------------------------------------------------------------------
# ER3: phonetic blocking (Soundex) for entity resolution
# ---------------------------------------------------------------------------


@register(
    "er3_soundex_blocking",
    oracle="""
    WITH words AS MATERIALIZED (
        SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
               upper(string_split(p_name, ' ')[1]) AS w
        FROM part
    ), chars AS (
        SELECT p_partkey, w, i, substr(w, CAST(i AS INT), 1) AS ch
        FROM words, LATERAL (SELECT unnest(generate_series(1, length(w))) AS i)
    ), coded AS (
        -- H and W are REMOVED from the collapse sequence (the
        -- American-Soundex rule that makes Ashcraft A261, not A226)
        SELECT p_partkey, w, i,
               CASE WHEN ch IN ('B','F','P','V') THEN '1'
                    WHEN ch IN ('C','G','J','K','Q','S','X','Z') THEN '2'
                    WHEN ch IN ('D','T') THEN '3'
                    WHEN ch = 'L' THEN '4'
                    WHEN ch IN ('M','N') THEN '5'
                    WHEN ch = 'R' THEN '6'
                    WHEN ch IN ('A','E','I','O','U','Y') THEN '0'
               END AS code
        FROM chars
        WHERE ch NOT IN ('H', 'W')
    ), collapsed AS (
        SELECT p_partkey, w, i, code,
               lag(code) OVER (PARTITION BY p_partkey ORDER BY i) AS prev
        FROM coded
    ), digits AS (
        SELECT p_partkey, w, i, code
        FROM collapsed
        WHERE i > 1 AND code BETWEEN '1' AND '6'
          AND (prev IS NULL OR prev <> code)
    ), sx AS (
        SELECT wo.p_partkey, wo.w,
               substr(wo.w, 1, 1)
               || substr(coalesce(string_agg(d.code, '' ORDER BY d.i), '')
                         || '000', 1, 3) AS sx
        FROM words wo LEFT JOIN digits d ON d.p_partkey = wo.p_partkey
        GROUP BY wo.p_partkey, wo.w
    )
    SELECT p_partkey, w AS word, sx.sx,
           CAST(count(*) OVER (PARTITION BY sx.sx) AS BIGINT) AS block_n
    FROM sx
    """,
    doc=(
        "ER3 PHONETIC BLOCKING for entity resolution: the Soundex key "
        "(American variant with the H/W adjacency rule) of each part "
        "name's first word becomes the blocking key — the classic "
        "spelling-tolerant blocker that puts 'Robert' and 'Rupert' in "
        "one candidate block where ER1's exact prefix blocking would "
        "separate them. Spark side uses the JVM codegen soundex() "
        "builtin (zero Python); the oracle REIMPLEMENTS the algorithm "
        "from scratch in SQL (letter coding, H/W removal from the "
        "collapse sequence, adjacent-duplicate collapse across the "
        "retained first letter, vowel separation, zero-padding) — an "
        "independent-implementation cross-validation where a variant "
        "mismatch (A226 vs A261) value-fails. Per-part key plus block "
        "sizes (the skew profile an ER pipeline inspects before "
        "pair generation)"
    ),
)
def er3_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    words = part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.upper(F.split(F.col("p_name"), " ").getItem(0)).alias("word"),
    )
    sx = words.select("p_partkey", "word", F.soundex("word").alias("sx"))
    return sx.select(
        "p_partkey", "word", "sx",
        F.count("*").over(Window.partitionBy("sx")).cast("long").alias("block_n"),
    )


# ---------------------------------------------------------------------------
# AN12: funnel time-to-convert latency percentiles
# ---------------------------------------------------------------------------


@register(
    "an12_conversion_latency",
    oracle="""
    WITH base AS (
        SELECT user_id, ts, event_type FROM events
    ), w1 AS (
        SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM base GROUP BY user_id
    ), w2 AS (
        SELECT b.user_id, w1.t_view,
               min(CASE WHEN b.event_type = 'purchase' AND b.ts >= w1.t_view
                        THEN b.ts END) AS t_purchase
        FROM base b JOIN w1 USING (user_id) GROUP BY b.user_id, w1.t_view
    ), conv AS (
        SELECT user_id,
               CAST(hour(CAST(t_view AS TIMESTAMP)) % 6 AS BIGINT) AS cohort,
               epoch_us(CAST(t_purchase AS TIMESTAMP))
                 - epoch_us(CAST(t_view AS TIMESTAMP)) AS delay_us
        FROM w2 WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL
    )
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_converted,
           ROUND(quantile_cont(delay_us, 0.5), 4) AS p50_us,
           ROUND(quantile_cont(delay_us, 0.9), 4) AS p90_us,
           CAST(max(delay_us) AS BIGINT) AS max_us
    FROM conv GROUP BY cohort
    """,
    doc=(
        "AN12 funnel TIME-TO-CONVERT latency: per converting user the "
        "exact integer microsecond delay from first view to first "
        "at-or-after purchase (the AN1 funnel chain), aggregated per "
        "cohort into exact-interpolation p50/p90 and max — the "
        "conversion-SLA report beside AN1's depth counts. Delays are "
        "exact BIGINT epoch-microsecond differences (no float time "
        "math); percentile() == quantile_cont by the A5 contract"
    ),
)
def an12_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.operators.temporal import funnel

    ev = load_table(spark, sf_dir, "events")
    f = funnel(ev, "user_id", "ts", "event_type", ["view", "purchase"])
    conv = f.filter(
        F.col("t_view").isNotNull() & F.col("t_purchase").isNotNull()
    ).select(
        (F.hour("t_view") % 6).cast("long").alias("cohort"),
        (F.unix_micros(F.col("t_purchase").cast("timestamp"))
         - F.unix_micros(F.col("t_view").cast("timestamp"))).alias("delay_us"),
    )
    return conv.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile("delay_us", F.lit(0.5)), 4).alias("p50_us"),
        F.round(F.percentile("delay_us", F.lit(0.9)), 4).alias("p90_us"),
        F.max("delay_us").cast("long").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# A16: exact grouped skewness / kurtosis from integer power sums
# ---------------------------------------------------------------------------


@register(
    "a16_skew_kurtosis",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x
        FROM lineitem
    ), sums AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s1,
               CAST(sum(x * x) AS BIGINT) AS s2,
               CAST(sum(x * x * x) AS BIGINT) AS s3,
               CAST(sum(x * x * x * x) AS BIGINT) AS s4
        FROM pts GROUP BY grp
    )
    SELECT grp, n, s1, s2, s3, s4,
           ROUND(
             (CAST(s3 AS DOUBLE) / n
              - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
              + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
             / pow(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1.5),
             6) AS skewness,
           ROUND(
             (CAST(s4 AS DOUBLE) / n
              - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
              + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
              - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             / ((CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                * (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
             - 3.0,
             6) AS kurtosis_excess
    FROM sums
    """,
    doc=(
        "A16 exact grouped SKEWNESS and excess KURTOSIS: the third/"
        "fourth-moment shape statistics from EXACT integer power sums "
        "(S1..S4 over integer-valued quantities — one partial-agg "
        "shuffle, fully mergeable, no per-group sort), combined into "
        "the population moments by a SINGLE IEEE-double expression "
        "over those exact integers — bit-identical across engines by "
        "the round-9 single-expression discipline, unlike calling "
        "each engine's own skewness()/kurtosis() whose internal "
        "accumulation orders differ. Power sums graded as exact "
        "BIGINTs beside the rounded statistics"
    ),
)
def a16_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
    )
    sums = pts.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("long").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).cast("long").alias("s4"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2r = F.col("s2").cast("double") / F.col("n")
    m3r = F.col("s3").cast("double") / F.col("n")
    m4r = F.col("s4").cast("double") / F.col("n")
    var = m2r - m1 * m1
    skew = (m3r - 3.0 * m1 * m2r + 2.0 * m1 * m1 * m1) / F.pow(var, 1.5)
    kurt = (m4r - 4.0 * m1 * m3r + 6.0 * m1 * m1 * m2r - 3.0 * m1 * m1 * m1 * m1) / (
        var * var
    ) - 3.0
    return sums.select(
        "grp", "n", "s1", "s2", "s3", "s4",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


# ---------------------------------------------------------------------------
# GEO5: nearest-facility (nearest-neighbour) spatial join
# ---------------------------------------------------------------------------


@register(
    "geo5_nearest_facility",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               (c_custkey * 48271) % 100000 AS x,
               (c_custkey * 69621) % 100000 AS y
        FROM customer
    ), s AS (
        SELECT s_suppkey,
               (s_suppkey * 16807) % 100000 AS x,
               (s_suppkey * 39916801) % 100000 AS y
        FROM supplier
    ), scored AS (
        SELECT c.c_custkey, s.s_suppkey,
               CAST((c.x - s.x) * (c.x - s.x)
                  + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS d2,
               row_number() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY (c.x - s.x) * (c.x - s.x)
                          + (c.y - s.y) * (c.y - s.y) ASC,
                            s.s_suppkey ASC) AS rn
        FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, d2,
           CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT) AS dist_m
    FROM scored WHERE rn = 1
    """,
    doc=(
        "GEO5 NEAREST-FACILITY assignment (the nearest-neighbour "
        "spatial join — store-allocation / catchment analysis): every "
        "customer point maps to its closest supplier facility by "
        "EXACT integer squared distance, ties to the smallest "
        "facility key (a total order, so the argmin is deterministic "
        "on any engine). The facility side is a BROADCAST dimension — "
        "the assignment is one broadcast nested-loop + a min_by-style "
        "struct-min aggregation, zero shuffles of the big side, the "
        "right plan while facilities fit in memory (when they don't, "
        "GEO1's grid decomposition with ring search takes over — "
        "documented trade). Reported distance floor(sqrt(int)) rides "
        "IEEE correctly-rounded sqrt; the oracle replays the argmin "
        "via a rank window over the cross product"
    ),
)
def geo5_nearest_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 100000).alias("cx"),
        ((F.col("c_custkey") * 69621) % 100000).alias("cy"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 16807) % 100000).alias("sx"),
        ((F.col("s_suppkey") * 39916801) % 100000).alias("sy"),
    )
    d2 = (
        (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
        + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
    ).cast("long")
    scored = c.join(F.broadcast(s)).select(
        "c_custkey", d2.alias("d2"), "s_suppkey"
    )
    best = scored.groupBy("c_custkey").agg(
        F.min(F.struct("d2", "s_suppkey")).alias("b")
    )
    return best.select(
        "c_custkey",
        F.col("b.s_suppkey").alias("nearest_suppkey"),
        F.col("b.d2").alias("d2"),
        F.floor(F.sqrt(F.col("b.d2").cast("double"))).cast("long").alias("dist_m"),
    )


# ---------------------------------------------------------------------------
# X15: thresholded levenshtein over phonetic blocks
# ---------------------------------------------------------------------------


@register(
    "x15_bounded_levenshtein",
    oracle="""
    WITH words AS (
        SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
               upper(string_split(p_name, ' ')[1]) AS w
        FROM part WHERE p_partkey % 20 = 0
    ), blocked AS (
        SELECT p_partkey, w, substr(w, 1, 2) AS blk FROM words
    ), sized AS (
        SELECT * FROM (
            SELECT *, count(*) OVER (PARTITION BY blk) AS bn FROM blocked
        ) WHERE bn <= 300
    ), pairs AS (
        SELECT a.blk, a.p_partkey AS id_a, b.p_partkey AS id_b,
               a.w AS w_a, b.w AS w_b,
               CASE WHEN levenshtein(a.w, b.w) > 3 THEN -1
                    ELSE levenshtein(a.w, b.w) END AS lv3
        FROM sized a JOIN sized b
          ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    )
    SELECT blk, id_a, id_b, w_a, w_b, CAST(lv3 AS BIGINT) AS lv3,
           lv3 >= 0 AS within_bound
    FROM pairs
    """,
    doc=(
        "X15 BOUNDED levenshtein — the Spark 3.5+ thresholded "
        "variant `levenshtein(l, r, k)` that abandons the DP row as "
        "soon as the minimum exceeds k and returns -1 (turning the "
        "O(len^2) worst case into O(len*k) — the difference between "
        "a feasible and an infeasible fuzzy-join at 100 TB, since "
        "candidate pairs overwhelmingly MISS the bound and the miss "
        "is what must be cheap). Exercised over prefix blocks with "
        "the ER1-style deterministic size cap; the oracle computes "
        "the UNBOUNDED distance and applies the threshold after — "
        "so the early-exit implementation must agree with the full "
        "DP on every pair, hits and misses both"
    ),
)
def x15_bounded_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    words = (
        load_table(spark, sf_dir, "part")
        # deterministic 1-in-20 key sample: the color vocabulary is
        # tiny, so unsampled prefix blocks grow linearly with SF and
        # the pair stage would be the quadratic blob the cap exists
        # to prevent
        .filter(F.col("p_partkey") % 20 == 0)
        .select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.upper(F.split(F.col("p_name"), " ").getItem(0)).alias("w"),
        )
        .withColumn("blk", F.substring("w", 1, 2))
    )
    sized = words.withColumn(
        "bn", F.count("*").over(Window.partitionBy("blk"))
    ).filter(F.col("bn") <= 300)
    a = sized.select(
        "blk", F.col("p_partkey").alias("id_a"), F.col("w").alias("w_a")
    )
    b = sized.select(
        "blk", F.col("p_partkey").alias("id_b"), F.col("w").alias("w_b")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "blk", "id_a", "id_b", "w_a", "w_b",
            F.expr("levenshtein(w_a, w_b, 3)").cast("long").alias("lv3"),
        )
        .withColumn("within_bound", F.col("lv3") >= 0)
    )


# ---------------------------------------------------------------------------
# A17: modern aggregate surface — FILTER clause, count_if, bool aggs,
# deterministic max_by/min_by
# ---------------------------------------------------------------------------


@register(
    "a17_filter_clause_aggs",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
           bool_or(o_totalprice > 400000) AS any_huge,
           bool_and(o_totalprice > 1000) AS all_above_floor,
           CAST(max_by(o_orderkey,
                CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
                  + o_orderkey) AS BIGINT) AS priciest_order,
           CAST(min_by(o_orderkey,
                CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000
                  + o_orderkey) AS BIGINT) AS cheapest_order
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "A17 the MODERN aggregate surface in one grouped scan: the "
        "SQL:2003 FILTER clause (conditional aggregation without "
        "CASE-NULL contortions), count_if, bool_or/bool_and (the "
        "any/every verdict aggregates), and max_by/min_by argmin "
        "aggregation — with the A5b/TS2 determinism rule applied: "
        "the argmin SCORE is made globally unique (price ticks via "
        "explicit floor — the round-9 cast discipline — plus a key "
        "tiebreak in the low digits), because max_by on a tied score "
        "is engine-arbitrary and would hash-flap. One partial-agg "
        "shuffle; every aggregate a native DuckDB twin value-checks"
    ),
)
def a17_filter_clause_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    score = F.expr(
        "CAST(floor(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey"
    )
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(F.col("o_totalprice") > 150000).cast("long").alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_f"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_floor"),
        F.max_by(F.col("o_orderkey"), score).cast("long").alias("priciest_order"),
        F.min_by(F.col("o_orderkey"), score).cast("long").alias("cheapest_order"),
    )


# ---------------------------------------------------------------------------
# TS16: irregular-sampling rate of change (exact integer micro-slopes)
# ---------------------------------------------------------------------------


@register(
    "ts16_rate_of_change",
    oracle="""
    WITH pts AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
               CAST(floor(value * 100) AS BIGINT) AS v_c,
               event_id
        FROM events
    ), lagged AS (
        SELECT user_id, event_id, t_us, v_c,
               lag(t_us) OVER w AS pt, lag(v_c) OVER w AS pv
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ), slopes AS (
        SELECT user_id, event_id,
               t_us - pt AS dt_us,
               v_c - pv AS dv_c,
               CAST(((v_c - pv) * 1000000
                     - ((((v_c - pv) * 1000000) % (t_us - pt)) + (t_us - pt))
                       % (t_us - pt)) // (t_us - pt) AS BIGINT) AS slope_micro
        FROM lagged WHERE pt IS NOT NULL AND t_us > pt
    )
    SELECT user_id, event_id, dt_us, dv_c, slope_micro,
           CAST(max(abs(slope_micro)) OVER (PARTITION BY user_id) AS BIGINT)
             AS user_max_abs_slope
    FROM slopes
    """,
    doc=(
        "TS16 rate-of-change over IRREGULAR sampling — the derivative "
        "signal (spike/velocity detection) where TS4/TS8 assume a "
        "regular grid: consecutive same-user readings pair by one lag "
        "window (event-id tiebreak for simultaneous micro-timestamps; "
        "zero-dt pairs excluded as undefined), value deltas quantize "
        "to exact centi-units via explicit floor (the round-9 cast "
        "discipline), time deltas are exact epoch microseconds, and "
        "the slope is an exact FLOOR-DIVISION integer in "
        "centi-per-second-micro units — no float division anywhere, "
        "so any partitioning reproduces the same table. Per-user max "
        "|slope| rides a second window over the same partitioning "
        "(one exchange total)"
    ),
)
def ts16_rate_of_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_c"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    lagged = pts.select(
        "user_id", "event_id", "t_us", "v_c",
        F.lag("t_us").over(w).alias("pt"),
        F.lag("v_c").over(w).alias("pv"),
    ).filter(F.col("pt").isNotNull() & (F.col("t_us") > F.col("pt")))
    num = "((v_c - pv) * 1000000)"
    den = "(t_us - pt)"
    slopes = lagged.select(
        "user_id", "event_id",
        (F.col("t_us") - F.col("pt")).alias("dt_us"),
        (F.col("v_c") - F.col("pv")).alias("dv_c"),
        F.expr(f"({num} - pmod({num}, {den})) div {den}")
        .cast("long")
        .alias("slope_micro"),
    )
    return slopes.withColumn(
        "user_max_abs_slope",
        F.max(F.abs("slope_micro")).over(Window.partitionBy("user_id")).cast("long"),
    )


# ---------------------------------------------------------------------------
# TS17: exact single change-point localization (SSE-split argmax)
# ---------------------------------------------------------------------------


@register(
    "ts17_changepoint",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(floor(value * 100) AS BIGINT) AS yc,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS i
        FROM events
    ), tot AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yc) AS BIGINT) AS s
        FROM ev GROUP BY user_id
    ), pre AS (
        SELECT e.user_id, e.i,
               SUM(e.yc) OVER (
                   PARTITION BY e.user_id ORDER BY e.i
               ) AS s1,
               t.n, t.s
        FROM ev e JOIN tot t USING (user_id)
    ), scored AS (
        SELECT user_id, i AS k, n, s, s1,
               CAST(s1 * s1 AS DOUBLE) / i
                 + CAST((s - s1) * (s - s1) AS DOUBLE) / (n - i) AS f
        FROM pre WHERE i < n
    ), best AS (
        SELECT user_id, k, n, s1, f,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY f DESC, k ASC
               ) AS rn
        FROM scored
    )
    SELECT b.user_id,
           b.n,
           b.k AS cp_index,
           ROUND(CAST(b.s1 AS DOUBLE) / b.k / 100, 6) AS mean_left,
           ROUND(CAST(t.s - b.s1 AS DOUBLE) / (b.n - b.k) / 100, 6) AS mean_right,
           ROUND(b.f, 4) AS split_score
    FROM best b JOIN tot t USING (user_id)
    WHERE b.rn = 1 AND b.n >= 2
    """,
    doc=(
        "TS17 EXACT single change-point localization (the binary-"
        "segmentation base step; Scott-Knott/CUSUM family): per key, "
        "the split k maximizing the between-segment objective "
        "S1^2/n1 + S2^2/n2 — equivalently minimizing total residual "
        "SSE of a two-level step fit. Values centi-quantize to exact "
        "BIGINT (explicit floor both engines), ONE ordered window "
        "builds prefix sums, every k scores in a single IEEE-double "
        "expression over exact integers (bit-identical cross-engine — "
        "the round-9 discipline), argmax deterministic via (score "
        "DESC, k ASC). One exchange for the per-key window + one "
        "partial-agg join; no iteration, no UDF. Segment means at the "
        "chosen split ride the hash alongside the score"
    ),
)
def ts17_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("yc"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pre = ev.withColumn("i", F.row_number().over(w_ord)).withColumn(
        "s1", F.sum("yc").over(w_ord)
    )
    tot = pre.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"), F.sum("yc").cast("long").alias("s")
    )
    scored = (
        pre.join(tot, "user_id")
        .filter(F.col("i") < F.col("n"))
        .select(
            "user_id", "n", "s", F.col("i").alias("k"), "s1",
            (
                (F.col("s1") * F.col("s1")).cast("double") / F.col("i")
                + ((F.col("s") - F.col("s1")) * (F.col("s") - F.col("s1"))).cast("double")
                / (F.col("n") - F.col("i"))
            ).alias("f"),
        )
    )
    w_best = Window.partitionBy("user_id").orderBy(F.desc("f"), F.asc("k"))
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("n") >= 2))
        .select(
            "user_id", "n", F.col("k").alias("cp_index"),
            F.round(F.col("s1").cast("double") / F.col("k") / 100, 6).alias("mean_left"),
            F.round(
                (F.col("s") - F.col("s1")).cast("double") / (F.col("n") - F.col("k")) / 100, 6
            ).alias("mean_right"),
            F.round("f", 4).alias("split_score"),
        )
    )


# ---------------------------------------------------------------------------
# A20: the built-in Datasketches HLL surface (Spark 3.5+)
# ---------------------------------------------------------------------------


@register(
    "a20_hll_sketch_builtin",
    oracle="""
    WITH g AS (
        SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact
        FROM lineitem GROUP BY l_returnflag
    ), gtot AS (
        SELECT count(DISTINCT l_orderkey) AS exact_global FROM lineitem
    )
    SELECT g.l_returnflag,
           CAST(g.exact AS BIGINT) AS exact,
           CAST(1 AS INTEGER) AS est_ok,
           CAST((SELECT exact_global FROM gtot) AS BIGINT) AS exact_global,
           CAST(1 AS INTEGER) AS union_est_ok
    FROM g
    """,
    doc=(
        "A20 the BUILT-IN Apache DataSketches HLL surface (Spark "
        "3.5+: hll_sketch_agg / hll_sketch_estimate / hll_union_agg) "
        "— the production twin of the from-scratch A11 HLL: per-group "
        "sketches built in one partial-agg shuffle (lgConfigK=14), "
        "then MERGED with hll_union_agg into a global estimate "
        "WITHOUT rescanning rows — the mergeability that makes "
        "sketch columns materializable per partition/day and "
        "unionable at query time (the MV4 strategy on the stock "
        "primitive). Graded like A2/A11: per-group and merged-union "
        "estimates must land within the sketch's published error "
        "envelope of the EXACT distinct counts (2%% at lgK=14), the "
        "exact counts ride the hash verbatim"
    ),
)
def a20_hll_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey", F.lit(14)).alias("sk"),
        F.countDistinct("l_orderkey").cast("long").alias("exact"),
    )
    per = g.select(
        "l_returnflag", "exact", F.hll_sketch_estimate("sk").alias("est")
    )
    merged = g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_global")
    ).collect()[0]["est_global"]
    exact_global = int(
        li.agg(F.countDistinct("l_orderkey")).collect()[0][0]
    )
    union_ok = int(abs(merged - exact_global) <= max(2, 0.02 * exact_global))
    return per.select(
        "l_returnflag",
        "exact",
        (
            F.abs(F.col("est") - F.col("exact"))
            <= F.greatest(F.lit(2), F.col("exact") * 0.02)
        ).cast("int").alias("est_ok"),
        F.lit(exact_global).cast("long").alias("exact_global"),
        F.lit(union_ok).cast("int").alias("union_est_ok"),
    )
