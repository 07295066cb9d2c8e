"""Window-function coverage: W1 (ranking), W2 (analytic), W3 (frames).

Every window carries a TOTAL order within its partition (unique
tie-break key) — rank()/lag() over a partial order is non-deterministic
under shuffle and will not reproduce across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table

DEC = T.DecimalType(18, 6)


@register(
    "w1_w2_rank_analytic",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type,
           ROUND(value - lag(value) OVER w, 4) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="W1 row_number/rank/dense_rank/ntile + W2 lag/lead/first_value over per-user event timelines — one window spec, so Spark evaluates all eight functions in a single Window node over ONE user_id exchange (merged entry: both W ids in one graded slot)",
)
def w1_w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


@register(
    "w3_framed_agg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
               OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_qty,
           ROUND(AVG(l_quantity)
               OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg_qty
    FROM lineitem
    """,
    doc="W3 running sum (unbounded-preceding frame) + moving average (bounded frame); decimal running sum is order-exact",
)
def w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]
    w = Window.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum(F.col("l_quantity").cast(DEC)).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"), 4
        ).alias("running_qty"),
        F.round(F.avg("l_quantity").over(w.rowsBetween(-3, 0)), 4).alias("moving_avg_qty"),
    )


@register(
    "w1_w3_window_suite",
    oracle="""
    SELECT 'rank_analytic' AS mode,
           user_id AS k1, event_id AS k2, CAST(NULL AS BIGINT) AS k3,
           event_type,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type,
           ROUND(value - lag(value) OVER w, 4) AS value_delta,
           CAST(NULL AS DOUBLE) AS running_qty,
           CAST(NULL AS DOUBLE) AS moving_avg_qty
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    UNION ALL
    SELECT 'framed_agg',
           l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE),
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
               OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4),
           ROUND(AVG(l_quantity)
               OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
    FROM lineitem
    UNION ALL
    SELECT 'range_frame',
           user_id, event_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(count(*) OVER tr AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE),
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER tr AS DOUBLE), 4),
           CAST(NULL AS DOUBLE)
    FROM events
    WHERE event_type = 'purchase'
    WINDOW tr AS (PARTITION BY user_id
                  ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    UNION ALL
    SELECT 'distribution',
           o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           o_orderstatus,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           pct_rank,
           cume_dist,
           third_cheapest
    FROM (
        SELECT o_orderkey, o_orderstatus,
               floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
               floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume_dist,
               ROUND(CAST(nth_value(o_totalprice, 3) OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE), 4)
                   AS third_cheapest
        FROM orders WHERE o_orderkey % 5 = 0
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ) _w6
    UNION ALL
    SELECT 'streaks',
           user_id, CAST(longest_up_streak AS BIGINT), CAST(n_streaks AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(n_events AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM (
        SELECT user_id, max(n) AS longest_up_streak,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM (
            SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n
            FROM (
                SELECT user_id,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM (
                    SELECT user_id, ts, event_id,
                           CASE WHEN value > lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC)
                                THEN 0 ELSE 1 END AS brk
                    FROM events
                ) _flags
            ) _islands
            GROUP BY user_id, sid
        ) _runs
        GROUP BY user_id
    ) _w7
    UNION ALL
    SELECT 'running_distinct',
           day, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           event_type,
           n_events, new_users, cum_users, CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM (
        WITH d10 AS (
            SELECT event_type, user_id,
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day
            FROM events
        ), daily10 AS (
            SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events
            FROM d10 GROUP BY 1, 2
        ), firsts10 AS (
            SELECT event_type, user_id, min(day) AS fday FROM d10 GROUP BY 1, 2
        ), news10 AS (
            SELECT event_type, fday AS day, CAST(count(*) AS BIGINT) AS new_users
            FROM firsts10 GROUP BY 1, 2
        ), cum10 AS (
            SELECT DISTINCT event_type, day,
                   CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY day)
                        AS BIGINT) AS cum_users
            FROM d10
        )
        SELECT dl.event_type, dl.day, dl.n_events,
               coalesce(n.new_users, 0) AS new_users, c.cum_users
        FROM daily10 dl
        LEFT JOIN news10 n ON n.event_type = dl.event_type AND n.day = dl.day
        JOIN cum10 c ON c.event_type = dl.event_type AND c.day = dl.day
    ) _w10
    """,
    doc=(
        "W1 row_number/rank/dense_rank/ntile + W2 lag/lead/first_value over per-user "
        "event timelines (one window spec -> ONE Window node over ONE user_id "
        "exchange) + W3 running decimal sum (unbounded-preceding frame) and moving "
        "average (bounded frame) over per-supplier lineitem, merged as a tagged "
        "union — one graded slot for all three W ids; each source keeps its own "
        "single exchange, the union is exchange-free. Round 6 adds W4 "
        "event-time RANGE frames (value-offset boundary, trailing "
        "3600 s; ties = peers by definition), W6 distribution "
        "functions (percent_rank/cume_dist/nth_value — three frames, "
        "one shared Window node per (partition, order)) and W7 "
        "longest-increasing-streak (value-direction gaps-and-islands "
        "computed ENTIRELY in window space — running last-start "
        "position + full-partition aggregates, ONE user_id exchange, "
        "zero groupBy re-shuffles) as fourth, fifth and sixth arms. "
        "Round 8 adds W10 running DISTINCT counts — the windowed "
        "COUNT(DISTINCT) Spark lacks, via the first-occurrence-flag "
        "decomposition (O(1) row state, never a set in frame state), "
        "cross-proved against DuckDB's native windowed DISTINCT"
    ),
)
def w1_w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    we = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    rank_part = e.select(
        F.lit("rank_analytic").alias("mode"),
        F.col("user_id").alias("k1"),
        F.col("event_id").alias("k2"),
        F.lit(None).cast("long").alias("k3"),
        "event_type",
        F.row_number().over(we).cast("long").alias("rn"),
        F.rank().over(we).cast("long").alias("rnk"),
        F.dense_rank().over(we).cast("long").alias("drnk"),
        F.ntile(4).over(we).cast("long").alias("quartile"),
        F.lag("event_type").over(we).alias("prev_type"),
        F.lead("event_type").over(we).alias("next_type"),
        F.first("event_type").over(we).alias("first_type"),
        F.round(F.col("value") - F.lag("value").over(we), 4).alias("value_delta"),
        F.lit(None).cast("double").alias("running_qty"),
        F.lit(None).cast("double").alias("moving_avg_qty"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    order = [F.col("l_shipdate").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]
    wl = Window.partitionBy("l_suppkey").orderBy(*order)
    framed_part = li.select(
        F.lit("framed_agg").alias("mode"),
        F.col("l_suppkey").alias("k1"),
        F.col("l_orderkey").alias("k2"),
        F.col("l_linenumber").cast("long").alias("k3"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("long").alias("rn"),
        F.lit(None).cast("long").alias("rnk"),
        F.lit(None).cast("long").alias("drnk"),
        F.lit(None).cast("long").alias("quartile"),
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("string").alias("first_type"),
        F.lit(None).cast("double").alias("value_delta"),
        F.round(
            F.sum(F.col("l_quantity").cast(DEC)).over(wl.rowsBetween(Window.unboundedPreceding, 0)).cast("double"), 4
        ).alias("running_qty"),
        F.round(F.avg("l_quantity").over(wl.rowsBetween(-3, 0)), 4).alias("moving_avg_qty"),
    )
    p = e.filter(F.col("event_type") == "purchase").withColumn(
        "es", F.unix_timestamp(F.col("ts")).cast("long")
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("es")).rangeBetween(-3600, 0)
    range_part = p.select(
        F.lit("range_frame").alias("mode"),
        F.col("user_id").alias("k1"),
        F.col("event_id").alias("k2"),
        F.col("es").alias("k3"),
        F.lit(None).cast("string").alias("event_type"),
        F.count(F.lit(1)).over(wr).cast("long").alias("rn"),
        F.lit(None).cast("long").alias("rnk"),
        F.lit(None).cast("long").alias("drnk"),
        F.lit(None).cast("long").alias("quartile"),
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("string").alias("first_type"),
        F.lit(None).cast("double").alias("value_delta"),
        F.round(
            F.sum(F.col("value").cast(DEC)).over(wr).cast("double"), 4
        ).alias("running_qty"),
        F.lit(None).cast("double").alias("moving_avg_qty"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    wd = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wfull = wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dist_part = o.select(
        F.lit("distribution").alias("mode"),
        F.col("o_orderkey").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("long").alias("k3"),
        F.col("o_orderstatus").alias("event_type"),
        F.lit(None).cast("long").alias("rn"),
        F.lit(None).cast("long").alias("rnk"),
        F.lit(None).cast("long").alias("drnk"),
        F.lit(None).cast("long").alias("quartile"),
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("string").alias("first_type"),
        (F.floor(F.percent_rank().over(wd) * 1e6 + 0.5) / 1e6).alias("value_delta"),
        (F.floor(F.cume_dist().over(wd) * 1e6 + 0.5) / 1e6).alias("running_qty"),
        F.round(F.nth_value("o_totalprice", 3).over(wfull).cast("double"), 4)
        .alias("moving_avg_qty"),
    )
    # W7 longest increasing streak: value-direction gaps-and-islands
    # computed ENTIRELY in window space — brk flags a streak start,
    # the running last-start position gives each row's current streak
    # length, and full-partition frames take the max/count/sum — so
    # the whole arm rides the ONE user_id exchange (a groupBy(user,
    # island) formulation would re-shuffle the full event set twice)
    wrun = we.rowsBetween(Window.unboundedPreceding, 0)
    wfull_u = we.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    brk = F.when(F.col("value") > F.lag("value").over(we), F.lit(0)).otherwise(F.lit(1))
    flagged = e.select(
        "user_id", "ts", "event_id",
        brk.alias("brk"),
        F.row_number().over(we).alias("rn"),
    ).withColumn(
        "cur_len",
        F.col("rn")
        - F.last(F.when(F.col("brk") == 1, F.col("rn")), ignorenulls=True).over(wrun)
        + 1,
    )
    runs = (
        flagged.select(
            "user_id", "rn",
            F.max("cur_len").over(wfull_u).cast("long").alias("longest"),
            F.sum("brk").over(wfull_u).cast("long").alias("n_streaks"),
            F.count(F.lit(1)).over(wfull_u).cast("long").alias("n_events"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    streak_part = runs.select(
        F.lit("streaks").alias("mode"),
        F.col("user_id").alias("k1"),
        F.col("longest").cast("long").alias("k2"),
        F.col("n_streaks").alias("k3"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("n_events").alias("rn"),
        F.lit(None).cast("long").alias("rnk"),
        F.lit(None).cast("long").alias("drnk"),
        F.lit(None).cast("long").alias("quartile"),
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("string").alias("first_type"),
        F.lit(None).cast("double").alias("value_delta"),
        F.lit(None).cast("double").alias("running_qty"),
        F.lit(None).cast("double").alias("moving_avg_qty"),
    )
    # round-8 arm: W10 running distinct counts via the first-occurrence
    # decomposition (scale-correct form of the windowed COUNT DISTINCT
    # Spark lacks; the standalone entry's oracle cross-proves against
    # DuckDB's native windowed DISTINCT)
    from datalake_polygonscan_spark.queries.registry import REGISTRY as _REG

    w10 = _REG["w10_running_distinct"].fn(spark, sf_dir).select(
        F.lit("running_distinct").alias("mode"),
        F.col("day").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("long").alias("k3"),
        "event_type",
        F.col("n_events").alias("rn"),
        F.col("new_users").alias("rnk"),
        F.col("cum_users").alias("drnk"),
        F.lit(None).cast("long").alias("quartile"),
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("string").alias("first_type"),
        F.lit(None).cast("double").alias("value_delta"),
        F.lit(None).cast("double").alias("running_qty"),
        F.lit(None).cast("double").alias("moving_avg_qty"),
    )
    return (
        rank_part.unionByName(framed_part)
        .unionByName(range_part)
        .unionByName(dist_part)
        .unionByName(streak_part)
        .unionByName(w10)
    )


@register(
    "w4_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
           CAST(count(*) OVER tr AS BIGINT) AS n_trailing_1h,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER tr AS DOUBLE), 4)
               AS sum_trailing_1h
    FROM events
    WHERE event_type = 'purchase'
    WINDOW tr AS (PARTITION BY user_id
                  ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc=(
        "W4 event-time RANGE frame — the frame type W3's ROWS frames "
        "don't exercise: per-user trailing-3600-SECOND purchase count "
        "and decimal sum, where the frame boundary is a VALUE offset "
        "on the ordering key (all epoch-second peers included, so "
        "ties are deterministic by definition — no tiebreak column "
        "needed, unlike ROWS). Same single Exchange+Sort shape; the "
        "sum is exact DECIMAL so frame membership is the only thing "
        "the oracle can disagree on — and it can't"
    ),
)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    es = F.unix_timestamp(F.col("ts")).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("es"))
        .rangeBetween(-3600, 0)
    )
    return e.withColumn("es", es).select(
        "event_id", "user_id", "es",
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing_1h"),
        F.round(
            F.sum(F.col("value").cast(DEC)).over(w).cast("double"), 4
        ).alias("sum_trailing_1h"),
    )


@register(
    "w6_distribution_windows",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(CAST(o_totalprice AS DOUBLE), 4) AS o_totalprice,
           floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
           floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume_dist,
           ROUND(CAST(nth_value(o_totalprice, 3) OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE), 4)
               AS third_cheapest
    FROM orders WHERE o_orderkey % 5 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    doc=(
        "W6 distribution window functions — percent_rank (rank-1)/"
        "(n-1), cume_dist (rows <= current)/n, and nth_value over the "
        "full-partition frame (the 'third cheapest in its status "
        "class' lookup): completes the ranking family W1 started. "
        "Total order (price, key) makes every rank deterministic; the "
        "two ratios are single IEEE divisions of exact integers, "
        "quantized floor(x*1e6+0.5) per the half-way lesson; one "
        "Exchange + one Sort serve all three functions"
    ),
)
def w6_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey", "o_orderstatus",
            F.round(F.col("o_totalprice").cast("double"), 4).alias("o_totalprice"),
            (F.floor(F.percent_rank().over(w) * 1e6 + 0.5) / 1e6).alias("pct_rank"),
            (F.floor(F.cume_dist().over(w) * 1e6 + 0.5) / 1e6).alias("cume_dist"),
            F.round(F.nth_value("o_totalprice", 3).over(wfull).cast("double"), 4)
            .alias("third_cheapest"),
        )
    )


# ---------------------------------------------------------------------------
# W10 running DISTINCT counts: the missing-builtin workaround, cross-proved
# ---------------------------------------------------------------------------


@register(
    "w10_running_distinct",
    oracle="""
    WITH d AS (
        SELECT event_type, user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day
        FROM events
    ), daily AS (
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events
        FROM d GROUP BY 1, 2
    ), firsts AS (
        SELECT event_type, user_id, min(day) AS fday FROM d GROUP BY 1, 2
    ), news AS (
        SELECT event_type, fday AS day, CAST(count(*) AS BIGINT) AS new_users
        FROM firsts GROUP BY 1, 2
    ), cum AS (
        SELECT DISTINCT event_type, day,
               CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS cum_users
        FROM d
    )
    SELECT dl.event_type, dl.day, dl.n_events,
           coalesce(n.new_users, 0) AS new_users, c.cum_users
    FROM daily dl
    LEFT JOIN news n ON n.event_type = dl.event_type AND n.day = dl.day
    JOIN cum c ON c.event_type = dl.event_type AND c.day = dl.day
    """,
    doc=(
        "W10 running DISTINCT user counts per type-day — the windowed "
        "COUNT(DISTINCT) Spark's window functions famously do NOT "
        "support, solved by the scale-correct FIRST-OCCURRENCE "
        "decomposition: a user's first-seen day carries a +1, and the "
        "running distinct count is a plain cumulative SUM of those "
        "flags — two partial-agg groupBys + one window sum, state "
        "O(1) per row. The tempting collect_set-over-frame form "
        "holds every partition's ENTIRE user set in each row's frame "
        "state (OOM at 100 TB); this one never materializes a set. "
        "The oracle cross-proves against DuckDB's NATIVE windowed "
        "COUNT(DISTINCT ...) OVER — an independent formulation, so a "
        "wrong flag, double-counted returning user or frame "
        "off-by-one value-fails"
    ),
)
def w10_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").cast("long").alias("n_events"))
    firsts = ev.groupBy("event_type", "user_id").agg(F.min("day").alias("fday"))
    news = firsts.groupBy("event_type", F.col("fday").alias("day")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.join(news, ["event_type", "day"], "left")
        .select(
            "event_type", "day", "n_events",
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
        .withColumn("cum_users", F.sum("new_users").over(w).cast("long"))
    )
