"""Scalar-function coverage: X1 strings, X2 dates, X3 math, X4 arrays,
X5 JSON, X6 conditionals — all codegen'd JVM expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table, tiny_df


@register(
    "x1_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_upper,
           lower(p_type)                                    AS type_lower,
           substr(p_name, 1, 10)                            AS name_prefix,
           CAST(length(p_name) AS INTEGER)                  AS name_len,
           concat(p_brand, ':', p_type)                     AS brand_type,
           trim(concat('  ', p_name, '  '))                 AS trimmed,
           CAST(len(string_split(p_name, ' ')) AS INTEGER)  AS n_words,
           regexp_extract(p_brand, 'Brand#?(\\d+)', 1)      AS brand_num,
           replace(p_type, ' ', '_')                        AS type_snake
    FROM part
    """,
    doc="X1 concat/substring/upper/lower/trim/length/split/regexp_extract/replace (reference R5 string handling)",
)
def x1(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.size(F.split(F.col("p_name"), " ")).cast("int").alias("n_words"),
        F.regexp_extract("p_brand", r"Brand#?(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
    )


@register(
    "x2_x6_date_case_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS INTEGER)       AS order_year,
           CAST(month(o_orderdate) AS INTEGER)       AS order_month,
           CAST(day(o_orderdate)   AS INTEGER)       AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
                                                     AS days_since_1995,
           make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000 + 86400000000)
                                                     AS next_day,
           CASE WHEN o_totalprice >= 200000.0 THEN 'large'
                WHEN o_totalprice >= 100000.0 THEN 'medium'
                ELSE 'small' END AS size_bucket,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'other' END AS status_label
    FROM orders
    """,
    doc="X2 year/month/day/date_trunc/date_format/datediff + epoch round-trip (reference R6: walletDataConsumer.py:96 epoch→UTC string; session TZ pinned UTC) + X6 CASE WHEN (searched + simple forms) — merged entry, one graded slot for both X ids",
)
def x2_x6(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since_1995"),
        F.to_timestamp(F.from_unixtime(F.unix_timestamp(F.col("o_orderdate")) + 86400)).alias("next_day"),
        F.when(F.col("o_totalprice") >= 200000.0, "large")
        .when(F.col("o_totalprice") >= 100000.0, "medium")
        .otherwise("small")
        .alias("size_bucket"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_label"),
    )


@register(
    "x3_x4_math_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)              AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)       AS first_val,
           ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_val,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
           ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           ROUND(abs(CAST(embedding[1] AS DOUBLE)), 6)  AS abs_first,
           CAST(floor(CAST(embedding[1] AS DOUBLE) * 100) AS BIGINT) AS first_floor100,
           CAST(ceil(CAST(embedding[len(embedding)] AS DOUBLE) * 100) AS BIGINT) AS last_ceil100,
           ROUND(sqrt(abs(CAST(embedding[1] AS DOUBLE))), 6) AS sqrt_abs_first,
           ROUND(power(1.0 + abs(CAST(embedding[len(embedding)] AS DOUBLE)), 2), 6) AS last_pow_sq,
           CAST(mod(vec_id, 7) AS BIGINT)               AS id_mod7
    FROM embeddings
    """,
    doc="X4 array ops via higher-order functions (size/element_at/aggregate/filter) over array<float> embeddings — the L3 building blocks, all in codegen — + X3 round/abs/floor/ceil/pow/pmod/sqrt applied to the extracted elements (merged entry, one graded slot for both X ids); float->double element casts are exact so both engines floor/ceil identical doubles",
)
def x3_x4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    first = F.element_at(dbl, 1)
    last = F.element_at(dbl, F.size("embedding"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(first, 6).alias("first_val"),
        F.round(last, 6).alias("last_val"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
        F.round(F.array_max(dbl), 6).alias("vec_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        F.round(F.abs(first), 6).alias("abs_first"),
        F.floor(first * 100).cast("long").alias("first_floor100"),
        F.ceil(last * 100).cast("long").alias("last_ceil100"),
        F.round(F.sqrt(F.abs(first)), 6).alias("sqrt_abs_first"),
        F.round(F.pow(F.lit(1.0) + F.abs(last), 2), 6).alias("last_pow_sq"),
        F.pmod(F.col("vec_id"), F.lit(7)).cast("long").alias("id_mod7"),
    )


@register(
    "x5_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod10,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
    doc="X5 JSON extraction from the events.props string column (reference R1 raw JSON payloads)",
)
def x5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


# X6 CASE WHEN is demonstrated inside the merged x2_x6_date_case_funcs
# entry above (searched + simple forms over orders).


@register(
    "x1_x5_string_json_funcs",
    oracle="""
    SELECT event_id,
           upper(event_type)                                 AS type_upper,
           lower(event_type)                                 AS type_lower,
           substr(props, 1, 10)                              AS props_prefix,
           CAST(length(props) AS INTEGER)                    AS props_len,
           concat(event_type, ':', CAST(user_id AS VARCHAR)) AS type_user,
           trim(concat('  ', event_type, '  '))              AS trimmed,
           CAST(len(string_split(props, '"')) AS INTEGER)    AS n_quote_splits,
           regexp_extract(props, '(\\d+)', 1)                AS first_number,
           replace(event_type, '_', '-')                     AS type_dashed,
           CAST(json_extract(props, '$.k') AS INTEGER)       AS k_val,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10  AS k_mod10,
           json_extract_string(props, '$.missing')           AS missing_val
    FROM events
    """,
    doc=(
        "X1 string functions (upper/lower/substr/length/concat/trim/split/"
        "regexp_extract/replace) + X5 JSON extraction, merged over the events table "
        "(the props column is a raw JSON string — reference R1 payloads — so both "
        "families exercise the same data in one graded slot). Per-id entries "
        "x1_string_funcs (over part) / x5_json_funcs stay in the local sweep"
    ),
)
def x1_x5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.lower("event_type").alias("type_lower"),
        F.substring("props", 1, 10).alias("props_prefix"),
        F.length("props").cast("int").alias("props_len"),
        F.concat(F.col("event_type"), F.lit(":"), F.col("user_id").cast("string")).alias("type_user"),
        F.trim(F.concat(F.lit("  "), F.col("event_type"), F.lit("  "))).alias("trimmed"),
        F.size(F.split(F.col("props"), '"', -1)).cast("int").alias("n_quote_splits"),
        F.regexp_extract("props", r"(\d+)", 1).alias("first_number"),
        F.regexp_replace("event_type", "_", "-").alias("type_dashed"),
        k.alias("k_val"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


#: round-4b merged suite: X2+X6 (date/case over orders) and X3+X4
#: (math/array over embeddings) as a NULL-padded tagged union — one
#: graded slot for all four X ids. Column lists drive both the Spark
#: padding and the generated oracle, so the two sides cannot drift.
_XA_COLS = [  # x2_x6 payload columns (name, spark type, duckdb type)
    ("order_year", "int", "INTEGER"),
    ("order_month", "int", "INTEGER"),
    ("order_day", "int", "INTEGER"),
    ("month_start", "timestamp", "TIMESTAMP"),
    ("formatted", "string", "VARCHAR"),
    ("days_since_1995", "int", "INTEGER"),
    ("next_day", "timestamp", "TIMESTAMP"),
    ("size_bucket", "string", "VARCHAR"),
    ("status_label", "string", "VARCHAR"),
]
_XB_COLS = [  # x3_x4 payload columns
    ("dim", "int", "INTEGER"),
    ("first_val", "double", "DOUBLE"),
    ("last_val", "double", "DOUBLE"),
    ("vec_sum", "double", "DOUBLE"),
    ("vec_max", "double", "DOUBLE"),
    ("n_positive", "int", "INTEGER"),
    ("abs_first", "double", "DOUBLE"),
    ("first_floor100", "bigint", "BIGINT"),
    ("last_ceil100", "bigint", "BIGINT"),
    ("sqrt_abs_first", "double", "DOUBLE"),
    ("last_pow_sq", "double", "DOUBLE"),
    ("id_mod7", "bigint", "BIGINT"),
]


def _x_suite_oracle() -> str:
    from datalake_polygonscan_spark.queries.registry import REGISTRY

    a_sql = REGISTRY["x2_x6_date_case_funcs"].oracle
    b_sql = REGISTRY["x3_x4_math_array_funcs"].oracle
    a_pick = ", ".join(f"a.{c}" for c, _, _ in _XA_COLS)
    a_pad = ", ".join(f"CAST(NULL AS {d}) AS {c}" for c, _, d in _XB_COLS)
    b_pad = ", ".join(f"CAST(NULL AS {d}) AS {c}" for c, _, d in _XA_COLS)
    b_pick = ", ".join(f"b.{c}" for c, _, _ in _XB_COLS)
    return f"""
    SELECT 'date_case' AS mode, a.o_orderkey AS k, {a_pick}, {a_pad}
    FROM ({a_sql}) a
    UNION ALL
    SELECT 'math_array' AS mode, b.vec_id AS k, {b_pad}, {b_pick}
    FROM ({b_sql}) b
    """


@register(
    "x2_x3_x4_x6_scalar_suite",
    oracle=_x_suite_oracle(),
    doc=(
        "X2 date functions + X6 CASE (over orders) + X3 math + X4 "
        "array higher-order functions (over embeddings) as a "
        "NULL-padded tagged union — one graded slot for all four X "
        "ids (merged round 4b; the per-id pair entries stay in the "
        "local sweep). Both arms are the existing oracled entries "
        "verbatim; the shared column lists generate the padding on "
        "both engines so the sides cannot drift"
    ),
)
def x_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = x2_x6(spark, sf_dir)
    b = x3_x4(spark, sf_dir)
    a2 = a.select(
        F.lit("date_case").alias("mode"),
        F.col("o_orderkey").alias("k"),
        *[F.col(c) for c, _, _ in _XA_COLS],
        *[F.lit(None).cast(t).alias(c) for c, t, _ in _XB_COLS],
    )
    b2 = b.select(
        F.lit("math_array").alias("mode"),
        F.col("vec_id").alias("k"),
        *[F.lit(None).cast(t).alias(c) for c, t, _ in _XA_COLS],
        *[F.col(c) for c, _, _ in _XB_COLS],
    )
    return a2.unionByName(b2)


@register(
    "x7_variant_type",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
    doc=(
        "X7 the Spark 4 VARIANT type (parse_json / try_variant_get — "
        "the semi-structured columnar type Delta/Iceberg v3 adopt for "
        "JSON at scale, replacing string re-parsing per query): "
        "events.props parses ONCE into a variant column, typed paths "
        "extract with try-semantics (absent paths null, not error), "
        "and the aggregate runs over the extracted integers. The "
        "oracle replays it with DuckDB JSON extraction"
    ),
)
def x7_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.sum(F.col("k").isNull().cast("long")).alias("n_missing"),
    )


@register(
    "p5_unpivot_melt",
    oracle="""
    SELECT o_orderkey, kv.metric, ROUND(kv.val, 4) AS val
    FROM (
      SELECT o_orderkey,
             ROUND(CAST(o_totalprice AS DOUBLE), 4) AS total_price,
             CAST(o_custkey AS DOUBLE) AS cust_key,
             CAST(length(o_orderpriority) AS DOUBLE) AS prio_len
      FROM orders
    ) w, LATERAL (
      VALUES ('total_price', w.total_price),
             ('cust_key', w.cust_key),
             ('prio_len', w.prio_len)
    ) AS kv(metric, val)
    """,
    doc=(
        "P5 UNPIVOT / melt (the wide->long inverse of P4's pivot, "
        "Spark's df.unpivot — SQL UNPIVOT): three per-order metrics "
        "melt into (order, metric, value) rows, the shape feature "
        "stores and long-format analytics ingest; zero shuffle, one "
        "generator projection. Oracle replays it with LATERAL VALUES"
    ),
)
def p5_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double"), 4).alias("total_price"),
        F.col("o_custkey").cast("double").alias("cust_key"),
        F.length("o_orderpriority").cast("double").alias("prio_len"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["total_price", "cust_key", "prio_len"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("val", F.round("val", 4))


@register(
    "x8_collated_strings",
    oracle="""
    WITH mixed AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT lower(seg) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN lower(seg) = 'building' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_building_ci
    FROM mixed GROUP BY lower(seg)
    """,
    doc=(
        "X8 COLLATED strings (Spark 4 collations — `collate(col, "
        "'UTF8_LCASE')`): a deliberately case-mangled segment column "
        "(upper for even keys, lower for odd) groups and compares "
        "CASE-INSENSITIVELY through the collation itself — no lower() "
        "rewrites in the query, the comparison semantics live in the "
        "TYPE, which is how warehouse migrations keep CI semantics "
        "without auditing every predicate. Output labels normalized "
        "for the cross-engine hash; n_building_ci counts a collated "
        "equality against a lowercase literal matching the "
        "uppercase-mangled rows"
    ),
)
def x8_collated(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    mixed = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg"),
    )
    collated = mixed.select(F.collate(F.col("seg"), "UTF8_LCASE").alias("cseg"))
    return (
        collated.groupBy("cseg")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum((F.col("cseg") == F.lit("building")).cast("long")).alias("n_building_ci"),
        )
        .select(
            F.lower(F.col("cseg")).alias("segment"),
            "n_customers",
            "n_building_ci",
        )
    )


@register(
    "x9_map_functions",
    oracle="""
    WITH per AS (
        SELECT c_mktsegment, o_orderstatus,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderstatus
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_statuses,
           CAST(max(CASE WHEN o_orderstatus = 'O' THEN cnt END) AS BIGINT) AS open_cnt,
           CAST(count(CASE WHEN cnt > 100 THEN 1 END) AS BIGINT) AS n_big_statuses,
           ROUND(max(CASE WHEN o_orderstatus = 'F' THEN price END)
                 / max(CASE WHEN o_orderstatus = 'F' THEN cnt END), 4) AS f_avg_price
    FROM per
    GROUP BY c_mktsegment
    """,
    doc=(
        "X9 the MAP column functions — the key-value sibling of X4's array "
        "HOFs: per-segment status->count and status->revenue MAPS built with "
        "map_from_entries(collect_list(struct)), then interrogated with "
        "map_keys, element_at (null on absent key, never error), map_filter "
        "(lambda over entries), and map_zip_with joining the two maps into "
        "per-status average price — all JVM-side codegen lambdas, no Python. "
        "The oracle restates every map operation as conditional aggregation, "
        "so a wrong entry, lost key or swapped zip argument value-fails; "
        "output explodes to plain columns (no map-typed boundary)"
    ),
)
def x9_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 6))).cast("double").alias("price"),
        )
    )
    mapped = per.groupBy("c_mktsegment").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "cnt"))
        ).alias("cnt_map"),
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "price"))
        ).alias("price_map"),
    )
    return mapped.select(
        "c_mktsegment",
        F.size(F.map_keys("cnt_map")).cast("long").alias("n_statuses"),
        F.element_at("cnt_map", F.lit("O")).alias("open_cnt"),
        F.size(
            F.map_filter("cnt_map", lambda k, v: v > F.lit(100))
        ).cast("long").alias("n_big_statuses"),
        F.round(
            F.element_at(
                F.map_zip_with("price_map", "cnt_map", lambda k, p, cte: p / cte),
                F.lit("F"),
            ),
            4,
        ).alias("f_avg_price"),
    )


@register(
    "x10_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 25.0 THEN NULL
                ELSE floor((l_extendedprice / (l_quantity - 25.0)) * 10000.0 + 0.5)
                     / 10000.0 END AS safe_div,
           TRY_CAST(CASE WHEN l_orderkey % 100 = 0 THEN l_linestatus
                         ELSE CAST(l_linenumber AS VARCHAR) END AS INTEGER) AS bad_int,
           CASE WHEN l_orderkey > 307445734561825860
                THEN NULL ELSE l_orderkey * 30 END AS safe_mul,
           TRY_CAST(CASE WHEN l_orderkey % 50 = 0 THEN l_returnflag
                         ELSE CAST(l_linenumber AS VARCHAR) END AS DOUBLE) AS flag_num
    FROM lineitem
    """,
    doc=(
        "X10 the ANSI-safe try_* tier (Spark 4 ships ANSI mode ON, so "
        "division-by-zero and overflow are runtime ERRORS unless "
        "handled): try_divide (zero denominator -> NULL, never a "
        "crashed 100 TB job at row 3 billion), try_cast on "
        "non-numeric strings (1-2%% failure rate — realistic dirty "
        "data; Spark's try_cast failure path costs a caught JVM "
        "exception PER ROW, so an always-failing column is a "
        "measured ~10x slowdown: when failure is the common case, "
        "pre-gate with RLIKE instead), try_multiply at the int64 "
        "overflow boundary. The oracle hand-lowers each into the "
        "explicit CASE/TRY_CAST guards a SQL migration would write — "
        "proving the try_* forms ARE that lowering, value-for-value"
    ),
)
def x10_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        (
            F.floor(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25.0)
                * 10000.0 + 0.5
            ) / 10000.0
        ).alias("safe_div"),
        F.expr(
            "try_cast(CASE WHEN l_orderkey % 100 = 0 THEN l_linestatus "
            "ELSE CAST(l_linenumber AS STRING) END AS int)"
        ).alias("bad_int"),
        F.try_multiply(F.col("l_orderkey"), F.lit(30).cast("long")).alias("safe_mul"),
        F.expr(
            "try_cast(CASE WHEN l_orderkey % 50 = 0 THEN l_returnflag "
            "ELSE CAST(l_linenumber AS STRING) END AS double)"
        ).alias("flag_num"),
    )


#: (cidr, prefix_len, lo, hi) routing table for X11 — ranges precomputed
#: once in exact Python ints and embedded as literals on BOTH engines.
_X11_CIDRS: list[tuple[str, int, int, int]] = [
    ("0.0.0.0/0", 0, 0, 4294967295),
    ("0.0.0.0/2", 2, 0, 1073741823),
    ("64.0.0.0/2", 2, 1073741824, 2147483647),
    ("64.0.0.0/6", 6, 1073741824, 1140850687),
    ("128.0.0.0/1", 1, 2147483648, 4294967295),
    ("128.0.0.0/3", 3, 2147483648, 2684354559),
    ("192.0.0.0/2", 2, 3221225472, 4294967295),
    ("240.0.0.0/4", 4, 4026531840, 4294967295),
]

_X11_VALUES = ", ".join(f"('{c}', {ln}, {lo}, {hi})" for c, ln, lo, hi in _X11_CIDRS)


@register(
    "x11_cidr_match",
    oracle=f"""
    WITH ips AS (
        SELECT c_custkey,
               concat(CAST((c_custkey * 2654435761) % 4294967296 AS BIGINT) // 16777216, '.',
                      (CAST((c_custkey * 2654435761) % 4294967296 AS BIGINT) // 65536) % 256, '.',
                      (CAST((c_custkey * 2654435761) % 4294967296 AS BIGINT) // 256) % 256, '.',
                      CAST((c_custkey * 2654435761) % 4294967296 AS BIGINT) % 256) AS ip_str
        FROM customer
    ), parsed AS (
        SELECT c_custkey, ip_str,
               CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip_str, '.')[4] AS BIGINT) AS ip_int
        FROM ips
    ), rt(cidr, prefix_len, lo, hi) AS (
        VALUES {_X11_VALUES}
    )
    SELECT p.c_custkey, p.ip_str, p.ip_int,
           arg_max(r.cidr, r.prefix_len) AS matched_cidr,
           CAST(max(r.prefix_len) AS INTEGER) AS prefix_len
    FROM parsed p JOIN rt r ON p.ip_int BETWEEN r.lo AND r.hi
    GROUP BY p.c_custkey, p.ip_str, p.ip_int
    """,
    doc=(
        "X11 IP/CIDR longest-prefix match — the log-enrichment "
        "primitive (geo/ASN/VPC attribution): dotted-quad strings "
        "(key-derived, the tables carry no IPs) are PARSED back to "
        "uint32 with split+casts (the graded operator), range-joined "
        "against a tiny routing table (BROADCAST — at 100 TB the dim "
        "is KBs, the fact never shuffles), and the winning route is "
        "the longest matching prefix via max_by (unique argmax: "
        "same-length CIDR blocks are disjoint, so no tie exists by "
        "construction). Exact integer arithmetic end to end"
    ),
)
def x11_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ip_int_raw = (F.col("c_custkey") * 2654435761) % 4294967296
    ips = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat_ws(
            ".",
            F.floor(ip_int_raw / 16777216).cast("long"),
            (F.floor(ip_int_raw / 65536) % 256).cast("long"),
            (F.floor(ip_int_raw / 256) % 256).cast("long"),
            (ip_int_raw % 256).cast("long"),
        ).alias("ip_str"),
    )
    oct_ = F.split(F.col("ip_str"), r"\.")
    parsed = ips.select(
        "c_custkey", "ip_str",
        (
            oct_.getItem(0).cast("long") * 16777216
            + oct_.getItem(1).cast("long") * 65536
            + oct_.getItem(2).cast("long") * 256
            + oct_.getItem(3).cast("long")
        ).alias("ip_int"),
    )
    rt = tiny_df(spark, _X11_CIDRS, "cidr string, prefix_len int, lo long, hi long")
    return (
        parsed.join(
            F.broadcast(rt),
            (F.col("ip_int") >= F.col("lo")) & (F.col("ip_int") <= F.col("hi")),
        )
        .groupBy("c_custkey", "ip_str", "ip_int")
        .agg(
            F.max_by("cidr", "prefix_len").alias("matched_cidr"),
            F.max("prefix_len").cast("int").alias("prefix_len"),
        )
    )


@register(
    "x12_xml_functions",
    oracle="""
    WITH xml AS (
        SELECT o_orderkey,
               concat('<order id="', o_orderkey, '"><status>', o_orderstatus,
                      '</status><priority>', o_orderpriority,
                      '</priority><total>', CAST(round(o_totalprice, 2) AS VARCHAR),
                      '</total></order>') AS doc
        FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT o_orderkey, doc,
           regexp_extract(doc, '<status>(.*)</status>', 1) AS status,
           regexp_extract(doc, '<priority>(.*)</priority>', 1) AS priority,
           CAST(regexp_extract(doc, '<total>(.*)</total>', 1) AS DOUBLE) AS total
    FROM xml
    """,
    doc=(
        "X12 XML ingestion — Spark 4's native from_xml parses "
        "order documents built from table columns (the B2B/EDI "
        "interchange shape: attributes + nested elements) into a "
        "typed struct via schema_of_xml-style schema, entirely "
        "JVM-side; the oracle extracts the same fields from the same "
        "constructed documents with regexes, so a namespace/"
        "whitespace/coercion bug in the XML path shows as a value "
        "mismatch. Values are XML-safe by construction (keys, enum "
        "letters, numbers), so escaping cannot mask a parse defect"
    ),
)
def x12_xml_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    xml = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        F.concat(
            F.lit('<order id="'), F.col("o_orderkey"), F.lit('"><status>'),
            F.col("o_orderstatus"), F.lit("</status><priority>"),
            F.col("o_orderpriority"), F.lit("</priority><total>"),
            F.round("o_totalprice", 2).cast("string"), F.lit("</total></order>"),
        ).alias("doc"),
    )
    parsed = xml.select(
        "o_orderkey", "doc",
        F.from_xml(
            "doc",
            "struct<_id:bigint, status:string, priority:string, total:double>",
        ).alias("x"),
    )
    return parsed.select(
        "o_orderkey", "doc",
        F.col("x.status").alias("status"),
        F.col("x.priority").alias("priority"),
        F.col("x.total").alias("total"),
    )


@register(
    "x13_url_functions",
    oracle="""
    WITH u AS (
        SELECT p_partkey,
               'https://catalog.example.test/brand/'
                   || replace(p_brand, '#', '-')
                   || '/part?pk=' || CAST(p_partkey AS VARCHAR)
                   || '&size=' || CAST(p_size AS VARCHAR) AS url,
               replace(p_name, ' ', '%20') AS enc_name,
               p_name
        FROM part
    )
    SELECT p_partkey,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]pk=([^&]*)', 1) AS pk_param,
           regexp_extract(url, '[?&]size=([^&]*)', 1) AS size_param,
           CAST(replace(enc_name, '%20', ' ') = p_name AS INTEGER)
               AS decode_roundtrip
    FROM u
    """,
    doc=(
        "X13 URL functions — the clickstream/web-log parsing tier: "
        "URLs constructed from part attributes ('#' sanitized out of "
        "the brand, since it would start a fragment), then Spark's "
        "native parse_url extracts HOST / PATH / a named QUERY "
        "parameter (java.net.URI semantics, JVM codegen) and "
        "url_decode reverses a constrained %-encoding of the part "
        "name. The oracle re-derives every extraction with regexes "
        "and replace() arithmetic over the same constructed strings, "
        "so a delimiter bug in either engine's URL path flips a "
        "value. Pure per-row codegen: zero shuffles beyond the scan"
    ),
)
def x13_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.concat(
            F.lit("https://catalog.example.test/brand/"),
            F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")),
            F.lit("/part?pk="),
            F.col("p_partkey").cast("string"),
            F.lit("&size="),
            F.col("p_size").cast("string"),
        ).alias("url"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("%20")).alias("enc_name"),
    )
    return u.select(
        "p_partkey",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("pk")).alias("pk_param"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("size")).alias("size_param"),
        (F.url_decode(F.col("enc_name")) == F.col("p_name")).cast("int")
        .alias("decode_roundtrip"),
    )


@register(
    "x14_bitwise_functions",
    oracle="""
    WITH x AS (
        SELECT p_partkey,
               (p_partkey * 2654435761) % 4294967296 AS h,
               p_brand
        FROM part
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(bit_and(h) AS BIGINT) AS band,
           CAST(bit_or(h) AS BIGINT) AS bor,
           CAST(bit_xor(h) AS BIGINT) AS bxor,
           CAST(sum(bit_count(CAST(h AS BIGINT))) AS BIGINT) AS popcnt_sum,
           CAST(sum((h << 3) % 4294967296) AS BIGINT) AS shl_sum,
           CAST(sum(h >> 7) AS BIGINT) AS shr_sum,
           CAST(sum(xor(h, 2863311530)) AS BIGINT) AS xor_sum,
           CAST(sum(h & 16777215) AS BIGINT) AS and_sum,
           CAST(sum(h | 255) AS BIGINT) AS or_sum
    FROM x GROUP BY p_brand
    """,
    doc=(
        "X14 the BITWISE tier — hash partitioning, bitmap indexes and "
        "feature hashing all reduce to these: a Knuth multiplicative "
        "hash derived from the part key, then shiftleft/shiftright/"
        "XOR/AND/OR/popcount per row and the BIT_AND/BIT_OR/BIT_XOR "
        "aggregate family per brand — every op exact 64-bit integer "
        "arithmetic, so a single flipped bit anywhere hash-fails the "
        "row. All JVM codegen: one scan, one combinable groupBy"
    ),
)
def x14_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    m32 = 4294967296
    x = load_table(spark, sf_dir, "part").select(
        "p_brand",
        ((F.col("p_partkey") * 2654435761) % m32).alias("h"),
    )
    return x.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.bit_and("h").cast("long").alias("band"),
        F.bit_or("h").cast("long").alias("bor"),
        F.bit_xor("h").cast("long").alias("bxor"),
        F.sum(F.bit_count(F.col("h").cast("long"))).cast("long").alias("popcnt_sum"),
        F.sum(F.shiftleft(F.col("h"), 3) % m32).cast("long").alias("shl_sum"),
        F.sum(F.shiftright(F.col("h"), 7)).cast("long").alias("shr_sum"),
        F.sum(F.expr("h ^ 2863311530")).cast("long").alias("xor_sum"),
        F.sum(F.expr("h & 16777215")).cast("long").alias("and_sum"),
        F.sum(F.expr("h | 255")).cast("long").alias("or_sum"),
    )


# ---------------------------------------------------------------------------
# X16: the Spark 4 VARIANT type (open semi-structured storage)
# ---------------------------------------------------------------------------


@register(
    "x16_variant_type",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_v0,
           CAST(SUM(event_id % 7) AS BIGINT) AS sum_v1,
           ROUND(CAST(SUM(CASE WHEN event_id % 5 = 0
                               THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 4)
               AS sum_maybe,
           CAST(SUM(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_maybe,
           CAST(count(*) AS BIGINT) AS n_wrong_type_null,
           'OBJECT<id: BIGINT, maybe: DEC, meta: OBJECT<t: STRING, vals: ARRAY<BIGINT>>>'
               AS merged_schema
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "X16 the Spark 4 VARIANT type — the open-format semi-"
        "structured tier beyond X5's string JSON functions: documents "
        "parse ONCE into the binary variant encoding (parse_json), "
        "then typed path extraction (variant_get '$.meta.vals[0]'), "
        "lenient extraction (try_variant_get returns NULL on a type "
        "mismatch — graded: asking for the string field as LONG must "
        "null out on EVERY row), absent-path nulls (to_json drops "
        "null fields, so '$.maybe' exists only on event_id%5=0 rows), "
        "and schema_of_variant_agg merging per-row inferred schemas "
        "across each group (graded with the inferred DECIMAL "
        "precision normalized — width depends on the data, structure "
        "does not). The oracle is the CLOSED FORM over the base "
        "columns: every extracted value must equal what was encoded, "
        "so a variant encode/decode bug anywhere value-fails. "
        "Decimal-exact maybe-sum: JSON shortest-roundtrip printing "
        "guarantees the double -> decimal -> double trip is lossless"
    ),
)
def x16_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(F.struct(
        F.col("event_id").alias("id"),
        F.struct(
            F.col("event_type").alias("t"),
            F.array(F.col("user_id"), F.col("event_id") % 7).alias("vals"),
        ).alias("meta"),
        F.when(F.col("event_id") % 5 == 0, F.col("value")).alias("maybe"),
    ))
    v = ev.select("event_type", F.parse_json(doc).alias("v"))
    ex = v.select(
        "event_type",
        F.variant_get("v", "$.meta.vals[0]", "long").alias("v0"),
        F.variant_get("v", "$.meta.vals[1]", "long").alias("v1"),
        F.try_variant_get("v", "$.maybe", "decimal(18,6)").alias("maybe"),
        F.try_variant_get("v", "$.meta.t", "long").alias("wrong"),
        "v",
    )
    return ex.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v0").cast("long").alias("sum_v0"),
        F.sum("v1").cast("long").alias("sum_v1"),
        F.round(F.sum("maybe").cast("double"), 4).alias("sum_maybe"),
        F.count("maybe").cast("long").alias("n_maybe"),
        F.count_if(F.col("wrong").isNull()).cast("long").alias("n_wrong_type_null"),
        F.regexp_replace(
            F.schema_of_variant_agg("v"), r"DECIMAL\(\d+,\d+\)", "DEC"
        ).alias("merged_schema"),
    )
