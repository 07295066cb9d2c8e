"""Source/sink coverage: S1-S5 as oracle-checkable round-trips.

Each entry writes testdata out through the engine's sink in the target
format (to a scratch dir), reads it back through the schema-enforced
source, and aggregates — so the oracle (computed on the original
parquet) verifies the FULL write->read cycle, not just the read.
Scratch lives under the repo (driver containers may not share /tmp).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.io.sinks import atomic_overwrite, read_table, write_partitioned
from datalake_polygonscan_spark.io.sources import read_csv, read_json, read_parquet
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.schemas import EVENTS_SCHEMA, ORDERS_SCHEMA
from datalake_polygonscan_spark.tables import load_table

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def _scratch(*parts: str) -> str:
    path = os.path.join(SCRATCH, *parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


@register(
    "s1_parquet_scan",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="S1 parquet scan with filter+projection pushdown (verified in tests via explain: PushedFilters + pruned ReadSchema)",
)
def s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), F.sum(F.col("l_quantity").cast(T.DecimalType(18, 6))).alias("sum_qty"))
    )


@register(
    "s2_json_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           SUM(CAST(value AS DECIMAL(18,6))) AS total_value
    FROM events
    GROUP BY event_type
    """,
    doc="S2 schema-enforced JSON scan (FAILFAST, no inference): engine writes events as JSON lines, reads back with explicit schema, aggregates (reference R1's raw payloads are exactly this staged-JSON shape)",
)
def s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    path = _scratch("s2_json", "events_json")
    # timestamps serialized as ISO strings; schema cast on read restores them
    ev.write.mode("overwrite").json(path)
    back = read_json(spark, path, EVENTS_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(T.DecimalType(18, 6))).alias("total_value"),
    )


@register(
    "s3_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="S3 CSV scan with explicit schema + header (the reference's interchange format: df.to_csv at resources/redshift.py:69-70)",
)
def s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    path = _scratch("s3_csv", "orders_csv")
    o.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, ORDERS_SCHEMA, header=True)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 6))).alias("total"),
    )


@register(
    "s4_atomic_overwrite",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="S4 atomic snapshot-overwrite sink (pointer-swap; fixes the reference's non-atomic TRUNCATE+COPY at resources/redshift.py:80,98-104): overwrite twice, read live snapshot",
)
def s4(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    table = _scratch("s4_table", "customer_snap")
    # overwrite twice: second snapshot must fully replace the first
    atomic_overwrite(c.limit(10), table)
    atomic_overwrite(c, table)
    back = read_table(spark, table)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(T.DecimalType(18, 6))).alias("total_bal"),
    )


@register(
    "s5_partitioned_write",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="S5 hive-partitioned write + partition-pruned read (only the l_returnflag=R directory is scanned; pruning verified in tests)",
)
def s5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    path = _scratch("s5_part", "lineitem_by_flag")
    write_partitioned(li, path, ["l_returnflag"])
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n_rows"))
