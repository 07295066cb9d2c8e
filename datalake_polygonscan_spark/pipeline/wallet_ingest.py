"""The reference pipeline (R5-R13), re-expressed as one Spark job.

Reference dataflow (``walletDataConsumer.py:108-154``):
    per-wallet HTTP scan -> per-row project/cast/derive
    (``process_erc20_token_transfers``, :86-105) -> list.extend fan-in
    (:133) -> pandas materialize (:139) -> CSV->S3 -> Redshift
    TRUNCATE+COPY (``resources/redshift.py:114-130``).

Spark-first restatement:
- The 29-wallet serial loop becomes a single scan of a raw zone where
  each record already carries its wallet partition (at 100 TB the raw
  zone is wallet/block-partitioned JSON; executors never call HTTP).
- ``process_erc20_token_transfers`` becomes one ``select`` of codegen'd
  expressions (P1-P3, X2, X3) — no per-row Python.
- The fan-in (R8) is free: it's just one DataFrame over all partitions.
- TRUNCATE+COPY (R11/R12) becomes ``atomic_overwrite`` — readers never
  observe an empty table, crash-safe (io/sinks.py).
- Silent wallet-skip-on-error (R4, :74-80) becomes FAILFAST with an
  explicit PERMISSIVE+quarantine option (io/sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.functions.scalars import epoch_to_timestamp, scale_token_amount
from datalake_polygonscan_spark.io.sinks import atomic_overwrite, read_table
from datalake_polygonscan_spark.io.sources import read_json
from datalake_polygonscan_spark.schemas import raw_tokentx_with_wallet


def process_token_transfers(raw: DataFrame, wallet_col: str = "wallet_address") -> DataFrame:
    """R5-R7 as one projection (reference: walletDataConsumer.py:86-105).

    ``raw`` is RAW_TOKENTX_SCHEMA rows plus a ``wallet_address`` column
    (the reference injects the loop variable per wallet at :93; in the
    staged raw zone the wallet is recorded at landing time).
    """
    return raw.select(
        F.col(wallet_col).alias("wallet_address"),
        F.col("hash").alias("tx_hash"),
        F.col("blockNumber").cast("long").alias("block_number"),
        epoch_to_timestamp("timeStamp").alias("tx_time"),
        F.col("from").alias("from_address"),
        F.col("to").alias("to_address"),
        F.col("contractAddress").alias("token_contract"),
        F.col("tokenName").alias("token_name"),
        F.col("tokenSymbol").alias("token_symbol"),
        F.col("tokenDecimal").cast("int").alias("token_decimal"),
        scale_token_amount("value", "tokenDecimal").alias("quantity"),
    )


def run_snapshot_refresh(
    spark: SparkSession,
    raw_json_path: str,
    table_path: str,
    block_range: tuple[int, int] | None = None,
) -> DataFrame:
    """End-to-end refresh: raw zone -> wallet_txs snapshot (R13).

    ``block_range`` reproduces R2's startblock/endblock pushdown — as a
    DataFrame filter it reaches the file scan via Catalyst instead of a
    query-string parameter.
    """
    raw = read_json(spark, raw_json_path, raw_tokentx_with_wallet())
    txs = process_token_transfers(raw)
    if block_range is not None:
        lo, hi = block_range
        txs = txs.filter((F.col("block_number") >= lo) & (F.col("block_number") <= hi))
    # R3: the reference requests sort=asc from the API; a sorted write
    # gives parquet min/max block_number zone-map locality instead.
    txs = txs.sortWithinPartitions("block_number")
    atomic_overwrite(txs, table_path)
    return read_table(spark, table_path)


def wallet_summary(wallet_txs: DataFrame) -> DataFrame:
    """The flagship report: per-wallet transfer count + total quantity."""
    return (
        wallet_txs.groupBy("wallet_address")
        .agg(
            F.count("*").alias("n_transfers"),
            F.sum("quantity").alias("total_quantity"),
            F.max("block_number").alias("max_block"),
        )
        .orderBy("wallet_address")
    )
