"""S6 incremental MERGE ingest (io/merge.py): upsert semantics,
idempotency, bootstrap, and the max-block watermark — the strict
upgrade over the reference's TRUNCATE+COPY weekly full refresh
(resources/redshift.py:80,98-104; startblock at walletDataConsumer.py:57)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.merge import merge_upsert, next_start_block
from datalake_polygonscan_spark.io.sinks import atomic_overwrite, read_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_bootstrap_creates_table(spark, tmp_table):
    batch = spark.createDataFrame([("w1", "h1", 10, 1.0)], ["wallet_address", "tx_hash", "block_number", "qty"])
    live = merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"])
    assert _rows(live) == _rows(batch)


def test_merge_updates_inserts_and_keeps(spark, tmp_table):
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    current = spark.createDataFrame(
        [("w1", "h1", 10, 1.0), ("w1", "h2", 11, 2.0), ("w2", "h3", 12, 3.0)], cols
    )
    atomic_overwrite(current, tmp_table)
    batch = spark.createDataFrame(
        [("w1", "h2", 11, 20.0),  # update: replaces the current row
         ("w2", "h4", 13, 4.0)],  # insert: new key
        cols,
    )
    live = merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"])
    assert _rows(live) == sorted(
        [("w1", "h1", 10, 1.0), ("w1", "h2", 11, 20.0), ("w2", "h3", 12, 3.0), ("w2", "h4", 13, 4.0)]
    )


def test_merge_idempotent(spark, tmp_table):
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    atomic_overwrite(spark.createDataFrame([("w1", "h1", 10, 1.0)], cols), tmp_table)
    batch = spark.createDataFrame([("w1", "h1", 10, 9.0), ("w1", "h2", 11, 2.0)], cols)
    once = _rows(merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"]))
    twice = _rows(merge_upsert(spark, tmp_table, batch, keys=["wallet_address", "tx_hash"]))
    assert once == twice == sorted([("w1", "h1", 10, 9.0), ("w1", "h2", 11, 2.0)])


def test_merge_equals_full_rebuild(spark, tmp_table):
    """overwrite(stale) + merge(corrections) == the corrected table —
    the same invariant the s6 registry oracle checks at sf0.01."""
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    truth = spark.createDataFrame(
        [(f"w{i % 3}", f"h{i}", i, float(i)) for i in range(30)], cols
    )
    stale = truth.withColumn("qty", F.col("qty") + 100.0)
    atomic_overwrite(stale, tmp_table)
    corrections = truth.filter(F.col("block_number") % 2 == 0)
    live = merge_upsert(spark, tmp_table, corrections, keys=["wallet_address", "tx_hash"])
    expected = truth.withColumn(
        "qty", F.when(F.col("block_number") % 2 == 0, F.col("qty")).otherwise(F.col("qty") + 100.0)
    )
    assert _rows(live) == _rows(expected)


def test_next_start_block_watermark(spark, tmp_table):
    cols = ["wallet_address", "tx_hash", "block_number", "qty"]
    atomic_overwrite(spark.createDataFrame([("w1", "h1", 41, 1.0), ("w1", "h2", 97, 2.0)], cols), tmp_table)
    assert next_start_block(read_table(spark, tmp_table)) == 98
    empty = spark.createDataFrame([], "wallet_address string, tx_hash string, block_number long, qty double")
    assert next_start_block(empty) == 0
