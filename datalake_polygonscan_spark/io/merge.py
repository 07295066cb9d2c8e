"""Incremental MERGE (upsert) ingest — the strict upgrade over the
reference's snapshot refresh (SURVEY.md §4.3, §7.3(6)).

The reference rebuilds ``wallet_txs`` from scratch weekly (TRUNCATE +
COPY, resources/redshift.py:80,98-104) and re-fetches full history
because it never tracks what it already has. Here:

- ``merge_upsert`` — Delta-style ``MERGE`` keyed on arbitrary columns
  (for wallet_txs: ``wallet_address``, ``tx_hash``): matched rows are
  replaced by the update, unmatched current rows are kept, new rows are
  inserted. Implemented as ``current LEFT ANTI updates ∪ updates`` —
  two narrow stages (one shuffle on the key) — and committed via the
  atomic pointer-swap sink, so readers never see a partial merge and
  the operation is idempotent (merging the same batch twice equals
  once).
- ``next_start_block`` — the high-watermark the reference hand-rolls as
  ``startblock`` (walletDataConsumer.py:57): 1 + max(block_number) of
  the live snapshot, so each incremental pull fetches only new blocks.

At 100 TB the anti-join side is the full table — exactly what Delta's
MERGE does under the hood (rewrite touched files); with the table
bucketed/partitioned by the merge key only matching partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.sinks import atomic_overwrite, current_snapshot_path, read_table


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Upsert ``updates`` into the atomic table at ``table_path`` keyed
    on ``keys``; returns the new live snapshot. Last-writer-wins per
    key: an update row fully replaces the current row with its key."""
    if current_snapshot_path(table_path) is None:
        atomic_overwrite(updates, table_path)
        return read_table(spark, table_path)
    current = read_table(spark, table_path)
    kept = current.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = kept.unionByName(updates.select(*current.columns))
    atomic_overwrite(merged, table_path)
    return read_table(spark, table_path)


def next_start_block(snapshot: DataFrame, block_col: str = "block_number") -> int:
    """R2's incremental watermark: first block not yet ingested
    (reference semantics: ``startblock`` param, walletDataConsumer.py:57)."""
    row = snapshot.agg(F.max(block_col).alias("mx")).collect()[0]
    return 0 if row["mx"] is None else int(row["mx"]) + 1
