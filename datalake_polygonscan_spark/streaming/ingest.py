"""Streaming ingestion into the atomic lakehouse tables — the
``readStream -> foreachBatch -> MERGE`` pattern that turns the
reference's weekly batch pull (walletDataConsumer.py:57's startblock
loop) into a continuously-running incremental pipeline.

Delivery semantics: Structured Streaming's file source + checkpoint
gives at-least-once delivery of each micro-batch to ``foreachBatch``;
the keyed ``merge_upsert`` sink is IDEMPOTENT (last-writer-wins per
key, deterministic ``version_col`` ordering), so replayed batches
converge to the same table state — the standard exactly-once-by-
idempotent-sink construction. A ``version_col`` (event time, block
number) additionally makes the final state independent of the ORDER
in which micro-batches happen to deliver same-key rows.

Scale: each micro-batch pays only its own bucket-pruned merge (the
batch's key-space decides which bucket directories rewrite); the
accreting small files per bucket are the job of
``io/maintenance.compact_snapshot`` (OPTIMIZE) scheduled out-of-band —
both writers go through the same CAS commit, so compaction and ingest
interleave safely (the loser retries).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from datalake_polygonscan_spark.io.merge import change_feed, merge_upsert
from datalake_polygonscan_spark.io.mview import refresh_aggregate
from datalake_polygonscan_spark.io.sinks import read_pointer, read_table
from datalake_polygonscan_spark.schemas import EVENTS_SCHEMA


def stream_merge_ingest(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    keys: list[str],
    version_col: str | None = None,
    schema: StructType = EVENTS_SCHEMA,
    n_buckets: int | None = None,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run an AvailableNow streaming ingest: every micro-batch of new
    files under ``source_dir`` is MERGEd (keyed upsert) into the atomic
    table at ``table_path``; returns the live table after the stream
    drains. Re-running with the same checkpoint ingests only files not
    yet processed; re-running after LOSING the checkpoint replays
    everything but converges to the same state (idempotent sink).

    ``max_files_per_trigger=1`` forces one micro-batch per source file
    — how the tests prove cross-batch upsert ordering and replay
    convergence."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert(
            batch_df.sparkSession,
            table_path,
            batch_df,
            keys,
            n_buckets=n_buckets,
            version_col=version_col,
        )

    chk = checkpoint_dir or os.path.join(table_path, "_stream_chk")
    q = (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk)
        .start()
    )
    q.awaitTermination()
    return read_table(spark, table_path)


def stream_merge_ingest_with_mv(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    mv_path: str,
    keys: list[str],
    group_cols: list[str],
    sum_cols: list[str],
    version_col: str | None = None,
    schema: StructType = EVENTS_SCHEMA,
    n_buckets: int | None = None,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The end-to-end incremental pipeline: every micro-batch derives
    its CDC feed against the CURRENT base table, folds it into the
    aggregate MV, then MERGEs into the base — so the MV tracks the
    base exactly, batch by batch, without ever rescanning it.

    Exactly-once on BOTH tables under at-least-once micro-batch
    delivery, via two complementary mechanisms:

    - the MV refresh is gated on the micro-batch id (Delta's
      ``txnVersion`` pattern — ``refresh_aggregate(txn_id=...)``), so a
      replayed batch cannot double-count its deltas;
    - the base merge is an idempotent keyed upsert, so replaying it is
      a no-op. Refresh commits BEFORE the base merge: a crash between
      the two replays the batch, skips the (already-applied) refresh,
      and redoes only the merge.

    Returns ``(live_base, live_mv)`` after the stream drains."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        current = (
            read_table(s, table_path)
            if read_pointer(table_path) is not None
            else batch_df.limit(0)
        )
        feed = change_feed(
            current, batch_df, keys, version_col=version_col, retractions=True
        )
        refresh_aggregate(
            s, mv_path, feed, group_cols, sum_cols, n_buckets=n_buckets, txn_id=batch_id
        )
        merge_upsert(
            s, table_path, batch_df, keys, n_buckets=n_buckets, version_col=version_col
        )

    chk = checkpoint_dir or os.path.join(table_path, "_stream_chk")
    q = (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk)
        .start()
    )
    q.awaitTermination()
    return read_table(spark, table_path), read_table(spark, mv_path)


def subscribe_changes(spark: SparkSession, table_path: str, feed_schema: StructType | str):
    """The documented continuous-CDC-subscribe surface: heal any
    interrupted feed publish FIRST (io/merge.py:repair_change_feed —
    a crash between a commit's pointer CAS and its feed rename must
    not become a version the file source silently never sees), then
    return the streaming reader over ``changes_glob``. Feed rows
    carry the table schema + ``_change_type`` + ``_commit_version``;
    consumers apply versions in ascending ``_commit_version`` order
    within each micro-batch (see the s17 registry entry's applier)."""
    from datalake_polygonscan_spark.io.merge import changes_glob, repair_change_feed

    repair_change_feed(table_path)
    return spark.readStream.schema(feed_schema).parquet(changes_glob(table_path))


def stream_fanout_txn(
    spark: SparkSession,
    source_dir: str,
    table_a: str,
    table_b: str,
    step_a,
    step_b,
    schema: StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
):
    """E15 — one stream, TWO sinks, atomically consistent.

    Every micro-batch derives each sink's next state (``step_a`` /
    ``step_b``: (old_state | None, batch_df) -> new_state) and commits
    BOTH states through one multi-table transaction (io/txn.py), so no
    reader ever sees sink A reflecting a batch sink B hasn't applied —
    the invariant foreachBatch alone cannot give (two independent
    writes can interleave with failure between them).

    Exactly-once: the batch id rides the commit metadata of every
    table in the transaction; a replayed batch (checkpoint loss,
    manual re-fire) whose id is already in the commit log is skipped
    BEFORE any staging. Sink states are ROLLUPS (old state union
    delta, re-aggregated), so each commit costs O(|groups|), not
    O(rows) — the 100 TB shape; pair with MoR deltas for fact sinks.

    Returns ``(apply_fn, applied_batch_ids)`` after draining an
    AvailableNow run: ``apply_fn`` lets tests replay a batch by hand.
    """
    from datalake_polygonscan_spark.io.sinks import history
    from datalake_polygonscan_spark.io.txn import txn_commit

    txn_root = os.path.join(os.path.dirname(table_a), "_fanout_txn")

    def _applied() -> set:
        return {
            e.get("stream_batch_id")
            for e in (history(table_a) if read_pointer(table_a) else [])
        }

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bid = f"b{batch_id}"
        if bid in _applied():
            return
        sp = batch_df.sparkSession
        states = []
        for table, step in ((table_a, step_a), (table_b, step_b)):
            old = read_table(sp, table) if read_pointer(table) is not None else None
            states.append((table, step(old, batch_df)))
        txn_commit(sp, txn_root, states, extra_meta={"stream_batch_id": bid})

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    chk = checkpoint_dir or os.path.join(table_a, "_stream_chk")
    q = (
        stream.writeStream.foreachBatch(_apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk)
        .start()
    )
    q.awaitTermination()
    return _apply, _applied()
