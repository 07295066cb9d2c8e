"""Streaming MERGE ingestion (streaming/ingest.py): at-least-once
micro-batch delivery + idempotent keyed merge = exactly-once table
state. Proven by: multi-batch upsert ordering via version_col,
checkpoint resume ingesting only new files, and full replay after
checkpoint loss converging to the identical table."""

from __future__ import annotations

import datetime
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_polygonscan_spark.io.sinks import history
from datalake_polygonscan_spark.streaming.ingest import stream_merge_ingest

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute, 0)


def _write_file(spark, src_dir: str, rows, name: str) -> None:
    df = spark.createDataFrame([(int(k), _ts(m), float(v)) for k, m, v in rows], SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/_stage_{name}")
    # move the part file in as one stable file so each file = one batch
    import glob
    import os

    part = glob.glob(f"{src_dir}/_stage_{name}/part-*.parquet")[0]
    os.makedirs(src_dir, exist_ok=True)
    shutil.move(part, f"{src_dir}/{name}.parquet")
    shutil.rmtree(f"{src_dir}/_stage_{name}")


def _state(df):
    return sorted((r["event_id"], r["ts"], r["value"]) for r in df.collect())


def test_multi_batch_upsert_last_version_wins(spark, tmp_path):
    src, tbl = str(tmp_path / "src"), str(tmp_path / "tbl")
    # file b revises key 1 with a LATER ts; file a also holds key 3
    _write_file(spark, src, [(1, 10, 1.0), (2, 10, 2.0)], "a")
    _write_file(spark, src, [(1, 20, 9.0), (3, 10, 3.0)], "b")
    live = stream_merge_ingest(
        spark, src, tbl, keys=["event_id"], version_col="ts",
        schema=SCHEMA, n_buckets=4, max_files_per_trigger=1,
    )
    got = {r["event_id"]: r["value"] for r in live.collect()}
    assert got == {1: 9.0, 2: 2.0, 3: 3.0}
    # one commit per non-empty micro-batch in the table history
    assert len(history(tbl)) == 2


def test_checkpoint_resume_ingests_only_new_files(spark, tmp_path):
    src, tbl = str(tmp_path / "src"), str(tmp_path / "tbl")
    _write_file(spark, src, [(1, 10, 1.0)], "a")
    stream_merge_ingest(
        spark, src, tbl, keys=["event_id"], version_col="ts",
        schema=SCHEMA, n_buckets=4,
    )
    versions_after_first = len(history(tbl))
    _write_file(spark, src, [(2, 11, 2.0)], "b")
    live = stream_merge_ingest(
        spark, src, tbl, keys=["event_id"], version_col="ts",
        schema=SCHEMA, n_buckets=4,
    )
    got = {r["event_id"]: r["value"] for r in live.collect()}
    assert got == {1: 1.0, 2: 2.0}
    # exactly one more commit: file a was NOT re-ingested
    assert len(history(tbl)) == versions_after_first + 1


def test_full_replay_after_checkpoint_loss_converges(spark, tmp_path):
    src, tbl = str(tmp_path / "src"), str(tmp_path / "tbl")
    _write_file(spark, src, [(1, 10, 1.0), (2, 10, 2.0)], "a")
    _write_file(spark, src, [(1, 20, 9.0)], "b")
    live1 = stream_merge_ingest(
        spark, src, tbl, keys=["event_id"], version_col="ts",
        schema=SCHEMA, n_buckets=4, max_files_per_trigger=1,
    )
    state1 = _state(live1)
    # lose the checkpoint: every file replays against the existing table
    shutil.rmtree(f"{tbl}/_stream_chk")
    live2 = stream_merge_ingest(
        spark, src, tbl, keys=["event_id"], version_col="ts",
        schema=SCHEMA, n_buckets=4, max_files_per_trigger=1,
    )
    assert _state(live2) == state1
