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

SCHEMA2 = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("grp", T.StringType()),
    ]
)


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute, 0)


def _write_file(spark, src_dir: str, rows, name: str) -> None:
    if len(rows[0]) == 4:
        df = spark.createDataFrame(
            [(int(k), _ts(m), float(v), str(g)) for k, m, v, g in rows], SCHEMA2
        )
    else:
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


def test_streaming_mv_tracks_base_and_survives_replay(spark, tmp_path):
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.io.mview import refresh_aggregate
    from datalake_polygonscan_spark.io.sinks import read_pointer
    from datalake_polygonscan_spark.streaming.ingest import stream_merge_ingest_with_mv

    src, tbl, mv = str(tmp_path / "src"), str(tmp_path / "tbl"), str(tmp_path / "mv")
    # grp = parity of event_id; file b revises key 1 (later ts) and
    # MOVES it from group odd to group even — pre/postimage retractions
    _write_file(spark, src, [(1, 10, 1.0, "odd"), (2, 10, 2.0, "even"), (4, 10, 4.0, "even")], "a")
    _write_file(spark, src, [(1, 20, 9.0, "even"), (3, 10, 3.0, "odd")], "b")

    def run():
        return stream_merge_ingest_with_mv(
            spark, src, tbl, mv,
            keys=["event_id"], group_cols=["grp"], sum_cols=["value"],
            version_col="ts", schema=SCHEMA2, n_buckets=4, max_files_per_trigger=1,
        )

    base, mv_df = run()
    def recompute(b):
        return sorted(
            (r["grp"], r["n"], str(r["s"]))
            for r in b.groupBy("grp").agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").alias("s"),
            ).collect()
        )
    def mv_rows(m):
        return sorted((r["grp"], r["n_rows"], str(r["sum_value"])) for r in m.collect())
    base_state = sorted(map(tuple, base.collect()))
    mv_state = mv_rows(mv_df)
    assert mv_state == recompute(base)
    assert read_pointer(mv)["applied_txn"] == 1

    # replay after checkpoint loss: base merge idempotent, MV refresh
    # produces a zero feed / is txn-gated -> both tables unchanged
    import shutil
    shutil.rmtree(f"{tbl}/_stream_chk")
    base2, mv2 = run()
    assert mv_rows(mv2) == mv_state
    assert sorted(map(tuple, base2.collect())) == base_state

    # direct txn idempotence: re-applying an old txn_id is a no-op
    bogus = spark.createDataFrame(
        [(99, "odd", 100.0, "insert")], ["event_id", "grp", "value", "_change_type"]
    )
    mv3 = refresh_aggregate(spark, mv, bogus.select("grp", "value", "_change_type"),
                            ["grp"], ["value"], n_buckets=4, txn_id=0)
    assert mv_rows(mv3) == mv_state
