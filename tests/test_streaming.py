"""Structured Streaming behavior that batch oracles cannot check:
watermark eviction across micro-batches, streaming dedup state,
incremental session windows."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from datalake_polygonscan_spark.schemas import EVENTS_SCHEMA
from tests.conftest import SF_SMOKE
from datalake_polygonscan_spark.streaming.windows import (
    run_stream_available_now,
    session_window_agg,
    stream_dedup,
    tumbling_window_agg,
)


def _write_events_file(spark, path, rows):
    """Write rows as ONE bare parquet file at ``path`` (the streaming
    file source lists plain files; a .parquet output *directory* would
    confuse per-file triggering)."""
    import glob
    import shutil

    df = spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
    tmp = path + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)


def _ev(eid, ts_minutes, user=1, etype="click", value=1.0):
    return (eid, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=ts_minutes), user, etype, value, "{}")


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """File 1 advances event time to t+120m; file 2 (processed in a
    later micro-batch via maxFilesPerTrigger=1) carries an event 2h
    older than the watermark horizon (10m) — it must be dropped.
    In one batch (no watermark lag), it would be counted."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(spark, os.path.join(src, "f1.parquet"), [_ev(1, 0), _ev(2, 120)])
    _write_events_file(spark, os.path.join(src, "f2.parquet"), [_ev(3, 1)])  # late by ~2h

    out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: tumbling_window_agg(s, "10 minutes", watermark="10 minutes"),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    )
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2  # event 3 dropped by the watermark

    # batch mode over the same files counts all 3 (no lateness concept)
    batch = tumbling_window_agg(spark.read.schema(EVENTS_SCHEMA).parquet(src + "/*"), "10 minutes")
    assert batch.agg(F.sum("n_events")).collect()[0][0] == 3


def test_stream_dedup_across_batches(spark, tmp_path):
    """The same event_id arriving in a later micro-batch is dropped
    while its key is within the watermark-retained state."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(spark, os.path.join(src, "f1.parquet"), [_ev(1, 0), _ev(2, 1)])
    _write_events_file(spark, os.path.join(src, "f2.parquet"), [_ev(1, 0), _ev(4, 2)])

    out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: stream_dedup(s.withWatermark("ts", "1 hour"), keys=["event_id"]),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    )
    assert sorted(r.event_id for r in out.collect()) == [1, 2, 4]


def test_session_window_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [_ev(1, 0), _ev(2, 10), _ev(3, 60), _ev(4, 65), _ev(5, 200)]
    _write_events_file(spark, os.path.join(src, "f1.parquet"), rows)

    stream_out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: session_window_agg(s, "30 minutes", watermark="1 hour"),
        output_mode="complete",
        checkpoint_dir=str(tmp_path / "chk"),
    )
    batch_out = session_window_agg(spark.read.schema(EVENTS_SCHEMA).parquet(src + "/*"), "30 minutes")
    assert sorted(map(str, stream_out.collect())) == sorted(map(str, batch_out.collect()))
    assert stream_out.count() == 3  # sessions: {1,2}, {3,4}, {5}


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user state must accumulate across
    micro-batches — user 1's second-batch update reflects batch 1's
    rows, and the update stream contains one row per (user, batch)."""
    from datalake_polygonscan_spark.streaming.windows import stateful_running_totals

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(spark, os.path.join(src, "f1.parquet"),
                       [_ev(1, 0, user=1, value=2.0), _ev(2, 1, user=1, value=3.0), _ev(3, 2, user=2, value=1.0)])
    _write_events_file(spark, os.path.join(src, "f2.parquet"),
                       [_ev(4, 3, user=1, value=5.0)])
    updates = run_stream_available_now(
        spark, src, stateful_running_totals,
        output_mode="update", max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    ).collect()
    rows = sorted(((r.user_id, r.n_events, r.total_value) for r in updates))
    # user 1: batch-1 update (2 events, 5.0) then batch-2 update
    # carrying prior state (3 events, 10.0); user 2 only in batch 1
    assert rows == [(1, 2, 5.0), (1, 3, 10.0), (2, 1, 1.0)]


def test_interval_join_matches_across_batches(spark, tmp_path):
    """A right-side (error) event arriving in a LATER micro-batch must
    still join with a buffered left (click) row from batch 1 — that's
    the join-state retention stream-stream joins exist for. A right
    event outside the 30m interval must not match."""
    from datalake_polygonscan_spark.streaming.windows import (
        interval_join,
        run_two_stream_available_now,
    )

    l_src, r_src = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(l_src)
    os.makedirs(r_src)
    _write_events_file(spark, os.path.join(l_src, "f1.parquet"), [_ev(1, 0, etype="click")])
    # right side split over two files => two micro-batches
    _write_events_file(
        spark, os.path.join(r_src, "f1.parquet"), [_ev(10, 5, etype="error", value=2.0)]
    )
    _write_events_file(
        spark,
        os.path.join(r_src, "f2.parquet"),
        [_ev(11, 20, etype="error", value=3.0), _ev(12, 45, etype="error", value=9.0)],
    )

    out = run_two_stream_available_now(
        spark,
        l_src + "/*",
        r_src + "/*",
        lambda l, r: interval_join(l, r, "user_id", upper="30 minutes", watermark="1 hour"),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    )
    got = sorted((r.l_event_id, r.r_event_id) for r in out.collect())
    # event 11 (batch 2, t=20m) matched the batch-1 click; 12 (t=45m) is out of range
    assert got == [(1, 10), (1, 11)]


def test_stateful_sessionize_timeout_and_gap_close(spark, tmp_path):
    """E8: a session must close EITHER when a later same-key event
    proves the gap OR when the watermark passes last+gap with the key
    silent (EventTimeTimeout) — and the content is identical either
    way. user 2 goes silent forever: only the timer can close it."""
    from datalake_polygonscan_spark.streaming.windows import stateful_sessionize

    src = str(tmp_path / "src")
    os.makedirs(src)
    H = 60  # minutes per hour
    _write_events_file(
        spark,
        os.path.join(src, "f1.parquet"),
        [_ev(1, 0, user=1), _ev(2, 10, user=1), _ev(3, 0, user=2, value=5.0)],
    )
    _write_events_file(spark, os.path.join(src, "f2.parquet"), [_ev(4, 10 * H, user=1)])
    # sentinels: two far-future batches so every timer observes an
    # advanced watermark in a LATER batch and fires
    _write_events_file(spark, os.path.join(src, "f3.parquet"), [_ev(5, 30 * H, user=99)])
    _write_events_file(spark, os.path.join(src, "f4.parquet"), [_ev(6, 60 * H, user=99)])

    out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: stateful_sessionize(s, key="user_id", gap="6 hours", watermark="1 minute"),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    ).filter(F.col("user_id") < 99)

    rows = {
        (r["user_id"], r["session_start"].isoformat()): r
        for r in out.collect()
    }
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    assert len(rows) == 3

    s1 = rows[(1, t0.isoformat())]  # u1 first session: 2 events, gap-closed by event 4
    assert s1["n_events"] == 2 and s1["closed_by"] == "gap"
    assert s1["session_end"] == t0 + dt.timedelta(minutes=10)

    s2 = rows[(2, t0.isoformat())]  # u2: silent forever -> ONLY the timer closes it
    assert s2["n_events"] == 1 and s2["closed_by"] == "timeout"
    assert s2["session_value"] == 5.0

    s3 = rows[(1, (t0 + dt.timedelta(hours=10)).isoformat())]  # u1 second session
    assert s3["n_events"] == 1 and s3["closed_by"] == "timeout"


def test_stateful_sessionize_multiple_gaps_in_one_batch(spark, tmp_path):
    """Two gap closures inside a single micro-batch must both emit."""
    from datalake_polygonscan_spark.streaming.windows import stateful_sessionize

    src = str(tmp_path / "src")
    os.makedirs(src)
    H = 60
    _write_events_file(
        spark,
        os.path.join(src, "f1.parquet"),
        [_ev(1, 0, user=1), _ev(2, 8 * H, user=1), _ev(3, 16 * H, user=1)],
    )
    out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: stateful_sessionize(s, key="user_id", gap="6 hours", watermark="1 minute"),
        output_mode="append",
        checkpoint_dir=str(tmp_path / "chk"),
    )
    got = sorted((r["session_start"], r["closed_by"]) for r in out.collect())
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    # sessions at t0 and t0+8h closed by in-batch gaps; t0+16h stays open
    assert got == [(t0, "gap"), (t0 + dt.timedelta(hours=8), "gap")]


def test_stateful_sessionize_late_event_extends_session_start(spark, tmp_path):
    """A late-but-within-watermark event from a LATER micro-batch with
    a ts EARLIER than the stored session start must min-update the
    start — the batch gaps-and-islands oracle would have started the
    session there (round-3 ADVICE)."""
    from datalake_polygonscan_spark.streaming.windows import stateful_sessionize

    src = str(tmp_path / "src")
    os.makedirs(src)
    H = 60
    # batch 1: u1 at t=60m; batch 2: u1 at t=30m (late, inside the 6h
    # gap and the generous watermark) + the gap-prover at t=20h
    _write_events_file(spark, os.path.join(src, "f1.parquet"), [_ev(1, H, user=1)])
    _write_events_file(
        spark,
        os.path.join(src, "f2.parquet"),
        [_ev(2, 30, user=1), _ev(3, 20 * H, user=1)],
    )
    out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: stateful_sessionize(s, key="user_id", gap="6 hours", watermark="24 hours"),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    closed = {r["session_start"]: r for r in out.collect()}
    first = closed[t0 + dt.timedelta(minutes=30)]  # start = the LATE event's ts
    assert first["n_events"] == 2 and first["closed_by"] == "gap"
    assert first["session_end"] == t0 + dt.timedelta(minutes=60)


def test_outer_interval_join_emits_null_only_after_watermark(spark, tmp_path):
    """E9: an unmatched click emits null-extended ONLY once the
    watermark proves no matching error can still arrive — an error
    landing in a LATER micro-batch inside the interval must still
    match (no premature null), and a click with no error ever must
    surface exactly once with nulls after the watermark passes."""
    from datalake_polygonscan_spark.streaming.windows import (
        interval_join,
        run_two_stream_available_now,
    )

    l_src, r_src = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(l_src)
    os.makedirs(r_src)
    # click 1 gets its error in batch 2; click 2 never matches
    _write_events_file(
        spark, os.path.join(l_src, "f1.parquet"),
        [_ev(1, 0, etype="click"), _ev(2, 5, user=2, etype="click")],
    )
    _write_events_file(
        spark, os.path.join(l_src, "f2.parquet"), [_ev(3, 60 * 24, user=-1, etype="click")]
    )  # sentinel advances the left watermark past all real rows
    _write_events_file(
        spark, os.path.join(r_src, "f1.parquet"), [_ev(10, 20, etype="error", value=2.0)]
    )
    _write_events_file(
        spark, os.path.join(r_src, "f2.parquet"), [_ev(11, 60 * 24, user=-1, etype="error")]
    )  # sentinel advances the right watermark

    out = run_two_stream_available_now(
        spark,
        l_src + "/*",
        r_src + "/*",
        lambda l, r: interval_join(
            l, r, "user_id", upper="30 minutes", watermark="1 hour", how="left_outer"
        ),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    )
    got = sorted(
        (r.l_event_id, r.r_event_id) for r in out.filter(F.col("l_event_id") < 3).collect()
    )
    assert got == [(1, 10), (2, None)]


def test_dedup_within_watermark_collapses_retries_with_new_timestamps(spark, tmp_path):
    """E10: a re-delivered event whose retry carries a LATER timestamp
    (arriving in a later micro-batch, within the watermark delay) must
    collapse to one row — the case dropDuplicates(keys+ts) keeps twice;
    a re-delivery AFTER state eviction legitimately reappears."""
    from datalake_polygonscan_spark.streaming.windows import (
        run_stream_available_now,
        stream_dedup_within_watermark,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(spark, os.path.join(src, "f1.parquet"), [_ev(1, 0), _ev(2, 1)])
    # batch 2: event 1 re-delivered 5 minutes later (retry re-stamp)
    _write_events_file(spark, os.path.join(src, "f2.parquet"), [_ev(1, 5)])
    # batch 3: watermark jumps far ahead (delay 30m)...
    _write_events_file(spark, os.path.join(src, "f3.parquet"), [_ev(3, 600)])
    # batch 4: ...state eviction applies at batch boundaries...
    _write_events_file(spark, os.path.join(src, "f4.parquet"), [_ev(4, 620)])
    # batch 5: ...so a re-delivery of event 1 AFTER eviction reappears
    _write_events_file(spark, os.path.join(src, "f5.parquet"), [_ev(1, 630)])

    out = run_stream_available_now(
        spark,
        src + "/*",
        lambda s: stream_dedup_within_watermark(s, keys=["event_id"], delay="30 minutes"),
        output_mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "chk"),
    )
    got = sorted((r.event_id, r.ts.minute + r.ts.hour * 60) for r in out.collect())
    assert got == [(1, 0), (1, 630), (2, 1), (3, 600), (4, 620)]


def test_sessionize_identical_under_rocksdb_state_store(spark):
    """E8's stateful sessionization must produce identical output
    under the RocksDB state store provider — the state backend a
    100 TB streaming deployment actually tunes (HDFS-backed in-memory
    maps stop fitting executor heaps once key cardinality grows; the
    provider is a config swap, so semantics must not move)."""
    from datalake_polygonscan_spark.queries import REGISTRY

    sf = SF_SMOKE
    fn = REGISTRY["e8_stateful_sessionize"].fn
    base = sorted(map(tuple, fn(spark, sf).collect()))
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = sorted(map(tuple, fn(spark, sf).collect()))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert rocks == base
    assert len(base) > 0


def test_transform_with_state_typed_api_matches_batch(spark):
    """Spark 4's transformWithStateInPandas (the successor to
    applyInPandasWithState, with TYPED state primitives): a
    StatefulProcessor whose ValueState carries per-user (count, sum)
    across two real micro-batches must equal the batch group-by —
    and must agree exactly with the E5 applyInPandasWithState
    implementation of the same operator.

    The state-server protocol is protobuf — satisfied here either by
    the real google.protobuf runtime or by the from-scratch
    wire-format shim (streaming/state_protocol.py, round 8); skips
    only if neither is available."""
    import pytest

    from datalake_polygonscan_spark.streaming.transform_with_state import (
        _StateProtocolHandle,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime and the state-protocol shim failed")

    import os

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from datalake_polygonscan_spark.queries.sources_sinks import _scratch
    from datalake_polygonscan_spark.streaming.windows import run_stream_available_now
    from datalake_polygonscan_spark.tables import load_table

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("n", LongType()), StructField("total", DoubleType())])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

        def close(self) -> None:
            pass

    proc = RunningTotals()
    proc._state_protocol = _StateProtocolHandle()  # worker-side shim install
    ev = load_table(spark, SF_SMOKE, "events")
    src = _scratch("e12_stream", "events_two_files")
    ev.repartition(2).write.mode("overwrite").parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = run_stream_available_now(
            spark,
            src,
            lambda stream: stream.groupBy("user_id").transformWithStateInPandas(
                proc, out_schema, "update", "none"
            ),
            output_mode="update",
            max_files_per_trigger=1,
            checkpoint_dir=os.path.join(_scratch("e12_stream", "chk"), "e12"),
        )
        updates = updates.localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 4).alias("total_value"))
    )
    batch = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))


def test_statestore_reader_exposes_join_state_both_sides(spark, tmp_path):
    """E12 extension: the Spark 4 statestore source reads a
    STREAM-STREAM join's checkpointed state per side (joinSide
    option) — the surface used to debug retained-row buildup in
    interval joins. Controlled timestamps make the retained sets
    deterministic: with watermark 10m and all events inside one
    batch, rows too old to ever match again are evicted at the final
    watermark commit."""
    import os

    from datalake_polygonscan_spark.schemas import EVENTS_SCHEMA

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    # left views at t+0 and t+100m; right purchases at t+1m and t+101m
    _write_events_file(
        spark,
        os.path.join(src, "f1.parquet"),
        [_ev(1, 0, etype="view"), _ev(2, 100, etype="view"),
         _ev(3, 1, etype="purchase"), _ev(4, 101, etype="purchase")],
    )
    left = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src + "/*")
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("lts"), F.col("event_id").alias("lid"))
        .withWatermark("lts", "10 minutes")
    )
    right = (
        spark.readStream.schema(EVENTS_SCHEMA).parquet(src + "/*")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("ruid"), F.col("ts").alias("rts"),
                F.col("event_id").alias("rid"))
        .withWatermark("rts", "10 minutes")
    )
    j = left.join(
        right,
        (F.col("user_id") == F.col("ruid"))
        & (F.col("rts").between(F.col("lts"), F.col("lts") + F.expr("interval 30 minutes"))),
    )
    import uuid as _uuid

    name = "mem_" + _uuid.uuid4().hex[:8]
    q = (
        j.writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(availableNow=True).option("checkpointLocation", chk).start()
    )
    q.awaitTermination()
    assert spark.table(name).count() == 2  # both pairs matched

    sides = {}
    for side in ("left", "right"):
        st = spark.read.format("statestore").option("joinSide", side).load(chk)
        sides[side] = sorted(
            r["value"]["lid" if side == "left" else "rid"] for r in st.collect()
        )
    # final watermark = max event time (t+101m) - 10m = t+91m: the
    # t+0/t+1m pair is evicted, the t+100/101m pair is retained
    assert sides["left"] == [2]
    assert sides["right"] == [4]
    meta = spark.read.format("state-metadata").load(chk)
    assert {r["operatorName"] for r in meta.collect()} == {"symmetricHashJoin"}


def test_transform_with_state_gate_reports_dependency(spark, tmp_path):
    """The gated TWS module must either run (protobuf present) or
    raise NotImplementedError naming the missing dependency — never
    fail obscurely inside the streaming worker."""
    import pytest

    from datalake_polygonscan_spark.streaming.transform_with_state import (
        transform_user_totals,
        tws_available,
    )

    if tws_available():
        pytest.skip("state protocol available (real protobuf or scratch shim): "
                    "covered by the end-to-end test below")

    from datalake_polygonscan_spark.schemas import EVENTS_SCHEMA
    from datalake_polygonscan_spark.tables import load_table

    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").limit(10).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    with pytest.raises(NotImplementedError, match="protobuf"):
        transform_user_totals(stream)


def test_transform_with_state_module_matches_batch(spark):
    """End-to-end for streaming/transform_with_state.py (ValueState +
    MapState composite): per-user count/sum/distinct-type-count across
    two micro-batches must equal the batch group-by; runs through the
    real protobuf runtime or the from-scratch state-protocol shim
    (see module docstring)."""
    import pytest

    from datalake_polygonscan_spark.streaming.transform_with_state import (
        transform_user_totals,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime and the state-protocol shim failed")

    import os

    from pyspark.sql import Window

    from datalake_polygonscan_spark.queries.sources_sinks import _scratch
    from datalake_polygonscan_spark.streaming.windows import run_stream_available_now
    from datalake_polygonscan_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    src = _scratch("e18_tws", "events_two_files")
    ev.repartition(2).write.mode("overwrite").parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        updates = run_stream_available_now(
            spark, src, transform_user_totals,
            output_mode="update", max_files_per_trigger=1,
            checkpoint_dir=os.path.join(_scratch("e18_tws", "chk"), "e18"),
        )
        updates = updates.localCheckpoint()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events",
                F.round("total_value", 4).alias("total_value"), "n_types")
    )
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.countDistinct("event_type").alias("n_types"),
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))


def test_transform_with_state_event_time_timers(spark, tmp_path):
    """E21: sessions close from handleExpiredTimer on WATERMARK
    progress (no input for the key) — the timer protocol family
    through the from-scratch state runtime. The sentinel's session
    stays open: emission is timer-driven, not stream-end-driven."""
    import datetime
    import os

    import pytest

    from datalake_polygonscan_spark.streaming.transform_with_state import (
        transform_timer_sessions,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no protobuf runtime and the state-protocol shim failed")

    T0 = datetime.datetime(2024, 1, 1)
    sec = lambda s: T0 + datetime.timedelta(seconds=s)  # noqa: E731
    src = str(tmp_path / "src")
    os.makedirs(src)

    def mk(rows, name):
        df = spark.createDataFrame(rows, "user_id long, ts0 timestamp_ntz")
        df.select(
            "user_id", F.col("ts0").cast("timestamp").alias("ts"),
            F.expr("CAST(floor(unix_micros(CAST(ts0 AS TIMESTAMP))/1000) AS LONG)").alias("ts_ms"),
        ).coalesce(1).write.parquet(os.path.join(src, name))

    mk([(1, sec(0)), (1, sec(10)), (2, sec(0)), (2, sec(10)), (2, sec(20))], "b0")
    mk([(101, sec(600))], "b1")
    mk([(-1, sec(1200))], "b2")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, ts_ms long")
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            transform_timer_sessions(stream, gap_ms=60_000)
            .writeStream.outputMode("append").format("memory").queryName("e21_test")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        got = sorted(map(tuple, spark.table("e21_test").collect()))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert got == [(1, 2, 1), (2, 3, 1), (101, 1, 1)]  # sentinel -1 absent
