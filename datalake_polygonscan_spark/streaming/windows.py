"""Streaming operators E1-E4 (Structured Streaming).

Each operator is defined ONCE as a DataFrame transformation that is
valid on both batch and streaming DataFrames — the Structured
Streaming model (same logical plan, incrementalized physical plan).
That means:
- batch mode gives the DuckDB-oracle-checkable semantics,
- ``run_stream_available_now`` executes the *same* transformation as a
  real incremental stream (file source -> memory sink,
  Trigger.AvailableNow) for the tests that prove watermark/state
  behavior.

At scale the file source becomes Kafka/object-store listing; the
memory sink becomes a Delta/parquet ``foreachBatch`` writer; state
store semantics (watermark eviction, dedup TTL) are unchanged.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.schemas import EVENTS_SCHEMA


def windowed_agg(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """E1 — event-time windows: count + sum per (window, event_type).
    ``slide=None`` gives non-overlapping (tumbling) windows; with a
    slide, each event lands in width/slide windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    win = F.window("ts", width, slide) if slide else F.window("ts", width)
    return (
        src.groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def tumbling_window_agg(events: DataFrame, width: str = "10 minutes", watermark: str | None = None) -> DataFrame:
    """E1 — non-overlapping event-time windows (windowed_agg, no slide)."""
    return windowed_agg(events, width, slide=None, watermark=watermark)


def sliding_window_agg(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """E1 — overlapping windows (each event lands in width/slide windows)."""
    return windowed_agg(events, width, slide=slide)


def session_window_agg(events: DataFrame, gap: str = "30 minutes", watermark: str | None = None) -> DataFrame:
    """E3 — per-user session windows: a session extends while
    consecutive events are < gap apart; window end = last event + gap."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str], watermark: str | None = None) -> DataFrame:
    """E4 — drop duplicate events by key; with a watermark the state
    store evicts keys older than the horizon (bounded state — the only
    way dedup state survives an unbounded stream)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    cols = keys + ["ts"] if watermark else keys
    return src.dropDuplicates(cols)


def stateful_running_totals(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """E5 — CUSTOM stateful streaming operator via
    ``applyInPandasWithState``: per-key running (count, sum-of-value)
    carried in the state store across micro-batches, one updated row
    emitted per key per batch.

    This is the escape hatch for stateful logic Spark's built-ins
    can't express (built-in windows/dedup cover E1-E4; anything with
    bespoke state transitions lands here). State is explicit and
    bounded: one (bigint, double) pair per key; with unbounded key
    cardinality add a GroupStateTimeout instead of NoTimeout so idle
    keys evict. Arrow-batched per group — no per-row Python.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import pattern
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, pdf_iter, state: GroupState):
        cnt, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            cnt += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((cnt, tot))
        yield pd.DataFrame({"user_id": [key_tuple[0]], "n_events": [cnt], "total_value": [tot]})

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="cnt bigint, tot double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_UNITS_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
}


def _interval_us(spec: str) -> int:
    n, unit = spec.split()
    return int(n) * _UNITS_US[unit]


def stateful_sessionize(
    stream: DataFrame,
    key: str = "user_id",
    gap: str = "6 hours",
    watermark: str = "1 minute",
) -> DataFrame:
    """E8 — sessionization with EVENT-TIME TIMEOUTS
    (``applyInPandasWithState`` + ``GroupStateTimeout.EventTimeTimeout``).

    The built-in ``session_window`` (E3) closes a session only when the
    watermark passes its end inside the aggregation operator; this
    custom operator demonstrates the full arbitrary-stateful API: a
    session also closes when its key goes SILENT — ``state.hasTimedOut``
    fires once the watermark passes ``last_event + gap`` with no new
    data for the key — which is what per-entity TTL logic (abandoned
    carts, connection liveness, fraud windows) needs and windowed
    aggregation cannot express.

    Per key the state is four scalars (session start/last epoch-micros,
    count, value sum) — bounded regardless of stream length; idle keys
    EVICT on timeout, so state size tracks live keys, not ever-seen
    keys (the unbounded-cardinality fix NoTimeout operators lack).

    A session's emitted content is identical whether a later same-key
    event proves the gap or the timer fires first (``closed_by`` =
    'gap' | 'timeout' records which); content is therefore exactly the
    batch gaps-and-islands sessionization of the input — the oracle.
    Open sessions at end-of-stream are never emitted (append
    semantics); drive the watermark past ``last + gap`` to flush.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import pattern
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _interval_us(gap)

    def _emit(key_val, st, last, n, tot, how):
        return {
            key: key_val,
            "session_start": pd.Timestamp(st, unit="us"),
            "session_end": pd.Timestamp(last, unit="us"),
            "n_events": n,
            "session_value": tot,
            "closed_by": how,
        }

    def update(key_tuple, pdf_iter, state: GroupState):
        key_val = key_tuple[0]
        closed: list[dict] = []
        if state.hasTimedOut:
            st, last, n, tot = state.get
            closed.append(_emit(key_val, st, last, n, tot, "timeout"))
            state.remove()
        else:
            st, last, n, tot = state.get if state.exists else (None, None, 0, 0.0)
            pdfs = [pdf for pdf in pdf_iter if len(pdf)]
            if pdfs:
                batch = pd.concat(pdfs).sort_values(["ts", "event_id"])
                for ts, v in zip(batch["ts"], batch["value"]):
                    ts_us = pd.Timestamp(ts).value // 1000
                    if st is None:
                        st, last, n, tot = ts_us, ts_us, 1, float(v)
                    elif ts_us - last > gap_us:
                        closed.append(_emit(key_val, st, last, n, tot, "gap"))
                        st, last, n, tot = ts_us, ts_us, 1, float(v)
                    else:
                        # a late-but-within-watermark event can carry a
                        # ts EARLIER than the stored session start (it
                        # joined via the gap test against `last`); the
                        # batch gaps-and-islands oracle would have
                        # started the session there, so min-update st
                        # alongside the max-update of last
                        st, last, n, tot = min(st, ts_us), max(last, ts_us), n + 1, tot + float(v)
            if st is not None:
                state.update((st, last, n, tot))
                # fire once the WATERMARK (event time, not wall clock)
                # passes the session's gap horizon
                state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            closed,
            columns=[key, "session_start", "session_end", "n_events", "session_value", "closed_by"],
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=(
                f"{key} bigint, session_start timestamp, session_end timestamp, "
                "n_events bigint, session_value double, closed_by string"
            ),
            stateStructType="st bigint, last bigint, n bigint, tot double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_available_now(
    spark: SparkSession,
    source_dir: str,
    transform,
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Execute ``transform`` as a real incremental stream over parquet
    files in ``source_dir`` (schema-enforced file source), collecting
    into a memory sink with Trigger.AvailableNow; returns the result
    table as a batch DataFrame.

    ``max_files_per_trigger=1`` forces one micro-batch per file, which
    is how the tests drive watermark eviction / late-data drops across
    batch boundaries.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    out = transform(stream)
    name = "mem_" + uuid.uuid4().hex[:12]
    chk_root = checkpoint_dir or os.path.join(os.path.dirname(source_dir.rstrip("/")), "_checkpoints")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(chk_root, f"_chk_{name}"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    upper: str = "30 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """E6/E9 — stream-stream interval (time-bounded) join: each left
    event matched to right events of the same key with
    ``left.ts <= right.ts <= left.ts + upper``.

    Batch/stream-polymorphic like the rest of this module. In
    streaming mode BOTH sides carry watermarks and the join condition
    bounds event time in both directions — exactly what Spark's state
    cleanup needs to evict buffered rows once the watermark passes
    ``ts + upper`` (without the bounds, join state grows forever).
    Inner-join matches emit immediately (append mode); the watermark
    only drives eviction.

    ``how="left_outer"`` (E9) additionally emits each UNMATCHED left
    event null-extended — but only once the watermark passes its
    eviction time, since until then a matching right row could still
    arrive; Spark's no-data micro-batches handle the final flush. This
    is the streaming form of "every click, with its error if any" —
    an absence signal an inner join cannot produce.

    Output: (key, <l_prefix>event_id, <l_prefix>ts, <r_prefix>event_id,
    <r_prefix>ts, <r_prefix>value).
    """
    l = left.select(
        F.col(key).alias(key),
        F.col("event_id").alias(f"{left_prefix}event_id"),
        F.col("ts").alias(f"{left_prefix}ts"),
    )
    r = right.select(
        F.col(key).alias(f"_r_{key}"),
        F.col("event_id").alias(f"{right_prefix}event_id"),
        F.col("ts").alias(f"{right_prefix}ts"),
        F.col("value").alias(f"{right_prefix}value"),
    )
    if watermark:
        l = l.withWatermark(f"{left_prefix}ts", watermark)
        r = r.withWatermark(f"{right_prefix}ts", watermark)
    cond = (
        (F.col(key) == F.col(f"_r_{key}"))
        & (F.col(f"{right_prefix}ts") >= F.col(f"{left_prefix}ts"))
        & (F.col(f"{right_prefix}ts") <= F.col(f"{left_prefix}ts") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(f"_r_{key}")


def run_two_stream_available_now(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    transform,
    output_mode: str = "append",
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Like :func:`run_stream_available_now` but for binary (two-input)
    stream transformations — e.g. the stream-stream interval join."""

    def reader(d: str) -> DataFrame:
        r = spark.readStream.schema(EVENTS_SCHEMA)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return r.parquet(d)

    out = transform(reader(left_dir), reader(right_dir))
    name = "mem_" + uuid.uuid4().hex[:12]
    chk_root = checkpoint_dir or os.path.join(os.path.dirname(left_dir.rstrip("/")), "_checkpoints")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(chk_root, f"_chk_{name}"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_dedup_within_watermark(events: DataFrame, keys: list[str], delay: str) -> DataFrame:
    """E10 — ``dropDuplicatesWithinWatermark``: dedup on the KEY
    COLUMNS ALONE while the state store evicts keys once the watermark
    passes their first-seen time + delay. The semantic
    :func:`stream_dedup` cannot express: an at-least-once source that
    re-delivers an event with a DIFFERENT timestamp (retry stamped at
    send time — the common real-world duplicate) still collapses,
    because the event time is not part of the dedup key; plain
    ``dropDuplicates(keys)`` without ts would never evict state, and
    with ts it would keep both copies."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
