"""as-of join semantics (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from datalake_polygonscan_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(1)), (3, 20, _ts(9)), (4, 30, _ts(4))],
        ["id", "key", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(2), 1.0),
            (101, 10, _ts(5), 2.0),   # equal-ts: inclusive match for left id=1
            (102, 10, _ts(7), 3.0),   # after id=1 -> never matched
            (103, 20, _ts(3), 4.0),
        ],
        ["event_id", "key", "ts", "v"],
    )
    out = {
        r.id: r
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts", right_tiebreak="event_id"
        ).collect()
    }
    assert out[1].asof_event_id == 101 and out[1].asof_v == 2.0  # inclusive <=
    assert out[2].asof_event_id is None  # no right row at-or-before ts=1
    assert out[3].asof_event_id == 103  # different key partition
    assert out[4].asof_event_id is None  # key with no right rows at all
    assert len(out) == 4  # every left row exactly once


def test_asof_join_equal_ts_tiebreak(spark):
    left = spark.createDataFrame([(1, 10, _ts(5))], ["id", "key", "ts"])
    right = spark.createDataFrame(
        [(100, 10, _ts(5), 1.0), (101, 10, _ts(5), 2.0)], ["event_id", "key", "ts", "v"]
    )
    row = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts", right_tiebreak="event_id"
    ).collect()[0]
    assert row.asof_event_id == 101  # greatest tiebreak wins deterministically


def test_asof_join_plan_has_no_join(spark):
    """The formulation is union+window: the physical plan must contain
    a window over the key sort and NO join operator — that's the scale
    contract (no per-key pair blowup)."""
    left = spark.createDataFrame([(1, 10, _ts(5))], ["id", "key", "ts"])
    right = spark.createDataFrame([(100, 10, _ts(2), 1.0)], ["event_id", "key", "ts", "v"])
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="ts", right_tiebreak="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Join" not in plan


def test_resample_forward_fill_grid_and_gaps(spark):
    from datalake_polygonscan_spark.operators.temporal import resample_forward_fill

    # key 10: events in hours 0 and 2 -> hour-1 row is a gap carrying 1.0;
    # within hour 2 the later event (tiebreak on equal ts) must win.
    def _h(hour, minute):
        return dt.datetime(2024, 1, 1, hour, minute, 0)

    rows = [
        (1, 10, _h(0, 30), 1.0),
        (2, 10, _h(2, 10), 5.0),
        (3, 10, _h(2, 10), 7.0),  # same ts as event 2, higher id -> wins
        (4, 20, _h(1, 0), 9.0),   # single-bucket key: 1-row grid
    ]
    df = spark.createDataFrame(rows, ["event_id", "key", "ts", "v"])
    out = {
        (r.key, r.bucket_start): r
        for r in resample_forward_fill(df, "key", "ts", "v", "event_id", 3600).collect()
    }
    base = int(_h(0, 0).replace(tzinfo=dt.timezone.utc).timestamp())
    k10 = [out[(10, base + h * 3600)] for h in range(3)]
    assert [(r.v, r.is_gap) for r in k10] == [(1.0, 0), (1.0, 1), (7.0, 0)]
    assert len(out) == 4  # 3 grid rows for key 10 + 1 for key 20
    assert out[(20, base + 3600)].v == 9.0


def test_funnel_order_matters_and_depth(spark):
    from datalake_polygonscan_spark.operators.temporal import funnel

    rows = [
        # user 1: full ordered funnel
        (1, 1, _ts(1), "view"), (2, 1, _ts(3), "click"), (3, 1, _ts(5), "purchase"),
        # user 2: purchase BEFORE click -> depth stops at 2
        (4, 2, _ts(1), "view"), (5, 2, _ts(4), "click"), (6, 2, _ts(2), "purchase"),
        # user 3: click without a prior view -> depth 0
        (7, 3, _ts(1), "click"), (8, 3, _ts(2), "purchase"),
        # user 4: click at the SAME ts as view counts (inclusive >=)
        (9, 4, _ts(6), "view"), (10, 4, _ts(6), "click"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r.user_id: r for r in funnel(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert out[1].funnel_depth == 3 and out[1].t_purchase == _ts(5)
    assert out[2].funnel_depth == 2 and out[2].t_purchase is None
    assert out[3].funnel_depth == 0 and out[3].t_view is None
    assert out[4].funnel_depth == 2 and out[4].t_click == _ts(6)
    assert len(out) == 4  # one row per key


def test_ewma_matches_reference_recurrence_and_is_partition_invariant(spark):
    """The applyInPandas EWMA must equal a driver-side Decimal replay
    of the recurrence, and be bit-identical regardless of input
    partitioning (the exact-decimal contract)."""
    from decimal import ROUND_HALF_UP, Decimal

    from datalake_polygonscan_spark.operators.temporal import ewma

    rows = [
        (i, k, float(v))
        for k, vals in [(1, [10.5, 11.25, 9.0, 14.125, 13.0]), (2, [100.0, 50.0]), (3, [7.77])]
        for i, v in enumerate(vals, start=k * 100)
    ]
    df = spark.createDataFrame(rows, ["seq", "k", "v"])

    def reference(vals):
        a, b, q = Decimal("0.25"), Decimal("0.75"), Decimal(1).scaleb(-12)
        y, out = None, []
        for v in vals:
            x = Decimal(str(v)).quantize(Decimal("1e-6"))
            y = x if y is None else (a * x + b * y).quantize(q, ROUND_HALF_UP)
            out.append(y)
        return out

    expect = {}
    for k, vals in [(1, [10.5, 11.25, 9.0, 14.125, 13.0]), (2, [100.0, 50.0]), (3, [7.77])]:
        for i, y in enumerate(reference(vals), start=1):
            expect[(k, i)] = y

    for n_part in (1, 7):
        got = ewma(df.repartition(n_part), key="k", value_col="v", order_cols=["seq"]).collect()
        assert len(got) == len(expect)
        for r in got:
            assert r["y"] == expect[(r["k"], r["i"])], (n_part, r)


def test_ewma_last_k_caps_each_series(spark):
    from datalake_polygonscan_spark.operators.temporal import ewma

    df = spark.createDataFrame([(i, 1, float(i)) for i in range(10)], ["seq", "k", "v"])
    got = ewma(df, key="k", value_col="v", order_cols=["seq"], last_k=4).collect()
    # only the trailing 4 rows survive, re-seeded at the window start
    assert sorted(r["seq"] for r in got) == [6, 7, 8, 9]
    seed = [r for r in got if r["i"] == 1][0]
    assert seed["seq"] == 6 and seed["y"] == seed["x"]


def test_asof_tolerance_voids_stale_matches(spark):
    import datetime as dt

    from datalake_polygonscan_spark.operators.temporal import asof_join_tolerance

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, t0 + dt.timedelta(minutes=90))], ["lid", "k", "ts"]
    )
    right = spark.createDataFrame(
        [(10, 1, t0), (11, 1, t0 + dt.timedelta(minutes=85))], ["rid", "k", "rts"]
    )
    # latest-at-or-before is 5 min away -> kept at tol=600s
    r = asof_join_tolerance(left, right, ["k"], "ts", "rts", "rid", 600).collect()[0]
    assert r["asof_rid"] == 11
    # tol=60s: the 5-min-old match is stale -> ABSENT, not the older row
    r = asof_join_tolerance(left, right, ["k"], "ts", "rts", "rid", 60).collect()[0]
    assert r["asof_rid"] is None and r["asof_rts"] is None


def test_asof_forward_matches_earliest_at_or_after(spark):
    import datetime as dt

    from datalake_polygonscan_spark.operators.temporal import asof_join_tolerance

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 1, t0)], ["lid", "k", "ts"])
    right = spark.createDataFrame(
        [(9, 1, t0 - dt.timedelta(minutes=1)),   # before: never matches forward
         (10, 1, t0),                            # equal ts: inclusive
         (11, 1, t0 + dt.timedelta(minutes=5))],
        ["rid", "k", "rts"],
    )
    r = asof_join_tolerance(
        left, right, ["k"], "ts", "rts", "rid", 3600, direction="forward"
    ).collect()[0]
    assert r["asof_rid"] == 10  # equal-ts row, inclusive >=
    # equal-ts ties resolve to the SMALLEST tiebreak
    right2 = spark.createDataFrame([(20, 1, t0), (12, 1, t0)], ["rid", "k", "rts"])
    r = asof_join_tolerance(
        left, right2, ["k"], "ts", "rts", "rid", 3600, direction="forward"
    ).collect()[0]
    assert r["asof_rid"] == 12


def test_ts5_linear_interpolation_values(spark):
    """Gaps fill with the exact linear ramp between neighbors; observed
    buckets pass through untouched; edges are observed by construction."""
    import datetime as dt

    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.operators.temporal import (
        resample_linear_interpolate,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30)

    def ev(i, hours, value):
        return (i, t0 + dt.timedelta(hours=hours), 7, value)

    rows = [
        ev(1, 0, 10.0),   # bucket 0: observed 10
        ev(2, 3, 16.0),   # bucket 3: observed 16 -> buckets 1,2 = 12,14
        ev(3, 4, 20.0),   # bucket 4: observed
        ev(4, 4.2, 30.0), # same bucket, later ts wins -> 30
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = {
        r.bucket_start: (r.value, r.is_gap)
        for r in resample_linear_interpolate(
            df, "user_id", "ts", "value", "event_id", 3600
        ).collect()
    }
    base = int(dt.datetime(2024, 1, 1, 0, 0).timestamp())
    assert out[base] == (10.0, 0)
    assert out[base + 3600] == (12.0, 1)
    assert out[base + 2 * 3600] == (14.0, 1)
    assert out[base + 3 * 3600] == (16.0, 0)
    assert out[base + 4 * 3600] == (30.0, 0)  # last-per-bucket wins
    assert len(out) == 5


def test_interval_overlap_join_boundaries_and_dedup(spark):
    """J9: touching endpoints count as overlap (closed intervals),
    disjoint intervals don't match, and a pair spanning many shared
    bins appears exactly once."""
    from datalake_polygonscan_spark.operators.temporal import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 100), (2, 1000, 1100), (3, 5000, 9000)], "id long, s long, e long"
    )
    b = spark.createDataFrame(
        [(10, 100, 150),    # touches a1 at a point -> overlap 0
         (11, 200, 300),    # disjoint from everything
         (12, 4000, 10000)] # spans many bins with a3 -> one row
        , "id long, s long, e long"
    )
    got = {
        (r.a_id, r.b_id): r.overlap_s
        for r in interval_overlap_join(a, b, bin_seconds=100).collect()
    }
    assert got == {(1, 10): 0, (3, 12): 4000}


def test_theil_sen_ignores_single_outlier(spark, tmp_path):
    """The estimator's reason to exist: one corrupted tick must not
    move the slope, while OLS on the same series would swing wildly.
    Build a perfect y = 2x + 100 line of 15 purchase events plus one
    10000x fat-finger, run the registered query on a scratch events
    table, and require the exact clean slope (2 ticks/sec of value
    0.0002/sec after tick quantization)."""
    import datetime as dtm

    from datalake_polygonscan_spark.queries import REGISTRY

    base = dtm.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(15):
        # xs = i*10 seconds, value = 0.0002*xs + 0.01  (yt = 2*xs + 100)
        rows.append((i + 1, base + dtm.timedelta(seconds=i * 10), 7,
                     "purchase", 0.0002 * (i * 10) + 0.01, "{}"))
    rows.append((99, base + dtm.timedelta(seconds=155), 7,
                 "purchase", 9999.0, "{}"))  # the fat finger
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    out = {r["user_id"]: r for r in REGISTRY["ts13_theil_sen"].fn(spark, sf_dir).collect()}
    r = out[7]
    # 16 points (15 clean + outlier), 120 pairs; the median slope must
    # be the CLEAN 2 ticks/sec: only 15 of 120 pairs touch the outlier
    assert r["n_points"] == 16 and r["n_pairs"] == 120
    assert r["slope_ticks_per_sec"] == 2.0


def test_km_survival_matches_hand_computed_life_table(spark):
    """Textbook KM example: cohort of 10, deaths at t=2 (2), t=4 (1),
    censoring at t=3 (1) and t=5 (3), the rest censored at t=6.
    S(2)=8/10=.8, S(3)=.8, S(4)=.8*(6/7), S(5)=S(4), S(6)=S(5)."""
    from datalake_polygonscan_spark.operators.temporal import km_survival

    # life table rows: (cohort, t, d, n) with n = at-risk entering t
    rows = [
        ("c", 2, 2, 10),  # S -> 0.8
        ("c", 3, 0, 8),   # censor only -> unchanged
        ("c", 4, 1, 7),   # S -> 0.8 * 6/7
        ("c", 5, 0, 6),
        ("c", 6, 0, 3),
    ]
    df = spark.createDataFrame(rows, "cohort string, t_days long, d long, n long")
    out = {r["t_days"]: r["s"] for r in km_survival(df, "cohort", "t_days", "d", "n").collect()}
    S = 10**12
    s2 = (S * 8) // 10
    s4 = (s2 * 6) // 7
    assert out == {2: s2, 3: s2, 4: s4, 5: s4, 6: s4}


def test_dau_wau_sliding_distinct_window_edges(spark, tmp_path):
    """The sliding-distinct edges that break naive implementations: a
    user present on days 0 and 8 (exactly past the 7-day window) must
    NOT count toward day 7's WAU but must re-enter at day 8; a user
    present on days 0 and 6 stays one coverage interval."""
    import datetime as dtm

    from datalake_polygonscan_spark.queries import REGISTRY

    base = dtm.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: days 0 and 8 (disjoint coverage); user 2: days 0 and 6
    for u, d in [(1, 0), (1, 8), (2, 0), (2, 6)]:
        eid += 1
        rows.append((eid, base + dtm.timedelta(days=d), u, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {r["day"]: (r["dau"], r["wau"]) for r in
           REGISTRY["an11_dau_wau_stickiness"].fn(spark, str(tmp_path)).collect()}
    d0 = min(out)
    # day 0: both present -> dau 2, wau 2
    assert out[d0] == (2, 2)
    # day 6: only user 2 active that day; both within trailing 7 days
    assert out[d0 + 6] == (1, 2)
    # day 8: user 1 only - user 2's day-6 presence is still in [2, 8],
    # so wau = 2; user 1's day-0 presence alone would NOT reach day 8
    assert out[d0 + 8] == (1, 2)


# ---------------------------------------------------------------------------
# TS15 banded DTW
# ---------------------------------------------------------------------------


def test_dtw_shifted_series_beats_pointwise_distance(spark):
    """A series that is the reference shifted by one slot has a small
    DTW distance (alignment absorbs the shift) while the pointwise L1
    distance stays large — the property DTW exists for."""
    from datalake_polygonscan_spark.operators.temporal import dtw_to_reference

    ref = [0, 10, 0, 0, 0, 10, 0, 0]
    shifted = [10, 0, 0, 0, 10, 0, 0, 0]  # ref shifted left by one
    rows = [(1, sl, c) for sl, c in enumerate(shifted)]
    series = spark.createDataFrame(rows, "user_id long, sl long, c long")
    got = dtw_to_reference(series, ref, band=2).collect()[0]
    pointwise = sum(abs(a - b) for a, b in zip(shifted, ref))
    assert pointwise == 40
    assert got["dtw"] < pointwise  # alignment absorbs the shift


def test_dtw_identical_series_is_zero_and_matches_bruteforce(spark):
    from datalake_polygonscan_spark.operators.temporal import dtw_to_reference

    ref = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [(7, sl, c) for sl, c in enumerate(ref)]
    series = spark.createDataFrame(rows, "user_id long, sl long, c long")
    assert dtw_to_reference(series, ref, band=2).collect()[0]["dtw"] == 0

    # brute-force full (unbanded within band-2 reach) DP cross-check
    other = [5, 1, 4, 2, 5, 8, 2, 7]
    rows = [(8, sl, c) for sl, c in enumerate(other)]
    series = spark.createDataFrame(rows, "user_id long, sl long, c long")
    got = dtw_to_reference(series, ref, band=2).collect()[0]["dtw"]

    inf = 10**15
    n = 8
    D = [[inf] * (n + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            if abs(i - j) > 2:
                continue
            cost = abs(other[i - 1] - ref[j - 1])
            if i == 1 and j == 1:
                D[i][j] = cost
            else:
                D[i][j] = cost + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    assert got == D[n][n]
