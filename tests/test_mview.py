"""Incremental materialized-view maintenance (io/mview.py): an
aggregate MV refreshed purely from retraction-shaped change feeds must
stay exactly equal to a full recompute over the evolving base table —
across inserts, value updates, deletes, group births and group deaths.
The base table is never rescanned by a refresh (the plan reads only
the MV's touched buckets and the feed)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.merge import change_feed, merge_upsert
from datalake_polygonscan_spark.io.mview import build_aggregate, refresh_aggregate
from datalake_polygonscan_spark.io.sinks import read_table

COLS = ["k", "grp", "v"]


def _df(spark, rows):
    return spark.createDataFrame([(int(k), str(g), float(v)) for k, g, v in rows], COLS)


def _mv_rows(mv):
    return sorted(
        (r["grp"], int(r["n_rows"]), str(r["sum_v"])) for r in mv.collect()
    )


def _recompute(base):
    return sorted(
        (r["grp"], int(r["n"]), str(r["s"]))
        for r in base.groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).cast("decimal(38,6)").alias("s"),
        )
        .collect()
    )


def _apply_and_refresh(spark, base_tbl, mv_tbl, batch, deletes=None):
    current = read_table(spark, base_tbl)
    feed = change_feed(current, batch, keys=["k"], deletes=deletes, retractions=True)
    mv = refresh_aggregate(spark, mv_tbl, feed, ["grp"], ["v"], n_buckets=8)
    merge_upsert(spark, base_tbl, batch, keys=["k"], n_buckets=8, deletes=deletes)
    return mv


def test_refresh_matches_full_recompute(spark, tmp_path):
    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_aggregate(spark, mv_tbl, seed, ["grp"], ["v"], n_buckets=8)

    # update k=2 (a: retract 20, add 25), insert k=4 into b, delete k=3 (b dies? no — b gains k=4)
    batch = _df(spark, [(2, "a", 25), (4, "b", 40)])
    dels = _df(spark, [(3, "b", 0)]).select("k")
    mv = _apply_and_refresh(spark, base_tbl, mv_tbl, batch, deletes=dels)
    assert _mv_rows(mv) == _recompute(read_table(spark, base_tbl))
    got = {r["grp"]: (r["n_rows"], float(r["sum_v"])) for r in mv.collect()}
    assert got == {"a": (2, 35.0), "b": (1, 40.0)}


def test_group_birth_and_death(spark, tmp_path):
    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 1), (2, "b", 2)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_aggregate(spark, mv_tbl, seed, ["grp"], ["v"], n_buckets=8)

    # delete the only row of b (group death) and insert a brand-new group c
    batch = _df(spark, [(3, "c", 3)])
    dels = _df(spark, [(2, "b", 0)]).select("k")
    mv = _apply_and_refresh(spark, base_tbl, mv_tbl, batch, deletes=dels)
    groups = {r["grp"] for r in mv.collect()}
    assert groups == {"a", "c"}
    assert _mv_rows(mv) == _recompute(read_table(spark, base_tbl))


def test_update_moves_row_between_groups(spark, tmp_path):
    # an update that CHANGES the group column: preimage retracts from the
    # old group, postimage contributes to the new one
    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 10), (2, "a", 20)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_aggregate(spark, mv_tbl, seed, ["grp"], ["v"], n_buckets=8)

    batch = _df(spark, [(1, "b", 11)])
    mv = _apply_and_refresh(spark, base_tbl, mv_tbl, batch)
    got = {r["grp"]: (r["n_rows"], float(r["sum_v"])) for r in mv.collect()}
    assert got == {"a": (1, 20.0), "b": (1, 11.0)}
    assert _mv_rows(mv) == _recompute(read_table(spark, base_tbl))


def test_randomized_merge_sequence_stays_exact(spark, tmp_path):
    rng = random.Random(7)
    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    keys = list(range(40))
    seed_rows = [(k, rng.choice("abcd"), rng.randint(1, 500) / 7.0) for k in keys[:25]]
    seed = _df(spark, seed_rows)
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_aggregate(spark, mv_tbl, seed, ["grp"], ["v"], n_buckets=8)

    live_keys = set(keys[:25])
    for _round in range(3):
        batch_keys = rng.sample(keys, 10)
        batch = _df(
            spark, [(k, rng.choice("abcde"), rng.randint(1, 500) / 7.0) for k in batch_keys]
        )
        del_pool = [k for k in live_keys if k not in batch_keys]
        del_keys = rng.sample(del_pool, min(4, len(del_pool)))
        dels = _df(spark, [(k, "x", 0) for k in del_keys]).select("k") if del_keys else None
        mv = _apply_and_refresh(spark, base_tbl, mv_tbl, batch, deletes=dels)
        live_keys = (live_keys | set(batch_keys)) - set(del_keys)
        assert _mv_rows(mv) == _recompute(read_table(spark, base_tbl))


def test_inconsistent_feed_raises(spark, tmp_path):
    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 1)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_aggregate(spark, mv_tbl, seed, ["grp"], ["v"], n_buckets=8)
    # a feed deleting 2 rows from a 1-row group cannot have been derived
    # against this MV's base state
    bogus = spark.createDataFrame(
        [(1, "a", 1.0, "delete"), (2, "a", 1.0, "delete")], COLS + ["_change_type"]
    )
    try:
        refresh_aggregate(spark, mv_tbl, bogus, ["grp"], ["v"], n_buckets=8)
        raise AssertionError("expected ValueError for negative group count")
    except ValueError:
        pass


def test_refresh_reads_only_touched_mv_buckets(spark, tmp_path):
    # the MV-side read of a refresh is partition-pruned to the buckets
    # of the delta groups — the refresh plan never scans the full MV
    from datalake_polygonscan_spark.io.mview import _read_touched_groups

    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(k, f"g{k % 16}", float(k)) for k in range(64)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_aggregate(spark, mv_tbl, seed, ["grp"], ["v"], n_buckets=8)

    deltas = spark.createDataFrame([("g0", 1)], ["grp", "_d_rows"])
    touched = _read_touched_groups(spark, mv_tbl, deltas, ["grp"], ["v"], 8)
    plan = touched._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan
    # only groups living in g0's hash bucket come back — a strict subset
    assert 0 < touched.count() < 16


# ---------------- MIN/MAX MV (refresh_minmax) ----------------


def _minmax_recompute(base):
    return sorted(
        (r["grp"], int(r["n"]), str(r["lo"]), str(r["hi"]))
        for r in base.groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.min(F.col("v").cast("decimal(18,6)")).alias("lo"),
            F.max(F.col("v").cast("decimal(18,6)")).alias("hi"),
        )
        .collect()
    )


def _minmax_rows(mv):
    return sorted(
        (r["grp"], int(r["n_rows"]), str(r["min_v"]), str(r["max_v"])) for r in mv.collect()
    )


def _apply_minmax(spark, base_tbl, mv_tbl, batch, deletes=None):
    from datalake_polygonscan_spark.io.mview import refresh_minmax

    current = read_table(spark, base_tbl)
    feed = change_feed(current, batch, keys=["k"], deletes=deletes, retractions=True)
    base_after = merge_upsert(spark, base_tbl, batch, keys=["k"], n_buckets=8, deletes=deletes)
    return refresh_minmax(spark, mv_tbl, feed, base_after, ["grp"], "v", n_buckets=8)


def test_minmax_interior_delete_folds_without_recompute(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_minmax

    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_minmax(spark, mv_tbl, seed, ["grp"], "v", n_buckets=8)

    # delete the INTERIOR row (20): count drops, extrema untouched
    mv, stats = _apply_minmax(
        spark, base_tbl, mv_tbl, _df(spark, [(0, "a", 0)]).limit(0), deletes=_df(spark, [(2, "a", 0)]).select("k")
    )
    assert stats["groups_recomputed"] == 0
    assert _minmax_rows(mv) == _minmax_recompute(read_table(spark, base_tbl))


def test_minmax_extremum_delete_triggers_partial_recompute(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_minmax

    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 10), (2, "a", 30), (3, "b", 5), (4, "b", 7)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_minmax(spark, mv_tbl, seed, ["grp"], "v", n_buckets=8)

    # delete a's MAX row; b untouched -> exactly ONE group recomputes
    mv, stats = _apply_minmax(
        spark, base_tbl, mv_tbl, _df(spark, [(0, "a", 0)]).limit(0), deletes=_df(spark, [(2, "a", 0)]).select("k")
    )
    assert stats["groups_recomputed"] == 1
    assert _minmax_rows(mv) == _minmax_recompute(read_table(spark, base_tbl))
    got = {r["grp"]: str(r["max_v"]) for r in mv.collect()}
    assert got["a"] == "10.000000"


def test_minmax_insert_improves_extrema_fold_only(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_minmax

    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 10), (2, "a", 20)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_minmax(spark, mv_tbl, seed, ["grp"], "v", n_buckets=8)

    # new min (1) and new max (99) via inserts: least/greatest fold
    mv, stats = _apply_minmax(spark, base_tbl, mv_tbl, _df(spark, [(3, "a", 1), (4, "a", 99)]))
    assert stats["groups_recomputed"] == 0
    assert _minmax_rows(mv) == _minmax_recompute(read_table(spark, base_tbl))


def test_minmax_group_birth_and_death(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_minmax

    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    seed = _df(spark, [(1, "a", 1), (2, "b", 2)])
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_minmax(spark, mv_tbl, seed, ["grp"], "v", n_buckets=8)

    mv, _ = _apply_minmax(
        spark, base_tbl, mv_tbl, _df(spark, [(3, "c", 3)]), deletes=_df(spark, [(2, "b", 0)]).select("k")
    )
    assert {r["grp"] for r in mv.collect()} == {"a", "c"}
    assert _minmax_rows(mv) == _minmax_recompute(read_table(spark, base_tbl))


def test_minmax_randomized_sequence_matches_recompute(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_minmax

    base_tbl, mv_tbl = str(tmp_path / "base"), str(tmp_path / "mv")
    rng = random.Random(11)
    rows = [(k, rng.choice("abc"), rng.randint(1, 50)) for k in range(30)]
    seed = _df(spark, rows)
    merge_upsert(spark, base_tbl, seed, keys=["k"], n_buckets=8)
    build_minmax(spark, mv_tbl, seed, ["grp"], "v", n_buckets=8)

    live = {k: (g, v) for k, g, v in rows}
    next_k = 30
    for _ in range(4):
        ups = []
        for _ in range(rng.randint(1, 4)):  # mix of updates and inserts
            if live and rng.random() < 0.5:
                k = rng.choice(list(live))
                ups.append((k, rng.choice("abc"), rng.randint(1, 50)))
            else:
                ups.append((next_k, rng.choice("abc"), rng.randint(1, 50)))
                next_k += 1
        del_keys = rng.sample(sorted(live), k=min(len(live), rng.randint(0, 3)))
        dels = _df(spark, [(k, "x", 0) for k in del_keys]).select("k") if del_keys else None
        mv, _ = _apply_minmax(spark, base_tbl, mv_tbl, _df(spark, ups), deletes=dels)
        for k in del_keys:
            live.pop(k, None)
        for k, g, v in ups:
            live[k] = (g, v)
        assert _minmax_rows(mv) == _minmax_recompute(read_table(spark, base_tbl))


# ---------------- approx-DISTINCT sketch MV ----------------


def test_distinct_sketch_mv_incremental_accuracy(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import (
        build_distinct_sketch,
        refresh_distinct_sketch,
    )

    mv_tbl = str(tmp_path / "mv")
    base = spark.range(3000).selectExpr("id % 3 AS g", "id % 700 AS u")
    build_distinct_sketch(spark, mv_tbl, base.filter("u % 2 = 0"), ["g"], "u", n_buckets=8)
    mv = refresh_distinct_sketch(spark, mv_tbl, base.filter("u % 2 = 1"), ["g"], "u", n_buckets=8)
    exact = {r["g"]: r["c"] for r in base.groupBy("g").agg(F.count_distinct("u").alias("c")).collect()}
    got = {r["g"]: r["n_distinct_est"] for r in mv.collect()}
    assert set(got) == set(exact)
    for g, est in got.items():
        assert abs(est - exact[g]) / exact[g] <= 0.05
    # new group arriving purely through a refresh
    mv2 = refresh_distinct_sketch(
        spark, mv_tbl, spark.createDataFrame([(9, 1), (9, 2)], ["g", "u"]), ["g"], "u", n_buckets=8
    )
    got2 = {r["g"]: r["n_distinct_est"] for r in mv2.collect()}
    assert got2[9] == 2
    # re-delivering already-seen values must not inflate the estimate
    mv3 = refresh_distinct_sketch(
        spark, mv_tbl, spark.createDataFrame([(9, 1), (9, 2)], ["g", "u"]), ["g"], "u", n_buckets=8
    )
    assert {r["g"]: r["n_distinct_est"] for r in mv3.collect()}[9] == 2


# ---------------------------------------------------------------------------
# MV5: incremental join MV (build_join / refresh_join)
# ---------------------------------------------------------------------------

JCOLS_F = ["fk", "dk", "fv"]
JCOLS_D = ["dk", "dname", "dv"]


def _fdf(spark, rows):
    return spark.createDataFrame([(int(a), int(b), float(c)) for a, b, c in rows], JCOLS_F)


def _ddf(spark, rows):
    return spark.createDataFrame([(int(a), str(b), float(c)) for a, b, c in rows], JCOLS_D)


def _join_rows(df):
    return sorted(
        (r["fk"], r["dk"], r["fv"], r["dname"], r["dv"]) for r in df.collect()
    )


def _full_join(fact, dim):
    return _join_rows(fact.join(dim, "dk", "left").select("fk", "dk", "fv", "dname", "dv"))


def test_join_mv_fact_churn_matches_full_join(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_join, refresh_join

    fact = _fdf(spark, [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0)])
    dim = _ddf(spark, [(10, "a", 0.1), (20, "b", 0.2), (30, "c", 0.3)])
    mv_tbl = str(tmp_path / "mv")
    build_join(spark, mv_tbl, fact, dim, ["fk"], ["dk"], n_buckets=4)

    # batch: update fk=1 (moves to dim 30), insert fk=4 (dim 20), delete fk=2
    batch = _fdf(spark, [(1, 30, 9.0), (4, 20, 4.0)])
    dels = _fdf(spark, [(2, 10, 0.0)]).select("fk")
    feed = change_feed(fact, batch, keys=["fk"], deletes=dels)
    mv = refresh_join(
        spark, mv_tbl, ["fk"], ["dk"], fact_feed=feed, dim_current=dim, n_buckets=4
    )
    fact2 = _fdf(spark, [(1, 30, 9.0), (3, 20, 3.0), (4, 20, 4.0)])
    assert _join_rows(mv.select("fk", "dk", "fv", "dname", "dv")) == _full_join(fact2, dim)


def test_join_mv_dim_churn_updates_fanout_and_nulls_deletes(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_join, refresh_join

    fact = _fdf(spark, [(1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0), (4, 40, 4.0)])
    dim = _ddf(spark, [(10, "a", 0.1), (20, "b", 0.2), (40, "d", 0.4)])
    mv_tbl = str(tmp_path / "mv")
    build_join(spark, mv_tbl, fact, dim, ["fk"], ["dk"], n_buckets=4)

    # dim batch: reprice dk=10 (fan-out 2 rows), delete dk=20 (LEFT
    # JOIN nulls, fact row survives), dk=40 untouched
    dim_batch = _ddf(spark, [(10, "a2", 9.9)])
    dim_dels = _ddf(spark, [(20, "b", 0.0)]).select("dk")
    dim_feed = change_feed(dim, dim_batch, keys=["dk"], deletes=dim_dels)
    mv = refresh_join(spark, mv_tbl, ["fk"], ["dk"], dim_feed=dim_feed, n_buckets=4)
    dim2 = _ddf(spark, [(10, "a2", 9.9), (40, "d", 0.4)])
    assert _join_rows(mv.select("fk", "dk", "fv", "dname", "dv")) == _full_join(fact, dim2)
    # the deleted dim's fact row is present with nulled dim columns
    row3 = [r for r in mv.collect() if r["fk"] == 3]
    assert len(row3) == 1 and row3[0]["dname"] is None and row3[0]["dv"] is None


def test_join_mv_randomized_churn_stays_exact(spark, tmp_path):
    from datalake_polygonscan_spark.io.mview import build_join, refresh_join

    rng = random.Random(7)
    fact_rows = {k: (k, rng.choice([10, 20, 30]), float(k)) for k in range(1, 21)}
    dim_rows = {d: (d, f"n{d}", d / 10.0) for d in (10, 20, 30)}
    fact = _fdf(spark, list(fact_rows.values()))
    dim = _ddf(spark, list(dim_rows.values()))
    mv_tbl = str(tmp_path / "mv")
    build_join(spark, mv_tbl, fact, dim, ["fk"], ["dk"], n_buckets=4)

    for step in range(4):
        # fact churn: move/update 5 keys, delete 2, insert 2 fresh
        ups = {}
        for k in rng.sample(sorted(fact_rows), 5):
            ups[k] = (k, rng.choice([10, 20, 30]), float(k) + step)
        for k in (100 + step * 2, 101 + step * 2):
            ups[k] = (k, rng.choice([10, 20, 30]), float(k))
        del_keys = rng.sample([k for k in fact_rows if k not in ups], 2)
        cur_fact = _fdf(spark, list(fact_rows.values()))
        batch = _fdf(spark, list(ups.values()))
        dels = _fdf(spark, [(k, 0, 0.0) for k in del_keys]).select("fk")
        feed = change_feed(cur_fact, batch, keys=["fk"], deletes=dels)
        mv = refresh_join(
            spark, mv_tbl, ["fk"], ["dk"], fact_feed=feed, dim_current=_ddf(spark, list(dim_rows.values())), n_buckets=4
        )
        for k in del_keys:
            fact_rows.pop(k)
        fact_rows.update(ups)

        # dim churn: reprice one dim key
        d = rng.choice(sorted(dim_rows))
        new_d = (d, f"n{d}s{step}", d / 10.0 + step)
        cur_dim = _ddf(spark, list(dim_rows.values()))
        dim_feed = change_feed(cur_dim, _ddf(spark, [new_d]), keys=["dk"])
        mv = refresh_join(spark, mv_tbl, ["fk"], ["dk"], dim_feed=dim_feed, n_buckets=4)
        dim_rows[d] = new_d

        expect = _full_join(
            _fdf(spark, list(fact_rows.values())), _ddf(spark, list(dim_rows.values()))
        )
        assert _join_rows(mv.select("fk", "dk", "fv", "dname", "dv")) == expect
