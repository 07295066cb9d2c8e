"""File-level data skipping (io/skipping.py): stats-pruned scans must
be a strict superset of the predicate (correctness never depends on
stats), prune aggressively on clustered layouts, and fall back to
reading everything when no manifest exists."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.sinks import atomic_overwrite
from datalake_polygonscan_spark.io.skipping import cluster_by, pruned_scan, write_file_stats


def _table(spark, path, n_files=8):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    atomic_overwrite(cluster_by(df, ["k"], n_files), path)
    return df


def test_pruned_scan_matches_full_filter_and_skips_files(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _table(spark, tbl)
    write_file_stats(tbl, ["k"])
    df, decision = pruned_scan(spark, tbl, {"k": (100, 199)})
    got = sorted(r["k"] for r in df.filter(F.col("k").between(100, 199)).collect())
    assert got == list(range(100, 200))
    assert decision["files_total"] == 8
    assert 0 < decision["files_read"] < 8


def test_no_manifest_falls_back_to_all_files(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _table(spark, tbl)
    df, decision = pruned_scan(spark, tbl, {"k": (100, 199)})
    assert decision["files_read"] == decision["files_total"] == 8
    assert df.filter(F.col("k").between(100, 199)).count() == 100


def test_empty_intersection_reads_zero_files(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df_in = _table(spark, tbl)
    write_file_stats(tbl, ["k"])
    df, decision = pruned_scan(spark, tbl, {"k": (5000, 6000)})
    assert decision["files_read"] == 0
    assert df.count() == 0
    assert df.columns == df_in.columns


def test_open_bounds_and_unstatted_columns_are_superset(spark, tmp_path):
    tbl = str(tmp_path / "t")
    _table(spark, tbl)
    write_file_stats(tbl, ["k"])
    # lower bound only
    df, decision = pruned_scan(spark, tbl, {"k": (900, None)})
    assert df.filter(F.col("k") >= 900).count() == 100
    assert decision["files_read"] < decision["files_total"]
    # predicate on a column with no stats: nothing pruned, all rows there
    df2, decision2 = pruned_scan(spark, tbl, {"v": (0, 1)})
    assert decision2["files_read"] == decision2["files_total"]
    assert df2.count() == 1000


def test_timestamp_stats_prune_date_ranges(spark, tmp_path):
    import datetime

    tbl = str(tmp_path / "t")
    df = spark.range(0, 365).select(
        F.col("id").alias("k"),
        (F.lit("2020-01-01").cast("timestamp") + F.make_interval(days=F.col("id").cast("int"))).alias("ts"),
    )
    atomic_overwrite(cluster_by(df, ["ts"], 8), tbl)
    write_file_stats(tbl, ["ts"])
    lo, hi = datetime.datetime(2020, 3, 1), datetime.datetime(2020, 3, 31, 23, 59, 59)
    pruned, decision = pruned_scan(spark, tbl, {"ts": (lo, hi)})
    assert pruned.filter(F.col("ts").between(lo, hi)).count() == 31
    assert 0 < decision["files_read"] < decision["files_total"]


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    from datalake_polygonscan_spark.io.skipping import zorder_by

    tbl_z, tbl_lex = str(tmp_path / "z"), str(tmp_path / "lex")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    atomic_overwrite(zorder_by(df, ["a", "b"], 16), tbl_z)
    write_file_stats(tbl_z, ["a", "b"])
    atomic_overwrite(cluster_by(df, ["a", "b"], 16), tbl_lex)
    write_file_stats(tbl_lex, ["a", "b"])

    # leading column: both layouts prune
    _, dz = pruned_scan(spark, tbl_z, {"a": (0, 7)})
    _, dl = pruned_scan(spark, tbl_lex, {"a": (0, 7)})
    assert dz["files_read"] < dz["files_total"]
    assert dl["files_read"] < dl["files_total"]

    # NON-leading column: only the Z-order layout prunes
    dfz, dz2 = pruned_scan(spark, tbl_z, {"b": (0, 7)})
    _, dl2 = pruned_scan(spark, tbl_lex, {"b": (0, 7)})
    assert dz2["files_read"] < dz2["files_total"]
    assert dl2["files_read"] == dl2["files_total"]

    # and the pruned scan is still exact
    assert dfz.filter(F.col("b").between(0, 7)).count() == 64 * 8


def test_zorder_handles_nulls_and_constant_columns(spark, tmp_path):
    from datalake_polygonscan_spark.io.skipping import zorder_by

    tbl = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("a"),
        F.lit(5).alias("c"),
    )
    atomic_overwrite(zorder_by(df, ["a", "c"], 4), tbl)
    from datalake_polygonscan_spark.io.sinks import read_table

    out = read_table(spark, tbl)
    assert out.count() == 100
    assert out.filter(F.col("a").isNull()).count() == 10


def test_bloom_point_lookup_prunes_unclustered_key(spark, tmp_path):
    from datalake_polygonscan_spark.io.skipping import write_bloom_filters

    tbl = str(tmp_path / "t")
    # cluster by v so k spans the whole domain in every file: min/max
    # stats on k are useless, only the bloom can prune the point lookup
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 8).alias("v")
    )
    atomic_overwrite(cluster_by(df, ["v"], 8), tbl)
    write_file_stats(tbl, ["k"])
    _, d_stats = pruned_scan(spark, tbl, ranges={"k": (777, 777)})
    assert d_stats["files_read"] == d_stats["files_total"]  # stats can't help

    write_bloom_filters(spark, tbl, ["k"], m_bits=1 << 14)
    got, d_bloom = pruned_scan(spark, tbl, equals={"k": 777})
    assert d_bloom["files_read"] < d_bloom["files_total"]
    rows = got.filter(F.col("k") == 777).collect()  # no false negatives
    assert [(r["k"], r["v"]) for r in rows] == [(777, 777 % 8)]


def test_bloom_absent_key_reads_zero_files(spark, tmp_path):
    from datalake_polygonscan_spark.io.skipping import write_bloom_filters

    tbl = str(tmp_path / "t")
    df = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") % 4).alias("v"))
    atomic_overwrite(cluster_by(df, ["v"], 4), tbl)
    write_bloom_filters(spark, tbl, ["k"], m_bits=1 << 14)
    got, decision = pruned_scan(spark, tbl, equals={"k": 99999})
    # fpp at this sizing is ~0 for 125 keys/file; every file proves absence
    assert decision["files_read"] == 0
    assert got.count() == 0
    assert got.columns == ["k", "v"]


def test_bloom_string_keys_and_combined_with_ranges(spark, tmp_path):
    from datalake_polygonscan_spark.io.skipping import write_bloom_filters

    tbl = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("name"),
        F.col("id").alias("k"),
    )
    atomic_overwrite(cluster_by(df, ["k"], 8), tbl)
    write_file_stats(tbl, ["k"])
    write_bloom_filters(spark, tbl, ["name"], m_bits=1 << 14)
    # range on the clustered col AND bloom on the string col compose
    got, decision = pruned_scan(
        spark, tbl, ranges={"k": (0, 499)}, equals={"name": "user-42"}
    )
    assert decision["files_read"] <= 1
    rows = got.filter(F.col("name") == "user-42").collect()
    assert [(r["name"], r["k"]) for r in rows] == [("user-42", 42)]


def test_bloom_rejects_unportable_column_types(spark, tmp_path):
    import pytest

    from datalake_polygonscan_spark.io.skipping import write_bloom_filters

    tbl = str(tmp_path / "t")
    df = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 1.5).alias("x"))
    atomic_overwrite(df, tbl)
    with pytest.raises(TypeError):
        write_bloom_filters(spark, tbl, ["x"])


def test_hilbert_index_matches_reference_bijective_continuous(spark):
    """The three properties that make the Hilbert layout worth having:
    exact equality with the textbook rotation algorithm, bijectivity
    over the full grid, and CONTINUITY (consecutive indexes are
    adjacent cells — the property Z-order lacks and the reason a
    Hilbert file's bounding box is tighter)."""
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.io.skipping import hilbert_index_udf

    def xy2d_ref(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits = 4
    n = 1 << bits
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", hilbert_index_udf(bits)(F.col("x"), F.col("y")).alias("h")
        ).collect()
    }
    ref = {(x, y): xy2d_ref(n, x, y) for x, y in pts}
    assert got == ref
    inv = {d: xy for xy, d in ref.items()}
    assert sorted(inv) == list(range(n * n))  # bijective
    for d in range(n * n - 1):  # continuous: unit Manhattan steps
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
