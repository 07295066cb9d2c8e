"""S37 hidden (transform) partitioning: layout columns stay hidden
from readers while partition pruning still happens on them."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.hidden_partitioning import (
    BucketTransform,
    MonthTransform,
    read_hidden,
    scan_is_pruned,
    write_hidden,
)


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, "1995-06-15 10:00:00", 10.0),
            (2, "1995-07-01 00:00:00", 20.0),
            (3, "1995-09-20 23:00:00", 30.0),
            (4, "1996-01-05 08:00:00", 40.0),
        ],
        "k long, ts_s string, v double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")


def test_read_hidden_hides_layout_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    write_hidden(_fixture(spark), path, [MonthTransform("ts", "__p_month"),
                                         BucketTransform("k", "__p_bucket", 4)])
    t = read_hidden(spark, path)
    assert set(t.columns) == {"k", "ts", "v"}  # the layout is an implementation detail
    assert t.count() == 4


def test_injected_predicate_prunes_then_projection_hides(spark, tmp_path):
    path = str(tmp_path / "t")
    month_t = MonthTransform("ts", "__p_month")
    write_hidden(_fixture(spark), path, [month_t])
    q = (
        read_hidden(spark, path, [month_t.range_predicate(
            "1995-06-01 00:00:00", "1995-07-31 23:59:59")])
        .filter(F.col("ts").between(F.lit("1995-06-01").cast("timestamp"),
                                    F.lit("1995-07-31 23:59:59").cast("timestamp")))
    )
    assert set(q.columns) == {"k", "ts", "v"}
    assert sorted(r.k for r in q.collect()) == [1, 2]
    # pruning happened on the hidden column even though the reader
    # schema never exposes it
    assert scan_is_pruned(q, "__p_month")


def test_bucket_predicate_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    bucket_t = BucketTransform("k", "__p_bucket", 4)
    write_hidden(_fixture(spark), path, [bucket_t])
    q = read_hidden(spark, path, [bucket_t.eq_predicate(3)]).filter(F.col("k") == 3)
    assert [r.k for r in q.collect()] == [3]
    assert scan_is_pruned(q, "__p_bucket")


def test_truncate_transform_prunes_and_rejects_short_prefix(spark, tmp_path):
    import pytest

    from datalake_polygonscan_spark.io.hidden_partitioning import (
        TruncateTransform,
        read_hidden,
        scan_is_pruned,
        write_hidden,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alps"), (3, "beta"), (4, "bets")],
        "k long, name string",
    )
    t = TruncateTransform("name", "__p_pfx", 3)
    path = str(tmp_path / "trunc")
    write_hidden(df, path, [t])
    q = read_hidden(spark, path, [t.prefix_predicate("alp")]).filter(
        "name LIKE 'alp%'"
    )
    assert sorted(r["k"] for r in q.collect()) == [1, 2]
    assert scan_is_pruned(q, "__p_pfx")
    assert "__p_pfx" not in q.columns  # layout stays hidden
    with pytest.raises(ValueError, match="shorter than truncate width"):
        t.prefix_predicate("al")


def test_day_transform_prunes_range(spark, tmp_path):
    import datetime

    from datalake_polygonscan_spark.io.hidden_partitioning import (
        DayTransform,
        read_hidden,
        scan_is_pruned,
        write_hidden,
    )

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i, 12, 0, 0)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    t = DayTransform("ts", "__p_day")
    path = str(tmp_path / "day")
    write_hidden(df, path, [t])
    q = read_hidden(
        spark, path, [t.range_predicate("2024-01-03 00:00:00", "2024-01-05 23:59:59")]
    ).filter("ts BETWEEN '2024-01-03' AND '2024-01-06'")
    assert sorted(r["k"] for r in q.collect()) == [2, 3, 4]
    assert scan_is_pruned(q, "__p_day")
