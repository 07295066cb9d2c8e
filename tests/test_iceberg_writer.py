"""Write-side Iceberg interop (io/iceberg_writer.py): the emitted
metadata tree round-trips through the S48 foreign READER alone."""

from __future__ import annotations

import pytest

from datalake_polygonscan_spark.io.iceberg_reader import (
    read_iceberg_table,
    snapshot_info,
)
from datalake_polygonscan_spark.io.iceberg_writer import write_iceberg_table


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS v"
    )


def test_roundtrip_create_append_overwrite(spark, tmp_path):
    t = str(tmp_path / "icew")
    r1 = write_iceberg_table(spark, _df(spark, 0, 30), t, ["part"])
    assert r1["sequence_number"] == 1 and r1["n_added"] >= 3
    assert read_iceberg_table(spark, t).count() == 30

    r2 = write_iceberg_table(spark, _df(spark, 30, 50), t, ["part"],
                             mode="append")
    live = read_iceberg_table(spark, t)
    rows = live.collect()
    assert {r.k for r in rows} == set(range(50))
    # Iceberg data files must carry ALL columns — partition values
    # included (Spark's partitionBy drops them; the writer duplicates)
    assert all(r.part == str(r.k % 3) for r in rows)
    # snapshot time travel to the pre-append state
    assert read_iceberg_table(spark, t, snapshot_id=r1["snapshot_id"]).count() == 30
    # metadata-only count agrees with the scan without opening files
    info = snapshot_info(t)
    assert info["record_count"] == 50 and info["snapshot_id"] == r2["snapshot_id"]

    r3 = write_iceberg_table(spark, _df(spark, 100, 110), t, ["part"])
    assert {r.k for r in read_iceberg_table(spark, t).collect()} == set(range(100, 110))
    # REPLACE keeps prior snapshots readable
    assert read_iceberg_table(spark, t, snapshot_id=r2["snapshot_id"]).count() == 50
    assert snapshot_info(t)["n_snapshots"] == 3


def test_identity_partition_pruning_on_written_table(spark, tmp_path):
    """The written spec declares identity partition fields, so the
    reader's manifest pruning works on our own exports."""
    t = str(tmp_path / "icewp")
    write_iceberg_table(spark, _df(spark, 0, 30), t, ["part"])
    full = read_iceberg_table(spark, t)
    pruned = read_iceberg_table(spark, t, partition_filter={"part": "1"})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(r.k for r in pruned.collect()) == [
        k for k in range(30) if k % 3 == 1]


def test_unpartitioned_and_nested_decimal_schema(spark, tmp_path):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, Decimal("1.50"), (7, ["a"]))],
        "k long, d decimal(10,2), nest struct<a:int,tags:array<string>>",
    )
    t = str(tmp_path / "icewn")
    write_iceberg_table(spark, df, t)
    back = read_iceberg_table(spark, t)
    assert [f.dataType.simpleString() for f in back.schema] == [
        "bigint", "decimal(10,2)", "struct<a:int,tags:array<string>>"]
    row = back.collect()[0]
    assert str(row.d) == "1.50" and row.nest.tags == ["a"]


def test_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported mode"):
        write_iceberg_table(spark, _df(spark, 0, 5), str(tmp_path / "x"),
                            mode="merge")
