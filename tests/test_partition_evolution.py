"""S26 partition-spec evolution (io/partition_evolution.py): layout
changes are metadata commits, reads union per-spec scans, pruning is
per-spec, OPTIMIZE collapses specs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.maintenance import compact_snapshot
from datalake_polygonscan_spark.io.partition_evolution import (
    append_with_spec,
    evolve_partitioning,
    overwrite_with_spec,
)
from datalake_polygonscan_spark.io.sinks import (
    current_snapshot_path,
    read_pointer,
    read_table,
    read_version,
)


def _df(spark):
    return (
        spark.range(100)
        .withColumn("status", F.when(F.col("id") % 3 == 0, "A").otherwise("B"))
        .withColumn("prio", (F.col("id") % 5).cast("string"))
        .withColumn("v", F.col("id") * 10)
    )


def _inodes(snap):
    out = {}
    for dp, dirs, fs in os.walk(snap):
        for f in fs:
            if not f.startswith(("_", ".")):
                out[os.path.relpath(os.path.join(dp, f), snap)] = os.stat(
                    os.path.join(dp, f)
                ).st_ino
    return out


def test_evolve_is_zero_copy_and_reads_union(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark)
    old = df.filter(F.col("id") < 60)
    new = df.filter(F.col("id") >= 60)
    overwrite_with_spec(old, t, ["status"], retain=10)
    before = _inodes(current_snapshot_path(t))
    evolve_partitioning(t, ["prio"], retain=10)
    after = _inodes(current_snapshot_path(t))
    assert after == before and len(before) > 0  # pure metadata commit

    append_with_spec(new, t, retain=10)
    live = read_table(spark, t)
    assert live.count() == 100
    assert live.agg(F.sum("v")).collect()[0][0] == sum(10 * i for i in range(100))
    # both layouts on disk: spec-0 hive dirs by status, spec-1 by prio
    snap = current_snapshot_path(t)
    assert any(d.startswith("status=") for d in os.listdir(os.path.join(snap, "spec-00000")))
    assert any(d.startswith("prio=") for d in os.listdir(os.path.join(snap, "spec-00001")))


def test_per_spec_partition_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark)
    overwrite_with_spec(df.filter(F.col("id") < 60), t, ["status"], retain=10)
    evolve_partitioning(t, ["prio"], retain=10)
    append_with_spec(df.filter(F.col("id") >= 60), t, retain=10)

    plan_new = (
        read_table(spark, t)
        .filter(F.col("prio") == "3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the spec-1 scan prunes prio as a PARTITION filter...
    assert "PartitionFilters: [isnotnull(prio" in plan_new
    # ...and the spec-0 scan (prio is a data column there) pushes it
    # down to parquet instead
    assert "PushedFilters: [IsNotNull(prio)" in plan_new

    plan_old = (
        read_table(spark, t)
        .filter(F.col("status") == "A")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(status" in plan_old

    got = sorted(
        r.id for r in read_table(spark, t).filter(F.col("prio") == "3").collect()
    )
    assert got == [i for i in range(100) if i % 5 == 3]


def test_time_travel_resolves_each_versions_specs(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark)
    overwrite_with_spec(df.filter(F.col("id") < 60), t, ["status"], retain=10)
    evolve_partitioning(t, ["prio"], retain=10)
    append_with_spec(df.filter(F.col("id") >= 60), t, retain=10)
    assert read_version(spark, t, 0).count() == 60
    assert read_version(spark, t, 1).count() == 60  # evolve adds no rows
    assert read_version(spark, t, 2).count() == 100


def test_optimize_collapses_specs_to_newest(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark)
    overwrite_with_spec(df.filter(F.col("id") < 60), t, ["status"], retain=10)
    evolve_partitioning(t, ["prio"], retain=10)
    append_with_spec(df.filter(F.col("id") >= 60), t, retain=10)
    compact_snapshot(spark, t, retain=10)
    meta = read_pointer(t)
    assert [s["id"] for s in meta["partition_specs"]] == [1]
    snap = current_snapshot_path(t)
    assert sorted(os.listdir(snap)) == ["spec-00001"] or [
        d for d in os.listdir(snap) if d.startswith("spec-")
    ] == ["spec-00001"]
    live = read_table(spark, t)
    assert live.count() == 100
    assert live.agg(F.sum("v")).collect()[0][0] == sum(10 * i for i in range(100))
    # every row now lives in the prio layout
    assert any(
        d.startswith("prio=") for d in os.listdir(os.path.join(snap, "spec-00001"))
    )


def test_spec_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark)
    overwrite_with_spec(df, t, ["status"], retain=10)
    with pytest.raises(ValueError, match="already partitioned"):
        evolve_partitioning(t, ["status"])
    with pytest.raises(ValueError, match="not in table schema"):
        evolve_partitioning(t, ["nope"])
    with pytest.raises(ValueError, match="append schema"):
        append_with_spec(df.drop("v"), t)
    t2 = str(tmp_path / "t2")
    from datalake_polygonscan_spark.io.sinks import atomic_overwrite

    atomic_overwrite(df, t2)
    with pytest.raises(ValueError, match="not an evolution-capable"):
        evolve_partitioning(t2, ["prio"])
    with pytest.raises(ValueError, match="not in"):
        overwrite_with_spec(df, t, ["missing_col"])
