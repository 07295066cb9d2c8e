"""Foreign Hudi CoW reader (io/hudi_reader.py): file-slice resolution,
timeline travel, inflight invisibility, MoR gate."""

from __future__ import annotations

import os

import pytest

from datalake_polygonscan_spark.io.hudi_reader import (
    HudiProtocolError,
    read_hudi_table,
    timeline_info,
    write_foreign_hudi_fixture,
)


@pytest.fixture()
def hudi_table(spark, tmp_path):
    df = spark.range(60).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id AS DOUBLE) AS value"
    )
    t = str(tmp_path / "huditab")
    write_foreign_hudi_fixture(spark, df, t, "part", "k")
    return t, df


def test_cow_slice_resolution_and_time_travel(spark, hudi_table):
    from pyspark.sql import functions as F

    t, df = hudi_table
    live = read_hudi_table(spark, t)
    v1 = read_hudi_table(spark, t, as_of="001")
    assert live.count() == v1.count() == 60
    # the 002 upsert doubled partition 0's values; 001 sees originals
    s_live = live.filter("part = '0'").agg(F.sum("value")).collect()[0][0]
    s_v1 = v1.filter("part = '0'").agg(F.sum("value")).collect()[0][0]
    assert s_live == 2 * s_v1 and s_v1 > 0
    # untouched partitions identical at both instants
    for p in ("1", "2"):
        a = live.filter(f"part = '{p}'").agg(F.sum("value")).collect()[0][0]
        b = v1.filter(f"part = '{p}'").agg(F.sum("value")).collect()[0][0]
        assert a == b


def test_inflight_base_file_invisible(spark, hudi_table):
    t, _ = hudi_table
    with_meta = read_hudi_table(spark, t, keep_meta=True)
    assert with_meta.filter("_hoodie_commit_time = '003'").count() == 0
    # completing the instant makes the leftover visible (zeroed slice
    # shadows the 002 rewrite for partition 0)
    open(os.path.join(t, ".hoodie", "003.commit"), "w").write("{}")
    now = read_hudi_table(spark, t, keep_meta=True)
    assert now.filter("_hoodie_commit_time = '003'").count() > 0


def test_meta_columns_and_timeline_info(spark, hudi_table):
    t, _ = hudi_table
    assert read_hudi_table(spark, t).columns == ["k", "part", "value"]
    info = timeline_info(t)
    assert info["n_commits"] == 2 and info["latest_instant"] == "002"
    assert info["n_live_slices"] == 3
    # completion-time commit naming (Hudi 1.x) also parses
    os.rename(
        os.path.join(t, ".hoodie", "002.commit"),
        os.path.join(t, ".hoodie", "002_20240101000000.commit"),
    )
    assert timeline_info(t)["latest_instant"] == "002"


def test_mor_log_files_refused(spark, hudi_table):
    t, _ = hudi_table
    log = os.path.join(t, "part=0", ".somefile_001.log.1_0-1-0")
    open(log, "w").write("")
    with pytest.raises(HudiProtocolError, match="Merge-on-Read"):
        read_hudi_table(spark, t)
