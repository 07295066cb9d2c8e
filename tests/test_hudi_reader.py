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


def test_hoodie_metadata_table_does_not_trip_mor_gate(spark, hudi_table):
    """ADVICE r8: .hoodie/metadata (Hudi's internal metadata table,
    default-enabled) is itself MoR with .log files — it must be pruned
    from the gate walk, not flag the DATA table as MoR."""
    t, df = hudi_table
    mdt = os.path.join(t, ".hoodie", "metadata", "files")
    os.makedirs(mdt)
    open(os.path.join(mdt, ".files-0000_00000000000000.log.1_0-0-0"), "w").write("")
    assert read_hudi_table(spark, t).count() == df.count()


def test_mixed_width_instants_order_numerically(spark, tmp_path):
    """ADVICE r8: 14-digit (second) and 17-digit (ms) instants coexist
    across Hudi versions; lexicographic compare would order
    '20240101000000000' (17-digit, older day) vs '9999...' wrongly.
    Both slice resolution and as_of must compare numerically."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "mixed")
    hdir = os.path.join(t, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.type=COPY_ON_WRITE\n")
    pdir = os.path.join(t, "part=0")
    os.makedirs(pdir)
    fid = "00000000-0000-0000-0000-000000000001-0"
    # 14-digit instant 20240102000000 is NUMERICALLY SMALLER than the
    # 17-digit 20240101000000999 (an earlier wall-clock day at ms
    # precision) — numeric order must pick the 17-digit slice as latest
    old14, new17 = "20240102000000", "20240101000000999"
    for instant, val in ((old14, 1.0), (new17, 2.0)):
        pq.write_table(
            pa.table({"k": [1], "value": [val]}),
            os.path.join(pdir, f"{fid}_0-1-0_{instant}.parquet"))
        _json.dump({}, open(os.path.join(hdir, f"{instant}.commit"), "w"))
    live = read_hudi_table(spark, t).collect()
    assert [r.value for r in live] == [2.0]
    asof = read_hudi_table(spark, t, as_of=old14).collect()
    assert [r.value for r in asof] == [1.0]
    assert timeline_info(t)["latest_instant"] == new17
