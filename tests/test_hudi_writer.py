"""Write-side Hudi CoW interop (io/hudi_writer.py): emitted
timeline + file slices round-trip through the S50 foreign READER
alone."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.hudi_reader import (
    read_hudi_table,
    timeline_info,
)
from datalake_polygonscan_spark.io.hudi_writer import write_hudi_table


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 3 AS STRING) AS part",
        "CAST(id AS DOUBLE) AS value")


def test_create_insert_upsert_roundtrip(spark, tmp_path):
    t = str(tmp_path / "hw")
    r1 = write_hudi_table(spark, _df(spark, 0, 30), t, "part", "k")
    assert r1["n_rows"] == 30 and r1["n_written_files"] == 3
    back = read_hudi_table(spark, t)
    assert {(r.k, r.part, r.value) for r in back.collect()} == {
        (i, str(i % 3), float(i)) for i in range(30)}

    # insert: new file groups, existing rows untouched
    r2 = write_hudi_table(spark, _df(spark, 30, 40), t, "part", "k",
                          mode="insert")
    assert read_hudi_table(spark, t).count() == 40

    # upsert: doubled values for k<10 rewrite their groups in place;
    # unmatched key 9999 inserts
    upd = _df(spark, 0, 10).withColumn("value", F.col("value") * 2).union(
        spark.createDataFrame([(9999, "1", 1.25)],
                              "k long, part string, value double"))
    r3 = write_hudi_table(spark, upd, t, "part", "k", mode="upsert")
    live = {r.k: r.value for r in read_hudi_table(spark, t).collect()}
    assert len(live) == 41
    for i in range(10):
        assert live[i] == float(i) * 2
    for i in range(10, 40):
        assert live[i] == float(i)
    assert live[9999] == 1.25

    # time travel: each earlier instant still resolves exactly
    asof1 = read_hudi_table(spark, t, as_of=r1["instant"])
    assert asof1.count() == 30
    asof2 = {r.k: r.value for r in
             read_hudi_table(spark, t, as_of=r2["instant"]).collect()}
    assert len(asof2) == 40 and asof2[5] == 5.0
    info = timeline_info(t)
    assert info["n_commits"] == 3 and info["n_log_files"] == 0

    # meta columns travel inside the files, spec layout on disk
    withmeta = read_hudi_table(spark, t, keep_meta=True)
    assert "_hoodie_record_key" in withmeta.columns
    names = [os.path.basename(p) for p in
             __import__("glob").glob(os.path.join(t, "part=*", "*.parquet"))]
    assert all(len(n.split("_")) >= 3 and n.endswith(".parquet")
               for n in names)


def test_upsert_rewrites_only_touched_groups(spark, tmp_path):
    """CoW write amplification: an upsert touching only partition-0
    keys must not rewrite the other partitions' files."""
    import glob

    t = str(tmp_path / "hw2")
    write_hudi_table(spark, _df(spark, 0, 30), t, "part", "k")
    before = set(glob.glob(os.path.join(t, "part=*", "*.parquet")))
    upd = (_df(spark, 0, 30).filter("k % 3 = 0")
           .withColumn("value", F.lit(0.5)))
    write_hudi_table(spark, upd, t, "part", "k", mode="upsert")
    after = set(glob.glob(os.path.join(t, "part=*", "*.parquet")))
    new_files = after - before
    assert all("/part=0/" in p for p in new_files)
    assert len(new_files) == 1
    # untouched partitions' files byte-identical (never rewritten)
    assert before - after == set()


def test_null_partition_and_mode_validation(spark, tmp_path):
    t = str(tmp_path / "hw3")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0)], "k long, part string, value double")
    write_hudi_table(spark, df, t, "part", "k")
    assert os.path.isdir(os.path.join(t, "part=__HIVE_DEFAULT_PARTITION__"))
    # the data column keeps the true NULL — the marker is only the
    # directory name
    back = {r.k: r.part for r in read_hudi_table(spark, t).collect()}
    assert back == {1: "a", 2: None}
    with pytest.raises(ValueError, match="unsupported mode"):
        write_hudi_table(spark, df, t, "part", "k", mode="delete")
    with pytest.raises(FileNotFoundError):
        write_hudi_table(spark, df, str(tmp_path / "nope"), "part", "k",
                         mode="upsert")
