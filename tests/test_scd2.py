"""SCD Type 2 operator semantics (io/scd.py): change-filtered
versioning, no-op re-send suppression, history invariants."""

import shutil

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.io.scd import scd2_apply, scd2_init
from datalake_polygonscan_spark.io.sinks import read_table


@pytest.fixture()
def dim_path(tmp_path):
    p = str(tmp_path / "dim")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _base(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0)], ["k", "seg", "bal"]
    )


def test_scd2_noop_resend_creates_no_versions(spark, dim_path):
    scd2_init(spark, dim_path, _base(spark), key="k")
    r = scd2_apply(spark, dim_path, _base(spark), key="k",
                   tracked=["seg", "bal"], version=2)
    assert r == {"changed": 0, "closed": 0, "resent_unchanged": 3}
    dim = read_table(spark, dim_path)
    assert dim.count() == 3
    assert dim.filter(~F.col("is_current")).count() == 0


def test_scd2_change_closes_and_opens(spark, dim_path):
    spark_df = _base(spark)
    scd2_init(spark, dim_path, spark_df, key="k")
    batch = spark.createDataFrame([(1, "Z", 10.0), (2, "B", 20.0)], ["k", "seg", "bal"])
    r = scd2_apply(spark, dim_path, batch, key="k", tracked=["seg", "bal"], version=2)
    assert r["changed"] == 1 and r["resent_unchanged"] == 1
    rows = {(x["k"], x["valid_from"]): x for x in read_table(spark, dim_path).collect()}
    assert len(rows) == 4
    closed = rows[(1, 1)]
    assert closed["valid_to"] == 2 and not closed["is_current"] and closed["seg"] == "A"
    opened = rows[(1, 2)]
    assert opened["valid_to"] is None and opened["is_current"] and opened["seg"] == "Z"


def test_scd2_stacked_versions_and_invariants(spark, dim_path):
    scd2_init(spark, dim_path, _base(spark), key="k")
    scd2_apply(spark, dim_path,
               spark.createDataFrame([(1, "Z", 10.0)], ["k", "seg", "bal"]),
               key="k", tracked=["seg", "bal"], version=2)
    scd2_apply(spark, dim_path,
               spark.createDataFrame([(1, "Z", 99.0)], ["k", "seg", "bal"]),
               key="k", tracked=["seg", "bal"], version=3)
    dim = read_table(spark, dim_path)
    hist = sorted(
        [(r["valid_from"], r["valid_to"], r["is_current"], r["bal"])
         for r in dim.filter(F.col("k") == 1).collect()]
    )
    assert hist == [(1, 2, False, 10.0), (2, 3, False, 10.0), (3, None, True, 99.0)]
    # exactly one current row per key; intervals chain without gaps
    per_key = dim.groupBy("k").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert {r["n_cur"] for r in per_key.collect()} == {1}
