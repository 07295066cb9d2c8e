"""salted_join (operators/skew.py): equality with the plain join and
actual salt spread."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.skew import salted_join


def _skewed(spark):
    # one hot key (1) carrying 90% of the fact rows
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, float(i)) for i in range(1000)], ["row_id", "k", "v"]
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unmatched")], ["k", "label"])
    return fact, dim


def test_salted_inner_equals_plain_join(spark):
    fact, dim = _skewed(spark)
    plain = {tuple(r) for r in fact.join(dim, "k").select("row_id", "k", "v", "label").collect()}
    salted = {
        tuple(r)
        for r in salted_join(fact, dim, "k").select("row_id", "k", "v", "label").collect()
    }
    assert salted == plain and len(plain) == 1000


def test_salted_left_keeps_unmatched_fact_rows(spark):
    fact, dim = _skewed(spark)
    extra = spark.createDataFrame([(5000, 99, 0.0)], ["row_id", "k", "v"])
    fact = fact.unionByName(extra)
    out = salted_join(fact, dim, "k", how="left")
    row = out.filter(F.col("row_id") == 5000).collect()[0]
    assert row.label is None
    assert out.count() == 1001


def test_hot_key_spreads_over_salts(spark):
    fact, dim = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(16))
    n_salts = fact.filter(F.col("k") == 1).select(salt.alias("s")).distinct().count()
    assert n_salts >= 12  # hot key's rows spread over most of 16 salts


def test_rejects_unsupported_how(spark):
    fact, dim = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


def test_auto_salt_detects_pathological_key(spark):
    """salt_n=None derives the fan-out from a key-frequency sketch:
    the hot key must auto-spread within 2x of a hand-tuned salt."""
    from datalake_polygonscan_spark.operators.skew import detect_salt_n

    fact, dim = _skewed(spark)  # key 1 carries 90% of rows
    auto_n = detect_salt_n(fact, "k")
    assert auto_n > 1  # the sketch saw the hot key

    def max_task_rows(salt_n):
        salted = fact.withColumn(
            "_s", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_n))
        )
        per = salted.filter(F.col("k") == 1).groupBy("_s").count().collect()
        return max(r["count"] for r in per)

    hand = max_task_rows(16)  # the former hand-tuned constant
    auto = max_task_rows(auto_n)
    assert auto <= 2 * hand

    # and the auto-salted join stays semantically invisible
    plain = {tuple(r) for r in fact.join(dim, "k").select("row_id", "k", "v", "label").collect()}
    auto_joined = {
        tuple(r)
        for r in salted_join(fact, dim, "k", salt_n=None)
        .select("row_id", "k", "v", "label")
        .collect()
    }
    assert auto_joined == plain


def test_auto_salt_skips_replication_on_uniform_keys(spark):
    from datalake_polygonscan_spark.operators.skew import detect_salt_n

    fact = spark.createDataFrame(
        [(i, i % 500, float(i)) for i in range(5000)], ["row_id", "k", "v"]
    )
    # 500 uniform keys, shuffle.partitions=32 in tests: hottest share
    # ~1/500 -> ceil(0.002 * 32) = 1 -> no salting
    assert detect_salt_n(fact, "k") == 1
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(500)], ["k", "label"])
    out = salted_join(fact, dim, "k", salt_n=None)
    assert out.count() == 5000
    assert "_salt" not in out.columns


def test_aqe_skew_join_splits_hot_partition_and_matches_salted(spark):
    """Spark's built-in AQE skew-join handles the same pathological
    distribution the explicit salted join targets: with broadcast off
    and test-scaled thresholds, the hot key's shuffle partition is
    SPLIT at runtime (SortMergeJoin(skew=true), AQEShuffleRead ...
    skewed) and the output matches salted_join row-for-row.

    Division of labor at 100 TB: AQE skew-join is the default for
    plain shuffled JOINS (zero code, runtime stats decide); the
    explicit salted join (operators/skew.py) remains necessary where
    AQE cannot reach — skewed AGGREGATIONS (two-phase salt+merge),
    joins that must stay broadcast-free on BOTH sides, and engines'
    deterministic-layout paths (bucketed co-located joins)."""
    from datalake_polygonscan_spark.operators.skew import salted_join

    n = 200_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 20 != 0, F.lit(1))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") * 1.0).alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("lbl"), F.col("id")).alias("label"),
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # scale the 256MB default down to the test data volume
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        j = fact.join(dim, "k").select("row_id", "k", "v", "label")
        aqe_rows = {tuple(r) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan  # the hot partition was split
        assert "skewed" in plan                    # AQEShuffleRead skew spec
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    salted = {
        tuple(r)
        for r in salted_join(fact, dim, "k").select("row_id", "k", "v", "label").collect()
    }
    assert aqe_rows == salted and len(salted) == n
