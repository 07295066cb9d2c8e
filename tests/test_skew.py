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
