"""DQ1 expectation suite (operators/quality.py): metric math, pass
flags, single-scan plan shape, FK orphan detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.quality import (
    expectations,
    referential_integrity,
)


def _rows(df):
    return {
        r.check_name: (r.metric, r.threshold, r.passed) for r in df.collect()
    }


def test_expectations_metrics_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.io", 10.0),
            (2, "b@x.io", 20.0),
            (2, None, -5.0),       # dup key, null email, negative value
            (3, "not-an-email", 40.0),
        ],
        "id long, email string, v double",
    )
    got = _rows(
        expectations(
            df,
            [
                {"check": "completeness", "column": "email", "min_ratio": 0.9},
                {"check": "uniqueness", "column": "id", "min_ratio": 1.0},
                {"check": "min", "column": "v", "at_least": 0.0},
                {"check": "max", "column": "v", "at_most": 100.0},
                {"check": "pattern", "column": "email", "regex": "^[^@]+@[^@]+$", "min_ratio": 1.0},
                {"check": "in_set", "column": "id", "values": [1, 2, 3], "min_ratio": 1.0},
            ],
        )
    )
    assert got["completeness"] == (0.75, 0.9, 0)
    assert got["uniqueness"] == (0.75, 1.0, 0)
    assert got["min"] == (-5.0, 0.0, 0)
    assert got["max"] == (40.0, 100.0, 1)
    # a NULL email FAILS the pattern check (coalesced to false — same
    # semantics as the oracle's CASE WHEN): 2 of 4 rows match
    assert got["pattern"][2] == 0 and abs(got["pattern"][0] - 2 / 4) < 1e-5
    assert got["in_set"] == (1.0, 1.0, 1)


def test_expectations_single_scan(spark, sf_dir):
    from datalake_polygonscan_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    suite = expectations(
        o,
        [
            {"check": "completeness", "column": "o_custkey", "min_ratio": 1.0},
            {"check": "min", "column": "o_totalprice", "at_least": 0.0},
            {"check": "uniqueness", "column": "o_orderkey", "min_ratio": 1.0},
        ],
    )
    plan = suite._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # the whole suite, one scan


def test_referential_integrity_counts_orphans(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_integrity(fact, "fk", dim, "pk").collect()[0]
    assert row.passed == 0
    assert row.metric == 0.75  # 3 of 4 non-null keys resolve


def test_expectations_rejects_bad_specs(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="unknown check"):
        expectations(df, [{"check": "nope", "column": "id", "min_ratio": 1.0}]).collect()
    with pytest.raises(ValueError, match="no threshold"):
        expectations(df, [{"check": "completeness", "column": "id"}]).collect()
    with pytest.raises(ValueError, match="no checks"):
        expectations(df, [])


def test_uniqueness_approx_tier(spark):
    """The sketch-backed uniqueness check stays within its rsd of the
    exact ratio (the 100 TB tier — no distinct-value shuffle)."""
    df = spark.range(5000).select((F.col("id") % 4000).alias("k"))
    exact = _rows(
        expectations(df, [{"check": "uniqueness", "column": "k", "min_ratio": 0.9}])
    )["uniqueness"]
    approx = _rows(
        expectations(
            df, [{"check": "uniqueness", "column": "k", "min_ratio": 0.9, "approx": True}]
        )
    )["uniqueness"]
    assert abs(approx[0] - exact[0]) <= 0.05
    assert exact[0] == 0.8
