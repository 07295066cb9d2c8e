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


def test_soundex_replay_matches_spark_builtin_on_tricky_names(spark):
    """The oracle's from-scratch Soundex must agree with Spark's
    builtin on the names that distinguish the American H/W variant
    from the simplified one."""
    import duckdb

    from pyspark.sql import functions as F

    words = ["Ashcraft", "Tymczak", "Pfister", "Robert", "Rupert",
             "Honeyman", "Washington", "Lee", "Jackson", "aaa", "hhh"]
    got = {
        r["w"]: r["sx"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.soundex("w").alias("sx"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE words AS SELECT * FROM (VALUES "
        + ", ".join(f"('{w}')" for w in words)
        + ") t(w)"
    )
    rows = con.execute("""
        WITH up AS (SELECT w, upper(w) AS u FROM words),
        chars AS (
            SELECT w, u, i, substr(u, CAST(i AS INT), 1) AS ch
            FROM up, LATERAL (SELECT unnest(generate_series(1, length(u))) AS i)
        ), coded AS (
            SELECT w, u, i,
                   CASE WHEN ch IN ('B','F','P','V') THEN '1'
                        WHEN ch IN ('C','G','J','K','Q','S','X','Z') THEN '2'
                        WHEN ch IN ('D','T') THEN '3'
                        WHEN ch = 'L' THEN '4'
                        WHEN ch IN ('M','N') THEN '5'
                        WHEN ch = 'R' THEN '6'
                        WHEN ch IN ('A','E','I','O','U','Y') THEN '0'
                   END AS code
            FROM chars WHERE ch NOT IN ('H', 'W')
        ), collapsed AS (
            SELECT w, u, i, code,
                   lag(code) OVER (PARTITION BY w ORDER BY i) AS prev
            FROM coded
        ), digits AS (
            SELECT w, i, code FROM collapsed
            WHERE i > 1 AND code BETWEEN '1' AND '6'
              AND (prev IS NULL OR prev <> code)
        )
        SELECT up.w,
               substr(up.u, 1, 1)
               || substr(coalesce(string_agg(d.code, '' ORDER BY d.i), '')
                         || '000', 1, 3) AS sx
        FROM up LEFT JOIN digits d ON d.w = up.w
        GROUP BY up.w, up.u
    """).fetchall()
    for w, sx in rows:
        assert got[w] == sx, (w, got[w], sx)


def test_feistel_pseudonymization_bijective_and_invertible(spark):
    """Round-trip identity on small and near-2^62 keys, and the token
    set is a permutation (no collisions) on a contiguous range."""
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.functions.scalars import feistel_pseudonymize

    df = spark.range(0, 4096).select(F.col("id").alias("k")).unionByName(
        spark.range(0, 16).select((F.lit(2**62 - 1) - F.col("id")).alias("k"))
    )
    rt = df.select(
        "k",
        feistel_pseudonymize(F.col("k")).alias("t"),
    ).select("k", "t", feistel_pseudonymize(F.col("t"), inverse=True).alias("back"))
    assert rt.filter("back != k").count() == 0
    row = rt.agg(F.count("*").alias("n"), F.countDistinct("t").alias("nd")).collect()[0]
    assert row["n"] == row["nd"]
    # tokens are in-domain (format preserving: still sub-2^62 BIGINTs)
    assert rt.filter("t < 0 OR t >= 4611686018427387904").count() == 0


def test_feistel_seed_changes_mapping(spark):
    from pyspark.sql import functions as F

    from datalake_polygonscan_spark.functions.scalars import feistel_pseudonymize

    df = spark.range(0, 256).select(F.col("id").alias("k"))
    both = df.select(
        feistel_pseudonymize(F.col("k"), seed="dg4").alias("a"),
        feistel_pseudonymize(F.col("k"), seed="other").alias("b"),
    )
    assert both.filter("a = b").count() < 8  # different keyed permutations
