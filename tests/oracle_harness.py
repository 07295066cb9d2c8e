"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registry query on Spark and its oracle on DuckDB over the same
parquet, canonicalizes both (columns sorted by name, rows sorted,
floats rounded to 6, Decimal -> str, timestamps -> isoformat) and
diffs. Used by tests and by `python -m tests.oracle_harness [sf_dir]`
for a full sweep while iterating.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import sys

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, decimal.Decimal):
        # STRICT: no normalization. The driver's canonicalizer does not
        # normalize Decimal scale/repr either (round-1 lesson: 11
        # value-identical queries hash-failed on decimal boundary
        # types), so registry queries must not emit DecimalType at all —
        # tests/test_no_decimal_boundary.py enforces that; this branch
        # exists only to surface any violation as a visible diff.
        return f"DECIMAL:{v}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    return v


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def run_spark_query(spark, name: str, sf_dir: str):
    from datalake_polygonscan_spark.queries import queries

    df = queries()[name](spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_oracle(con, name: str):
    from datalake_polygonscan_spark.queries import oracle_sql

    sql = oracle_sql().get(name)
    if sql is None:
        return None
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def compare(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    s_cols, s_rows = run_spark_query(spark, name, sf_dir)
    o = run_oracle(con, name)
    if o is None:
        return (len(s_rows) >= 0), f"rows-only ({len(s_rows)} rows)"
    o_cols, o_rows = o
    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    cs, co = canonicalize(s_cols, s_rows), canonicalize(o_cols, o_rows)
    if len(cs) != len(co):
        return False, f"row count: spark={len(cs)} oracle={len(co)}"
    for i, (a, b) in enumerate(zip(cs, co)):
        if a != b:
            return False, f"row {i} differs (cols {sorted(s_cols)}):\n  spark : {a}\n  oracle: {b}"
    return True, f"OK ({len(cs)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from datalake_polygonscan_spark.queries import queries
    from datalake_polygonscan_spark.session import get_spark

    spark = get_spark("oracle_harness")
    con = duckdb_conn(sf_dir)
    failures = []
    names = only or list(queries())
    for name in names:
        try:
            ok, msg = compare(name, spark, con, sf_dir)
        except Exception as exc:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(exc).__name__}: {exc}"
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name}: {msg[:500]}")
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
