"""Deterministic scale-up of the driver testdata: build an sfN-shaped
dataset from sf0.1 by unioning KEY-SHIFTED copies, so the iterative
operator tier can be measured at 10x data without touching the
read-only /root/testdata.

Referential integrity is preserved copy-by-copy: every foreign key
shifts by the SAME per-entity offset as its primary key (copy i's
lineitem rows still join copy i's orders/part/supplier rows), so join
selectivities and group cardinalities scale linearly — the TPC-H
scaling model (region/nation stay fixed, fact/dim tables grow).
Document text is prefixed per copy (shifting every word shingle) so
the near-dup workload doesn't degenerate into 10-way exact duplicate
groups; numeric distributions are untouched.

Usage: python tools/scale_testdata.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: key columns that shift together, grouped by the entity whose
#: population defines the offset
ENTITY_KEYS = {
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "customer": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "events": [("events", "event_id")],
    "events_user": [("events", "user_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}

#: tables copied verbatim (fixed dimensions, TPC-H style)
FIXED = ("region", "nation")

SCALED = ("customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")


def _offset_base(spark: SparkSession, src: str, table: str, col: str) -> int:
    """Next power of 10 above the key's max — round offsets keep the
    shifted keys human-readable and collision-free."""
    mx = (
        spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        .agg(F.max(col)).collect()[0][0]
    )
    base = 10
    while base <= int(mx):
        base *= 10
    return base


def scale_dir(spark: SparkSession, src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    offsets: dict[tuple[str, str], int] = {}
    for entity, cols in ENTITY_KEYS.items():
        table, col = cols[0]
        base = _offset_base(spark, src, table, col)
        for t, c in cols:
            offsets[(t, c)] = base

    for t in FIXED:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))

    for t in SCALED:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        shifted_cols = {c: b for (tt, c), b in offsets.items() if tt == t}
        copies: list[DataFrame] = []
        for i in range(factor):
            c = df
            for col, base in shifted_cols.items():
                c = c.withColumn(col, (F.col(col) + F.lit(i * base)).cast(dict(df.dtypes)[col]))
            if t == "documents" and i > 0:
                # shift every word shingle so copies aren't exact dups
                c = c.withColumn("text", F.concat(F.lit(f"s{i} "), F.col("text")))
                c = c.withColumn("n_chars", F.length("text").cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".bench_data/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from datalake_polygonscan_spark.session import get_spark

    spark = get_spark("scale-testdata")
    scale_dir(spark, src, dst, factor)
    for t in FIXED + SCALED:
        n = spark.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
        print(f"RESULT {t}: {n}")


if __name__ == "__main__":
    main()
