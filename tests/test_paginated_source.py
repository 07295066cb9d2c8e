"""R1 paginated per-wallet Python DataSource (io/paginated_source.py):
per-wallet partitions, ascending pagination, block-range pushdown with
page skipping and early termination, error-as-end-of-scan."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, IsNotNull, LessThan

from datalake_polygonscan_spark.io.paginated_source import (
    WalletTransfersDataSource,
    WalletTransfersReader,
    write_wallet_pages,
)


def _raw(spark, n=40, wallets=2):
    return spark.range(n).selectExpr(
        "'w' || CAST(id % {} AS STRING) AS wallet_address".format(wallets),
        "'h' || CAST(id AS STRING) AS hash",
        "CAST(id AS STRING) AS blockNumber",
        "CAST(1700000000 + id AS STRING) AS timeStamp",
        "'f' AS from", "'t' AS to", "'c' AS contractAddress",
        "'Tok' AS tokenName", "'TK' AS tokenSymbol", "'2' AS tokenDecimal",
        "CAST(id * 100 AS STRING) AS value",
    )


def test_roundtrip_and_partition_per_wallet(spark, tmp_path):
    root = str(tmp_path / "pages")
    n_pages = write_wallet_pages(_raw(spark, 40, 2), root, page_size=10)
    assert n_pages == 4  # 20 rows per wallet / 10 per page
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WalletTransfersDataSource)
    df = spark.read.format("wallet_transfers").option("path", root).load()
    assert df.count() == 40
    assert df.rdd.getNumPartitions() == 2  # one partition per wallet
    got = df.filter(F.col("wallet_address") == "w0").agg(F.sum("blockNumber")).collect()[0][0]
    assert got == sum(i for i in range(40) if i % 2 == 0)


def test_push_filters_consumed_and_applied(spark, tmp_path):
    root = str(tmp_path / "pages")
    write_wallet_pages(_raw(spark, 40, 2), root, page_size=5)
    reader = WalletTransfersReader({"path": root})
    unsupported = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("blockNumber",), 10),
                LessThan(("blockNumber",), 20),
                IsNotNull(("tokenName",)),  # not pushable -> handed back
            ]
        )
    )
    assert len(unsupported) == 1 and isinstance(unsupported[0], IsNotNull)
    assert reader.bounds["blockNumber"] == [10, 19]
    rows = [r for p in reader.partitions() for r in reader.read(p)]
    blocks = sorted(r[2] for r in rows)
    assert blocks == list(range(10, 20))


def test_error_page_ends_wallet_scan(spark, tmp_path):
    root = str(tmp_path / "pages")
    write_wallet_pages(_raw(spark, 20, 1), root, page_size=5)  # 4 pages
    wdir = os.path.join(root, "w0")
    # poison page 2: the reference stops paging on status != '1'
    with open(os.path.join(wdir, "page-0002.json")) as f:
        page = json.load(f)
    page["status"] = "0"
    with open(os.path.join(wdir, "page-0002.json"), "w") as f:
        json.dump(page, f)
    reader = WalletTransfersReader({"path": root})
    rows = [r for p in reader.partitions() for r in reader.read(p)]
    assert sorted(r[2] for r in rows) == list(range(10))  # pages 0-1 only


def test_pushdown_in_query_plan_matches_unpushed(spark, tmp_path):
    root = str(tmp_path / "pages")
    write_wallet_pages(_raw(spark, 60, 3), root, page_size=7)
    spark.dataSource.register(WalletTransfersDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.read.format("wallet_transfers").option("path", root).load()
    got = (
        df.filter((F.col("blockNumber") >= 15) & (F.col("timeStamp") <= 1700000050))
        .agg(F.count("*"), F.sum("blockNumber"))
        .collect()[0]
    )
    assert (got[0], got[1]) == (36, sum(range(15, 51)))


def test_push_filters_equal_to_intersects_bounds(spark, tmp_path):
    """EqualTo must INTERSECT previously-consumed range bounds, not
    overwrite them: since consumed filters vanish from Spark's plan,
    `blockNumber = 5 AND blockNumber > 10` has to yield an empty
    interval (no rows), and `= 15` inside [10, 20) has to pin it."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    root = str(tmp_path / "pages")
    write_wallet_pages(_raw(spark, 40, 2), root, page_size=5)

    reader = WalletTransfersReader({"path": root})
    assert list(reader.pushFilters([GreaterThan(("blockNumber",), 10), EqualTo(("blockNumber",), 5)])) == []
    lo, hi = reader.bounds["blockNumber"]
    assert lo > hi  # empty interval
    assert [r for p in reader.partitions() for r in reader.read(p)] == []

    reader2 = WalletTransfersReader({"path": root})
    list(reader2.pushFilters([GreaterThanOrEqual(("blockNumber",), 10), EqualTo(("blockNumber",), 15)]))
    assert reader2.bounds["blockNumber"] == [15, 15]
    rows = [r for p in reader2.partitions() for r in reader2.read(p)]
    assert sorted({r[2] for r in rows}) == [15]
