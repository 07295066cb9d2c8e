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


def _read_rows(reader, partition):
    """Flatten the reader's Arrow RecordBatches back to row tuples
    (the reader switched to the Arrow fast path in round 5)."""
    rows = []
    for batch in reader.read(partition):
        rows.extend(tuple(d.values()) for d in batch.to_pylist())
    return rows


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
    rows = [r for p in reader.partitions() for r in _read_rows(reader, p)]
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
    rows = [r for p in reader.partitions() for r in _read_rows(reader, p)]
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
    assert [r for p in reader.partitions() for r in _read_rows(reader, p)] == []

    reader2 = WalletTransfersReader({"path": root})
    list(reader2.pushFilters([GreaterThanOrEqual(("blockNumber",), 10), EqualTo(("blockNumber",), 15)]))
    assert reader2.bounds["blockNumber"] == [15, 15]
    rows = [r for p in reader2.partitions() for r in _read_rows(reader2, p)]
    assert sorted({r[2] for r in rows}) == [15]


def test_stream_reader_exactly_once_and_error_pages(spark, tmp_path):
    """R1s: offsets advance per wallet page count — restart with the
    same checkpoint ingests ONLY new pages; an R4 error page yields no
    rows but still advances (the scan resumes on later pages)."""
    import json
    import os

    from datalake_polygonscan_spark.io.paginated_source import WalletTransfersDataSource

    spark.dataSource.register(WalletTransfersDataSource)
    root = str(tmp_path / "pages")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    def page(wallet, i, txs, status="1"):
        d = os.path.join(root, wallet)
        os.makedirs(d, exist_ok=True)
        blocks = [t[0] for t in txs] or [0]
        body = {
            "status": status, "wallet": wallet,
            "startblock": min(blocks), "endblock": max(blocks),
            "result": [
                {"hash": h, "blockNumber": str(b), "timeStamp": str(b * 2),
                 "from": "a", "to": "b", "contractAddress": "c", "tokenName": "T",
                 "tokenSymbol": "T", "tokenDecimal": "6", "value": str(v)}
                for b, h, v in txs
            ],
        }
        with open(os.path.join(d, f"page-{i:04d}.json"), "w") as f:
            json.dump(body, f)

    def run():
        q = (
            spark.readStream.format("wallet_transfers").option("path", root).load()
            .writeStream.format("parquet").option("path", out).outputMode("append")
            .trigger(availableNow=True).option("checkpointLocation", chk).start()
        )
        q.awaitTermination()

    page("w1", 0, [(1, "h1", 10), (2, "h2", 20)])
    page("w2", 0, [(5, "h3", 30)])
    run()
    assert sorted(r.tx_hash for r in spark.read.parquet(out).collect()) == ["h1", "h2", "h3"]

    page("w1", 1, [(3, "h4", 40)])
    page("w3", 0, [(9, "h5", 50)])
    run()
    got = sorted(r.tx_hash for r in spark.read.parquet(out).collect())
    assert got == ["h1", "h2", "h3", "h4", "h5"]  # no re-delivery

    page("w2", 1, [(7, "h6", 60)], status="0")  # API error page
    run()
    assert sorted(r.tx_hash for r in spark.read.parquet(out).collect()) == got
    page("w2", 2, [(8, "h7", 70)])  # recovery: later page flows again
    run()
    assert "h7" in {r.tx_hash for r in spark.read.parquet(out).collect()}
