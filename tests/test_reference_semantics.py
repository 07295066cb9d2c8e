"""Reference-parity unit tests (SURVEY.md §5 plan, item 1 & 3):
R6 timestamp formatting, R7 decimal scaling edge cases, R8 union,
end-to-end ingest pipeline + idempotency, quarantine split.
"""

from __future__ import annotations

import decimal
import json
import os

from pyspark.sql import functions as F

from datalake_polygonscan_spark.functions.scalars import epoch_to_utc_string, scale_token_amount
from datalake_polygonscan_spark.io.sinks import read_table
from datalake_polygonscan_spark.io.sources import quarantine_split, read_json
from datalake_polygonscan_spark.pipeline.wallet_ingest import process_token_transfers, run_snapshot_refresh
from datalake_polygonscan_spark.schemas import RAW_TOKENTX_SCHEMA, WALLET_TXS_SCHEMA, raw_tokentx_with_wallet


def _tokentx_row(**kw):
    base = {
        "hash": "0xabc",
        "blockNumber": "1000",
        "timeStamp": "1700000000",
        "from": "0xfrom",
        "to": "0xto",
        "contractAddress": "0xc0",
        "tokenName": "Tok",
        "tokenSymbol": "TOK",
        "tokenDecimal": "18",
        "value": "1000000000000000000",
        "wallet_address": "0xwallet",
    }
    base.update(kw)
    return base


def test_r6_epoch_to_utc_string_parity(spark):
    """R6: reference formats with time.gmtime (UTC) — walletDataConsumer.py:96."""
    df = spark.createDataFrame([("0",), ("1700000000",), ("86399",)], ["ts"])
    got = [r[0] for r in df.select(epoch_to_utc_string("ts")).collect()]
    # expected values computed per the reference's formula
    assert got == ["1970-01-01 00:00:00", "2023-11-14 22:13:20", "1970-01-01 23:59:59"]


def test_r7_decimal_scaling_edges(spark):
    """R7 upgraded: DecimalType(38,18) is exact where the reference's
    float division (walletDataConsumer.py:103) loses precision."""
    rows = [
        ("0", "18", decimal.Decimal("0")),
        ("1", "18", decimal.Decimal("1E-18")),
        ("1000000000000000000", "18", decimal.Decimal("1")),
        ("123456789012345678901", "18", decimal.Decimal("123.456789012345678901")),
        ("5", "0", decimal.Decimal("5")),
        ("123456", "6", decimal.Decimal("0.123456")),
    ]
    df = spark.createDataFrame([(v, d) for v, d, _ in rows], ["value", "dec"])
    got = df.select(scale_token_amount("value", "dec").alias("q")).collect()
    for (_, _, want), r in zip(rows, got):
        assert r.q == want, (r.q, want)


def test_r7_uint256_overflow_to_null(spark):
    """Raw amounts beyond DecimalType(38,0) (uint256 max ~1.2e77)
    overflow to NULL for quarantine, never silently corrupt."""
    huge = str(2**256 - 1)
    df = spark.createDataFrame([(huge, "18")], ["value", "dec"])
    assert df.select(scale_token_amount("value", "dec").alias("q")).collect()[0].q is None


def test_process_token_transfers_schema(spark):
    raw = spark.createDataFrame([_tokentx_row()], schema=raw_tokentx_with_wallet())
    out = process_token_transfers(raw)
    # name+type parity (nullability is derivation-dependent)
    assert [(f.name, f.dataType) for f in out.schema] == [(f.name, f.dataType) for f in WALLET_TXS_SCHEMA]
    row = out.collect()[0]
    assert row.block_number == 1000
    assert row.quantity == decimal.Decimal("1")
    assert row.tx_time.isoformat() == "2023-11-14T22:13:20"


def test_pipeline_end_to_end_and_idempotent(spark, tmp_path):
    """Raw JSON -> snapshot table; run twice -> identical table (the
    reference's TRUNCATE+reload 'idempotency' made atomic)."""
    raw_dir = str(tmp_path / "raw")
    os.makedirs(raw_dir)
    rows = [
        _tokentx_row(hash=f"0x{i}", blockNumber=str(100 + i), wallet_address=f"0xw{i % 3}") for i in range(30)
    ]
    with open(os.path.join(raw_dir, "part-0.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    table = str(tmp_path / "wallet_txs")

    out1 = run_snapshot_refresh(spark, raw_dir, table)
    assert out1.count() == 30
    out2 = run_snapshot_refresh(spark, raw_dir, table)
    a = sorted(map(str, out1.collect()))
    b = sorted(map(str, out2.collect()))
    assert a == b
    # block-range pushdown (R2)
    out3 = run_snapshot_refresh(spark, raw_dir, table, block_range=(100, 109))
    assert out3.count() == 10


def test_quarantine_split(spark, tmp_path):
    """R4 fixed: malformed rows -> quarantine, never silent empty."""
    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        f.write(json.dumps(_tokentx_row()) + "\n")
        f.write("{not json at all\n")
    df = read_json(spark, p, raw_tokentx_with_wallet(), permissive=True)
    clean, bad = quarantine_split(df)
    assert clean.count() == 1
    assert bad.count() == 1


def test_r8_union_fan_in(spark):
    """R8: the 29-wallet extend loop == unionByName; column order must
    not matter (the reference's list-of-dicts didn't care either)."""
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([("y", 2)], ["v", "k"])
    got = {tuple(r) for r in a.unionByName(b.select("k", "v")).collect()}
    assert got == {(1, "x"), (2, "y")}


def test_r7_decimals_exceeding_value_width(spark):
    """decimals >= 38+len(value) (legal on-chain: tokenDecimal is
    uint8) must produce the mathematically-right magnitude — the
    data-dependent pad keeps substring indices positive where a fixed
    38-zero pad would silently count from the string end."""
    rows = [
        ("5", "45"),    # 5e-45: below (38,18) resolution -> 0
        ("5", "19"),    # 5e-19: rounds half-up to the nearest scale-18 value
        ("5", "255"),   # uint8 max
    ]
    df = spark.createDataFrame(rows, ["value", "dec"])
    got = [r.q for r in df.select(scale_token_amount("value", "dec").alias("q")).collect()]
    # nearest (38,18) representation every time — never a
    # wrong-magnitude value like 0.00005 (the fixed-pad bug)
    assert got == [
        decimal.Decimal("0E-18"),
        decimal.Decimal("1E-18"),
        decimal.Decimal("0E-18"),
    ], got
