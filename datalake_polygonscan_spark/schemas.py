"""Explicit StructType schemas for every table the engine touches.

The reference never declares a schema — ``pd.DataFrame(all_transactions)``
at ``walletDataConsumer.py:139`` infers columns from dict keys, and the
Redshift DDL lives outside the repo. This engine declares everything:
schema inference in a production path is a correctness bug at 100 TB
(one malformed file silently retypes a column).

Two type upgrades over the reference (SURVEY.md §1.2):
- ``tx_time`` is a real TimestampType (reference stores a formatted
  string, ``walletDataConsumer.py:96``).
- ``quantity`` is DecimalType(38,18) (reference uses lossy binary-float
  division, ``walletDataConsumer.py:103``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-semantics schemas
# ---------------------------------------------------------------------------

#: Raw PolygonScan `tokentx` API row — every field is a JSON string
#: (hence the int() casts at walletDataConsumer.py:95,102,103).
RAW_TOKENTX_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType()),
        T.StructField("blockNumber", T.StringType()),
        T.StructField("timeStamp", T.StringType()),
        T.StructField("from", T.StringType()),
        T.StructField("to", T.StringType()),
        T.StructField("contractAddress", T.StringType()),
        T.StructField("tokenName", T.StringType()),
        T.StructField("tokenSymbol", T.StringType()),
        T.StructField("tokenDecimal", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

#: The engine's output table — the reference's `polygonscan.wallet_txs`
#: (column set from the dict literal at walletDataConsumer.py:92-104).
WALLET_TXS_SCHEMA = T.StructType(
    [
        T.StructField("wallet_address", T.StringType(), False),
        T.StructField("tx_hash", T.StringType(), False),
        T.StructField("block_number", T.LongType()),
        T.StructField("tx_time", T.TimestampType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("token_contract", T.StringType()),
        T.StructField("token_name", T.StringType()),
        T.StructField("token_symbol", T.StringType()),
        T.StructField("token_decimal", T.IntegerType()),
        T.StructField("quantity", T.DecimalType(38, 18)),
    ]
)

def raw_tokentx_with_wallet() -> T.StructType:
    """RAW_TOKENTX_SCHEMA + the landing-time wallet column. A fresh
    StructType every call — StructType.add mutates in place, so the
    module-level constant must never be extended directly."""
    return T.StructType(list(RAW_TOKENTX_SCHEMA.fields) + [T.StructField("wallet_address", T.StringType())])


# ---------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md / FIXTURES.md §B) — used when a
# format round-trip (JSON/CSV) must re-read without inference.
# ---------------------------------------------------------------------------

REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION_SCHEMA,
    "nation": NATION_SCHEMA,
    "customer": CUSTOMER_SCHEMA,
    "supplier": SUPPLIER_SCHEMA,
    "part": PART_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "lineitem": LINEITEM_SCHEMA,
    "events": EVENTS_SCHEMA,
    "documents": DOCUMENTS_SCHEMA,
    "embeddings": EMBEDDINGS_SCHEMA,
}
