"""UDF-surface coverage: U1 (pandas UDF), U2 (grouped UDAF via
applyInPandas), U3 (table function via mapInPandas).

UDFs are the engine's slow path by policy — everything else in this
repo is Catalyst expressions. When Python is genuinely needed, it is
always Arrow-batched (pandas UDF / applyInPandas / mapInPandas), never
row-at-a-time: the reference's per-row Python loop
(``process_erc20_token_transfers``, walletDataConsumer.py:86-105) is
the anti-pattern these replace. The computations here are chosen so a
SQL oracle can verify the UDF machinery end-to-end.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table


@pandas_udf(T.DoubleType())
def _net_price(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """U1 — vectorized scalar: price after discount and tax. One Arrow
    batch in, one out; numpy arithmetic, no per-row Python."""
    return extended * (1.0 - discount) * (1.0 + tax)


@register(
    "u1_u2_pandas_udf_udaf",
    oracle="""
    SELECT 'scalar' AS mode,
           l_orderkey AS k1,
           CAST(l_linenumber AS BIGINT) AS k2,
           floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5) / 10000 AS val
    FROM lineitem
    UNION ALL
    SELECT 'grouped' AS mode,
           l_suppkey AS k1,
           CAST(count(*) AS BIGINT) AS k2,
           ROUND(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS val
    FROM lineitem
    GROUP BY l_suppkey
    """,
    doc="U1 Arrow-vectorized pandas UDF (scalar net-price; floor(x*1e4+0.5) rounding is bitwise-reproducible across IEEE engines where ROUND is not) + U2 grouped pandas UDAF via applyInPandas (quantity-weighted mean discount, one Arrow batch per group — a full-group shuffle, which is why built-in aggs win at scale), merged as a tagged union — one graded slot for both U ids",
)
def u1_u2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    scalar = li.select(
        F.lit("scalar").alias("mode"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("long").alias("k2"),
        (F.floor(_net_price("l_extendedprice", "l_discount", "l_tax") * 10000 + 0.5) / 10000).alias("val"),
    )
    grouped = (
        li.select("l_suppkey", "l_quantity", "l_discount")
        .groupBy("l_suppkey")
        .applyInPandas(_weighted_avg, schema=_U2_SCHEMA)
        .select(
            F.lit("grouped").alias("mode"),
            F.col("l_suppkey").alias("k1"),
            F.col("n_items").alias("k2"),
            F.col("weighted_avg_discount").alias("val"),
        )
    )
    return scalar.unionByName(grouped)


_U2_SCHEMA = T.StructType(
    [
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("n_items", T.LongType()),
        T.StructField("weighted_avg_discount", T.DoubleType()),
    ]
)


def _weighted_avg(pdf: pd.DataFrame) -> pd.DataFrame:
    """U2 — per-group pandas UDAF: quantity-weighted mean discount."""
    w = pdf["l_quantity"].sum()
    wavg = float((pdf["l_discount"] * pdf["l_quantity"]).sum() / w) if w else None
    return pd.DataFrame(
        {"l_suppkey": [pdf["l_suppkey"].iloc[0]], "n_items": [len(pdf)], "weighted_avg_discount": [round(wavg, 6)]}
    )


_U3_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("token_len", T.IntegerType()),
    ]
)


def _tokenize_docs(batches):
    """U3 — table function: one input doc row -> N token rows, streamed
    per Arrow batch through mapInPandas (never materializes the whole
    expansion)."""
    for pdf in batches:
        toks = (
            pdf.assign(token=pdf["text"].str.lower().str.strip().str.split(r"\s+"))[["doc_id", "token"]]
            .explode("token", ignore_index=True)
            .dropna(subset=["token"])
        )
        toks = toks[toks["token"] != ""]
        toks["token_len"] = toks["token"].str.len().astype("int32")
        yield toks


@register(
    "u3_udtf_tokenize",
    oracle="""
    SELECT doc_id, token, CAST(length(token) AS INTEGER) AS token_len FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents
    ) WHERE token != ''
    """,
    doc="U3 UDTF (explode-style table function) via mapInPandas: doc -> token rows",
)
def u3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(_tokenize_docs, schema=_U3_SCHEMA)


@register(
    "u1_u3_udf_udaf_udtf",
    oracle="""
    SELECT 'scalar' AS mode,
           l_orderkey AS k1,
           CAST(l_linenumber AS BIGINT) AS k2,
           floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000 + 0.5) / 10000 AS val
    FROM lineitem
    UNION ALL
    SELECT 'grouped' AS mode,
           l_suppkey AS k1,
           CAST(count(*) AS BIGINT) AS k2,
           ROUND(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS val
    FROM lineitem
    GROUP BY l_suppkey
    UNION ALL
    SELECT 'udtf' AS mode,
           doc_id AS k1,
           CAST(count(*) AS BIGINT) AS k2,
           ROUND(SUM(CAST(length(token) AS BIGINT)) / CAST(count(*) AS DOUBLE), 6) AS val
    FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents
    ) WHERE token != ''
    GROUP BY doc_id
    """,
    doc=(
        "The whole Python-surface tier in one graded slot: U1 Arrow-vectorized pandas "
        "UDF (scalar net-price; floor(x*1e4+0.5) rounding is bitwise-reproducible "
        "across IEEE engines) + U2 grouped pandas UDAF via applyInPandas "
        "(quantity-weighted mean discount, one Arrow batch per group) + U3 UDTF-style "
        "table function via mapInPandas (doc -> token rows, streamed per Arrow batch), "
        "verified through per-doc token count and mean token length (exact int "
        "sum/count, one IEEE division — engine-identical). Merged as a tagged union; "
        "per-id entries u1_u2_pandas_udf_udaf / u3_udtf_tokenize stay in the local sweep"
    ),
)
def u1_u3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    scalar = li.select(
        F.lit("scalar").alias("mode"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").cast("long").alias("k2"),
        (F.floor(_net_price("l_extendedprice", "l_discount", "l_tax") * 10000 + 0.5) / 10000).alias("val"),
    )
    grouped = (
        li.select("l_suppkey", "l_quantity", "l_discount")
        .groupBy("l_suppkey")
        .applyInPandas(_weighted_avg, schema=_U2_SCHEMA)
        .select(
            F.lit("grouped").alias("mode"),
            F.col("l_suppkey").alias("k1"),
            F.col("n_items").alias("k2"),
            F.col("weighted_avg_discount").alias("val"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    udtf = (
        docs.mapInPandas(_tokenize_docs, schema=_U3_SCHEMA)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum(F.col("token_len").cast("long")) / F.count("*").cast("double")).alias("mean_len"),
        )
        .select(
            F.lit("udtf").alias("mode"),
            F.col("doc_id").alias("k1"),
            F.col("n_tokens").alias("k2"),
            F.round("mean_len", 6).alias("val"),
        )
    )
    return scalar.unionByName(grouped).unionByName(udtf)


try:  # Spark 4 Python UDTF class API
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="token string, pos int")
    class _TokenizeUDTF:
        """U4 — a REAL Python UDTF (Spark 4 ``@udtf`` class API): one
        input row -> N (token, position) rows, usable from SQL via
        LATERAL — the genuine table-function surface, versus U3's
        mapInPandas formulation of the same shape."""

        def eval(self, text: str):
            for i, t in enumerate((text or "").split()):
                yield (t, i)

    _HAVE_UDTF = True
except ImportError:  # pragma: no cover - older Spark
    _HAVE_UDTF = False


@register(
    "u4_python_udtf",
    oracle="""
    SELECT doc_id, token, CAST(pos AS INTEGER) AS pos FROM (
        SELECT doc_id,
               unnest(toks) AS token,
               unnest(range(0, len(toks))) AS pos
        FROM (
            SELECT doc_id,
                   string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        )
    ) WHERE token != ''
    """,
    doc=(
        "U4 the REAL Spark 4 Python UDTF class API (@udtf + spark.udtf.register + "
        "SQL LATERAL): documents LATERAL-joined to tokenize_udtf(text), one "
        "(token, position) row per token — the genuine table-function surface "
        "(U3 demonstrates the same shape via mapInPandas, which predates the API). "
        "Python str.split() tokenization mirrored in SQL by whitespace-collapse "
        "split; positions verified exactly"
    ),
)
def u4(spark: SparkSession, sf_dir: str) -> DataFrame:
    if not _HAVE_UDTF:
        raise RuntimeError("Spark 4 UDTF API unavailable in this build")
    from datalake_polygonscan_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("tokenize_udtf", _TokenizeUDTF)
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM documents d, LATERAL tokenize_udtf(d.text) t"
    )


@register(
    "u5_arrow_python_udf",
    oracle="""
    SELECT o_orderkey,
           CAST(length(o_orderpriority) - length(replace(o_orderpriority, '-', ''))
                AS INTEGER) AS n_dashes,
           upper(concat(o_orderstatus, '/', o_orderpriority)) AS status_tag,
           CAST(CAST(o_orderkey AS VARCHAR) LIKE '%7%' AS BOOLEAN) AS has_seven
    FROM orders
    """,
    doc=(
        "U5 the Spark 4 ARROW-OPTIMIZED Python UDF (@udf(useArrow=True)): "
        "row-wise Python semantics with Arrow-batched transfer — the "
        "middle tier between classic pickled row-at-a-time UDFs "
        "(serialization-bound) and pandas UDFs (vectorized API). Three "
        "Arrow UDFs over orders (dash count, tag composition, digit "
        "membership), each restated closed-form by the oracle. "
        "Completes the Python-function surface: U1/U2 pandas "
        "UDF/UDAF, U3 mapInPandas table function, U4 real UDTF class, "
        "U5 Arrow scalar UDF"
    ),
)
def u5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def n_dashes(s: str) -> int:
        return s.count("-")

    @udf("string", useArrow=True)
    def status_tag(status: str, prio: str) -> str:
        return f"{status}/{prio}".upper()

    @udf("boolean", useArrow=True)
    def has_seven(k: int) -> bool:
        return "7" in str(k)

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        n_dashes("o_orderpriority").alias("n_dashes"),
        status_tag("o_orderstatus", "o_orderpriority").alias("status_tag"),
        has_seven("o_orderkey").alias("has_seven"),
    )


try:  # Spark 4 polymorphic UDTF: analyze-time schema derivation
    from pyspark.sql.functions import udtf as _udtf_poly
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @_udtf_poly
    class _MeltDoublesUDTF:
        """U6 — a POLYMORPHIC Python UDTF: no static returnType; the
        ``analyze`` hook inspects the TABLE argument's struct at
        query-planning time and derives the output schema from it (the
        key column keeps its ORIGINAL name and type; every DOUBLE
        column melts into (col, val) rows). The same function call
        adapts to any input table shape — Spark 4's answer to
        schema-generic table functions."""

        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            from pyspark.sql.types import (
                DoubleType,
                StringType,
                StructField,
                StructType,
            )

            st = t.dataType  # the TABLE argument's row struct
            key = st.fields[0]
            return AnalyzeResult(
                StructType(
                    [
                        StructField(key.name, key.dataType),
                        StructField("col", StringType()),
                        StructField("val", DoubleType()),
                    ]
                )
            )

        def eval(self, row):
            # field layout is fixed per query: resolve names once per
            # worker instance, then use positional access (asDict()
            # per row dominated the runtime at 600k+ rows)
            names = getattr(self, "_names", None)
            if names is None:
                names = self._names = row.__fields__
            key = row[0]
            for i in range(1, len(names)):
                v = row[i]
                if isinstance(v, float):
                    yield (key, names[i], v)

    _HAVE_POLY_UDTF = True
except ImportError:  # pragma: no cover - older Spark
    _HAVE_POLY_UDTF = False


@register(
    "u6_polymorphic_udtf",
    oracle="""
    SELECT k, col, ROUND(CAST(val AS DOUBLE), 4) AS val FROM (
        SELECT l_orderkey * 10 + l_linenumber AS k, 'l_quantity' AS col,
               l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey * 10 + l_linenumber, 'l_extendedprice',
               l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey * 10 + l_linenumber, 'l_discount',
               l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey * 10 + l_linenumber, 'l_tax',
               l_tax FROM lineitem
    ) _m
    """,
    doc=(
        "U6 — polymorphic Python UDTF (Spark 4 analyze-time schema): the UDTF "
        "declares NO static returnType; its analyze() hook receives the TABLE "
        "argument's struct during planning and derives the output schema from "
        "it (key column keeps its original name/type, every DOUBLE column "
        "melts to (col, val) rows). Called with TABLE(...) over lineitem it "
        "emits four rows per line — the oracle restates it as a 4-way UNION "
        "ALL. Python-worker parallelism follows the INPUT partitioning (no "
        "PARTITION BY, no mandated shuffle), so the TABLE argument carries a "
        "REPARTITION hint sized to the session: a 3-split local parquet scan "
        "otherwise feeds 3 Python workers and serializes the eval loop (5x "
        "wall-clock here). At 100 TB the scan has thousands of splits and "
        "the hint is a no-op-cost guarantee, not a behavior change"
    ),
)
def u6(spark: SparkSession, sf_dir: str) -> DataFrame:
    if not _HAVE_POLY_UDTF:
        raise RuntimeError("Spark 4 polymorphic UDTF API unavailable in this build")
    from datalake_polygonscan_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("melt_doubles_udtf", _MeltDoublesUDTF)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return spark.sql(
        f"""
        SELECT m.k, m.col, ROUND(CAST(m.val AS DOUBLE), 4) AS val
        FROM melt_doubles_udtf(TABLE(
            SELECT /*+ REPARTITION({n_part}) */
                   l_orderkey * 10 + l_linenumber AS k,
                   l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem
        )) m
        """
    )


@register(
    "u7_apply_in_arrow",
    oracle="""
    WITH d AS (
        SELECT l_returnflag, l_linestatus, l_quantity,
               l_extendedprice * (1 - l_discount) AS disc_price
        FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           ROUND(MIN(disc_price), 4) AS min_disc_price,
           ROUND(MAX(disc_price), 4) AS max_disc_price
    FROM d
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "U7 the Spark 4 pure-Arrow Python surface: mapInArrow derives "
        "a column with pyarrow.compute on RecordBatches (no pandas "
        "materialization — zero-copy Arrow in, Arrow out), then "
        "groupBy().applyInArrow aggregates each group as a pa.Table. "
        "Chosen aggregates are order-insensitive (count, exact int64 "
        "sum, min/max of a PER-ROW IEEE product), so any partitioning "
        "and any within-group batch order hash-match the SQL oracle. "
        "The Arrow path skips the pandas conversion tax the U1/U2 "
        "tier pays — the right boundary for binary/tensor columns"
    ),
)
def u7_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"
    )

    def derive(batches):
        # mapInArrow: RecordBatch -> RecordBatch, pure Arrow kernels
        for rb in batches:
            disc = pc.multiply(
                rb.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), rb.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column("l_returnflag"),
                    rb.column("l_linestatus"),
                    rb.column("l_quantity"),
                    disc,
                ],
                ["l_returnflag", "l_linestatus", "l_quantity", "disc_price"],
            )

    derived = li.mapInArrow(
        derive,
        schema=(
            "l_returnflag string, l_linestatus string, "
            "l_quantity double, disc_price double"
        ),
    )

    def group_stats(tbl: pa.Table) -> pa.Table:
        q = pc.cast(tbl.column("l_quantity"), pa.int64())
        dp = tbl.column("disc_price")
        return pa.table(
            {
                "l_returnflag": [tbl.column("l_returnflag")[0].as_py()],
                "l_linestatus": [tbl.column("l_linestatus")[0].as_py()],
                "n_rows": pa.array([tbl.num_rows], pa.int64()),
                "sum_qty": pa.array([pc.sum(q).as_py()], pa.int64()),
                "min_disc_price": pa.array([pc.min(dp).as_py()], pa.float64()),
                "max_disc_price": pa.array([pc.max(dp).as_py()], pa.float64()),
            }
        )

    out = derived.groupBy("l_returnflag", "l_linestatus").applyInArrow(
        group_stats,
        schema=(
            "l_returnflag string, l_linestatus string, n_rows long, "
            "sum_qty long, min_disc_price double, max_disc_price double"
        ),
    )
    return out.select(
        "l_returnflag", "l_linestatus", "n_rows", "sum_qty",
        F.round("min_disc_price", 4).alias("min_disc_price"),
        F.round("max_disc_price", 4).alias("max_disc_price"),
    )


# ---------------------------------------------------------------------------
# U8: iterator-of-series pandas UDF — per-partition init (model loading)
# ---------------------------------------------------------------------------


@register(
    "u8_scalar_iter_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE substr(o_orderpriority, 1, 1)
                      WHEN '1' THEN 50 WHEN '2' THEN 40 WHEN '3' THEN 30
                      WHEN '4' THEN 20 ELSE 10 END
                    * (o_orderkey % 100)) AS BIGINT) AS score_sum
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc=(
        "U8 the ITERATOR-of-series pandas UDF (SCALAR_ITER) — the "
        "fourth Python evaluation mode beside scalar pandas UDFs "
        "(U1), grouped UDAFs (U2) and mapInPandas UDTFs (U3), and "
        "the one a real ML-scoring pipeline needs: expensive state "
        "(the 'model' — here a deterministic priority-weight table) "
        "initializes ONCE PER PARTITION before the batch loop, then "
        "every Arrow batch streams through the already-loaded state "
        "instead of paying the init per batch or per row. Scoring is "
        "exact integer arithmetic (weight * key%100) so the oracle "
        "replays it as plain SQL — the graded aggregate proves the "
        "iterator plumbing delivered every batch exactly once"
    ),
)
def u8_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def score(batches: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        # per-partition init: the "model load" happens once, not per batch
        model = {"1": 50, "2": 40, "3": 30, "4": 20, "5": 10}
        for prio, okey in batches:
            w = prio.str.slice(0, 1).map(lambda c: model.get(c, 10))
            yield (w * (okey % 100)).astype("int64")

    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        "o_orderpriority",
        score(F.col("o_orderpriority"), F.col("o_orderkey")).alias("s"),
    )
    return scored.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("s").cast("long").alias("score_sum"),
    )
