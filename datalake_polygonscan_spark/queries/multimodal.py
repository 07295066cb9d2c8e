"""Multimodal-column coverage (M1/M2/M3): binary media columns with
typed metadata, oracle-checked.

Driver testdata has no binary column, so each entry first constructs
the deterministic media fixture (operators/media.py:media_table — real
magic bytes + big-endian dims + UTF-8 payload) from ``documents``,
then runs the operator on the BINARY column. The oracle reconstructs
the same bytes as a hex string in DuckDB (`hex`/`encode` are
engine-neutral), so metadata extraction, payload dedup, and the
pandas-UDF header parse all verify end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.media import (
    image_meta_pandas,
    media_metadata,
    media_table,
    payload_md5,
)
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table

#: DuckDB replica of the media fixture's content as a hex string,
#: parameterized on the id expression (headers are functions of the id)
def _hex_content_sql(mid: str) -> str:
    return f"""
        CASE ({mid}) % 3
          WHEN 0 THEN '89504E470D0A1A0A'
                      || lpad(hex((({mid}) * 37) % 1920 + 16), 8, '0')
                      || lpad(hex((({mid}) * 53) % 1080 + 16), 8, '0')
          WHEN 1 THEN 'FFD8FFE0'
                      || lpad(hex((({mid}) * 37) % 1920 + 16), 8, '0')
                      || lpad(hex((({mid}) * 53) % 1080 + 16), 8, '0')
          ELSE '52494646' || lpad(hex((({mid}) % 5) * 8000 + 8000), 8, '0')
        END || hex(encode(text))
"""


def _union_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Original corpus media plus re-wrapped copies (same payload bytes,
    different container header because the new id shifts the kind) —
    the dedup-relevant shape."""
    docs = load_table(spark, sf_dir, "documents")
    original = media_table(docs)
    rewrapped = media_table(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return original.unionByName(rewrapped)


@register(
    "m1_m2_media_meta_dedup",
    oracle=f"""
    WITH ids AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id, text FROM documents
        UNION ALL
        SELECT CAST(doc_id + 100000 AS BIGINT) AS media_id, text
        FROM documents WHERE doc_id % 7 = 0
    ), meta AS (
        SELECT media_id,
               CAST(CASE media_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 12 ELSE 8 END
                    + octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5({_hex_content_sql("media_id")}) AS content_md5,
               CASE media_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS sniffed_mime,
               CASE WHEN media_id % 3 IN (0, 1) THEN CAST((media_id * 37) % 1920 + 16 AS BIGINT) END AS width,
               CASE WHEN media_id % 3 IN (0, 1) THEN CAST((media_id * 53) % 1080 + 16 AS BIGINT) END AS height,
               md5(hex(encode(text))) AS payload_md5
        FROM ids
    )
    SELECT media_id, n_bytes, content_md5, sniffed_mime, width, height, payload_md5,
           CAST(CASE WHEN row_number() OVER (PARTITION BY payload_md5 ORDER BY media_id ASC) = 1
                THEN 1 ELSE 0 END AS INT) AS is_survivor
    FROM meta
    """,
    doc=(
        "M1+M2 multimodal metadata + payload dedup over a BINARY media column: "
        "byte size, engine-neutral content hash, magic-byte mime sniff, header-parsed "
        "image dimensions — all codegen hex surgery, no Python (operators/media.py:media_metadata) — "
        "plus payload-hash dedup where the same asset bytes re-wrapped in a different "
        "container still collapse to one min-id survivor (media_dedup_by_payload "
        "semantics, emitted as is_survivor so every row's metadata stays checkable). "
        "The oracle recomputes the fixture bytes from its formulas, so Spark's actual "
        "binary parsing is what's verified"
    ),
)
def m1_m2(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _union_media(spark, sf_dir)
    meta = media_metadata(media)
    hashed = media.select("media_id", payload_md5().alias("payload_md5"))
    w = Window.partitionBy("payload_md5").orderBy(F.col("media_id").asc())
    surv = hashed.withColumn(
        "is_survivor", (F.row_number().over(w) == 1).cast("int")
    )
    return meta.join(surv, "media_id")


@register(
    "m3_image_meta_udf",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS sniffed_mime,
           CASE WHEN doc_id % 3 IN (0, 1) THEN CAST((doc_id * 37) % 1920 + 16 AS BIGINT) END AS width,
           CASE WHEN doc_id % 3 IN (0, 1) THEN CAST((doc_id * 53) % 1080 + 16 AS BIGINT) END AS height,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(((doc_id * 37) % 1920 + 16) * ((doc_id * 53) % 1080 + 16) AS BIGINT) END AS n_pixels,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents
    """,
    doc=(
        "M3 Arrow-batched media header parse via mapInPandas "
        "(operators/media.py:image_meta_pandas): the pandas-UDF tier where a real "
        "decoder plugs in; the pixel decode itself is a documented "
        "NotImplementedError stub (no image libs in this container), the "
        "batching/schema plumbing is real and oracle-checked"
    ),
)
def m3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return image_meta_pandas(media_table(docs))


@register(
    "m1_m3_media_meta_decode",
    oracle=f"""
    WITH ids AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id, text FROM documents
        UNION ALL
        SELECT CAST(doc_id + 100000 AS BIGINT) AS media_id, text
        FROM documents WHERE doc_id % 7 = 0
    ), meta AS (
        SELECT media_id,
               CAST(CASE media_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 12 ELSE 8 END
                    + octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5({_hex_content_sql("media_id")}) AS content_md5,
               CASE media_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS sniffed_mime,
               CASE WHEN media_id % 3 IN (0, 1) THEN CAST((media_id * 37) % 1920 + 16 AS BIGINT) END AS width,
               CASE WHEN media_id % 3 IN (0, 1) THEN CAST((media_id * 53) % 1080 + 16 AS BIGINT) END AS height,
               CASE WHEN media_id % 3 IN (0, 1)
                    THEN CAST(((media_id * 37) % 1920 + 16) * ((media_id * 53) % 1080 + 16) AS BIGINT) END AS n_pixels,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               md5(hex(encode(text))) AS payload_md5
        FROM ids
    )
    SELECT media_id, n_bytes, content_md5, sniffed_mime, width, height, n_pixels,
           payload_bytes, payload_md5,
           CAST(CASE WHEN row_number() OVER (PARTITION BY payload_md5 ORDER BY media_id ASC) = 1
                THEN 1 ELSE 0 END AS INT) AS is_survivor
    FROM meta
    """,
    doc=(
        "M1+M2+M3 merged entry, the whole binary-media tier in one graded slot: codegen "
        "metadata (byte size, content hash, magic-byte mime sniff, header-parsed dims — "
        "operators/media.py:media_metadata), payload-hash dedup survivors (M2), AND the "
        "Arrow-batched mapInPandas header parse (M3: n_pixels/payload_bytes come from "
        "the pandas-UDF tier over the SAME re-wrapped union, joined on media_id — so one "
        "row checks the codegen parse and the UDF parse against each other and the "
        "oracle's formula reconstruction). Per-id entries m1_m2_media_meta_dedup / "
        "m3_image_meta_udf stay in the local sweep"
    ),
)
def m1_m3(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _union_media(spark, sf_dir)
    meta = media_metadata(media)
    hashed = media.select("media_id", payload_md5().alias("payload_md5"))
    w = Window.partitionBy("payload_md5").orderBy(F.col("media_id").asc())
    surv = hashed.withColumn("is_survivor", (F.row_number().over(w) == 1).cast("int"))
    udf_meta = image_meta_pandas(media).select("media_id", "n_pixels", "payload_bytes")
    return meta.join(surv, "media_id").join(udf_meta, "media_id")
