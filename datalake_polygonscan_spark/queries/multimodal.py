"""Multimodal-column coverage (M1/M2): binary media columns with typed
metadata, oracle-checked.

Driver testdata has no binary column, so each entry first constructs
the deterministic media fixture (operators/media.py:media_table — real
magic bytes + big-endian dims + UTF-8 payload) from ``documents``,
then runs the operator on the BINARY column. The oracle reconstructs
the same bytes as a hex string in DuckDB (`hex`/`encode` are
engine-neutral), so metadata extraction and payload dedup verify
end-to-end. The pandas-UDF tier (image_meta_pandas) registers in
queries/extras.py (m3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.media import (
    media_dedup_by_payload,
    media_metadata,
    media_table,
)
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table

#: DuckDB replica of the media fixture's content as a hex string
_HEX_CONTENT_SQL = """
        CASE doc_id % 3
          WHEN 0 THEN '89504E470D0A1A0A'
                      || lpad(hex((doc_id * 37) % 1920 + 16), 8, '0')
                      || lpad(hex((doc_id * 53) % 1080 + 16), 8, '0')
          WHEN 1 THEN 'FFD8FFE0'
                      || lpad(hex((doc_id * 37) % 1920 + 16), 8, '0')
                      || lpad(hex((doc_id * 53) % 1080 + 16), 8, '0')
          ELSE '52494646' || lpad(hex((doc_id % 5) * 8000 + 8000), 8, '0')
        END || hex(encode(text))
"""


@register(
    "m1_media_metadata",
    oracle=f"""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 12 ELSE 8 END
                + octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5({_HEX_CONTENT_SQL}) AS content_md5,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS sniffed_mime,
           CASE WHEN doc_id % 3 IN (0, 1) THEN CAST((doc_id * 37) % 1920 + 16 AS BIGINT) END AS width,
           CASE WHEN doc_id % 3 IN (0, 1) THEN CAST((doc_id * 53) % 1080 + 16 AS BIGINT) END AS height
    FROM documents
    """,
    doc="M1 multimodal metadata: byte size, engine-neutral content hash, magic-byte mime sniff, header-parsed image dimensions — all codegen over the BINARY column (operators/media.py:media_metadata). The oracle recomputes the same bytes from the fixture formulas, so Spark's actual binary parsing is what's verified",
)
def m1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_metadata(media_table(docs))


@register(
    "m2_media_payload_dedup",
    oracle=f"""
    WITH media AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id, md5(hex(encode(text))) AS payload_md5
        FROM documents
        UNION ALL
        SELECT CAST(doc_id + 100000 AS BIGINT) AS media_id, md5(hex(encode(text))) AS payload_md5
        FROM documents WHERE doc_id % 7 = 0
    )
    SELECT media_id, payload_md5 FROM (
        SELECT media_id, payload_md5,
               row_number() OVER (PARTITION BY payload_md5 ORDER BY media_id ASC) AS rn
        FROM media
    ) WHERE rn = 1
    """,
    doc="M2 media dedup by payload hash: the same asset bytes re-wrapped in a different container (re-keyed copies get different headers/mime) still collapse to one min-id survivor (operators/media.py:media_dedup_by_payload)",
)
def m2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    original = media_table(docs)
    rewrapped = media_table(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    deduped = media_dedup_by_payload(original.unionByName(rewrapped))
    return deduped.select("media_id", "payload_md5")
