"""M4: media frame sampling (tail entry, fully oracled).

Frame extraction stays entirely in codegen — explode over the frame
index + ``substr`` on the BINARY column — so the oracle can replay it
as hex-string surgery on the reconstructed fixture bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_polygonscan_spark.operators.media import media_table, sample_frames
from datalake_polygonscan_spark.queries.multimodal import _hex_content_sql
from datalake_polygonscan_spark.queries.registry import register
from datalake_polygonscan_spark.tables import load_table

_FRAME = 256
_NTH = 4


@register(
    "m4_media_frame_sample",
    oracle=f"""
    WITH m AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               {_hex_content_sql("doc_id")} AS hx,
               CASE doc_id % 3 WHEN 0 THEN 32 WHEN 1 THEN 24 ELSE 16 END AS hdrc
        FROM documents
    ), p AS (
        SELECT media_id, substr(hx, hdrc + 1) AS ph FROM m WHERE length(hx) > hdrc
    ), f AS (
        SELECT media_id, ph,
               unnest(generate_series(0, CAST(floor((length(ph) / 2 + {_FRAME - 1}) / {_FRAME}) AS INT) - 1)) AS frame_idx
        FROM p
    )
    SELECT media_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           substr(ph, frame_idx * {2 * _FRAME} + 1, {2 * _FRAME}) AS frame_hex,
           md5(substr(ph, frame_idx * {2 * _FRAME} + 1, {2 * _FRAME})) AS frame_md5
    FROM f WHERE frame_idx % {_NTH} = 0
    """,
    doc="M4 media frame sampling: payload bytes strided into 256-byte frames, every 4th emitted as its own row — explode(sequence) + BINARY substr, pure codegen, binary never crosses into Python (operators/media.py:sample_frames); oracle replays the stride as hex surgery on the reconstructed fixture",
)
def m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(media_table(docs), frame_bytes=_FRAME, every_nth=_NTH)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.hex("frame").alias("frame_hex"),
        "frame_md5",
    )
