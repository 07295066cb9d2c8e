"""Expression builders — all JVM-side Catalyst expressions (no Python UDFs)."""

from datalake_polygonscan_spark.functions.scalars import (
    epoch_to_utc_string,
    epoch_to_timestamp,
    scale_token_amount,
)
from datalake_polygonscan_spark.functions.vectors import cosine_similarity, dot, l2_norm
from datalake_polygonscan_spark.functions.text import (
    char_shingles,
    normalize_text,
    tokens,
    word_shingles,
)

__all__ = [
    "epoch_to_utc_string",
    "epoch_to_timestamp",
    "scale_token_amount",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize_text",
    "tokens",
    "word_shingles",
    "char_shingles",
]
