"""Composed operators: dedup (L1/L2), similarity search (L3), top-k.

Everything here is a composition of DataFrame primitives — shuffles are
explicit in the composition (a groupBy/join you can see), hot loops stay
in Catalyst expressions, and Python only orchestrates.
"""

from datalake_polygonscan_spark.operators.dedup import (
    exact_dedup,
    shingle_sets,
    minhash_signatures,
    minhash_lsh_candidate_pairs,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
    embedding_near_duplicates,
)
from datalake_polygonscan_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    ivf_topk,
)
from datalake_polygonscan_spark.operators.media import (
    media_table,
    sniff_mime,
    media_metadata,
    media_dedup_by_payload,
    image_meta_pandas,
)

__all__ = [
    "exact_dedup",
    "shingle_sets",
    "media_table",
    "sniff_mime",
    "media_metadata",
    "media_dedup_by_payload",
    "image_meta_pandas",
    "minhash_signatures",
    "minhash_lsh_candidate_pairs",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash",
    "embedding_near_duplicates",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
]
