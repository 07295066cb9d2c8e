"""Composed operators: dedup (L1/L2), similarity search (L3), top-k.

Everything here is a composition of DataFrame primitives — shuffles are
explicit in the composition (a groupBy/join you can see), hot loops stay
in Catalyst expressions, and Python only orchestrates.
"""

from datalake_polygonscan_spark.operators.dedup import (
    exact_dedup,
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

__all__ = [
    "exact_dedup",
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
