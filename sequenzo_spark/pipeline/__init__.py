from sequenzo_spark.pipeline.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from sequenzo_spark.pipeline.similarity import brute_force_cosine_topk, lsh_cosine_topk
from sequenzo_spark.pipeline.text import doc_fingerprint, quality_metrics

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash64",
    "brute_force_cosine_topk",
    "lsh_cosine_topk",
    "doc_fingerprint",
    "quality_metrics",
]
