"""Training-data pipeline operations: text analysis, deduplication,
similarity search, multimodal plumbing — first-class large-scale components
alongside the time-series operators."""

from .text import token_count, quality_score, fingerprint, lang_id, repetition_stats
from .dedup import (
    dedup_exact,
    dup_shingle_coverage,
    exact_jaccard,
    jaccard_pairs,
    minhash_pairs,
    simhash_pairs,
)
from .similarity import (
    knn_brute_force,
    knn_ivf,
    build_ivf_index,
    load_ivf_centroids,
    knn_ivf_indexed,
    cosine_dup_pairs,
)
from .join import hash_join

__all__ = [
    "token_count",
    "quality_score",
    "fingerprint",
    "lang_id",
    "repetition_stats",
    "dedup_exact",
    "dup_shingle_coverage",
    "exact_jaccard",
    "jaccard_pairs",
    "minhash_pairs",
    "simhash_pairs",
    "knn_brute_force",
    "knn_ivf",
    "build_ivf_index",
    "load_ivf_centroids",
    "knn_ivf_indexed",
    "cosine_dup_pairs",
    "hash_join",
]
