"""Training-data pipeline operations: text analysis, deduplication,
similarity search, multimodal plumbing — first-class large-scale components
alongside the time-series operators."""

from .text import (
    clean_text,
    corpus_filter,
    corpus_stats,
    fingerprint,
    lang_id,
    quality_score,
    repetition_stats,
    tfidf_top_terms,
    token_count,
    token_count_bpe,
)
from .dedup import (
    component_drop_ids,
    component_labels_distributed,
    dedup_exact,
    dedup_near,
    dup_shingle_coverage,
    exact_jaccard,
    jaccard_pairs,
    minhash_pairs,
    simhash_pairs,
)
from .similarity import (
    knn_brute_force,
    knn_multi,
    knn_ivf,
    build_ivf_index,
    load_ivf_centroids,
    knn_ivf_indexed,
    cosine_dup_pairs,
    dedup_semantic,
)
from .join import hash_join
from .quantization import knn_pq, knn_pq_refined, pq_encode, train_pq
from .bucketed import bucketed_join, read_bucket_meta, write_bucketed
from .text_index import build_text_index, search_index
from .temporal import asof_join, interval_join
from .cep import match_pattern
from .window import keyed_window
from .bpe import (
    apply_merge,
    pair_counts,
    text_to_byte_tokens,
    top_pair,
    train_merges,
)
from .sketches import (
    approx_distinct,
    approx_distinct_by,
    approx_quantiles,
    heavy_hitters,
)
from .training import (
    decontaminate,
    pack_sequences,
    pii_scrub,
    sample_min_k,
    sample_min_k_by,
    sample_quota,
    vocab_topk,
)

__all__ = [
    "clean_text",
    "tfidf_top_terms",
    "token_count",
    "token_count_bpe",
    "quality_score",
    "fingerprint",
    "lang_id",
    "repetition_stats",
    "corpus_filter",
    "corpus_stats",
    "component_drop_ids",
    "component_labels_distributed",
    "dedup_exact",
    "dedup_near",
    "dedup_semantic",
    "dup_shingle_coverage",
    "exact_jaccard",
    "jaccard_pairs",
    "minhash_pairs",
    "simhash_pairs",
    "knn_brute_force",
    "knn_multi",
    "knn_ivf",
    "build_ivf_index",
    "load_ivf_centroids",
    "knn_ivf_indexed",
    "cosine_dup_pairs",
    "train_pq",
    "pq_encode",
    "knn_pq",
    "knn_pq_refined",
    "hash_join",
    "write_bucketed",
    "bucketed_join",
    "read_bucket_meta",
    "build_text_index",
    "search_index",
    "asof_join",
    "interval_join",
    "match_pattern",
    "keyed_window",
    "pair_counts",
    "top_pair",
    "apply_merge",
    "train_merges",
    "text_to_byte_tokens",
    "approx_distinct",
    "approx_distinct_by",
    "approx_quantiles",
    "heavy_hitters",
    "pack_sequences",
    "vocab_topk",
    "decontaminate",
    "pii_scrub",
    "sample_quota",
    "sample_min_k",
    "sample_min_k_by",
]
