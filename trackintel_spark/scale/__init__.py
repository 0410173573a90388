from trackintel_spark.scale.dedup import (
    dedup_clusters,
    dedup_exact,
    dedup_embedding_cosine,
    line_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash,
)
from trackintel_spark.scale.decontaminate import decontaminate, ngram_overlap
from trackintel_spark.scale.mixing import (
    dsir_log_weights,
    dsir_select,
    fit_ngram_model,
    hashed_ngram_buckets,
)
from trackintel_spark.scale.profile import (
    corpus_profile,
    top_tokens,
    union_vocab_sketches,
    vocab_sketch,
)
from trackintel_spark.scale.search import bm25_search, corpus_stats
from trackintel_spark.scale.sampling import sample_by_weight, pack_sequences, split_by_hash
from trackintel_spark.scale.similarity import (
    cosine_topk_bruteforce,
    nearest_center_expr,
    ivf_topk,
    kmeans_centers,
    lsh_bucketed_topk,
)
from trackintel_spark.scale.text import (
    detect_language,
    document_fingerprint,
    normalize_text,
    quality_score,
    redact_pii,
    c4_filters,
    repetition_signals,
    token_count,
)

__all__ = [
    "dedup_exact",
    "dedup_clusters",
    "minhash_signature",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "dedup_embedding_cosine",
    "semantic_dedup",
    "line_dedup",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "ivf_topk",
    "kmeans_centers",
    "nearest_center_expr",
    "split_by_hash",
    "pack_sequences",
    "token_count",
    "quality_score",
    "detect_language",
    "document_fingerprint",
    "redact_pii",
    "normalize_text",
    "c4_filters",
    "repetition_signals",
    "sample_by_weight",
    "hashed_ngram_buckets",
    "fit_ngram_model",
    "dsir_log_weights",
    "dsir_select",
    "corpus_profile",
    "vocab_sketch",
    "union_vocab_sketches",
    "top_tokens",
    "bm25_search",
    "corpus_stats",
    "decontaminate",
    "ngram_overlap",
]
