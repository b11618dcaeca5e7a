"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal columns (real PNG/PPM + WAV/PCM + y4m decode
and feature extraction over Arrow batches)."""

from vector_spark.functions.text import (
    whitespace_token_count,
    bpe_token_count,
    quality_features,
    quality_score,
    lang_id,
    fingerprint,
    fingerprint_modular,
    repetition_features,
    redact_pii,
    c4_line_filter,
    gopher_quality_filter,
)
from vector_spark.functions.dedup import (
    exact_dedup,
    paragraph_dedup,
    duplicate_span_dedup,
    normalize_text,
    shingle_df,
    ngram_jaccard_pairs,
    jaccard_for_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_neardup_pairs,
    simhash_md5,
    simhash_md5_neardup_pairs,
    hamming_pairs,
    embedding_neardup_pairs,
    semdedup,
    neardup_filter,
    incremental_neardup_filter,
    connected_components,
    neardup_filter_cc,
    decontaminate,
)
from vector_spark.functions.sampling import (
    alpha_mix_rates_micro,
    alpha_mix_sample,
    stratified_sample,
    word_tokens,
    word_ngrams,
    dsir_bucket_counts,
    dsir_logratio_micro,
    dsir_score,
    dsir_resample,
    token_budget_select,
)
from vector_spark.functions.packing import (
    pack_offsets,
)
from vector_spark.functions.quality_ml import (
    score_quality,
    train_quality_classifier,
)
from vector_spark.functions.urls import (
    normalize_url,
    canonical_url_dedup,
    url_host,
    domain_suffixes,
    blocklist_filter,
)
from vector_spark.functions.multimodal import (
    synth_media,
    decode_image,
    decode_wav,
    decode_y4m,
    decode_images,
    decode_audio,
    decode_frames,
    extract_features,
    frame_sample,
    resize_image,
    resize_images,
)
from vector_spark.functions.lm import (
    ngram_counts,
    stupid_backoff_score,
    perplexity_filter,
)
from vector_spark.functions.graph import (
    pagerank,
)
from vector_spark.functions.bpe import (
    bpe_word_counts,
    train_bpe,
    encode_word,
    bpe_encode,
    bpe_token_count_trained,
)
from vector_spark.functions.anomaly import (
    detect_bursts,
    rate_spikes,
)
from vector_spark.functions.profile import (
    profile_corpus,
)
from vector_spark.functions.heavy import (
    heavy_hitters,
    heavy_hitter_candidates,
    windowed_heavy_hitters,
)
from vector_spark.functions.schema_infer import (
    infer_json_schema,
    merge_kinds,
)
from vector_spark.functions.search import (
    bm25_postings,
    bm25_topk,
)
from vector_spark.functions.templates import (
    mask_message,
    emerging_templates,
    template_extract,
    template_profile,
)
from vector_spark.functions.similarity import (
    cosine_expr,
    brute_force_topk,
    brute_force_topk_numpy,
    ivf_topk,
    train_centroids,
    assign_cells,
    build_ivf_index,
    load_ivf_index,
    ivf_search,
    train_pq_codebooks,
    pq_encode,
    pq_search,
)

__all__ = [
    "whitespace_token_count", "bpe_token_count", "quality_features",
    "quality_score", "lang_id", "fingerprint", "fingerprint_modular",
    "repetition_features", "redact_pii", "c4_line_filter", "gopher_quality_filter",
    "exact_dedup", "paragraph_dedup", "duplicate_span_dedup",
    "normalize_text", "shingle_df", "ngram_jaccard_pairs",
    "jaccard_for_pairs", "minhash_signatures", "minhash_lsh_pairs", "simhash",
    "simhash_neardup_pairs", "simhash_md5", "simhash_md5_neardup_pairs",
    "hamming_pairs", "embedding_neardup_pairs", "semdedup", "neardup_filter",
    "pack_offsets", "train_quality_classifier", "score_quality", "word_tokens",
    "incremental_neardup_filter",
    "connected_components", "neardup_filter_cc", "decontaminate",
    "stratified_sample", "word_ngrams", "dsir_bucket_counts",
    "dsir_logratio_micro", "dsir_score", "dsir_resample", "token_budget_select",
    "synth_media", "decode_image", "decode_wav", "decode_y4m",
    "decode_images", "decode_audio", "decode_frames", "extract_features",
    "frame_sample", "resize_image", "resize_images",
    "cosine_expr", "brute_force_topk", "brute_force_topk_numpy",
    "ivf_topk", "train_centroids", "assign_cells",
    "build_ivf_index", "load_ivf_index", "ivf_search",
    "train_pq_codebooks", "pq_encode", "pq_search",
    "normalize_url", "canonical_url_dedup", "url_host", "domain_suffixes",
    "blocklist_filter",
    "ngram_counts", "stupid_backoff_score", "perplexity_filter",
    "pagerank",
    "bm25_postings", "bm25_topk",
    "bpe_word_counts", "train_bpe", "encode_word", "bpe_encode",
    "bpe_token_count_trained",
    "profile_corpus",
    "detect_bursts", "rate_spikes",
    "alpha_mix_rates_micro", "alpha_mix_sample",
    "mask_message", "template_extract", "template_profile", "emerging_templates",
    "heavy_hitters", "heavy_hitter_candidates", "windowed_heavy_hitters",
    "infer_json_schema", "merge_kinds",
]
