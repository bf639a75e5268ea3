"""Beyond-reference operators for large-scale training-data pipelines.

These are first-class engine components (BASELINE.json north star): exact and
approximate deduplication, similarity search over embedding columns, text
analysis, and multimodal column plumbing — all expressed Spark-first
(built-in functions in the hot path, Arrow-batched pandas UDFs where Python
is genuinely required).
"""

# convenience re-exports of the most-used operator entry points; each
# submodule stays importable directly (pandera_spark.operators.dedup, ...)
from .bloom import (
    bloom_build,
    bloom_contains,
    bloom_contains_sparse,
    bloom_dense,
    bloom_merge,
    bloom_parameters,
)
from .cdc import apply_cdc, latest_state, merge_upsert
from .chunking import chunk_stats, chunk_text
from .clustering import apply_dedup, connected_components, dedup_clusters
from .contamination import contamination_pairs, decontaminate
from .curation import (
    corpus_diff,
    curate_corpus,
    distribution_match,
    hash_split,
    hash_stratified_sample,
    leakage_safe_split,
    temperature_sample,
    weighted_mix,
)
from .dedup import (
    edit_distance_pairs,
    exact_dedup,
    exact_dedup_stats,
    incremental_minhash_candidates,
    minhash_lsh_candidates,
    cross_source_dup_matrix,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
    write_minhash_index,
)
from .dsir import bucket_distribution, dsir_resample, dsir_scores, gumbel_topk
from .evalmetrics import binary_auc, calibration_bins, confusion_report
from .drift import (
    category_drift,
    column_entropy,
    drift_report,
    ks_drift,
    psi,
    psi_bins,
    psi_timeline,
)
from .linkage import fuzzy_join
from .multimodal import audio_fingerprint, perceptual_hash, phash_near_dups
from .linalg import (
    centroid_separation,
    dim_corr,
    dim_stats,
    fit_pca,
    group_centroids,
    pca_transform,
    pool_embeddings,
    whiten,
)
from .numeric import (
    correlation_matrix,
    grouped_percentiles,
    standardize,
    trimmed_mean,
    percentile_bounds,
    sketch_bins,
    winsorize,
    winsorize_report,
)
from .packing import chunk_pack, greedy_pack, pack_stats
from .privacy import k_anonymity_report, l_diversity_report, risky_groups
from .quantize import (
    quantization_error_report,
    quantize_embeddings,
    quantized_dot,
    quantized_topk,
)
from .pipeline import prepare_training_corpus
from .regression import (
    logistic_fit,
    logistic_report,
    logistic_score,
    ols_inference,
)
from .relational import (
    fk_violations,
    isin_table,
    join_cardinality,
    orphan_stats,
    star_report,
)
from .skew import skew_report
from .sharding import (
    balanced_shards,
    epoch_sort_key,
    interleave_positions,
    shard_assign,
    shard_stats,
    write_shards,
    zorder_key,
)
from .similarity import (
    brute_force_topk,
    embedding_near_dups,
    knn_band_plan,
    knn_graph,
    lsh_recall,
    lsh_topk,
    mmr_rerank,
    mutual_knn,
    neardup_band_plan,
    verify_pairs_cosine,
)
from .tokenize import bpe_encode, bpe_pair_counts, bpe_train, word_counts
from .basket import basket_stats, frequent_pairs
from .temporal import (
    acf,
    asof_join,
    banded_range_join,
    funnel,
    mann_kendall,
    time_weighted_mean,
    retention,
    rollup_anomalies,
    session_stats,
    time_rollup,
)
from .text import (
    bigram_model,
    pmi_collocations,
    bigram_score,
    bm25_search,
    build_term_index,
    corpus_card,
    corpus_line_dedup,
    corpus_profile,
    gopher_gate,
    hash_embed,
    hashed_linear_score,
    index_search,
    keyword_search,
    lm_score,
    nb_score,
    nb_train,
    two_stage_search,
    language_id,
    normalize_text,
    pii_scrub,
    quality_score,
    readability,
    strip_markup,
    token_count,
    top_k_per_group,
    top_ngrams,
    unigram_model,
    vocab_richness,
    corpus_vocab_stats,
    zipf_fit,
)
