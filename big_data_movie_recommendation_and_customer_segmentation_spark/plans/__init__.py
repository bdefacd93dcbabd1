"""Query/oracle registries, gate-ordered.

The driver's correctness gate records the FIRST 50 entries of
``queries()`` (registration order) — both r01 and r02 capped there
while the registry grew to 75, leaving whole operator families with
zero driver evidence. ``GATE_PRIORITY`` curates which 50 get gated:
one green row per operator family, never-yet-gated families first in
line, near-duplicate siblings rotated out to local-test vouching
(see COVERAGE.md "gate budget").

Everything stays registered and locally oracle-tested
(tests/test_oracle_queries.py runs ALL of them); this ordering only
decides which rows land in CORRECTNESS_r{N}.json.
"""

from .queries import ORACLE_REGISTRY, QUERY_REGISTRY
from . import queries_ext  # noqa: F401  (registers extension queries)
from . import queries_pipeline  # noqa: F401  (registers r5 pipeline queries)
from . import queries_analytics  # noqa: F401  (registers r5 analytics batch 2)
from . import queries_insights  # noqa: F401  (registers r5 analytics batch 3)

# The curated driver gate: 50 slots.
# 29 core rows (every SURVEY §2 family that was green r02 keeps a
# representative) + 21 rows for families that were never gated or
# fell out of the r02 gate (VERDICT r2 asks #1/#4).
GATE_PRIORITY: tuple[str, ...] = (
    # -- r10 rotation (VERDICT r9 ask #1): the 29 families whose
    # driver evidence is age-1 (last gated r08) re-gate before they
    # hit the 2-round freshness edge. The 21 anchor slots keep the
    # flagship, perf-watched pair joins, vectorops/ANN block,
    # streaming family block, and als_scoring_topk — with TWO
    # near-sibling swaps (VERDICT r9 ask #2): the multimodal slot
    # moves from media_image_features (hash-green r09) to
    # media_audio_frames, and knn_bruteforce (hash-green r09) cedes
    # its slot to video_frame_samples, giving the real WAV/AVI
    # decode gates their first driver rows. Everything r09-gated and
    # not re-listed is age-1 after this round and scheduled for the
    # r11 rotation — the stable 29/21 two-phase cycle keeps every
    # family within the 2-round window.
    # -- tier 1: age-1 families, one representative each (29) --
    "purchase_value_auc",                # auc
    "bloom_filtered_order_revenue",      # bloom_join
    "segment_acctbal_bootstrap_ci",      # bootstrap
    "doc_bigram_collocations",           # collocations
    "tfidf_top_terms",                   # corpus_ops
    "events_kfold_summary",              # cv_splits
    "ngram_decontaminated_docs",         # decontamination
    "dedup_representatives",             # dedup_closure
    "order_price_psi",                   # drift
    "embedding_near_duplicates_deterministic",  # embedding_dedup
    "orders_priority_target_encoding",   # feature_prep
    "segment_priority_chisq",            # hypothesis_tests
    "part_cosine_neighbors",             # item_item_cosine
    "props_json_stats",                  # json_props
    "kmeans_embedding_segments_det",     # kmeans
    "purchase_value_lift",               # lift_gains
    "token_shard_assignment",            # packing
    "embedding_covariance",              # pca
    "hybrid_doc_retrieval_rrf",          # rank_fusion
    "ranking_metrics_summary",           # ranking_metrics
    "rolling_order_spend",               # rolling_window
    "customer_order_status_scd2",        # scd2
    "weekday_revenue_seasonality",       # seasonality
    "event_transition_matrix",           # sequence_mining
    "simhash_duplicate_pairs",           # simhash_dedup (Py4J collapse re-gate)
    "event_user_skew_report",            # skew_report
    "part_skyline",                      # skyline
    "customer_repurchase_survival",      # survival
    "customer_user_cf_recommendations",  # user_cf
    # -- age-0 anchors: flagship + perf-watched + edit-adjacent (21) --
    "pricing_summary",                   # flagship scan/agg
    "top_similar_customer_pairs",        # set_similarity, drift-A/B subject
    "minhash_duplicate_pairs",           # minhash_dedup, drift-A/B subject
    "ngram_duplicate_pairs",             # ngram_dedup, drift-A/B subject
    "candidates_unseen",                 # C3+C4, perf-watched
    "part_copurchase_pagerank",          # graph_centrality, perf-watched
    "als_scoring_topk",                  # als (+ serving parity pin)
    "ivfadc_rerank_knn",                 # ann_rerank (vectorops edits)
    "ivf_knn_deterministic",             # ivf (vectorops edits nearby)
    "pq_adc_knn",                        # pq (_checked_vec edit re-gates)
    "media_audio_frames",                # multimodal (real WAV decode, first row)
    "video_frame_samples",               # multimodal (real AVI decode, first row)
    "ann_hyperplane_neighbors",          # ann
    "events_session_interval_join",      # interval_join
    "purchase_click_attribution",        # streaming_join
    "trending_event_types",              # streaming_tumbling
    "sliding_window_events",             # streaming_sliding
    "session_windows_per_user",          # streaming_session
    "event_running_zscore",              # streaming_stateful
    "training_corpus_manifest",          # corpus_pipeline
    "dedup_exact_survivors",             # exact_dedup
)


def _gate_ordered(reg: dict) -> None:
    """Reorder ``reg`` IN PLACE so GATE_PRIORITY comes first.

    In-place (clear+update) rather than rebinding to a copy so that
    any ``@query`` registration executed after this module is
    imported still lands in the same dict object that
    ``__spark_entry__`` reads (ADVICE r3: a rebound copy silently
    orphaned late registrations).
    """
    ordered = {n: reg[n] for n in GATE_PRIORITY if n in reg}
    ordered.update((n, v) for n, v in reg.items() if n not in ordered)
    reg.clear()
    reg.update(ordered)


_gate_ordered(QUERY_REGISTRY)
_gate_ordered(ORACLE_REGISTRY)

__all__ = ["ORACLE_REGISTRY", "QUERY_REGISTRY", "GATE_PRIORITY"]
