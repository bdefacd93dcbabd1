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
from . import queries_script  # noqa: F401  (registers r12 script-routing queries)

# The curated driver gate: 50 slots.
# 29 core rows (every SURVEY §2 family that was green r02 keeps a
# representative) + 21 rows for families that were never gated or
# fell out of the r02 gate (VERDICT r2 asks #1/#4).
GATE_PRIORITY: tuple[str, ...] = (
    # -- r12 rotation (VERDICT r11 asks #2/#3): the 29 families whose
    # driver evidence is age-1 (last gated r10) re-gate before the
    # 2-round freshness edge, TEN of the reps rotating to
    # never-yet-gated value-green siblings (first driver rows), PLUS
    # three newly registered queries (registry 168→171, the VERDICT
    # r11 "unfreeze by 2–3 slots" sanction): the two script-routing
    # promotions and the r12 encoding-QA battery. Anchors shrink to
    # 18: dedup_exact_survivors and training_corpus_manifest (both
    # age 0 after r11) cede their slots; exact_dedup and
    # corpus_pipeline rotate back r13. Everything r11-gated and not
    # re-listed is age-1 after this round, scheduled for r13.
    # -- tier 1: age-1 families (29) + new registrations (3) --
    "purchase_value_auc",                # auc
    "bloom_filtered_order_revenue",      # bloom_join
    "segment_acctbal_bootstrap_ci",      # bootstrap
    "source_term_keyness",               # collocations (first row)
    "doc_chunks",                        # corpus_ops (oldest row r04)
    "events_kfold_summary",              # cv_splits
    "ngram_decontaminated_docs",         # decontamination (unit-aware-n edit re-gate)
    "dedup_representatives",             # dedup_closure
    "order_value_benford",               # drift (first row)
    "embedding_near_duplicates_deterministic",  # embedding_dedup
    "segment_urgency_woe_iv",            # feature_prep (first row)
    "priority_spend_ttest",              # hypothesis_tests (first row)
    "customer_item_cf_recommendations",  # item_item_cosine (first row)
    "props_json_stats",                  # json_props
    "kmeans_embedding_segments_det",     # kmeans
    "purchase_value_lift",               # lift_gains
    "token_shard_assignment",            # packing
    "embedding_covariance",              # pca
    "hybrid_doc_retrieval_rrf",          # rank_fusion
    "recommendation_coverage_novelty",   # ranking_metrics (first row)
    "rolling_order_spend",               # rolling_window
    "customer_order_status_scd2",        # scd2
    "daily_revenue_anomalies",           # seasonality (first row)
    "frequent_event_paths",              # sequence_mining (first row)
    "simhash_duplicate_pairs",           # simhash_dedup
    "event_user_skew_report",            # skew_report
    "part_skyline",                      # skyline
    "customer_repurchase_hazard",        # survival (first row)
    "customer_user_cf_recommendations",  # user_cf
    "doc_script_profile",                # script_routing (NEW r12, first row)
    "cjk_near_duplicate_pairs",          # script_routing (NEW r12, first row)
    "doc_encoding_quality",              # text_stats (NEW r12 encoding-QA, first row)
    # -- age-0 anchors: flagship + perf-watched + edit-adjacent (18) --
    "pricing_summary",                   # flagship scan/agg
    "top_similar_customer_pairs",        # set_similarity, drift-A/B subject
    "minhash_duplicate_pairs",           # minhash_dedup, drift-A/B subject
    "ngram_duplicate_pairs",             # ngram_dedup, drift-A/B subject
    "candidates_unseen",                 # C3+C4, perf-watched
    "part_copurchase_pagerank",          # graph_centrality, perf-watched
    "als_scoring_topk",                  # als (+ serving parity pin)
    "ivfadc_rerank_knn",                 # ann_rerank (vectorops edits re-gate)
    "ivf_knn_deterministic",             # ivf (vectorops edits re-gate)
    "pq_adc_knn",                        # pq (vectorops edits re-gate)
    "media_audio_frames",                # multimodal (real WAV decode)
    "ann_hyperplane_neighbors",          # ann
    "events_session_interval_join",      # interval_join
    "purchase_click_attribution",        # streaming_join
    "trending_event_types",              # streaming_tumbling
    "sliding_window_events",             # streaming_sliding
    "session_windows_per_user",          # streaming_session
    "event_running_zscore",              # streaming_stateful
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
