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
from . import queries_index  # noqa: F401  (registers r13 dedup-index/substring queries)
from . import queries_textclass  # noqa: F401  (registers r14 model-based tier queries)

# The curated driver gate: 50 slots.
# 29 core rows (every SURVEY §2 family that was green r02 keeps a
# representative) + 21 rows for families that were never gated or
# fell out of the r02 gate (VERDICT r2 asks #1/#4).
GATE_PRIORITY: tuple[str, ...] = (
    # -- r14 rotation (VERDICT r13 asks #1/#4/#5): the 33 families
    # whose driver evidence is age-1 (last gated r12) re-gate before
    # the 2-round freshness edge, FOUR reps rotating to
    # never-yet-gated value-green siblings (first driver rows), PLUS
    # four newly registered queries (registry 174→178, the VERDICT
    # r13 unfreeze sanction for asks #1/#5): the hashed-n-gram NB
    # classifier, DSIR Gumbel-top-k selection, Stupid Backoff LM
    # perplexity, and the LM quality gate's admission twin (riding
    # the same unfreeze, per ask #5's "if slots allow"). Anchors
    # shrink to 13: minhash_duplicate_pairs (its r13 edit re-gate
    # landed green), ann_hyperplane_neighbors and
    # events_session_interval_join (all age 0 after r13, untouched
    # this round) cede their slots and rotate back r15. Everything
    # r13-gated and not re-listed is age-1 after this round,
    # scheduled for r15.
    # -- tier 1: age-1 families (33) + new registrations (4) --
    "purchase_value_auc",                # auc
    "bloom_filtered_order_revenue",      # bloom_join
    "segment_acctbal_bootstrap_ci",      # bootstrap
    "term_zipf_fit",                     # collocations (first row)
    "doc_chunks",                        # corpus_ops
    "events_kfold_summary",              # cv_splits
    "ngram_decontaminated_docs",         # decontamination
    "dedup_representatives",             # dedup_closure
    "order_value_benford",               # drift
    "embedding_near_duplicates_deterministic",  # embedding_dedup
    "segment_urgency_woe_iv",            # feature_prep
    "segment_conversion_ztest",          # hypothesis_tests (first row)
    "customer_item_cf_recommendations",  # item_item_cosine
    "ivf_knn_deterministic",             # ivf
    "props_json_stats",                  # json_props
    "kmeans_embedding_segments_det",     # kmeans
    "purchase_value_lift",               # lift_gains
    "token_shard_assignment",            # packing
    "embedding_covariance",              # pca
    "pq_adc_knn",                        # pq
    "hybrid_doc_retrieval_rrf",          # rank_fusion
    "recommendation_diversity_ild",      # ranking_metrics (first row)
    "rolling_order_spend",               # rolling_window
    "customer_order_status_scd2",        # scd2
    "doc_script_profile",                # script_routing
    "daily_revenue_anomalies",           # seasonality
    "user_sequence_predictability",      # sequence_mining (first row)
    "simhash_duplicate_pairs",           # simhash_dedup
    "event_user_skew_report",            # skew_report
    "part_skyline",                      # skyline
    "customer_repurchase_hazard",        # survival
    "doc_encoding_quality",              # text_stats
    "customer_user_cf_recommendations",  # user_cf
    "nb_lang_classification",            # text_classification (NEW r14, first row)
    "dsir_selected_docs",                # data_selection (NEW r14, first row)
    "doc_lm_perplexity",                 # lm_scoring (NEW r14, first row)
    "lm_gate_admissions",                # lm_scoring (NEW r14, first row)
    # -- age-0 anchors: flagship + perf-watched + family-sole (13) --
    "pricing_summary",                   # flagship scan/agg
    "top_similar_customer_pairs",        # set_similarity, drift-A/B subject
    "ngram_duplicate_pairs",             # ngram_dedup, drift-A/B subject
    "candidates_unseen",                 # C3+C4, perf-watched
    "part_copurchase_pagerank",          # graph_centrality, perf-watched
    "als_scoring_topk",                  # als (+ serving parity pin)
    "ivfadc_rerank_knn",                 # ann_rerank
    "media_audio_frames",                # multimodal (real WAV decode)
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
