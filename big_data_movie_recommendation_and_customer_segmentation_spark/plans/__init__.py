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
    # -- r06 rotation (VERDICT r5 asks #1/#2 + COVERAGE.md "gate
    # budget" r06 plan): the 4 repaired PQ/IVFADC rows re-gate FIRST
    # (r05 gate-interface failures: list-cell canonicalization +
    # HUGEINT→float64 dtype drift, both fixed and now locally
    # predicted by the hardened tests/oracle_compare.py); then the 20
    # age-2-at-r06 r04 families re-gate; then the 22 never-gated r5
    # families take their first driver rows; 4 anchors close the
    # window. Everything r05-gated and not re-listed is age-1 and
    # scheduled for the r07 rotation.
    # -- repaired PQ/IVFADC family: must re-gate green (VERDICT #1) --
    "pq_codes",
    "pq_adc_knn",
    "ivfadc_knn",
    "ivfadc_residual_knn",
    # -- tier 1: must re-gate (driver row is r04, age-2 at r06) --
    "ranking_metrics_summary",
    "ngram_duplicate_pairs",
    "minhash_duplicate_pairs",
    "simhash_duplicate_pairs",
    "dedup_representatives",
    "ngram_decontaminated_docs",
    "training_corpus_manifest",
    "knn_bruteforce",
    "ann_hyperplane_neighbors",
    "ivf_knn_deterministic",
    "embedding_near_duplicates_deterministic",
    "events_session_interval_join",
    "rolling_order_spend",
    "props_json_stats",
    "sliding_window_events",
    "session_windows_per_user",
    "media_image_features",
    "kmeans_embedding_segments_det",
    "tfidf_top_terms",             # corpus_ops: sibling rotation
    "token_shard_assignment",
    # -- tier 2: never-gated families, first driver rows (VERDICT
    # r5 ask #2 names all 22) --
    "event_transition_matrix",           # sequence_mining
    "customer_order_status_scd2",        # scd2
    "segment_priority_chisq",            # hypothesis_tests
    "hybrid_doc_retrieval_rrf",          # rank_fusion
    "embedding_covariance",              # pca
    "part_copurchase_pagerank",          # graph_centrality
    "purchase_value_auc",                # auc
    "daily_revenue_ewma",                # ewma
    "event_user_skew_report",            # skew_report
    "purchase_value_lift",               # lift_gains
    "part_cosine_neighbors",             # item_item_cosine
    "weekday_revenue_seasonality",       # seasonality
    "customer_repurchase_survival",      # survival
    "bloom_filtered_order_revenue",      # bloom_join
    "doc_bigram_collocations",           # collocations
    "customer_user_cf_recommendations",  # user_cf
    "segment_acctbal_bootstrap_ci",      # bootstrap
    "orders_priority_target_encoding",   # feature_prep
    "order_price_psi",                   # drift
    "events_kfold_summary",              # cv_splits
    "part_skyline",                      # skyline
    "event_running_zscore",              # streaming_stateful
    # -- kept anchors (flagship + perf-watched + rows-only ALS) --
    "pricing_summary",             # flagship scan/agg
    "candidates_unseen",           # C3+C4, perf-watched
    "top_similar_customer_pairs",  # C6/F4, perf-watched
    "als_recommendations",         # K4-K6 (rows-only by nature)
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
