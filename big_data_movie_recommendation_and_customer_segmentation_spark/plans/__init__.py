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
    # -- r07 rotation (VERDICT r6 ask #1): the 32 families whose
    # driver evidence is age-1 (last gated r05) re-gate before they
    # hit the 2-round freshness edge; the NEW als_scoring_topk takes
    # the als family's slot with the family's first value-level
    # oracle (ask #4 — als_recommendations stays registered +
    # locally tested, but the gate slot goes to the hash-checkable
    # scoring half, so the window is now 50/50 value-checked); the
    # behavior-changed daily_revenue_ewma (sign-aware rounding)
    # re-gates; 16 age-0 anchors (flagship, perf-watched, and the
    # families adjacent to this round's vectorops/multimodal edits)
    # close the window. Everything r06-gated and not re-listed is
    # age-1 and scheduled for the r08 rotation.
    # -- tier 1: age-1 families, one representative each (32) --
    "ivfadc_rerank_knn",                 # ann_rerank
    "purchase_next_click_asof",          # asof_join
    "part_association_rules",            # association
    "bm25_doc_ranking",                  # bm25
    "chronological_split_counts",        # chrono_split
    "weekly_cohort_retention",           # cohort
    "order_part_sets",                   # collect_aggs
    "doc_shuffle_shards",                # corpus_shuffle
    "corr_qty_price_by_flag",            # correlation
    "distinct_segments",                 # distinct
    "dedup_exact_survivors",             # exact_dedup
    "signup_click_purchase_funnel",      # funnel
    "fuzzy_duplicate_pairs",             # fuzzy_dedup
    "daily_orders_gapfill",              # gapfill
    "revenue_rollup_region_nation",      # grouping_sets
    "segment_revenue",                   # joins
    "order_year_status_pivot",           # pivot
    "orders_profile",                    # profiling
    "segment_price_quantiles",           # quantiles
    "customer_rfm_segments",             # rfm_pareto
    "priority_revenue_trend",            # robust_stats
    "random_pair_baseline_trials",       # sampling
    "semantic_dedup_survivors",          # semantic_dedup
    "kmv_distinct_customers",            # sketches
    "salted_user_segment_stats",         # skew_join
    "snapshot_diff_orders",              # snapshot_cdc
    "sql_surface_top_customers",         # sql_surface
    "purchase_click_attribution",        # streaming_join
    "trending_event_types",              # streaming_tumbling
    "doc_quality_scores",                # text_stats
    "top_parts_by_price",                # topk
    "doc_weighted_sample",               # weighted_sampling
    # -- this round's changed/new code re-gates (2) --
    "als_scoring_topk",                  # als: first value-level oracle
    "daily_revenue_ewma",                # ewma: sign-aware rounding fix
    # -- age-0 anchors: flagship + perf-watched + edit-adjacent (16) --
    "pricing_summary",                   # flagship scan/agg
    "candidates_unseen",                 # C3+C4, perf-watched
    "top_similar_customer_pairs",        # C6/F4, perf-watched
    "ngram_duplicate_pairs",             # ngram_dedup, perf-watched
    "minhash_duplicate_pairs",           # minhash_dedup, perf-watched
    "knn_bruteforce",                    # knn
    "ann_hyperplane_neighbors",          # ann
    "ivf_knn_deterministic",             # ivf (vectorops edits nearby)
    "pq_adc_knn",                        # pq (vectorops edits nearby)
    "part_copurchase_pagerank",          # graph_centrality, perf-watched
    "events_session_interval_join",      # interval_join
    "sliding_window_events",             # streaming_sliding
    "session_windows_per_user",          # streaming_session
    "event_running_zscore",              # streaming_stateful
    "training_corpus_manifest",          # corpus_pipeline
    "media_image_features",              # multimodal (codec edits)
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
