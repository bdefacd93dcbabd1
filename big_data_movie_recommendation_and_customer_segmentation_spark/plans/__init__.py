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

# The curated driver gate: 50 slots.
# 29 core rows (every SURVEY §2 family that was green r02 keeps a
# representative) + 21 rows for families that were never gated or
# fell out of the r02 gate (VERDICT r2 asks #1/#4).
GATE_PRIORITY: tuple[str, ...] = (
    # -- r13 rotation (VERDICT r12 asks #1/#3/#5): the 31 families
    # whose driver evidence is age-1 (last gated r11) re-gate before
    # the 2-round freshness edge, FOUR reps rotating to
    # never-yet-gated value-green siblings (first driver rows), PLUS
    # three newly registered queries (registry 171→174, the VERDICT
    # r12 unfreeze sanction for asks #1/#5): the persisted dedup
    # index probe, its screen/admission twin, and the substring-span
    # pipeline. Anchors shrink to 16: ivf_knn_deterministic and
    # pq_adc_knn (both age 0 after r12; this round's vectorops edit
    # was comment-only) cede their slots and rotate back r14.
    # Everything r12-gated and not re-listed is age-1 after this
    # round, scheduled for r14.
    # -- tier 1: age-1 families (31) + new registrations (3) --
    "purchase_attribution_asof_tolerance",  # asof_join
    "part_rules_wilson_ci",              # association
    "bm25_doc_ranking",                  # bm25
    "chronological_split_counts",        # chrono_split
    "monthly_new_vs_returning_revenue",  # cohort
    "order_part_sets",                   # collect_aggs
    "training_corpus_manifest",          # corpus_pipeline
    "doc_shuffle_shards",                # corpus_shuffle
    "corr_qty_price_by_flag",            # correlation
    "distinct_segments",                 # distinct
    "daily_revenue_ewma",                # ewma
    "duplicate_chunks",                  # exact_dedup (first row)
    "signup_click_purchase_funnel",      # funnel
    "fuzzy_dedup_representatives",       # fuzzy_dedup
    "daily_revenue_momentum",            # gapfill
    "revenue_rollup_region_nation",      # grouping_sets
    "segment_revenue",                   # joins
    "knn_bruteforce",                    # knn
    "order_year_status_pivot",           # pivot
    "orders_profile_incremental",        # profiling (first row)
    "part_price_deciles",                # quantiles
    "customer_revenue_gini",             # rfm_pareto (first row)
    "event_value_histogram",             # robust_stats (first row)
    "random_pair_baseline_trials",       # sampling
    "semantic_dedup_survivors",          # semantic_dedup
    "event_type_cms_estimates",          # sketches
    "salted_user_segment_stats",         # skew_join
    "snapshot_merge_orders",             # snapshot_cdc
    "sql_surface_top_customers",         # sql_surface
    "top_parts_by_price",                # topk
    "doc_weighted_sample",               # weighted_sampling
    "incremental_dedup_pairs",           # incremental_dedup (NEW r13, first row)
    "index_screen_admissions",           # incremental_dedup (NEW r13, first row)
    "repeated_substring_spans",          # substring_dedup (NEW r13, first row)
    # -- age-0 anchors: flagship + perf-watched + edit-adjacent (16) --
    "pricing_summary",                   # flagship scan/agg
    "top_similar_customer_pairs",        # set_similarity, drift-A/B subject
    "minhash_duplicate_pairs",           # minhash_dedup (banded_signature_rows edit re-gate)
    "ngram_duplicate_pairs",             # ngram_dedup, drift-A/B subject
    "candidates_unseen",                 # C3+C4, perf-watched
    "part_copurchase_pagerank",          # graph_centrality, perf-watched
    "als_scoring_topk",                  # als (+ serving parity pin)
    "ivfadc_rerank_knn",                 # ann_rerank
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
