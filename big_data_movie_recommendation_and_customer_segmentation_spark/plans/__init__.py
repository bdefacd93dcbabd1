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
    # -- r11 rotation (VERDICT r10 ask #1): the THIRTY families whose
    # driver evidence is age-1 (last gated r09 — the 29 scheduled
    # tier-1 families PLUS knn, whose r10 anchor slot went to
    # video_frame_samples) re-gate before they hit the 2-round
    # freshness edge. Eleven of the reps rotate to never-yet-gated
    # value-green siblings (GATE_COVERAGE.md '—' rows), earning first
    # driver rows without losing family freshness. Anchors shrink to
    # 20: video_frame_samples (first row landed r10) cedes its slot;
    # multimodal stays fresh via media_audio_frames. Everything
    # r10-gated and not re-listed is age-1 after this round and
    # scheduled for the r12 rotation.
    # -- tier 1: age-1 families, one representative each (30) --
    "purchase_attribution_asof_tolerance",  # asof_join (first row)
    "part_rules_wilson_ci",              # association (first row)
    "bm25_doc_ranking",                  # bm25
    "chronological_split_counts",        # chrono_split
    "monthly_new_vs_returning_revenue",  # cohort (first row)
    "order_part_sets",                   # collect_aggs
    "doc_shuffle_shards",                # corpus_shuffle
    "corr_qty_price_by_flag",            # correlation
    "distinct_segments",                 # distinct
    "daily_revenue_ewma",                # ewma (lagsum collapse re-gate)
    "signup_click_purchase_funnel",      # funnel
    "fuzzy_dedup_representatives",       # fuzzy_dedup (first row)
    "daily_revenue_momentum",            # gapfill (first row)
    "revenue_rollup_region_nation",      # grouping_sets
    "segment_revenue",                   # joins
    "knn_bruteforce",                    # knn (_checked_vec contract re-gate)
    "order_year_status_pivot",           # pivot
    "orders_quality_report",             # profiling (first row)
    "part_price_deciles",                # quantiles (first row)
    "customer_value_migration",          # rfm_pareto (first row)
    "event_value_outliers",              # robust_stats (first row)
    "random_pair_baseline_trials",       # sampling
    "semantic_dedup_survivors",          # semantic_dedup
    "event_type_cms_estimates",          # sketches (first row; cms NULL-key fix re-gate)
    "salted_user_segment_stats",         # skew_join
    "snapshot_merge_orders",             # snapshot_cdc (first row)
    "sql_surface_top_customers",         # sql_surface
    "doc_quality_scores",                # text_stats
    "top_parts_by_price",                # topk
    "doc_weighted_sample",               # weighted_sampling
    # -- age-0 anchors: flagship + perf-watched + edit-adjacent (20) --
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
