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
from . import queries_decontam  # noqa: F401  (registers r15 decontam-index/SPFHP queries)
from . import queries_mixture  # noqa: F401  (registers r15 mixture-materialization queries)
from . import queries_bpe  # noqa: F401  (registers r15 BPE vocabulary-induction query)

# The curated driver gate: 50 slots.
# 29 core rows (every SURVEY §2 family that was green r02 keeps a
# representative) + 21 rows for families that were never gated or
# fell out of the r02 gate (VERDICT r2 asks #1/#4).
GATE_PRIORITY: tuple[str, ...] = (
    # -- r15 rotation (VERDICT r14 asks #1/#2/#5): the 36 families
    # whose driver evidence is age-1 (last gated r13) re-gate before
    # the 2-round freshness edge, THREE reps rotating to
    # never-yet-gated value-green siblings (first driver rows:
    # lineitem_correlation_matrix, customer_360_profile,
    # brand_price_elasticity) and ten more rotating to their oldest
    # individually-gated value sibling, PLUS four newly registered
    # queries (registry 178→182, the VERDICT r14 unfreeze sanction
    # for asks #1/#2): the persisted decontamination index probe and
    # the decontam gate's batch admission twin, and SPFHP packing
    # assignments + efficiency (both fully value-checked — the oracle
    # replays the greedy histogram packing in a recursive CTE).
    # Anchors shrink to 10: candidates_unseen, part_copurchase_
    # pagerank, ivfadc_rerank_knn (all age 0 after r14, untouched
    # this round) cede their slots and rotate back r16. Everything
    # r14-gated and not re-listed is age-1 after this round,
    # scheduled for r16.
    # -- tier 1: age-1 families (36) + new registrations (4) --
    "ann_hyperplane_neighbors",          # ann (rotates back per r14 plan)
    "purchase_attribution_asof",         # asof_join (oldest rep, r04)
    "part_association_rules",            # association (r09)
    "bm25_doc_ranking",                  # bm25
    "chronological_split_counts",        # chrono_split
    "weekly_cohort_retention",           # cohort (r09)
    "popularity_recommendations_compat", # collect_aggs (oldest rep, r04)
    "training_corpus_manifest",          # corpus_pipeline
    "doc_shuffle_shards",                # corpus_shuffle
    "pair_rating_correlation",           # correlation (oldest rep, r04)
    "distinct_segments",                 # distinct
    "daily_revenue_ewma",                # ewma
    "exact_duplicate_groups",            # exact_dedup (oldest rep, r04)
    "signup_click_purchase_funnel",      # funnel
    "fuzzy_duplicate_pairs",             # fuzzy_dedup (r09)
    "daily_orders_gapfill",              # gapfill (r09)
    "order_status_priority_cube",        # grouping_sets (oldest rep, r04)
    "incremental_dedup_pairs",           # incremental_dedup
    "events_session_interval_join",      # interval_join (rotates back)
    "parts_never_ordered",               # joins (oldest rep, r04)
    "knn_bruteforce_vectorized",         # knn (oldest rep, r04)
    "minhash_duplicate_pairs",           # minhash_dedup (rotates back)
    "order_year_status_pivot",           # pivot
    "lineitem_correlation_matrix",       # profiling (first row)
    "segment_price_quantiles",           # quantiles (r09)
    "customer_360_profile",              # rfm_pareto (first row)
    "brand_price_elasticity",            # robust_stats (first row)
    "random_pair_baseline_trials",       # sampling
    "semantic_dedup_survivors",          # semantic_dedup
    "kmv_distinct_customers",            # sketches (r09)
    "salted_user_segment_stats",         # skew_join
    "snapshot_diff_orders",              # snapshot_cdc (r09)
    "sql_surface_top_customers",         # sql_surface
    "repeated_substring_spans",          # substring_dedup
    "recent_orders_per_customer",        # topk (r05)
    "doc_weighted_sample",               # weighted_sampling
    "decontam_index_overlaps",           # decontam_index (NEW r15, first row)
    "decontam_screen_survivors",         # decontam_index (NEW r15, first row)
    "spfhp_pack_assignments",            # packing (NEW r15, first row)
    "spfhp_pack_efficiency",             # packing (NEW r15, first row)
    # -- age-0 anchors: flagship + perf-watched + family-sole (10) --
    "pricing_summary",                   # flagship scan/agg
    "top_similar_customer_pairs",        # set_similarity, drift-A/B subject
    "ngram_duplicate_pairs",             # ngram_dedup, drift-A/B subject
    "als_scoring_topk",                  # als (+ serving parity pin)
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
