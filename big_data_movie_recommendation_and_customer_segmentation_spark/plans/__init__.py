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
    # -- r05 rotation (VERDICT r4 ask #1): the 10 r4-registered
    # queries take their first driver rows; the 3 r5-registered
    # queries gate immediately (no one-round lag this time); the 22
    # oracle-backed rows rotated out in r04 (r03-vouched) rotate back
    # in before their evidence ages past 2 rounds. 15 anchors keep the
    # perf-watched queries and one representative per long-standing
    # family. Everything r04-gated and not re-listed here is age-1 and
    # scheduled for the r06 rotation (COVERAGE.md "gate budget"). The
    # 4 no-oracle variants stay ungated as before (deterministic
    # siblings are in the window).
    # -- first driver rows: registered r4 --
    "pq_codes",
    "pq_adc_knn",
    "ivfadc_knn",
    "semantic_dedup_survivors",
    "purchase_click_attribution",
    "doc_shuffle_shards",
    "salted_user_segment_stats",
    "trending_event_types",
    "weekly_cohort_retention",
    "signup_click_purchase_funnel",
    # -- first driver rows: registered r5 --
    "ivfadc_residual_knn",              # paper-fidelity IVFADC (ADVICE r4)
    "purchase_next_click_asof",         # asof direction='forward'
    "purchase_click_attribution_left",  # attribution how='left'
    # -- first driver rows: r5 pipeline additions (one per new
    # family; age-1 siblings snapshot_merge_orders,
    # event_value_outliers, orders_quality_report are local-vouched
    # and scheduled r06) --
    "part_association_rules",    # market-basket support/conf/lift
    "customer_rfm_segments",     # RFM quintile ladders
    "customer_revenue_pareto",   # bucketed prefix-sum 80/20
    "bm25_doc_ranking",          # Okapi BM25 retrieval
    "daily_orders_gapfill",      # date-spine resample + ffill
    "snapshot_diff_orders",      # CDC full-outer diff
    "fuzzy_duplicate_pairs",     # levenshtein banded dedup
    "doc_weighted_sample",       # Efraimidis-Spirakis A-ES
    "priority_revenue_trend",    # closed-form grouped OLS
    "orders_profile",            # single-pass numeric profiling
    "ivfadc_rerank_knn",         # two-stage ANN (exact re-rank)
    # -- rotated back in: r03-vouched, out during r04 --
    "customer_order_counts",
    "distinct_segments",
    "order_part_sets",
    "popularity_recommendations",
    "segment_revenue",
    "customers_with_open_orders",
    "customers_orders_events_fullouter",
    "top_parts_by_price",
    "recent_orders_per_customer",
    "chronological_split_counts",
    "corr_qty_price_by_flag",
    "part_popularity_biased",
    "revenue_rollup_region_nation",
    "sql_surface_top_customers",
    "segment_price_quantiles",
    "order_year_status_pivot",
    "random_pair_baseline_trials",
    "event_type_stats",
    "doc_quality_scores",
    "dedup_exact_survivors",
    "minhash_pairs_lsh",
    "kmv_distinct_customers",
    # -- kept anchors (the rest of the r04 anchor set is age-1 and
    # cedes its slots to the r5 pipeline queries above; every ceded
    # family re-gates in the r06 rotation before its r04 evidence
    # ages past 2 — see COVERAGE.md "gate budget") --
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
