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

# The curated driver gate: 50 slots.
# 29 core rows (every SURVEY §2 family that was green r02 keeps a
# representative) + 21 rows for families that were never gated or
# fell out of the r02 gate (VERDICT r2 asks #1/#4).
GATE_PRIORITY: tuple[str, ...] = (
    # -- relational / ML core (green r02, keep green) --
    "pricing_summary",             # B1-B9, D2/D3 multi-agg
    "customer_order_counts",       # D1
    "distinct_segments",           # D6
    "order_part_sets",             # D4 sorted collect_set
    "segment_revenue",             # C2 join+agg
    "customers_with_open_orders",  # C1/C5 semi-join, B10
    "top_parts_by_price",          # F1/F2 TakeOrderedAndProject
    "recent_orders_per_customer",  # E2 WindowGroupLimit
    "part_popularity_biased",      # D2/D3
    "candidates_unseen",           # C3 anti + C4 broadcast cross
    "chronological_split_counts",  # E1 split window
    "corr_qty_price_by_flag",      # D8/D9 grouped Pearson
    "popularity_recommendations",  # D5 ordered collect_list
    "top_similar_customer_pairs",  # F4 + C6 exact self-join
    "minhash_pairs_lsh",           # C6/K1-K3 LSH path
    "customers_orders_events_fullouter",  # full outer join
    "revenue_rollup_region_nation",  # rollup
    "sql_surface_top_customers",   # spark.sql entry path
    "segment_price_quantiles",     # grouped quantiles
    "order_year_status_pivot",     # pivot
    "kmv_distinct_customers",      # KMV sketch (value-checked approx)
    "event_type_stats",            # B10 isin on events
    "als_recommendations",         # K4-K6 (rows-only by nature)
    "ranking_metrics_summary",     # K7-K9 MAP/NDCG/P@k
    "random_pair_baseline_trials", # F5/F6 + D7
    "doc_quality_scores",          # textops family anchor
    "token_shard_assignment",      # packing prefix-sum
    "ngram_decontaminated_docs",   # decontamination anchor
    "exact_duplicate_groups",      # exact dedup anchor
    # -- never-gated or dropped-from-r02 families (VERDICT r2 #1/#4) --
    "dedup_exact_survivors",
    "ngram_duplicate_pairs",
    "minhash_duplicate_pairs",
    "simhash_duplicate_pairs",
    "dedup_representatives",
    "training_corpus_manifest",
    "knn_bruteforce",
    "ann_hyperplane_neighbors",
    "ivf_knn_deterministic",
    "embedding_near_duplicates_deterministic",
    "kmeans_customer_segments",    # K11
    "tumbling_hourly_events",
    "sliding_window_events",
    "session_windows_per_user",
    "events_session_interval_join",
    "props_json_stats",
    "purchase_attribution_asof",
    "rolling_order_spend",
    "media_image_features",
    "media_audio_frames",
    "video_frame_samples",
)


def _gate_ordered(reg: dict) -> dict:
    ordered = {n: reg[n] for n in GATE_PRIORITY if n in reg}
    ordered.update((n, v) for n, v in reg.items() if n not in ordered)
    return ordered


QUERY_REGISTRY = _gate_ordered(QUERY_REGISTRY)
ORACLE_REGISTRY = _gate_ordered(ORACLE_REGISTRY)

__all__ = ["ORACLE_REGISTRY", "QUERY_REGISTRY", "GATE_PRIORITY"]
