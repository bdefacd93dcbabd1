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
    # -- r04 rotation (VERDICT r3 asks #2/#3): the 23 oracle-backed
    # queries with no r03 driver row rotate IN; 23 triple-vouched
    # r01-r03 rows rotate OUT to CORRECTNESS_LOCAL vouching. The 4
    # no-oracle variants (approx_distinct_customers, ann_lsh_neighbors,
    # ivf_knn, embedding_near_duplicates) stay ungated: each has a
    # hash-green deterministic sibling inside the window, and gating
    # them would only add rows-only entries.
    # -- rotated in: core relational siblings --
    "order_part_stats",            # D-agg family sibling
    "parts_never_ordered",         # C3 anti-join sibling
    "region_nation_acctbal",       # C2 join sibling
    "popularity_recommendations_compat",  # D5 sibling (ref-order compat)
    "jaccard_pairs_exact",         # C6 exact set-similarity
    "pair_rating_correlation",     # D8 per-pair Pearson
    "order_status_priority_cube",  # cube (rollup sibling)
    # -- rotated in: textops / corpus family --
    "doc_token_stats",
    "lang_id_distribution",
    "doc_bpe_token_stats",
    "doc_rolling_fingerprints",
    "doc_scrub_stats",
    "doc_repetition_stats",
    "doc_heuristic_filter",
    "decontaminated_docs",         # exact decontamination variant
    "doc_unigram_logprob",
    "source_mix_plan",
    "doc_sample_by_lang",
    "doc_chunks",
    "tfidf_top_terms",
    "doc_balanced_by_source",
    # -- rotated in: vector / ML siblings --
    "knn_bruteforce_vectorized",
    "kmeans_embedding_segments_det",  # K11 value-checked (replaces rows-only ml-lib variant)
    # -- kept anchors: families first-gated in r03 stay fresh --
    "pricing_summary",             # flagship scan/agg
    "candidates_unseen",           # C3+C4, perf-watched
    "top_similar_customer_pairs",  # C6/F4, perf-watched
    "als_recommendations",         # K4-K6 (rows-only by nature)
    "ranking_metrics_summary",     # K7-K9
    "exact_duplicate_groups",
    "ngram_duplicate_pairs",
    "minhash_duplicate_pairs",
    "simhash_duplicate_pairs",
    "dedup_representatives",
    "training_corpus_manifest",
    "knn_bruteforce",
    "ann_hyperplane_neighbors",
    "ivf_knn_deterministic",
    "embedding_near_duplicates_deterministic",
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
    "token_shard_assignment",
    "ngram_decontaminated_docs",
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
