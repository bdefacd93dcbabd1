"""Per-family driver-evidence freshness report (VERDICT r3 ask #2's
done-criterion): for every operator family, when did a member last
get a DRIVER correctness row (CORRECTNESS_r{N}.json), and is it
still green locally (CORRECTNESS_LOCAL.json)?

    python tools/gate_freshness.py        # table + stale warning

A family is STALE when its newest driver row is more than 2 rounds
old — the rotation budget (50 driver slots over the whole registry;
the exact count is whatever ``plans.QUERY_REGISTRY`` holds) is sized
so no family ever has to go stale.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family → registry queries. tests/test_bench_contract.py asserts the
# mapping stays total over the registry.
FAMILIES: dict[str, tuple[str, ...]] = {
    "scan_agg": ("pricing_summary", "part_popularity_biased", "order_part_stats",
                 "customer_order_counts", "event_type_stats", "region_nation_acctbal",
                 "part_supplier_hhi"),
    "distinct": ("distinct_segments",),
    "collect_aggs": ("order_part_sets", "popularity_recommendations",
                     "popularity_recommendations_compat"),
    "joins": ("segment_revenue", "customers_with_open_orders", "parts_never_ordered",
              "customers_orders_events_fullouter"),
    "candidate_gen": ("candidates_unseen", "negative_samples_per_customer"),
    "topk": ("top_parts_by_price", "recent_orders_per_customer"),
    "chrono_split": ("chronological_split_counts",),
    "correlation": ("corr_qty_price_by_flag", "pair_rating_correlation"),
    "set_similarity": ("top_similar_customer_pairs", "jaccard_pairs_exact",
                       "minhash_pairs_lsh"),
    "grouping_sets": ("revenue_rollup_region_nation", "order_status_priority_cube"),
    "sql_surface": ("sql_surface_top_customers",),
    "quantiles": ("segment_price_quantiles", "part_price_deciles"),
    "pivot": ("order_year_status_pivot",),
    "sketches": ("kmv_distinct_customers", "approx_distinct_customers",
                 "event_type_cms_estimates"),
    "sampling": ("random_pair_baseline_trials",),
    "als": ("als_recommendations", "als_scoring_topk"),
    "ranking_metrics": ("ranking_metrics_summary",
                        "recommendation_coverage_novelty",
                        "recommendation_diversity_ild"),
    "kmeans": ("kmeans_customer_segments", "kmeans_embedding_segments_det"),
    "text_stats": ("doc_quality_scores", "doc_token_stats", "doc_bpe_token_stats",
                   "lang_id_distribution", "doc_scrub_stats", "doc_repetition_stats",
                   "doc_heuristic_filter", "doc_rolling_fingerprints",
                   "doc_encoding_quality"),
    "corpus_ops": ("doc_unigram_logprob", "source_mix_plan", "doc_sample_by_lang",
                   "doc_chunks", "doc_balanced_by_source", "tfidf_top_terms"),
    "packing": ("token_shard_assignment", "spfhp_pack_assignments",
                "spfhp_pack_efficiency", "spfhp_shard_layout"),
    "exact_dedup": ("exact_duplicate_groups", "dedup_exact_survivors",
                    "duplicate_chunks"),
    "ngram_dedup": ("ngram_duplicate_pairs", "ngram_containment_pairs"),
    "minhash_dedup": ("minhash_duplicate_pairs",),
    "simhash_dedup": ("simhash_duplicate_pairs",),
    "dedup_closure": ("dedup_representatives",),
    "decontamination": ("ngram_decontaminated_docs", "decontaminated_docs"),
    "decontam_index": ("decontam_index_overlaps", "decontam_screen_survivors"),
    "corpus_lineage": ("corpus_slice_lineage",),
    "mixture": ("mixture_epoch_materialization", "mixture_epoch_audit",
                "mixture_shard_profile"),
    "bpe": ("bpe_word_histogram", "bpe_vocab_merges"),
    "corpus_pipeline": ("training_corpus_manifest",),
    "semantic_dedup": ("semantic_dedup_survivors",),
    "knn": ("knn_bruteforce", "knn_bruteforce_vectorized"),
    "ann": ("ann_hyperplane_neighbors", "ann_lsh_neighbors"),
    "ivf": ("ivf_knn_deterministic", "ivf_knn"),
    "pq": ("pq_codes", "pq_adc_knn", "ivfadc_knn", "ivfadc_residual_knn"),
    "embedding_dedup": ("embedding_near_duplicates_deterministic",
                        "embedding_near_duplicates"),
    "asof_join": ("purchase_attribution_asof", "purchase_next_click_asof",
                  "purchase_attribution_asof_tolerance"),
    "interval_join": ("events_session_interval_join",),
    "rolling_window": ("rolling_order_spend",),
    "json_props": ("props_json_stats",),
    "streaming_tumbling": ("tumbling_hourly_events", "trending_event_types",
                           "decayed_event_type_scores"),
    "streaming_sliding": ("sliding_window_events",),
    "streaming_session": ("session_windows_per_user",),
    "streaming_join": ("purchase_click_attribution",
                       "purchase_click_attribution_left",
                       "purchase_click_multitouch",
                       "purchase_click_attribution_ushape",
                       "purchase_click_attribution_timedecay"),
    "corpus_shuffle": ("doc_shuffle_shards",),
    "skew_join": ("salted_user_segment_stats",),
    "cohort": ("weekly_cohort_retention",
               "monthly_new_vs_returning_revenue"),
    "funnel": ("signup_click_purchase_funnel",),
    "multimodal": ("media_image_features", "media_audio_frames",
                   "video_frame_samples"),
    # -- registered r5 (pipeline batch) --
    "association": ("part_association_rules", "part_rules_wilson_ci"),
    "rfm_pareto": ("customer_rfm_segments", "customer_revenue_pareto",
                   "customer_value_migration", "customer_360_profile",
                   "customer_revenue_gini"),
    "bm25": ("bm25_doc_ranking",),
    "gapfill": ("daily_orders_gapfill", "daily_revenue_momentum"),
    "snapshot_cdc": ("snapshot_diff_orders", "snapshot_merge_orders"),
    "fuzzy_dedup": ("fuzzy_duplicate_pairs", "fuzzy_dedup_representatives"),
    "weighted_sampling": ("doc_weighted_sample",),
    "robust_stats": ("priority_revenue_trend", "event_value_outliers",
                     "event_value_histogram", "brand_price_elasticity"),
    "profiling": ("orders_profile", "orders_quality_report",
                  "orders_profile_incremental",
                  "lineitem_correlation_matrix",
                  "embedding_quality_report"),
    "ann_rerank": ("ivfadc_rerank_knn",),
    "cv_splits": ("events_kfold_summary",),
    "skyline": ("part_skyline",),
    "streaming_stateful": ("event_running_zscore",),
    "sequence_mining": ("event_transition_matrix", "frequent_event_paths",
                        "user_sequence_predictability"),
    "scd2": ("customer_order_status_scd2",),
    "hypothesis_tests": ("segment_priority_chisq", "event_value_winsorized",
                         "priority_spend_ttest", "segment_priority_mutual_info",
                         "segment_conversion_ztest"),
    "rank_fusion": ("hybrid_doc_retrieval_rrf",),
    "pca": ("embedding_covariance",),
    "graph_centrality": ("part_copurchase_pagerank",
                         "brand_personalized_pagerank",
                         "part_copurchase_components",
                         "part_copurchase_triangles"),
    "auc": ("purchase_value_auc",),
    "ewma": ("daily_revenue_ewma",),
    "skew_report": ("event_user_skew_report",),
    "lift_gains": ("purchase_value_lift",),
    "item_item_cosine": ("part_cosine_neighbors",
                         "customer_item_cf_recommendations"),
    "seasonality": ("weekday_revenue_seasonality", "daily_revenue_anomalies"),
    # -- registered r5 (insights batch 3) --
    "survival": ("customer_repurchase_survival",
                 "customer_repurchase_hazard"),
    "bloom_join": ("bloom_filtered_order_revenue",),
    "collocations": ("doc_bigram_collocations", "source_term_keyness",
                     "term_zipf_fit"),
    "user_cf": ("customer_user_cf_recommendations",),
    "bootstrap": ("segment_acctbal_bootstrap_ci",),
    "feature_prep": ("orders_priority_target_encoding",
                     "segment_urgency_woe_iv"),
    "drift": ("order_price_psi", "order_value_benford"),
    # -- registered r12 (script-routing promotion, VERDICT r11 ask #3) --
    "script_routing": ("doc_script_profile", "cjk_near_duplicate_pairs"),
    # -- registered r13 (dedup-index + substring promotion, VERDICT
    # r12 asks #1/#5) --
    "incremental_dedup": ("incremental_dedup_pairs", "index_screen_admissions"),
    "substring_dedup": ("repeated_substring_spans",),
    # -- registered r14 (model-based tier promotion, VERDICT r13
    # asks #1/#5) --
    "text_classification": ("nb_lang_classification",),
    "data_selection": ("dsir_selected_docs",),
    "lm_scoring": ("doc_lm_perplexity", "lm_gate_admissions"),
}

QUERY_TO_FAMILY = {q: f for f, qs in FAMILIES.items() for q in qs}


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            with open(path) as f:
                rounds[int(m.group(1))] = json.load(f)
    return rounds


# Families whose first member registered in round N have no earlier
# driver row BY CONSTRUCTION — not stale until N+2.
NEW_IN_ROUND: dict[str, int] = {
    "semantic_dedup": 4,
    "streaming_join": 4,
    "corpus_shuffle": 4,
    "skew_join": 4,
    "pq": 4,
    "cohort": 4,
    "funnel": 4,
    "association": 5,
    "rfm_pareto": 5,
    "bm25": 5,
    "gapfill": 5,
    "snapshot_cdc": 5,
    "fuzzy_dedup": 5,
    "weighted_sampling": 5,
    "robust_stats": 5,
    "profiling": 5,
    "ann_rerank": 5,
    "cv_splits": 5,
    "skyline": 5,
    "streaming_stateful": 5,
    "sequence_mining": 5,
    "scd2": 5,
    "hypothesis_tests": 5,
    "rank_fusion": 5,
    "pca": 5,
    "graph_centrality": 5,
    "auc": 5,
    "ewma": 5,
    "skew_report": 5,
    "lift_gains": 5,
    "item_item_cosine": 5,
    "seasonality": 5,
    "survival": 5,
    "bloom_join": 5,
    "collocations": 5,
    "user_cf": 5,
    "bootstrap": 5,
    "feature_prep": 5,
    "drift": 5,
    "script_routing": 12,
    "incremental_dedup": 13,
    "substring_dedup": 13,
    "text_classification": 14,
    "data_selection": 14,
    "lm_scoring": 14,
    "decontam_index": 15,
    "corpus_lineage": 15,
    "mixture": 15,
    "bpe": 15,
}


def row_green(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        # rows-only driver evidence (ALS/ml-k-means): the run executed
        # and produced rows; value vouching lives in local tests
        return (row.get("spark_rows") or 0) > 0
    if row.get("err") is not None:
        return False
    return bool(row.get("hash_match")) and bool(row.get("rows_match"))


def main() -> int:
    rounds = load_rounds()
    if not rounds:
        print("no CORRECTNESS_r*.json found — run after the first driver round")
        return 1
    latest = max(rounds)
    local = {}
    local_path = os.path.join(REPO, "CORRECTNESS_LOCAL.json")
    if os.path.exists(local_path):
        with open(local_path) as f:
            local = json.load(f).get("queries", {})

    per_family: dict[str, tuple[int | None, str]] = {}
    for fam, qs in FAMILIES.items():
        best: tuple[int, str] | None = None
        for n in sorted(rounds, reverse=True):
            for q in qs:
                row = rounds[n].get(q)
                if row is not None and row_green(row):
                    best = (n, q)
                    break
            if best:
                break
        per_family[fam] = best or (None, "-")

    stale = []
    print(f"{'family':<20} {'last driver round':<18} {'via query':<40} local")
    for fam, (n, q) in sorted(per_family.items(), key=lambda kv: (kv[1][0] or 0, kv[0])):
        ok_local = all(
            local.get(x, {}).get("err") is None
            and local.get(x, {}).get("values_match", True)
            for x in FAMILIES[fam]
            if x in local
        )
        age = "-" if n is None else f"r{n:02d} (age {latest - n})"
        print(f"{fam:<20} {age:<18} {q:<40} {'green' if ok_local else 'CHECK'}")
        if n is None and fam in NEW_IN_ROUND and latest - NEW_IN_ROUND[fam] <= 2:
            continue  # first-registered too recently to have a row
            # (same `age > 2` rule as gated families — ADVICE r4)
        if n is None or latest - n > 2:
            stale.append(fam)
    if stale:
        print(f"\nSTALE (> 2 rounds without a driver row): {stale}")
        return 1
    print(f"\nAll {len(FAMILIES)} families have driver evidence within 2 rounds of r{latest:02d}.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
