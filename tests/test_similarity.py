"""Property tests for the approximate similarity path (SURVEY §5:
LSH is validated by exact-Jaccard rescoring, not the SQL oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import similarity as SIM
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


@pytest.fixture(scope="module")
def co_purchases(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey).select("o_custkey", "l_partkey").cache()


def test_exact_pairs_properties(spark, co_purchases):
    pairs = SIM.exact_jaccard_pairs(co_purchases, "o_custkey", "l_partkey", threshold=0.1).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.user_a < r.user_b
        assert 0.1 <= r.jaccard <= 1.0
        assert r.n_common <= min(r.n_a, r.n_b)


def test_lsh_pairs_subset_of_exact_with_identical_scores(spark, co_purchases):
    exact = {
        (r.user_a, r.user_b): r.jaccard
        for r in SIM.exact_jaccard_pairs(co_purchases, "o_custkey", "l_partkey", threshold=0.1).collect()
    }
    lsh = SIM.minhash_lsh_pairs(
        spark, co_purchases, "o_custkey", "l_partkey", threshold=0.1, num_hash_tables=16
    ).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert (r.user_a, r.user_b) in exact, "LSH emitted a pair below threshold"
        assert abs(exact[(r.user_a, r.user_b)] - r.jaccard) < 1e-9

    # recall at a higher-similarity slice: P(collide) = 1-(1-j)^16 ≥ .97 at j=.2
    strong = {p for p, j in exact.items() if j >= 0.2}
    found = {(r.user_a, r.user_b) for r in lsh}
    assert strong, "fixture should contain strong pairs"
    recall = len(strong & found) / len(strong)
    assert recall >= 0.8, f"LSH recall on j>=0.2 pairs too low: {recall}"


def test_top_similar_pairs_is_sorted_and_bounded(spark, co_purchases):
    top = SIM.top_similar_pairs(co_purchases, "o_custkey", "l_partkey", k=20).collect()
    assert 0 < len(top) <= 20
    jacs = [r.jaccard for r in top]
    assert jacs == sorted(jacs, reverse=True)


def test_random_pair_baseline_shape(spark, co_purchases):
    ratings = co_purchases.groupBy("o_custkey", "l_partkey").agg(F.count(F.lit(1)).cast("double").alias("r"))
    out = SIM.random_pair_baseline(
        ratings, "o_custkey", "l_partkey", "r", n_pairs=20, n_trials=3, sample_size=200
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r.n_pairs_scored <= 20
        if r.avg_corr is not None:
            assert -1.0 <= r.avg_corr <= 1.0


def test_twins_correlate_more_than_random_pairs_planted(spark):
    """The reference's end-to-end semantic validation (S2
    ``correlation_optimised.py``: top-LSH-pair avg Pearson 0.2740 vs
    random-pair 0.1215, report p.3), reproduced on planted structure:
    three user archetypes with distinct rating patterns over
    overlapping item ranges — same-archetype pairs must both (a) win
    the Jaccard top-k and (b) out-correlate seeded random pairs."""
    rows = []
    for user in range(30):
        arch = user % 3
        for item in range(arch * 10, arch * 10 + 20):  # archetypes overlap 10 items
            jitter = ((user * 31 + item * 17) % 7) / 10.0
            base = float((item * (arch + 2)) % 5) + 1.0
            rows.append((user, item, base + jitter))
    ratings = spark.createDataFrame(rows, "user long, item long, rating double")

    top = SIM.top_similar_pairs(ratings, "user", "item", k=30)
    top_rows = top.collect()
    assert all(r.user_a % 3 == r.user_b % 3 for r in top_rows), "top pairs must be same-archetype"

    twin_corr = (
        SIM.pair_rating_correlation(ratings, top, "user", "item", "rating")
        .agg(F.avg("corr"))
        .first()[0]
    )
    rand_corr = (
        SIM.random_pair_baseline(
            ratings, "user", "item", "rating", n_pairs=15, n_trials=5, sample_size=30, seed=7
        )
        .agg(F.avg("avg_corr"))
        .first()[0]
    )
    assert twin_corr is not None and rand_corr is not None
    assert twin_corr > rand_corr, f"twins {twin_corr} should beat random {rand_corr}"
