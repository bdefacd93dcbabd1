"""ALS serving-path parity (VERDICT r7 ask #4).

``als_scoring_topk`` put the scoring ALGEBRA (dot product, per-user
top-k, rounding) under the driver's DuckDB value gate, but it scores
via an explicit crossJoin over the materialized factor tables — the
production serving path ``recommend_for_users`` (als.py:63, wrapping
``recommendForUserSubset``) was only rows-checked. This module closes
the gap: for the SAME 50 users and an identically-configured seeded
fit, the MLlib serving output must match the hash-gated crossJoin
formulation row for row — which makes the serving path transitively
value-checked (serving == gated query == DuckDB replay).

Scores: MLlib accumulates the dot product in float32 (factor arrays
are float); the gated query casts the written float32 factors to
double first. Both are deterministic, but the low-order bits differ,
so (user, rank, item) is compared EXACTLY and the score only to 1e-4
— a ranking flip between the two accumulations would still fail the
exact (user, rank, item) assertion, which is the point.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators.als import (
    ALSConfig,
    fit_als,
    recommend_for_users,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.plans.queries import (
    _ratings_shaped,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.plans import (
    QUERY_REGISTRY,
)


@pytest.fixture(scope="module")
def gated_and_served(spark, sf_dir):
    """Run the hash-gated crossJoin query AND the production serving
    path with the same config/users at the same sf."""
    gated = {
        (r["user"], r["rank"]): (r["item"], r["score"])
        for r in QUERY_REGISTRY["als_scoring_topk"](spark, sf_dir).collect()
    }

    # identical fit to als_scoring_topk (same cfg, same ratings plan)
    ratings = _ratings_shaped(spark, sf_dir).cache()
    cfg = ALSConfig(rank=8, reg_param=0.1, max_iter=5, seed=42)
    model = fit_als(ratings, "userId", "movieId", "rating", cfg)
    ratings.unpersist()
    users = (
        model.userFactors.select(F.col("id").alias("userId"))
        .orderBy("userId")
        .limit(50)
    )
    served = {
        (r["user"], r["rank"]): (r["item"], r["score"])
        for r in recommend_for_users(model, users, k=5).collect()
    }
    return gated, served


def test_same_user_set_and_shape(gated_and_served):
    gated, served = gated_and_served
    assert {u for u, _ in gated} == {u for u, _ in served}
    assert len(gated) == len(served)
    assert set(gated) == set(served)  # same (user, rank) grid


def test_serving_matches_gated_items_row_for_row(gated_and_served):
    """The serving path's (user, rank → item) assignment is exactly
    the hash-gated one — any scoring or ordering divergence between
    recommendForUserSubset and the gated algebra shows here."""
    gated, served = gated_and_served
    mismatches = [
        (key, gated[key][0], served[key][0])
        for key in gated
        if gated[key][0] != served[key][0]
    ]
    assert not mismatches, f"serving != gated on {mismatches[:10]}"


def test_serving_scores_match_to_float32_tolerance(gated_and_served):
    """float32 (MLlib) vs double (gated) accumulation: same value to
    1e-4 relative-ish tolerance on these O(1)-magnitude scores."""
    gated, served = gated_and_served
    for key in gated:
        gs, ss = gated[key][1], served[key][1]
        assert abs(gs - ss) <= 1e-4 * max(1.0, abs(gs)), (key, gs, ss)
