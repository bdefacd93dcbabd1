"""Hand-computed micro-fixture for ranking metrics (SURVEY §5:
pin RankingEvaluator semantics — mllib vs ml definitional drift is a
known hazard, §7 hard-part 3)."""

from __future__ import annotations

import pytest

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import evaluate as EV


@pytest.fixture(scope="module")
def lists(spark):
    predicted = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [4, 5])], "user int, predicted array<int>"
    )
    actual = spark.createDataFrame(
        [(1, [1, 3]), (2, [6])], "user int, actual array<int>"
    )
    return predicted, actual


def test_ranking_metrics_hand_computed(lists):
    predicted, actual = lists
    m = EV.ranking_metrics(predicted, actual, k=2)
    # user1: pred [1,2,3] actual {1,3}: AP=(1/1 + 2/3)/2 = 5/6
    # user2: pred [4,5]   actual {6}:   AP=0
    assert m["map"] == pytest.approx((5 / 6) / 2, abs=1e-9)
    # P@2: user1 hits {1} of first 2 → 1/2 ; user2 → 0 ; mean = 1/4
    assert m["precision_at_k"] == pytest.approx(0.25, abs=1e-9)
    # NDCG@2: user1 DCG=1/log2(2)=1, IDCG=1+1/log2(3) → 0.6131... ; user2 0
    import math

    idcg = 1 + 1 / math.log2(3)
    assert m["ndcg_at_k"] == pytest.approx((1 / idcg) / 2, abs=1e-9)


def test_rmse_hand_computed(spark):
    preds = spark.createDataFrame(
        [(3.0, 4.0), (5.0, 5.0), (1.0, 0.0)], "rating double, prediction double"
    )
    # errors 1, 0, 1 → rmse = sqrt(2/3)
    assert EV.rmse(preds) == pytest.approx((2 / 3) ** 0.5, abs=1e-9)
