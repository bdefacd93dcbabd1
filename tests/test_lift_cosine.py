"""decile_lift gains table and item-item cosine neighbors — hand
checks (oracle equivalence runs in test_oracle_queries.py)."""

from __future__ import annotations

import pytest

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    association as AS,
    evaluate as EV,
)


def test_decile_lift_separating_score(spark):
    # 20 rows, positives all in the top half of scores
    rows = [(0, float(i)) for i in range(10)] + [(1, float(10 + i)) for i in range(10)]
    df = spark.createDataFrame(rows, "y int, s double")
    out = {r["bucket"]: r for r in EV.decile_lift(df, "y", "s", n_buckets=2).collect()}
    assert out[2]["pos_rate"] == pytest.approx(1.0)
    assert out[1]["pos_rate"] == pytest.approx(0.0)
    # base rate 0.5 → lift 2.0 in the top bucket
    assert out[2]["lift"] == pytest.approx(2.0)
    # gains: top bucket alone captures all positives
    assert out[2]["cum_capture"] == pytest.approx(1.0)
    assert out[1]["cum_capture"] == pytest.approx(1.0)
    assert out[1]["n"] == out[2]["n"] == 10


def test_decile_lift_uninformative_score_flat(spark):
    # alternating labels, identical-rate buckets → lift ~ 1
    rows = [(i % 2, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "y int, s double")
    out = EV.decile_lift(df, "y", "s", n_buckets=4).collect()
    for r in out:
        assert r["lift"] == pytest.approx(1.0, abs=0.01)
    # cumulative capture reaches 1.0 at the lowest bucket
    bottom = min(out, key=lambda r: r["bucket"])
    assert bottom["cum_capture"] == pytest.approx(1.0)


def test_item_cosine_hand_values(spark):
    # baskets: {1,2} ×3, {1,3} ×2  → cos(1,2)=3/sqrt(5*3), cos(1,3)=2/sqrt(5*2)
    rows = []
    for b in range(3):
        rows += [(f"b{b}", 1), (f"b{b}", 2)]
    for b in range(3, 5):
        rows += [(f"b{b}", 1), (f"b{b}", 3)]
    df = spark.createDataFrame(rows, "basket string, item long")
    out = AS.item_cosine_neighbors(
        df, "basket", "item", k=5, min_pair_count=2, max_basket_size=10
    )
    got = {(r["item"], r["neighbor"]): r for r in out.collect()}
    assert got[(1, 2)]["cosine"] == pytest.approx(3 / (5 * 3) ** 0.5, abs=1e-6)
    assert got[(1, 3)]["cosine"] == pytest.approx(2 / (5 * 2) ** 0.5, abs=1e-6)
    # symmetry of the cosine, direction-specific ranks
    assert got[(2, 1)]["cosine"] == got[(1, 2)]["cosine"]
    assert got[(1, 2)]["rank"] == 1 and got[(1, 3)]["rank"] == 2
    # pair (2,3) never co-occurs → absent
    assert (2, 3) not in got and (3, 2) not in got


def test_item_cosine_respects_topk(spark):
    # item 0 co-occurs with items 1..4 twice each → k=2 keeps 2 neighbors
    rows = []
    for rep in range(2):
        for j in range(1, 5):
            rows += [(f"b{j}_{rep}", 0), (f"b{j}_{rep}", j)]
    df = spark.createDataFrame(rows, "basket string, item long")
    out = AS.item_cosine_neighbors(
        df, "basket", "item", k=2, min_pair_count=2, max_basket_size=10
    ).collect()
    per_item = {}
    for r in out:
        per_item.setdefault(r["item"], []).append(r)
    assert len(per_item[0]) == 2
    # equal cosines → neighbor-id ascending tiebreak
    assert [r["neighbor"] for r in sorted(per_item[0], key=lambda r: r["rank"])] == [1, 2]


def test_intra_list_diversity_survives_direction_loss(spark):
    """ADVICE r5: per-item top-k truncation can leave a pair only as
    (b, a); the canonicalized lookup must still find it instead of
    scoring it fully dissimilar."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        evaluate as EV,
    )

    recs = spark.createDataFrame(
        [(1, 10), (1, 20)], "user long, item long"
    )
    # similarity known ONLY in the (20 -> 10) direction
    sims_rev = spark.createDataFrame(
        [(20, 10, 0.8)], "item long, neighbor long, cosine double"
    )
    out = EV.intra_list_diversity(recs, sims_rev, user_col="user", item_col="item").first()
    assert out["ild"] == pytest.approx(0.2)  # 1 - 0.8, NOT 1.0
    # both directions present with equal cosine: identical answer
    sims_both = spark.createDataFrame(
        [(10, 20, 0.8), (20, 10, 0.8)], "item long, neighbor long, cosine double"
    )
    out2 = EV.intra_list_diversity(recs, sims_both, user_col="user", item_col="item").first()
    assert out2["ild"] == pytest.approx(0.2)
