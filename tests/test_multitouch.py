"""Linear multi-touch attribution — hand-computable credit splits
(oracle equivalence runs in test_oracle_queries.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import joins as SJ


def _ts(minutes):
    return dt.datetime(2024, 1, 1, 12, 0) + dt.timedelta(minutes=minutes)


def test_multitouch_credit_splits_equally(spark):
    clicks = spark.createDataFrame(
        [(1, 10, _ts(0)), (1, 11, _ts(30)), (1, 12, _ts(50)),
         (2, 20, _ts(0))],
        "user_id long, click_id long, click_ts timestamp",
    )
    buys = spark.createDataFrame(
        [(1, 100, _ts(55), 90.0),   # catches clicks at 0,30,50 → 3 touches
         (2, 200, _ts(120), 40.0)], # click at 0 outside the 1h window
        "user_id long, purchase_id long, purchase_ts timestamp, purchase_value double",
    )
    out = SJ.multi_touch_attribution(
        clicks, buys, "user_id", "click_ts", "purchase_id", "purchase_ts",
        value_col="purchase_value", lookback="1 hour",
    ).collect()
    p100 = [r for r in out if r["purchase_id"] == 100]
    assert len(p100) == 3
    assert all(r["n_touches"] == 3 for r in p100)
    assert all(r["weight"] == pytest.approx(1 / 3, abs=1e-6) for r in p100)
    assert sum(r["attributed_value"] for r in p100) == pytest.approx(90.0, abs=1e-4)
    # purchase 200 has no in-window touch → absent from inner attribution
    assert not [r for r in out if r["purchase_id"] == 200]


def test_multitouch_weights_sum_to_one_per_purchase(spark, sf_dir):
    from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

    out = QUERY_REGISTRY["purchase_click_multitouch"](spark, sf_dir)
    sums = out.groupBy("purchase_id").agg(F.round(F.sum("weight"), 4).alias("s"))
    bad = sums.filter(F.abs(F.col("s") - 1.0) > 1e-3).count()
    assert bad == 0


def test_position_weighting_u_shape(spark):
    """U-shaped weights: 40/40 to first/last, 20 split across the
    middle; degenerate 1- and 2-touch effects get 1.0 and 0.5."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.joins import (
        multi_touch_attribution,
    )

    clicks = spark.createDataFrame(
        [(1, i, f"2024-01-01 00:{10 + i:02d}:00") for i in range(4)]
        + [(2, 10, "2024-01-01 00:10:00")]
        + [(3, 20, "2024-01-01 00:10:00"), (3, 21, "2024-01-01 00:20:00")],
        ["user_id", "click_id", "click_ts"],
    ).withColumn("click_ts", F.col("click_ts").cast("timestamp"))
    purch = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:30:00", 80.0),
         (2, 200, "2024-01-01 00:30:00", 10.0),
         (3, 300, "2024-01-01 00:30:00", 20.0)],
        ["user_id", "purchase_id", "purchase_ts", "purchase_value"],
    ).withColumn("purchase_ts", F.col("purchase_ts").cast("timestamp"))
    out = multi_touch_attribution(
        clicks, purch, "user_id", "click_ts", "purchase_id", "purchase_ts",
        value_col="purchase_value", weighting="position", cause_id="click_id",
    ).collect()
    by = {(r["purchase_id"], r["click_id"]): r for r in out}
    # 4 touches: first/last 0.4, middle 0.1 each; values 32/8/8/32
    assert by[(100, 0)]["weight"] == pytest.approx(0.4)
    assert by[(100, 3)]["weight"] == pytest.approx(0.4)
    assert by[(100, 1)]["weight"] == pytest.approx(0.1)
    assert by[(100, 0)]["attributed_value"] == pytest.approx(32.0)
    # weights sum to 1 per effect
    for pid in (100, 200, 300):
        s = sum(r["weight"] for k, r in by.items() if k[0] == pid)
        assert s == pytest.approx(1.0)
    assert by[(200, 10)]["weight"] == pytest.approx(1.0)
    assert by[(300, 20)]["weight"] == pytest.approx(0.5)


def test_time_decay_weighting_prefers_recent_touches(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.joins import (
        multi_touch_attribution,
    )

    clicks = spark.createDataFrame(
        [(1, i, f"2024-01-01 00:{5 * i:02d}:00") for i in range(1, 6)],
        ["user_id", "click_id", "click_ts"],
    ).withColumn("click_ts", F.col("click_ts").cast("timestamp"))
    purch = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:30:00", 50.0)],
        ["user_id", "purchase_id", "purchase_ts", "purchase_value"],
    ).withColumn("purchase_ts", F.col("purchase_ts").cast("timestamp"))
    out = multi_touch_attribution(
        clicks, purch, "user_id", "click_ts", "purchase_id", "purchase_ts",
        value_col="purchase_value", weighting="time_decay",
        decay_half_life_hours=0.5,
    ).collect()
    by_click = {r["click_id"]: r["weight"] for r in out}
    ws = [by_click[i] for i in sorted(by_click)]
    assert all(a < b for a, b in zip(ws, ws[1:]))  # strictly more recent > older
    assert sum(ws) == pytest.approx(1.0, abs=1e-4)
    # successive 5-min gaps at a 30-min half-life: ratio 2^(1/6)
    assert ws[1] / ws[0] == pytest.approx(2 ** (5 / 30), rel=1e-3)


def test_position_weighting_tie_safe_without_cause_id(spark):
    """ADVICE r5 (medium): three touches with IDENTICAL cause_ts and
    NO cause_id must still pay the full credit — [0.4, 0.4, 0.2] in
    some order, sum exactly 1.0. The old two-window formulation let
    the same row rank first in both orderings, silently dropping the
    last-touch 0.4 (weights summed to 0.8)."""
    clicks = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00")] * 3,
        "user_id long, click_ts string",
    ).withColumn("click_ts", F.col("click_ts").cast("timestamp"))
    buys = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:45:00", 10.0)],
        "user_id long, purchase_id long, purchase_ts string, purchase_value double",
    ).withColumn("purchase_ts", F.col("purchase_ts").cast("timestamp"))
    out = SJ.multi_touch_attribution(
        clicks, buys, "user_id", "click_ts", "purchase_id", "purchase_ts",
        value_col="purchase_value", lookback="1 hour", weighting="position",
    ).collect()
    weights = sorted(r["weight"] for r in out)
    assert weights == [pytest.approx(0.2), pytest.approx(0.4), pytest.approx(0.4)]
    assert sum(r["attributed_value"] for r in out) == pytest.approx(10.0, abs=1e-6)


def test_position_weighting_plan_has_single_window_ordering(spark, sf_dir):
    """The tie-safe formulation derives BOTH position ranks from one
    ascending window (rn_last = n - rn + 1); a reintroduced
    descending row_number would add a third Sort to the physical
    plan. Pin the shape: ≤2 Sorts (join-side + the one window sort)."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.plans import QUERY_REGISTRY

    df = QUERY_REGISTRY["purchase_click_attribution_ushape"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_sorts = plan.count("Sort ")
    assert n_sorts <= 2, f"expected <=2 Sort nodes, got {n_sorts}:\n{plan[:2000]}"
