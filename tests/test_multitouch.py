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
