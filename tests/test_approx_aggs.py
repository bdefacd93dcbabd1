"""Sketch aggregates: approximate values must sit within their
advertised error of the exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r.o_orderstatus: (r.approx_customers, r.approx_median_price)
        for r in entrymod.queries()["approx_distinct_customers"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: (r.exact_customers, r.exact_median)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("exact_customers"),
            F.median("o_totalprice").alias("exact_median"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for status, (a_card, a_med) in approx.items():
        e_card, e_med = exact[status]
        assert abs(a_card - e_card) / e_card < 0.05, (status, a_card, e_card)
        # percentile_approx with accuracy=10000 is near-exact here
        assert abs(a_med - e_med) / abs(e_med) < 0.01, (status, a_med, e_med)


def test_kmv_estimate_within_tolerance(spark, sf_dir):
    rows = entrymod.queries()["kmv_distinct_customers"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_seen < 256:
            # sketch not full → exact by construction
            assert r.n_distinct_est == r.exact_customers, r
        else:
            # KMV relative error ~1/sqrt(k) ≈ 6% at k=256; assert 4 sigma
            assert abs(r.n_distinct_est - r.exact_customers) / r.exact_customers < 0.25, r
