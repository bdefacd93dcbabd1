"""Negative-value domain contracts (r11 sweep, third in the series
after r10 NULL and r11 non-finite): refunds/chargebacks make negative
net amounts ROUTINE at pipeline scale, and time skew makes negative
durations possible. Operators whose classical math assumes
non-negative inputs must stay deterministic, keep every row, and turn
undefined ratios into NULL — never an ANSI divide-by-zero job failure
or a driver TypeError. Two real crashes found and fixed by this
sweep: revenue_pareto on an empty relation (float(None) on the
total-scalar) and both revenue_pareto and gini_coefficient on a zero
NET total (DIVIDE_BY_ZERO under the session's ANSI mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import segmentation as SG
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import survival as SV


def test_gini_negative_net_customer_is_deterministic_not_clamped(spark):
    """A customer netting negative pushes the exact signed identity
    outside classical [0, 1] — documented, deterministic, not
    clamped or dropped."""
    o = spark.createDataFrame(
        [(f"c{i}", float(10 * (i + 1))) for i in range(5)] + [("c0", -100.0)],
        "cust string, amt double",
    )
    (row,) = SG.gini_coefficient(o, "cust", "amt").collect()
    assert row["n_customers"] == 5  # c0 kept, netted to -90
    assert row["total_revenue"] == 50.0
    assert row["gini"] == 2.4  # exact signed identity, out of [0,1]


def test_gini_zero_net_total_is_null_not_divide_by_zero(spark):
    o = spark.createDataFrame(
        [("a", 50.0), ("b", -50.0)], "cust string, amt double"
    )
    (row,) = SG.gini_coefficient(o, "cust", "amt").collect()
    assert row["n_customers"] == 2
    assert row["total_revenue"] == 0.0
    assert row["gini"] is None


def test_pareto_negative_net_tail_and_share_overshoot(spark):
    """Negative-net customers sort to the tail; cum_share overshoots
    1 through the positive prefix and lands back at exactly 1 —
    shares of the smaller NET total, with no row lost."""
    o = spark.createDataFrame(
        [(f"c{i}", float(10 * (i + 1))) for i in range(5)] + [("c0", -100.0)],
        "cust string, amt double",
    )
    rows = SG.revenue_pareto(o, "cust", "amt").collect()
    assert len(rows) == 5
    # The operator's ordering is revenue DESC: the negative-net
    # customer ranks last and the running share lands back at the
    # exact net total there (c4's first-row share is also 1.0 in this
    # dataset, so sort by revenue, not by cum_share).
    by_rev = sorted(rows, key=lambda r: -r["revenue"])
    assert by_rev[-1]["customer_id"] == "c0"
    assert by_rev[-1]["revenue"] == -90.0  # kept, netted, not dropped
    assert by_rev[-1]["cum_share"] == 1.0
    assert max(r["cum_share"] for r in rows) > 1.0  # documented overshoot


def test_pareto_zero_total_and_empty_yield_null_shares(spark):
    zero = spark.createDataFrame(
        [("a", 50.0), ("b", -50.0)], "cust string, amt double"
    )
    rows = SG.revenue_pareto(zero, "cust", "amt").collect()
    assert len(rows) == 2
    assert all(r["cum_share"] is None and r["head_flag"] is None for r in rows)
    empty = spark.createDataFrame([], "cust string, amt double")
    assert SG.revenue_pareto(empty, "cust", "amt").collect() == []


def test_pareto_negative_total_yields_null_shares(spark):
    """ADVICE r12: a NEGATIVE net total (refunds exceed sales
    overall) flips cum_share's sign and inverts head_flag's
    '< threshold' reading — misleading rather than undefined. The
    contract now NULLs cum_share/head_flag for any total <= 0; the
    rows themselves (customer, net revenue) are all kept."""
    neg = spark.createDataFrame(
        [("a", 30.0), ("b", -50.0), ("c", -20.0)], "cust string, amt double"
    )
    rows = SG.revenue_pareto(neg, "cust", "amt").collect()
    assert len(rows) == 3
    assert all(r["cum_share"] is None and r["head_flag"] is None for r in rows)
    assert {r["customer_id"]: r["revenue"] for r in rows} == {
        "a": 30.0, "b": -50.0, "c": -20.0,
    }


def test_kaplan_meier_negative_duration_is_earliest_event(spark):
    """Clock skew can put an event before its origin; a negative
    duration is just the earliest time point — the curve stays
    monotone non-increasing and no row is dropped."""
    d = spark.createDataFrame(
        [("g", 5.0, 1), ("g", 3.0, 1), ("g", -2.0, 1), ("g", 4.0, 0)],
        "g string, dur double, ev int",
    )
    rows = sorted(SV.kaplan_meier(d, "dur", "ev", "g").collect(), key=lambda r: r[1])
    assert [r[1] for r in rows] == [-2.0, 3.0, 4.0, 5.0]
    surv = [r[-1] for r in rows]
    assert surv == sorted(surv, reverse=True)  # monotone non-increasing
    assert surv[0] == 0.75  # the negative-duration event counted
