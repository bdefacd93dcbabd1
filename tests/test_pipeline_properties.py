"""Property-based pins for the round-5 analytics operators: the
distributed skyline must equal the naive quadratic definition on
adversarial tie-heavy inputs, and the Pareto cumulative share must
be a prefix-consistent running share under its documented ordering.

Small value domains force heavy collisions (duplicate x, duplicate
y, duplicate (x, y)) — exactly the cases where a sweep formulation
can silently diverge from the definition.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators.segmentation import (
    revenue_pareto,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.stats import (
    skyline_2d,
)

points = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),  # tiny domain → ties
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=points)
def test_skyline_matches_naive_definition(spark, pts):
    rows = [(i, x, float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, x int, y double")
    got = {
        r["id"]: r["on_skyline"]
        for r in skyline_2d(df, "x", "y", "id", num_buckets=3).collect()
    }

    def dominated(i):
        xi, yi = pts[i]
        return any(
            (xj <= xi and yj <= yi and (xj < xi or yj < yi))
            for j, (xj, yj) in enumerate(pts)
            if j != i
        )

    want = {i: 0 if dominated(i) else 1 for i in range(len(pts))}
    assert got == want


amounts = st.lists(
    st.integers(1, 9),  # small ints → frequent revenue ties
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=amounts)
def test_pareto_share_is_running_prefix(spark, vals):
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "cust int, amount double")
    out = revenue_pareto(df, "cust", "amount", num_buckets=3).collect()
    # replay the documented order: revenue desc, customer_id asc
    ordered = sorted(out, key=lambda r: (-r["revenue_cents"], r["customer_id"]))
    total = sum(r["revenue_cents"] for r in out)
    run = 0
    for r in ordered:
        run += r["revenue_cents"]
        assert r["cum_share"] == round(run / total, 6)
    assert ordered[-1]["cum_share"] == 1.0
    # head_flag is a PREFIX of the ordering: once 0, never 1 again
    flags = [r["head_flag"] for r in ordered]
    assert flags == sorted(flags, reverse=True)
