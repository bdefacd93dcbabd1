"""PageRank, binary AUC, EWMA, and key-skew report — hand-computable
checks and invariants (oracle equivalence runs in
test_oracle_queries.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    evaluate as EV,
    graph as G,
    profiling as PF,
    stats as ST,
)


# ------------------------------------------------------------------ pagerank


def _undirected(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_path_graph_symmetry_and_mass(spark):
    # path a(1)-b(2)-c(3): ends symmetric, middle highest
    e = _undirected(spark, [(1, 2), (2, 3)])
    pr = {r["node"]: r["pagerank"] for r in G.pagerank(e, iterations=5).collect()}
    assert pr[1] == pr[3]
    assert pr[2] > pr[1]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_matches_numpy_power_iteration(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    e = _undirected(spark, pairs)
    got = {r["node"]: r["pagerank"] for r in G.pagerank(e, iterations=4).collect()}

    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    adj = np.zeros((len(nodes), len(nodes)))
    for a, b in pairs:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1.0
    out_deg = adj.sum(axis=1)
    pr = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(4):
        pr = (1 - 0.85) / len(nodes) + 0.85 * (adj.T @ (pr / out_deg))
    for n in nodes:
        assert got[n] == pytest.approx(pr[idx[n]], abs=1e-6)


def test_pagerank_regular_graph_uniform(spark):
    # 4-cycle: every node identical by symmetry
    e = _undirected(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    pr = {r["node"]: r["pagerank"] for r in G.pagerank(e, iterations=3).collect()}
    assert len(set(pr.values())) == 1
    assert list(pr.values())[0] == pytest.approx(0.25, abs=1e-6)


# ------------------------------------------------------------------ auc


def test_auc_perfect_separation(spark):
    rows = [(0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0)]
    df = spark.createDataFrame(rows, "y int, s double")
    out = EV.binary_auc(df, "y", "s").collect()[0]
    assert out["auc"] == pytest.approx(1.0, abs=1e-6)
    assert (out["n_pos"], out["n_neg"]) == (2, 3)


def test_auc_all_tied_is_half(spark):
    rows = [(0, 1.0)] * 4 + [(1, 1.0)] * 4
    df = spark.createDataFrame(rows, "y int, s double")
    out = EV.binary_auc(df, "y", "s").collect()[0]
    assert out["auc"] == pytest.approx(0.5, abs=1e-6)


def test_auc_hand_value_with_ties(spark):
    # scores: neg [1, 2, 2], pos [2, 3]
    rows = [(0, 1.0), (0, 2.0), (0, 2.0), (1, 2.0), (1, 3.0)]
    df = spark.createDataFrame(rows, "y int, s double")
    out = EV.binary_auc(df, "y", "s").collect()[0]
    # pairwise: P(pos>neg) + 0.5 P(pos=neg) over 2*3=6 pairs
    # pos=2: beats neg=1 (1), ties neg=2,2 (2*0.5) → 2
    # pos=3: beats all 3 → 3 ; AUC = (1+1+3)/6
    assert out["auc"] == pytest.approx(5.0 / 6.0, abs=1e-6)


def test_auc_label_flip_complements(spark):
    rng = np.random.default_rng(7)
    rows = [(int(rng.integers(0, 2)), float(rng.normal())) for _ in range(200)]
    df = spark.createDataFrame(rows, "y int, s double")
    a = EV.binary_auc(df, "y", "s").collect()[0]["auc"]
    flipped = df.withColumn("y", 1 - F.col("y"))
    b = EV.binary_auc(flipped, "y", "s").collect()[0]["auc"]
    assert a + b == pytest.approx(1.0, abs=1e-5)


# ------------------------------------------------------------------ ewma


def _days(vals):
    return [
        (dt.datetime(2024, 1, 1) + dt.timedelta(days=i), float(v))
        for i, v in enumerate(vals)
    ]


def test_ewma_constant_series_is_constant(spark):
    df = spark.createDataFrame([("g", d, v) for d, v in _days([5] * 10)],
                               "g string, day timestamp, v double")
    out = ST.ewma_lagsum(df, ["g"], ["day"], "v", alpha=0.3, window=4).collect()
    assert all(r["ewma"] == pytest.approx(5.0, abs=1e-6) for r in out)


def test_ewma_empty_group_cols_is_one_global_series(spark):
    """The r11 SQL-collapse emitted 'PARTITION BY ' with no columns
    for group_cols=[] — a parse error the Window.partitionBy() form
    never had (r11 self-review). Ungrouped must equal grouped-by-a-
    constant, and empty order_cols fails fast."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0]
    df = spark.createDataFrame([("g", d, v) for d, v in _days(vals)],
                               "g string, day timestamp, v double")
    got = sorted(ST.ewma_lagsum(df, [], ["day"], "v", alpha=0.3, window=3).collect(),
                 key=lambda r: r["day"])
    want = sorted(ST.ewma_lagsum(df, ["g"], ["day"], "v", alpha=0.3, window=3).collect(),
                  key=lambda r: r["day"])
    assert [r["ewma"] for r in got] == [r["ewma"] for r in want]
    with pytest.raises(ValueError, match="order column"):
        ST.ewma_lagsum(df, ["g"], [], "v")


def test_ewma_first_row_equals_value(spark):
    df = spark.createDataFrame([("g", d, v) for d, v in _days([7.0, 1.0])],
                               "g string, day timestamp, v double")
    out = {r["day"]: r["ewma"] for r in
           ST.ewma_lagsum(df, ["g"], ["day"], "v", alpha=0.3, window=8).collect()}
    assert out[dt.datetime(2024, 1, 1)] == pytest.approx(7.0, abs=1e-6)
    # second row: (1 + 0.7*7) / (1 + 0.7)
    assert out[dt.datetime(2024, 1, 2)] == pytest.approx((1 + 0.7 * 7) / 1.7, abs=1e-6)


def test_ewma_matches_manual_weights(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0]
    df = spark.createDataFrame([("g", d, v) for d, v in _days(vals)],
                               "g string, day timestamp, v double")
    out = sorted(
        ST.ewma_lagsum(df, ["g"], ["day"], "v", alpha=0.3, window=3).collect(),
        key=lambda r: r["day"],
    )
    for t, r in enumerate(out):
        window = vals[max(0, t - 2): t + 1][::-1]  # most recent first
        ws = [0.7 ** i for i in range(len(window))]
        want = sum(w * x for w, x in zip(ws, window)) / sum(ws)
        assert r["ewma"] == pytest.approx(want, abs=1e-6)


def test_ewma_negative_series_rounds_half_away_from_zero(spark):
    """The 6-dp rounding must be HALF_UP (away from zero) for negative
    values too: a single-row series passes its value through the
    weights untouched, so -0.1234565 must round to -0.123457, not the
    -0.123456 that plain floor(x·10^6 + 0.5) gives (r06 advisor
    finding — sign-aware floor fix)."""
    df = spark.createDataFrame(
        [("g", d, v) for d, v in _days([1])], "g string, day timestamp, v double"
    ).withColumn("v", F.lit(-0.1234565))
    out = ST.ewma_lagsum(df, ["g"], ["day"], "v", alpha=0.3, window=4).collect()
    assert out[0]["ewma"] == pytest.approx(-0.123457, abs=1e-9)
    # positive mirror is unchanged
    df2 = df.withColumn("v", F.lit(0.1234565))
    out2 = ST.ewma_lagsum(df2, ["g"], ["day"], "v", alpha=0.3, window=4).collect()
    assert out2[0]["ewma"] == pytest.approx(0.123457, abs=1e-9)


# ------------------------------------------------------------------ skew


def test_key_skew_report_hand_values(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = {r["k"]: r for r in PF.key_skew_report(df, "k", top_k=2).collect()}
    assert set(out) == {"a", "b"}  # top-2 cut
    assert out["a"]["rank"] == 1 and out["b"]["rank"] == 2
    assert out["a"]["share"] == pytest.approx(0.6, abs=1e-6)
    assert out["a"]["cum_share"] == pytest.approx(0.6, abs=1e-6)
    assert out["b"]["cum_share"] == pytest.approx(0.9, abs=1e-6)
    # mean per key = 10/3 → skew_ratio(a) = 6 / (10/3) = 1.8
    assert out["a"]["skew_ratio"] == pytest.approx(1.8, abs=1e-6)


def test_key_skew_report_tiebreak_deterministic(spark):
    rows = [("x",)] * 2 + [("y",)] * 2 + [("z",)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = sorted(PF.key_skew_report(df, "k", top_k=2).collect(), key=lambda r: r["rank"])
    assert [r["k"] for r in out] == ["x", "y"]  # key asc breaks count ties


def test_pagerank_empty_edges_returns_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    out = G.pagerank(e, iterations=3)
    assert out.columns == ["node", "pagerank"]
    assert out.count() == 0


def test_auc_single_class_is_null(spark):
    # degenerate: no negatives → AUC undefined, surfaced as null
    df = spark.createDataFrame([(1, 1.0), (1, 2.0)], "y int, s double")
    out = EV.binary_auc(df, "y", "s").collect()[0]
    assert out["auc"] is None
    assert out["n_pos"] == 2 and out["n_neg"] == 0


def test_personalized_pagerank_decays_from_seed(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        graph as G,
    )

    # star seeded at its center 0 (leaves 1,2,3), with node 4 hanging
    # off leaf 3 — two hops from the seed
    und = [(0, 1), (0, 2), (0, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    pr = {r["node"]: r["pagerank"] for r in
          G.personalized_pagerank(edges, seeds, checkpoint=False).collect()}
    assert len(pr) == 5
    # mass conserved (no dangling nodes on an undirected graph)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-4)
    # symmetric leaves tie exactly; the 2-hop node ranks below the
    # 1-hop leaves (proximity to the seed, not global centrality)
    assert pr[1] == pr[2]
    assert pr[4] < pr[1]
    assert pr[4] < pr[3]


def test_personalized_pagerank_empty_seed_set_returns_empty(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        graph as G,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["node"])  # not in the graph
    assert G.personalized_pagerank(edges, seeds, checkpoint=False).count() == 0


def test_connected_components_two_islands_and_chain(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        graph as G,
    )

    # chain 1-2-3-4 (diameter > 1 round) and island 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    comp = {r["node"]: r["component"] for r in G.connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_triangle_counts_hand_graph(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        graph as G,
    )

    # K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles; pendant 5
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5)], ["src", "dst"])
    out = {r["node"]: r["n_triangles"] for r in G.triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # 5 is in no triangle


def test_triangle_counts_no_triangles_empty(spark):
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        graph as G,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert G.triangle_counts(edges).count() == 0


def test_connected_components_frontier_matches_union_find(spark):
    """Value-pin for the r15 frontier/fused-convergence loop: a seeded
    random graph with long chains, stars and singletons-via-self-loops
    must match a driver-side union-find exactly."""
    import random

    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        graph as G,
    )

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(100, 140)]  # 40-long chain
    edges += [(500, x) for x in range(501, 520)]  # star
    edges += [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(80)]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # component id = min node id in the component (the operator's
    # min-label fixpoint), for every edge endpoint
    nodes = {n for e in edges for n in e}
    comps = {}
    for n in nodes:
        r = find(n)
        comps.setdefault(r, []).append(n)
    expected = {n: min(members) for members in comps.values() for n in members}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in G.connected_components(df).collect()}
    assert got == expected


def test_dedup_representatives_fixpoint_frontier_long_chain(spark):
    """The rounds=None fixpoint (frontier + fused convergence flag)
    must resolve a 30-link duplicate chain to the single minimum."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        dedup as DD,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 31)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r["rep_id"] for r in DD.dedup_representatives(pairs, rounds=None).collect()}
    assert out == {i: 1 for i in range(2, 32)}
