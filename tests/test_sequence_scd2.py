"""Sequence mining (transition matrix, k-gram paths), SCD2 runs,
chi-square, winsorized stats, and RRF fusion — hand-computable unit
checks plus structural invariants. The DuckDB oracle equivalence for
all six registry queries runs in test_oracle_queries.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    retrieval as RT,
    sequence as SEQ,
    stats as ST,
    temporal as TP,
)


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


@pytest.fixture(scope="module")
def stream(spark):
    # user 1: a b a b   user 2: a a c
    rows = [
        (1, 1, "a", _ts(0)), (1, 2, "b", _ts(1)), (1, 3, "a", _ts(2)),
        (1, 4, "b", _ts(3)),
        (2, 5, "a", _ts(0)), (2, 6, "a", _ts(1)), (2, 7, "c", _ts(2)),
    ]
    return spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts timestamp")


def test_transition_matrix_hand_counts(stream):
    out = SEQ.transition_matrix(
        stream, user_col="user_id", type_col="event_type", order_cols=["ts", "event_id"]
    )
    got = {(r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"]) for r in out.collect()}
    # transitions: u1 a->b, b->a, a->b ; u2 a->a, a->c
    assert got[("a", "b")] == (2, 0.5)
    assert got[("a", "a")] == (1, 0.25)
    assert got[("a", "c")] == (1, 0.25)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 4


def test_transition_probs_row_normalized(stream):
    out = SEQ.transition_matrix(
        stream, user_col="user_id", type_col="event_type", order_cols=["ts", "event_id"]
    )
    sums = out.groupBy("from_type").agg(F.round(F.sum("prob"), 6).alias("s")).collect()
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in sums)


def test_event_kgrams_hand_counts(stream):
    out = SEQ.event_kgrams(
        stream, user_col="user_id", type_col="event_type",
        order_cols=["ts", "event_id"], k=2, min_count=1,
    )
    got = {(r["step_1"], r["step_2"]): r["n_paths"] for r in out.collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1, ("a", "c"): 1}
    # trigrams never cross user boundaries: u1 aba, bab; u2 aac
    tri = SEQ.event_kgrams(
        stream, user_col="user_id", type_col="event_type",
        order_cols=["ts", "event_id"], k=3, min_count=1,
    )
    tri_got = {(r["step_1"], r["step_2"], r["step_3"]): r["n_paths"] for r in tri.collect()}
    assert tri_got == {("a", "b", "a"): 1, ("b", "a", "b"): 1, ("a", "a", "c"): 1}


def test_kgrams_rejects_k1(stream):
    with pytest.raises(ValueError):
        SEQ.event_kgrams(
            stream, user_col="user_id", type_col="event_type",
            order_cols=["ts"], k=1,
        )


# ------------------------------------------------------------------ SCD2


def test_scd2_runs_collapse_and_validity(spark):
    rows = [
        # key 1: O O F O  → runs O[2], F[1], O[1]
        (1, 1, _ts(0), "O"), (1, 2, _ts(1), "O"), (1, 3, _ts(2), "F"),
        (1, 4, _ts(3), "O"),
        # key 2: F
        (2, 5, _ts(0), "F"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, d timestamp, st string")
    out = TP.scd2_runs(df, key_cols=["k"], order_cols=["d", "seq"], state_col="st").collect()
    by_key_run = {(r["k"], r["run_id"]): r for r in out}
    assert len(by_key_run) == 4
    r1 = by_key_run[(1, 1)]
    assert (r1["st"], r1["n_rows"], r1["valid_from"], r1["valid_to"]) == ("O", 2, _ts(0), _ts(2))
    r2 = by_key_run[(1, 2)]
    assert (r2["st"], r2["valid_from"], r2["valid_to"]) == ("F", _ts(2), _ts(3))
    r3 = by_key_run[(1, 3)]
    assert (r3["st"], r3["valid_to"]) == ("O", None)  # open run
    assert by_key_run[(2, 1)]["valid_to"] is None
    # adjacent runs always differ in state; row counts cover the input
    assert sum(r["n_rows"] for r in out) == len(rows)


# ------------------------------------------------------- chi-square / winsor


def test_chi_square_hand_value(spark):
    # 2x2 table: [[10, 20], [30, 40]] → classic textbook chi-square
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20 + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = ST.chi_square_independence(df, "a", "b").collect()[0]
    n = 100.0
    expected = 0.0
    obs = {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30, ("y", "q"): 40}
    ra = {"x": 30, "y": 70}
    cb = {"p": 40, "q": 60}
    for (av, bv), o in obs.items():
        e = ra[av] * cb[bv] / n
        expected += (o - e) ** 2 / e
    assert out["chi_square"] == pytest.approx(expected, abs=1e-6)
    assert out["dof"] == 1
    assert out["n"] == 100


def test_chi_square_counts_zero_cells(spark):
    # (x,q) never observed but both margins exist → cell contributes
    rows = [("x", "p")] * 5 + [("y", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    out = ST.chi_square_independence(df, "a", "b").collect()[0]
    # expected (x,q) = 5*5/15 → contributes (0-5/3)^2/(5/3) = 5/3
    assert out["chi_square"] > 0
    assert out["dof"] == 1


def test_winsorized_bounds_and_n(spark):
    vals = [float(v) for v in range(1, 101)] + [10_000.0]  # one wild outlier
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = ST.winsorized_stats(df, "g", "v", lower=0.05, upper=0.95).collect()[0]
    # n unchanged (winsorize, not trim); mean pulled toward the body
    assert out["n"] == 101
    assert out["winsorized_mean"] < 200
    assert out["p_lower"] <= out["p_upper"]
    raw_mean = sum(vals) / len(vals)
    assert out["winsorized_mean"] < raw_mean


# ------------------------------------------------------------------ RRF


def test_rrf_fusion_hand_scores(spark):
    l1 = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    l2 = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in RT.rrf_fuse([l1, l2], "doc_id", "rank", k0=60).collect()}
    assert out[2]["n_lists"] == 2
    assert out[2]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[1]["rrf_score"] == pytest.approx(1 / 61, abs=1e-6)
    # doc in both lists outranks single-list docs at these depths
    assert out[2]["fused_rank"] == 1
    # deterministic id tiebreak: docs 1 and 3 tie on score 1/61 vs 1/62?
    assert out[1]["fused_rank"] == 2 and out[3]["fused_rank"] == 3


def test_rrf_empty_input_raises():
    with pytest.raises(ValueError):
        RT.rrf_fuse([], "doc_id", "rank")
