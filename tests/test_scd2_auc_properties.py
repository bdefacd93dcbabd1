"""Hypothesis properties: scd2_runs and binary_auc against naive
pure-Python references on random inputs."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    evaluate as EV,
    temporal as TP,
)

# per-key state sequences: small alphabet to force runs and ties
state_seqs = st.lists(
    st.tuples(st.integers(0, 2), st.sampled_from(["A", "B", "C"])),
    min_size=1,
    max_size=25,
)


def _naive_runs(rows):
    """rows: [(key, seq, state)] ordered — collapse per key."""
    runs = {}
    by_key = {}
    for key, seq, state in sorted(rows):
        by_key.setdefault(key, []).append((seq, state))
    for key, items in by_key.items():
        rid = 0
        prev = object()
        for seq, state in items:
            if state != prev:
                rid += 1
                runs[(key, rid)] = {"state": state, "first": seq, "last": seq, "n": 1}
                prev = state
            else:
                runs[(key, rid)]["last"] = seq
                runs[(key, rid)]["n"] += 1
    return runs


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seq=state_seqs)
def test_scd2_matches_naive_reference(spark, seq):
    rows = [(key, i, state) for i, (key, state) in enumerate(seq)]
    df = spark.createDataFrame(rows, "k int, seq int, st string")
    got = {
        (r["k"], r["run_id"]): r
        for r in TP.scd2_runs(
            df, key_cols=["k"], order_cols=["seq"], state_col="st"
        ).collect()
    }
    want = _naive_runs(rows)
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert g["st"] == w["state"]
        assert g["valid_from"] == w["first"]
        assert g["last_seen"] == w["last"]
        assert g["n_rows"] == w["n"]
    # valid_to chains: equals the successor run's valid_from
    for (k, rid), g in got.items():
        succ = got.get((k, rid + 1))
        assert g["valid_to"] == (succ["valid_from"] if succ else None)


# scores drawn from a small grid so ties are common (the hard case)
labeled = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 5)), min_size=4, max_size=40
).filter(lambda xs: len({y for y, _ in xs}) == 2)  # both classes present


def _naive_auc(rows):
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=labeled)
def test_auc_matches_naive_pairwise(spark, rows):
    df = spark.createDataFrame(
        [(y, float(s)) for y, s in rows], "y int, s double"
    )
    got = EV.binary_auc(df, "y", "s").collect()[0]
    assert got["auc"] == pytest.approx(_naive_auc(rows), abs=1e-6)
    assert got["n_pos"] == sum(1 for y, _ in rows if y == 1)
    assert got["n_neg"] == sum(1 for y, _ in rows if y == 0)
