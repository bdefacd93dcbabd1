"""Property pins for SPFHP strategy synthesis: the histogram-form
greedy must equal the explicit per-document best-fit-decreasing
simulation on arbitrary inputs, conserve every document, and respect
capacity/max_items — hypothesis-driven so the equivalence argument
is not fixture-shaped (the textclass/dedup-index property-pin
discipline). Pure driver-side code: no SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    packing as PK,
)


def _ref_spfhp(hist: dict[int, int], cap: int, max_items=None):
    """Explicit per-pack simulation (mirrors tests/test_packing.py's
    reference): longest class first, each doc into the fullest viable
    open pack (ties: lexicographically smallest pattern)."""
    packs: list[list] = []
    for ln in sorted(hist, reverse=True):
        for _ in range(hist[ln]):
            viable = [
                p for p in packs
                if p[0] >= ln and (max_items is None or len(p[1]) < max_items)
            ]
            if viable:
                best = min(viable, key=lambda p: (p[0], p[1]))
                best[0] -= ln
                best[1].append(ln)
            else:
                packs.append([cap - ln, [ln]])
    out: dict[tuple, int] = {}
    for _, lens in packs:
        key = tuple(sorted(lens, reverse=True))
        out[key] = out.get(key, 0) + 1
    return sorted(out.items())


hist_strategy = st.dictionaries(
    keys=st.integers(min_value=1, max_value=64),
    values=st.integers(min_value=1, max_value=40),
    min_size=0,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(
    hist=hist_strategy,
    cap=st.integers(min_value=64, max_value=128),
    max_items=st.one_of(st.none(), st.integers(min_value=1, max_value=6)),
)
def test_spfhp_equals_per_doc_simulation(hist, cap, max_items):
    got = PK._spfhp_strategies(hist, cap, max_items)
    assert got == _ref_spfhp(hist, cap, max_items)


@settings(max_examples=200, deadline=None)
@given(
    hist=hist_strategy,
    cap=st.integers(min_value=64, max_value=128),
    max_items=st.one_of(st.none(), st.integers(min_value=1, max_value=6)),
)
def test_spfhp_conservation_and_bounds(hist, cap, max_items):
    got = PK._spfhp_strategies(hist, cap, max_items)
    packed: dict[int, int] = {}
    for pat, cnt in got:
        assert cnt > 0
        assert sum(pat) <= cap
        assert tuple(sorted(pat, reverse=True)) == pat  # canonical form
        if max_items is not None:
            assert len(pat) <= max_items
        for ln in pat:
            packed[ln] = packed.get(ln, 0) + cnt
    assert packed == hist


@settings(max_examples=100, deadline=None)
@given(hist=hist_strategy, cap=st.integers(min_value=64, max_value=128))
def test_spfhp_no_two_open_packs_could_merge_greedily(hist, cap):
    """Quality floor the greedy guarantees: you never end with two
    packs that are BOTH single-doc packs whose lengths fit together —
    the second doc would have best-fit into the first. (Full optimal
    packing is NP-hard; this pins the no-obvious-waste property.)"""
    got = PK._spfhp_strategies(hist, cap, None)
    singles = [pat[0] for pat, cnt in got for _ in range(cnt) if len(pat) == 1]
    singles.sort()
    if len(singles) >= 2:
        assert singles[0] + singles[-1] > cap, singles
