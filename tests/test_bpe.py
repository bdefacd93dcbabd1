"""BPE vocabulary induction (``operators.bpe``): merge table pinned
against an independent pure-Python reference (full pair-table rescan
per merge — no heap, no incremental updates) and the Sennrich et al.
2016 worked example; histogram determinism; bounded-driver contract;
distributed segmentation semantics incl. OOV fallback and the
broadcast-only plan shape. The fit is deliberately not
SQL-replayable (iterative global argmax), so these pins are the
correctness story — the ALS rows-only precedent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    bpe as B,
)

DOC = "doc_id long, text string"


def _ref_bpe(items, n_merges, min_pair_count=2, eow=B.END_OF_WORD):
    """Independent reference: full rescan of every pair each merge —
    quadratic and obviously-correct, against which the operator's
    lazy-heap incremental loop must agree exactly."""
    symbols = {w: [*w, eow] for w, _ in items}
    counts = dict(items)
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in symbols.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), c = best
        merges.append((rank, a, b, c))
        for w, syms in symbols.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            symbols[w] = out
    return merges, symbols


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_merge_loop_matches_reference_on_sennrich_and_random():
    import random

    rnd = random.Random(7)
    cases = [SENNRICH]
    alphabet = "abcde"
    for _ in range(12):
        n = rnd.randint(1, 14)
        words = {
            "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 8)))
            for _ in range(n)
        }
        cases.append(sorted((w, rnd.randint(1, 9)) for w in words))
    for items in cases:
        for k in (0, 1, 5, 30):
            got_m, got_s = B._merge_loop(sorted(items), k, 2, B.END_OF_WORD)
            want_m, want_s = _ref_bpe(sorted(items), k)
            assert got_m == want_m, (items, k)
            assert {w: s for (w, _), s in zip(sorted(items), got_s)} == want_s


def test_sennrich_first_merges_hand_pinned():
    merges, _ = B._merge_loop(sorted(SENNRICH), 4, 2, "</w>")
    # est-family pairs dominate (newest 6 + widest 3 = 9); ties break
    # lexicographically: (e,s) < (es,t) < (est,</w>); then (l,o) at 7.
    assert merges == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
    ]


def test_fit_bpe_end_to_end_and_vocab_segmentation(spark):
    hist = spark.createDataFrame(SENNRICH, "word string, n long")
    merges, vocab = B.fit_bpe(hist, n_merges=10)
    got = [(r.rank, r.left, r.right, r.pair_count) for r in merges.orderBy("rank").collect()]
    want_m, want_s = _ref_bpe(sorted(SENNRICH), 10)
    assert got == want_m
    v = {r.word: (r.n, r.subwords) for r in vocab.collect()}
    assert set(v) == {w for w, _ in SENNRICH}
    for w, c in SENNRICH:
        assert v[w][0] == c
        assert v[w][1] == want_s[w]
        # conservation: subwords spell the word + end marker
        assert "".join(v[w][1]) == w + B.END_OF_WORD


def test_fit_contracts(spark):
    hist = spark.createDataFrame(SENNRICH, "word string, n long")
    with pytest.raises(ValueError, match="n_merges"):
        B.fit_bpe(hist, n_merges=-1)
    with pytest.raises(ValueError, match="max_vocab_rows"):
        B.fit_bpe(hist, n_merges=1, max_vocab_rows=2)
    # empty histogram -> empty artifacts with the contract schemas
    empty = spark.createDataFrame([], "word string, n long")
    m, v = B.fit_bpe(empty, n_merges=5)
    assert m.count() == 0 and v.count() == 0
    assert m.columns == ["rank", "left", "right", "pair_count"]
    # min_pair_count stops early: all-singleton histogram merges nothing
    singles = spark.createDataFrame([("abc", 1), ("xyz", 1)], "word string, n long")
    m2, _ = B.fit_bpe(singles, n_merges=10)
    assert m2.count() == 0


def test_word_histogram_deterministic_and_truncated(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c c b")], DOC
    )
    h1 = [(r.word, r.n) for r in B.word_histogram(docs, top_v=2).collect()]
    h2 = [
        (r.word, r.n)
        for r in B.word_histogram(docs.repartition(7), top_v=2).collect()
    ]
    assert sorted(h1) == sorted(h2) == [("a", 3), ("b", 4)]  # c(3) loses tie to a


def test_segment_known_vocab_oov_fallback_and_plan(spark):
    hist = spark.createDataFrame(SENNRICH, "word string, n long")
    _, vocab = B.fit_bpe(hist, n_merges=10)
    docs = spark.createDataFrame(
        [(1, "low lower zap"), (2, "newest")], DOC
    ).repartition(3)
    seg = B.bpe_segment(docs, vocab)
    rows = {(r.doc_id, r.pos): r for r in seg.collect()}
    assert rows[(1, 0)].word == "low" and not rows[(1, 0)].oov
    assert "".join(rows[(1, 1)].subwords) == "lower" + B.END_OF_WORD
    # OOV falls back to chars + end marker
    assert rows[(1, 2)].oov
    assert rows[(1, 2)].subwords == ["z", "a", "p", B.END_OF_WORD]
    assert rows[(1, 2)].n_subwords == 4
    assert not rows[(2, 0)].oov
    plan = seg._sc._jvm.PythonSQLUtils.explainString(
        seg._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # text never shuffles
    assert "BatchEvalPython" not in plan
    with pytest.raises(ValueError, match="no column"):
        B.bpe_segment(docs.drop("doc_id"), vocab)


def test_fit_on_real_documents_is_deterministic(spark, sf_dir):
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents")
    h = B.word_histogram(d, top_v=500)
    m1, _ = B.fit_bpe(h, n_merges=40)
    m2, _ = B.fit_bpe(B.word_histogram(d.repartition(11), top_v=500), n_merges=40)
    t1 = [tuple(r) for r in m1.orderBy("rank").collect()]
    t2 = [tuple(r) for r in m2.orderBy("rank").collect()]
    assert t1 == t2 and len(t1) == 40
