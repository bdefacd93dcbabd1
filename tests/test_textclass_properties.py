"""Property pins for the model-based filtering tier: the distributed
NB/DSIR implementations must agree with a from-scratch pure-Python
reference over generated corpora — an independent check on top of the
DuckDB parity tests (different reimplementation, different failure
modes)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    textclass as TC,
)

B = 64  # tiny bucket space → guaranteed collisions, exercised exactly

VOCAB = ["aa", "bb", "cc", "dd", "ee"]

doc_texts = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


def _bucket(s: str) -> int:
    # the shared md5-prefix primitive (textops.shared_token_hash60)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B


def _grams(text: str, n: int) -> list[str]:
    toks = text.split()
    if len(toks) >= n:
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)]  # whole-text fallback ('' for empty)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_texts)
def test_nb_matches_pure_python_reference(spark, texts):
    """Fit on all docs (label = doc parity), classify the same docs:
    the Spark NB must reproduce a Fraction-exact pure-Python NB —
    argmax compared only where the reference's margin is decisive
    (> 1e-9 in log space), ties deferred to the pinned label-asc rule."""
    rows = [(i, t, "even" if i % 2 == 0 else "odd") for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cond, stats = TC.fit_nb_classifier(
        d, "doc_id", "text", "lang", num_buckets=B, n=1, base_hash="md5"
    )
    got = {
        r.doc: r.label
        for r in TC.nb_classify(
            d, cond, stats, "doc_id", "text", num_buckets=B, n=1, base_hash="md5"
        ).collect()
    }
    assert set(got) == set(range(len(texts)))  # total

    # pure-Python reference with exact rationals
    by_label: dict[str, Counter] = {"even": Counter(), "odd": Counter()}
    n_docs = Counter()
    for i, t in enumerate(texts):
        lab = "even" if i % 2 == 0 else "odd"
        n_docs[lab] += 1
        for g in _grams(t, 1):
            by_label[lab][_bucket(g)] += 1
    labels = [lab for lab in ("even", "odd") if n_docs[lab]]
    for i, t in enumerate(texts):
        scores = {}
        for lab in labels:
            tot = sum(by_label[lab].values())
            # log-score as a product of exact rationals, compared in
            # log space at the end
            prod = Fraction(n_docs[lab], len(texts))
            for g in _grams(t, 1):
                prod *= Fraction(by_label[lab][_bucket(g)] + 1, tot + B)
            scores[lab] = prod
        best = max(labels, key=lambda lab: (scores[lab], ))
        # decisive only if the ratio is meaningfully away from 1
        others = [scores[lab] for lab in labels if lab != best]
        if others and abs(math.log(float(scores[best] / max(others)))) > 1e-9:
            assert got[i] == best, (i, texts[i], scores)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_texts)
def test_dsir_weights_match_pure_python_reference(spark, texts):
    """Target = even docs. Spark DSIR log-weights must equal the
    pure-Python bag-of-hashed-bigrams log-likelihood ratio to 1e-9
    relative (same smoothing, same buckets)."""
    rows = list(enumerate(texts))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    target = d.filter("doc_id % 2 = 0")
    got = {
        r.doc: (r.log_weight, r.n_feat)
        for r in TC.dsir_importance_weights(
            d, target, "doc_id", "text", num_buckets=B, n=2, base_hash="md5"
        ).collect()
    }
    assert set(got) == set(range(len(texts)))  # total

    tdist, rdist = Counter(), Counter()
    for i, t in enumerate(texts):
        for g in _grams(t, 2):
            b = _bucket(g)
            rdist[b] += 1
            if i % 2 == 0:
                tdist[b] += 1
    tot_t, tot_r = sum(tdist.values()), sum(rdist.values())
    for i, t in enumerate(texts):
        want = 0.0
        n_feat = 0
        for g in _grams(t, 2):
            b = _bucket(g)
            want += math.log((tdist[b] + 1.0) / (tot_t + B)) - math.log(
                (rdist[b] + 1.0) / (tot_r + B)
            )
            n_feat += 1
        lw, nf = got[i]
        assert nf == n_feat
        assert abs(lw - want) <= 1e-9 * max(1.0, abs(want)), (i, lw, want)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_texts)
def test_lm_scores_match_pure_python_reference(spark, texts):
    """Fit Stupid Backoff on even docs, score odd docs: per-doc
    (n_transitions, avg_logprob) must match a pure-Python reference
    to 1e-9 relative — and docs with <2 tokens must emit no row."""
    rows = list(enumerate(texts))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    ref = d.filter("doc_id % 2 = 0")
    test = d.filter("doc_id % 2 = 1")
    uni, bi, n_tok = TC.fit_bigram_lm(ref, "doc_id", "text", num_buckets=B, base_hash="md5")
    got = {
        r.doc: (r.n_transitions, r.avg_logprob)
        for r in TC.lm_score_docs(
            test, uni, bi, n_tok, "doc_id", "text", num_buckets=B, base_hash="md5"
        ).collect()
    }

    uni_c, bi_c = Counter(), Counter()
    n_ref = 0
    for i, t in enumerate(texts):
        if i % 2 == 0:
            toks = t.split()
            n_ref += len(toks)
            for w in toks:
                uni_c[_bucket(w)] += 1
            for a, b_ in zip(toks, toks[1:]):
                bi_c[_bucket(a + " " + b_)] += 1
    assert n_tok == n_ref

    expect = {}
    for i, t in enumerate(texts):
        if i % 2 == 0:
            continue
        toks = t.split()
        if len(toks) < 2:
            continue
        lps = []
        for a, b_ in zip(toks, toks[1:]):
            cb = bi_c.get(_bucket(a + " " + b_))
            cp = uni_c.get(_bucket(a))
            if cb is not None and cp is not None:
                lps.append(math.log(cb / cp))
            else:
                lps.append(math.log(0.4 * (uni_c.get(_bucket(b_), 0) + 1.0) / (n_ref + B)))
        expect[i] = (len(lps), sum(lps) / len(lps))
    assert set(got) == set(expect)
    for i, (nt, avg) in expect.items():
        gnt, gavg = got[i]
        assert gnt == nt
        assert abs(gavg - round(avg, 6)) <= 2e-6, (i, gavg, avg)
