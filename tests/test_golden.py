"""Golden-output test: the committed top-similar-pairs CSV is the
engine's analog of the reference's committed ``top_100_pairs.csv``
(its only golden artifact) — deterministic, re-derivable, and
guarded against semantic drift."""

from __future__ import annotations

import os

import pandas as pd

import __spark_entry__ as entrymod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "top_similar_pairs_sf0001.csv")


def test_top_similar_pairs_matches_golden(spark):
    got = (
        entrymod.queries()["top_similar_customer_pairs"](spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    exp = pd.read_csv(GOLDEN)
    assert list(got.columns) == list(exp.columns)
    g = sorted(
        (int(r.user_a), int(r.user_b), int(r.n_common), round(float(r.jaccard), 6))
        for r in got.itertuples()
    )
    e = sorted(
        (int(r.user_a), int(r.user_b), int(r.n_common), round(float(r.jaccard), 6))
        for r in exp.itertuples()
    )
    assert g == e
