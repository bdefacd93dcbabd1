"""Property pins for the persisted MinHash index: for ARBITRARY
small corpora and ANY id split, screening the "new" half against an
index of the "old" half must reproduce the in-session miner's cross
pairs exactly (signatures are per-doc, so the split cannot matter),
and re-upserting is always a no-op. Generated inputs reach the
shapes a fixture can't: unicode text, duplicate contents under
different ids, empty/whitespace docs, singleton corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import dedup as DD
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    dedup_index as DI,
)

# small docs over a tight alphabet so near-dup pairs actually occur;
# hypothesis also reaches duplicates, empties, and whitespace
docs_strategy = st.lists(
    st.text(alphabet=st.sampled_from("ab cd"), max_size=40),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, split=st.integers(min_value=1, max_value=7))
def test_index_cross_pairs_equal_miner_cross_pairs_for_any_split(
    spark, tmp_path_factory, docs, split
):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    old = df.filter(F.col("doc_id") % 8 < split)
    new = df.filter(F.col("doc_id") % 8 >= split)
    path = str(tmp_path_factory.mktemp("mhprop") / "idx")
    DI.build_minhash_index(old, path, n=3, num_perm=16, band_rows=2, seed=7)
    got = {
        (r.new_id, r.corpus_id, r.n_common, round(r.jaccard, 6))
        for r in DI.minhash_index_dedup(
            spark, path, new, threshold=0.3, rescore="exact", corpus_docs=old
        ).collect()
    }
    full = DD.minhash_duplicate_pairs(
        spark, df, "doc_id", "text", n=3, threshold=0.3, num_perm=16,
        band_rows=2, seed=7,
    ).collect()
    want = {
        (
            (r.doc_a if r.doc_a % 8 >= split else r.doc_b),
            (r.doc_b if r.doc_a % 8 >= split else r.doc_a),
            r.n_common,
            round(r.jaccard, 6),
        )
        for r in full
        if (r.doc_a % 8 < split) != (r.doc_b % 8 < split)
    }
    assert got == want
    # upserting the already-screened batch then re-upserting: the
    # second pass must insert and restore nothing
    DI.upsert_minhash_index(new, path)
    assert DI.upsert_minhash_index(new, path) == {"inserted": 0, "restored": 0}
