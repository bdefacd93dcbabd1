"""Property-based check of the chronological-split invariants
(SURVEY §5): per-user counts within ±1 of 60/20/20, and
max(train.ts) <= min(val.ts) <= ... per user, on generated data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import splits as S

user_histories = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # user
        st.integers(min_value=0, max_value=10_000),     # ts
        st.integers(min_value=0, max_value=1_000_000),  # unique-ish tiebreak seed
    ),
    min_size=5,
    max_size=60,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=user_histories)
def test_split_invariants(spark, rows):
    # tiebreak must be unique per (user, ts) pair for determinism
    data = [(u, t, i) for i, (u, t, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "user long, ts long, item long")
    out = S.chronological_split(df, "user", "ts", tiebreak_col="item", min_rows_per_user=5)
    got = out.collect()

    per_user: dict[int, dict[str, list[int]]] = {}
    for r in got:
        per_user.setdefault(r.user, {"train": [], "val": [], "test": []})[r.split].append(r.ts)

    kept_users = {u for u, ts, _ in [(d[0], d[1], d[2]) for d in data]}
    for u, buckets in per_user.items():
        n = sum(len(v) for v in buckets.values())
        assert n >= 5  # users below min_rows_per_user are dropped entirely
        assert abs(len(buckets["train"]) - 0.6 * n) <= 1.0
        assert abs(len(buckets["val"]) - 0.2 * n) <= 1.0
        assert abs(len(buckets["test"]) - 0.2 * n) <= 1.0
        if buckets["train"] and buckets["val"]:
            assert max(buckets["train"]) <= min(buckets["val"])
        if buckets["val"] and buckets["test"]:
            assert max(buckets["val"]) <= min(buckets["test"])


doc_texts = st.lists(
    st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=23
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=doc_texts, chunk=st.integers(2, 6), overlap=st.integers(0, 1))
def test_chunking_covers_every_token_exactly(spark, docs, chunk, overlap):
    """chunk_documents invariants on generated corpora: chunk texts
    re-concatenated with the overlap removed reproduce the original
    token sequence exactly; chunk ids are contiguous from 0; every
    chunk except possibly the last has exactly chunk_tokens tokens."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.functions import textops as TX

    stride = chunk - overlap
    data = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    out = TX.chunk_documents(df, "doc_id", "text", chunk_tokens=chunk, stride=stride)

    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in enumerate(t for t in (d for d in docs)):
        toks = docs[doc_id]
        rows = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if not toks:
            assert rows == []
            continue
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        rebuilt: list[str] = []
        for r in rows:
            ctoks = r.chunk_text.split(" ") if r.chunk_text else []
            assert r.n_tokens == len(ctoks)
            skip = overlap if rebuilt else 0
            rebuilt.extend(ctoks[skip:])
        assert rebuilt == toks, (doc_id, rebuilt, toks)
