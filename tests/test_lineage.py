"""Cross-run corpus lineage (``operators.lineage``): slice manifests
with order-insensitive content fingerprints, the persisted run log,
and the stale-screening / drift views a scheduler consumes. The
manifest-row oracle spelling is proven in
tests/test_oracle_queries.py::corpus_slice_lineage (registered with a
full DuckDB replay — screen + both XOR fingerprints + the index
fingerprint); this file pins the lifecycle semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    lineage as LN,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table

DOC = "doc_id long, source string, text string"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "web", "alpha beta gamma"),
            (2, "web", "delta epsilon zeta"),
            (3, "books", "eta theta iota"),
            (4, "books", "kappa lambda mu"),
            (5, "wiki", "nu xi omicron"),
        ],
        DOC,
    )


def test_manifest_fingerprints_are_order_insensitive_and_content_pure(spark):
    """Same rows ⇒ same fingerprints regardless of row order or
    partitioning; any content change flips the slice's fp; a
    fully-rejected slice stays visible with the zero sentinel."""
    corpus = _corpus(spark)
    admitted = corpus.filter(F.col("doc_id").isin(1, 3, 4))  # wiki fully rejected
    m1 = {
        r.slice_id: r
        for r in LN.slice_lineage_manifest(
            corpus, admitted, slice_col="source"
        ).collect()
    }
    assert set(m1) == {"web", "books", "wiki"}
    assert (m1["web"].n_docs, m1["web"].n_admitted) == (2, 1)
    assert (m1["books"].n_docs, m1["books"].n_admitted) == (2, 2)
    assert (m1["wiki"].n_docs, m1["wiki"].n_admitted) == (1, 0)
    assert m1["wiki"].admitted_fp == "0" * 16
    # books admitted everything: in-fp == out-fp
    assert m1["books"].admitted_fp == m1["books"].content_fp
    assert m1["web"].admitted_fp != m1["web"].content_fp

    # order/partitioning invariance
    m2 = {
        r.slice_id: r
        for r in LN.slice_lineage_manifest(
            corpus.orderBy(F.col("doc_id").desc()).repartition(7),
            admitted.repartition(3),
            slice_col="source",
        ).collect()
    }
    for s in m1:
        assert (m1[s].content_fp, m1[s].admitted_fp) == (
            m2[s].content_fp,
            m2[s].admitted_fp,
        )

    # content purity: one changed character flips exactly that slice
    changed = corpus.withColumn(
        "text",
        F.when(F.col("doc_id") == 5, F.lit("nu xi omicron!")).otherwise(
            F.col("text")
        ),
    )
    m3 = {
        r.slice_id: r.content_fp
        for r in LN.slice_lineage_manifest(
            changed, admitted, slice_col="source"
        ).collect()
    }
    assert m3["wiki"] != m1["wiki"].content_fp
    assert m3["web"] == m1["web"].content_fp
    assert m3["books"] == m1["books"].content_fp


def test_provenance_columns_stamped_sorted(spark):
    corpus = _corpus(spark)
    out = LN.slice_lineage_manifest(
        corpus,
        corpus,
        slice_col="source",
        provenance={"decontam_fp": "ab" * 8, "dedup_fp": "cd" * 8, "model_id": "m1"},
    )
    assert out.columns == [
        "slice_id", "n_docs", "content_fp", "n_admitted", "admitted_fp",
        "decontam_fp", "dedup_fp", "model_id",
    ]
    row = out.collect()[0]
    assert (row.decontam_fp, row.dedup_fp, row.model_id) == ("ab" * 8, "cd" * 8, "m1")


def test_manifest_lifecycle_latest_stale_drift(spark, tmp_path):
    """The run log: two appended runs, latest-state view, the
    stale-screening worklist after the live index fingerprint moves,
    and content drift between consecutive runs."""
    path = str(tmp_path / "manifest")
    corpus = _corpus(spark)
    e1 = LN.slice_lineage_manifest(
        corpus, corpus, slice_col="source", provenance={"decontam_fp": "f1" * 8}
    )
    LN.append_manifest(e1, path, run_id=1)

    # run 2: wiki's content changed AND was screened against a new
    # index generation; web/books rescreened against the new one too
    changed = corpus.withColumn(
        "text",
        F.when(F.col("doc_id") == 5, F.lit("rewritten entirely")).otherwise(
            F.col("text")
        ),
    )
    e2 = LN.slice_lineage_manifest(
        changed,
        changed.filter(F.col("doc_id") != 5),
        slice_col="source",
        provenance={"decontam_fp": "f2" * 8},
    )
    LN.append_manifest(e2, path, run_id=2)

    latest = {r.slice_id: r for r in LN.latest_manifest(spark, path).collect()}
    assert all(r.run_id == 2 for r in latest.values())
    assert latest["wiki"].n_admitted == 0

    # nothing stale against the current generation...
    assert LN.stale_screenings(spark, path, {"decontam_fp": "f2" * 8}).count() == 0
    # ...everything stale against a newer one, with the key named
    stale = LN.stale_screenings(spark, path, {"decontam_fp": "f3" * 8})
    rows = stale.collect()
    assert {r.slice_id for r in rows} == {"web", "books", "wiki"}
    assert all(r.stale_keys == "decontam_fp" for r in rows)
    with pytest.raises(ValueError, match="at least one"):
        LN.stale_screenings(spark, path, {})
    with pytest.raises(ValueError, match="no provenance column"):
        LN.stale_screenings(spark, path, {"nonexistent_fp": "x"})

    drift = {r.slice_id: r for r in LN.manifest_drift(spark, path).collect()}
    assert set(drift) == {"web", "books", "wiki"}
    assert drift["wiki"].content_changed and drift["wiki"].admitted_changed
    assert not drift["web"].content_changed
    assert not drift["books"].content_changed
    assert (drift["wiki"].run_id, drift["wiki"].prev_run_id) == (2, 1)


def test_append_entry_limit_contract_guard(spark, tmp_path, monkeypatch):
    """The operational-metadata contract is enforced (the
    decontam COALESCE_GRAM_LIMIT rule): appends beyond the entry
    limit warn and keep natural partitioning instead of silently
    serializing through one task; normal appends land single-file."""
    import glob
    import warnings as W

    corpus = _corpus(spark)
    entries = LN.slice_lineage_manifest(corpus, corpus, slice_col="source")
    path = str(tmp_path / "m")
    monkeypatch.setattr(LN, "COALESCE_ENTRY_LIMIT", 2)
    with pytest.warns(UserWarning, match="slice-grained"):
        LN.append_manifest(entries, path, run_id=1)
    monkeypatch.setattr(LN, "COALESCE_ENTRY_LIMIT", 1_000_000)
    with W.catch_warnings():
        W.simplefilter("error")
        LN.append_manifest(entries, path, run_id=2)
    assert LN.read_manifest(spark, path).count() == 6
    # run 2's append is exactly one new data file beyond run 1's
    assert len(glob.glob(f"{path}/part-*")) >= 2
    latest = LN.latest_manifest(spark, path)
    assert latest.count() == 3 and all(r.run_id == 2 for r in latest.collect())


def test_manifest_matches_registered_query_on_real_table(spark, sf_dir):
    """The operator over the real documents table agrees with the
    registered (oracle-checked) query's own aggregation when the
    screen admits everything — a cheap cross-pin that the fp algebra
    is slice-content-only."""
    d = load_table(spark, sf_dir, "documents")
    out = LN.slice_lineage_manifest(d, d, slice_col="source")
    rows = out.collect()
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert r.content_fp == r.admitted_fp
        assert len(r.content_fp) == 16


def test_streaming_gate_writes_epoch_manifest(spark, tmp_path):
    """The decontam gate's lineage leg: every batch lands one manifest
    row under the epoch discipline (replay overwrites its own row, no
    duplicates), stamped with the frozen index's fingerprint — so
    stale_screenings over the stream's own manifest yields exactly
    the batches that predate a benchmark change."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        decontam_index as DC,
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import (
        sinks as SK,
    )

    A = "the quick brown fox jumps over the lazy dog every single morning"
    B = "completely different content about rivers mountains and weather"
    C = "a third topic entirely concerning databases and partition pruning"
    idx = str(tmp_path / "idx")
    DC.build_decontam_index(
        spark.createDataFrame([("b1", A)], "bench_id string, text string"), idx
    )
    live_fp = DC.decontam_index_fingerprint(spark, idx)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    write = SK.decontam_gate_writer(out, idx, manifest_path=man)
    b0 = spark.createDataFrame([(1, A), (2, B)], "doc_id long, text string")
    write(b0, 0)
    write(spark.createDataFrame([(3, C)], "doc_id long, text string"), 1)
    write(b0, 0)  # at-least-once replay: epoch 0 overwritten, not appended

    m = LN.read_manifest(spark, man)
    rows = {r.slice_id: r for r in m.collect()}
    assert len(rows) == 2 and m.count() == 2  # no replay duplicates
    assert (rows["0"].n_docs, rows["0"].n_admitted) == (2, 1)  # doc 1 rejected
    assert (rows["1"].n_docs, rows["1"].n_admitted) == (1, 1)
    assert rows["0"].decontam_fp == live_fp
    assert rows["0"].admitted_fp != rows["0"].content_fp
    assert rows["1"].admitted_fp == rows["1"].content_fp
    # the provenance question the manifest exists to answer
    assert LN.stale_screenings(spark, man, {"decontam_fp": live_fp}).count() == 0
    stale = LN.stale_screenings(spark, man, {"decontam_fp": "f" * 16})
    assert stale.count() == 2


def test_lm_gate_writes_epoch_manifest_with_model_fingerprint(spark, tmp_path):
    """The LM gate's lineage leg: one manifest row per batch stamped
    with the frozen model's content fingerprint + threshold — and the
    fingerprint itself is a pure function of the fitted model
    (identical fit ⇒ identical handle; different training corpus ⇒
    different handle)."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        textclass as TC,
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import (
        sinks as SK,
    )

    DOC = "doc_id long, text string"
    good = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps while the quick fox jumps",
        "a quick fox and a lazy dog play in the yard",
    ]
    ref = spark.createDataFrame(list(enumerate(good)), DOC)
    B = 4096
    uni, bi, n = TC.fit_bigram_lm(ref, "doc_id", "text", num_buckets=B)
    m1, m2 = str(tmp_path / "lm1"), str(tmp_path / "lm2")
    TC.save_bigram_lm(uni, bi, n, m1, num_buckets=B)
    TC.save_bigram_lm(uni, bi, n, m2, num_buckets=B)
    fp = TC.lm_model_fingerprint(spark, m1)
    assert len(fp) == 16
    assert fp == TC.lm_model_fingerprint(spark, m2)  # same fit, same handle
    other = spark.createDataFrame(
        [(0, "entirely different training text about rivers and rain")], DOC
    )
    u2, b2, n2 = TC.fit_bigram_lm(other, "doc_id", "text", num_buckets=B)
    m3 = str(tmp_path / "lm3")
    TC.save_bigram_lm(u2, b2, n2, m3, num_buckets=B)
    assert TC.lm_model_fingerprint(spark, m3) != fp

    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    write = SK.lm_quality_gate_writer(out, m1, max_ppl=50.0, manifest_path=man)
    b0 = spark.createDataFrame(
        [(10, good[0]), (11, "zz qq xx vv kk jj pp ww uu yy")], DOC
    )
    write(b0, 0)
    write(b0, 0)  # replay: epoch overwrite, no duplicates
    m = LN.read_manifest(spark, man)
    assert m.count() == 1
    row = m.collect()[0]
    assert (row.slice_id, row.n_docs, row.n_admitted) == ("0", 2, 1)
    assert row.lm_model_fp == fp and row.lm_max_ppl == "50.0"
    assert LN.stale_screenings(spark, man, {"lm_model_fp": fp}).count() == 0
    assert LN.stale_screenings(
        spark, man, {"lm_model_fp": TC.lm_model_fingerprint(spark, m3)}
    ).count() == 1


def test_relation_fingerprint_generic_handle(spark):
    """The generic provenance handle: order/partitioning-insensitive,
    content- and column-sensitive, zero sentinel on empty, contract
    error on no columns."""
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    fp = LN.relation_fingerprint(df, ["k", "v"])
    assert len(fp) == 16
    assert fp == LN.relation_fingerprint(df.orderBy(F.col("k").desc()).repartition(5), ["k", "v"])
    assert fp != LN.relation_fingerprint(df.filter("k < 3"), ["k", "v"])
    assert fp != LN.relation_fingerprint(df, ["k"])  # column-sensitive
    assert LN.relation_fingerprint(df.filter("k > 99"), ["k"]) == "0" * 16
    with pytest.raises(ValueError, match="at least one column"):
        LN.relation_fingerprint(df, [])


def test_minhash_index_fingerprint_is_content_pure(spark, tmp_path):
    """The dedup index's generation handle (completing the manifest's
    provenance set alongside decontam_index_fingerprint): invariant
    under rebuild order and compaction; changed by tombstones, knob
    differences, and membership; restored exactly with the content."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
        dedup_index as DI,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different content about rivers and weather"),
        (3, "a third topic concerning indexes and partition pruning"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    DI.build_minhash_index(docs, p1, n=3, base_hash="md5")
    DI.build_minhash_index(
        docs.orderBy(F.col("doc_id").desc()).repartition(3), p2, n=3, base_hash="md5"
    )
    fp = DI.minhash_index_fingerprint(spark, p1)
    assert len(fp) == 16
    assert fp == DI.minhash_index_fingerprint(spark, p2)

    # knob difference flips it even on identical content
    p3 = str(tmp_path / "c")
    DI.build_minhash_index(docs, p3, n=3, base_hash="md5", band_rows=4)
    assert DI.minhash_index_fingerprint(spark, p3) != fp

    # tombstone changes the live content; compaction does not
    DI.delete_from_minhash_index(
        spark.createDataFrame([(3,)], "doc_id long"), p1
    )
    fp_tomb = DI.minhash_index_fingerprint(spark, p1)
    assert fp_tomb != fp
    DI.compact_minhash_index(p1, spark)
    assert DI.minhash_index_fingerprint(spark, p1) == fp_tomb


def test_lineage_plan_is_parallel(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    plan = (
        LN.slice_lineage_manifest(d, d, slice_col="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
