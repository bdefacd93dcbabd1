"""Substring-level cross-doc dedup (winnowed k-gram seeds → diagonal
chaining → verified spans): reported spans must be EXACT common
substrings (never false positives), planted verbatim passages must be
found, the whole pipeline must reproduce in DuckDB, and the masking
policy must cut codepoint-exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    substring as SS,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table

SHARED = (
    "This exact licensed paragraph is repeated verbatim across documents "
    "and is long enough to matter for the span detector."
)


def _planted(spark):
    return spark.createDataFrame(
        [
            (1, "Unique preamble one. " + SHARED + " Unique tail one."),
            (2, "Different opening text here. " + SHARED + " And a different ending."),
            (3, "No overlap with anything else in this corpus, purely original."),
        ],
        "doc_id long, text string",
    )


def test_planted_span_found_exact_and_trim_bounded(spark):
    d = _planted(spark)
    k, w = 25, 12
    rows = SS.repeated_span_pairs(d, "doc_id", "text", k=k, window=w, min_len=50).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    texts = {x.doc_id: x.text for x in d.collect()}
    span_a = texts[1][r.start_a - 1 : r.start_a - 1 + r.length]
    span_b = texts[2][r.start_b - 1 : r.start_b - 1 + r.length]
    assert span_a == span_b  # exactness: never a false positive
    assert span_a in SHARED or SHARED in span_a  # it IS the planted passage
    # recall contract: trimmed by < window at each end
    assert r.length >= len(SHARED) - 2 * (w - 1) - (k - 1)


def test_full_pipeline_matches_duckdb(spark, sf_dir, duck):
    """Same md5-prefix hashes, same struct-min winnowing, same
    verification and chaining — DuckDB must produce the identical
    span set over the real documents table."""
    k, w, min_len = 25, 12, 50
    d = load_table(spark, sf_dir, "documents")
    got = {
        tuple(r)
        for r in SS.repeated_span_pairs(
            d, "doc_id", "text", k=k, window=w, min_len=min_len
        ).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
    WITH g AS (SELECT doc_id, unnest(range(1, greatest(length(text)-{k}+1, 0)+1)) AS pos, text
               FROM documents),
    h AS (SELECT doc_id AS doc, pos,
                 ('0x'||substr(md5(substr(text, pos::INT, {k})),1,15))::BIGINT AS h FROM g),
    sel AS (SELECT DISTINCT doc, m['pos'] AS pos, m['h'] AS h FROM (
       SELECT doc, min({{'h': h, 'pos': pos}}) OVER
         (PARTITION BY doc ORDER BY pos ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m
       FROM h)),
    cand AS (SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pos_a, b.pos AS pos_b
             FROM sel a JOIN sel b ON a.h = b.h AND a.doc < b.doc),
    ver AS (SELECT c.* FROM cand c
            JOIN documents da ON da.doc_id = c.doc_a
            JOIN documents db ON db.doc_id = c.doc_b
            WHERE substr(da.text, c.pos_a::INT, {k}) = substr(db.text, c.pos_b::INT, {k})),
    ch AS (SELECT *, pos_a - pos_b AS diag,
             CASE WHEN pos_a - lag(pos_a) OVER w IS NULL
                    OR pos_a - lag(pos_a) OVER w > {w} THEN 1 ELSE 0 END AS brk
           FROM ver WINDOW w AS (PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a)),
    grp AS (SELECT *, sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS grp
            FROM ch)
    SELECT doc_a, doc_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
           max(pos_a) - min(pos_a) + {k} AS length
    FROM grp GROUP BY doc_a, doc_b, diag, grp
    HAVING max(pos_a) - min(pos_a) + {k} >= {min_len}
    """
        ).fetchall()
    }
    assert len(want) > 0  # testdata's near-dup docs share verbatim runs
    assert got == want


def test_window_must_not_exceed_k(spark):
    with pytest.raises(ValueError, match="window"):
        SS.repeated_span_pairs(_planted(spark), "doc_id", "text", k=10, window=11)


def test_governor_drops_boilerplate_fingerprints(spark):
    boiler = (
        "Standard legal disclaimer text that appears at the bottom of every "
        "single document in this synthetic corpus for testing purposes."
    )
    d = spark.createDataFrame(
        [(i, f"Document body number {i} with its own words. " + boiler) for i in range(8)],
        "doc_id long, text string",
    )
    ungoverned = SS.repeated_span_pairs(d, "doc_id", "text", min_len=50)
    governed = SS.repeated_span_pairs(d, "doc_id", "text", min_len=50, max_hash_freq=4)
    assert ungoverned.count() == 28  # C(8,2): boilerplate pairs everywhere
    assert governed.count() == 0  # corpus-wide fingerprints dropped pre-join


def test_masking_cuts_exactly_and_passes_untouched_docs(spark):
    d = _planted(spark)
    spans = SS.repeated_span_pairs(d, "doc_id", "text", min_len=50)
    m = {r.doc_id: r for r in SS.mask_repeated_spans(d, spans, "doc_id", "text").collect()}
    span = spans.collect()[0]
    # keeper (lowest doc) and untouched doc pass through verbatim
    assert m[1].masked_text == m[1].text
    assert m[3].masked_text == m[3].text
    # victim: the span is cut, everything else preserved in order
    t2 = m[2].text
    expect = t2[: span.start_b - 1] + t2[span.start_b - 1 + span.length :]
    assert m[2].masked_text == expect
    assert len(m[2].masked_text) == len(t2) - span.length


def test_masking_merges_overlapping_spans_and_is_codepoint_exact(spark):
    text = "héllo wörld " + "X" * 0 + "abcdefghij"
    d = spark.createDataFrame([(7, text)], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 7, 1, 3, 6), (1, 7, 1, 6, 5)],  # [3,9) and [6,11) overlap → [3,11)
        "doc_a long, doc_b long, start_a int, start_b int, length int",
    )
    got = SS.mask_repeated_spans(d, spans, "doc_id", "text").collect()[0].masked_text
    assert got == text[:2] + text[10:]  # codepoints 3..10 removed


def test_short_and_empty_docs_yield_nothing(spark):
    d = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, None)], "doc_id long, text string"
    )
    assert SS.repeated_span_pairs(d, "doc_id", "text").count() == 0
    assert SS.repeated_span_pairs(d.limit(0), "doc_id", "text").count() == 0


def test_maplocal_winnowing_matches_relational_form_and_never_shuffles(
    spark, sf_dir,
):
    """The production selection (winnowed_fingerprints: per-doc
    arrays, one projection) must be value-identical to the
    oracle-spelled window-function form AND shuffle-free — the
    |chars|-row per-position relation must never cross an Exchange
    (r12 review: the window form hash-partitions it on doc)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    k, w = 25, 12
    fast = SS.winnowed_fingerprints(d, "doc_id", "text", k, w)
    slow = SS.winnow(SS.kgram_hashes(d, "doc_id", "text", k), w)
    assert {tuple(r) for r in fast.collect()} == {tuple(r) for r in slow.collect()}
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_mask_quotes_identifiers_and_preserves_caller_columns(spark):
    """r12 review: the mask SQL must route the text column through
    quote_ident (awkward names parse, no injection), use reserved
    __mask_* working names, and never drop caller data columns."""
    d = spark.createDataFrame(
        [(7, "abcdefghijklmnop", "keep-me")],
        ["doc_id", "the text", "doc"],  # awkward text name + a 'doc' data column
    )
    spans = spark.createDataFrame(
        [(1, 7, 1, 3, 6)], "doc_a long, doc_b long, start_a long, start_b long, length long",
    )  # long-typed offsets: must cast, not crash
    out = SS.mask_repeated_spans(d, spans, "doc_id", "the text").collect()[0]
    assert out.masked_text == "ab" + "ijklmnop"
    assert out["doc"] == "keep-me"  # caller's 'doc' column survives


def test_mask_conflicts_detects_overlapping_keeper_cuts(spark):
    # doc 2 keeps Q for pair (2,3) but loses an overlapping region as
    # the victim of pair (1,2): the one-copy guarantee can fail
    spans = spark.createDataFrame(
        [(1, 2, 5, 10, 20), (2, 3, 25, 40, 20)],
        "doc_a long, doc_b long, start_a long, start_b long, length long",
    )
    conf = SS.mask_conflicts(spans).collect()
    assert len(conf) == 1 and conf[0].doc == 2
    # disjoint regions in the shared doc: no conflict
    spans_ok = spark.createDataFrame(
        [(1, 2, 5, 10, 20), (2, 3, 31, 40, 20)],
        "doc_a long, doc_b long, start_a long, start_b long, length long",
    )
    assert SS.mask_conflicts(spans_ok).count() == 0


def test_within_doc_repeats_reported_when_asked(spark):
    body = "An internally repeated passage that is long enough for detection here."
    d = spark.createDataFrame(
        [(1, body + " middle filler words between copies. " + body)],
        "doc_id long, text string",
    )
    off = SS.repeated_span_pairs(d, "doc_id", "text", min_len=50)
    assert off.count() == 0  # cross-doc only by default
    on = SS.repeated_span_pairs(
        d, "doc_id", "text", min_len=50, include_within_doc=True
    ).collect()
    assert len(on) == 1
    r = on[0]
    assert r.doc_a == r.doc_b == 1 and r.start_a < r.start_b
    t = d.collect()[0].text
    assert (
        t[r.start_a - 1 : r.start_a - 1 + r.length]
        == t[r.start_b - 1 : r.start_b - 1 + r.length]
    )


def test_masking_converges_under_redetection(spark):
    """The end-to-end dedup property: after cutting detected spans,
    re-running detection on the masked corpus finds nothing at the
    same min_len (only sub-threshold residue can remain)."""
    d = _planted(spark)
    spans = SS.repeated_span_pairs(d, "doc_id", "text", min_len=50)
    masked = SS.mask_repeated_spans(d, spans, "doc_id", "text").select(
        "doc_id", F.col("masked_text").alias("text")
    )
    assert SS.repeated_span_pairs(masked, "doc_id", "text", min_len=50).count() == 0
