"""Model-based text classification + DSIR selection.

The NB fit/score closed form and the DSIR likelihood-ratio weights
must be reproducible bit-for-bit (md5 base hash) in DuckDB — the
same oracle discipline as the dedup ladder — and the plans must have
the broadcast-model shape the module docstring claims (nothing
corpus-sized beyond the (doc, bucket) feature relation shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    textclass as TC,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table

B = 512  # small bucket space: forces hash collisions, exercising the trick

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_NTOKS = f"list_filter(regexp_split_to_array({_NORM}, '\\s+'), x -> x <> '')"


def _gram_sql(n: int) -> str:
    """DuckDB spelling of word_shingles(text, n) with duplicates kept
    (the classifier keeps multinomial counts; the miners distinct)."""
    if n == 1:
        body = "toks"
    else:
        body = (
            f"list_transform(range(1, len(toks) - {n - 2}), "
            f"i -> array_to_string(toks[i:i+{n - 1}], ' '))"
        )
    return (
        f"CASE WHEN len(toks) >= {n} THEN {body} "
        f"ELSE [array_to_string(toks, ' ')] END"
    )


def _feat_sql(n: int, where: str, extra_cols: str = "") -> str:
    """(doc_id[, extra], bucket, tf) hashed-ngram features. The
    coalesce mirrors the engine's null-text contract: the whole-text
    fallback gram of NULL text normalizes to ''."""
    return f"""
    t AS (SELECT doc_id{extra_cols}, {_NTOKS} AS toks FROM documents {where}),
    g AS (SELECT doc_id{extra_cols}, unnest({_gram_sql(n)}) AS g FROM t),
    f AS (SELECT doc_id{extra_cols},
                 ('0x' || substr(md5(coalesce(g, '')), 1, 15))::BIGINT % {B} AS bucket,
                 count(*) AS tf
          FROM g GROUP BY ALL)
    """


def test_hashed_features_match_duckdb(spark, sf_dir, duck):
    d = load_table(spark, sf_dir, "documents")
    got = {
        (r.doc, r.bucket, r.tf)
        for r in TC.hashed_ngram_features(
            d, "doc_id", "text", num_buckets=B, n=2, base_hash="md5"
        ).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"WITH {_feat_sql(2, '')} SELECT doc_id, bucket, tf FROM f"
        ).fetchall()
    }
    assert len(want) > 0
    assert got == want


def test_nb_classifier_matches_duckdb_end_to_end(spark, sf_dir, duck):
    """Fit on even doc_ids (lang labels), classify odd doc_ids: the
    full closed form — counts, Laplace smoothing, priors, unseen
    substitution, argmax with the (score desc, label asc) tiebreak —
    replayed in SQL."""
    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    cond, stats = TC.fit_nb_classifier(
        train, "doc_id", "text", "lang", num_buckets=B, n=1, base_hash="md5"
    )
    got = {
        (r.doc, r.label)
        for r in TC.nb_classify(
            test, cond, stats, "doc_id", "text", num_buckets=B, n=1, base_hash="md5"
        ).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
    WITH {_feat_sql(1, "WHERE doc_id % 2 = 0", ", lang")},
    totals AS (SELECT lang, sum(tf) AS n_tok_total FROM f GROUP BY lang),
    stats AS (
      SELECT lang, count(*) AS n_docs
      FROM (SELECT DISTINCT doc_id, lang FROM t) GROUP BY lang
    ),
    n_all AS (SELECT count(*) AS n FROM documents WHERE doc_id % 2 = 0),
    priors AS (
      SELECT s.lang,
             ln(s.n_docs * 1.0 / (SELECT n FROM n_all)) AS log_prior,
             ln(1.0 / (tt.n_tok_total + {B})) AS log_unseen
      FROM stats s JOIN totals tt USING (lang)
    ),
    condl AS (
      SELECT f.lang, f.bucket,
             ln((sum(f.tf) + 1.0) / (any_value(tt.n_tok_total) + {B})) AS log_cond
      FROM f JOIN totals tt USING (lang) GROUP BY f.lang, f.bucket
    ),
    te AS (SELECT doc_id, {_NTOKS} AS toks FROM documents WHERE doc_id % 2 = 1),
    te_g AS (SELECT doc_id, unnest({_gram_sql(1)}) AS g FROM te),
    te_f AS (SELECT doc_id,
                    ('0x' || substr(md5(g), 1, 15))::BIGINT % {B} AS bucket,
                    count(*) AS tf
             FROM te_g GROUP BY ALL),
    scored AS (
      SELECT d.doc_id, p.lang,
             p.log_prior + sum(d.tf * coalesce(c.log_cond, p.log_unseen)) AS s
      FROM te_f d CROSS JOIN priors p
      LEFT JOIN condl c ON c.lang = p.lang AND c.bucket = d.bucket
      GROUP BY d.doc_id, p.lang, p.log_prior
    ),
    best AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang ASC) AS rn
      FROM scored
    )
    SELECT doc_id, lang FROM best WHERE rn = 1
    """
        ).fetchall()
    }
    assert len(want) > 0
    assert got == want


def _two_vocab_corpus(spark, n_per_class: int = 40):
    """Deterministic two-vocabulary corpus (the testdata's documents
    share ONE 30-token vocabulary across langs — its lang column is
    metadata, not learnable from text — so learnability tests need
    their own separable fixture)."""
    va = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vb = ["zeta", "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(n_per_class):
        rows.append((i, " ".join(va[(i + j) % 5] for j in range(12)), "good"))
        rows.append(
            (1000 + i, " ".join(vb[(i + 2 * j) % 5] for j in range(12)), "bad")
        )
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_recovers_separable_classes(spark):
    """Quality sanity, not parity: on a corpus whose classes use
    disjoint vocabularies, held-out classification must be perfect
    (the model-based-filter use case: route docs by a learned
    class)."""
    d = _two_vocab_corpus(spark)
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    cond, stats = TC.fit_nb_classifier(train, "doc_id", "text", "lang", num_buckets=B)
    pred = TC.nb_classify(test, cond, stats, "doc_id", "text", num_buckets=B)
    hit = (
        pred.join(
            d.select(F.col("doc_id").alias("doc"), F.col("lang").alias("truth")),
            "doc",
        )
        .select(F.avg((F.col("label") == F.col("truth")).cast("double")).alias("acc"))
        .first()
        .acc
    )
    assert hit == 1.0, f"held-out accuracy {hit} on disjoint vocabularies"


def test_nb_degenerate_text_contract(spark):
    """Empty and whitespace-only docs get the whole-text fallback
    feature ('' — same as the shingle miners) and still classify to
    exactly one deterministic label; a doc set with every label tied
    breaks to the lexically first label."""
    train = spark.createDataFrame(
        [(1, "aa bb cc", "x"), (2, "dd ee ff", "y")],
        "doc_id long, text string, lang string",
    )
    cond, stats = TC.fit_nb_classifier(train, "doc_id", "text", "lang", num_buckets=B)
    probe = spark.createDataFrame(
        [(10, ""), (11, "   "), (12, "zz qq")], "doc_id long, text string"
    )
    got = {r.doc: r.label for r in TC.nb_classify(
        probe, cond, stats, "doc_id", "text", num_buckets=B
    ).collect()}
    assert set(got) == {10, 11, 12}
    # all-unseen docs tie on priors (1 doc each) + unseen mass; the
    # deterministic tiebreak picks the lexically first label unless
    # the labels' unseen rates differ (equal-length corpora: equal)
    assert got[12] == "x"


def test_nb_knob_validation(spark):
    d = spark.createDataFrame([(1, "a", "x")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="num_buckets"):
        TC.hashed_ngram_features(d, "doc_id", "text", num_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        TC.fit_nb_classifier(d, "doc_id", "text", "lang", alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        TC.dsir_log_ratios(d, d, "text", alpha=-1.0)


def test_dsir_weights_match_duckdb(spark, sf_dir, duck):
    """Full DSIR weight pipeline — bigram features, smoothed target/
    raw distributions, per-doc log-likelihood-ratio sum — replayed in
    SQL bit-for-bit up to 1e-6 rounding."""
    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    got = {
        (r.doc, round(r.log_weight, 6), r.n_feat)
        for r in TC.dsir_importance_weights(
            d, target, "doc_id", "text", num_buckets=B, n=2, base_hash="md5"
        ).collect()
    }
    want = {
        (r[0], round(r[1], 6), r[2])
        for r in duck.execute(
            f"""
    WITH {_feat_sql(2, '', ', lang')},
    tdist AS (SELECT bucket, sum(tf) AS n_t FROM f WHERE lang = 'en' GROUP BY bucket),
    rdist AS (SELECT bucket, sum(tf) AS n_r FROM f GROUP BY bucket),
    j AS (SELECT r.bucket, coalesce(t.n_t, 0) AS n_t, r.n_r
          FROM rdist r LEFT JOIN tdist t USING (bucket)),
    tot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM j),
    ratios AS (
      SELECT bucket,
             ln((n_t + 1.0) / (tot.tot_t + {B})) - ln((n_r + 1.0) / (tot.tot_r + {B}))
               AS log_ratio
      FROM j CROSS JOIN tot
    )
    SELECT f.doc_id, sum(f.tf * r.log_ratio) AS log_weight, sum(f.tf) AS n_feat
    FROM f JOIN ratios r USING (bucket)
    GROUP BY f.doc_id
    """
        ).fetchall()
    }
    assert len(want) > 0
    assert got == want


def test_dsir_weights_separate_target_domain(spark):
    """The point of the weights: docs from the target domain's
    vocabulary must out-weigh out-of-domain docs (per-token, so
    length cancels)."""
    d = _two_vocab_corpus(spark)
    target = d.filter(F.col("lang") == "good")
    w = TC.dsir_importance_weights(d, target, "doc_id", "text", num_buckets=B)
    by_class = {
        r.lang: r.m
        for r in w.join(
            d.select(F.col("doc_id").alias("doc"), "lang"), "doc"
        )
        .groupBy("lang")
        .agg(F.avg(F.col("log_weight") / F.col("n_feat")).alias("m"))
        .collect()
    }
    assert by_class["good"] > by_class["bad"]
    # and the selection actually prefers them: at k = class size,
    # the Gumbel-top-k should be dominated by target-domain docs
    sel = TC.dsir_select(d, target, "doc_id", "text", 40, seed="s", num_buckets=B)
    picked = {r.doc for r in sel.collect()}
    n_good = len([i for i in picked if i < 1000])
    assert n_good > 30, f"only {n_good}/40 selected docs are target-domain"


def test_dsir_select_is_seeded_gumbel_topk_and_sql_replayable(spark, sf_dir, duck):
    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    got = [
        (r.doc, r.sample_rank)
        for r in TC.dsir_select(
            d, target, "doc_id", "text", 25, seed="r13",
            num_buckets=B, n=2, base_hash="md5",
        )
        .orderBy("sample_rank")
        .collect()
    ]
    want = duck.execute(
        f"""
    WITH {_feat_sql(2, '', ', lang')},
    tdist AS (SELECT bucket, sum(tf) AS n_t FROM f WHERE lang = 'en' GROUP BY bucket),
    rdist AS (SELECT bucket, sum(tf) AS n_r FROM f GROUP BY bucket),
    j AS (SELECT r.bucket, coalesce(t.n_t, 0) AS n_t, r.n_r
          FROM rdist r LEFT JOIN tdist t USING (bucket)),
    tot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM j),
    ratios AS (
      SELECT bucket,
             ln((n_t + 1.0) / (tot.tot_t + {B})) - ln((n_r + 1.0) / (tot.tot_r + {B}))
               AS log_ratio
      FROM j CROSS JOIN tot
    ),
    w AS (SELECT f.doc_id, sum(f.tf * r.log_ratio) AS lw
          FROM f JOIN ratios r USING (bucket) GROUP BY f.doc_id),
    keyed AS (
      SELECT doc_id,
             lw - ln(-ln((('0x' || substr(md5('r13' || doc_id::VARCHAR), 1, 8))::BIGINT
                          + 0.5) / 4294967296.0)) AS key
      FROM w
    )
    SELECT doc_id, row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rank
    FROM keyed ORDER BY key DESC, doc_id ASC LIMIT 25
    """
    ).fetchall()
    assert got == [tuple(r) for r in want]
    # a different seed redraws
    other = {
        r.doc
        for r in TC.dsir_select(
            d, target, "doc_id", "text", 25, seed="other",
            num_buckets=B, n=2, base_hash="md5",
        ).collect()
    }
    assert other != {doc for doc, _ in got}


def test_plan_shapes(spark, sf_dir):
    """The scale claims, plan-asserted: classification joins the
    model by BROADCAST (no shuffle of the bounded tables against the
    corpus), selection is a distributed top-k
    (TakeOrderedAndProject), and no plan contains a CartesianProduct
    (the label cross join is broadcast-nested-loop over ≤n_labels
    rows)."""
    d = load_table(spark, sf_dir, "documents")
    cond, stats = TC.fit_nb_classifier(d, "doc_id", "text", "lang", num_buckets=B)
    pred = TC.nb_classify(d, cond, stats, "doc_id", "text", num_buckets=B)
    plan = pred._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    sel = TC.dsir_select(d, d.filter(F.col("lang") == "en"), "doc_id", "text", 10)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan
    assert "CartesianProduct" not in splan


# ---- Stupid Backoff bigram LM perplexity ----------------------------------


def test_lm_perplexity_matches_duckdb(spark, sf_dir, duck):
    """Full Stupid Backoff pipeline — hashed unigram/bigram counts on
    the even-id reference, per-transition backoff scoring of odd-id
    docs — replayed in SQL (md5 buckets) to 1e-6 rounding."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    uni, bi, n_tok = TC.fit_bigram_lm(
        ref, "doc_id", "text", num_buckets=B, base_hash="md5"
    )
    got = {
        (r.doc, r.n_transitions, r.avg_logprob, r.ppl)
        for r in TC.lm_score_docs(
            test, uni, bi, n_tok, "doc_id", "text", num_buckets=B, base_hash="md5"
        ).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
    WITH ref AS (SELECT doc_id, {_NTOKS} AS toks FROM documents WHERE doc_id % 2 = 0),
    ref_uni AS (
      SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT % {B} AS bucket, count(*) AS c
      FROM (SELECT unnest(toks) AS w FROM ref) GROUP BY 1
    ),
    ref_tr AS (
      SELECT toks[i] AS prev, toks[i+1] AS w
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM ref)
    ),
    ref_bi AS (
      SELECT ('0x' || substr(md5(prev || ' ' || w), 1, 15))::BIGINT % {B} AS bucket,
             count(*) AS c
      FROM ref_tr GROUP BY 1
    ),
    n_tok AS (SELECT sum(len(toks)) AS n FROM ref),
    te AS (SELECT doc_id, {_NTOKS} AS toks FROM documents WHERE doc_id % 2 = 1),
    te_tr AS (
      SELECT doc_id, toks[i] AS prev, toks[i+1] AS w
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM te)
    ),
    scored AS (
      SELECT t.doc_id,
             CASE WHEN b.c IS NOT NULL AND p.c IS NOT NULL
                  THEN ln(b.c * 1.0 / p.c)
                  ELSE ln(0.4 * (coalesce(u.c, 0) + 1.0)
                          / ((SELECT n FROM n_tok) + {B}))
             END AS lp
      FROM te_tr t
      LEFT JOIN ref_bi b
        ON b.bucket = ('0x' || substr(md5(t.prev || ' ' || t.w), 1, 15))::BIGINT % {B}
      LEFT JOIN ref_uni p
        ON p.bucket = ('0x' || substr(md5(t.prev), 1, 15))::BIGINT % {B}
      LEFT JOIN ref_uni u
        ON u.bucket = ('0x' || substr(md5(t.w), 1, 15))::BIGINT % {B}
    )
    SELECT doc_id, count(*) AS n_transitions,
           round(avg(lp), 6) AS avg_logprob,
           round(exp(-avg(lp)), 6) AS ppl
    FROM scored GROUP BY doc_id
    """
        ).fetchall()
    }
    assert len(want) > 0
    assert got == want


def test_lm_ppl_separates_in_domain_from_out_of_domain(spark):
    """The filter's point: docs over the reference vocabulary (with
    its transition structure) must score lower perplexity than docs
    from a disjoint vocabulary — and the OOV leg stays finite (the
    Laplace-floored backoff), so garbage RANKS instead of NaN-ing."""
    d = _two_vocab_corpus(spark)
    ref = d.filter(F.col("lang") == "good")
    uni, bi, n_tok = TC.fit_bigram_lm(ref, "doc_id", "text", num_buckets=B)
    scored = TC.lm_score_docs(d, uni, bi, n_tok, "doc_id", "text", num_buckets=B)
    by_class = {
        r.lang: r.m
        for r in scored.join(
            d.select(F.col("doc_id").alias("doc"), "lang"), "doc"
        )
        .groupBy("lang")
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    assert by_class["good"] < by_class["bad"]
    import math

    assert all(
        math.isfinite(r.ppl) for r in scored.collect()
    ), "OOV docs must score finite perplexity"


def test_lm_short_doc_contract_and_plan_shape(spark):
    """Docs with <2 tokens emit NO row (no transitions — unigram
    scoring owns them, doc_unigram_logprob); the scoring plan joins
    the bounded count tables by BROADCAST only."""
    ref = spark.createDataFrame(
        [(1, "aa bb cc aa bb")], "doc_id long, text string"
    )
    uni, bi, n_tok = TC.fit_bigram_lm(ref, "doc_id", "text", num_buckets=B)
    probe = spark.createDataFrame(
        [(10, "aa bb aa"), (11, "single"), (12, ""), (13, None)],
        "doc_id long, text string",
    )
    scored = TC.lm_score_docs(probe, uni, bi, n_tok, "doc_id", "text", num_buckets=B)
    rows = {r.doc: r for r in scored.collect()}
    assert set(rows) == {10}
    assert rows[10].n_transitions == 2
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError, match="num_buckets"):
        TC.fit_bigram_lm(ref, "doc_id", "text", num_buckets=-1)


def test_dsir_target_equals_raw_gives_exactly_zero_weights(spark):
    """Exactness pin: with target == raw, every bucket has n_t == n_r
    and tot_t == tot_r, so log_ratio is EXACTLY 0.0 (identical ln
    arguments, not approximately-cancelled FP) and every doc's
    log_weight is exactly 0.0 — selection degrades to the pure
    Gumbel draw (uniform sampling), the documented DSIR limit."""
    d = _two_vocab_corpus(spark, n_per_class=10)
    w = TC.dsir_importance_weights(d, d, "doc_id", "text", num_buckets=B)
    vals = {r.log_weight for r in w.collect()}
    assert vals == {0.0}


def test_nb_emits_exactly_one_row_per_doc_and_finite_scores(spark):
    """Totality pin: every input doc (including empty/null text via
    the whole-text fallback feature) classifies to exactly one row
    with a finite score — a filter that silently drops or NaNs rows
    corrupts the corpus it routes."""
    import math

    train = spark.createDataFrame(
        [(1, "aa bb cc", "x"), (2, "dd ee ff", "y")],
        "doc_id long, text string, lang string",
    )
    cond, stats = TC.fit_nb_classifier(train, "doc_id", "text", "lang", num_buckets=B)
    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate([None, "", " ", "aa", "zz yy xx ww", "aa dd"])],
        "doc_id long, text string",
    )
    rows = TC.nb_classify(
        probe, cond, stats, "doc_id", "text", num_buckets=B, keep_scores=True
    ).collect()
    assert sorted(r.doc for r in rows) == list(range(6))
    assert all(math.isfinite(r.log_score) for r in rows)


def test_priors_immune_to_duplicate_seed_rows(spark):
    """r13 self-review regression: a labeled seed with DUPLICATE rows
    must produce the same priors/model as its deduplicated form — the
    priors denominator counts distinct (doc, label) pairs, not raw
    rows (raw count() inflated the denominator and skewed every
    prior)."""
    base = [(1, "aa bb cc", "x"), (2, "dd ee ff", "y"), (3, "aa bb dd", "x")]
    clean = spark.createDataFrame(base, "doc_id long, text string, lang string")
    dirty = spark.createDataFrame(base + base, "doc_id long, text string, lang string")
    cond_c, stats_c = TC.fit_nb_classifier(clean, "doc_id", "text", "lang", num_buckets=B)
    cond_d, stats_d = TC.fit_nb_classifier(dirty, "doc_id", "text", "lang", num_buckets=B)
    pc = {r.label: round(r.log_prior, 9) for r in stats_c.collect()}
    pd_ = {r.label: round(r.log_prior, 9) for r in stats_d.collect()}
    assert pc == pd_
    import math

    assert pc["x"] == round(math.log(2 / 3), 9)
    # ... and the CONDITIONAL model too (r13 review: featurizing raw
    # rows double-counted the duplicated doc's tokens into n_tok/
    # log_cond even with the priors denominator fixed)
    mc = {(r.label, r.bucket): r.n_tok for r in cond_c.collect()}
    md = {(r.label, r.bucket): r.n_tok for r in cond_d.collect()}
    assert mc == md


def test_featurization_is_total_and_hash_agnostic_on_null_text(spark):
    """r13 self-review regression: a null-text doc's fallback gram
    was NULL, which xxhash64 buckets (seed constant) but md5 drops —
    the doc silently vanished from weights under the ORACLE hash
    only. Pinned contract: null ≡ empty text ('' gram) under BOTH
    hashes; featurization (and therefore DSIR weighting and NB
    classification) is total over raw docs."""
    d = spark.createDataFrame(
        [(1, "aa bb cc"), (2, None), (3, "")], "doc_id long, text string"
    )
    for bh in ("xxhash64", "md5"):
        f = TC.hashed_ngram_features(d, "doc_id", "text", num_buckets=B, n=2, base_hash=bh)
        rows = {r.doc: (r.bucket, r.tf) for r in f.collect()}
        assert set(rows) == {1, 2, 3}, bh
        assert rows[2] == rows[3], f"null and empty text must featurize alike ({bh})"
        w = TC.dsir_importance_weights(
            d, d.filter("doc_id = 1"), "doc_id", "text", num_buckets=B, base_hash=bh
        )
        assert {r.doc for r in w.collect()} == {1, 2, 3}, bh


def test_nb_id_collision_raises(spark):
    """Seed contract (ADVICE r14): exact duplicate rows collapse
    (same model as the deduplicated seed), but an id carried by
    conflicting rows — two labels, or two texts under one label —
    must raise instead of silently pouring one doc's token mass into
    multiple model cells."""
    dup_ok = spark.createDataFrame(
        [(1, "aa bb", "x"), (1, "aa bb", "x"), (2, "cc dd", "y")],
        "doc_id long, text string, lang string",
    )
    cond, stats = TC.fit_nb_classifier(dup_ok, "doc_id", "text", "lang", num_buckets=B)
    assert {r.label: r.n_docs for r in stats.collect()} == {"x": 1, "y": 1}

    for bad_rows in (
        [(1, "aa bb", "x"), (1, "aa bb", "y")],      # conflicting labels
        [(1, "aa bb", "x"), (1, "aa bb cc", "x")],   # conflicting texts
    ):
        bad = spark.createDataFrame(
            bad_rows + [(2, "cc dd", "y")],
            "doc_id long, text string, lang string",
        )
        with pytest.raises(ValueError, match="conflicting"):
            TC.fit_nb_classifier(bad, "doc_id", "text", "lang", num_buckets=B)
