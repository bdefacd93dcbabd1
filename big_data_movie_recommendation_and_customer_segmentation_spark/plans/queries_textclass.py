"""r14 registrations: the model-based filtering / targeted-selection
tier under the driver's value gate (VERDICT r13 asks #1/#5 — unfreeze
174→178 sanctioned: the three r13 textclass operators plus the LM
gate's admission twin riding the same unfreeze).

All four queries run the REAL operators (``operators/textclass.py``)
with ``base_hash='md5'`` and a small bucket space (B=512 — forces
hash collisions, exercising the trick) so the whole closed form —
hashed features, Laplace smoothing, priors/unseen mass, likelihood
ratios, Gumbel keys, Stupid Backoff — is recomputable in DuckDB SQL.
The oracle spellings were proven bit-for-bit in
``tests/test_textclass.py::test_nb_classifier_matches_duckdb_end_to_end``,
``::test_dsir_select_is_seeded_gumbel_topk_and_sql_replayable`` and
``::test_lm_perplexity_matches_duckdb`` before registration (the
r12→r13→r14 promotion discipline).

``lm_gate_admissions`` is the streaming LM quality gate's batch twin:
it routes through the SAME shared operator the stream's
``foreachBatch`` body calls (``textclass.lm_admission_routing``), the
way ``index_screen_admissions`` twins the near-dedup gate — the
admit / high_ppl / too_short contract gets a driver-checked value row
instead of only engine tests. The probe blanks every
``doc_id % 10 = 5`` text (the documents table has no <2-token docs at
any SF) so all three routes carry rows at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textclass as TC
from ..sources import load_table
from .queries import query
from .queries_ext import _NTOKS

_B = 512  # small bucket space: collisions exercised, tables tiny
_MAX_PPL = 12.8  # splits the odd-doc ppl distribution at every SF
_DSIR_K = 25
_DSIR_SEED = "r14"

_KNOBS = dict(num_buckets=_B, base_hash="md5")


def _gram_sql(n: int) -> str:
    """DuckDB spelling of word_shingles(text, n), duplicates kept
    (multinomial counts — the miners distinct)."""
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
    """(doc_id[, extra], bucket, tf) hashed-ngram features; the
    coalesce mirrors the engine's null-text contract."""
    return f"""
    t AS (SELECT doc_id{extra_cols}, {_NTOKS} AS toks FROM documents {where}),
    g AS (SELECT doc_id{extra_cols}, unnest({_gram_sql(n)}) AS g FROM t),
    f AS (SELECT doc_id{extra_cols},
                 ('0x' || substr(md5(coalesce(g, '')), 1, 15))::BIGINT % {_B} AS bucket,
                 count(*) AS tf
          FROM g GROUP BY ALL)
    """


# Shared DSIR ratio CTEs: target = lang='en', raw = all documents,
# hashed-bigram features (n=2), Laplace alpha=1.
_DSIR_CTES = f"""
    {_feat_sql(2, '', ', lang')},
    tdist AS (SELECT bucket, sum(tf) AS n_t FROM f WHERE lang = 'en' GROUP BY bucket),
    rdist AS (SELECT bucket, sum(tf) AS n_r FROM f GROUP BY bucket),
    j AS (SELECT r.bucket, coalesce(t.n_t, 0) AS n_t, r.n_r
          FROM rdist r LEFT JOIN tdist t USING (bucket)),
    tot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM j),
    ratios AS (
      SELECT bucket,
             ln((n_t + 1.0) / (tot.tot_t + {_B})) - ln((n_r + 1.0) / (tot.tot_r + {_B}))
               AS log_ratio
      FROM j CROSS JOIN tot
    ),
    w AS (SELECT f.doc_id, sum(f.tf * r.log_ratio) AS lw, sum(f.tf) AS n_feat
          FROM f JOIN ratios r USING (bucket) GROUP BY f.doc_id)"""


# Shared Stupid Backoff CTEs: model fit on even doc_ids; `probe`
# must be defined by the enclosing query (the scoring input).
_LM_MODEL_CTES = f"""
    ref AS (SELECT doc_id, {_NTOKS} AS toks FROM documents WHERE doc_id % 2 = 0),
    ref_uni AS (
      SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT % {_B} AS bucket, count(*) AS c
      FROM (SELECT unnest(toks) AS w FROM ref) GROUP BY 1
    ),
    ref_tr AS (
      SELECT toks[i] AS prev, toks[i+1] AS w
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM ref)
    ),
    ref_bi AS (
      SELECT ('0x' || substr(md5(prev || ' ' || w), 1, 15))::BIGINT % {_B} AS bucket,
             count(*) AS c
      FROM ref_tr GROUP BY 1
    ),
    n_tok AS (SELECT sum(len(toks)) AS n FROM ref),
    te_tr AS (
      SELECT doc_id, toks[i] AS prev, toks[i+1] AS w
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM probe)
    ),
    trans_scored AS (
      SELECT t.doc_id,
             CASE WHEN b.c IS NOT NULL AND p.c IS NOT NULL
                  THEN ln(b.c * 1.0 / p.c)
                  ELSE ln(0.4 * (coalesce(u.c, 0) + 1.0)
                          / ((SELECT n FROM n_tok) + {_B}))
             END AS lp
      FROM te_tr t
      LEFT JOIN ref_bi b
        ON b.bucket = ('0x' || substr(md5(t.prev || ' ' || t.w), 1, 15))::BIGINT % {_B}
      LEFT JOIN ref_uni p
        ON p.bucket = ('0x' || substr(md5(t.prev), 1, 15))::BIGINT % {_B}
      LEFT JOIN ref_uni u
        ON u.bucket = ('0x' || substr(md5(t.w), 1, 15))::BIGINT % {_B}
    ),
    doc_scored AS (
      SELECT doc_id AS doc, count(*) AS n_transitions,
             round(avg(lp), 6) AS avg_logprob,
             round(exp(-avg(lp)), 6) AS ppl
      FROM trans_scored GROUP BY doc_id
    )"""


@query(
    "nb_lang_classification",
    oracle=f"""
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
             ln(1.0 / (tt.n_tok_total + {_B})) AS log_unseen
      FROM stats s JOIN totals tt USING (lang)
    ),
    condl AS (
      SELECT f.lang, f.bucket,
             ln((sum(f.tf) + 1.0) / (any_value(tt.n_tok_total) + {_B})) AS log_cond
      FROM f JOIN totals tt USING (lang) GROUP BY f.lang, f.bucket
    ),
    te AS (SELECT doc_id, {_NTOKS} AS toks FROM documents WHERE doc_id % 2 = 1),
    te_g AS (SELECT doc_id, unnest({_gram_sql(1)}) AS g FROM te),
    te_f AS (SELECT doc_id,
                    ('0x' || substr(md5(g), 1, 15))::BIGINT % {_B} AS bucket,
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
    SELECT doc_id AS doc, lang AS label FROM best WHERE rn = 1
    """,
)
def nb_lang_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-unigram Naive Bayes language id — the fasttext/CCNet
    model-based filter stage (``textclass.fit_nb_classifier`` +
    ``nb_classify``, operators/textclass.py): fit on the even-id half
    of documents (lang labels), classify the odd-id half. Closed-form
    fit = two aggregations over the bounded (≤ labels × B) feature
    relation; scoring = broadcast model join + one doc-keyed sum +
    per-doc argmax window with the deterministic (score desc, label
    asc) tiebreak. No driver vocabulary at any corpus size (feature
    hashing), which is what makes the stage 100 TB-shaped."""
    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    cond, stats = TC.fit_nb_classifier(
        train, "doc_id", "text", "lang", n=1, **_KNOBS
    )
    return TC.nb_classify(test, cond, stats, "doc_id", "text", n=1, **_KNOBS)


@query(
    "dsir_selected_docs",
    oracle=f"""
    WITH {_DSIR_CTES},
    keyed AS (
      SELECT doc_id, lw, n_feat,
             lw - ln(-ln((('0x' || substr(md5('{_DSIR_SEED}' || doc_id::VARCHAR), 1, 8))::BIGINT
                          + 0.5) / 4294967296.0)) AS key
      FROM w
    )
    SELECT doc_id AS doc, round(lw, 6) AS log_weight, n_feat::BIGINT AS n_feat,
           row_number() OVER (ORDER BY key DESC, doc_id ASC) AS sample_rank
    FROM keyed ORDER BY key DESC, doc_id ASC LIMIT {_DSIR_K}
    """,
)
def dsir_selected_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR targeted selection (Xie et al. 2023;
    ``textclass.dsir_select``): weight every document by the hashed-
    bigram log-likelihood ratio of the en-language target slice vs
    the whole corpus, then draw k=25 without replacement ∝
    exp(weight) via seeded Gumbel-top-k. Ratio tables bounded at B
    and broadcast; the draw is a distributed top-k
    (TakeOrderedAndProject) over per-doc md5-derived keys — seeded,
    reproducible, SQL-replayable, never a global sort."""
    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    return TC.dsir_select(
        d, target, "doc_id", "text", _DSIR_K, seed=_DSIR_SEED, n=2, **_KNOBS
    ).select(
        "doc",
        F.round("log_weight", 6).alias("log_weight"),
        "n_feat",
        "sample_rank",
    )


@query(
    "doc_lm_perplexity",
    oracle=f"""
    WITH probe AS (SELECT doc_id, {_NTOKS} AS toks FROM documents WHERE doc_id % 2 = 1),
    {_LM_MODEL_CTES}
    SELECT doc, n_transitions, avg_logprob, ppl FROM doc_scored
    """,
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff bigram-LM perplexity (Brants et al. 2007;
    ``textclass.fit_bigram_lm`` + ``lm_score_docs``) — the CCNet
    fluency filter: fit hashed count tables (bounded at B) on the
    even-id half, score the odd-id half. Scoring = one transition
    explode + three broadcast joins + one doc-keyed aggregate; the
    corpus never shuffles wider than its own transition relation."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    uni, bi, n_tok = TC.fit_bigram_lm(ref, "doc_id", "text", **_KNOBS)
    return TC.lm_score_docs(test, uni, bi, n_tok, "doc_id", "text", **_KNOBS)


@query(
    "lm_gate_admissions",
    oracle=f"""
    WITH raw_probe AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 5 THEN '' ELSE text END AS text
      FROM documents WHERE doc_id % 2 = 1
    ),
    probe AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
               x -> x <> '') AS toks
      FROM raw_probe
    ),
    {_LM_MODEL_CTES}
    SELECT p.doc_id AS doc, s.n_transitions, s.ppl,
           CASE WHEN s.ppl IS NOT NULL AND s.ppl <= {_MAX_PPL}
                THEN 'admit' ELSE 'reject' END AS decision,
           CASE WHEN s.ppl IS NULL THEN 'too_short'
                WHEN s.ppl > {_MAX_PPL} THEN 'high_ppl' END AS reject_reason
    FROM (SELECT doc_id FROM raw_probe) p
    LEFT JOIN doc_scored s ON s.doc = p.doc_id
    """,
)
def lm_gate_admissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming LM quality gate's ADMISSION DECISION as a batch
    relation — the SAME shared operator the stream's foreachBatch
    body routes by (``textclass.lm_admission_routing``; the gate is
    ``streaming/sinks.py::lm_quality_gate_writer``), the way
    ``index_screen_admissions`` twins the near-dedup gate: admit
    (ppl ≤ max), reject/high_ppl (ppl > max), reject/too_short
    (<2 tokens — unjudgeable docs are REFUSED; the unigram/exact
    ladder owns them upstream). Every 10th probe doc's text is
    blanked so the too_short route carries rows at every SF (the
    documents table has no short docs)."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 2 == 0)
    probe = d.filter(F.col("doc_id") % 2 == 1).withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 5, F.lit("")).otherwise(F.col("text")),
    )
    uni, bi, n_tok = TC.fit_bigram_lm(ref, "doc_id", "text", **_KNOBS)
    return TC.lm_admission_routing(
        probe, uni, bi, n_tok, "doc_id", "text", max_ppl=_MAX_PPL, **_KNOBS
    )
