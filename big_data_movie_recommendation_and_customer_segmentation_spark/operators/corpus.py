"""Corpus-level scoring and mixture planning — the steps between
per-document filtering and shard writing in a training-data pipeline:
score documents against corpus-wide statistics, then decide how hard
to sample each source/language bucket.

Both operators here are two-level aggregations: a corpus-wide
statistics pass whose OUTPUT is small (a vocabulary, a handful of
source rows), then a cheap join/window against that small side. The
100 TB cost is therefore one scan + one map-side-combined shuffle;
nothing here is quadratic and nothing moves document text twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textops as TX


def unigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_broadcast: bool = True,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    own empirical token distribution — the classic cheap perplexity
    proxy (a one-gram KenLM): fluent text re-uses common tokens,
    gibberish and boilerplate sit in the tails. Used as a quality
    score next to the rule-based ``textops.heuristic_flags``.

    Plan: explode to (doc, token); token counts via map-side-combined
    groupBy (hot tokens like "the" partial-aggregate before the
    exchange, so token skew never concentrates on one reducer); total
    token mass is ONE driver scalar; then join occurrences back to
    counts — broadcast while the vocabulary fits (a few 100 MB covers
    web-scale vocabularies after min-count pruning), else set
    ``vocab_broadcast=False`` and let AQE's skew-join split the hot
    keys.

    Output: id_col, n_tokens, mean_logprob (natural log; empty
    documents emit no row, matching the SQL formulation).
    """
    toks = df.select(
        F.col(id_col), F.explode(TX.tokens(TX.normalized_text(text_col))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    total = counts.agg(F.sum("_c")).collect()[0][0] or 0
    vocab = F.broadcast(counts) if vocab_broadcast else counts
    return (
        toks.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("_c") / F.lit(float(total)))).alias("mean_logprob"),
        )
    )


def temperature_mix_plan(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    alpha: float = 0.7,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixture plan over sources/languages (the
    mT5/XLM-R sampling rule, Xue et al. 2021): sampling mass
    p_g ∝ (tokens_g)^alpha, flattening the head so low-resource
    groups aren't drowned. With ``budget`` (total tokens wanted),
    also emits the per-group Bernoulli ``sample_prob`` =
    min(1, budget·p_g / tokens_g) that downstream hash-sampling
    (``relational.stratified_hash_sample``) consumes.

    One map-side-combined aggregation to ~#groups rows; the
    normalizing window runs over that tiny relation only (bounded by
    group cardinality, never by data size).

    Output: group_col, n_docs, n_tokens, token_share, mix_weight
    [, sample_prob].

    Complete-case: rows with a NULL group or weight are dropped —
    ``n_docs`` previously counted docs whose token mass the Σ
    skipped, and a NULL group minted a phantom mixture bucket (r10
    self-review).
    """
    df = df.filter(F.col(group_col).isNotNull() & F.col(weight_col).isNotNull())
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col).cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    p = F.pow(F.col("n_tokens"), F.lit(alpha))
    out = agg.select(
        group_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.sum("n_tokens").over(w)).alias("token_share"),
        (p / F.sum(p).over(w)).alias("mix_weight"),
    )
    if budget is not None:
        out = out.withColumn(
            "sample_prob",
            F.least(F.lit(1.0), F.lit(budget) * F.col("mix_weight") / F.col("n_tokens")),
        )
    return out


def balanced_sample_by_group(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
) -> DataFrame:
    """Exactly-N-per-group deterministic sample — the balanced-subset
    op a training-data mix actually runs ("take 1M docs per source"),
    complementing the fraction-based ``stratified_hash_sample``.

    Order within a group is the md5 hash of the id (uniform,
    engine-independent, no RNG), so the subset is reproducible and a
    SQL oracle can rebuild it. The per-group limit compiles to
    WindowGroupLimit (rank pushed below the final sort — asserted in
    tests/test_plans.py), so each task keeps at most N rows per group
    before the shuffle: groups far larger than N never materialize.
    Groups smaller than N pass through whole.

    NULL-id rows are dropped: md5(NULL) is NULL, which sorts FIRST
    under the ascending hash order — a NULL-id row previously stole
    a sample slot in every group it appeared in (r10 self-review).
    """
    from .relational import per_group_topk

    df = df.filter(F.col(id_col).isNotNull())
    order = [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()]
    return per_group_topk(df, group_col, order, n_per_group)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Reproducible global shuffle into ``n_shards`` training shards:
    shard = first-32-bits-of-md5(seed ‖ id) mod n_shards, position =
    rank of md5(seed ‖ id) within the shard. Changing ``seed``
    re-shuffles; re-running doesn't — no RNG state, so the epoch
    order is auditable and any engine (or the SQL oracle) can replay
    it bit-for-bit.

    Scale shape: one shuffle keyed on the shard id (uniform by
    construction — md5 bits), then a per-shard sort of N/n_shards
    rows for the position column; pick n_shards so a shard's key
    column fits a task's sort buffer (positions never require a
    global ordering pass). This is the epoch-shuffle a training-data
    pipeline runs once per corpus snapshot, not per epoch — shards
    are the unit downstream loaders randomize over.

    Output: input columns + ``shard`` (int), ``pos`` (1-based rank
    within shard).
    """
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(n_shards)
    ).cast("int")
    out = df.withColumn("_h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w)).drop("_h")


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query
    terms (Robertson/Sparck-Jones idf: ln(1 + (N−df+0.5)/(df+0.5))).

    100 TB shape: tokenization + per-(doc, term) tf is one shuffle;
    doc lengths ride the SAME aggregation (conditional count), so the
    corpus is scanned once. df per query term and avgdl/N are a
    ≤|terms|-row and a 1-row aggregate — both joined back by
    broadcast. Only rows whose term is in the (literal, broadcast)
    query survive the tf filter, so the scored relation is
    |matching docs| × |terms|, never the full posting list.

    The reference has no ranked retrieval (tfidf_top_terms is the
    nearest neighbor); BM25 is the standard next step for
    training-data quality filtering by query relevance.
    """
    from ..functions import textops as TX

    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(TX.tokens(TX.normalized_text(text_col))).alias("term"),
    )
    # One pass: per-doc length AND per-(doc, query-term) tf.
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_term_score"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("_term_score"), round_to).alias("bm25"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006, A-ES): each row gets key u^(1/w) with
    u ∈ (0,1] derived from md5(seed ‖ id) instead of an RNG; the k
    largest keys are the sample. Inclusion probability is
    proportional to weight, the draw is reproducible (and
    SQL-replayable) bit-for-bit, and changing ``seed`` redraws.

    Scale shape: one column pass for the key + a distributed top-k
    (TakeOrderedAndProject — per-partition heaps, never a global
    sort). This is the corpus down-sampler to reach a token budget
    with long-document bias control.

    Output: input columns + ``sample_key`` (rounded) + ``sample_rank``.
    """
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h32 + F.lit(1.0)) / F.lit(4294967296.0)  # (0, 1]
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    ranked = (
        df.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_key").desc(), F.col(id_col).asc())
    return (
        ranked.withColumn("sample_rank", F.row_number().over(w))
        .withColumn("sample_key", F.round(F.col("_key"), round_to))
        .drop("_key")
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_pair_count: int = 3,
    top_n: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Top collocations (adjacent token bigrams) ranked by pointwise
    mutual information: ``pmi = log2(p(w1,w2) / (p(w1) p(w2)))`` with
    bigram probability over all adjacent pairs and unigram
    probabilities over all tokens — the classic collocation detector
    (Church & Hanks 1990), the corpus-curation step that finds
    multiword units worth protecting from tokenizers.

    Plan: bigrams come from an array-level ``zip_with`` of the token
    array against its own tail — no per-token window, no self-join;
    one shuffle counts bigrams, one counts unigrams (both map-side
    combined, vocabulary-sized outputs), the totals broadcast back,
    and the final cut is TakeOrderedAndProject (top_n heap per
    partition, driver merges). ``min_pair_count`` suppresses the
    unstable PMI of rare pairs (the standard governor — PMI is
    maximal for hapax pairs by construction).

    Determinism: ties broken by (w1, w2) ascending; pmi rounded.
    """
    toks = TX.tokens(TX.normalized_text(F.col(text_col)))
    base = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size("_toks")
    bigrams = base.select(
        F.explode(
            F.zip_with(
                F.slice("_toks", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("_toks", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg")
    ).select("_bg.w1", "_bg.w2")
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    unigrams = base.select(F.explode("_toks").alias("_w")).groupBy("_w").agg(
        F.count(F.lit(1)).alias("_uc")
    )
    totals = bigrams.agg(F.count(F.lit(1)).alias("_tb")).crossJoin(
        unigrams.agg(F.sum("_uc").alias("_tu"))
    )
    scored = (
        pair_counts.join(
            F.broadcast(unigrams.select(F.col("_w").alias("w1"), F.col("_uc").alias("_c1"))),
            "w1",
        )
        .join(
            F.broadcast(unigrams.select(F.col("_w").alias("w2"), F.col("_uc").alias("_c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi",
            F.round(
                (F.log(F.col("pair_count") / F.col("_tb"))
                 - F.log(F.col("_c1") / F.col("_tu"))
                 - F.log(F.col("_c2") / F.col("_tu"))) / F.log(F.lit(2.0)),
                round_to,
            ),
        )
    )
    return (
        scored.select("w1", "w2", "pair_count", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_n)
    )
