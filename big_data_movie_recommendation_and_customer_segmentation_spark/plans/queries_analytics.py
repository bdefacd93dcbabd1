"""Round-5 analytics batch 2: sequence mining (Markov transitions,
frequent paths), SCD Type-2 history, chi-square independence,
winsorized robust stats, RRF hybrid retrieval, the distributed
embedding covariance matrix, PageRank centrality, exact AUC + decile
lift, truncated EWMA, hot-key skew diagnostics, item-item cosine
top-k, weekday seasonality + STL-lite anomalies, linear multi-touch
attribution, value-segment migration, and recommender coverage /
novelty.

Same registry + oracle conventions as ``queries.py``: identical
aliases both sides, FP aggregates rounded in both engines, total
deterministic orders on every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import association as AS3
from ..operators import corpus as CP
from ..operators import evaluate as EV
from ..operators import profiling as PF
from ..operators import retrieval as RT
from ..operators import sequence as SEQ
from ..operators import stats as ST
from ..operators import temporal as TP
from ..operators import vectorops as VO
from ..sources import load_table
from .queries import query
from .queries_ext import _NTOKS
from .queries_pipeline import _BM25_TERMS


# --------------------------------------------------------------------------
# Sequence mining over per-user event streams
# --------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           round(n_transitions / CAST(sum(n_transitions)
                 OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream — the sequence model the reference's set-based similarity
    ignores (reference: codes/Customer Segmentation/part1/
    top_100_pairs.py:47 collapses histories to collect_set). One
    user-hash window shuffle; the transition aggregate is
    |types|²-sized with map-side partials
    (sequence.py ``transition_matrix``)."""
    e = load_table(spark, sf_dir, "events")
    return SEQ.transition_matrix(
        e, user_col="user_id", type_col="event_type", order_cols=["ts", "event_id"]
    )


@query(
    "frequent_event_paths",
    oracle="""
    WITH g AS (
      SELECT event_type AS step_1,
             lead(event_type, 1) OVER w AS step_2,
             lead(event_type, 2) OVER w AS step_3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT step_1, step_2, step_3, count(*) AS n_paths
    FROM g
    WHERE step_2 IS NOT NULL AND step_3 IS NOT NULL
    GROUP BY 1, 2, 3
    HAVING count(*) >= 2
    """,
)
def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide counts of contiguous event-type trigrams per user
    — the frequent-path mining a funnel designer runs before fixing
    stage definitions. k-grams come from ``lead`` offsets inside ONE
    window pass, not k-way self-joins (sequence.py
    ``event_kgrams``)."""
    e = load_table(spark, sf_dir, "events")
    return SEQ.event_kgrams(
        e,
        user_col="user_id",
        type_col="event_type",
        order_cols=["ts", "event_id"],
        k=3,
        min_count=2,
    )


# --------------------------------------------------------------------------
# SCD Type-2 validity runs (gaps-and-islands)
# --------------------------------------------------------------------------


@query(
    "customer_order_status_scd2",
    oracle="""
    WITH flagged AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
             CASE WHEN lag(o_orderstatus) OVER w IS NULL
                    OR lag(o_orderstatus) OVER w <> o_orderstatus
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      FROM flagged
    ),
    collapsed AS (
      SELECT o_custkey, run_id, o_orderstatus,
             min(o_orderdate) AS valid_from,
             max(o_orderdate) AS last_seen,
             count(*) AS n_orders
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT o_custkey, run_id, o_orderstatus, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY run_id) AS valid_to,
           last_seen, n_orders
    FROM collapsed
    """,
)
def customer_order_status_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each customer's order status: maximal
    runs of consecutive equal statuses in (o_orderdate, o_orderkey)
    order, with [valid_from, valid_to) validity (open run → null
    valid_to). The gaps-and-islands collapse reuses one hash-by-key
    exchange end-to-end (temporal.py ``scd2_runs``)."""
    o = load_table(spark, sf_dir, "orders")
    out = TP.scd2_runs(
        o,
        key_cols=["o_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        state_col="o_orderstatus",
    )
    return out.select(
        "o_custkey",
        "run_id",
        "o_orderstatus",
        "valid_from",
        "valid_to",
        "last_seen",
        F.col("n_rows").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# Chi-square independence + winsorized robust stats
# --------------------------------------------------------------------------


@query(
    "segment_priority_chisq",
    oracle="""
    WITH j AS (
      SELECT c_mktsegment, o_orderpriority
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    obs AS (
      SELECT c_mktsegment, o_orderpriority, count(*) AS obs
      FROM j GROUP BY 1, 2
    ),
    ma AS (SELECT c_mktsegment, sum(obs) AS ra FROM obs GROUP BY 1),
    mb AS (SELECT o_orderpriority, sum(obs) AS cb FROM obs GROUP BY 1),
    tot AS (SELECT sum(obs) AS n FROM obs),
    grid AS (
      SELECT ma.c_mktsegment, mb.o_orderpriority,
             coalesce(obs.obs, 0) AS obs,
             (ma.ra * mb.cb) / CAST(tot.n AS DOUBLE) AS exp
      FROM ma CROSS JOIN mb
      LEFT JOIN obs USING (c_mktsegment, o_orderpriority)
      CROSS JOIN tot
    )
    SELECT round(sum(pow(obs - exp, 2) / exp), 6) AS chi_square,
           CAST((count(DISTINCT c_mktsegment) - 1)
                * (count(DISTINCT o_orderpriority) - 1) AS BIGINT) AS dof,
           (SELECT CAST(n AS BIGINT) FROM tot) AS n
    FROM grid
    """,
)
def segment_priority_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between customer market
    segment and order priority — the categorical-association check a
    segmentation analyst runs before trusting a cross-tab. Observed
    table from one shuffle; margins/grid are catalog-sized broadcast
    relations (stats.py ``chi_square_independence``)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select("c_mktsegment", "o_orderpriority")
    return ST.chi_square_independence(j, "c_mktsegment", "o_orderpriority")


@query(
    "event_value_winsorized",
    oracle="""
    WITH pct AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS plo,
             quantile_cont(value, 0.95) AS phi
      FROM events GROUP BY 1
    ),
    cl AS (
      SELECT e.event_type, least(greatest(e.value, p.plo), p.phi) AS wv,
             p.plo, p.phi
      FROM events e JOIN pct p USING (event_type)
    )
    SELECT event_type, count(*) AS n,
           round(avg(wv), 6) AS winsorized_mean,
           round(stddev_samp(wv), 6) AS winsorized_std,
           round(any_value(plo), 6) AS p_lower,
           round(any_value(phi), 6) AS p_upper
    FROM cl GROUP BY 1
    """,
)
def event_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/std of event value per event type (exact
    interpolated p05/p95 clamps) — the robust twin of the MAD
    outlier pass: instead of flagging tails it bounds their
    influence. Two keyed aggregates + a broadcast bounds join
    (stats.py ``winsorized_stats``)."""
    e = load_table(spark, sf_dir, "events")
    return ST.winsorized_stats(e, "event_type", "value", lower=0.05, upper=0.95)


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 ∪ semantic ANN fused with RRF
# --------------------------------------------------------------------------

_RRF_DEPTH = 50
_RRF_K0 = 60


@query(
    "hybrid_doc_retrieval_rrf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_NTOKS}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('spark', 'join', 'window', 'stream')
      GROUP BY 1, 2
    ),
    idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    bm AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS bm25
      FROM tf
      JOIN dl USING (doc_id)
      JOIN idf USING (term)
      CROSS JOIN stats
      GROUP BY 1
    ),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
      FROM bm
      QUALIFY rank <= {_RRF_DEPTH}
    ),
    probe AS (
      SELECT embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id = 0
    ),
    sem AS (
      SELECT e.vec_id AS doc_id,
             row_number() OVER (
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], p.pv) DESC,
                        e.vec_id ASC) AS rank
      FROM embeddings e CROSS JOIN probe p
      WHERE e.vec_id <> 0
      QUALIFY rank <= {_RRF_DEPTH}
    ),
    contrib AS (
      SELECT doc_id, 1.0 / ({_RRF_K0} + rank) AS c FROM lex
      UNION ALL
      SELECT doc_id, 1.0 / ({_RRF_K0} + rank) AS c FROM sem
    ),
    fused AS (
      SELECT doc_id, round(sum(c), 6) AS rrf_score, count(*) AS n_lists
      FROM contrib GROUP BY 1
    )
    SELECT doc_id, rrf_score, n_lists,
           row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
    FROM fused
    """,
)
def hybrid_doc_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-signal retrieval: lexical BM25 top-50 and semantic
    cosine-kNN top-50 (probe = embedding 0, doc_id keyed 1:1 to
    vec_id) fused with Reciprocal Rank Fusion (k0=60) — the
    recall-stage union feeding a reranker in a RAG corpus pipeline.
    Fusion is union + one keyed aggregate over Σ top-k rows; neither
    list's score scale leaks into the other (retrieval.py
    ``rrf_fuse``)."""
    from ..functions import vector as V

    d = load_table(spark, sf_dir, "documents")
    bm = CP.bm25_scores(d, "doc_id", "text", list(_BM25_TERMS))
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = (
        bm.withColumn("rank", F.row_number().over(wl))
        .filter(F.col("rank") <= _RRF_DEPTH)
        .select("doc_id", "rank")
    )

    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_pv"))
    ws = Window.orderBy(F.col("_cs").desc(), F.col("vec_id").asc())
    sem = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .withColumn("_cs", V.cosine("embedding", "_pv"))
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= _RRF_DEPTH)
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return RT.rrf_fuse([lex, sem], "doc_id", "rank", k0=_RRF_K0)


# --------------------------------------------------------------------------
# Distributed embedding covariance (the PCA front half)
# --------------------------------------------------------------------------


@query(
    "embedding_covariance",
    oracle="""
    WITH el AS (
      SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    m AS (SELECT i, avg(x) AS mu, count(*) AS n FROM el GROUP BY 1),
    p AS (
      SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sp
      FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT p.i, p.j,
           -- + 0.0 collapses IEEE -0.0: a near-zero covariance can
           -- round to zero with either sign depending on engine
           -- summation order, and the gate hashes the sign bit
           round((p.sp - ma.n * ma.mu * mb.mu) / (ma.n - 1), 6) + 0.0 AS cov
    FROM p
    JOIN m ma ON ma.i = p.i
    JOIN m mb ON mb.i = p.j
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle sample covariance of the embedding column —
    the distributed front half of PCA (``pca_fit`` eigendecomposes
    the d×d result driver-side; see tests/test_pca.py). Each Arrow
    batch reduces to a d×d Gram partial via one BLAS matmul, so the
    shuffle carries d(d+1)/2 rows per batch, never the vectors
    (vectorops.py ``embedding_covariance``). The oracle replays the
    same moments with a double-unnest self-join — correct at sf0.01,
    and exactly the d²-blow-up plan the Spark side avoids."""
    e = load_table(spark, sf_dir, "embeddings")
    return VO.embedding_covariance(e, "embedding")


# --------------------------------------------------------------------------
# Graph centrality: PageRank on the co-purchase graph
# --------------------------------------------------------------------------


@query(
    "part_copurchase_pagerank",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    sizes AS (SELECT basket, count(*) AS bsize FROM inc GROUP BY 1),
    bounded AS (
      SELECT inc.basket, inc.item FROM inc JOIN sizes USING (basket)
      WHERE bsize <= 8
    ),
    pairs AS (
      SELECT a.item AS ia, b.item AS ib
      FROM bounded a JOIN bounded b ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    ed AS (
      SELECT ia AS src, ib AS dst FROM pairs
      UNION ALL
      SELECT ib AS src, ia AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    pr0 AS (SELECT src AS node, deg, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn),
    it1 AS (SELECT e.dst AS node, sum(p.pr / p.deg) AS m
            FROM ed e JOIN pr0 p ON p.node = e.src GROUP BY 1),
    pr1 AS (SELECT p.node, p.deg, (1 - 0.85) / nn.n + 0.85 * coalesce(it1.m, 0) AS pr
            FROM pr0 p CROSS JOIN nn LEFT JOIN it1 ON it1.node = p.node),
    it2 AS (SELECT e.dst AS node, sum(p.pr / p.deg) AS m
            FROM ed e JOIN pr1 p ON p.node = e.src GROUP BY 1),
    pr2 AS (SELECT p.node, p.deg, (1 - 0.85) / nn.n + 0.85 * coalesce(it2.m, 0) AS pr
            FROM pr1 p CROSS JOIN nn LEFT JOIN it2 ON it2.node = p.node),
    it3 AS (SELECT e.dst AS node, sum(p.pr / p.deg) AS m
            FROM ed e JOIN pr2 p ON p.node = e.src GROUP BY 1),
    pr3 AS (SELECT p.node, (1 - 0.85) / nn.n + 0.85 * coalesce(it3.m, 0) AS pr
            FROM pr2 p CROSS JOIN nn LEFT JOIN it3 ON it3.node = p.node)
    SELECT node, round(pr, 6) AS pagerank FROM pr3
    """,
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality (d=0.85, 3 fixed synchronous iterations)
    over the undirected co-purchase graph: parts as nodes, an edge
    when two parts share ≥2 order baskets (same governors as
    `part_association_rules`). The graph-centrality half of the
    graph family — the closure loop in dedup.py is the
    connected-components half (graph.py ``pagerank``; the oracle
    unrolls all three iterations as CTEs)."""
    from ..operators import association as AS2
    from ..operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    bounded = AS2.bounded_incidence(
        li, "l_orderkey", "l_partkey", max_basket_size=8
    )
    pairs = AS2.cooccurrence_pairs(bounded, min_pair_count=2)
    edges = pairs.select(F.col("_a").alias("src"), F.col("_b").alias("dst")).unionByName(
        pairs.select(F.col("_b").alias("src"), F.col("_a").alias("dst"))
    )
    return G.pagerank(edges, damping=0.85, iterations=3)


# --------------------------------------------------------------------------
# Exact distributed AUC (Mann-Whitney rank-sum)
# --------------------------------------------------------------------------


@query(
    "purchase_value_auc",
    oracle="""
    WITH s AS (
      SELECT value AS score, CAST(event_type = 'purchase' AS INT) AS y
      FROM events
    ),
    d AS (SELECT score, count(*) AS cnt, sum(y) AS pos FROM s GROUP BY 1),
    r AS (
      SELECT score, cnt, pos,
             sum(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
               - cnt AS cnt_less
      FROM d
    ),
    agg AS (
      SELECT sum(pos * (cnt_less + (cnt + 1) / 2.0)) AS rank_sum,
             sum(pos) AS p, sum(cnt) - sum(pos) AS nneg
      FROM r
    )
    SELECT round((rank_sum - p * (p + 1) / 2.0) / (p * nneg), 6) AS auc,
           CAST(p AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg
    FROM agg
    """,
)
def purchase_value_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of event value as a purchase-vs-rest classifier
    score, via the Mann-Whitney rank-sum identity with tie-averaged
    ranks. The global rank prefix runs on the two-pass bucketed
    prefix sum — no SinglePartition window, no driver-side sort
    (evaluate.py ``binary_auc``; the oracle is the plain windowed
    SQL the decomposition is equivalent to)."""
    e = load_table(spark, sf_dir, "events")
    labeled = e.select(
        F.col("value"), (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    return EV.binary_auc(labeled, "y", "value")


# --------------------------------------------------------------------------
# Truncated EWMA smoothing
# --------------------------------------------------------------------------


def _ewma_sql(alpha: float, window: int, value: str) -> tuple[str, str]:
    """Numerator/denominator SQL mirroring ewma_lagsum's exact term
    order (left-to-right over i), so the FP result matches
    bit-for-bit before rounding.

    Every weight literal is CAST AS DOUBLE: DuckDB otherwise parses
    ``0.48999999999999994`` as a wide DECIMAL, computes the whole
    denominator in exact decimal arithmetic, and its DOUBLE/DECIMAL
    division lands one ulp away from Spark's double/double — which
    flipped 3 of 12025 six-dp results at sf0.1 (found by the r06
    17-digit canonicalizer; invisible under the old %.9g)."""
    num_terms, den_terms = [], []
    for i in range(window):
        lag = value if i == 0 else f"lag({value}, {i}) OVER w"
        w = f"CAST({(1.0 - alpha) ** i!r} AS DOUBLE)"
        num_terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {w} * {lag} ELSE CAST(0.0 AS DOUBLE) END"
        )
        den_terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN {w} ELSE CAST(0.0 AS DOUBLE) END"
        )
    return (
        "(CAST(0.0 AS DOUBLE) + " + " + ".join(num_terms) + ")",
        "(CAST(0.0 AS DOUBLE) + " + " + ".join(den_terms) + ")",
    )


_EWMA_NUM, _EWMA_DEN = _ewma_sql(0.3, 8, "day_revenue")


@query(
    "daily_revenue_ewma",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
             round(sum(o_totalprice), 2) AS day_revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, day, day_revenue,
           -- sign-aware floor-based half-up in plain double ops,
           -- mirroring ewma_lagsum: round() disagrees between engines
           -- when the quotient sits within an ulp of a 6-dp boundary;
           -- sign/abs keeps HALF_UP away-from-zero for negatives
           sign(({_EWMA_NUM} / {_EWMA_DEN}))
             * floor(abs(({_EWMA_NUM} / {_EWMA_DEN})) * 1000000 + 0.5)
             / 1000000.0 AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day)
    """,
)
def daily_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.3, 8-observation
    truncation) of daily revenue per order priority — the smoothing
    layer over the same daily grain the gap-fill and momentum
    queries use. The W lag terms expand inside ONE per-group window
    pass; identical term order in both engines makes the FP result
    replayable (stats.py ``ewma_lagsum``)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.to_date("o_orderdate").cast("timestamp").alias("day"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("day_revenue"))
    return ST.ewma_lagsum(
        daily, ["o_orderpriority"], ["day"], "day_revenue", alpha=0.3, window=8
    )


# --------------------------------------------------------------------------
# Hot-key skew diagnostics
# --------------------------------------------------------------------------


@query(
    "event_user_skew_report",
    oracle="""
    WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM counts),
    top AS (
      SELECT user_id, n,
             row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
      FROM counts
      QUALIFY rank <= 20
    )
    SELECT user_id, rank, n,
           round(n / CAST(tot.total AS DOUBLE), 6) AS share,
           round(sum(n) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                 / CAST(tot.total AS DOUBLE), 6) AS cum_share,
           round(n * tot.n_keys / CAST(tot.total AS DOUBLE), 6) AS skew_ratio
    FROM top CROSS JOIN tot
    """,
)
def event_user_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest user keys in the event stream with row share,
    cumulative share, and skew ratio (count / mean-per-key) — the
    pre-flight report that decides whether a join on this key needs
    salting (`salted_user_segment_stats`). The top-k cut is
    TakeOrderedAndProject; windows only ever see 20 rows
    (profiling.py ``key_skew_report``)."""
    e = load_table(spark, sf_dir, "events")
    return PF.key_skew_report(e, "user_id", top_k=20)


# --------------------------------------------------------------------------
# Lift / gains table (the actionable companion to AUC)
# --------------------------------------------------------------------------


@query(
    "purchase_value_lift",
    oracle="""
    WITH s AS (
      SELECT value AS score, CAST(event_type = 'purchase' AS INT) AS y
      FROM events
    ),
    cuts AS (
      SELECT quantile_cont(CAST(score AS DOUBLE),
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c
      FROM s
    ),
    b AS (
      SELECT y,
             1 + CAST(score > c[1] AS INT) + CAST(score > c[2] AS INT)
               + CAST(score > c[3] AS INT) + CAST(score > c[4] AS INT)
               + CAST(score > c[5] AS INT) + CAST(score > c[6] AS INT)
               + CAST(score > c[7] AS INT) + CAST(score > c[8] AS INT)
               + CAST(score > c[9] AS INT) AS bucket
      FROM s CROSS JOIN cuts
    ),
    per AS (SELECT bucket, count(*) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1),
    tot AS (SELECT sum(n) AS tn, sum(n_pos) AS tp FROM per)
    SELECT bucket, n, n_pos,
           round(n_pos / CAST(n AS DOUBLE), 6) AS pos_rate,
           round((n_pos / CAST(n AS DOUBLE))
                 / (tp / CAST(tn AS DOUBLE)), 6) AS lift,
           round(sum(n_pos) OVER (ORDER BY bucket DESC
                                  ROWS UNBOUNDED PRECEDING)
                 / CAST(tp AS DOUBLE), 6) AS cum_capture
    FROM per CROSS JOIN tot
    """,
)
def purchase_value_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table for event value as a purchase
    score: what acting on the top-k% of scores actually captures —
    the actionable companion to `purchase_value_auc`. Equi-depth
    buckets come from the broadcast percentile ladder (no ntile
    SinglePartition window); every window after the bucket agg sees
    10 rows (evaluate.py ``decile_lift``)."""
    e = load_table(spark, sf_dir, "events")
    labeled = e.select(
        F.col("value"), (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    return EV.decile_lift(labeled, "y", "value", n_buckets=10)


# --------------------------------------------------------------------------
# Item-item cosine recommendations
# --------------------------------------------------------------------------


# Shared CTE chain replaying item_cosine_neighbors over lineitem
# baskets (k=5, min_pair_count=2, max_basket_size=8) — used by the
# part_cosine_neighbors oracle here and by the item-CF recommender
# oracle in queries_insights.py.
_COSINE_CTES = """
    inc AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    sizes AS (SELECT basket, count(*) AS bsize FROM inc GROUP BY 1),
    bounded AS (
      SELECT inc.basket, inc.item FROM inc JOIN sizes USING (basket)
      WHERE bsize <= 8
    ),
    ic AS (SELECT item, count(*) AS icount FROM bounded GROUP BY 1),
    pairs AS (
      SELECT a.item AS ia, b.item AS ib, count(*) AS pair_count
      FROM bounded a JOIN bounded b ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    directed AS (
      SELECT ia AS item, ib AS neighbor, pair_count FROM pairs
      UNION ALL
      SELECT ib AS item, ia AS neighbor, pair_count FROM pairs
    ),
    scored AS (
      SELECT d.item, d.neighbor, d.pair_count,
             round(d.pair_count / sqrt(CAST(ca.icount * cb.icount AS DOUBLE)), 6)
               AS cosine
      FROM directed d
      JOIN ic ca ON ca.item = d.item
      JOIN ic cb ON cb.item = d.neighbor
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY item
                                   ORDER BY cosine DESC, neighbor ASC) AS rank
      FROM scored
    )
"""


@query(
    "part_cosine_neighbors",
    oracle=f"""
    WITH {_COSINE_CTES}
    SELECT item, neighbor, pair_count, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def part_cosine_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 item-item cosine neighbors over basket co-occurrence —
    the normalized item-item recommender — the item-side analogue of
    the reference's driver-dict user-pair similarity (reference:
    codes/Customer Segmentation/part1/top_100_pairs.py:58-88) —
    here the governed pair self-join + broadcast count join +
    WindowGroupLimit top-k (association.py ``item_cosine_neighbors``,
    sharing its incidence front end with rules mining and
    PageRank)."""
    li = load_table(spark, sf_dir, "lineitem")
    return AS3.item_cosine_neighbors(
        li, "l_orderkey", "l_partkey", k=5, min_pair_count=2, max_basket_size=8
    )


# --------------------------------------------------------------------------
# Weekday seasonality profile
# --------------------------------------------------------------------------


@query(
    "weekday_revenue_seasonality",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority,
             CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INT) AS dow,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, dow, n_orders, revenue,
           round(revenue * 7 / sum(revenue)
                 OVER (PARTITION BY o_orderpriority), 6) AS seasonal_index
    FROM per
    """,
)
def weekday_revenue_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week revenue seasonality per order priority: the
    seasonal index is each weekday's revenue against the priority's
    uniform-week expectation (index 1.0 = flat). One keyed aggregate;
    the normalizing window runs over 7 rows per priority. dow 0 =
    Monday in BOTH engines (Spark ``weekday`` ≡ DuckDB
    ``isodow − 1``)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        "o_orderpriority", F.weekday("o_orderdate").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    w = Window.partitionBy("o_orderpriority")
    return per.withColumn(
        "seasonal_index", F.round(F.col("revenue") * 7 / F.sum("revenue").over(w), 6)
    )


# --------------------------------------------------------------------------
# Linear multi-touch attribution
# --------------------------------------------------------------------------


@query(
    "purchase_click_multitouch",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
             value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT p.user_id, p.purchase_id, p.purchase_ts, p.purchase_value,
             c.click_id, c.click_ts
      FROM purch p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.click_ts <= p.purchase_ts
       AND c.click_ts > p.purchase_ts - INTERVAL 1 HOUR
    ),
    credited AS (
      SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n_touches
      FROM pairs
    )
    SELECT user_id, purchase_id, click_id, click_ts, purchase_ts,
           n_touches,
           round(1.0 / n_touches, 6) AS weight,
           round(purchase_value / n_touches, 6) AS attributed_value
    FROM credited
    """,
)
def purchase_click_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of purchase value across every
    same-user click in the preceding hour (weight = 1/n_touches) —
    the many-touch generalization of last-touch as-of attribution.
    Equi-join + range residual builds the pairs (state bounded by
    the lookback); the credit window partitions by purchase id
    (streaming/joins.py ``multi_touch_attribution``)."""
    from ..streaming import joins as SJ

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = SJ.multi_touch_attribution(
        clicks,
        buys,
        "user_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        value_col="purchase_value",
        lookback="1 hour",
    )
    return out.select(
        "user_id", "purchase_id", "click_id", "click_ts", "purchase_ts",
        "n_touches", "weight", "attributed_value",
    )


# --------------------------------------------------------------------------
# Seasonal-trend decomposition anomalies (STL-lite composition)
# --------------------------------------------------------------------------


@query(
    "daily_revenue_anomalies",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
             round(sum(o_totalprice), 2) AS day_revenue
      FROM orders GROUP BY 1, 2
    ),
    trended AS (
      SELECT *, avg(day_revenue) OVER (PARTITION BY o_orderpriority
                                       ORDER BY day
                                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend
      FROM daily
    ),
    det AS (
      SELECT *, day_revenue - trend AS detrended,
             CAST(isodow(CAST(day AS DATE)) - 1 AS INT) AS dow
      FROM trended
    ),
    seas AS (
      SELECT o_orderpriority, dow, avg(detrended) AS seasonal
      FROM det GROUP BY 1, 2
    ),
    resid AS (
      SELECT det.o_orderpriority, det.day, det.day_revenue, det.trend,
             seas.seasonal, det.detrended - seas.seasonal AS residual
      FROM det JOIN seas USING (o_orderpriority, dow)
    ),
    scored AS (
      SELECT *,
             (residual - avg(residual) OVER (PARTITION BY o_orderpriority))
               / stddev_samp(residual) OVER (PARTITION BY o_orderpriority) AS z
      FROM resid
    )
    SELECT o_orderpriority, day, day_revenue,
           round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
           round(residual, 6) AS residual, round(z, 6) AS zscore,
           CAST(abs(z) > 3 AS INT) AS is_anomaly
    FROM scored
    """,
)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite anomaly detection on daily revenue per priority:
    centered 7-day moving-average trend → weekday seasonal component
    of the detrended series → per-priority z-score of the remaining
    residual, flagged at |z| > 3. A pure composition of the engine's
    window/agg primitives — trend and z windows partition by
    priority, the seasonal join is catalog-sized (|priorities|×7
    broadcast). The decomposition a revenue-monitoring job runs
    daily; the streaming twin is `event_running_zscore`."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.to_date("o_orderdate").cast("timestamp").alias("day"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("day_revenue"))
    w_ma = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    det = (
        daily.withColumn("trend", F.avg("day_revenue").over(w_ma))
        .withColumn("detrended", F.col("day_revenue") - F.col("trend"))
        .withColumn("dow", F.weekday("day"))
    )
    seas = det.groupBy("o_orderpriority", "dow").agg(
        F.avg("detrended").alias("seasonal")
    )
    resid = det.join(F.broadcast(seas), ["o_orderpriority", "dow"]).withColumn(
        "residual", F.col("detrended") - F.col("seasonal")
    )
    w_p = Window.partitionBy("o_orderpriority")
    scored = resid.withColumn(
        "z",
        (F.col("residual") - F.avg("residual").over(w_p))
        / F.stddev_samp("residual").over(w_p),
    )
    return scored.select(
        "o_orderpriority",
        "day",
        "day_revenue",
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("residual", 6).alias("residual"),
        F.round("z", 6).alias("zscore"),
        (F.abs("z") > 3).cast("int").alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# Customer value-segment migration (segmentation over time)
# --------------------------------------------------------------------------

_MIGRATION_PIVOT = "1998-01-01 00:00:00"


def _quintile_ladder_sql(cuts_cte: str) -> str:
    return (
        "1 + CAST(revenue > c[1] AS INT) + CAST(revenue > c[2] AS INT)"
        f" + CAST(revenue > c[3] AS INT) + CAST(revenue > c[4] AS INT)"
    )


@query(
    "customer_value_migration",
    oracle=f"""
    WITH r1 AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders WHERE o_orderdate < TIMESTAMP '{_MIGRATION_PIVOT}'
      GROUP BY 1
    ),
    r2 AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_MIGRATION_PIVOT}'
      GROUP BY 1
    ),
    c1 AS (SELECT quantile_cont(CAST(revenue AS DOUBLE),
                                [0.2,0.4,0.6,0.8]) AS c FROM r1),
    c2 AS (SELECT quantile_cont(CAST(revenue AS DOUBLE),
                                [0.2,0.4,0.6,0.8]) AS c FROM r2),
    s1 AS (SELECT o_custkey, {_quintile_ladder_sql('c1')} AS seg_before
           FROM r1 CROSS JOIN c1),
    s2 AS (SELECT o_custkey, {_quintile_ladder_sql('c2')} AS seg_after
           FROM r2 CROSS JOIN c2),
    m AS (
      SELECT seg_before, seg_after, count(*) AS n_customers
      FROM s1 JOIN s2 USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT seg_before, seg_after, n_customers,
           round(n_customers / CAST(sum(n_customers)
                 OVER (PARTITION BY seg_before) AS DOUBLE), 6) AS prob
    FROM m
    """,
)
def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration matrix: spend quintile in the
    pre-1998 period vs the post-1998 period, for customers active in
    both — the over-time upgrade of the static RFM segmentation
    (reference report pp.7-9 segments once; migration is what a
    retention team actually reads). Each period's quintiles come
    from the broadcast percentile ladder (segmentation.py
    ``quantile_bucket``); the matrix is a 5×5 aggregate and the
    row-normalizing window runs over it."""
    from ..operators import segmentation as SG2

    o = load_table(spark, sf_dir, "orders")
    pivot = F.lit(_MIGRATION_PIVOT).cast("timestamp")

    def period_segments(rev_df, out_col):
        b = SG2.quantile_bucket(rev_df, "revenue", 5, out_col=out_col)
        return b.select("o_custkey", out_col)

    r1 = (
        o.filter(F.col("o_orderdate") < pivot)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    r2 = (
        o.filter(F.col("o_orderdate") >= pivot)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    s1 = period_segments(r1, "seg_before")
    s2 = period_segments(r2, "seg_after")
    m = s1.join(s2, "o_custkey").groupBy("seg_before", "seg_after").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    w = Window.partitionBy("seg_before")
    return m.withColumn(
        "prob",
        F.round(F.col("n_customers") / F.sum("n_customers").over(w), 6),
    )


# --------------------------------------------------------------------------
# Recommender beyond-accuracy metrics: coverage + novelty
# --------------------------------------------------------------------------


@query(
    "recommendation_coverage_novelty",
    oracle="""
    WITH scores AS (
      SELECT l_partkey AS item,
             count(*) AS n_ratings,
             sum(l_quantity) / (count(*) + 100) AS score
      FROM lineitem
      GROUP BY l_partkey
    ),
    top_items AS (
      SELECT item, score FROM scores
      ORDER BY score DESC, item ASC LIMIT 20
    ),
    users AS (SELECT DISTINCT o_custkey AS "user" FROM orders),
    seen AS (
      SELECT DISTINCT o.o_custkey AS "user", l.l_partkey AS item
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    unseen AS (
      SELECT u."user", t.item, t.score
      FROM users u CROSS JOIN top_items t
      WHERE NOT EXISTS (
        SELECT 1 FROM seen s WHERE s."user" = u."user" AND s.item = t.item)
    ),
    ranked AS (
      SELECT "user", item,
             row_number() OVER (PARTITION BY "user"
                                ORDER BY score DESC, item ASC) AS rank
      FROM unseen
    ),
    recs AS (SELECT "user", item FROM ranked WHERE rank <= 5),
    tot AS (SELECT sum(n_ratings) AS ti, count(*) AS catalog FROM scores)
    SELECT count(DISTINCT "user")                    AS n_users,
           count(*)                                  AS n_rec_rows,
           round(count(DISTINCT r.item)
                 / CAST(any_value(tot.catalog) AS DOUBLE), 6) AS coverage_at_k,
           round(avg(-log2(s.n_ratings
                 / CAST(tot.ti AS DOUBLE))), 6)      AS novelty
    FROM recs r
    JOIN scores s ON s.item = r.item
    CROSS JOIN tot
    """,
)
def recommendation_coverage_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy evaluation of the popularity recommender:
    catalog coverage@5 (what fraction of interacted items the
    recommender ever shows) and mean novelty −log2(item interaction
    share) — the diversity/serendipity counterweight to P@k/MAP
    (evaluate.py's accuracy metrics). The popularity share join is
    catalog-sized and broadcast; the final row is one scalar
    aggregate over the bounded rec relation (|users|·k rows)."""
    from ..operators import recommend as REC

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ratings = o.join(li, o.o_orderkey == li.l_orderkey)
    scores = REC.popularity_scores(ratings, "l_partkey", "l_quantity", bias=100.0)
    cands = REC.top_items(scores, 20)
    users = o.select(F.col("o_custkey").alias("user")).distinct()
    seen = ratings.select(
        F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
    ).distinct()
    recs = REC.recommend_unseen_topk(users, cands, seen, k=5).select("user", "item")
    pop = scores.select("item", "n_ratings")
    tot = scores.agg(
        F.sum("n_ratings").alias("_ti"), F.count(F.lit(1)).alias("_catalog")
    )
    j = recs.join(F.broadcast(pop), "item").crossJoin(F.broadcast(tot))
    return j.agg(
        F.countDistinct("user").alias("n_users"),
        F.count(F.lit(1)).alias("n_rec_rows"),
        F.round(
            F.countDistinct("item") / F.first("_catalog").cast("double"), 6
        ).alias("coverage_at_k"),
        F.round(
            F.avg(-F.log2(F.col("n_ratings") / F.col("_ti").cast("double"))), 6
        ).alias("novelty"),
    )
