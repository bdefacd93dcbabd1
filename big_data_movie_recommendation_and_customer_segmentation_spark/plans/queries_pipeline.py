"""Round-5 pipeline queries: market-basket rules, RFM + Pareto
segmentation, BM25 retrieval, time-series gap fill, snapshot CDC.

Same registry + oracle conventions as ``queries.py``. Every oracle
mirrors the Spark expression ORDER as well as its value (FP ops are
replayed in the same association order so round(...,6) agrees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import association as AS
from ..operators import corpus as CP
from ..operators import segmentation as SG
from ..operators import snapshot as SN
from ..operators import temporal as TP
from ..sources import load_table
from .queries import query
from .queries_ext import _NTOKS


# --------------------------------------------------------------------------
# Market-basket association rules (recommendation parity-plus)
# --------------------------------------------------------------------------


@query(
    "part_association_rules",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    sizes AS (SELECT basket, count(*) AS bsize FROM inc GROUP BY 1),
    bounded AS (
      SELECT inc.basket, inc.item FROM inc JOIN sizes USING (basket)
      WHERE bsize <= 8
    ),
    n AS (SELECT count(DISTINCT basket) AS n_baskets FROM bounded),
    ic AS (SELECT item, count(*) AS icount FROM bounded GROUP BY 1),
    pairs AS (
      SELECT a.item AS ia, b.item AS ib, count(*) AS pair_count
      FROM bounded a JOIN bounded b ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    directed AS (
      SELECT ia AS antecedent, ib AS consequent, pair_count FROM pairs
      UNION ALL
      SELECT ib AS antecedent, ia AS consequent, pair_count FROM pairs
    )
    SELECT d.antecedent, d.consequent, d.pair_count,
           round(d.pair_count / CAST(n.n_baskets AS DOUBLE), 6)  AS support,
           round(d.pair_count / CAST(ca.icount AS DOUBLE), 6)    AS confidence,
           round((d.pair_count * CAST(n.n_baskets AS DOUBLE))
                 / (ca.icount * cb.icount), 6)                   AS lift
    FROM directed d
    JOIN ic ca ON ca.item = d.antecedent
    JOIN ic cb ON cb.item = d.consequent
    CROSS JOIN n
    """,
)
def part_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over order baskets (support /
    confidence / lift) — the co-occurrence recommender; the
    reference keeps all pair state in driver dicts (reference:
    codes/Customer Segmentation/part1/top_100_pairs.py:58-80).
    Basket-size governor 8
    bounds the pair blow-up; see association.py for the 100 TB
    shuffle budget (one incidence shuffle + one basket-key
    self-join + catalog-sized broadcast joins)."""
    li = load_table(spark, sf_dir, "lineitem")
    return AS.association_rules(
        li.select("l_orderkey", "l_partkey"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_count=2,
        max_basket_size=8,
    )


# --------------------------------------------------------------------------
# RFM + Pareto segmentation
# --------------------------------------------------------------------------

_RFM_ANCHOR = "1998-12-31"


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey AS customer_id,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       DATE '{_RFM_ANCHOR}')          AS recency_days,
             count(*)                                 AS frequency,
             round(sum(o_totalprice), 2)              AS monetary
      FROM orders GROUP BY 1
    ),
    cuts AS (
      SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS r,
             quantile_cont(frequency,    [0.2, 0.4, 0.6, 0.8]) AS f,
             quantile_cont(monetary,     [0.2, 0.4, 0.6, 0.8]) AS m
      FROM per_cust
    ),
    scored AS (
      SELECT customer_id, recency_days, frequency, monetary,
             1 + CAST(recency_days < r[1] AS INT) + CAST(recency_days < r[2] AS INT)
               + CAST(recency_days < r[3] AS INT) + CAST(recency_days < r[4] AS INT) AS r_score,
             1 + CAST(frequency > f[1] AS INT) + CAST(frequency > f[2] AS INT)
               + CAST(frequency > f[3] AS INT) + CAST(frequency > f[4] AS INT)       AS f_score,
             1 + CAST(monetary > m[1] AS INT) + CAST(monetary > m[2] AS INT)
               + CAST(monetary > m[3] AS INT) + CAST(monetary > m[4] AS INT)         AS m_score
      FROM per_cust CROSS JOIN cuts
    )
    SELECT customer_id, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS rfm_segment
    FROM scored
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation — the rule-based customer scoring
    the reference's segmentation track (similar-pair mining only,
    SURVEY.md §1 S1/S2) never reaches. Quintile cuts come from ONE
    exact-percentile aggregate broadcast into a comparison ladder —
    no ``ntile() OVER (ORDER BY …)`` SinglePartition exchange (see
    segmentation.py)."""
    o = load_table(spark, sf_dir, "orders")
    return SG.rfm_scores(
        o, "o_custkey", "o_orderdate", "o_totalprice", anchor_ts=_RFM_ANCHOR
    )


@query(
    "customer_revenue_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS customer_id,
             round(sum(o_totalprice), 2) AS revenue,
             CAST(round(round(sum(o_totalprice), 2) * 100) AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(revenue_cents) AS t FROM rev),
    run AS (
      SELECT customer_id, revenue, revenue_cents,
             sum(revenue_cents) OVER (ORDER BY revenue_cents DESC, customer_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    )
    SELECT customer_id, revenue, revenue_cents,
           round(cum / CAST(t AS DOUBLE), 6) AS cum_share,
           CAST((cum - revenue_cents) / CAST(t AS DOUBLE) < 0.8 AS INT) AS head_flag
    FROM run CROSS JOIN tot
    """,
)
def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 cumulative revenue share per customer. The global
    running sum in revenue-descending order uses the two-pass
    bucketed prefix sum (packing.py) with the customer key as the
    in-bucket tiebreak — exact-integer cents, no SinglePartition
    exchange; the oracle is the plain windowed SQL it is
    byte-equivalent to."""
    o = load_table(spark, sf_dir, "orders")
    return SG.revenue_pareto(o, "o_custkey", "o_totalprice", threshold=0.8)


# --------------------------------------------------------------------------
# BM25 ranked retrieval
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window", "stream")


@query(
    "bm25_doc_ranking",
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
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS s
      FROM tf
      JOIN dl USING (doc_id)
      JOIN df USING (term)
      CROSS JOIN stats
    )
    SELECT doc_id, round(sum(s), 6) AS bm25, count(*) AS n_matched_terms
    FROM scored GROUP BY 1
    """,
)
def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term
    bag — ranked retrieval for relevance-based corpus filtering
    (k1=1.2, b=0.75). One token shuffle feeds tf AND doc-length;
    df/avgdl/N are broadcast-sized aggregates (corpus.py
    ``bm25_scores``)."""
    d = load_table(spark, sf_dir, "documents")
    return CP.bm25_scores(d, "doc_id", "text", list(_BM25_TERMS))


# --------------------------------------------------------------------------
# Time-series gap fill / resample
# --------------------------------------------------------------------------


@query(
    "daily_orders_gapfill",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders, round(sum(o_totalprice), 2) AS day_revenue
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo,
             CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    grid AS (
      SELECT p.o_orderpriority, s.day
      FROM (SELECT DISTINCT o_orderpriority FROM orders) p CROSS JOIN spine s
    ),
    j AS (
      SELECT g.o_orderpriority, g.day,
             coalesce(d.n_orders, 0) AS n_orders, d.day_revenue
      FROM grid g LEFT JOIN daily d USING (o_orderpriority, day)
    )
    SELECT o_orderpriority, CAST(day AS TIMESTAMP) AS day, n_orders,
           last_value(day_revenue IGNORE NULLS)
             OVER (PARTITION BY o_orderpriority ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS day_revenue
    FROM j
    """,
)
def daily_orders_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-(priority, day) resample of the orders stream:
    silent days appear with n_orders=0 and the last observed daily
    revenue carried forward (``last(ignorenulls)`` per-group window;
    leading days before the first observation stay null). The spine
    is a broadcast |groups|×|days| grid — the distributed
    ``resample('D')`` (temporal.py ``gap_fill_daily``)."""
    o = load_table(spark, sf_dir, "orders")
    out = TP.gap_fill_daily(
        o,
        "o_orderdate",
        ["o_orderpriority"],
        {"n_orders": F.count(F.lit(1)), "day_revenue": F.round(F.sum("o_totalprice"), 2)},
        zero_fill=["n_orders"],
        ffill=["day_revenue"],
    )
    # DATE → TIMESTAMP for the cross-engine hash (driver stringifies
    # timestamps identically; bare dates render differently).
    return out.withColumn("day", F.col("day").cast("timestamp"))


# --------------------------------------------------------------------------
# Snapshot CDC: diff + merge
# --------------------------------------------------------------------------

_OLD_SNAP = "o_orderkey % 10 <> 3"
_NEW_SNAP = "o_orderkey % 10 <> 7"
_BUMP = "o_orderkey % 13 = 0"


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic old/new snapshot pair derived from orders:
    ~10% of keys deleted, ~10% inserted, ~1/13 price-bumped."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.expr(_OLD_SNAP))
    # price bump is an exact IEEE add (no rounding step), so both
    # engines produce the bit-identical double.
    new = o.filter(F.expr(_NEW_SNAP)).withColumn(
        "o_totalprice",
        F.when(F.expr(_BUMP), F.col("o_totalprice") + 100.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    return old, new


_SNAP_CTES = f"""
    old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE {_OLD_SNAP}
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN {_BUMP} THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE {_NEW_SNAP}
    )
"""


@query(
    "snapshot_diff_orders",
    oracle=f"""
    WITH {_SNAP_CTES}
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                WHEN (old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus)
                 AND (old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice)
                  THEN 'unchanged'
                ELSE 'update' END AS change_type,
           new.o_orderstatus, new.o_totalprice
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC between two deterministic order snapshots:
    insert / delete / update / unchanged via ONE full-outer join on
    the key + null-safe struct comparison (snapshot.py). At 100 TB,
    bucketed snapshots make this join shuffle-free."""
    old, new = _snapshots(spark, sf_dir)
    return SN.snapshot_diff(old, new, keys=["o_orderkey"])


@query(
    "snapshot_merge_orders",
    oracle=f"""
    WITH {_SNAP_CTES}
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM new
    """,
)
def snapshot_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE round-trip: apply the snapshot diff onto the old
    snapshot; the result must be bit-identical to the new snapshot —
    which is exactly what the oracle asserts. Two key-joins, no
    window, no driver state (snapshot.py ``apply_changes``)."""
    old, new = _snapshots(spark, sf_dir)
    diff = SN.snapshot_diff(old, new, keys=["o_orderkey"])
    return SN.apply_changes(old, diff, keys=["o_orderkey"])


# --------------------------------------------------------------------------
# Fuzzy (edit-distance) near-dup, weighted sampling, robust stats
# --------------------------------------------------------------------------


# Shared fuzzy-dedup CTE chain (normalize → band → govern) — used by
# both the pair oracle and the entity-resolution closure oracle.
_FUZZY_CTES = """
    pre AS (
      SELECT doc_id AS _id,
             substr(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 64) AS _pre
      FROM documents
    ),
    banded AS (
      SELECT _id, _pre, CAST(floor(length(_pre) / 16.0) AS INT) AS _band FROM pre
    ),
    cand AS (
      SELECT _id, _pre, _band AS _bkey FROM banded
      UNION ALL
      SELECT _id, _pre, _band + 1 AS _bkey FROM banded
    ),
    sizes AS (SELECT _bkey, count(*) AS _bn FROM cand GROUP BY 1),
    governed AS (
      SELECT c._bkey, c._id, c._pre FROM cand c JOIN sizes USING (_bkey)
      WHERE _bn <= 600
    ),
    fuzz AS (
      SELECT DISTINCT a._id AS id_a, b._id AS id_b,
             levenshtein(a._pre, b._pre) AS edit_distance
      FROM governed a JOIN governed b ON a._bkey = b._bkey AND a._id < b._id
      WHERE levenshtein(a._pre, b._pre) <= 20
    )
"""


@query(
    "fuzzy_duplicate_pairs",
    oracle=f"""
    WITH {_FUZZY_CTES}
    SELECT id_a, id_b, edit_distance FROM fuzz
    """,
)
def fuzzy_duplicate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate pairs over length-banded
    normalized prefixes (dedup.py ``fuzzy_edit_pairs``): banding is
    sound pruning for |len diff| ≤ band width, the band-size governor
    kills quadratic bands, and only ASCII survives normalization so
    char-based (Spark) and byte-based (DuckDB) levenshtein agree."""
    d = load_table(spark, sf_dir, "documents")
    from ..operators import dedup as DD

    return DD.fuzzy_edit_pairs(
        d, "doc_id", "text", max_dist=20, prefix_chars=64,
        band_width=16, max_band_size=600,
    )


@query(
    "doc_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, text, lang, source, n_chars,
             pow((CAST('0x' || substring(md5('r5' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) + 1.0) / 4294967296.0,
                 1.0 / CAST(n_chars AS DOUBLE)) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, text, lang, source, n_chars, k,
             row_number() OVER (ORDER BY k DESC, doc_id ASC) AS sample_rank
      FROM keyed
    )
    SELECT doc_id, text, lang, source, n_chars,
           sample_rank, round(k, 6) AS sample_key
    FROM ranked WHERE sample_rank <= 50
    """,
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Efraimidis–Spirakis weighted sample of 50
    documents, weight = n_chars (corpus.py ``weighted_sample``): the
    md5-derived u replaces the RNG so the draw is bit-reproducible
    and fully SQL-replayable; selection is a distributed top-k."""
    d = load_table(spark, sf_dir, "documents")
    return CP.weighted_sample(d, "doc_id", "n_chars", k=50, seed="r5")


@query(
    "priority_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
             round(sum(o_totalprice), 2) AS y
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT o_orderpriority,
             CAST(count(*) AS DOUBLE) AS n,
             sum(CAST(x AS DOUBLE)) AS sx, sum(y) AS sy,
             sum(CAST(x AS DOUBLE) * y) AS sxy,
             sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx,
             sum(y * y) AS syy
      FROM daily GROUP BY 1
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n_points,
           round(CASE WHEN n * sxx - sx * sx > 0
                      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope,
           round(CASE WHEN n * sxx - sx * sx > 0
                      THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 END, 6) AS intercept,
           round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                      THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
    FROM m
    """,
)
def priority_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority OLS trend of daily revenue (stats.py
    ``group_linear_trend``): closed-form moment solution — one
    map-side-combined aggregation per group, no window, no driver
    math; the oracle replays the six SUMs."""
    from ..operators import stats as ST

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("x"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    return ST.group_linear_trend(daily, ["o_orderpriority"], "x", "y")


@query(
    "event_value_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m FROM events GROUP BY 1
    ),
    dev AS (SELECT e.*, m FROM events e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(abs(value - m), 0.5) AS d
      FROM dev GROUP BY 1
    )
    SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props,
           round(m, 6) AS group_median, round(d, 6) AS group_mad,
           CAST(abs(value - m) > 3.0 * 1.4826 * d AS INT) AS is_outlier
    FROM dev e JOIN mad USING (event_type)
    """,
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust median/MAD outlier flags on event values per type
    (stats.py ``mad_outliers``): two exact-percentile aggregations
    broadcast back onto the relation; medians are bit-identical to
    DuckDB quantile_cont so the flags replay exactly."""
    from ..operators import stats as ST

    e = load_table(spark, sf_dir, "events")
    return ST.mad_outliers(e, ["event_type"], "value")


# --------------------------------------------------------------------------
# Two-stage ANN (shortlist + exact re-rank), profiling, constraints
# --------------------------------------------------------------------------


def _ivfadc_rerank_oracle(shortlist: int = 30, topk: int = 5) -> str:
    """Wrap the full IVFADC replay as a derived table, then re-rank
    its shortlist with exact cosine — the oracle replays BOTH
    retrieval stages."""
    from .queries_ext import _ivfadc_oracle

    inner = _ivfadc_oracle(topk=shortlist)
    return f"""
    WITH short AS (SELECT probe_id, vec_id FROM ({inner}) q),
    re AS (
      SELECT s.probe_id, s.vec_id,
             round(list_cosine_similarity(p.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]), 6) AS cos_sim
      FROM short s
      JOIN embeddings e ON e.vec_id = s.vec_id
      JOIN embeddings p ON p.vec_id = s.probe_id
    )
    SELECT probe_id, vec_id, cos_sim, CAST(rn AS INT) AS rank FROM (
      SELECT probe_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM re)
    WHERE rn <= {topk}
    """


@query("ivfadc_rerank_knn", oracle=_ivfadc_rerank_oracle())
def ivfadc_rerank_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: IVFADC shortlists 30 candidates per probe
    from PQ codes alone, then exact cosine re-ranks ONLY those 30
    raw vectors to the final top-5 (vectorops.py
    ``ivfadc_rerank_knn``). The production billion-scale shape —
    quantization decides the shortlist, never the final order."""
    from ..operators import vectorops as VO

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    return VO.ivfadc_rerank_knn(
        e, probes, k_neighbors=5, shortlist=30,
        n_cells=16, n_probe_cells=4, dim=64, m=8, pq_k=16, iters=2,
        exclude_id_eq_probe=True,
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_totalprice")


def _profile_oracle() -> str:
    moments = []
    rows = []
    for c in _PROFILE_COLS:
        moments.append(
            f"count({c}) AS cnt_{c}, count(DISTINCT {c}) AS dist_{c}, "
            f"min(CAST({c} AS DOUBLE)) AS min_{c}, max(CAST({c} AS DOUBLE)) AS max_{c}, "
            f"sum(CAST({c} AS DOUBLE)) AS sx_{c}, "
            f"sum(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE)) AS sxx_{c}"
        )
        rows.append(f"""
      SELECT '{c}' AS col_name, n AS n_rows, cnt_{c} AS n_nonnull,
             n - cnt_{c} AS n_null, dist_{c} AS n_distinct,
             round(min_{c}, 6) AS min, round(max_{c}, 6) AS max,
             round(CASE WHEN cnt_{c} > 0 THEN sx_{c} / cnt_{c} END, 6) AS mean,
             round(CASE WHEN cnt_{c} > 1 AND
                        (cnt_{c} * sxx_{c} - sx_{c} * sx_{c})
                          / (cnt_{c} * (cnt_{c} - 1)) >= 0
                        THEN sqrt((cnt_{c} * sxx_{c} - sx_{c} * sx_{c})
                                  / (cnt_{c} * (cnt_{c} - 1))) END, 6) AS stddev
      FROM s""")
    return (
        "WITH s AS (SELECT count(*) AS n, "
        + ", ".join(moments)
        + " FROM orders) "
        + " UNION ALL ".join(rows)
    )


@query("orders_profile", oracle=_profile_oracle())
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass numeric profile of three order columns
    (profiling.py ``profile_numeric``): all moments for all columns
    in ONE aggregation, unpivoted to a row per column — no
    per-column jobs, no driver loops."""
    from ..operators import profiling as PF

    o = load_table(spark, sf_dir, "orders")
    return PF.profile_numeric(o, list(_PROFILE_COLS))


@query(
    "orders_quality_report",
    oracle="""
    WITH s AS (
      -- CASTs: DuckDB's sum() widens to HUGEINT → pandas float64,
      -- which hash-fails against Spark's int64 (r05 lesson)
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN (o_totalprice > 0) IS NULL OR NOT (o_totalprice > 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
             CAST(sum(CASE WHEN (o_orderstatus IN ('O','F','P')) IS NULL
                       OR NOT (o_orderstatus IN ('O','F','P'))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
             CAST(sum(CASE WHEN (o_orderdate IS NOT NULL) IS NULL
                       OR NOT (o_orderdate IS NOT NULL)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
             count(DISTINCT o_orderkey) AS d_key
      FROM orders
    )
    SELECT 'positive_totalprice' AS check_name, n AS n_rows,
           v_price AS n_violations, CAST(v_price = 0 AS INT) AS passed FROM s
    UNION ALL
    SELECT 'valid_status', n, v_status, CAST(v_status = 0 AS INT) FROM s
    UNION ALL
    SELECT 'orderdate_not_null', n, v_date, CAST(v_date = 0 AS INT) FROM s
    UNION ALL
    SELECT 'unique_orderkey', n, n - d_key, CAST(n - d_key = 0 AS INT) FROM s
    """,
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint report over orders
    (profiling.py ``check_constraints``): three row predicates plus
    a key-uniqueness check, all riding one aggregation pass."""
    from ..operators import profiling as PF

    o = load_table(spark, sf_dir, "orders")
    return PF.check_constraints(
        o,
        row_checks={
            "positive_totalprice": F.col("o_totalprice") > 0,
            "valid_status": F.col("o_orderstatus").isin("O", "F", "P"),
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
        },
        unique_keys={"unique_orderkey": ["o_orderkey"]},
    )


# --------------------------------------------------------------------------
# K-fold CV, negative sampling, quantile bucketing, momentum
# --------------------------------------------------------------------------


@query(
    "events_kfold_summary",
    oracle="""
    WITH folds AS (
      SELECT CAST(CAST(('0x' || substring(md5('cv' || CAST(event_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) % 5 AS INT) AS fold,
             user_id, value
      FROM events
    )
    SELECT fold, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
           round(avg(value), 6) AS avg_value
    FROM folds GROUP BY fold
    """,
)
def events_kfold_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold CV assignment (splits.py ``kfold_assign``:
    md5 mod k — RNG-free, repartition-stable, unlike randomSplit)
    summarized per fold. Fold balance and value homogeneity are the
    auditable properties a CV split must have."""
    from ..operators import splits as SP

    e = load_table(spark, sf_dir, "events")
    return (
        SP.kfold_assign(e, "event_id", k=5, seed="cv")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def _negative_samples_oracle() -> str:
    from .queries import ORACLE_REGISTRY

    cand = ORACLE_REGISTRY["candidates_unseen"]
    return f"""
    WITH cand AS (SELECT * FROM ({cand}) q),
    h AS (
      SELECT custkey, partkey,
             md5('neg' || CAST(custkey AS VARCHAR) || '|'
                        || CAST(partkey AS VARCHAR)) AS _h
      FROM cand
    )
    SELECT custkey, partkey, CAST(rn AS INT) AS neg_rank FROM (
      SELECT custkey, partkey,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY _h ASC, partkey ASC) AS rn
      FROM h)
    WHERE rn <= 3
    """


@query("negative_samples_per_customer", oracle=_negative_samples_oracle())
def negative_samples_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback negative sampling: 3 deterministic unseen
    items per customer, hash-ordered over the candidate generator's
    output (recommend.py ``negative_samples`` — WindowGroupLimit
    keeps ≤3 rows per user per task, the reference's driver-side
    ``random`` sampling distributed and made replayable)."""
    from ..operators import recommend as RC
    from .queries import candidates_unseen as _cand_q

    cands = _cand_q(spark, sf_dir)
    return RC.negative_samples(cands, "custkey", "partkey", k=3, seed="neg")


@query(
    "part_price_deciles",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(CAST(p_retailprice AS DOUBLE),
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c
      FROM part
    )
    SELECT p_partkey, p_retailprice,
           1 + CAST(p_retailprice > c[1] AS INT) + CAST(p_retailprice > c[2] AS INT)
             + CAST(p_retailprice > c[3] AS INT) + CAST(p_retailprice > c[4] AS INT)
             + CAST(p_retailprice > c[5] AS INT) + CAST(p_retailprice > c[6] AS INT)
             + CAST(p_retailprice > c[7] AS INT) + CAST(p_retailprice > c[8] AS INT)
             + CAST(p_retailprice > c[9] AS INT) AS decile
    FROM part CROSS JOIN cuts
    """,
)
def part_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning of part prices (segmentation.py
    ``quantile_bucket`` — the broadcast percentile-ladder that
    replaces the ntile SinglePartition window for feature binning)."""
    p = load_table(spark, sf_dir, "part")
    return SG.quantile_bucket(
        p.select("p_partkey", "p_retailprice"), "p_retailprice", 10, out_col="decile"
    )


@query(
    "daily_revenue_momentum",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders, round(sum(o_totalprice), 2) AS day_revenue
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo,
             CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    grid AS (
      SELECT p.o_orderpriority, s.day
      FROM (SELECT DISTINCT o_orderpriority FROM orders) p CROSS JOIN spine s
    ),
    filled AS (
      SELECT g.o_orderpriority, g.day,
             coalesce(d.n_orders, 0) AS n_orders,
             last_value(d.day_revenue IGNORE NULLS)
               OVER (PARTITION BY g.o_orderpriority ORDER BY g.day
                     ROWS UNBOUNDED PRECEDING) AS day_revenue
      FROM grid g LEFT JOIN daily d USING (o_orderpriority, day)
    )
    SELECT o_orderpriority, CAST(day AS TIMESTAMP) AS day, n_orders, day_revenue,
           round(day_revenue - lag(day_revenue)
                 OVER (PARTITION BY o_orderpriority ORDER BY day), 6) AS rev_delta,
           round(avg(day_revenue)
                 OVER (PARTITION BY o_orderpriority ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS rev_ma7
    FROM filled
    """,
)
def daily_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta + 7-day moving average per
    priority on the gap-filled daily grid (composes
    ``gap_fill_daily`` with lag/frame windows — both partitioned by
    group, no global sort). Leading days before a group's first
    observation stay null through delta and MA alike."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    filled = TP.gap_fill_daily(
        o,
        "o_orderdate",
        ["o_orderpriority"],
        {"n_orders": F.count(F.lit(1)), "day_revenue": F.round(F.sum("o_totalprice"), 2)},
        zero_fill=["n_orders"],
        ffill=["day_revenue"],
    )
    wlag = W.partitionBy("o_orderpriority").orderBy("day")
    wma = wlag.rowsBetween(-6, W.currentRow)
    return (
        filled.withColumn(
            "rev_delta",
            F.round(F.col("day_revenue") - F.lag("day_revenue").over(wlag), 6),
        )
        .withColumn("rev_ma7", F.round(F.avg("day_revenue").over(wma), 6))
        .withColumn("day", F.col("day").cast("timestamp"))
    )


# --------------------------------------------------------------------------
# CMS heavy hitters, entity-resolution closure, histogram, mergeable profiles
# --------------------------------------------------------------------------


def _cms_cells_sql(depth: int, width: int, key_expr: str) -> str:
    """DuckDB replay of the per-row CMS cells."""
    rows = [
        f"SELECT {key_expr} AS k, {i} AS row, "
        f"CAST(CAST(('0x' || substring(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS UBIGINT) % {width} AS INT) AS bucket FROM events"
        for i in range(4)
    ]
    return " UNION ALL ".join(rows)


@query(
    "event_type_cms_estimates",
    oracle=f"""
    WITH cells AS ({_cms_cells_sql(4, 64, "event_type")}),
    sketch AS (
      SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT event_type FROM events),
    probe AS (
      SELECT k.event_type, x.row,
             CAST(CAST(('0x' || substring(md5(CAST(x.row AS VARCHAR) || ':' ||
                        CAST(k.event_type AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 64 AS INT) AS bucket
      FROM keys k CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS row) x
    ),
    est AS (
      SELECT p.event_type, min(s.cnt) AS est_count
      FROM probe p JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
      GROUP BY 1
    ),
    exact AS (SELECT event_type, count(*) AS exact_count FROM events GROUP BY 1)
    SELECT e.event_type, est.est_count, e.exact_count,
           est.est_count - e.exact_count AS overcount
    FROM est JOIN exact e USING (event_type)
    """,
)
def event_type_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates vs exact counts for every
    event type (sketches.py ``count_min_sketch`` / ``cms_estimate``):
    depth·width counters of MERGEABLE state for an unbounded key
    domain; the one-sided overcount (est ≥ exact, a CMS invariant) is
    emitted so the oracle verifies the bound row by row."""
    from ..operators import sketches as SK

    e = load_table(spark, sf_dir, "events")
    sketch = SK.count_min_sketch(e, "event_type", depth=4, width=64)
    keys = e.select("event_type").distinct()
    est = SK.cms_estimate(sketch, keys, "event_type", depth=4, width=64)
    exact = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_count"))
    return est.join(exact, "event_type").select(
        "event_type",
        "est_count",
        "exact_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )


@query(
    "fuzzy_dedup_representatives",
    oracle=f"""
    WITH RECURSIVE {_FUZZY_CTES},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM fuzz
      UNION
      SELECT id_b AS a, id_a AS b FROM fuzz
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
    )
    SELECT a AS doc_id, min(b) AS rep_id
    FROM reach GROUP BY a HAVING min(b) < a
    """,
)
def fuzzy_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy (edit-distance) blocking +
    matching composed with min-label propagation to cluster
    representatives — the blocking→matching→clustering pipeline, all
    distributed, cross-checked against a recursive-CTE transitive
    closure."""
    from ..operators import dedup as DD

    d = load_table(spark, sf_dir, "documents")
    pairs = (
        DD.fuzzy_edit_pairs(
            d, "doc_id", "text", max_dist=20, prefix_chars=64,
            band_width=16, max_band_size=600,
        )
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        # the fixpoint loop consumes the edge set once per round —
        # checkpoint so the levenshtein band join runs ONCE, not per
        # round (the ngram closure gets this inside
        # ngram_jaccard_pairs; measured 8.4 s → ~2 s warm at sf0.1)
        .localCheckpoint(eager=False)
    )
    return DD.dedup_representatives(pairs, rounds=None)


@query(
    "event_value_histogram",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(value AS DOUBLE)) AS lo, max(CAST(value AS DOUBLE)) AS hi
      FROM events
    ),
    binned AS (
      SELECT CASE WHEN (hi - lo) / 20.0 > 0
                  THEN CAST(least(19, floor((CAST(value AS DOUBLE) - lo)
                                            / ((hi - lo) / 20.0))) AS INT)
                  ELSE 0 END AS bin,
             count(*) AS bin_count
      FROM events CROSS JOIN bounds GROUP BY 1
    ),
    spine AS (
      SELECT unnest(range(0, 20)) AS bin, lo, hi,
             (hi - lo) / 20.0 AS w
      FROM bounds
    )
    SELECT CAST(s.bin AS INT) AS bin,
           round(s.lo + s.bin * s.w, 6) AS lo_edge,
           round(s.lo + (s.bin + 1) * s.w, 6) AS hi_edge,
           coalesce(b.bin_count, 0) AS bin_count
    FROM spine s LEFT JOIN binned b ON b.bin = s.bin
    """,
)
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of event values with a dense bin
    spine — empty bins visible with count 0 (stats.py
    ``histogram_fixed``). Bounds from a 2-value agg; binning is pure
    column math; the spine is broadcast."""
    from ..operators import stats as ST

    e = load_table(spark, sf_dir, "events")
    return ST.histogram_fixed(e, "value", 20)


@query(
    "orders_profile_incremental",
    oracle="""
    WITH partial AS (
      SELECT o_orderstatus AS shard, count(*) AS n,
             count(o_totalprice) AS cnt,
             min(CAST(o_totalprice AS DOUBLE)) AS mn,
             max(CAST(o_totalprice AS DOUBLE)) AS mx,
             sum(CAST(o_totalprice AS DOUBLE)) AS sx,
             sum(CAST(o_totalprice AS DOUBLE) * CAST(o_totalprice AS DOUBLE)) AS sxx
      FROM orders GROUP BY 1
    ),
    merged AS (
      -- CAST: DuckDB sums BIGINT into HUGEINT, which lands in pandas
      -- as float64 and hash-fails against Spark's int64 (r05 lesson)
      SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS cnt,
             min(mn) AS mn, max(mx) AS mx,
             sum(sx) AS sx, sum(sxx) AS sxx
      FROM partial
    )
    SELECT 'o_totalprice' AS col_name, n AS n_rows, cnt AS n_nonnull,
           round(mn, 6) AS min, round(mx, 6) AS max,
           round(CASE WHEN cnt > 0 THEN sx / cnt END, 6) AS mean,
           round(CASE WHEN cnt > 1 AND (cnt * sxx - sx * sx) / (cnt * (cnt - 1)) >= 0
                      THEN sqrt((cnt * sxx - sx * sx) / (cnt * (cnt - 1))) END, 6)
             AS stddev
    FROM merged
    """,
)
def orders_profile_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental profiling: per-status partial moment rows merged
    into whole-relation statistics (profiling.py
    ``profile_numeric_partial`` + ``merge_profiles``) — the
    shard-then-merge shape that lets a 100 TB profile update from a
    day's partial instead of a re-scan. The oracle replays the SAME
    two-level structure so the merge itself is what's verified."""
    from ..operators import profiling as PF

    o = load_table(spark, sf_dir, "orders")
    partials = PF.profile_numeric_partial(o, ["o_totalprice"], "o_orderstatus")
    return PF.merge_profiles(partials)


# --------------------------------------------------------------------------
# Skyline (Pareto front) + sub-document (chunk) dedup
# --------------------------------------------------------------------------


@query(
    "part_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_size, p.p_retailprice,
           CAST(NOT EXISTS (
             SELECT 1 FROM part q
             WHERE q.p_size <= p.p_size AND q.p_retailprice <= p.p_retailprice
               AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice)
           ) AS INT) AS on_skyline
    FROM part p
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front over (size, price), minimizing both (stats.py
    ``skyline_2d``): the quadratic NOT-EXISTS becomes a sort-sweep
    prefix-MIN executed with the packing.py two-pass decomposition
    (MIN is a monoid) — one hash shuffle, no SinglePartition
    exchange. The oracle is the INDEPENDENT naive quadratic
    formulation, so the sweep identity itself is what's verified."""
    from ..operators import stats as ST

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return ST.skyline_2d(p, "p_size", "p_retailprice", "p_partkey")


@query(
    "duplicate_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NTOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), 40)) AS start
      FROM t
    ),
    c AS (
      SELECT doc_id,
             CAST(start / 40 AS INT) AS chunk_id,
             array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text,
             least(50, len(toks) - start) AS n_tokens
      FROM s
    ),
    fp AS (
      SELECT md5(chunk_text) AS chunk_fp, doc_id, chunk_id
      FROM c WHERE n_tokens > 0
    )
    SELECT chunk_fp, count(*) AS n_copies,
           min(doc_id) AS first_doc, min(chunk_id) AS first_chunk
    FROM fp GROUP BY chunk_fp HAVING count(*) >= 2
    """,
)
def duplicate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-level) dedup: exact duplicate
    50-token chunks ACROSS documents — the RefinedWeb-style
    finer-grain pass that doc-level dedup misses (boilerplate
    headers, repeated paragraphs). Chunking reuses the oracle-pinned
    token-window expression; only the 16-byte fingerprint shuffles,
    never chunk text."""
    from ..functions import textops as TX

    d = load_table(spark, sf_dir, "documents")
    chunks = TX.chunk_documents(d, "doc_id", "text", chunk_tokens=50, stride=40)
    return (
        chunks.select("doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_fp"))
        .groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("first_doc"),
            F.min("chunk_id").alias("first_chunk"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# --------------------------------------------------------------------------
# Running z-score anomaly flags (batch twin of the stateful stream op)
# --------------------------------------------------------------------------


@query(
    "event_running_zscore",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS value FROM events
    ),
    m AS (
      SELECT user_id, ts, value,
             count(value) OVER w AS n,
             sum(value) OVER w AS sx,
             sum(value * value) OVER w AS sxx
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, ts, value,
           CAST(n >= 5
                AND (CASE WHEN n > 1 AND (n * sxx - sx * sx) / (n * (n - 1)) > 0
                          THEN sqrt((n * sxx - sx * sx) / (n * (n - 1)))
                          ELSE 0.0 END) > 0
                AND round(abs(value - sx / n), 9) >
                    round(3.0 * (CASE WHEN n > 1 AND
                                          (n * sxx - sx * sx) / (n * (n - 1)) > 0
                                      THEN sqrt((n * sxx - sx * sx) / (n * (n - 1)))
                                      ELSE 0.0 END), 9)
                AS INT) AS is_anomaly
    FROM m
    """,
)
def event_running_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window anomaly flags: each event scored against the
    running mean/stddev of the user's PRIOR events (streaming/
    stateful.py ``running_zscore_batch`` — the batch-first twin of
    the ``applyInPandasWithState`` stream operator, whose keyed
    state is three scalars per user forever). Per-user windows:
    partition-parallel, no global sort."""
    from ..streaming import stateful as STF

    e = load_table(spark, sf_dir, "events")
    return STF.running_zscore_batch(
        e, "user_id", "ts", "value", tiebreak_col="event_id"
    )
