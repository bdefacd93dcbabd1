"""Rank fusion for hybrid retrieval: combine N independently-ranked
candidate lists (lexical BM25, semantic ANN, …) into one relevance
order with Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
SIGIR 2009): ``rrf(d) = Σ_lists 1 / (k0 + rank_list(d))``.

RRF is the standard score-free fusion — it needs only ranks, so the
lists' incomparable score scales (BM25 logs vs cosine) never touch
each other.

100 TB shape: fusion is a UNION + one keyed aggregate, not an N-way
outer join — input lists are already top-k truncated by their
producers, so the shuffle moves Σ|list_i| rows (thousands) no matter
how large the corpus behind them is.

The reference has no retrieval fusion — each of its rankings is
single-signal (popularity S4a, similarity S1, per SURVEY.md §1);
this is the plumbing a
RAG-corpus builder runs between recall and rerank stages.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str,
    *,
    k0: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Fuse ranked lists ``[(id_col, rank_col), …]`` (rank 1 = best)
    into ``(id_col, rrf_score, n_lists, fused_rank)``.

    ``fused_rank`` breaks score ties by ``id_col`` so the output
    order is total and replayable.

    Rows with a NULL id or rank are dropped (complete-case): a NULL
    rank previously counted in ``n_lists`` while its reciprocal
    contribution vanished from ``rrf_score`` — the fused score and
    the list count described different evidence (r10 self-review).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k0) + F.col(rank_col))).alias("_c"),
        ).filter(F.col(id_col).isNotNull() & F.col("_c").isNotNull())
        for df in rankings
    ]
    unioned = reduce(DataFrame.unionByName, contribs)
    fused = unioned.groupBy(id_col).agg(
        F.round(F.sum("_c"), round_to).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    # catalog-sized input (Σ top-k) → the global window is bounded;
    # at larger fan-in switch to the bucketed prefix-rank in
    # packing.py, same contract.
    return fused.withColumn("fused_rank", F.row_number().over(w))
