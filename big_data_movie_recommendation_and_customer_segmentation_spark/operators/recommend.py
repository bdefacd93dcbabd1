"""Recommendation operators (reference S4a/S4b/S4c parity).

The reference's popularity recommenders
(``codes/Movie Recommendation/part4/popularity_evalutaion.py``,
``popularity_tuned.py``, ``popularity_with_bias_evaluation.py``)
share one pipeline: score items on the train split, keep the top
``n_candidates``, cross-join onto target users, drop already-seen
pairs, truncate per user to k. Re-expressed here as composable
operators, with two deliberate fixes over the reference (SURVEY §7):

- candidate ranking: the reference truncates per-user candidates by
  ``movieId`` order (``popularity_evalutaion.py:52-54``), discarding
  the popularity ranking inside the top-1000; the engine ranks by
  score desc (item id as tiebreaker). ``compat_item_order=True``
  reproduces the reference exactly for golden-parity runs.
- list determinism: prediction lists are built with an explicit
  in-array sort, never relying on collect_list order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import (
    anti_join,
    broadcast_cross_candidates,
    grouped_list_sorted_by,
    per_group_topk,
    topk,
)


def popularity_scores(
    ratings: DataFrame,
    item_col: str,
    rating_col: str,
    bias: float = 0.0,
    min_ratings: int = 1,
) -> DataFrame:
    """Per-item damped popularity: score = Σrating / (count + bias).

    bias=0 + avg ↔ S4a's plain average (``popularity_evalutaion.py:27-29``);
    bias>0 ↔ S4b's Bayesian-damped score (``popularity_tuned.py:36-38``,
    report p.4: best b=1000). One map-side-combined aggregate; the
    shuffle carries one row per item per map task.

    Output: item, n_ratings, score.

    NULL-rating rows are dropped first: ``n_ratings`` previously
    counted rows the Σrating skipped, silently deflating the damped
    score below what ``avg`` (which ignores NULLs) computes at
    bias=0 — breaking the documented S4a equivalence on NULL-bearing
    input (r10 self-review).
    """
    ratings = ratings.filter(F.col(rating_col).isNotNull())
    return (
        ratings.groupBy(F.col(item_col).alias("item"))
        .agg(
            F.count(F.lit(1)).alias("n_ratings"),
            F.sum(rating_col).alias("_total"),
        )
        .filter(F.col("n_ratings") >= min_ratings)
        .withColumn("score", F.col("_total") / (F.col("n_ratings") + F.lit(float(bias))))
        .drop("_total")
    )


def top_items(scores: DataFrame, n: int = 1000) -> DataFrame:
    """Bounded candidate dimension: top-n items by score
    (``popularity_evalutaion.py:31-32`` — TakeOrderedAndProject, so
    no global sort)."""
    return topk(scores, [F.col("score").desc(), F.col("item").asc()], n)


def recommend_unseen_topk(
    users: DataFrame,
    candidate_items: DataFrame,
    seen: DataFrame,
    user_col: str = "user",
    k: int = 100,
    compat_item_order: bool = False,
) -> DataFrame:
    """Top-k unseen candidate items per user.

    users: one column (``user_col``); candidate_items: (item, score)
    bounded; seen: (user, item) pairs to exclude.

    Pipeline = C4 broadcast cross join → C3 anti join → E2 per-user
    top-k (``popularity_evalutaion.py:42-54``). Shuffles: anti join
    + window both key on user — AQE reuses one exchange when
    partitioning aligns. Output: user, item, score, rank.
    """
    users = users.select(F.col(user_col).alias("user"))
    cands = broadcast_cross_candidates(users, candidate_items.select("item", "score"))
    unseen = anti_join(cands, seen.select("user", "item"), ["user", "item"])
    order = (
        [F.col("item").asc()]
        if compat_item_order
        else [F.col("score").desc(), F.col("item").asc()]
    )
    return per_group_topk(unseen, "user", order, k, rank_col="rank", keep_rank=True)


def prediction_lists(recommendations: DataFrame) -> DataFrame:
    """(user, predicted: array<item>) ranked lists from
    ``recommend_unseen_topk`` output — explicit rank-sorted arrays
    (never raw collect_list order, SURVEY §7 hard-part 1)."""
    return grouped_list_sorted_by(recommendations, "user", "rank", "item", out="predicted")


def truth_lists(ratings: DataFrame, user_col: str, item_col: str) -> DataFrame:
    """(user, actual: array<item>) ground-truth item lists
    (``popularity_evalutaion.py:58-61`` without the order bug —
    sorted by item id for determinism; ranking metrics treat truth
    as a set)."""
    return (
        ratings.select(F.col(user_col).alias("user"), F.col(item_col).alias("item"))
        .groupBy("user")
        .agg(F.array_sort(F.collect_set("item")).alias("actual"))
    )


def negative_samples(
    candidates: DataFrame,
    user_col: str,
    item_col: str,
    k: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-user negative sampling for implicit-feedback
    training: from a (user, item) candidate relation (typically the
    unseen-pairs output of the candidate generator), keep k items
    per user chosen by md5 hash order — uniform over each user's
    candidates, RNG-free, replayable.

    The reference never builds negatives — its training prep stops
    at the positives split (reference: codes/Movie Recommendation/
    part3/partition.py); here the hash
    IS the randomness and selection compiles to WindowGroupLimit
    (each task keeps ≤ k rows per user before the single per-user
    exchange — the balanced-sampler shape).

    Output: user, item, ``neg_rank`` (1..k).
    """
    from .relational import per_group_topk

    h = F.md5(
        F.concat(
            F.lit(seed),
            F.col(user_col).cast("string"),
            F.lit("|"),
            F.col(item_col).cast("string"),
        )
    )
    return per_group_topk(
        candidates.withColumn("_h", h),
        user_col,
        [F.col("_h").asc(), F.col(item_col).asc()],
        k,
        rank_col="neg_rank",
        keep_rank=True,
    ).drop("_h")


def item_cf_recommendations(
    history: DataFrame,
    neighbors: DataFrame,
    *,
    user_col: str,
    item_col: str,
    n: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Item-based collaborative filtering: score each unseen item for
    a user as the SUM of item-item similarities between that item and
    the items the user already interacted with — the classic
    Sarwar et al. 2001 item-kNN recommender. The reference's only
    neighbor structure is user-pair and driver-resident (reference:
    codes/Customer Segmentation/part1/top_100_pairs.py:58-88 MinHash
    dict + LSH index in driver memory); here the item-side analogue
    stays a DataFrame end to end on both relations.

    Inputs: ``history`` = distinct (user, item) interactions;
    ``neighbors`` = (item, neighbor, cosine) from
    ``association.item_cosine_neighbors`` (already top-k-truncated
    per item, which is what bounds the fan-out).

    Plan: history ⋈ neighbors on item (shuffle on item id — the
    neighbor relation is k rows per catalog item; co-partition or
    broadcast when the catalog fits), anti-join to drop items the
    user has already seen, one keyed aggregation for the score, and
    a WindowGroupLimit top-n per user. Fan-out is |history| × k rows
    — linear in history, never |users| × |catalog|.

    Determinism: score = round(sum of 6-dp cosines, round_to); ties
    broken by ascending item id.
    """
    cand = (
        history.select(F.col(user_col), F.col(item_col).alias("_seen"))
        .join(neighbors.select(F.col("item").alias("_seen"), "neighbor", "cosine"), "_seen")
        .select(F.col(user_col), F.col("neighbor").alias(item_col), "cosine")
    )
    unseen = anti_join(cand, history, [user_col, item_col])
    scored = unseen.groupBy(user_col, item_col).agg(
        F.round(F.sum("cosine"), round_to).alias("score"),
        F.count(F.lit(1)).alias("n_contributors"),
    )
    return per_group_topk(
        scored,
        user_col,
        [F.col("score").desc(), F.col(item_col).asc()],
        n,
        rank_col="rank",
        keep_rank=True,
    )


def user_cf_recommendations(
    history: DataFrame,
    user_pairs: DataFrame,
    *,
    user_col: str,
    item_col: str,
    sim_col: str = "jaccard",
    k_neighbors: int = 10,
    n: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """User-based collaborative filtering: recommend the items a
    user's top-k most similar users have that the user lacks, scored
    by the SUM of neighbor similarities — the user-kNN recommender
    (Resnick et al. 1994 GroupLens shape), and the natural consumer
    of the reference's customer-pair similarity pipeline (reference:
    S1 top_100_pairs.py ranks the pairs and stops; this operator is
    the "so what" that turns pairs into recommendations).

    Inputs: ``history`` = distinct (user, item); ``user_pairs`` =
    undirected (user_a < user_b, sim) from
    ``similarity.exact_jaccard_pairs`` (round ``sim_col`` first if
    oracle parity matters).

    Plan: direct the pair relation both ways (unionByName), keep
    k_neighbors per user via WindowGroupLimit (this is the fan-out
    governor), join neighbors' histories on the neighbor key
    (user-keyed shuffle), anti-join seen, one keyed aggregation, then
    top-n per user. Fan-out bounded at |users| × k_neighbors ×
    avg-basket — linear in history for fixed k.
    """
    from .relational import anti_join as _anti, per_group_topk as _topk

    directed = user_pairs.select(
        F.col("user_a").alias(user_col),
        F.col("user_b").alias("_nb"),
        F.col(sim_col).alias("_sim"),
    ).unionByName(
        user_pairs.select(
            F.col("user_b").alias(user_col),
            F.col("user_a").alias("_nb"),
            F.col(sim_col).alias("_sim"),
        )
    )
    top = _topk(
        directed, user_col, [F.col("_sim").desc(), F.col("_nb").asc()], k_neighbors
    )
    cand = top.join(
        history.select(F.col(user_col).alias("_nb"), F.col(item_col)), "_nb"
    ).select(user_col, item_col, "_sim")
    unseen = _anti(cand, history, [user_col, item_col])
    scored = unseen.groupBy(user_col, item_col).agg(
        F.round(F.sum("_sim"), round_to).alias("score"),
        F.count(F.lit(1)).alias("n_contributors"),
    )
    return _topk(
        scored,
        user_col,
        [F.col("score").desc(), F.col(item_col).asc()],
        n,
        rank_col="rank",
        keep_rank=True,
    )
