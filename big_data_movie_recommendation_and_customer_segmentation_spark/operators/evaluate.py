"""Evaluation operators (reference K7–K9).

The reference mixes two APIs: RDD-based ``mllib RankingMetrics`` fed
by a pickled row-lambda (``popularity_evalutaion.py:62-70`` — a
JVM→Python-worker round trip per row) and the DataFrame-native
``RankingEvaluator`` (``popularity_tuned.py:71-73``). The engine
pins everything to the DataFrame evaluators — no Python-worker hop —
and hand-verifies metric definitions on a micro-fixture
(SURVEY §7 hard-part 3: mllib vs ml differ subtly on truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _joined_lists(predicted: DataFrame, actual: DataFrame) -> DataFrame:
    """Inner-join per-user prediction/truth lists (C2,
    ``popularity_evalutaion.py:62``) and cast item lists to double —
    RankingEvaluator consumes array<double>."""
    return (
        predicted.join(actual, "user")
        .filter(F.size("actual") > 0)
        .select(
            F.col("user"),
            F.col("predicted").cast("array<double>").alias("predicted"),
            F.col("actual").cast("array<double>").alias("actual"),
        )
    )


def ranking_metrics(predicted: DataFrame, actual: DataFrame, k: int = 100) -> dict[str, float]:
    """precisionAtK / MAP / ndcgAtK on (user, predicted[]) vs
    (user, actual[]) — K7/K8 (``popularity_evalutaion.py:67-70``,
    ``popularity_tuned.py:71-73``, ``als_latent_factors.py:60-64``).

    Three evaluator passes over one cached join; each is a single
    aggregate on pre-grouped lists, so the expensive part (building
    the lists) is paid once upstream.
    """
    from pyspark.ml.evaluation import RankingEvaluator

    joined = _joined_lists(predicted, actual).cache()
    try:
        out: dict[str, float] = {"n_users": float(joined.count())}
        if out["n_users"] == 0:
            # RankingEvaluator raises "empty collection" on an empty
            # eval slice — a pipeline over a filtered holdout must
            # degrade to NaN metrics, not crash the job.
            return out | {"precision_at_k": float("nan"), "map": float("nan"), "ndcg_at_k": float("nan")}
        for metric, param in (
            ("precision_at_k", {"metricName": "precisionAtK", "k": k}),
            ("map", {"metricName": "meanAveragePrecision"}),
            ("ndcg_at_k", {"metricName": "ndcgAtK", "k": k}),
        ):
            ev = RankingEvaluator(predictionCol="predicted", labelCol="actual", **param)
            out[metric] = ev.evaluate(joined)
        return out
    finally:
        joined.unpersist()


def rmse(predictions: DataFrame, label_col: str = "rating", prediction_col: str = "prediction") -> float:
    """Regression RMSE (K9, ``als_latent_factors.py:97-100``)."""
    from pyspark.ml.evaluation import RegressionEvaluator

    ev = RegressionEvaluator(metricName="rmse", labelCol=label_col, predictionCol=prediction_col)
    return ev.evaluate(predictions)


def binary_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC AUC for a binary label vs a numeric score, via the
    Mann-Whitney rank-sum identity with average ranks for ties:

        AUC = (Σ_pos avg_rank − P(P+1)/2) / (P·N)

    where avg_rank(s) = #(scores < s) + (#(scores = s) + 1)/2.

    100 TB shape: the score relation first collapses to DISTINCT
    scores (one map-side-combined shuffle carrying (score, count,
    pos_count)); the global #(scores < s) prefix count then runs on
    the two-pass bucketed prefix sum (packing.py) — no
    SinglePartition window ever sees the data. A driver-side
    ``sortByScore.collect()`` formulation (how single-node libs do
    it) would be O(N) driver memory; rejected by construction.

    Rows with a NULL score or label are excluded (complete-case, the
    standard AUC contract): a NULL label previously counted as a
    NEGATIVE (``sum`` skipped it while ``count`` didn't) and a NULL
    score ranked as the lowest score — both silently biased the
    statistic (r10 self-review, same class as the CMS absent-key fix).

    Returns one row ``(auc, n_pos, n_neg)``.
    """
    from .packing import bucketed_running_sum

    d = (
        df.select(
            F.col(score_col).cast("double").alias("_score"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .filter(F.col("_score").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_score")
        .agg(F.count(F.lit(1)).alias("_cnt"), F.sum("_y").alias("_pos"))
    )
    with_le = bucketed_running_sum(d, "_score", "_cnt", out_col="_cnt_le")
    ranked = with_le.withColumn("_cnt_less", F.col("_cnt_le") - F.col("_cnt"))
    agg = ranked.agg(
        F.sum(
            F.col("_pos") * (F.col("_cnt_less") + (F.col("_cnt") + 1) / F.lit(2.0))
        ).alias("_rank_sum"),
        F.sum("_pos").alias("_p"),
        (F.sum("_cnt") - F.sum("_pos")).alias("_n"),
    )
    return agg.select(
        # try_divide: a single-class input has no defined AUC — null,
        # not an ANSI divide-by-zero failure
        F.round(
            F.try_divide(
                F.col("_rank_sum") - F.col("_p") * (F.col("_p") + 1) / F.lit(2.0),
                F.col("_p") * F.col("_n"),
            ),
            round_to,
        ).alias("auc"),
        F.col("_p").cast("long").alias("n_pos"),
        F.col("_n").cast("long").alias("n_neg"),
    )


def decile_lift(
    df: DataFrame,
    label_col: str,
    score_col: str,
    *,
    n_buckets: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Lift / gains table for a binary label vs a numeric score: one
    row per equi-depth score bucket (1 = lowest scores) with

    * ``n``, ``n_pos``, ``pos_rate``
    * ``lift``          — pos_rate / global base rate
    * ``cum_capture``   — share of ALL positives captured from the
      top bucket down to this one (the gains curve, read bottom-up)

    The model-evaluation companion to ``binary_auc``: AUC summarizes
    ranking quality in one number; the lift table says what acting on
    the top k% actually yields.

    100 TB shape: bucketing is the broadcast percentile ladder
    (segmentation.py ``quantile_bucket`` — no ntile SinglePartition
    window); per-bucket stats are one map-side-combined shuffle over
    ``n_buckets`` keys; base rate and the cumulative window operate
    on ``n_buckets`` rows.

    Complete-case like ``binary_auc``: rows with a NULL score or
    label are excluded — a NULL label previously inflated a bucket's
    ``n`` while ``n_pos`` skipped it, deflating that bucket's
    pos_rate and lift (r10 self-review).
    """
    from pyspark.sql import Window

    from .segmentation import quantile_bucket

    labeled = df.select(
        F.col(score_col).alias("_score"), F.col(label_col).cast("int").alias("_y")
    ).filter(F.col("_score").isNotNull() & F.col("_y").isNotNull())
    bucketed = quantile_bucket(labeled, "_score", n_buckets, out_col="bucket")
    per = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_pos")
    )
    tot = per.agg(
        F.sum("n").alias("_tn"), F.sum("n_pos").alias("_tp")
    )
    w_cum = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("pos_rate", F.col("n_pos") / F.col("n"))
        .select(
            "bucket",
            "n",
            "n_pos",
            F.round("pos_rate", round_to).alias("pos_rate"),
            F.round(
                F.col("pos_rate") / (F.col("_tp") / F.col("_tn")), round_to
            ).alias("lift"),
            F.round(F.sum("n_pos").over(w_cum) / F.col("_tp"), round_to).alias(
                "cum_capture"
            ),
        )
    )


def intra_list_diversity(
    recs: DataFrame,
    similarities: DataFrame,
    *,
    user_col: str,
    item_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Intra-list diversity (ILD): mean pairwise dissimilarity
    ``1 - sim`` inside each user's recommendation list, averaged over
    users — the third beyond-accuracy metric next to coverage@k and
    novelty (Ziegler et al. 2005 topic diversification). Pairs absent
    from the similarity relation count as fully dissimilar (sim 0),
    so ILD is measured under the same model the recommender ranked
    with.

    Inputs: ``recs`` = (user, item) lists; ``similarities`` =
    directed (item, neighbor, cosine) — e.g.
    ``association.item_cosine_neighbors`` output. Per-item top-k
    truncation can leave a pair present in only ONE direction, so
    the relation is canonicalized here by unioning its flip and
    keeping the max cosine per unordered pair (ADVICE r5: looking up
    only (_ia < _ib) scored direction-lost pairs as fully
    dissimilar, understating similarity).

    Cost: the within-list self-join emits k(k-1)/2 rows per user
    (k is the small list length, so this is list-bounded, never
    catalog-bounded); one join against the similarity relation and
    two keyed aggregations. Users with fewer than 2 recommendations
    have no pairs and drop out of the average.

    Output: one row ``(ild, n_users, n_pairs)``.
    """
    a = recs.select(F.col(user_col), F.col(item_col).alias("_ia"))
    b = recs.select(F.col(user_col), F.col(item_col).alias("_ib"))
    pairs = a.join(b, user_col).filter(F.col("_ia") < F.col("_ib"))
    directed = similarities.select(
        F.col("item").alias("_ia"), F.col("neighbor").alias("_ib"), "cosine"
    )
    flipped = similarities.select(
        F.col("neighbor").alias("_ia"), F.col("item").alias("_ib"), "cosine"
    )
    sims = (
        directed.unionByName(flipped)
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.max("cosine").alias("cosine"))
    )
    j = pairs.join(sims, ["_ia", "_ib"], "left").withColumn(
        "_d", F.lit(1.0) - F.coalesce(F.col("cosine"), F.lit(0.0))
    )
    per_user = j.groupBy(user_col).agg(
        F.avg("_d").alias("_ild"), F.count(F.lit(1)).alias("_np")
    )
    return per_user.agg(
        F.round(F.avg("_ild"), round_to).alias("ild"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum("_np").alias("n_pairs"),
    )
