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
