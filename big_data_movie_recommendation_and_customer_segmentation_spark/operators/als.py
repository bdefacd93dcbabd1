"""ALS collaborative filtering (reference S5 parity, K4–K6, K10).

Thin, typed wrapper over ``pyspark.ml.recommendation.ALS`` — the one
reference component that was already properly distributed
(``codes/Movie Recommendation/part5/als_latent_factors.py:42-47``).
The engine adds: a fixed seed (the reference has none — SURVEY §7
hard-part 5), a cached train DataFrame across the grid sweep (the
reference re-reads per fit), and DataFrame-native evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ALSConfig:
    """Mirrors the reference's fixed hyperparameters
    (``als_latent_factors.py:42-47``, ``:77-81``): nonnegative
    factors, drop cold-start rows, best grid point rank=50 reg=0.05."""

    rank: int = 50
    reg_param: float = 0.05
    max_iter: int = 10
    implicit_prefs: bool = False
    nonnegative: bool = True
    cold_start_strategy: str = "drop"
    seed: int = 42


def fit_als(
    train: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    config: ALSConfig = ALSConfig(),
) -> Any:
    """Train an ALSModel (K4). Internally Spark blocks the factor
    matrices and alternates distributed least squares — already the
    scale path; our job is just not to break it (cache the train
    input; ints for ids)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        rank=config.rank,
        regParam=config.reg_param,
        maxIter=config.max_iter,
        implicitPrefs=config.implicit_prefs,
        nonnegative=config.nonnegative,
        coldStartStrategy=config.cold_start_strategy,
        seed=config.seed,
    )
    return als.fit(train)


def recommend_for_users(model: Any, users: DataFrame, k: int = 100) -> DataFrame:
    """Per-user top-k from the factor model (K5,
    ``als_latent_factors.py:51-56``): returns (user, item, rank) rows
    flattened from the nested array<struct> output — B3's dotted-path
    projection plus posexplode."""
    recs = model.recommendForUserSubset(users, k)
    user_col = model.getUserCol()
    return recs.select(
        F.col(user_col).alias("user"),
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user",
        F.col("rec.rating").alias("score"),
        (F.col("pos") + 1).alias("rank"),
        F.col(f"rec.{model.getItemCol()}").alias("item"),
    )


def grid_search(
    train: DataFrame,
    val_predicted_truth_fn,
    ranks: tuple[int, ...] = (5, 10, 20, 50),
    reg_params: tuple[float, ...] = (0.01, 0.05, 0.1, 1.0),
    base: ALSConfig = ALSConfig(),
) -> list[dict]:
    """Deterministic-order hyperparameter sweep (K10,
    ``als_latent_factors.py:32-40``). ``val_predicted_truth_fn(model)``
    returns the metric dict for one fitted model. Train is cached
    once — the reference refit from the raw DataFrame every
    iteration."""
    train = train.cache()
    results = []
    try:
        for rank in ranks:
            for reg in reg_params:
                cfg = ALSConfig(
                    rank=rank,
                    reg_param=reg,
                    max_iter=base.max_iter,
                    implicit_prefs=base.implicit_prefs,
                    nonnegative=base.nonnegative,
                    cold_start_strategy=base.cold_start_strategy,
                    seed=base.seed,
                )
                model = fit_als(train, "user", "item", "rating", cfg)
                metrics = val_predicted_truth_fn(model)
                results.append({"rank": rank, "reg_param": reg, **metrics})
    finally:
        train.unpersist()
    return results
