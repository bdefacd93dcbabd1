"""Feature-engineering primitives for model training at corpus scale.

The reference feeds raw ids into ALS and stops; a production training
pipeline needs leakage-safe categorical encodings. Everything here is
keyed aggregations + broadcast-back — one data-sized shuffle per
encoder, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    out_col: str = "te_loo",
    prior_weight: float = 0.0,
    round_to: int = 6,
    sum_round: int | None = 2,
) -> DataFrame:
    """Leave-one-out target encoding: each row's category is encoded
    as the mean target of OTHER rows in the same category,
    ``(sum_c - y) / (n_c - 1)`` — the leakage-safe form of mean
    encoding (plain mean encoding leaks each row's own label into
    its feature; LOO is the standard fix, e.g. CatBoost's ordered
    variant approximates it).

    ``prior_weight`` m blends toward the global mean
    (``(sum_c - y + m·mu) / (n_c - 1 + m)``) — the smoothing that
    keeps rare categories from memorizing single labels. Singleton
    categories (n_c = 1) yield the prior mean when m > 0 and null
    when m = 0 — surfaced, not imputed silently.

    ``sum_round`` quantizes the per-category sum and global mean
    (default 2 — exact for money-typed targets whose sums are 2-dp
    decimals, realigning cross-engine summation-order ulp drift to
    identical doubles). Targets that are NOT 2-dp decimals (ratings,
    log values) would be silently perturbed by the default (ADVICE
    r5) — pass a finer quantization or ``sum_round=None`` to encode
    the raw float sums.

    Rows with a NULL target (inference-time rows scored through the
    same encoder) have nothing to leave out: they get the smoothed
    FULL category mean ``(sum_c + m·mu) / (n_c + m)`` instead of the
    silent NULL the LOO arithmetic previously propagated (``sum_c −
    NULL`` is NULL — r10 self-review). Labeled rows are unchanged.

    Cost: one map-side-combined keyed aggregate (|categories| rows,
    broadcast back) + one scalar aggregate for the prior. The encode
    itself is pure column math — no second data shuffle.
    """
    tsum = F.sum(F.col(target_col).cast("double"))
    if sum_round is not None:
        tsum = F.round(tsum, sum_round)
    stats = df.groupBy(cat_col).agg(
        tsum.alias("_sum"),
        F.count(target_col).alias("_n"),
    )
    prior = df.agg((tsum / F.count(target_col)).alias("_mu"))
    joined = df.join(F.broadcast(stats), cat_col).crossJoin(F.broadcast(prior))
    y = F.col(target_col).cast("double")
    denom = F.col("_n") - 1 + F.lit(prior_weight)
    num = F.col("_sum") - y + F.lit(prior_weight) * F.col("_mu")
    full_denom = F.col("_n") + F.lit(prior_weight)
    full_num = F.col("_sum") + F.lit(prior_weight) * F.col("_mu")
    encoded = F.when(y.isNotNull(), F.when(denom > 0, num / denom)).otherwise(
        F.when(full_denom > 0, full_num / full_denom)
    )
    return joined.withColumn(out_col, F.round(encoded, round_to)).drop(
        "_sum", "_n", "_mu"
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Weight of Evidence per category level and the feature's total
    Information Value — the credit-scoring-standard categorical
    screen: ``woe = ln(share_of_positives / share_of_negatives)``
    per level, ``iv = Σ (p_share - n_share) · woe`` (rule of thumb:
    IV < 0.02 useless, > 0.3 strong). ``target_col`` is 0/1.

    One map-side-combined shuffle to per-level (positives,
    negatives); shares divide by the broadcast global totals;
    epsilon floors zero shares so ln stays finite (a level with no
    positives carries large-negative WOE, not infinity). Output:
    per-level rows ``(level, n_pos, n_neg, woe, iv_term)`` plus the
    total IV under level = null.

    NULL categories are dropped (complete-case, the same contract as
    ``chi_square_independence``): the total row is keyed by
    ``level = null``, so a genuine NULL category previously COLLIDED
    with it — the output held two indistinguishable null-level rows
    (r10 self-review).
    """
    df = df.filter(F.col(cat_col).isNotNull())
    y = F.col(target_col).cast("long")
    lv = df.groupBy(F.col(cat_col).alias("level")).agg(
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1) - y).alias("n_neg"),
    )
    tot = lv.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn")
    )
    g = (
        lv.crossJoin(F.broadcast(tot))
        .withColumn("_ps", F.greatest(F.col("n_pos") / F.col("_tp"), F.lit(epsilon)))
        .withColumn("_ns", F.greatest(F.col("n_neg") / F.col("_tn"), F.lit(epsilon)))
        .withColumn("_woe", F.log(F.col("_ps") / F.col("_ns")))
    )
    per_level = g.select(
        "level",
        "n_pos",
        "n_neg",
        F.round("_woe", round_to).alias("woe"),
        F.round((F.col("_ps") - F.col("_ns")) * F.col("_woe"), round_to).alias("iv_term"),
    )
    total = g.agg(
        F.lit(None).cast(df.schema[cat_col].dataType).alias("level"),
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
        F.lit(None).cast("double").alias("woe"),
        F.round(F.sum((F.col("_ps") - F.col("_ns")) * F.col("_woe")), round_to).alias("iv_term"),
    )
    return per_level.unionByName(total)
