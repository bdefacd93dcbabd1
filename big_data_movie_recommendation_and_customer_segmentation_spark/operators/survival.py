"""Kaplan-Meier survival estimation, distributed.

Time-to-event analysis is the churn-side complement the reference's
Customer Segmentation track never reaches — it models a snapshot of
co-rating behaviour (reference: codes/Customer Segmentation/part1/
top_100_pairs.py, part2/correlation_optimised.py) and says nothing
about how long customers take to come back; a survival curve does.
The estimator is the classic product-limit form

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

where ``d_i`` is the number of events observed at duration ``t_i``
and ``n_i`` the number still at risk just before ``t_i``.

100 TB shape: the raw (subject, duration, event) relation aggregates
to one row per (group, duration) in a single map-side-combined
shuffle — bounded by |groups| x |distinct durations| (days, so
catalog-sized), NOT by subjects. Everything after that first shuffle
runs on the tiny life table: the at-risk prefix count and the
product-limit prefix both come from windows partitioned by group, so
there is no SinglePartition exchange (plan-lint clean for any
multi-group stratification). The product is computed as
``exp(sum(ln(factor)))`` with an explicit zero-factor guard so the
curve hits exactly 0.0 when the last at-risk subject has an event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def life_table(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Aggregate subject-level rows to the per-(group, duration) life
    table: ``n_events`` (event flag = 1), ``n_censored`` (event flag
    = 0), and ``n_at_risk`` (subjects whose duration >= this one).

    One shuffle builds the counts; ``n_at_risk`` is the group total
    minus the exclusive prefix of (events + censored) in duration
    order — a window over the already-tiny life table.

    Subjects with a NULL duration or event flag are dropped
    (complete-case): a NULL duration previously sorted FIRST (Spark
    nulls-first) and its departure silently deflated every later
    duration's risk set, while a NULL event flag fell out of both
    the event and censored counts but still spawned a life-table row
    (r10 self-review).
    """
    df = df.filter(F.col(duration_col).isNotNull() & F.col(event_col).isNotNull())
    counts = df.groupBy(group_col, duration_col).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum(F.lit(1) - F.col(event_col).cast("long")).alias("n_censored"),
    )
    w_all = Window.partitionBy(group_col)
    w_prefix = (
        Window.partitionBy(group_col)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    leaving = F.col("n_events") + F.col("n_censored")
    return counts.withColumn(
        "n_at_risk",
        F.sum(leaving).over(w_all) - F.coalesce(F.sum(leaving).over(w_prefix), F.lit(0)),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve per group from subject-level
    ``(group, duration, event)`` rows (event 1 = observed, 0 =
    right-censored).

    Returns one row per (group, distinct duration) with the life
    table counts and ``survival`` = S(duration). Censored-only
    durations keep S flat but still shrink the risk set — they stay
    in the output so the at-risk accounting is auditable.

    Determinism: the survival product is ``exp`` of a prefix sum of
    ``ln(1 - d/n)`` terms in duration order (a fixed expansion the
    SQL oracle replays verbatim); a prefix zero-factor counter pins
    S = 0 exactly once d_i = n_i, instead of relying on ln(0)
    semantics that differ across engines.
    """
    lt = life_table(df, duration_col, event_col, group_col)
    factor = F.lit(1.0) - F.col("n_events") / F.col("n_at_risk")
    w = (
        Window.partitionBy(group_col)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_terms = lt.withColumn(
        "_lnf", F.when(factor > 0, F.log(factor))
    ).withColumn("_zero", F.when(factor <= 0, F.lit(1)).otherwise(F.lit(0)))
    return (
        with_terms.withColumn(
            "survival",
            F.round(
                F.when(F.sum("_zero").over(w) > 0, F.lit(0.0)).otherwise(
                    F.exp(F.coalesce(F.sum("_lnf").over(w), F.lit(0.0)))
                ),
                round_to,
            ),
        )
        .drop("_lnf", "_zero")
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Nelson-Aalen cumulative hazard per group:
    ``H(t) = Σ_{t_i ≤ t} d_i / n_i`` over the same life table as
    ``kaplan_meier`` — the estimator of choice when hazard RATES
    (and their comparisons between groups) matter more than survival
    probabilities; exp(−H) is also the standard small-sample-stable
    alternative to the KM product (Fleming-Harrington).

    Identical plan shape: one life-table shuffle, one per-group
    prefix window over the |groups| × |durations| table. The hazard
    is a plain prefix SUM — no ln/exp, so no zero-factor guard is
    needed and the oracle replay is a single windowed aggregate.
    """
    lt = life_table(df, duration_col, event_col, group_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return lt.withColumn(
        "cumulative_hazard",
        F.round(F.sum(F.col("n_events") / F.col("n_at_risk")).over(w), round_to),
    )
