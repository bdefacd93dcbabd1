"""Sequential-behavior analytics: Markov transition matrices and
frequent event paths (k-grams) over per-user ordered event streams.

Both are the window-then-aggregate shape that survives 100 TB: one
shuffle partitions the stream by user (the window), then the k-gram
rows collapse into a tiny (|event_types|^k)-keyed aggregate with
map-side partial counts — the output is catalog-sized regardless of
input rows, so the second shuffle moves almost nothing.

The reference's recommendation pipeline never models order at all
(reference: codes/Customer Segmentation/part1/top_100_pairs.py:47
collapses each user's history to an unordered collect_set); transition
structure is the sequence-aware upgrade a session-based recommender
needs, expressed here without any driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str,
    type_col: str,
    order_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive event types within each user's stream.

    Returns ``(from_type, to_type, n_transitions, prob)`` where
    ``prob`` is row-normalized per ``from_type``.

    Scale: the ``lead`` window is the only data-sized shuffle (hash
    by user); the transition aggregate is map-side combined down to
    |types|² rows, and the row-normalizing window runs over that
    catalog-sized table — effectively free.
    """
    # complete-case on the event type: a NULL type mid-stream was
    # HALF-counted — the (prev -> NULL) transition vanished via the
    # _next filter while (NULL -> nextnext) survived as a NULL
    # from_type row (r10 self-review). The stream of KNOWN events is
    # the model's domain.
    events = events.filter(F.col(type_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        events.select(user_col, type_col, *order_cols)
        .withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
    )
    counts = pairs.groupBy(
        F.col(type_col).alias("from_type"), F.col("_next").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    row_total = Window.partitionBy("from_type")
    return counts.withColumn(
        "prob",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(row_total), round_to),
    )


def event_kgrams(
    events: DataFrame,
    *,
    user_col: str,
    type_col: str,
    order_cols: list[str],
    k: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Contiguous k-grams of event types per user stream, counted
    corpus-wide: the "frequent paths" a funnel designer mines before
    fixing stage definitions.

    Returns ``(step_1 … step_k, n_paths)`` with ``n_paths >=
    min_count``. k-grams are built with ``lead`` offsets inside ONE
    window pass (no self-joins — a k-way self-join on (user, rank)
    would shuffle the stream k times for the same answer).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # same complete-case contract as transition_matrix: the step
    # filters below only check steps 2..k, so a NULL-type row
    # previously survived as a k-gram whose FIRST step is NULL while
    # any gram crossing it was dropped (r10 self-review)
    events = events.filter(F.col(type_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    df = events.select(user_col, type_col, *order_cols).withColumns(
        {f"step_{i + 1}": F.lead(type_col, i).over(w) for i in range(1, k)}
    )
    df = df.withColumnRenamed(type_col, "step_1")
    for i in range(1, k):
        df = df.filter(F.col(f"step_{i + 1}").isNotNull())
    step_cols = [f"step_{i + 1}" for i in range(k)]
    return (
        df.groupBy(*step_cols)
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .filter(F.col("n_paths") >= min_count)
    )


def sequence_cross_entropy(
    events: DataFrame,
    *,
    user_col: str,
    type_col: str,
    order_cols: list[str],
    round_to: int = 6,
) -> DataFrame:
    """Per-user predictability of the event stream: the mean
    ``-log2 P(next | current)`` of the user's transitions under the
    CORPUS-wide first-order Markov model — low cross-entropy users
    follow the crowd's patterns, high ones are erratic (bot screens,
    exploration scoring). The sequence-level counterpart of the
    unigram log-prob quality score in corpus.py.

    Plan: one user-hash window builds each user's transition pairs
    (the only data-sized shuffle — shared shape with
    ``transition_matrix``); the |types|² model relation broadcasts
    back onto the pairs; one keyed mean per user. Users with no
    transitions (single-event streams) drop out — surfaced by the
    count difference, not imputed.

    Output: ``(user, n_transitions, cross_entropy_bits)``.
    """
    events = events.filter(F.col(type_col).isNotNull())  # match the model's domain
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        events.select(user_col, type_col, *order_cols)
        .withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .select(user_col, F.col(type_col).alias("from_type"),
                F.col("_next").alias("to_type"))
    )
    model = transition_matrix(
        events, user_col=user_col, type_col=type_col, order_cols=order_cols
    ).select("from_type", "to_type", "prob")
    scored = pairs.join(F.broadcast(model), ["from_type", "to_type"])
    return scored.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.round(
            F.avg(-F.log(F.col("prob")) / F.log(F.lit(2.0))), round_to
        ).alias("cross_entropy_bits"),
    )
