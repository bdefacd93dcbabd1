"""Custom stateful streaming operators (north-star extension; the
reference has no streaming — SURVEY §2.I).

``applyInPandasWithState`` is the sanctioned escape hatch when the
built-in windowed aggregations can't express the semantics: state is
partitioned by key across executors (scale bound = per-key state
size, not stream size), batches arrive as Arrow-backed pandas
frames, and watermark/timeout config bounds state retention for
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def running_user_totals(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running (count, sum) maintained as keyed state,
    emitting one updated row per user per micro-batch.

    The batch-mode oracle is simply ``groupBy(user).agg(count,
    sum)`` — the streaming test asserts the final state equals it.
    State per key is two scalars, so 10⁹ users ≈ a few GB spread
    over the cluster's state stores: safe at scale.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{user_col} long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each key,
    dropping re-deliveries that arrive within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is bounded by the
    watermark, unlike ``dropDuplicates`` whose state grows forever).
    The streaming leg of the dedup ladder: at-least-once sources
    (Kafka, file backfills) become effectively-once downstream.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
