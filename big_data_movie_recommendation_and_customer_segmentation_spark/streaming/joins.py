"""Stream-stream event-time joins (north-star extension; the
reference has no streaming — SURVEY §2.I).

Batch-first like ``windows.py``: ``attribution_join`` states the join
once and runs identically on batch and streaming DataFrames; the
``stream_attribution_join`` wrapper attaches the watermarks that make
the stateful streaming execution bounded. The DuckDB oracle checks
the batch semantics; the streaming test proves batch/stream
equivalence through a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    causes: DataFrame,
    effects: DataFrame,
    user_col: str,
    cause_ts: str,
    effect_ts: str,
    lookback: str = "1 hour",
) -> DataFrame:
    """Pair every effect with the same-user causes in the preceding
    ``lookback`` window: ``effect_ts - lookback < cause_ts <=
    effect_ts`` (inclusive at the effect instant, exclusive at the
    horizon). Inputs keep their own columns; callers alias/select
    before joining so names don't collide on anything but
    ``user_col``.

    Scale shape: an equi-join on the user key with a range residual —
    one shuffle per side, no row-range explosion beyond the true
    match volume (cost tracks causes-per-user-per-window, governed by
    ``lookback``). On streams the same range condition is what lets
    Spark expire join state past the watermark + lookback horizon,
    so state is bounded regardless of stream length.
    """
    cond = (
        (causes[user_col] == effects[user_col])
        & (causes[cause_ts] <= effects[effect_ts])
        & (causes[cause_ts] > effects[effect_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    return causes.join(effects, cond, "inner").drop(effects[user_col])


def stream_attribution_join(
    spark,
    source_dir: str,
    schema,
    cause_type: str = "click",
    effect_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The same attribution join as a Structured Streaming query over
    a single event-log file source split into two filtered streams.

    Both sides carry a watermark — required for stream-stream inner
    joins so the engine can GC buffered rows: a cause row can be
    dropped once the effect-side watermark passes ``cause_ts +
    lookback``, an effect row once the cause side catches up. State
    is therefore O(rate × (watermark + lookback)), not O(stream).
    Output (append mode): user, cause id/ts, effect id/ts.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    causes = (
        stream.filter(F.col("event_type") == cause_type)
        .select(
            F.col(user_col),
            F.col(id_col).alias("cause_id"),
            F.col(ts_col).alias("cause_ts"),
        )
        .withWatermark("cause_ts", watermark)
    )
    effects = (
        stream.filter(F.col("event_type") == effect_type)
        .select(
            F.col(user_col),
            F.col(id_col).alias("effect_id"),
            F.col(ts_col).alias("effect_ts"),
        )
        .withWatermark("effect_ts", watermark)
    )
    return attribution_join(
        causes, effects, user_col, "cause_ts", "effect_ts", lookback
    )
