"""Event-time windowed aggregation (north-star extension; reference
has no streaming — SURVEY §2.I).

``F.window`` / ``F.session_window`` work identically on batch and
streaming DataFrames, so each operator here is written once and
reused by ``stream_*`` wrappers that attach a watermark. Batch-first
testing (the DuckDB oracle checks the batch semantics); the
streaming smoke test drives the same code through a memory sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_aggs(aggs: Sequence[Column]) -> Sequence[Column]:
    """GroupedData.agg(*[]) raises — an aggs-free call counts events
    (the natural windowed default) instead of crashing (r9 review)."""
    return aggs if aggs else (F.count(F.lit(1)).alias("n_events"),)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Fixed, non-overlapping event-time windows. One shuffle keyed
    on (window, group keys); partial aggregation map-side. Output
    columns: window_start, window_end, group keys, aggregates."""
    out = df.groupBy(F.window(ts_col, duration), *group_by).agg(*_default_aggs(aggs))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_by,
        *[c for c in out.columns if c != "window" and c not in group_by],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Overlapping windows (each row lands in duration/slide
    windows — the row amplification is explicit and bounded)."""
    out = df.groupBy(F.window(ts_col, duration, slide), *group_by).agg(*_default_aggs(aggs))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_by,
        *[c for c in out.columns if c != "window" and c not in group_by],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session windows: events of one key merge while gaps stay
    < ``gap``. Output: session_start, session_end(last event + gap),
    group keys, aggregates. The SQL-oracle equivalent is the classic
    lag/cumsum gap-detection rewrite."""
    out = df.groupBy(F.session_window(ts_col, gap), *group_by).agg(*_default_aggs(aggs))
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *group_by,
        *[c for c in out.columns if c != "session_window" and c not in group_by],
    )


def stream_tumbling_counts(
    spark,
    source_dir: str,
    schema,
    ts_col: str,
    duration: str,
    watermark: str = "1 hour",
    group_by: Sequence[str] = (),
) -> "DataFrame":
    """The same tumbling aggregation as a Structured Streaming query
    over a file source, with a watermark bounding late-data state.
    Returns the streaming DataFrame; caller attaches a sink
    (memory sink in tests; kafka/delta in production)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), *group_by)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_by,
            "n",
        )
    )
