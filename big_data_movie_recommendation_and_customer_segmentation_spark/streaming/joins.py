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
    how: str = "inner",
) -> DataFrame:
    """Pair every effect with the same-user causes in the preceding
    ``lookback`` window: ``effect_ts - lookback < cause_ts <=
    effect_ts`` (inclusive at the effect instant, exclusive at the
    horizon). Inputs keep their own columns; callers alias/select
    before joining so names don't collide on anything but
    ``user_col``.

    ``how='inner'`` returns attributed pairs only. ``how='left'``
    keeps every EFFECT row — unattributed effects (no same-user cause
    inside the window) come through once with null cause columns,
    which is what conversion/funnel analyses need to count the
    denominator. (The outer side is the effect; an outer-cause
    variant has no analytics meaning here — a cause that produced no
    effect is just an unconverted impression, countable by anti-join.)

    Scale shape: an equi-join on the user key with a range residual —
    one shuffle per side, no row-range explosion beyond the true
    match volume (cost tracks causes-per-user-per-window, governed by
    ``lookback``). On streams the same range condition is what lets
    Spark expire join state past the watermark + lookback horizon,
    so state is bounded regardless of stream length; for ``'left'``
    the engine additionally holds each effect row until the
    cause-side watermark passes ``effect_ts`` (only then is "no cause
    arrived" final) before emitting its null-joined row — same state
    bound, delayed by the watermark lag.
    """
    cond = (
        (causes[user_col] == effects[user_col])
        & (causes[cause_ts] <= effects[effect_ts])
        & (causes[cause_ts] > effects[effect_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    if how == "inner":
        return causes.join(effects, cond, "inner").drop(effects[user_col])
    if how == "left":
        # Left-outer on the EFFECT side: effects drive, causes attach.
        # The effect-side user column is renamed BEFORE the join: both
        # sides usually derive from the same scan, and dropping one of
        # two same-named columns by DataFrame-qualified reference is
        # unreliable under Spark's self-join attribute dedup (the
        # inner path masks this because matched rows agree on the
        # key; left rows don't — the cause side is null). With unique
        # names, the drop is by-name and deterministic.
        eff_user = f"__effect_{user_col}"
        e2 = effects.withColumnRenamed(user_col, eff_user)
        lcond = (
            (causes[user_col] == e2[eff_user])
            & (causes[cause_ts] <= e2[effect_ts])
            & (causes[cause_ts] > e2[effect_ts] - F.expr(f"INTERVAL {lookback}"))
        )
        return (
            e2.join(causes, lcond, "left")
            .drop(user_col)
            .withColumnRenamed(eff_user, user_col)
        )
    raise ValueError(f"how must be 'inner' or 'left', got {how!r}")


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
    how: str = "inner",
) -> DataFrame:
    """The same attribution join as a Structured Streaming query over
    a single event-log file source split into two filtered streams.

    Both sides carry a watermark — required for stream-stream joins
    so the engine can GC buffered rows: a cause row can be dropped
    once the effect-side watermark passes ``cause_ts + lookback``, an
    effect row once the cause side catches up. State is therefore
    O(rate × (watermark + lookback)), not O(stream).

    ``how='left'`` (left-outer on the effect side) keeps the same
    state bound but changes WHEN rows emit: a null-joined row for an
    unattributed effect is only correct once no matching cause can
    still arrive, i.e. once the cause-side watermark passes
    ``effect_ts`` — so outer results trail the inner results by up to
    the watermark delay. That is Spark's documented outer stream-
    stream join semantics and exactly why both watermarks here are
    mandatory, not advisory. Output (append mode): user, cause id/ts
    (nullable when 'left'), effect id/ts.
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
        causes, effects, user_col, "cause_ts", "effect_ts", lookback, how=how
    )


def multi_touch_attribution(
    causes: DataFrame,
    effects: DataFrame,
    user_col: str,
    cause_ts: str,
    effect_id: str,
    effect_ts: str,
    *,
    value_col: str | None = None,
    lookback: str = "1 hour",
    weighting: str = "linear",
    cause_id: str | None = None,
    decay_half_life_hours: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Multi-touch attribution: every cause in the effect's lookback
    window shares the credit. ``weighting='linear'`` splits equally
    (``weight = 1/n_touches``); ``weighting='position'`` is the
    U-shaped rule — 40% first touch, 40% last touch, the remaining
    20% split across the middle (1 touch → 1.0, 2 touches → 0.5
    each), crediting discovery and closing over the middle drift;
    ``weighting='time_decay'`` gives each touch weight ∝
    ``0.5^(Δt/decay_half_life_hours)`` normalized per effect — the
    recency-biased rule.
    ``attributed_value = value · weight`` when ``value_col`` is
    given. The many-touch generalization of the last-touch as-of
    join (temporal.asof_join) and the all-pairs `attribution_join`.

    Scale shape: the pair relation comes from the same equi-join +
    range residual as ``attribution_join`` (state bounded by
    lookback); the credit windows partition by ``effect_id``, whose
    partitions are exactly the per-effect touch sets — bounded by
    causes-per-user-per-window, never by stream length. Position
    ranks both derive from ONE ascending (cause_ts[, cause_id])
    ordering (last rank = n - first rank + 1), so the first and last
    0.4 shares always land on distinct touches when n >= 2 even
    under tied ``cause_ts`` with no ``cause_id``; weights sum to 1.0
    per effect regardless of ties. A ``cause_id`` still makes WHICH
    tied touch earns each share deterministic.
    """
    from pyspark.sql import Window

    if weighting not in ("linear", "position", "time_decay"):
        raise ValueError(
            f"weighting must be 'linear', 'position' or 'time_decay', got {weighting!r}"
        )
    pairs = attribution_join(
        causes, effects, user_col, cause_ts, effect_ts, lookback=lookback, how="inner"
    )
    w = Window.partitionBy(effect_id)
    out = pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
    if weighting == "linear":
        out = out.withColumn(
            "weight", F.round(F.lit(1.0) / F.col("n_touches"), round_to)
        )
    elif weighting == "time_decay":
        # weight ∝ 0.5^(Δt / half_life), normalized per effect: the
        # most recent touch before the effect earns the most credit.
        w_eff = Window.partitionBy(effect_id)
        dt_hours = (
            F.col(effect_ts).cast("double") - F.col(cause_ts).cast("double")
        ) / F.lit(3600.0)
        raw_td = F.pow(F.lit(0.5), dt_hours / F.lit(decay_half_life_hours))
        out = (
            out.withColumn("_raw", raw_td)
            .withColumn("weight", F.round(F.col("_raw") / F.sum("_raw").over(w_eff), round_to))
            .drop("_raw")
        )
    else:
        # Single ascending window; the last-touch rank is derived as
        # n_touches - rn_first + 1 rather than a second descending
        # row_number(). With two independent orderings, tied cause_ts
        # (and no cause_id) can rank the SAME row 1 in both, silently
        # dropping the 0.4 last-touch share (3 equal-ts touches paid
        # [0.4, 0.2, 0.2] — 20% of value lost). Deriving both ranks
        # from one ordering guarantees first != last whenever n >= 2,
        # ties or not, and saves a window exchange.
        asc = [F.col(cause_ts).asc()] + ([F.col(cause_id).asc()] if cause_id else [])
        w_asc = Window.partitionBy(effect_id).orderBy(*asc)
        rn_first = F.row_number().over(w_asc)
        n = F.col("n_touches")
        rn_last = n - rn_first + 1
        raw = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when(rn_first == 1, F.lit(0.4))
            .when(rn_last == 1, F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2))
        )
        out = out.withColumn("weight", F.round(raw, round_to))
    if value_col is not None:
        out = out.withColumn(
            "attributed_value",
            F.round(F.col(value_col) * F.col("weight"), round_to),
        )
    return out
