"""Temporal join/window operators (general engine surface; the
reference has none — SURVEY §2.C notes the engine exposes a
range/as-of join helper beyond parity).

``asof_join`` uses the union + keyed-window formulation rather than
a range join: tag both sides, union, one shuffle on the join keys,
sort within partition by (ts, side), and carry the last right-side
payload forward with ``last(ignorenulls)``. Cost is one exchange of
|L|+|R| rows — no row-range explosion, no theta-join, skew bounded
by the hottest key (same bound as any keyed op). The alternative
(join on key + range predicate, filter to max ts) materializes every
(left, right-before-it) pair first — quadratic per key — and is why
as-of must NOT be spelled as a plain range join at scale.

``rolling_agg`` is a thin, named wrapper over frame-spec windows
(``rowsBetween``) — per-key shuffle + in-partition sort, no
cross-partition state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the nearest right row with the same
    keys: ``direction='backward'`` (default) takes the most recent
    right row with ``right_ts <= left_ts`` (ASOF JOIN ... ON a.ts >=
    b.ts in DuckDB terms), ``direction='forward'`` the earliest right
    row with ``right_ts >= left_ts`` (ON a.ts <= b.ts). Both are
    inclusive at equality.

    ``tolerance`` (pandas merge_asof surface) bounds how far the
    match may sit from the left timestamp: an INTERVAL string (e.g.
    ``"1 hour"``) for timestamp columns, or a plain number for
    numeric ones. A nearest match beyond the bound becomes null
    (or drops under ``how='inner'``) — applied as a post-window
    column predicate, so it adds zero shuffles.

    Output: every left column, plus ``right_cols`` (null when no
    right row qualifies — or the row dropped if ``how='inner'``).

    The two directions share one physical shape — the sort direction
    of the keyed window is the ONLY difference, so forward costs
    exactly the same single exchange as backward. Right rows sort
    before left rows at equal timestamps in either direction, so an
    equal-ts right row is visible to the left row. Ties between right
    rows at the same (keys, ts) resolve to the last in sort order —
    callers needing stronger determinism should pre-dedupe right on
    (keys, ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    on = list(on)
    left_cols = list(left.columns)
    right_types = dict(right.dtypes)
    left_types = dict(left.dtypes)
    # Union with aligned schemas: left keeps its columns; right
    # contributes keys + ts + its payload packed into one struct.
    # The payload carries the right timestamp as `_rts` so the
    # tolerance bound can test how far the carried match sits.
    payload_type = (
        "struct<_rts:" + right_types[right_ts] + ","
        + ",".join(f"{c}:{right_types[c]}" for c in right_cols) + ">"
    )
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_r"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left_types[c]).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
        ).alias("_r"),
    )
    # backward walks time ascending (carry the last right row seen so
    # far); forward walks descending (the "last right row seen" is
    # then the EARLIEST right_ts >= left_ts). _side stays ascending in
    # both: right (0) before left (1) at equal ts keeps equality
    # inclusive.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}") if isinstance(tolerance, str) else F.lit(tolerance)
        gap = (
            F.col("_ts") - F.col("_match._rts")
            if direction == "backward"
            else F.col("_match._rts") - F.col("_ts")
        )
        matched = matched.withColumn(
            "_match",
            F.when(F.col("_match").isNotNull() & (gap <= tol), F.col("_match")),
        )
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *left_cols, *[F.col(f"_match.{c}").alias(c) for c in right_cols]
    )


def rolling_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    aggs: dict[str, Column],
    preceding: int = 2,
) -> DataFrame:
    """Named rolling-frame aggregation: for each row, aggregate over
    the current row and ``preceding`` prior rows within the key
    (``rowsBetween(-preceding, 0)``). ``aggs`` maps output column →
    a plain aggregate expression (``F.avg(...)``, not wrapped in
    scalar functions — ``.over`` attaches to the aggregate itself;
    apply scalar post-processing on the output column)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(order_by).asc())
        .rowsBetween(-preceding, Window.currentRow)
    )
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    grid_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval equi+range join, spelled scalably:
    intervals explode to the grid cells they cover, points map to
    their cell, the join runs on (keys, cell) — an ordinary shuffle
    hash join — and the exact [start, end) predicate refines. Never
    a nested-loop theta join: cost is |points| + Σ interval-cells,
    both linear for bounded interval lengths.

    ``grid_seconds`` trades replication for selectivity: set it near
    the typical interval length so each interval covers O(1) cells.
    Output: every point column + start/end of the matched interval
    (inner semantics; points in no interval drop).
    """
    on = list(on)
    cell = (F.unix_timestamp(F.col(point_ts)) / grid_seconds).cast("long")
    p = points.withColumn("_cell", cell)
    i_cells = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / grid_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / grid_seconds).cast("long"),
            )
        ),
    )
    return (
        p.join(i_cells, on + ["_cell"])
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("_cell")
    )


def gap_fill_daily(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    agg_exprs: dict[str, "F.Column"],
    *,
    zero_fill: list[str] | None = None,
    ffill: list[str] | None = None,
) -> DataFrame:
    """Resample an event relation to a dense per-(group, day) grid:
    aggregate to daily grain, then LEFT-join onto a complete date
    spine so silent days appear explicitly — ``zero_fill`` columns
    become 0, ``ffill`` columns carry the last observed value
    forward (``last(ignorenulls)`` over a per-group date window).

    100 TB shape: the spine is ``sequence(min_day, max_day)`` from a
    2-value global agg, exploded and broadcast-cross-joined with the
    DISTINCT group keys — spine size = |groups| × days, tiny relative
    to the event relation. The expensive side is the daily agg (one
    shuffle on (group, day)); the spine join and the forward-fill
    window reuse that same (group)-hash partitioning. No
    SinglePartition exchange: the fill window partitions by group.

    The reference has no resampler (driver pandas would reindex);
    this is the distributed equivalent of ``DataFrame.resample('D')``.
    """
    day = F.to_date(ts_col).alias("_day")
    daily = df.groupBy(*group_cols, day).agg(
        *[e.alias(n) for n, e in agg_exprs.items()]
    )

    # 2-value agg → exploded spine (runs as a 1-row broadcast side).
    bounds = df.select(
        F.min(F.to_date(ts_col)).alias("_lo"), F.max(F.to_date(ts_col)).alias("_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("_lo", "_hi", F.expr("interval 1 day"))).alias("_day")
    )
    groups = df.select(*group_cols).distinct()
    grid = groups.crossJoin(F.broadcast(spine))

    out = grid.join(daily, [*group_cols, "_day"], "left")
    for c in zero_fill or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("_day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ffill:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.withColumnRenamed("_day", "day")


def scd2_runs(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """Collapse a per-key ordered state stream into SCD Type-2
    validity runs (the gaps-and-islands problem): consecutive rows
    with the same ``state_col`` merge into one run carrying
    ``valid_from`` (first order value), ``valid_to`` (next run's
    start; null while the run is still open) and ``n_rows``.

    Algorithm: one window pass flags state changes (``lag`` +
    inequality), a running sum of flags numbers the runs, then a
    keyed aggregate collapses each run and a second catalog-small
    window derives ``valid_to`` from the successor run.

    100 TB shape: everything partitions by the SCD key — the change
    flag, run numbering, collapse, and valid_to windows all reuse ONE
    hash-by-key exchange (Catalyst collapses the co-partitioned
    windows/aggregate into a single sort-based stage per key). No
    self-join formulation (the textbook LEFT JOIN on rank+1 would
    shuffle the stream twice more for the same answer).
    """
    first_order = order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    flagged = df.withColumn(
        "_chg",
        F.when(
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col)),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    collapsed = runs.groupBy(*key_cols, "run_id", state_col).agg(
        F.min(first_order).alias("valid_from"),
        F.max(first_order).alias("last_seen"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    succ = Window.partitionBy(*key_cols).orderBy("run_id")
    return collapsed.withColumn("valid_to", F.lead("valid_from").over(succ))


def decayed_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    half_life_hours: float = 24.0,
    round_to: int = 6,
) -> DataFrame:
    """Exponentially time-decayed event counts per key, evaluated at
    the corpus max timestamp: ``score = Σ_events 0.5^(Δt / half_life)``
    — the recency-weighted popularity that replaces "count in the
    last N hours" with a smooth decay (no cliff at the window edge;
    the standard freshness signal in trending/ranking systems).

    One scalar max-ts aggregate broadcast back, then one map-side-
    combined keyed sum — same cost as a plain count at any scale.
    Decay is a pure column expression; scores at a different
    reference time T' are the returned scores × 0.5^((T'-T)/hl), so
    precomputed scores stay usable without a rescan.

    NULL-timestamp events are dropped: they previously counted in
    ``n_events`` while contributing NOTHING to ``decayed_count``
    (``sum`` skips the NULL decay term), leaving the two output
    columns describing different event sets (r10 self-review).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    tmax = df.agg(F.max(F.col(ts_col)).alias("_tmax"))
    dt_hours = (
        F.col("_tmax").cast("double") - F.col(ts_col).cast("double")
    ) / F.lit(3600.0)
    return (
        df.crossJoin(F.broadcast(tmax))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.pow(F.lit(0.5), dt_hours / F.lit(half_life_hours))),
                round_to,
            ).alias("decayed_count"),
        )
    )
