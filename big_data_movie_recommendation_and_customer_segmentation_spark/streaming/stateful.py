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


def _round9_half_up(x):
    """Round a float64 numpy array to 9 decimals matching Spark
    ``F.round(col, 9)`` on doubles: BigDecimal HALF_UP over the
    value's shortest decimal repr.

    The vectorized ``floor(x·1e9 + 0.5)`` fast path agrees except
    when the binary-scaled value sits within float error of a
    half-integer (r10 advice — the binary multiply can land on the
    other side of the decimal half boundary); those few elements are
    recomputed via ``Decimal(repr(x)).quantize(1e-9, HALF_UP)``,
    the same quantization the JVM performs (`BigDecimal.valueOf`
    stringifies via ``Double.toString``; Python ``repr`` produces
    the same shortest round-trip decimal, modulo pre-JDK-19
    ``Double.toString`` corner cases). Band = ~4 ulp of the scaled
    value + absolute slack; callers pass non-negative values, where
    HALF_UP == half-away-from-zero.
    """
    import numpy as np

    scaled = x * 1e9
    fast = np.floor(scaled + 0.5) / 1e9
    band = np.abs(scaled) * 4e-16 + 1e-6
    near = np.abs(scaled - np.floor(scaled) - 0.5) <= band
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        nine = Decimal("1e-9")
        fast = fast.copy()
        fast[near] = [
            float(Decimal(repr(float(v))).quantize(nine, ROUND_HALF_UP))
            for v in np.asarray(x)[near]
        ]
    return fast


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


def streaming_kmv_distinct(
    stream: DataFrame,
    group_col: str,
    hash_col: str = "_h",
    k: int = 256,
) -> DataFrame:
    """Streaming KMV distinct-count estimate per group (the streaming
    leg of ``operators.sketches.kmv_distinct``): keyed state is the k
    smallest value-hashes seen so far — O(k) longs per group forever,
    no watermark needed because the sketch never grows.

    KMV merge is a set union followed by re-taking the k smallest,
    which is associative, commutative, and idempotent — so the
    incremental estimate equals the batch estimate over the same
    rows no matter how the stream is micro-batched OR re-delivered
    (at-least-once safe). The batch-equivalence test asserts exactly
    that with maxFilesPerTrigger=1.

    Callers hash upstream (``textops.shared_token_hash60`` on the
    value column) so batch and stream share the identical hash.
    Emits (group, n_distinct_est, n_seen, n_batches) per group per
    micro-batch; the final emission per group is the answer.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, n_distinct_est long, n_seen long, n_batches long"
    )
    state_schema = "hashes array<long>, n_batches long"
    space = float(1 << 60)

    def update(key, pdfs, state: GroupState):
        hashes, n_batches = state.get if state.exists else ([], 0)
        merged = set(hashes)
        for pdf in pdfs:
            merged.update(int(h) for h in pdf[hash_col])
        kept = sorted(merged)[:k]
        n_batches += 1
        state.update((kept, n_batches))
        n_seen = len(kept)
        if n_seen < k:
            est = n_seen
        else:
            # same rounding as Spark's F.round (half away from zero;
            # values are positive) so stream == batch bit-for-bit
            import math

            est = int(math.floor((k - 1) * space / kept[-1] + 0.5))
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "n_distinct_est": [est],
                "n_seen": [n_seen],
                "n_batches": [n_batches],
            }
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def running_zscore_flags(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    *,
    cutoff: float = 3.0,
    min_history: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming anomaly flags: each event is scored against the
    RUNNING mean/stddev of the key's PRIOR events (Welford-style
    keyed state: n, Σx, Σx² — three scalars per key, constant
    forever, no watermark needed). An event with
    |v − mean_prev| > cutoff · stddev_prev after ``min_history``
    prior observations flags as an anomaly; early events never flag
    (no stable baseline yet).

    Batch-first contract: the batch oracle is the expanding-window
    formulation (``running_zscore_batch``) — prior-moment windows
    per key ordered by time — and the equivalence test feeds the
    same events through both paths. Within a micro-batch, rows are
    processed in ``ts`` order so replays are deterministic: the
    whole micro-batch is concatenated BEFORE the sort
    (``applyInPandasWithState`` delivers it as multiple Arrow-sized
    chunks, and per-chunk sorting scored events against future
    moments whenever a key spanned chunks — r9 review), with
    ``tiebreak_col`` available for keys whose events share a
    timestamp (mirroring the batch twin). The threshold compare
    rounds both sides to 9 decimals with the same HALF_UP-on-
    shortest-decimal-repr quantization Spark's ``F.round`` applies
    to doubles (near-boundary elements go through
    ``decimal.Decimal(repr(x))`` — the binary ``floor(x·1e9+0.5)``
    shortcut alone can land on the other side of a half-integer,
    r10 advice), so a boundary event agrees with the batch twin up
    to the JVM's pre-JDK-19 ``Double.toString`` shortest-repr corner
    cases.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, {ts_col} timestamp, {value_col} double, is_anomaly int"
    )
    state_schema = "n long, sx double, sxx double"

    _r9 = _round9_half_up

    def update(key, pdfs, state: GroupState):
        n0, sx0, sxx0 = state.get if state.exists else (0, 0.0, 0.0)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((n0, sx0, sxx0))
            return
        sort_keys = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            sort_keys, kind="mergesort"
        )
        v = pdf[value_col].to_numpy(np.float64)
        # exact loop-order prefixes: cumsum with the carried state as
        # the first element reproduces ((sx0+v0)+v1)+... bit-for-bit
        sx = np.cumsum(np.concatenate(([sx0], v)))
        sxx = np.cumsum(np.concatenate(([sxx0], v * v)))
        n = n0 + np.arange(len(v) + 1)
        n_p, sx_p, sxx_p = n[:-1], sx[:-1], sxx[:-1]
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = sx_p / n_p
            var = np.where(
                n_p > 1, (n_p * sxx_p - sx_p * sx_p) / (n_p * (n_p - 1)), 0.0
            )
        std = np.sqrt(np.where(var > 0, var, 0.0))
        flag = (
            (n_p >= min_history)
            & (std > 0)
            & (_r9(np.abs(v - mean)) > _r9(cutoff * std))
        ).astype(np.int32)
        state.update((int(n[-1]), float(sx[-1]), float(sxx[-1])))
        yield pd.DataFrame(
            {
                key_col: key[0],
                ts_col: pdf[ts_col].values,
                value_col: v,
                "is_anomaly": flag,
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def running_zscore_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    *,
    cutoff: float = 3.0,
    min_history: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Batch twin of :func:`running_zscore_flags`: prior-row moment
    windows per key (rows UNBOUNDED PRECEDING → 1 PRECEDING, ordered
    by time) — partitioned by key, so fully parallel; the per-key
    history is the only sequential dimension, exactly like the
    streaming state. This is the oracle the stream/batch equivalence
    test pins.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(v).over(w)
    sx = F.sum(v).over(w)
    sxx = F.sum(v * v).over(w)
    mean = sx / n
    var = F.when(n > 1, (n * sxx - sx * sx) / (n * (n - 1))).otherwise(F.lit(0.0))
    std = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
    # the threshold compare rounds both sides to 9 decimals so
    # engine-specific window-aggregation association order (running
    # accumulation vs segment tree) can't flip a boundary flag
    flag = (
        (n >= min_history)
        & (std > 0)
        & (F.round(F.abs(v - mean), 9) > F.round(F.lit(cutoff) * std, 9))
    ).cast("int")
    return df.withColumn("is_anomaly", flag).select(
        key_col,
        ts_col,
        F.col(value_col).cast("double").alias(value_col),
        "is_anomaly",
    )


def decayed_count_state(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    *,
    half_life_hours: float = 24.0,
) -> DataFrame:
    """Streaming exponentially-decayed counter: per key the state is
    TWO scalars ``(score, last_ts)`` — on each event the score decays
    by ``0.5^(Δt/half_life)`` and increments by 1, emitting the
    running decayed count as of that event. Constant state forever
    (the decay itself forgets; no watermark, no window buffers) —
    the streaming form of ``temporal.decayed_counts``' trending
    signal.

    Batch-first contract: ``decayed_count_batch`` computes the same
    per-event trajectory with a normalized prefix-sum window, and
    the stream/batch equivalence test feeds identical events through
    both. Within a micro-batch rows process in ``ts`` order — the
    WHOLE micro-batch concatenated before the sort (per-chunk
    sorting made Δt negative whenever a key spanned Arrow chunks,
    multiplying the score by 0.5^(negative) > 1 — r9 review) — and
    Δt comes from a JVM-side ``cast('double')`` true-epoch column
    exactly like the batch twin, not from naive session-local pandas
    timestamps that mis-measure gaps across DST in non-UTC sessions.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, {ts_col} timestamp, decayed_count double"
    state_schema = "score double, last_ts double"
    hl_secs = half_life_hours * 3600.0

    def update(key, pdfs, state: GroupState):
        score, last = state.get if state.exists else (0.0, None)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((score, last if last is not None else 0.0))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            "_epoch_s", kind="mergesort"
        )
        epochs = pdf["_epoch_s"].to_list()
        counts = []
        for t in epochs:
            if last is not None:
                score = score * (0.5 ** ((t - last) / hl_secs))
            score += 1.0
            last = t
            counts.append(round(score, 6))
        state.update((score, last if last is not None else 0.0))
        yield pd.DataFrame(
            {key_col: key[0], ts_col: pdf[ts_col].values, "decayed_count": counts}
        )

    with_epoch = stream.withColumn("_epoch_s", F.col(ts_col).cast("double"))
    return with_epoch.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def decayed_count_batch(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    *,
    half_life_hours: float = 24.0,
) -> DataFrame:
    """Batch twin of :func:`decayed_count_state`: the running decayed
    count at event i is ``Σ_{j≤i} 0.5^((ts_i - ts_j)/hl)``, computed
    as a per-key prefix sum of ``2^((ts_j - ts0)/hl)`` (ts0 = the
    key's min ts, so exponents stay bounded) deflated by
    ``2^(-(ts_i - ts0)/hl)``. One keyed window pass. Overflow bound:
    the span/half-life ratio must stay under ~1000 half-lives per
    key (2^1000 overflows double) — renormalize in segments beyond
    that; the equivalence test pins the identity on month-scale data.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hl_secs = half_life_hours * 3600.0
    t = F.col(ts_col).cast("double")
    w_all = Window.partitionBy(key_col)
    w = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    base = F.min(t).over(w_all)
    up = F.pow(F.lit(2.0), (t - base) / F.lit(hl_secs))
    return df.withColumn(
        "decayed_count",
        F.round(
            F.sum(up).over(w) * F.pow(F.lit(2.0), -(t - base) / F.lit(hl_secs)),
            6,
        ),
    ).select(key_col, ts_col, "decayed_count")
