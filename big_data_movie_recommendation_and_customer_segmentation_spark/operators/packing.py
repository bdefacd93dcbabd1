"""Ordered running totals and token-budget shard assignment — the
"sequence packing" half of a training-data pipeline (assigning each
document to a fixed-token-budget output shard in a deterministic
global order).

The naive Spark spelling — ``sum(w) OVER (ORDER BY id)`` with no
PARTITION BY — plans as ``Exchange SinglePartition``: every row moves
to ONE task and the cluster runs single-threaded. That is the classic
100 TB scale-killer. The implementation here is the standard two-pass
prefix-sum decomposition instead:

1. bucket rows into contiguous, ordered ranges of the order column
   (quantile boundaries from a tiny driver-side sketch job);
2. local running sum per bucket — a parallel window partitioned by
   bucket;
3. per-bucket totals (map-side partial agg, ≤ num_buckets rows to the
   driver) → exclusive prefix offsets → broadcast join back.

Total data movement: ONE hash shuffle of the full relation (step 2)
plus two tiny jobs (boundary sketch, bucket totals). No
SinglePartition exchange anywhere — asserted in tests/test_packing.py.

The result is byte-identical to the single-partition window (the
bucket boundaries only decide WHERE the prefix is split, not its
value), so the oracle SQL is the plain ``SUM() OVER (ORDER BY ...)``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sqlutil import quote_ident


def _bucket_expr(order_col: str, boundaries: list[float]):
    """Bucket index for ``order_col`` given sorted range boundaries:
    Σ [col >= b] — a codegen'd add-tree of comparisons (no
    interpreted HOF lambda per element).

    SQL-parsed in ONE expr instead of a when()-chain built
    boundary-by-boundary: at the default num_buckets (the session's
    shuffle partitions) the per-boundary Column construction cost
    ~4 Py4J round-trips each on every plan build — the same chatter
    class collapsed for the minhash (r9) and simhash (r10)
    signature columns. ``repr(float)`` is the shortest round-trip
    decimal, so the parsed double literal is bit-identical to the
    F.lit it replaces.

    Non-finite boundaries (approxQuantile returns inf/nan when the
    order column contains them) have no ``{b!r}D`` spelling —
    ``infD``/``nanD`` parse as column references and fail analysis —
    so those terms fall back to the F.lit comparison the collapse
    replaced (r10 advice). The fast path is untouched when every
    boundary is finite, which is every boundary approxQuantile can
    produce from finite data. ``order_col`` goes through
    ``quote_ident`` like the other SQL collapse sites (r12
    self-review: this site was missed by the first ADVICE pass)."""
    if not boundaries:
        return F.lit(0)
    finite = [b for b in boundaries if math.isfinite(b)]
    expr = (
        F.expr(
            " + ".join(
                f"(CASE WHEN {quote_ident(order_col)} >= {b!r}D THEN 1 ELSE 0 END)"
                for b in finite
            )
        )
        if finite
        else F.lit(0)
    )
    for b in boundaries:
        if not math.isfinite(b):
            expr = expr + F.when(F.col(order_col) >= F.lit(b), 1).otherwise(0)
    return expr


def bucketed_running_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "running_total",
    num_buckets: int | None = None,
    relative_error: float = 1e-4,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Global running sum of ``weight_col`` in ``order_col`` order
    (inclusive), computed with the two-pass prefix-sum decomposition
    described in the module docstring.

    ``order_col`` must be numeric (boundaries come from
    ``approxQuantile``). For duplicated keys pass ``tiebreak_cols``:
    equal ``order_col`` values always land in the SAME bucket (the
    bucket expression is a function of the value), so a within-bucket
    tiebreak yields exactly the global order ``(order_col,
    *tiebreak_cols)`` — no tie can straddle a boundary.
    ``weight_col`` is cast to long so bucket totals are exact (FP
    prefix sums would drift by association order).

    Equivalent single-node SQL (the oracle form):
    ``sum(w) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)``.
    """
    spark = df.sparkSession
    n = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    probs = [i / n for i in range(1, n)]
    # Tiny driver-side job: Greenwald–Khanna sketch over order_col
    # only (column-pruned scan, deterministic — no RNG). n=1 → no
    # boundaries → everything in bucket 0 (approxQuantile NPEs on an
    # empty probability list).
    boundaries = (
        sorted(set(df.stat.approxQuantile(order_col, probs, relative_error)))
        if probs
        else []
    )
    grp = df.withColumn("_grp", _bucket_expr(order_col, boundaries)).withColumn(
        "_w", F.col(weight_col).cast("long")
    )

    # Pass A (tiny): per-bucket totals via map-side partial agg — the
    # exchange carries ≤ (#buckets × #map tasks) partial rows.
    totals = {
        r["_grp"]: r["_tot"]
        for r in grp.groupBy("_grp").agg(F.sum("_w").alias("_tot")).collect()
    }
    running = 0
    offsets = []
    for g in sorted(totals):
        offsets.append((g, running))
        running += totals[g]
    off_df = spark.createDataFrame(offsets, schema="_grp int, _offset long")

    # Pass B (the one full shuffle): parallel per-bucket running sum,
    # then add the broadcast exclusive prefix offset.
    win = (
        Window.partitionBy("_grp")
        .orderBy(order_col, *(tiebreak_cols or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grp.withColumn("_lcum", F.sum("_w").over(win))
        .join(F.broadcast(off_df), "_grp")
        .withColumn(out_col, (F.col("_lcum") + F.col("_offset")).cast("long"))
        .drop("_grp", "_w", "_lcum", "_offset")
    )


def assign_token_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    shard_tokens: int,
    shard_col: str = "shard_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Assign each row to a fixed-token-budget output shard: rows are
    laid out in ``order_col`` order and a new shard starts every
    ``shard_tokens`` tokens. A row belongs to the shard its FIRST
    token lands in (``start_offset div shard_tokens``), so shards are
    contiguous and every row appears exactly once.

    This is the write-side of sequence packing: downstream, each
    shard is one output file / training chunk of near-equal token
    mass regardless of document-count skew. Scale shape inherited
    from :func:`bucketed_running_sum` — one full shuffle, no
    SinglePartition exchange.

    Oracle SQL: ``(sum(w) OVER (ORDER BY id) - w) // budget``.
    """
    run = bucketed_running_sum(
        df, order_col, weight_col, out_col="_run", num_buckets=num_buckets
    )
    start = F.col("_run") - F.col(weight_col).cast("long")
    return (
        run.withColumn("_start", start)
        # `div` = exact integer division (no double rounding at 100 TB
        # token-offset magnitudes).
        .withColumn(shard_col, F.expr(f"_start div {int(shard_tokens)}"))
        .drop("_run", "_start")
    )


# ---------------------------------------------------------------------------
# Document-boundary-respecting sequence packing (SPFHP)
# ---------------------------------------------------------------------------


def _spfhp_strategies(
    histogram: dict[int, int], capacity: int, max_items: int | None = None
) -> list[tuple[tuple[int, ...], int]]:
    """Shortest-Pack-First Histogram-Packing (Krell & Kosec 2021,
    "Packing: Towards 2x NLP BERT Acceleration"): solve bin packing
    on the LENGTH HISTOGRAM instead of the document list, so the
    driver-side work is bounded by ``capacity`` (≤ C length classes,
    O(C²) worst case) no matter the corpus size — the histogram is
    the whole state, which is what makes exact-ish packing feasible
    at 100 TB.

    Greedy, longest length class first: each length's count is
    placed into the OPEN pack population with the smallest remaining
    space that still fits (shortest-pack-first ≡ best-fit on
    histogram classes); whatever doesn't fit opens new packs.
    Deterministic: state is iterated in sorted order throughout.

    Returns ``[(pattern, count)]`` — pattern a length-descending
    tuple of document lengths forming one pack, count how many packs
    use it. ``max_items`` caps documents per pack (attention-matrix
    cost control, per the paper); packs stop accepting once full.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if max_items is not None and max_items < 1:
        raise ValueError(f"max_items must be >= 1, got {max_items}")
    bad = [ln for ln in histogram if ln < 1 or ln > capacity]
    if bad:
        raise ValueError(
            f"lengths outside [1, capacity={capacity}]: {sorted(bad)[:5]} — "
            "chunk long documents first (corpus.chunk_documents) and drop "
            "empty ones; a silent split here would break the "
            "doc-boundary-respecting contract"
        )
    # open[remaining] = {pattern: count}; patterns are length-desc
    # tuples. Finished packs accumulate in done. The loop reproduces
    # the PER-DOCUMENT best-fit-decreasing greedy exactly (pinned
    # against an explicit per-pack simulation in tests): a document
    # goes to the FULLEST pack that still fits, which means a pack at
    # remaining r absorbs q = r // ln consecutive same-length docs
    # before the next pack is touched — the histogram form just moves
    # whole (remaining, pattern) classes at once.
    open_: dict[int, dict[tuple[int, ...], int]] = {}
    done: dict[tuple[int, ...], int] = {}

    def _place(rem: int, pat: tuple[int, ...], cnt: int) -> None:
        if rem < 1 or (max_items is not None and len(pat) >= max_items):
            done[pat] = done.get(pat, 0) + cnt
        else:
            open_.setdefault(rem, {})
            open_[rem][pat] = open_[rem].get(pat, 0) + cnt

    def _pop_best(ln: int) -> tuple[int, tuple[int, ...], int] | None:
        viable = [r for r in open_ if r >= ln]
        if not viable:
            return None
        rem = min(viable)
        pat = min(open_[rem])
        cnt = open_[rem].pop(pat)
        if not open_[rem]:
            del open_[rem]
        return rem, pat, cnt

    for ln in sorted(histogram, reverse=True):
        need = histogram[ln]
        while need > 0:
            hit = _pop_best(ln)
            if hit is None:
                # fresh packs: q docs each, one remainder pack
                q = min(capacity // ln, capacity if max_items is None else max_items)
                if need // q:
                    _place(capacity - q * ln, (ln,) * q, need // q)
                if need % q:
                    _place(capacity - (need % q) * ln, (ln,) * (need % q), 1)
                need = 0
                continue
            rem, pat, cnt = hit
            room = capacity if max_items is None else max_items - len(pat)
            q = min(rem // ln, room)  # docs per pack at this state
            full = min(cnt, need // q)
            if full:
                _place(rem - q * ln, pat + (ln,) * q, full)
                need -= full * q
                cnt -= full
            if cnt and 0 < need < q:
                _place(rem - need * ln, pat + (ln,) * need, 1)
                cnt -= 1
                need = 0
            if cnt:  # untouched packs of this class go back
                _place(rem, pat, cnt)
    for rem in list(open_):
        for pat, cnt in open_[rem].items():
            done[pat] = done.get(pat, 0) + cnt
    return sorted(done.items())


def spfhp_pack_assignments(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    capacity: int,
    *,
    max_items: int | None = None,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign every document to a fixed-capacity training pack
    WITHOUT splitting any document — the tokenizer-aware upgrade over
    :func:`assign_token_shards` (which packs by contiguous token
    offset and lets a document straddle two shards). Sequence packing
    with document boundaries is the published way to recover the
    ~2× padding waste of one-doc-per-sequence batching (Krell & Kosec
    2021); SPFHP gets within fractions of a percent of optimal there.

    Three-step scale shape:

    1. length histogram — one partial-aggregated groupBy; the
       ``.collect()`` is bounded at ``capacity`` rows by construction
       (lengths ≤ C), O(1) in corpus size;
    2. driver-side SPFHP over the histogram (bounded O(C²));
    3. distributed slotting: docs get a per-length rank
       (``row_number`` over a window PARTITIONED BY length — parallel
       across length classes, no SinglePartition), then meet the
       broadcast strategy demand table in an equi-join on length;
       rank ranges route each doc to exactly one pack instance.

    Deterministic end-to-end: ranks order by ``id_col``; strategy
    demand bases come from the sorted strategy list. Output: all
    original columns + ``pack_col`` (long, dense pack ids) +
    ``pack_slot`` (position of the doc within its pack's pattern).
    Every doc appears exactly once and no pack's token total exceeds
    ``capacity`` (property-pinned in tests/test_packing.py).
    """
    spark = df.sparkSession
    # bounded collect: ≤ capacity distinct lengths by the SPFHP
    # domain contract (validated inside _spfhp_strategies)
    hist_rows = (
        df.groupBy(F.col(weight_col).cast("int").alias("_len"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .collect()
    )
    n_null = sum(int(r["_cnt"]) for r in hist_rows if r["_len"] is None)
    if n_null:
        # same contract violation as lengths outside [1, capacity]
        # (ADVICE r14: int(None) used to surface as an opaque
        # TypeError): a NULL length can neither be packed nor
        # silently dropped without breaking exactly-once assignment
        raise ValueError(
            f"lengths outside [1, capacity={capacity}]: {n_null} row(s) "
            f"with NULL {weight_col} — filter or impute them first; "
            "dropping them here would silently violate the "
            "every-doc-packed-exactly-once contract"
        )
    histogram = {int(r["_len"]): int(r["_cnt"]) for r in hist_rows}
    strategies = _spfhp_strategies(histogram, capacity, max_items)

    # demand table: one row per (length, strategy) with the rank
    # range it consumes and its pack-id base. Bounded by total
    # pattern entries (≤ O(C · #strategies)) — broadcast-sized.
    demand = []
    next_rank: dict[int, int] = {}
    pack_base = 0
    for sid, (pattern, n_packs) in enumerate(strategies):
        per_len: dict[int, int] = {}
        for ln in pattern:
            per_len[ln] = per_len.get(ln, 0) + 1
        # slot index of each length's FIRST occurrence in the
        # (length-desc) pattern; a doc's slot = that offset + its
        # index among the pack's same-length docs
        slot_offsets: dict[int, int] = {}
        for acc, ln in enumerate(pattern):
            slot_offsets.setdefault(ln, acc)
        for ln, k in sorted(per_len.items()):
            base = next_rank.get(ln, 0)
            demand.append(
                (ln, sid, base, k, n_packs, pack_base, slot_offsets[ln])
            )
            next_rank[ln] = base + k * n_packs
        pack_base += n_packs
    demand_df = spark.createDataFrame(
        demand,
        "_len int, _sid int, _base long, _k int, _n long, _pack_base long, "
        "_slot_base int",
    )

    from pyspark.sql import Window as W

    ranked = df.withColumn("_len", F.col(weight_col).cast("int")).withColumn(
        "_rank",
        F.row_number().over(W.partitionBy("_len").orderBy(F.col(id_col))) - 1,
    )
    j = ranked.join(F.broadcast(demand_df), "_len").filter(
        (F.col("_rank") >= F.col("_base"))
        & (F.col("_rank") < F.col("_base") + F.col("_k") * F.col("_n"))
    )
    local = F.col("_rank") - F.col("_base")
    return (
        j.withColumn(pack_col, F.col("_pack_base") + (local / F.col("_k")).cast("long"))
        .withColumn(
            "pack_slot",
            (F.col("_slot_base") + local % F.col("_k")).cast("int"),
        )
        .drop("_len", "_rank", "_sid", "_base", "_k", "_n", "_pack_base", "_slot_base")
    )


def pack_fill_stats(
    assignments: DataFrame, weight_col: str, capacity: int, pack_col: str = "pack_id"
) -> DataFrame:
    """Packing-efficiency report over :func:`spfhp_pack_assignments`
    output: one row — (n_packs, n_docs, total_tokens, avg_fill,
    min_fill, max_fill, efficiency) where efficiency =
    total_tokens / (n_packs · capacity), the padding-waste complement
    the packing exists to maximize. Two bounded aggregations."""
    per_pack = assignments.groupBy(pack_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_fill"),
        F.count(F.lit(1)).alias("_docs"),
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("_docs").alias("n_docs"),
        F.sum("_fill").alias("total_tokens"),
        F.round(F.avg("_fill"), 3).alias("avg_fill"),
        F.min("_fill").alias("min_fill"),
        F.max("_fill").alias("max_fill"),
        F.round(
            F.sum("_fill") / (F.count(F.lit(1)) * F.lit(float(capacity))), 6
        ).alias("efficiency"),
    )
