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
