"""Mergeable sketch operators (beyond reference parity).

Spark's built-in sketches — ``approx_count_distinct`` (HyperLogLog++)
and ``percentile_approx`` — are the production path for 100 TB
cardinality/quantile work (constant memory, one pass, mergeable
partials). Their internals are engine-specific though, so the
CORRECTNESS gate can only bound their error, never value-check them.

KMV (k minimum values; Bar-Yossef et al., "Counting distinct elements
in a data stream", RANDOM 2002) fills the verifiability gap: its
entire state is the k smallest values of a uniform hash of the
elements, so with the shared Spark↔DuckDB md5-prefix hash the sketch
state AND the estimate are bit-reproducible in any engine — an
approximate operator the driver's value-hash gate can check exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import shared_token_hash60
from ..sqlutil import quote_ident
from .relational import per_group_topk

# 2^60: the hash space size of shared_token_hash60, exactly
# representable as a double (mantissa is 1 bit), so the estimate
# expression is bit-identical across engines.
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_by: str | Sequence[str],
    k: int = 256,
    est_col: str = "n_distinct_est",
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Hash each value with the 60-bit md5-prefix hash, keep the k
    smallest distinct hashes per group (the sketch state), estimate

        D ≈ (k-1) · 2⁶⁰ / h₍ₖ₎

    where h₍ₖ₎ is the k-th smallest hash; groups with fewer than k
    distinct hashes are counted exactly (the sketch degenerates to
    the distinct set itself). Expected relative error ≈ 1/√k
    (~6% at k=256).

    Distributed shape: project+hash → distinct (one shuffle on
    uniform keys) → per-group k-smallest via the WindowGroupLimit-
    backed top-k (map tasks keep ≤ k rows per group before the
    exchange, so per-group state is ~k longs — the mergeable-sketch
    property, materialized as a plan shape). Versus exact
    count(distinct) at 100 TB: the final per-group state is O(k),
    not O(D).

    NULL values are excluded, matching ``count(DISTINCT col)``
    semantics: the md5 of a NULL value is NULL, which previously
    ranked FIRST under the ascending top-k (Spark sorts nulls first),
    occupying a sketch slot and inflating ``n_seen`` by one (r10
    self-review).

    Output: group cols, ``est_col`` (long), n_seen (long, = min(k,
    distinct hashes seen) — the sketch fill level).
    """
    groups = [group_by] if isinstance(group_by, str) else list(group_by)
    hashed = (
        df.select(*groups, shared_token_hash60(F.col(value_col).cast("string")).alias("_h"))
        .filter(F.col("_h").isNotNull())
        .distinct()
    )
    kept = per_group_topk(
        hashed, groups, [F.col("_h").asc()], k, rank_col="_rk", keep_rank=True
    )
    sk = kept.groupBy(*groups).agg(
        F.max("_rk").cast("long").alias("n_seen"),
        F.max("_h").alias("_kth"),
    )
    est = F.when(F.col("n_seen") < k, F.col("n_seen")).otherwise(
        F.round(F.lit(float(k - 1) * _HASH_SPACE) / F.col("_kth")).cast("long")
    )
    return sk.select(*groups, est.alias(est_col), "n_seen")


def _cms_cells_expr(key_col: str, depth: int, width: int):
    """The depth (row, bucket) cells for one key as ONE SQL-parsed
    array expr. Bucket = first 32 md5 bits of "i:key" mod width —
    deterministic and replayable by any engine, no salt state.

    SQL-parsed instead of per-row F.md5/F.conv/F.substring Column
    chains (~30 Py4J round-trips per depth row, ×2 query sides) —
    the same plan-build chatter class collapsed for the minhash
    (r9), simhash/packing (r10), and ewma (r11) columns; the parsed
    expression tree is identical (conv returns STRING, CAST BIGINT,
    ``% width`` in long, CAST INT), so plans and values are
    unchanged. ``key_col`` goes through ``quote_ident`` (ADVICE r12:
    raw backtick-wrapping broke on names containing a backtick)."""
    key = f"CAST({quote_ident(key_col)} AS STRING)"
    cells = ", ".join(
        f"named_struct('row', {i}, 'bucket', CAST(CAST(conv(substring("
        f"md5(concat('{i}:', {key})), 1, 8), 16, 10) AS BIGINT)"
        f" % {width} AS INT))"
        for i in range(depth)
    )
    return F.expr(f"array({cells})")


def count_min_sketch(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build a count-min sketch of ``key_col`` frequencies: ``depth``
    hash rows × ``width`` counters, as a (row, bucket, cnt) relation
    of ≤ depth·width rows — constant-size state for an unbounded key
    domain, and MERGEABLE by simple cnt addition across shards/days
    (the property exact top-k lacks: you cannot merge two exact
    top-100 lists, but you can always add two sketches).

    One aggregation: each input row explodes to ``depth`` (row,
    bucket) cells (array literal → explode, no UDF) and the keyed
    count is map-side combined. Estimates are ``cms_estimate``.

    NULL keys are excluded up front (complete-case, the same contract
    as ``kmv_distinct``): a NULL key's md5-derived bucket is NULL, so
    it would store sketch cells no probe can ever equi-join back to —
    dead rows that also desync the sketch from ``count(col)``
    semantics (r11 advice).
    """
    cells = _cms_cells_expr(key_col, depth, width)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(cells).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a CMS built with
    the same (depth, width): est(key) = min over rows of the key's
    bucket counter — the classic one-sided bound (est ≥ true, whp
    within εN for width ≈ e/ε). The sketch side is ≤ depth·width
    rows, ALWAYS broadcast; keys never shuffle.

    A probe key whose (row, bucket) cell was never incremented hits
    an ABSENT sketch row; that counter is zero by CMS semantics, so
    the join is LEFT with ``coalesce(cnt, 0)`` — an inner join would
    silently drop the zero counters and overestimate (or, for a key
    with no populated buckets at all, drop the key from the output
    instead of estimating 0). For keys present in the sketched data
    every bucket is populated, so this changes nothing there (r10
    self-review).

    NULL probe keys are dropped up front, mirroring the build side
    (complete-case, the ``kmv_distinct`` contract): a NULL key's
    buckets are NULL and never equi-join, so under the left join it
    would surface as a spurious est_count=0 row for a key the sketch
    by contract never stored (r11 advice).

    Output: key column + ``est_count``.
    """
    cells = _cms_cells_expr(key_col, depth, width)
    probe = keys.filter(F.col(key_col).isNotNull()).select(
        key_col, F.explode(cells).alias("_c")
    ).select(
        key_col, F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket")
    )
    return (
        probe.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
