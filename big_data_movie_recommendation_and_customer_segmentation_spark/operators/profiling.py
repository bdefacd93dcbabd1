"""Data profiling and declarative quality constraints — the
pre-training-run audit a 100 TB pipeline fronts every ingest with
(the deequ/Great-Expectations niche, expressed as plain aggregates).

Both operators are ONE full-relation aggregation regardless of how
many columns/constraints are requested: every statistic is an agg
expression in the same ``groupBy().agg(...)`` pass (map-side
combined), and the per-column/per-constraint rows are unpivoted from
that single result row with ``stack`` — a driver-free, scan-once
plan. No per-column jobs, no driver loops over ``collect()``.

The reference validates nothing (its loaders inferSchema clean CSVs
and go — reference: codes/Customer Segmentation/part1/
top_100_pairs.py:26, codes/Movie Recommendation/part3/
partition.py:11); profiling is table stakes for an engine
meant to ingest web-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame, cols: list[str], *, round_to: int = 6
) -> DataFrame:
    """Single-pass numeric profile: one output row per column with
    ``n_rows, n_nonnull, n_null, n_distinct, min, max, mean,
    stddev`` (sample stddev via the moment formula — replayable as
    SQL sums by any engine; null when n < 2).

    All statistics for all columns ride one aggregation; the
    row-per-column shape comes from ``stack`` over that single row.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"_cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(x).alias(f"_min_{c}"),
            F.max(x).alias(f"_max_{c}"),
            F.sum(x).alias(f"_sx_{c}"),
            F.sum(x * x).alias(f"_sxx_{c}"),
        ]
    one = df.agg(*aggs)

    # stack(n, label1, struct1, ...) → one row per column, computed
    # from the single agg row (no second scan).
    pieces = []
    for c in cols:
        n = F.col(f"_cnt_{c}")
        sx, sxx = F.col(f"_sx_{c}"), F.col(f"_sxx_{c}")
        mean = F.when(n > 0, sx / n)
        var = F.when(n > 1, (n * sxx - sx * sx) / (n * (n - 1)))
        stddev = F.when(var >= 0, F.sqrt(var))
        pieces.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                n.alias("n_nonnull"),
                (F.col("_n") - n).alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.round(F.col(f"_min_{c}"), round_to).alias("min"),
                F.round(F.col(f"_max_{c}"), round_to).alias("max"),
                F.round(mean, round_to).alias("mean"),
                F.round(stddev, round_to).alias("stddev"),
            )
        )
    return one.select(F.explode(F.array(*pieces)).alias("_p")).select("_p.*")


def check_constraints(
    df: DataFrame,
    row_checks: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Declarative data-quality report: one output row per
    constraint with ``check_name, n_rows, n_violations, passed``.

    ``row_checks`` maps name → boolean Column that must hold per row
    (nulls count as violations — a check that can't evaluate didn't
    pass). ``unique_keys`` maps name → key columns that must be
    globally unique; uniqueness violations = n_rows − n_distinct(key)
    and ride the SAME single aggregation as the row checks
    (count_distinct is the only extra shuffle-free-partial agg).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for name, cond in row_checks.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_v_{name}")
        )
    for name, keys in (unique_keys or {}).items():
        aggs.append(
            F.count_distinct(*[F.col(k) for k in keys]).alias(f"_d_{name}")
        )
    one = df.agg(*aggs)

    pieces = []
    for name in row_checks:
        pieces.append(
            F.struct(
                F.lit(name).alias("check_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_v_{name}").alias("n_violations"),
                (F.col(f"_v_{name}") == 0).cast("int").alias("passed"),
            )
        )
    for name in unique_keys or {}:
        v = F.col("_n") - F.col(f"_d_{name}")
        pieces.append(
            F.struct(
                F.lit(name).alias("check_name"),
                F.col("_n").alias("n_rows"),
                v.alias("n_violations"),
                (v == 0).cast("int").alias("passed"),
            )
        )
    return one.select(F.explode(F.array(*pieces)).alias("_p")).select("_p.*")


def profile_numeric_partial(
    df: DataFrame, cols: list[str], shard_col: str
) -> DataFrame:
    """Per-shard MERGEABLE profile state: raw moments (counts, min,
    max, Σx, Σx²) per (shard, column) — the incremental-pipeline
    form of :func:`profile_numeric`. Rounded stats are NOT mergeable
    (a mean of means is wrong under skewed shard sizes); moments
    are, by plain addition — so a 100 TB daily profile is one
    partial per ingest day plus a trivial merge, never a re-scan.

    One aggregation keyed by the shard column; same stack-unpivot as
    the direct profile. (``n_distinct`` is deliberately absent: exact
    distinct does not merge — use the KMV sketch family for that.)
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs += [
            F.count(x).alias(f"_cnt_{c}"),
            F.min(x).alias(f"_min_{c}"),
            F.max(x).alias(f"_max_{c}"),
            F.sum(x).alias(f"_sx_{c}"),
            F.sum(x * x).alias(f"_sxx_{c}"),
        ]
    one = df.groupBy(F.col(shard_col).alias("shard")).agg(*aggs)
    pieces = []
    for c in cols:
        pieces.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_cnt_{c}").alias("n_nonnull"),
                F.col(f"_min_{c}").alias("min"),
                F.col(f"_max_{c}").alias("max"),
                F.col(f"_sx_{c}").alias("sx"),
                F.col(f"_sxx_{c}").alias("sxx"),
            )
        )
    return one.select("shard", F.explode(F.array(*pieces)).alias("_p")).select(
        "shard", "_p.*"
    )


def merge_profiles(partials: DataFrame, *, round_to: int = 6) -> DataFrame:
    """Merge per-shard moment rows (:func:`profile_numeric_partial`
    output) into whole-relation statistics: counts and moment sums
    add, min/max fold — then the same mean/stddev finalization as
    the direct profile. ≤ |shards|·|cols| input rows: driver-free
    and trivially cheap at any corpus size.
    """
    m = partials.groupBy("col_name").agg(
        F.sum("n_rows").alias("_N"),
        F.sum("n_nonnull").alias("_cnt"),
        F.min("min").alias("_min"),
        F.max("max").alias("_max"),
        F.sum("sx").alias("_sx"),
        F.sum("sxx").alias("_sxx"),
    )
    n, sx, sxx = F.col("_cnt"), F.col("_sx"), F.col("_sxx")
    mean = F.when(n > 0, sx / n)
    var = F.when(n > 1, (n * sxx - sx * sx) / (n * (n - 1)))
    stddev = F.when(var >= 0, F.sqrt(var))
    return m.select(
        "col_name",
        F.col("_N").alias("n_rows"),
        F.col("_cnt").alias("n_nonnull"),
        F.round(F.col("_min"), round_to).alias("min"),
        F.round(F.col("_max"), round_to).alias("max"),
        F.round(mean, round_to).alias("mean"),
        F.round(stddev, round_to).alias("stddev"),
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Hot-key diagnostics for shuffle planning: the ``top_k``
    heaviest keys with their row share, cumulative share, and skew
    ratio (key count / mean count over all keys) — the report that
    decides whether a join needs salting (relational.py
    ``salted_join``) before it runs at scale.

    One map-side-combined shuffle builds per-key counts; totals and
    key cardinality reduce from THAT relation (no second data scan).
    The top-k cut is ``orderBy().limit()`` — TakeOrderedAndProject,
    per-partition heaps merged on the driver, never a global
    row_number over the (possibly huge) key relation. The rank +
    cumulative windows then run over ``top_k`` rows — bounded by
    construction.
    """
    from pyspark.sql import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    w_rank = Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
    top = (
        counts.orderBy(F.col("n").desc(), F.col(key_col).asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(tot))
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return top.select(
        key_col,
        "rank",
        "n",
        F.round(F.col("n") / F.col("_total"), round_to).alias("share"),
        F.round(F.sum("n").over(w_cum) / F.col("_total"), round_to).alias("cum_share"),
        F.round(F.col("n") * F.col("_n_keys") / F.col("_total"), round_to).alias("skew_ratio"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    *,
    round_to: int = 6,
) -> DataFrame:
    """Pearson correlation for EVERY pair of numeric columns in ONE
    scan: the aggregate computes per-column sums/sum-of-squares and
    per-pair cross-products (k + k(k-1)/2 expressions), then plain
    column math unpivots to tidy ``(col_a, col_b, n, corr)`` rows —
    the profiling step before feature selection, at the cost of a
    single map-side-combined scalar aggregate regardless of row
    count (the reference computes correlations one pair at a time in
    a driver numpy loop — codes/Customer Segmentation/part2/
    correlation_optimised.py:44-55).

    Rows with a null in EITHER column of a pair are excluded from
    that pair's moments (pairwise deletion, matching SQL ``corr``).
    Zero-variance columns yield null corr. Output has one row per
    unordered pair (col_a < col_b in ``cols`` order).
    """
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            both = F.col(a).isNotNull() & F.col(b).isNotNull()
            x = F.when(both, F.col(a).cast("double"))
            y = F.when(both, F.col(b).cast("double"))
            tag = f"{i}_{cols.index(b)}"
            aggs += [
                F.count(x).alias(f"_n_{tag}"),
                F.sum(x).alias(f"_sx_{tag}"),
                F.sum(y).alias(f"_sy_{tag}"),
                F.sum(x * y).alias(f"_sxy_{tag}"),
                F.sum(x * x).alias(f"_sxx_{tag}"),
                F.sum(y * y).alias(f"_syy_{tag}"),
            ]
    moments = df.agg(*aggs)
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            tag = f"{i}_{cols.index(b)}"
            n = F.col(f"_n_{tag}").cast("double")
            sx, sy = F.col(f"_sx_{tag}"), F.col(f"_sy_{tag}")
            sxy, sxx, syy = F.col(f"_sxy_{tag}"), F.col(f"_sxx_{tag}"), F.col(f"_syy_{tag}")
            den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
            corr = F.when(den2 > 0, (n * sxy - sx * sy) / F.sqrt(den2))
            rows.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"_n_{tag}").cast("long").alias("n"),
                    F.round(corr, round_to).alias("corr"),
                )
            )
    return moments.select(F.explode(F.array(*rows)).alias("_r")).select("_r.*")


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    *,
    n_bins: int = 10,
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    sample of one numeric column: ``psi = Σ_bins (p_i - q_i) ·
    ln(p_i / q_i)`` with equi-width bins fitted on the BASELINE's
    range — the train/serve drift check run before trusting a model
    in production (rule of thumb: <0.1 stable, >0.25 shifted).

    Bin edges come from one (min, max) aggregate on the baseline and
    broadcast to both sides; each side then pays one
    map-side-combined bin count (out-of-range current values clamp
    into the edge bins, so mass never silently disappears).
    ``epsilon`` floors empty-bin proportions — the standard guard
    that keeps ln() finite while still penalizing mass appearing in
    a bin the baseline never saw.

    Output: per-bin rows ``(bin, p_baseline, p_current,
    psi_term)`` plus the total under bin = -1 — one relation so the
    gate value-checks both the decomposition and the headline
    number.
    """
    v = F.col(value_col).cast("double")
    bounds = baseline.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))

    def binned(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("_w", (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)))
            .withColumn(
                "bin",
                F.when(
                    F.col("_w") > 0,
                    F.least(
                        F.lit(n_bins - 1),
                        F.greatest(F.lit(0), F.floor((v - F.col("_lo")) / F.col("_w"))),
                    ),
                )
                .otherwise(F.lit(0))
                .cast("int"),
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("_c"))
        )

    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    b = binned(baseline).withColumnRenamed("_c", "_cb")
    c = binned(current).withColumnRenamed("_c", "_cc")
    tb = baseline.agg(F.count(F.lit(1)).alias("_nb"))
    tc = current.agg(F.count(F.lit(1)).alias("_nc"))
    grid = (
        spine.join(b, "bin", "left")
        .join(c, "bin", "left")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tc))
        # empty side -> null proportions -> null psi (PSI is undefined
        # without both samples; surfaced, not divided-by-zero)
        .withColumn("_p", F.when(F.col("_nb") > 0,
                                 F.greatest(F.coalesce("_cb", F.lit(0)) / F.col("_nb"),
                                            F.lit(epsilon))))
        .withColumn("_q", F.when(F.col("_nc") > 0,
                                 F.greatest(F.coalesce("_cc", F.lit(0)) / F.col("_nc"),
                                            F.lit(epsilon))))
        .withColumn("psi_term", F.round((F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")), round_to))
    )
    per_bin = grid.select(
        "bin",
        F.round("_p", round_to).alias("p_baseline"),
        F.round("_q", round_to).alias("p_current"),
        "psi_term",
    )
    total = grid.agg(
        F.lit(-1).cast("int").alias("bin"),
        F.lit(None).cast("double").alias("p_baseline"),
        F.lit(None).cast("double").alias("p_current"),
        F.round(F.sum((F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q"))), round_to).alias("psi_term"),
    )
    return per_bin.unionByName(total)


def embedding_quality_report(
    df: DataFrame,
    vec_col: str,
    expected_dim: int,
    *,
    round_to: int = 6,
) -> DataFrame:
    """One-row quality screen for an embedding column — the checks an
    ANN index build should run BEFORE quantizing 10^9 vectors: wrong
    dimensionality, nulls, exact-zero vectors (unnormalizable), and
    non-finite elements, plus the L2-norm distribution (a collapsed
    or exploding norm histogram is the classic symptom of a bad
    encoder export).

    All counts and moments come from ONE pass: the norm is a
    JVM-side higher-order ``aggregate`` over the array (no UDF), and
    the distribution uses exact percentiles (swap to
    ``approx_percentile`` at extreme scale, same shape).
    """
    v = F.col(vec_col)
    norm_sq = F.aggregate(
        F.coalesce(v, F.array()),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    has_nonfinite = F.exists(
        F.coalesce(v, F.array()),
        lambda x: F.isnan(x.cast("double")) | (F.abs(x.cast("double")) > F.lit(1e308)),
    )
    base = df.select(
        v.isNull().cast("long").alias("_null"),
        (v.isNotNull() & (F.size(v) != expected_dim)).cast("long").alias("_wrong_dim"),
        F.when(v.isNotNull(), F.sqrt(norm_sq)).alias("_norm"),
        F.when(v.isNotNull() & (norm_sq == 0), 1).otherwise(0).cast("long").alias("_zero"),
        F.when(v.isNotNull() & has_nonfinite, 1).otherwise(0).cast("long").alias("_nonfinite"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_null").alias("n_null"),
        F.sum("_wrong_dim").alias("n_wrong_dim"),
        F.sum("_zero").alias("n_zero_vectors"),
        F.sum("_nonfinite").alias("n_nonfinite"),
        F.round(F.avg("_norm"), round_to).alias("norm_mean"),
        F.round(F.expr("percentile(_norm, 0.5)"), round_to).alias("norm_p50"),
        F.round(F.expr("percentile(_norm, 0.95)"), round_to).alias("norm_p95"),
    )
