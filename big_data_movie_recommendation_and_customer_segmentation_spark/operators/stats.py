"""Grouped statistical modeling primitives: closed-form linear
trend fitting and robust (median/MAD) outlier detection.

Both are expressed as keyed aggregations over moments — the shape
that survives 100 TB: one map-side-combined shuffle per pass, group
results joined back by broadcast (group cardinality is the small
dimension in both operators).

The reference computes nothing like this distributed — its pair
statistics are driver-side numpy loops (reference: codes/Customer
Segmentation/part2/correlation_optimised.py:44-55 np.corrcoef per
pair); here every moment is a JVM-side column aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sqlutil import quote_ident


def group_linear_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit y = slope·x +
    intercept, via the closed-form moment solution:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    plus ``r2`` (squared Pearson correlation). One aggregation — five
    sums and a count per group, all map-side combinable; no window,
    no iteration, no driver math. Degenerate groups (n < 2 or zero
    x-variance) yield null slope/intercept/r2 rather than NaN.

    The moment formula (not Welford) is used deliberately: it is
    replayable as six SQL SUMs by any engine, which is what the
    DuckDB oracle does.

    Incomplete pairs (NULL x or y) are dropped first: the sums skip
    NULLs but ``count`` didn't, so a NULL-bearing row inflated n and
    corrupted every moment-derived quantity (r10 self-review — the
    OLS contract is complete-case).
    """
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    df = df.filter(x.isNotNull() & y.isNotNull())
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(den_x > 0, cov / den_x)
    intercept = F.when(den_x > 0, (sy - (cov / den_x) * sx) / n)
    r2 = F.when((den_x > 0) & (den_y > 0), (cov * cov) / (den_x * den_y))
    return agg.select(
        *group_cols,
        F.col("_n").cast("long").alias("n_points"),
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    cutoff: float = 3.0,
    scale: float = 1.4826,
    round_to: int = 6,
) -> DataFrame:
    """Robust per-group outlier flags: a row is an outlier when its
    absolute deviation from the group median exceeds
    ``cutoff · scale · MAD`` (scale 1.4826 makes MAD a consistent
    σ-estimator under normality).

    Two keyed aggregations (group median, then median absolute
    deviation) with the per-group results joined back by BROADCAST —
    group cardinality is the small side. Medians are Spark's exact
    ``percentile`` (bit-identical to DuckDB ``quantile_cont``,
    pinned by the RFM parity tests); swap for ``approx_percentile``
    at extreme group sizes — the flag logic is unchanged.

    Output: input columns + ``group_median``, ``group_mad``,
    ``is_outlier`` (int). Zero-MAD groups (>50% identical values)
    flag only exact non-equal rows when cutoff·scale·0 == 0 —
    the standard MAD degeneracy, kept as-is.
    """
    med = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    with_med = df.join(F.broadcast(med), group_cols)
    dev = F.abs(F.col(value_col) - F.col("_med"))
    mad = (
        with_med.withColumn("_dev", dev)
        .groupBy(*group_cols)
        .agg(F.percentile("_dev", F.lit(0.5)).alias("_mad"))
    )
    out = with_med.join(F.broadcast(mad), group_cols)
    return out.select(
        *df.columns,
        F.round(F.col("_med"), round_to).alias("group_median"),
        F.round(F.col("_mad"), round_to).alias("group_mad"),
        (
            F.abs(F.col(value_col) - F.col("_med"))
            > F.lit(cutoff) * F.lit(scale) * F.col("_mad")
        )
        .cast("int")
        .alias("is_outlier"),
    )


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Equi-width histogram with a dense bin spine: bin edges derive
    from a 2-value (min, max) aggregate, each row maps to
    ``least(n−1, floor((v−lo)/width))`` (pure column math), and a
    broadcast 0..n−1 spine left-joins the counts so EMPTY bins
    appear with count 0 — a histogram whose silent bins are visible
    is a different (and more useful) artifact than a sparse one.

    Degenerate case min == max puts everything in bin 0. Cost: the
    bounds pass + one keyed count; the spine is n rows.

    Output: ``bin, lo_edge, hi_edge, bin_count``.
    """
    v = F.col(value_col).cast("double")
    bounds = df.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_w", (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)))
        .withColumn(
            "bin",
            F.when(F.col("_w") > 0,
                   F.least(F.lit(n_bins - 1),
                           F.floor((v - F.col("_lo")) / F.col("_w"))))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"), "_lo", "_hi"
    ).withColumn("_w", (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)))
    return (
        spine.join(binned, "bin", "left")
        .select(
            "bin",
            F.round(F.col("_lo") + F.col("bin") * F.col("_w"), round_to).alias("lo_edge"),
            F.round(F.col("_lo") + (F.col("bin") + 1) * F.col("_w"), round_to).alias(
                "hi_edge"
            ),
            F.coalesce(F.col("bin_count"), F.lit(0)).alias("bin_count"),
        )
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    *,
    num_buckets: int | None = None,
    relative_error: float = 1e-4,
) -> DataFrame:
    """2-D skyline (Pareto front, minimizing both axes): flag rows
    not dominated by any other row (q dominates p iff q.x ≤ p.x,
    q.y ≤ p.y, strict on at least one axis).

    The naive spelling is a quadratic NOT-EXISTS theta-join (the
    oracle uses it — an INDEPENDENT formulation, not a replay); the
    plan here is the sort-sweep identity — p is dominated iff
    min{y : x' < p.x} ≤ p.y, or an equal-x row earlier in (y, id)
    order has y' < p.y — executed with the packing.py two-pass
    decomposition generalized from SUM to MIN:

    1. range-bucket on x (driver quantile sketch; equal x never
       straddles buckets);
    2. per-bucket min(y) → exclusive prefix-MIN offsets (≤ #buckets
       driver rows, broadcast);
    3. in-bucket windows: RANGE x < current for the strict-x min,
       plus a (bucket, x)-partitioned running min for equal-x ties.

    One hash shuffle total; no SinglePartition exchange — the same
    scale shape as the running-sum, because MIN is a monoid too.
    ``x_col`` must be integral (the RANGE −1 frame bound means
    x' ≤ x−1). Output: input columns + ``on_skyline`` (int).
    """
    from pyspark.sql import Window

    from .packing import _bucket_expr

    spark = df.sparkSession
    n = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    probs = [i / n for i in range(1, n)]
    boundaries = (
        sorted(set(df.stat.approxQuantile(x_col, probs, relative_error)))
        if probs
        else []
    )
    grp = df.withColumn("_grp", _bucket_expr(x_col, boundaries))

    mins = {
        r["_grp"]: r["_m"]
        for r in grp.groupBy("_grp").agg(F.min(y_col).alias("_m")).collect()
    }
    run = None
    offsets = []
    for g in sorted(mins):
        offsets.append((g, run))  # EXCLUSIVE prefix min (None for first)
        run = mins[g] if run is None else min(run, mins[g])
    off_df = spark.createDataFrame(offsets, schema=f"_grp int, _pmin double")

    w_lt = (
        Window.partitionBy("_grp")
        .orderBy(F.col(x_col).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = (
        Window.partitionBy("_grp", x_col)
        .orderBy(F.col(y_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    y = F.col(y_col)
    out = (
        grp.join(F.broadcast(off_df), "_grp")
        .withColumn("_mlt", F.least(F.min(y_col).over(w_lt), F.col("_pmin")))
        .withColumn("_meq", F.min(y_col).over(w_eq))
        .withColumn(
            "on_skyline",
            (
                (F.col("_mlt").isNull() | (F.col("_mlt") > y))
                & (F.col("_meq").isNull() | (F.col("_meq") >= y))
            ).cast("int"),
        )
    )
    return out.drop("_grp", "_pmin", "_mlt", "_meq")


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two
    categorical columns: one row ``(chi_square, dof, n)`` where
    ``chi_square = Σ_cells (obs − exp)² / exp`` over the FULL margin
    grid (cells with zero observations still contribute, since their
    expected count is positive).

    100 TB shape: one map-side-combined shuffle builds the observed
    contingency table (|A|×|B| rows — catalog-sized for categorical
    columns by definition); margins derive from that table, not from
    a second scan of the data; the zero-cell grid is a broadcast
    cross join of the two margin relations. The final Σ is an
    aggregate over the grid — no data-sized work after the first
    shuffle.

    Rows with a NULL category are dropped (complete-case): NULL
    previously entered the contingency table as a category while
    ``countDistinct`` excluded it from the dof margins — the reported
    dof disagreed with the cell grid the statistic summed over (r10
    self-review).
    """
    df = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    obs = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("_obs"))
    ma = obs.groupBy(col_a).agg(F.sum("_obs").alias("_ra"))
    mb = obs.groupBy(col_b).agg(F.sum("_obs").alias("_cb"))
    tot = obs.agg(F.sum("_obs").alias("_n"))
    grid = (
        ma.crossJoin(F.broadcast(mb))
        .join(F.broadcast(obs), [col_a, col_b], "left")
        .withColumn("_obs", F.coalesce("_obs", F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn("_exp", F.col("_ra") * F.col("_cb") / F.col("_n"))
    )
    counts = grid.agg(
        F.sum(F.pow(F.col("_obs") - F.col("_exp"), 2) / F.col("_exp")).alias("_chi"),
        F.countDistinct(col_a).alias("_na"),
        F.countDistinct(col_b).alias("_nb"),
        F.first("_n").alias("n"),
    )
    return counts.select(
        F.round("_chi", round_to).alias("chi_square"),
        ((F.col("_na") - 1) * (F.col("_nb") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Per-group winsorized mean / stddev: values are clamped to the
    group's exact interpolated [lower, upper] percentiles before the
    moments — the robust location/scale estimate that, unlike
    trimming, keeps n constant.

    Two passes over the grouped values: pass 1 computes the exact
    percentile pair per group (one shuffle, sort-based percentile
    inside the aggregate); pass 2 re-aggregates the clamped values
    (second shuffle on the same key — Catalyst reuses the hash
    partitioning for the broadcast-joined bounds). Exact percentiles
    are the oracle-matchable choice here; at 100 TB swap pass 1 to
    ``approx_percentile`` (t-digest sketch, map-side mergeable) and
    the plan shape is unchanged.
    """
    pct = df.groupBy(group_col).agg(
        F.expr(f"percentile({quote_ident(value_col)}, {lower})").alias("_plo"),
        F.expr(f"percentile({quote_ident(value_col)}, {upper})").alias("_phi"),
    )
    clipped = df.join(F.broadcast(pct), group_col).withColumn(
        "_wv", F.least(F.greatest(F.col(value_col), F.col("_plo")), F.col("_phi"))
    )
    return clipped.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("_wv"), round_to).alias("winsorized_mean"),
        F.round(F.stddev_samp("_wv"), round_to).alias("winsorized_std"),
        F.round(F.first("_plo"), round_to).alias("p_lower"),
        F.round(F.first("_phi"), round_to).alias("p_upper"),
    )


def ewma_lagsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    *,
    alpha: float = 0.3,
    window: int = 8,
    out_col: str = "ewma",
    round_to: int = 6,
) -> DataFrame:
    """Truncated exponentially-weighted moving average per group:

        ewma_t = Σ_{i=0..W-1} (1−α)^i · x_{t−i}  /  Σ_{i=0..W-1} (1−α)^i

    over the W most recent OBSERVATIONS (observation-index EWMA, not
    calendar-decay — resample first via ``gap_fill_daily`` when
    calendar spacing matters). Partial histories normalize by the
    weights actually present, so early rows are unbiased rather than
    damped toward zero.

    The W lag terms expand inside ONE per-group window pass — fixed
    W keeps the expression finite and SQL-replayable (the exact
    recursive EWMA is not window-expressible; the truncation error
    is (1−α)^W ≈ 5.8% of the tail mass at α=0.3, W=8). Numerator and
    denominator are built in identical left-to-right term order as
    the oracle so the FP quotient matches bit-for-bit; the final
    rounding is sign-aware floor-based half-up
    (``sign(x)·floor(|x|·10^k + 0.5)/10^k`` in plain double ops)
    rather than ``round()`` — Spark rounds HALF_UP on the exact
    decimal expansion while DuckDB rounds in binary, and a quotient
    within an ulp of a 6-dp boundary flips between them (3 of 12025
    rows at sf0.1 under the 17-digit canonicalizer; the same
    toolkit-class fix as PageRank/HHI/Gini). The ``sign``/``abs``
    factoring keeps HALF_UP's away-from-zero behavior for negative
    series (plain ``floor(x·10^k + 0.5)`` is half-toward-+inf, which
    silently rounded -0.1234565 to -0.123456 — r06 advisor finding);
    both engines evaluate the identical expression, so cross-engine
    equality is unaffected.

    The numerator/denominator add-trees are SQL-parsed in TWO exprs
    instead of a when()-chain built term-by-term: the per-term Column
    construction cost ~4 Py4J round-trips each (~50 per plan build at
    W=8) — the same plan-build chatter class collapsed for the
    minhash (r9), simhash (r10), and packing-bucket (r10) columns.
    The SQL text mirrors the oracle's ``_ewma_sql`` form literally
    (CAST'd repr weight literals, leading 0.0 term, identical
    left-to-right term order), so the FP quotient stays bit-for-bit
    replayable; window functions inline their OVER clause because
    F.expr has no named-WINDOW scope.
    """
    # empty group_cols = one global series (the Window.partitionBy()
    # form the SQL collapse replaced accepted it; emitting an empty
    # PARTITION BY list is a parse error — r11 self-review). Empty
    # order_cols never meant anything for a lag and now fails fast.
    if not order_cols:
        raise ValueError("ewma_lagsum requires at least one order column")
    partition = (
        "PARTITION BY " + ", ".join(quote_ident(g) for g in group_cols) + " "
        if group_cols
        else ""
    )
    over = f"OVER ({partition}ORDER BY " + ", ".join(quote_ident(o) for o in order_cols) + ")"
    num_terms, den_terms = [], []
    for i in range(window):
        lag_v = quote_ident(value_col) if i == 0 else f"lag({quote_ident(value_col)}, {i}) {over}"
        weight = f"CAST({(1.0 - alpha) ** i!r} AS DOUBLE)"
        num_terms.append(
            f"CASE WHEN {lag_v} IS NOT NULL THEN {weight} * {lag_v}"
            " ELSE CAST(0.0 AS DOUBLE) END"
        )
        den_terms.append(
            f"CASE WHEN {lag_v} IS NOT NULL THEN {weight}"
            " ELSE CAST(0.0 AS DOUBLE) END"
        )
    num: Column = F.expr("(CAST(0.0 AS DOUBLE) + " + " + ".join(num_terms) + ")")
    den: Column = F.expr("(CAST(0.0 AS DOUBLE) + " + " + ".join(den_terms) + ")")
    scale = float(10 ** round_to)
    q = num / den
    return df.withColumn(
        out_col,
        F.signum(q) * F.floor(F.abs(q) * F.lit(scale) + F.lit(0.5)) / F.lit(scale),
    )


def welch_ttest_pairs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic for EVERY pair
    of groups: ``t = (m_a - m_b) / sqrt(s2_a/n_a + s2_b/n_b)`` with
    Welch-Satterthwaite degrees of freedom — the A/B comparison that
    does not assume pooled variance. The reference compares its
    similar-pair correlations to random-pair baselines by eyeballing
    means with no test statistic (reference: codes/Customer
    Segmentation/part2/correlation_optimised.py:60-79).

    100 TB shape: ONE map-side-combined shuffle reduces the data to
    per-group (n, mean, var_samp); the pairing is a broadcast self
    cross-join of that tiny relation (|groups|^2 / 2 rows). Groups
    with n < 2 propagate null t/dof via var_samp — surfaced, not
    dropped. Output order key is (group_a, group_b) with
    group_a < group_b.
    """
    g = df.groupBy(group_col).agg(
        F.count(value_col).alias("_n"),
        F.avg(value_col).alias("_m"),
        F.var_samp(value_col).alias("_s2"),
    )
    a = g.select(
        F.col(group_col).alias("group_a"),
        F.col("_n").alias("_na"),
        F.col("_m").alias("_ma"),
        F.col("_s2").alias("_sa"),
    )
    b = g.select(
        F.col(group_col).alias("group_b"),
        F.col("_n").alias("_nb"),
        F.col("_m").alias("_mb"),
        F.col("_s2").alias("_sb"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("group_a") < F.col("group_b"))
    se2 = F.col("_sa") / F.col("_na") + F.col("_sb") / F.col("_nb")
    dof = (se2 * se2) / (
        F.pow(F.col("_sa") / F.col("_na"), 2) / (F.col("_na") - 1)
        + F.pow(F.col("_sb") / F.col("_nb"), 2) / (F.col("_nb") - 1)
    )
    return pairs.select(
        "group_a",
        "group_b",
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.round("_ma", round_to).alias("mean_a"),
        F.round("_mb", round_to).alias("mean_b"),
        F.round((F.col("_ma") - F.col("_mb")) / F.sqrt(se2), round_to).alias("t_stat"),
        F.round(dof, 2).alias("welch_dof"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information (in bits) between two categorical columns,
    with marginal entropies and the sqrt-normalized coefficient
    ``nmi = MI / sqrt(H(a) * H(b))`` — the effect-size companion to
    ``chi_square_independence`` (chi-square grows with n; NMI is
    scale-free).

    ``MI = sum_cells p_ab * log2(p_ab / (p_a * p_b))`` over OBSERVED
    cells only (empty cells contribute exactly 0, unlike chi-square's
    expected counts, so no zero-fill grid is needed).

    Same 100 TB shape as chi-square: one shuffle builds the
    contingency table; margins derive from that table; the final
    sums run over the catalog-sized grid. Degenerate single-level
    columns yield H = 0 and ``nmi`` null (0/0 guarded).

    NULL categories are dropped (complete-case) for contract
    uniformity with ``chi_square_independence`` — the two are
    documented as companions over the same inputs (r10 self-review).
    """
    df = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    obs = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("_obs"))
    ma = obs.groupBy(col_a).agg(F.sum("_obs").alias("_ra"))
    mb = obs.groupBy(col_b).agg(F.sum("_obs").alias("_cb"))
    tot = obs.agg(F.sum("_obs").alias("_n"))
    joined = (
        obs.join(F.broadcast(ma), col_a)
        .join(F.broadcast(mb), col_b)
        .crossJoin(F.broadcast(tot))
    )
    p_ab = F.col("_obs") / F.col("_n")
    p_a = F.col("_ra") / F.col("_n")
    p_b = F.col("_cb") / F.col("_n")
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    agg = joined.agg(
        F.sum(p_ab * log2(p_ab / (p_a * p_b))).alias("_mi"),
        F.first("_n").alias("n"),
    )
    ha = obs.groupBy(col_a).agg(F.sum("_obs").alias("_c")).crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("_c") / F.col("_n")) * log2(F.col("_c") / F.col("_n")))).alias("_ha")
    )
    hb = obs.groupBy(col_b).agg(F.sum("_obs").alias("_c")).crossJoin(F.broadcast(tot)).agg(
        (-F.sum((F.col("_c") / F.col("_n")) * log2(F.col("_c") / F.col("_n")))).alias("_hb")
    )
    out = agg.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    denom = F.sqrt(F.col("_ha") * F.col("_hb"))
    return out.select(
        F.round("_mi", round_to).alias("mi_bits"),
        F.round("_ha", round_to).alias("entropy_a"),
        F.round("_hb", round_to).alias("entropy_b"),
        F.round(F.when(denom > 0, F.col("_mi") / denom), round_to).alias("nmi"),
        F.col("n").cast("long").alias("n"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion pooled z test for every pair of groups:
    ``z = (p_a - p_b) / sqrt(p(1-p)(1/n_a + 1/n_b))`` with ``p`` the
    pooled success rate — the conversion-rate A/B test (the binary
    counterpart of ``welch_ttest_pairs``). ``success_col`` is 0/1
    per subject.

    Same 100 TB shape as the t-test battery: one map-side-combined
    shuffle to per-group (n, successes); the pairing is a broadcast
    self cross-join of the tiny group relation. Degenerate pairs
    (pooled p of 0 or 1 → zero variance) surface null z rather than
    dividing by zero.
    """
    g = df.groupBy(group_col).agg(
        F.count(success_col).alias("_n"),
        F.sum(F.col(success_col).cast("long")).alias("_s"),
    )
    a = g.select(
        F.col(group_col).alias("group_a"),
        F.col("_n").alias("_na"),
        F.col("_s").alias("_sa"),
    )
    b = g.select(
        F.col(group_col).alias("group_b"),
        F.col("_n").alias("_nb"),
        F.col("_s").alias("_sb"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("group_a") < F.col("group_b"))
    p_a = F.col("_sa") / F.col("_na")
    p_b = F.col("_sb") / F.col("_nb")
    pooled = (F.col("_sa") + F.col("_sb")) / (F.col("_na") + F.col("_nb"))
    var = pooled * (1 - pooled) * (1 / F.col("_na") + 1 / F.col("_nb"))
    return pairs.select(
        "group_a",
        "group_b",
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        F.round(p_a, round_to).alias("rate_a"),
        F.round(p_b, round_to).alias("rate_b"),
        F.round(
            F.when(var > 0, (p_a - p_b) / F.sqrt(var)), round_to
        ).alias("z_stat"),
    )


# Cumulative Poisson(1) probabilities for the deterministic bootstrap
# weight ladder (capped at 5; the >5 tail mass is 6e-5). The SAME
# literals appear in the SQL oracle — the ladder must match digit for
# digit for the replay to be exact.
_POISSON1_CDF = (0.3678794412, 0.7357588824, 0.9196986029,
                 0.9810118431, 0.9963401532)


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    n_replicates: int = 20,
    lower: float = 0.025,
    upper: float = 0.975,
    seed: str = "boot",
    round_to: int = 6,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the mean via the
    POISSON bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    for massive data streams"): each row independently contributes a
    Poisson(1)-distributed weight to every replicate, so resampling
    needs no global n, no sampling pass per replicate, and no shared
    state — the only bootstrap that distributes cleanly.

    RNG-free: the weight for (row, replicate) is a ladder lookup on
    ``u = md5(seed‖':'‖replicate‖':'‖id)/2^32`` against the
    Poisson(1) CDF (capped at 5), so the whole procedure — and
    therefore the CI — is bit-replayable by the SQL oracle. The ':'
    delimiters matter (ADVICE r5): without them (replicate=1,
    id='23') and (replicate=12, id='3') hash identically, correlating
    rows across replicates and weakening replicate independence.

    Cost: the explode emits n_replicates rows per input row, but
    map-side combine collapses the shuffle to |groups| × n_replicates
    partial sums — the exchange never carries data-sized volume. The
    replicate means then reduce to one row per group with exact
    interpolated percentiles over n_replicates values.

    Output: ``(group, n_rows, boot_mean, ci_lo, ci_hi)``.
    """
    b = F.explode(F.sequence(F.lit(1), F.lit(n_replicates))).alias("_b")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col("_b").cast("string"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(5)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(F.col("_u") < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    replicated = (
        df.select(F.col(group_col), F.col(value_col).cast("double").alias("_x"),
                  F.col(id_col), b)
        .withColumn("_u", u)
        .withColumn("_w", w)
    )
    means = replicated.groupBy(group_col, "_b").agg(
        (F.sum(F.col("_w") * F.col("_x")) / F.sum("_w")).alias("_mb"),
        (F.sum("_w") > 0).alias("_ok"),
    ).filter(F.col("_ok"))
    n_rows = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    out = means.groupBy(group_col).agg(
        F.round(F.avg("_mb"), round_to).alias("boot_mean"),
        F.round(F.expr(f"percentile(_mb, {lower})"), round_to).alias("ci_lo"),
        F.round(F.expr(f"percentile(_mb, {upper})"), round_to).alias("ci_hi"),
    )
    return n_rows.join(out, group_col).select(
        group_col, "n_rows", "boot_mean", "ci_lo", "ci_hi"
    )
