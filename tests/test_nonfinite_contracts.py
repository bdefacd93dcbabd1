"""Non-finite (inf/NaN) input contracts across the statistical
operators — the r11 self-initiated sweep, the sequel to r10's NULL
sweep. The r11 advisor found one CRASH in this class (approxQuantile
returns inf/nan boundaries when the order column contains them;
``_bucket_expr`` rendered them as unresolvable ``infD``/``nanD``
column refs). This file pins the uniform contract after that fix:

  Non-finite values are DATA, not missing. Complete-case exclusion
  applies only to NULL; inf/NaN flow through under Spark's total
  order (NaN greater than everything, equal to itself) — every
  operator must (a) never fail plan analysis, (b) never silently
  drop a non-null row, and (c) stay deterministic. Statistics over
  poisoned windows/groups may honestly propagate inf/NaN.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import evaluate as EV
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import profiling as PR
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import segmentation as SG
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import stats as ST
from big_data_movie_recommendation_and_customer_segmentation_spark.operators.packing import (
    bucketed_running_sum,
)

INF, NAN = float("inf"), float("nan")


def test_binary_auc_survives_nonfinite_scores(spark):
    """The advisor's repro: an Infinity score reaches binary_auc's
    quantile-boundary bucket expression — previously UNRESOLVED_COLUMN
    `infD` at analysis. Now: inf ranks top, counts stay consistent."""
    base = [(float(i), int(i > 4)) for i in range(10)]
    d = spark.createDataFrame(base + [(INF, 1)], "s double, y int")
    (row,) = EV.binary_auc(d, "y", "s").collect()
    assert row["n_pos"] + row["n_neg"] == 11  # nothing silently dropped
    assert row["auc"] is not None
    # NaN ranks ABOVE every finite score (Spark total order): a
    # negative-labeled NaN at the top of a perfect ranking costs AUC
    d2 = spark.createDataFrame([(1.0, 0), (2.0, 1), (NAN, 0)], "s double, y int")
    (r2,) = EV.binary_auc(d2, "y", "s").collect()
    assert (r2["auc"], r2["n_pos"], r2["n_neg"]) == (0.5, 1, 2)


def test_running_sum_orders_nonfinite_correctly(spark):
    """±inf order keys land in the right buckets (the fixed
    _bucket_expr falls back to F.lit for non-finite boundaries) and
    the global prefix sum stays exact."""
    rows = [(float(i), 1) for i in range(20)] + [(INF, 1), (-INF, 1)]
    df = spark.createDataFrame(rows, "x double, w int")
    got = {r["x"]: r["running_total"] for r in bucketed_running_sum(df, "x", "w").collect()}
    assert got[-INF] == 1  # -inf sorts first
    assert got[INF] == 22  # inf sorts last; nothing dropped
    assert got[0.0] == 2


def test_quantile_bucket_nonfinite_get_top_bucket(spark):
    """inf/NaN exceed every finite cut, so they land deterministically
    in the TOP bucket — a non-null value never gets a NULL bucket
    (only genuinely-missing NULLs do, per the NULL contract)."""
    d = spark.createDataFrame(
        [(float(i),) for i in range(10)] + [(INF,), (NAN,)], "v double"
    )
    rows = SG.quantile_bucket(d, "v", 4).collect()
    by_val = {str(r["v"]): r["bucket"] for r in rows}
    assert by_val["inf"] == 4 and by_val["nan"] == 4
    assert all(r["bucket"] is not None for r in rows)


def test_psi_drift_inf_baseline_conserves_mass(spark):
    """An inf in the baseline degenerates the equi-width bins (width
    = inf → everything clamps into bin 0) but mass is conserved on
    both sides and the headline PSI stays finite — drift reporting
    degrades, it does not crash or lose rows."""
    b = spark.createDataFrame([(float(i),) for i in range(10)] + [(INF,)], "v double")
    c = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    rows = PR.psi_drift(b, c, "v").collect()
    (tot,) = [r for r in rows if r["bin"] == -1]
    assert tot["psi_term"] is not None and math.isfinite(tot["psi_term"])
    eps_slack = 10 * 1e-6  # epsilon-floored empty bins
    assert abs(sum(r["p_baseline"] for r in rows if r["bin"] >= 0) - 1) < eps_slack
    assert abs(sum(r["p_current"] for r in rows if r["bin"] >= 0) - 1) < eps_slack


def test_histogram_inf_degenerates_without_row_loss(spark):
    """inf in the data makes the equi-width histogram degenerate
    (infinite width → one populated bin) but Σ bin_count still equals
    the row count — no silent loss."""
    d = spark.createDataFrame([(float(i),) for i in range(10)] + [(INF,)], "v double")
    rows = ST.histogram_fixed(d, "v", 5).collect()
    assert sum(r["bin_count"] for r in rows) == 11


def test_ewma_nan_poisons_only_its_window(spark):
    """A NaN value propagates NaN exactly while it sits inside the
    W-observation window, then the series recovers — the honest
    truncated-EWMA semantics (no silent skip that would desync the
    weight denominator)."""
    rows = [("g", i, NAN if i == 3 else float(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = {r["t"]: r["ewma"] for r in ST.ewma_lagsum(df, ["g"], ["t"], "v", window=4).collect()}
    assert all(math.isnan(out[t]) for t in (3, 4, 5, 6))  # NaN inside window
    assert math.isfinite(out[2]) and math.isfinite(out[7])  # before/after


def test_trend_and_winsorized_propagate_not_crash(spark):
    """Moment-based statistics over inf-poisoned groups report
    inf/NaN honestly (visible, debuggable) instead of crashing or
    silently excluding the rows."""
    t = spark.createDataFrame(
        [("g", i, INF if i == 5 else float(i)) for i in range(8)],
        "g string, x int, y double",
    )
    (row,) = ST.group_linear_trend(t, "g", "x", "y").collect()
    assert row["n_points"] == 8  # the inf row is counted, not dropped
    w = spark.createDataFrame(
        [("g", float(i)) for i in range(10)] + [("g", INF)], "g string, v double"
    )
    (wr,) = ST.winsorized_stats(w, "g", "v").collect()
    assert wr["n"] == 11 and wr["winsorized_mean"] == INF
