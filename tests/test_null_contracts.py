"""Degenerate-input (NULL) contracts across the statistical operators
(r10 self-review — the class the CMS absent-key fix exposed): an
operator whose aggregates silently skip NULLs while its counts don't
reports internally inconsistent statistics. The uniform contract is
complete-case: NULL-bearing rows are excluded BEFORE any moment/count,
so adding NULL rows to an input never changes the result."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import evaluate as EV
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import sketches as SK
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import stats as ST
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import temporal as TP


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_binary_auc_ignores_null_label_and_score(spark):
    clean = spark.createDataFrame(
        [(float(i), int(i > 4)) for i in range(10)], "s double, y int"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, 1), (3.0, None), (None, None)], "s double, y int"
        )
    )
    a = _rows(EV.binary_auc(clean, "y", "s"))
    b = _rows(EV.binary_auc(dirty, "y", "s"))
    # NULL label previously counted as a negative; NULL score ranked
    # lowest — both must now be excluded entirely
    assert a == b
    assert a[0][1] == 5 and a[0][2] == 5  # n_pos, n_neg from clean rows


def test_group_linear_trend_drops_incomplete_pairs(spark):
    clean = spark.createDataFrame(
        [("g", float(x), 2.0 * x + 1.0) for x in range(6)], "g string, x double, y double"
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [("g", None, 99.0), ("g", 99.0, None)], "g string, x double, y double"
        )
    )
    a = _rows(ST.group_linear_trend(clean, ["g"], "x", "y"))
    b = _rows(ST.group_linear_trend(dirty, ["g"], "x", "y"))
    assert a == b
    # and the clean fit is the exact line with n counting PAIRS
    (g, n, slope, intercept, r2) = a[0]
    assert (n, slope, intercept, r2) == (6, 2.0, 1.0, 1.0)


def test_chi_square_and_mutual_info_drop_null_categories(spark):
    clean = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("a", "x")],
        "u string, v string",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, "x"), ("a", None), (None, None)], "u string, v string"
        )
    )
    assert _rows(ST.chi_square_independence(clean, "u", "v")) == _rows(
        ST.chi_square_independence(dirty, "u", "v")
    )
    assert _rows(ST.mutual_information(clean, "u", "v")) == _rows(
        ST.mutual_information(dirty, "u", "v")
    )
    # dof consistent with the 2x2 grid the statistic summed over
    assert ST.chi_square_independence(dirty, "u", "v").collect()[0]["dof"] == 1


def test_kmv_distinct_excludes_null_values(spark):
    clean = spark.createDataFrame(
        [("g", f"v{i % 7}") for i in range(50)], "g string, val string"
    )
    dirty = clean.unionByName(
        spark.createDataFrame([("g", None)] * 3, "g string, val string")
    )
    a = _rows(SK.kmv_distinct(clean, "val", "g", k=16))
    b = _rows(SK.kmv_distinct(dirty, "val", "g", k=16))
    # NULL previously ranked first in the ascending top-k (nulls
    # first), occupying a slot and inflating n_seen
    assert a == b
    assert a[0][1] == 7 and a[0][2] == 7  # exact when under k


def test_decayed_counts_drops_null_timestamps(spark):
    clean = spark.createDataFrame(
        [("e", f"2024-01-01 0{i}:00:00") for i in range(5)], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dirty = clean.unionByName(
        spark.createDataFrame([("e", None)], "k string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
    )
    a = _rows(TP.decayed_counts(clean, "k", "ts"))
    b = _rows(TP.decayed_counts(dirty, "k", "ts"))
    # n_events previously counted the NULL-ts row that the decayed sum
    # skipped — the two columns described different event sets
    assert a == b
    assert a[0][1] == 5
