"""Two-pass prefix-sum packing operator: value-identical to the
single-partition global window, with a plan that never collapses to
one task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    packing as PK,
)


def test_running_sum_manual_fixture(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 10), (4, 1), (5, 7)], "id long, w long"
    )
    out = {
        r["id"]: r["running_total"]
        for r in PK.bucketed_running_sum(df, "id", "w", num_buckets=3).collect()
    }
    assert out == {1: 5, 2: 8, 3: 18, 4: 19, 5: 26}


def test_shard_assignment_manual_fixture(spark):
    # budget 10: starts are 0,5,8,18,19 -> shards 0,0,0,1,1
    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 10), (4, 1), (5, 7)], "id long, w long"
    )
    out = {
        r["id"]: r["shard_id"]
        for r in PK.assign_token_shards(df, "id", "w", shard_tokens=10, num_buckets=2).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}


def test_matches_single_partition_window(spark, sf_dir):
    """Bucket boundaries decide where the prefix is split, never its
    value: byte-identical to the naive global window."""
    d = (
        entrymod.queries()["doc_token_stats"](spark, sf_dir)
        .select("doc_id", F.col("n_tokens").cast("long").alias("w"))
    )
    two_pass = PK.bucketed_running_sum(d, "doc_id", "w", num_buckets=8)
    naive = d.withColumn(
        "running_total",
        F.sum("w").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    a = {r["doc_id"]: r["running_total"] for r in two_pass.collect()}
    b = {r["doc_id"]: r["running_total"] for r in naive.collect()}
    assert a == b and len(a) > 0


def test_degenerate_bucket_counts(spark):
    """num_buckets=1 (no boundaries) and more buckets than rows both
    stay correct — bucketing is a performance choice only."""
    df = spark.createDataFrame([(i, i % 3 + 1) for i in range(10)], "id long, w long")
    expect = {}
    run = 0
    for i in range(10):
        run += i % 3 + 1
        expect[i] = run
    for n in (1, 64):
        got = {
            r["id"]: r["running_total"]
            for r in PK.bucketed_running_sum(df, "id", "w", num_buckets=n).collect()
        }
        assert got == expect, n


def test_no_single_partition_exchange(spark, sf_dir):
    """The scale property IS the plan shape: the full relation moves
    through hash exchanges only — a SinglePartition exchange would
    mean the global window fell back to one task."""
    df = entrymod.queries()["token_shard_assignment"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "BroadcastExchange" in plan  # offsets join back by broadcast


def test_bucket_expr_survives_nonfinite_boundaries(spark):
    """approxQuantile returns inf/nan boundaries when the order column
    contains them; repr()-spliced they render as unresolvable infD /
    nanD column refs (r11 advice). Non-finite terms fall back to the
    F.lit comparison; finite-only inputs keep the one-expr fast path."""
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("inf"),)], "x double"
    )
    for bounds in (
        [1.5, float("inf")],
        [float("-inf"), 1.5],
        [1.5, float("nan")],
        [float("inf")],
    ):
        got = df.withColumn("b", PK._bucket_expr("x", bounds)).collect()
        # same semantics as the pure-lit spelling, row for row
        ref = df.withColumn(
            "b",
            sum(
                (F.when(F.col("x") >= F.lit(b), 1).otherwise(0) for b in bounds),
                start=F.lit(0),
            ),
        ).collect()
        assert got == ref, bounds


def test_bucket_expr_finite_path_is_one_sql_expr(spark):
    """Guard the collapse itself: all-finite boundaries must not
    regress to a per-boundary Column chain."""
    col = PK._bucket_expr("x", [0.5, 1.5, 2.5])
    # the parsed add-tree prints as a single CASE WHEN chain
    s = str(col)
    assert "CASE WHEN" in s and "nanD" not in s and "infD" not in s
