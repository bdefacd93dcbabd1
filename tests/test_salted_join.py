"""salted_join must be row-identical to the plain join under skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators.relational import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 0
    left = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 7).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("rv")
    )
    plain = left.join(right, "k").select("k", "payload", "rv")
    salted = salted_join(left, right, "k", salt=8).select("k", "payload", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.range(0, 100).select((F.col("id") % 5).alias("k"), F.col("id").alias("p"))
    right = spark.range(0, 3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    plain = left.join(right, "k", "left").select("k", "p", "v")
    salted = salted_join(left, right, "k", salt=4, how="left").select("k", "p", "v")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(map(tuple, salted.collect()), key=str)


def test_salted_semi_and_anti_join_equal_plain(spark):
    left = spark.range(0, 200).select((F.col("id") % 11).alias("k"), F.col("id").alias("p"))
    right = spark.range(0, 4).select(F.col("id").alias("k"))
    for how in ("left_semi", "left_anti"):
        plain = left.join(right, "k", how).select("k", "p")
        salted = salted_join(left, right, "k", salt=4, how=how).select("k", "p")
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_and_full(spark):
    """Right/full joins would replicate unmatched right rows salt
    times — the operator must refuse, not silently corrupt."""
    import pytest

    left = spark.range(0, 10).select(F.col("id").alias("k"))
    right = spark.range(0, 10).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", salt=4, how=how)
