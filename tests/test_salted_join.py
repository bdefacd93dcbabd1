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
