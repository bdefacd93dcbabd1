"""Sink-side behavior: partitioned parquet write (the engine's S3
A2 replacement — one job + partition pruning instead of the
reference's three filtered writes, ``partition.py:39-51``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import splits as S
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table
from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import write_parquet


def test_partitioned_split_write_and_pruned_read(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("event_id"), F.col("ts")
    )
    labeled = S.chronological_split(ev, "user_id", "ts", tiebreak_col="event_id")
    out = str(tmp_path / "split_parquet")
    write_parquet(labeled, out, partition_by=("split",))

    back = spark.read.parquet(out)
    # one write, three readable partitions, counts preserved
    expected = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["split"]: r["n"] for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == expected and set(got) == {"train", "val", "test"}

    # the split filter must prune partitions at scan, not post-filter
    plan = back.filter(F.col("split") == "train")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan, plan[:2000]


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import read_csv

    r = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_csv")
    r.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv(spark, path, r.schema)
    assert back.schema == r.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, r.collect()))


def test_write_csv_split_roundtrip(spark, sf_dir, tmp_path):
    """A2 compat: the reference's chronological-split CSV write
    (``partition.py:39-51``) as one partitioned job, re-read per
    split with the explicit schema — counts and rows preserved."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import read_csv, write_csv

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    labeled = S.chronological_split(ev, "user_id", "ts", tiebreak_col="event_id")
    out = str(tmp_path / "split_csv")
    write_csv(labeled, out, partition_by=("split",))

    expected = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    data_schema = labeled.drop("split").schema
    for split, n in expected.items():
        back = read_csv(spark, f"{out}/split={split}", data_schema)
        assert back.count() == n
    assert set(expected) == {"train", "val", "test"}
