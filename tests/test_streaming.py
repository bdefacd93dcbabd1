"""Structured Streaming smoke: the same windowed-agg code path that
the batch oracle checks, driven through readStream → memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table
from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import _physical_schema
from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import windows as W


def test_stream_tumbling_matches_batch(spark, sf_dir, tmp_path):
    # stage events as a file-source dir (ts already a proper timestamp)
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(src)

    stream_df = W.stream_tumbling_counts(
        spark, src, ev.schema, "ts", "1 hour", watermark="1 hour", group_by=("event_type",)
    )
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM tumbling_smoke").collect()
        }
    finally:
        q.stop()

    expected = {
        (r.window_start, r.event_type): r.n
        for r in W.tumbling_agg(
            ev, "ts", "1 hour", group_by=("event_type",), aggs=(F.count(F.lit(1)).alias("n"),)
        ).collect()
    }
    assert got == expected
