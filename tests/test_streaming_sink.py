"""Exactly-once foreachBatch parquet sink: replay idempotence,
epoch isolation, and end-to-end streaming delivery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import sinks as SK


def test_epoch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "sink")
    write = SK.idempotent_epoch_writer(out)
    b0 = spark.range(5).withColumn("v", F.col("id") * 10)
    write(b0, 0)
    # partial/failed first attempt of epoch 1 …
    write(spark.range(2).withColumn("v", F.lit(-1)), 1)
    # … then the full redelivery of epoch 1 replaces it
    b1 = spark.range(3).withColumn("v", F.col("id") + 100)
    write(b1, 1)
    got = SK.read_epochs(spark, out)
    assert got.count() == 8  # 5 + 3, the partial 2 rows are gone
    assert got.filter((F.col("_epoch") == 1) & (F.col("v") == -1)).count() == 0
    # epoch 0 untouched by epoch-1 replay
    assert got.filter(F.col("_epoch") == 0).count() == 5


def test_epoch_replay_same_data_stable(spark, tmp_path):
    out = str(tmp_path / "sink")
    write = SK.idempotent_epoch_writer(out)
    b = spark.range(10).withColumn("v", F.col("id") % 3)
    write(b, 7)
    before = sorted(SK.read_epochs(spark, out).select("id", "v").collect())
    write(b, 7)  # exact redelivery
    after = sorted(SK.read_epochs(spark, out).select("id", "v").collect())
    assert before == after


def test_streaming_end_to_end_availablenow(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = spark.range(20).withColumn("v", F.col("id") * 2)
    rows.coalesce(1).write.mode("overwrite").parquet(str(src))

    out = str(tmp_path / "sink")
    stream = spark.readStream.schema("id long, v long").parquet(str(src))
    q = (
        SK.attach_idempotent_sink(stream, out, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = SK.read_epochs(spark, out)
    assert got.count() == 20
    assert got.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(20))
    # batch ids recorded as epochs
    assert got.select("_epoch").distinct().count() >= 1


def test_sink_restores_overwrite_mode(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    write = SK.idempotent_epoch_writer(str(tmp_path / "s"))
    write(spark.range(3), 0)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static") == prev


def test_compact_epochs_roundtrip_and_clusters(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob as _glob

    out = str(tmp_path / "sink")
    write = SK.idempotent_epoch_writer(out)
    for epoch in range(4):
        write(
            spark.range(epoch * 25, (epoch + 1) * 25).withColumn(
                "v", F.col("id") % 7
            ),
            epoch,
        )
    compacted = str(tmp_path / "compacted")
    n = SK.compact_epochs(spark, out, compacted, ("id",), num_files=4)
    assert n == 100
    got = spark.read.parquet(compacted)
    assert got.count() == 100
    assert "_epoch" not in got.columns
    # range clustering: per-file id ranges are pairwise disjoint
    ranges = []
    for f in _glob.glob(f"{compacted}/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # original sink untouched
    assert SK.read_epochs(spark, out).count() == 100


def test_dedup_append_sink_cross_batch_and_replay(spark, tmp_path):
    """Cross-batch exact dedup: ids admitted once across the stream's
    lifetime; replaying an epoch changes nothing (idempotent)."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.sinks import (
        dedup_append_writer,
    )

    path = str(tmp_path / "dedup_sink")
    write = dedup_append_writer(path, "doc_id")

    b0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b-dup")], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame(
        [(2, "b-again"), (3, "c")], ["doc_id", "text"]
    )
    write(b0, 0)
    write(b1, 1)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}
    # id 2 admitted once, from batch 0, with the deterministic
    # (content-ordered) winner; id 3 from batch 1
    assert got == {1: "a", 2: "b", 3: "c"}

    # replay batch 1 (at-least-once delivery): same final state
    write(b1, 1)
    again = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}
    assert again == got

    # replay batch 1 with EXTRA rows (failed attempt wrote partial
    # data, retry carries the full batch): own epoch is replaced
    b1b = spark.createDataFrame(
        [(2, "b-again"), (3, "c"), (4, "d")], ["doc_id", "text"]
    )
    write(b1b, 1)
    final = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}
    assert final == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_dedup_sink_cross_batch_through_real_streaming_engine(spark, tmp_path):
    """Drive dedup_append_writer through the GENUINE streaming engine
    (readStream -> foreachBatch) with maxFilesPerTrigger=1 forcing the
    two source files into SEPARATE micro-batches — the cross-batch
    anti-join path runs under real foreachBatch semantics, not a
    direct function call (COVERAGE.md streaming-evidence boundary)."""
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(2, "b-redelivered"), (3, "c")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    out = str(tmp_path / "sink")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(SK.dedup_append_writer(out, "doc_id"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # id 2 admitted exactly once across the micro-batches
    assert got == {1, 2, 3}
    assert spark.read.parquet(out).count() == 3
    # the engine really split delivery across >= 2 epochs
    assert (
        spark.read.parquet(out).select("_epoch").distinct().count() >= 2
    )


def test_dedup_sink_recovers_from_aborted_first_epoch(spark, tmp_path):
    """r10 advice: a failed first-epoch attempt can leave the sink
    directory existing but holding no committed parquet (e.g. only
    ``_temporary``). The existence probe must treat that as "nothing
    committed yet" — a dir-only probe made spark.read.parquet raise
    'unable to infer schema' on every retry, wedging the stream."""
    path = tmp_path / "dedup_aborted"
    (path / "_temporary" / "0").mkdir(parents=True)
    write = SK.dedup_append_writer(str(path), "doc_id")
    # the retry of epoch 0 must succeed, not wedge
    write(spark.createDataFrame([(1, "a"), (1, "a2")], "doc_id long, text string"), 0)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(str(path)).collect()}
    assert got == {1: "a"}
    # and cross-batch dedup engages normally afterwards
    write(spark.createDataFrame([(1, "a3"), (2, "b")], "doc_id long, text string"), 1)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(str(path)).collect()}
    assert got == {1: "a", 2: "b"}


def test_dedup_sink_schema_drift_raises_instead_of_failing_open(spark, tmp_path):
    """r9 review: the broad AnalysisException catch previously
    swallowed schema drift and silently disabled cross-batch dedup;
    now only a genuinely absent sink path skips the anti-join."""
    import pytest as _pytest

    path = str(tmp_path / "dedup_drift")
    write = SK.dedup_append_writer(path, "doc_id")
    write(spark.createDataFrame([(1, "a")], "doc_id long, text string"), 0)
    # corrupt the committed schema: rewrite without doc_id
    # (materialize first — overwriting a path being read fails)
    import shutil

    drifted = spark.read.parquet(path).drop("doc_id").toPandas()
    shutil.rmtree(path)
    spark.createDataFrame(drifted).write.parquet(path)
    with _pytest.raises(Exception):
        write(spark.createDataFrame([(2, "b")], "doc_id long, text string"), 1)
