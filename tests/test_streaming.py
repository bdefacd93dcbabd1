"""Structured Streaming smoke: the same windowed-agg code path that
the batch oracle checks, driven through readStream → memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table
from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import _physical_schema
from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import stateful as ST
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


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "events_stateful")
    # two files => at least the possibility of multiple micro-batches
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = ST.running_user_totals(stream, "user_id", "value")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM stateful_smoke"
        ).toPandas()
    finally:
        q.stop()

    # last emitted row per user == final state == batch aggregate
    final = rows.groupby("user_id").last()
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    got = {
        uid: (int(r["n_events"]), round(float(r["total_value"]), 6))
        for uid, r in final.iterrows()
    }
    assert got == expected


def test_stream_dedup_drops_redeliveries(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id").limit(2000)
    src = str(tmp_path / "events_dup")
    # simulate at-least-once delivery: every event written twice
    ev.unionByName(ev).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    deduped = ST.stream_dedup_exact(stream, ["event_id"], "ts", watermark="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_smoke").collect()[0]
    finally:
        q.stop()
    expected = ev.count()
    assert got.n == expected and got.d == expected


def test_stream_sliding_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    src = str(tmp_path / "events_sliding")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src).withWatermark("ts", "1 hour")
    out = W.sliding_agg(
        stream, "ts", "2 hours", "1 hour",
        aggs=(F.count(F.lit(1)).alias("n"),),
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sliding_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.window_end): r.n
            for r in spark.sql("SELECT * FROM sliding_smoke").collect()
        }
    finally:
        q.stop()
    expected = {
        (r.window_start, r.window_end): r.n
        for r in W.sliding_agg(
            ev, "ts", "2 hours", "1 hour", aggs=(F.count(F.lit(1)).alias("n"),)
        ).collect()
    }
    assert got == expected


def test_streaming_kmv_matches_batch(spark, sf_dir, tmp_path):
    from big_data_movie_recommendation_and_customer_segmentation_spark.functions.textops import shared_token_hash60
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import sketches as SK

    orders = load_table(spark, sf_dir, "orders")
    src = str(tmp_path / "orders_stream")
    # several files -> several micro-batches with maxFilesPerTrigger=1,
    # so the incremental KMV merge is actually exercised
    orders.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "o_orderstatus",
            shared_token_hash60(F.col("o_custkey").cast("string")).alias("_h"),
        )
    )
    out = ST.streaming_kmv_distinct(stream, "o_orderstatus", k=64)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM kmv_stream").collect()
    finally:
        q.stop()

    # final emission per group = the one with the highest batch counter
    final = {}
    for r in rows:
        cur = final.get(r.o_orderstatus)
        if cur is None or r.n_batches > cur.n_batches:
            final[r.o_orderstatus] = r
    assert max(r.n_batches for r in final.values()) > 1, "expected >1 micro-batch"

    batch = {
        r.o_orderstatus: r
        for r in SK.kmv_distinct(orders, "o_custkey", group_by="o_orderstatus", k=64).collect()
    }
    assert set(final) == set(batch)
    for status, r in final.items():
        b = batch[status]
        assert (r.n_distinct_est, r.n_seen) == (b.n_distinct_est, b.n_seen), (
            status, (r.n_distinct_est, r.n_seen), (b.n_distinct_est, b.n_seen),
        )


def test_stream_jsonl_ingest_matches_batch(spark, sf_dir, tmp_path):
    """JSONL is the corpus drop-zone format: new .json.gz files land
    in a directory and the stream ingests them incrementally. Prove
    the composition — write_jsonl → readStream.json with the declared
    schema → windowed agg — equals the batch result on the same
    bytes."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources.io import write_jsonl

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    src = str(tmp_path / "events_jsonl")
    write_jsonl(ev, src, compression=None)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)  # force multi-batch incremental ingest
        .json(src)
        .withWatermark("ts", "1 hour")
    )
    windowed = W.tumbling_agg(
        stream, "ts", "1 hour", group_by=("event_type",),
        aggs=(F.count(F.lit(1)).alias("n"),),
    )
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("jsonl_tumbling")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM jsonl_tumbling").collect()
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


def test_stream_attribution_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner join with watermarks produces exactly the
    batch attribution pairs once all files are processed — the
    equivalence that makes streaming/joins.py's batch-first design
    trustworthy."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import joins as SJ

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(src)

    stream_df = SJ.stream_attribution_join(
        spark, src, ev.schema, cause_type="click", effect_type="purchase",
        lookback="1 hour", watermark="2 hours",
    )
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName("attribution_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.cause_id, r.effect_id)
            for r in spark.sql("SELECT * FROM attribution_smoke").collect()
        }
    finally:
        q.stop()

    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cause_id"), F.col("ts").alias("cause_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("effect_id"), F.col("ts").alias("effect_ts")
    )
    expected = {
        (r.user_id, r.cause_id, r.effect_id)
        for r in SJ.attribution_join(
            clicks, buys, "user_id", "cause_ts", "effect_ts", "1 hour"
        ).collect()
    }
    assert expected, "testdata must contain click→purchase pairs"
    assert got == expected


def test_stream_attribution_left_join_matches_batch(spark, sf_dir, tmp_path):
    """how='left' equivalence incl. NULL-cause rows (VERDICT r4 ask
    #5). Outer results only emit once the watermark passes the effect
    row — with a finite source the tail would otherwise never
    finalize — so a far-future sentinel pair (excluded from the
    comparison) is appended as a SECOND batch to push the watermark
    past every real event; Spark then runs the no-data batch that
    evicts state and emits the null-joined rows."""
    import pyspark.sql.functions as F2

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import joins as SJ

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream_left")
    ev.write.mode("overwrite").parquet(src)

    stream_df = SJ.stream_attribution_join(
        spark, src, ev.schema, cause_type="click", effect_type="purchase",
        lookback="1 hour", watermark="2 hours", how="left",
    )
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName("attribution_left")
        .start()
    )
    try:
        q.processAllAvailable()
        # sentinel click+purchase 1 day past the end, sentinel user -1:
        # advances BOTH filtered streams' watermarks past max(real ts)
        max_ts = ev.agg(F2.max("ts")).collect()[0][0]
        sentinel = spark.createDataFrame(
            [(-101, max_ts, -1, "click", 0.0, "{}"),
             (-102, max_ts, -1, "purchase", 0.0, "{}")],
            ev.schema,
        ).withColumn("ts", F2.col("ts") + F2.expr("INTERVAL 1 DAY"))
        sentinel.write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = [
            r for r in spark.sql("SELECT * FROM attribution_left").collect()
            if r.user_id != -1
        ]
    finally:
        q.stop()

    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cause_id"), F.col("ts").alias("cause_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("effect_id"), F.col("ts").alias("effect_ts")
    )
    batch = SJ.attribution_join(
        clicks, buys, "user_id", "cause_ts", "effect_ts", "1 hour", how="left"
    ).collect()
    expect_pairs = {(r.user_id, r.cause_id, r.effect_id) for r in batch if r.cause_id is not None}
    expect_nulls = {(r.user_id, r.effect_id) for r in batch if r.cause_id is None}
    assert expect_nulls, "testdata must contain unattributed purchases"

    got_pairs = {(r.user_id, r.cause_id, r.effect_id) for r in rows if r.cause_id is not None}
    got_nulls = {(r.user_id, r.effect_id) for r in rows if r.cause_id is None}
    assert got_pairs == expect_pairs
    assert got_nulls == expect_nulls


def test_running_zscore_stream_matches_batch(spark, tmp_path):
    """Stream/batch equivalence for the running z-score operator:
    the stateful stream path over micro-batched input must emit the
    same flags as the expanding-window batch twin (values chosen
    away from the 3-sigma boundary so the comparison is exact)."""
    import pandas as pd

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_flags,
    )

    rows = []
    for u in (1, 2):
        base = 10.0 if u == 1 else 50.0
        for i in range(12):
            # one hard anomaly per user at position 8
            v = base + (i % 3) * 0.5 + (1000.0 if i == 8 else 0.0)
            rows.append((u, f"2024-01-01 00:{i:02d}:00", v))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    src = tmp_path / "zsrc"
    src.mkdir()
    pdf.to_json(src / "a.json", orient="records", lines=True)

    schema = "user_id long, ts timestamp, value double"
    batch_df = spark.read.schema(schema).json(str(src))
    expected = {
        (r["user_id"], str(r["ts"])): r["is_anomaly"]
        for r in running_zscore_batch(batch_df, "user_id", "ts", "value").collect()
    }
    assert sum(expected.values()) == 2  # exactly the two planted spikes

    stream = spark.readStream.schema(schema).json(str(src))
    out = running_zscore_flags(stream, "user_id", "ts", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("zscore_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["ts"])): r["is_anomaly"]
        for r in spark.sql("SELECT * FROM zscore_sink").collect()
    }
    assert got == expected


def test_decayed_count_stream_matches_batch(spark, tmp_path):
    """Stream/batch equivalence for the exponentially decayed
    counter: the two-scalar stateful path must emit the same
    per-event trajectory as the normalized prefix-sum batch twin
    (compared at 1e-4 — the paths are algebraically identical but
    take different FP routes)."""
    import pandas as pd
    import pytest

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.stateful import (
        decayed_count_batch,
        decayed_count_state,
    )

    rows = []
    for k in ("click", "view"):
        for i in range(10):
            rows.append((k, f"2024-01-{1 + i * 2:02d} 06:30:00"))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    src = tmp_path / "dsrc"
    src.mkdir()
    pdf.to_json(src / "a.json", orient="records", lines=True)

    schema = "event_type string, ts timestamp"
    batch_df = spark.read.schema(schema).json(str(src))
    expected = {
        (r["event_type"], str(r["ts"])): r["decayed_count"]
        for r in decayed_count_batch(batch_df, "event_type", "ts",
                                     half_life_hours=24.0).collect()
    }
    # sanity: strictly more than 1 (carry-over) but less than i+1
    last = expected[("click", "2024-01-19 06:30:00")]
    assert 1.0 < last < 10.0

    stream = spark.readStream.schema(schema).json(str(src))
    out = decayed_count_state(stream, "event_type", "ts", half_life_hours=24.0)
    q = (
        out.writeStream.format("memory")
        .queryName("decay_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], str(r["ts"])): r["decayed_count"]
        for r in spark.sql("SELECT * FROM decay_sink").collect()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-4), k


def test_running_zscore_multichunk_key_sorts_globally(spark, tmp_path):
    """r9 review: applyInPandasWithState delivers a key's micro-batch
    as multiple Arrow chunks; per-chunk sorting scored events against
    FUTURE moments. With a 4-row Arrow cap and shuffled input order,
    the stream must still match the batch twin exactly."""
    import pandas as pd

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_flags,
    )

    rows = []
    for i in range(12):
        v = 10.0 + (i % 3) * 0.5 + (1000.0 if i == 8 else 0.0)
        rows.append((1, f"2024-01-01 00:{i:02d}:00", v))
    # shuffle so later timestamps land in earlier Arrow chunks
    order = [8, 11, 2, 5, 0, 9, 4, 7, 1, 10, 3, 6]
    pdf = pd.DataFrame([rows[i] for i in order], columns=["user_id", "ts", "value"])
    src = tmp_path / "zchunk"
    src.mkdir()
    pdf.to_json(src / "a.json", orient="records", lines=True)

    schema = "user_id long, ts timestamp, value double"
    expected = {
        (r["user_id"], str(r["ts"])): r["is_anomaly"]
        for r in running_zscore_batch(
            spark.read.schema(schema).json(str(src)), "user_id", "ts", "value"
        ).collect()
    }
    assert sum(expected.values()) == 1

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            running_zscore_flags(stream, "user_id", "ts", "value")
            .writeStream.format("memory")
            .queryName("zchunk_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    got = {
        (r["user_id"], str(r["ts"])): r["is_anomaly"]
        for r in spark.sql("SELECT * FROM zchunk_sink").collect()
    }
    assert got == expected


def test_windowed_aggs_default_counts_events(spark):
    """r9 review: aggs=() previously crashed in GroupedData.agg."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.windows import (
        session_agg,
        sliding_agg,
        tumbling_agg,
    )

    df = spark.createDataFrame(
        [("2024-01-01 00:00:05",), ("2024-01-01 00:00:20",), ("2024-01-01 00:12:00",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    t = tumbling_agg(df, "ts", "10 minutes")
    assert {r["n_events"] for r in t.collect()} == {2, 1}
    assert sliding_agg(df, "ts", "10 minutes", "5 minutes").count() > 0
    s = session_agg(df, "ts", "1 minute")
    assert sorted(r["n_events"] for r in s.collect()) == [1, 2]


def test_round9_half_up_matches_spark_f_round(spark):
    """r10 advice: the binary floor(x*1e9+0.5) shortcut is not
    bit-identical to Spark F.round (BigDecimal HALF_UP on the
    shortest decimal repr) — the hybrid _round9_half_up recomputes
    near-boundary elements via Decimal(repr(x)) and must agree with
    the JVM on random values AND constructed half-boundary cases."""
    import numpy as np

    from big_data_movie_recommendation_and_customer_segmentation_spark.streaming.stateful import (
        _round9_half_up,
    )

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.uniform(0, 10, 2000),
            rng.uniform(0, 1e-6, 500),
            rng.uniform(100, 5000, 500),
            # constructed half-integer boundaries at the 1e-9 grid:
            # k·1e-9 + 5e-10 is exactly the HALF_UP decision point
            (np.arange(1, 400, dtype=np.float64) * 1e-9 + 5e-10),
            (np.arange(1, 200, dtype=np.float64) * 1e-3 + 5e-10),
        ]
    )
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, x double"
    )
    want = {
        r["i"]: r["r"]
        for r in df.select("i", F.round("x", 9).alias("r")).collect()
    }
    got = _round9_half_up(vals)
    mismatches = [
        (i, float(vals[i]), float(got[i]), want[i])
        for i in range(len(vals))
        if got[i] != want[i]
    ]
    assert not mismatches, mismatches[:5]
