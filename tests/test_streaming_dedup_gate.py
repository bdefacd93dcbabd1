"""Streaming near-dedup gate (``sinks.near_dedup_gate_writer``):
cross-batch NEAR-duplicate admission against a persisted MinHash
band index — batch N+1 screens against everything admitted through
batch N, replays are idempotent, and the empty index (the gate's
normal starting state) is immediately usable."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import (
    dedup_index as DI,
)
from big_data_movie_recommendation_and_customer_segmentation_spark.streaming import (
    sinks as SK,
)

DOC = "doc_id long, text string"
A = "the quick brown fox jumps over the lazy dog every single morning"
A2 = "the quick brown fox jumps over the lazy dog every single evening"  # near-dup of A
B = "completely different content about rivers mountains and weather patterns"
C = "a third topic entirely concerning databases indexes and partition pruning"


def _empty_index(spark, tmp_path, name="idx"):
    path = str(tmp_path / name)
    DI.build_minhash_index(
        spark.createDataFrame([], DOC), path, n=3, num_perm=32, band_rows=2, seed=42
    )
    return path


def test_empty_built_index_is_immediately_usable(spark, tmp_path):
    """An index built over an EMPTY corpus (streaming bootstrap) must
    be readable by query and upsert — a zero-row partitioned write
    would otherwise leave bands/ without a schema-bearing file."""
    path = _empty_index(spark, tmp_path)
    batch = spark.createDataFrame([(1, A)], DOC)
    assert DI.minhash_index_dedup(spark, path, batch, rescore="estimate").count() == 0
    assert DI.upsert_minhash_index(batch, path)["inserted"] == 1
    probe = spark.createDataFrame([(2, A)], DOC)
    got = DI.minhash_index_dedup(spark, path, probe, threshold=0.9, rescore="estimate")
    assert [(r.new_id, r.corpus_id) for r in got.collect()] == [(2, 1)]


def test_gate_cross_batch_within_batch_and_replay(spark, tmp_path):
    idx = _empty_index(spark, tmp_path)
    out = str(tmp_path / "out")
    write = SK.near_dedup_gate_writer(out, idx, threshold=0.5)

    # batch 0: A and A2 are near-dups of each other (lower id wins),
    # B is unique → admit {1: A, 3: B}
    write(spark.createDataFrame([(1, A), (2, A2), (3, B)], DOC), 0)
    got0 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got0 == {1, 3}

    # batch 1: doc 4 is a near-dup of ADMITTED doc 1 (cross-batch
    # screen), doc 5 is new → admit only 5
    write(spark.createDataFrame([(4, A2), (5, C)], DOC), 1)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 3, 5}

    # replay batch 1 (at-least-once): same final state, index stable
    n_sigs = spark.read.parquet(f"{idx}/sigs").count()
    write(spark.createDataFrame([(4, A2), (5, C)], DOC), 1)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3, 5}
    assert spark.read.parquet(f"{idx}/sigs").count() == n_sigs

    # the index's admitted membership IS the output's
    assert {r.doc for r in spark.read.parquet(f"{idx}/sigs").select("doc").collect()} == {
        1, 3, 5,
    }


def test_gate_through_real_streaming_engine(spark, tmp_path):
    """Drive the gate through genuine readStream → foreachBatch with
    maxFilesPerTrigger=1: the cross-batch screen runs under real
    engine semantics (COVERAGE.md streaming-evidence boundary)."""
    idx = _empty_index(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, A), (2, B)], DOC).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame([(3, A2), (4, C)], DOC).coalesce(1).write.parquet(
        str(src / "f2")
    )
    out = str(tmp_path / "gate_out")
    stream = (
        spark.readStream.schema(DOC)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            SK.near_dedup_gate_writer(out, idx, threshold=0.5)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
    # file order is lexicographic (f1 then f2): doc 3 (near-dup of
    # admitted doc 1) is screened out cross-batch
    assert admitted == {1, 2, 4}
    assert spark.read.parquet(out).select("_epoch").distinct().count() >= 2


def test_replay_does_not_retro_drop_same_batch_survivors(spark, tmp_path):
    """r12 review finding: after a crash-replay the batch's own
    survivors are already in the index — the cross-batch screen must
    ignore same-batch corpus hits, or docs admitted by the first
    attempt are permanently dropped from the rewritten epoch."""
    idx = _empty_index(spark, tmp_path)
    out = str(tmp_path / "out")
    # within_batch=False: both identical docs are admitted by design
    # (no within-batch leg); the replay must admit them again
    write = SK.near_dedup_gate_writer(out, idx, threshold=0.5, within_batch=False)
    batch = spark.createDataFrame([(1, A), (2, A)], DOC)
    write(batch, 0)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}
    write(batch, 0)  # at-least-once redelivery
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2}


def test_gate_refuses_invisible_docs(spark, tmp_path):
    """A doc whose governed shingle set is empty can never be
    screened by the index — admitting it would let identical copies
    through every future batch. The gate refuses it."""
    boiler = "subscribe to our newsletter for updates today"
    corpus = spark.createDataFrame(
        [(i, f"{boiler} unique content piece number {i} alpha beta") for i in range(10)],
        DOC,
    )
    idx = str(tmp_path / "gov_idx")
    DI.build_minhash_index(
        corpus, idx, n=3, num_perm=32, band_rows=2, seed=42, max_shingle_freq=5
    )
    out = str(tmp_path / "out")
    write = SK.near_dedup_gate_writer(out, idx, threshold=0.5)
    write(spark.createDataFrame([(100, boiler), (101, C)], DOC), 0)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {101}
    # a later copy of the boilerplate is refused again, not duplicated
    write(spark.createDataFrame([(102, boiler)], DOC), 1)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {101}
    # the index holds exactly the admitted membership
    assert {r.doc for r in spark.read.parquet(f"{idx}/sigs").select("doc").collect()} == {
        101
    } | set(range(10))


def test_gate_checkpoint_restart_resumes_and_screens_prior_admissions(spark, tmp_path):
    """Stop/restart semantics: a second availableNow run on the SAME
    checkpoint must process only files added since the first run, and
    its batches must screen against everything the first run
    admitted (the index is the cross-run state)."""
    idx = _empty_index(spark, tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(DOC)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                SK.near_dedup_gate_writer(out, idx, threshold=0.5)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame([(1, A), (2, B)], DOC).coalesce(1).write.parquet(
        str(src / "f1")
    )
    run()
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert first == {1, 2}
    epochs_after_first = spark.read.parquet(out).select("_epoch").distinct().count()

    # new files arrive while the stream is DOWN: a near-dup of an
    # admitted doc and a fresh one
    spark.createDataFrame([(3, A2), (4, C)], DOC).coalesce(1).write.parquet(
        str(src / "f2")
    )
    run()  # restart from the same checkpoint
    final = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert final == {1, 2, 4}  # 3 screened against run-1's admission of 1
    # the restart did not re-deliver f1 (no epoch churn for old data)
    assert (
        spark.read.parquet(out).select("_epoch").distinct().count()
        == epochs_after_first + 1
    )
    assert {r.doc for r in spark.read.parquet(f"{idx}/sigs").select("doc").collect()} == {
        1, 2, 4,
    }


def test_gate_releases_batch_checkpoints(spark, tmp_path):
    """Block-manager hygiene (ADVICE r14): the per-batch eager
    localCheckpoint of the survivors relation must be unpersisted
    after the epoch write + upsert — otherwise checkpoint blocks
    accumulate for the stream's lifetime."""
    idx = _empty_index(spark, tmp_path, "idx_unp")
    out = str(tmp_path / "out_unp")
    write = SK.near_dedup_gate_writer(out, idx, threshold=0.5)

    def _ids():
        # id SET, not count: the async ContextCleaner may reclaim
        # other tests' dead pins mid-test, shrinking a raw count
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {k for k in jmap.keySet().toArray()}

    base = _ids()
    write(spark.createDataFrame([(1, A), (2, A2), (3, B)], DOC), 0)
    write(spark.createDataFrame([(4, A2), (5, C)], DOC), 1)
    leaked = _ids() - base
    assert not leaked, f"batches left pinned RDDs: {leaked}"
