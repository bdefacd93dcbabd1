"""Corpus-scoring / decontamination / mixture-planning properties
beyond the value oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_ngram_decon_is_stricter_than_exact(spark, sf_dir):
    """An exact duplicate shares every n-gram, so n-gram-overlap
    decontamination can only drop MORE than the fingerprint pass:
    survivors(ngram) ⊆ survivors(exact)."""
    exact = {r["doc_id"] for r in QUERIES["decontaminated_docs"](spark, sf_dir).collect()}
    ngram = {
        r["doc_id"] for r in QUERIES["ngram_decontaminated_docs"](spark, sf_dir).collect()
    }
    assert ngram <= exact
    assert ngram  # non-vacuous: something survives


def test_ngram_decon_corpus_never_shuffled_into_join(spark, sf_dir):
    """Both joins (shingle semi, id anti) must be broadcast — the
    100 TB corpus side never moves through an exchange for the join."""
    df = QUERIES["ngram_decontaminated_docs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_unigram_logprob_bounds(spark, sf_dir):
    """Probabilities are < 1, so every mean log-prob is negative,
    and only non-empty documents emit rows."""
    rows = QUERIES["doc_unigram_logprob"](spark, sf_dir).collect()
    assert rows
    assert all(r["mean_logprob"] < 0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)


def test_temperature_mix_invariants(spark, sf_dir):
    """Mixture weights and token shares each sum to 1; temperature
    alpha<1 flattens: the biggest source's mix_weight must not exceed
    its raw token share, the smallest's must not fall below it."""
    rows = QUERIES["source_mix_plan"](spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["mix_weight"] <= big["token_share"] + 1e-9
    assert small["mix_weight"] >= small["token_share"] - 1e-9
    assert all(0.0 < r["sample_prob"] <= 1.0 for r in rows)


def test_balanced_sample_per_group_counts(spark, sf_dir):
    """Exactly-N-per-group semantics: groups at least N big emit
    exactly N rows; smaller groups pass through whole; output is a
    subset of the input and identical across invocations."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators.corpus import (
        balanced_sample_by_group,
    )
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n = 7
    out = balanced_sample_by_group(d, "source", n, "doc_id")
    sizes = {r["source"]: r["cnt"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == {s: min(n, c) for s, c in sizes.items()}
    assert out.join(d, ["doc_id", "source"], "left_anti").count() == 0
    again = balanced_sample_by_group(d, "source", n, "doc_id")
    assert sorted(map(tuple, out.select("doc_id").collect())) == sorted(
        map(tuple, again.select("doc_id").collect())
    )


def test_deterministic_shuffle_properties(spark, sf_dir):
    """Epoch shuffle invariants: every input row lands in exactly one
    shard with contiguous 1..|shard| positions, the layout is
    identical across runs, and changing the seed actually permutes."""
    from big_data_movie_recommendation_and_customer_segmentation_spark.operators import corpus as CP
    from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    a = CP.deterministic_shuffle(d, "doc_id", n_shards=4, seed="s1").collect()
    assert len(a) == n and len({r.doc_id for r in a}) == n

    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # md5 uniformity: no shard more than 2x the ideal share
    assert max(len(p) for p in by_shard.values()) <= 2 * (n // 4 + 1)

    b = CP.deterministic_shuffle(d, "doc_id", n_shards=4, seed="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "same seed must be stable"

    c = CP.deterministic_shuffle(d, "doc_id", n_shards=4, seed="s2").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in c} != {
        (r.doc_id, r.shard, r.pos) for r in a
    }, "seed change must re-shuffle"
