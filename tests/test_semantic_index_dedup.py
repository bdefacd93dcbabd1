"""Incremental semantic dedup against the stored IVFADC index
(``vectorops.semantic_index_dedup``): exact re-uploads are always
caught (same-cell routing by construction), reported cosines are the
TRUE cosines (exact rescore re-reading only candidate vectors), and
the lifecycle (tombstones, self-id exclusion) carries over from the
index search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO
from big_data_movie_recommendation_and_customer_segmentation_spark.functions import vector as V
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path_factory.mktemp("semidx") / "ivfadc")
    VO.build_ivfadc_index(e, path, n_cells=8, dim=64, m=8, pq_k=16, iters=2)
    return path, e


def test_reuploads_are_caught_with_true_cosine(spark, idx):
    path, e = idx
    # batch: exact copies of 5 corpus vectors under NEW ids
    batch = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    got = VO.semantic_index_dedup(
        spark, path, batch, e, min_cosine=0.999, k_candidates=10, n_probe_cells=4
    ).collect()
    pairs = {(r.new_id, r.corpus_id) for r in got}
    # every re-upload pairs with its source (identical vector ⇒ same
    # cell, ADC distance 0, cosine 1)
    assert {(i + 100000, i) for i in range(5)} <= pairs
    by_pair = {(r.new_id, r.corpus_id): r.cos_sim for r in got}
    for i in range(5):
        assert by_pair[(i + 100000, i)] == pytest.approx(1.0, abs=1e-12)

    # reported cosines are the TRUE cosines: recompute brute-force
    truth = {
        (r.new_id, r.corpus_id): r.cos
        for r in batch.select(F.col("vec_id").alias("new_id"), F.col("embedding").alias("_vn"))
        .crossJoin(e.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("_vc")))
        .select("new_id", "corpus_id", V.cosine("_vn", "_vc").alias("cos"))
        .collect()
    }
    for (a, b), c in by_pair.items():
        assert c == pytest.approx(truth[(a, b)], abs=1e-12)


def test_tombstoned_corpus_vectors_never_surface(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / "ivfadc_tomb")
    VO.build_ivfadc_index(e, path, n_cells=8, dim=64, m=8, pq_k=16, iters=2)
    batch = e.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    base = VO.semantic_index_dedup(spark, path, batch, e, min_cosine=0.999)
    assert (100000, 0) in {(r.new_id, r.corpus_id) for r in base.collect()}

    VO.delete_from_ivfadc_index(spark.createDataFrame([(0,)], "vec_id long"), path)
    after = {
        (r.new_id, r.corpus_id)
        for r in VO.semantic_index_dedup(spark, path, batch, e, min_cosine=0.999).collect()
    }
    assert all(b != 0 for _, b in after)


def test_self_id_exclusion_on_recrawl(spark, idx):
    path, e = idx
    recrawl = e.filter(F.col("vec_id") < 3)
    got = VO.semantic_index_dedup(spark, path, recrawl, e, min_cosine=0.999)
    assert got.filter(F.col("new_id") == F.col("corpus_id")).count() == 0
    got_self = VO.semantic_index_dedup(
        spark, path, recrawl, e, min_cosine=0.999, exclude_id_eq=False
    )
    assert got_self.filter(F.col("new_id") == F.col("corpus_id")).count() == 3
