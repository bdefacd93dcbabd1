"""Stored IVFADC index: search must prune the codes table's cell
partitions (search I/O = n_probe_cells/n_cells of the 8-byte-per-
vector state) and reproduce the in-memory ``ivfadc_knn`` bit for bit
— both encoding variants, with geometry taken from the index's meta
table rather than the caller."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


@pytest.mark.parametrize("residual", [False, True])
def test_ivfadc_index_prunes_and_matches_inmemory(spark, sf_dir, tmp_path, residual):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / f"ivfadc_{residual}")
    VO.build_ivfadc_index(
        e, path, n_cells=8, dim=64, m=8, pq_k=16, iters=2,
        encode_residuals=residual,
    )

    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = VO.ivfadc_index_search(
        spark, path, probes, k_neighbors=10, n_probe_cells=4,
        exclude_id_eq_probe=True,
    )

    plan = out._jdf.queryExecution().executedPlan().toString()
    # several scans appear (probes, centroids, codebook); the CODES
    # scan must carry a cell partition filter
    part_filters = [s.split("]")[0] for s in plan.split("PartitionFilters: ")[1:]]
    assert any("cell" in pf for pf in part_filters), part_filters

    got = {
        (r.probe_id, r.vec_id, r.adc_dist, r.rank) for r in out.collect()
    }
    mem = {
        (r.probe_id, r.vec_id, r.adc_dist, r.rank)
        for r in VO.ivfadc_knn(
            e, probes, k_neighbors=10, n_cells=8, n_probe_cells=4,
            dim=64, m=8, pq_k=16, iters=2, exclude_id_eq_probe=True,
            encode_residuals=residual,
        ).collect()
    }
    # deterministic construction both sides => exact agreement,
    # distances included
    assert got == mem


def test_ivfadc_index_meta_drives_geometry(spark, sf_dir, tmp_path):
    """A search against an index built with non-default geometry must
    succeed WITHOUT the caller restating dim/m/scale — the meta table
    is the single source of truth (the ADVICE r4 mismatch class)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / "ivfadc_m16")
    VO.build_ivfadc_index(e, path, n_cells=4, dim=64, m=16, pq_k=8, iters=1)
    probes = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = VO.ivfadc_index_search(spark, path, probes, k_neighbors=5, n_probe_cells=2)
    rows = out.collect()
    assert rows and all(r.rank <= 5 for r in rows)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta.m, meta.pq_k, meta.n_cells) == (16, 8, 4)
