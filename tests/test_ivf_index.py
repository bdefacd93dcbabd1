"""Stored IVF index: search must prune parquet partitions (the
scan-I/O half of IVF) and agree with the in-memory variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


def test_ivf_index_prunes_partitions_and_matches_inmemory(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    VO.build_ivf_index(e, path, n_cells=8)

    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    out = VO.ivf_index_search(spark, path, probes, k=10, n_probe_cells=4)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan or "PartitionFilters: [isnotnull(cell" in plan or "cell#" in plan.split("PartitionFilters")[1][:200], \
        plan[plan.find("PartitionFilters"):plan.find("PartitionFilters")+300]

    got = {(r.probe_id, r.vec_id) for r in out.collect()}
    mem = {
        (r.probe_id, r.vec_id)
        for r in VO.ivf_knn(e, probes, k=10, n_cells=8, n_probe_cells=4).collect()
    }
    # same quantizer seed + maxIter => same cells => identical results
    assert got == mem
