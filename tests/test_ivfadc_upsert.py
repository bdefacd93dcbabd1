"""Incremental IVFADC index upsert: frozen-model encoding parity,
update idempotence, untouched-cell isolation, and an INDEPENDENT
numpy replay of the ADC scoring over the upserted artifacts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def test_encode_with_book_reproduces_fit_codes(spark, emb):
    codes, book = VO.pq_fit(emb, dim=64, m=8, k=16, iters=2)
    re_encoded = VO.pq_encode_with_book(emb, book, dim=64, m=8)
    a = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in re_encoded.collect()}
    assert a == b


@pytest.mark.parametrize("residual", [False, True])
def test_upsert_adds_updates_and_isolates_cells(spark, emb, tmp_path, residual):
    path = str(tmp_path / f"idx_{residual}")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    VO.build_ivfadc_index(
        first, path, n_cells=8, dim=64, m=8, pq_k=16, iters=2,
        encode_residuals=residual,
    )
    before = {
        r["vec_id"]: (list(r["codes"]), r["cell"])
        for r in spark.read.parquet(f"{path}/codes").collect()
    }

    VO.upsert_ivfadc_index(second, path)
    after = {
        r["vec_id"]: (list(r["codes"]), r["cell"])
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    n_first, n_second = first.count(), second.count()
    assert len(after) == n_first + n_second
    # pre-existing ids keep their codes and cells
    for vid, v in before.items():
        assert after[vid] == v
    # model tables untouched
    assert spark.read.parquet(f"{path}/meta").collect()[0]["encode_residuals"] == residual

    # re-upserting the same batch is an idempotent update
    VO.upsert_ivfadc_index(second, path)
    again = {
        r["vec_id"]: (list(r["codes"]), r["cell"])
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    assert again == after


def test_search_after_upsert_matches_numpy_adc_replay(spark, emb, tmp_path):
    path = str(tmp_path / "idx_np")
    VO.build_ivfadc_index(
        emb.filter(F.col("vec_id") < 250), path, n_cells=8, dim=64, m=8,
        pq_k=16, iters=2,
    )
    VO.upsert_ivfadc_index(emb.filter(F.col("vec_id") >= 250), path)

    probes = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    got = VO.ivfadc_index_search(
        spark, path, probes, k_neighbors=10, n_probe_cells=3
    ).collect()

    # independent replay from the stored artifacts
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    sub_d = meta.dim // meta.m
    book = np.zeros((meta.m, meta.pq_k, sub_d), dtype=np.int64)
    for r in spark.read.parquet(f"{path}/codebook").collect():
        book[r["subspace"], r["cluster"], r["d"]] = r["c"]
    cents = {r["cell"]: np.array(r["center"]) for r in
             spark.read.parquet(f"{path}/centroids").collect()}
    codes = {r["vec_id"]: (np.array(r["codes"]), r["cell"]) for r in
             spark.read.parquet(f"{path}/codes").collect()}

    pv = np.array(probes.collect()[0]["probe_vec"])
    # route: top-3 cells by cosine
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    ranked_cells = sorted(cents, key=lambda c: (-cos(pv, cents[c]), c))[:3]
    qx = np.floor(pv * meta.scale).astype(np.int64).reshape(meta.m, sub_d)
    # ADC tables: squared int distance of probe sub-vectors to centroids
    tables = ((qx[:, None, :] - book) ** 2).sum(axis=2)  # m × k
    expect = {}
    for vid, (cd, cell) in codes.items():
        if cell in ranked_cells:
            expect[vid] = int(tables[np.arange(meta.m), cd].sum())
    top = sorted(expect.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    want = {(vid, dist) for vid, dist in top}
    assert {(r["vec_id"], r["adc_dist"]) for r in got} == want
    # upserted ids are reachable by search
    assert any(r["vec_id"] >= 250 for r in got)
