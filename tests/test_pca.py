"""PCA over the distributed covariance matrix — property-pinned
because eigenvectors have no SQL oracle (the covariance front half
IS oracle-checked: `embedding_covariance` in test_oracle_queries).

Properties: covariance symmetry vs numpy, explained-variance
ordering, projection decorrelation, and reconstruction error
monotone in k.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_movie_recommendation_and_customer_segmentation_spark.operators import vectorops as VO
from big_data_movie_recommendation_and_customer_segmentation_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("embedding").collect()
    return np.array([list(map(float, r[0])) for r in rows], dtype=np.float64)


def test_covariance_matches_numpy(emb, emb_np):
    got = VO.embedding_covariance(emb, round_to=8).collect()
    want = np.cov(emb_np, rowvar=False)  # sample covariance, ddof=1
    assert len(got) == 64 * 65 // 2
    for r in got:
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-6)


def test_pca_variance_ordering_and_ratio(emb):
    comps, vals, ratio = VO.pca_fit(emb, k=8)
    assert comps.shape == (8, 64)
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
    assert all(0 <= r <= 1 for r in ratio)
    # components are orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-8)
    # sign convention: each row's largest-|.| entry is positive
    for row in comps:
        assert row[np.abs(row).argmax()] > 0


def test_pca_projection_decorrelated(emb, emb_np):
    comps, vals, _ = VO.pca_fit(emb, k=4)
    proj = VO.pca_project(emb, comps).select("pca").collect()
    p = np.array([list(r[0]) for r in proj], dtype=np.float64)
    cov = np.cov(p, rowvar=False)
    # diagonal = eigenvalues, off-diagonal ~ 0
    assert np.allclose(np.diag(cov), vals[:4], rtol=1e-4)
    off = cov - np.diag(np.diag(cov))
    assert np.max(np.abs(off)) < 1e-6
    # spark projection == numpy projection (centering-free: spans the
    # same subspace; compare against numpy matmul of the raw vectors)
    assert np.allclose(p, emb_np @ comps.T, atol=1e-9)


def test_pca_reconstruction_error_monotone(emb, emb_np):
    centered = emb_np - emb_np.mean(axis=0)
    errs = []
    for k in (2, 4, 8, 16):
        comps, _, _ = VO.pca_fit(emb, k=k)
        recon = (centered @ comps.T) @ comps
        errs.append(float(((centered - recon) ** 2).sum()))
    assert all(errs[i] >= errs[i + 1] - 1e-9 for i in range(len(errs) - 1))
