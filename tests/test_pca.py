"""Distributed covariance-method PCA vs numpy's in-memory answer."""

from __future__ import annotations

import numpy as np

from hippollm_spark.operators.similarity import pca_fit, pca_project


def _toy(spark, n=400, d=8, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: two dominant directions
    basis = rng.randn(d, d)
    scales = np.array([10, 5] + [0.5] * (d - 2))
    mat = rng.randn(n, d) * scales @ basis.T + rng.randn(d) * 3
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return mat, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _numpy_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat.T, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_pca_fit_matches_numpy(spark):
    mat, df = _toy(spark)
    model = pca_fit(df, 3)
    mean, comps, ev = _numpy_pca(mat, 3)
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], comps, atol=1e-8)
    assert np.allclose(model["explained_variance"], ev, rtol=1e-9)
    # dominant directions carry most of the variance
    assert model["explained_ratio"][:2].sum() > 0.9
    # ordering: descending variance
    assert model["explained_variance"][0] >= model["explained_variance"][1]


def test_pca_fit_partition_invariant(spark):
    mat, df = _toy(spark, n=300)
    m1 = pca_fit(df.repartition(1), 2)
    m2 = pca_fit(df.repartition(13), 2)
    assert np.allclose(m1["components"], m2["components"], atol=1e-8)


def test_pca_project_reduces_reconstruction_error(spark):
    mat, df = _toy(spark)
    k_small, k_big = 1, 4
    errs = {}
    for k in (k_small, k_big):
        model = pca_fit(df, k)
        proj = {
            r["vec_id"]: np.array(r["pca"])
            for r in pca_project(df, model, round_to=None).collect()
        }
        recon_err = 0.0
        for i in range(mat.shape[0]):
            recon = model["mean"] + proj[i] @ model["components"]
            recon_err += float(((mat[i] - recon) ** 2).sum())
        errs[k] = recon_err
    assert errs[k_big] < errs[k_small] * 0.25


def test_pca_project_shape_and_rounding(spark):
    _, df = _toy(spark, n=50)
    model = pca_fit(df, 2)
    rows = pca_project(df, model).limit(5).collect()
    assert all(len(r["pca"]) == 2 for r in rows)
    # rounded to 6dp
    assert all(abs(v - round(v, 6)) < 1e-12 for r in rows for v in r["pca"])
