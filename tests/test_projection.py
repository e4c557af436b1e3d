"""PCA and random projection vs numpy ground truth: the distributed
moment pass must reproduce the exact covariance eigendecomposition, the
transform must match the closed form, and the reconstruction identity
(MSE == residual eigenvalue mass) must hold end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.projection import (
    pca_fit,
    pca_reconstruction_error,
    pca_transform,
    random_project,
)


def _toy(spark, n=200, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: a few dominant directions so eigenvalues separate
    scales = np.linspace(3.0, 0.2, dim)
    X = rng.standard_normal((n, dim)) * scales + rng.standard_normal(dim)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return X, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _numpy_pca(X, k):
    mu = X.mean(axis=0)
    C = np.cov(X, rowvar=False)
    w, V = np.linalg.eigh((C + C.T) / 2.0)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    W = V[:, :k].T
    for i in range(k):
        j = int(np.abs(W[i]).argmax())
        if W[i, j] < 0:
            W[i] = -W[i]
    return mu, W, w


def test_pca_fit_matches_numpy(spark):
    X, df = _toy(spark)
    model = pca_fit(df, k=4)
    mu, W, w = _numpy_pca(X, 4)
    assert model.n == len(X)
    np.testing.assert_allclose(model.mean, mu, atol=1e-9)
    np.testing.assert_allclose(model.eigenvalues, w[:4], rtol=1e-9)
    np.testing.assert_allclose(model.components, W, atol=1e-8)
    assert model.total_variance == pytest.approx(w.sum(), rel=1e-9)


def test_pca_components_orthonormal_and_sorted(spark):
    _, df = _toy(spark, seed=11)
    model = pca_fit(df, k=5)
    W = np.asarray(model.components)
    np.testing.assert_allclose(W @ W.T, np.eye(5), atol=1e-9)
    assert all(
        a >= b - 1e-12
        for a, b in zip(model.eigenvalues, model.eigenvalues[1:])
    )


def test_pca_transform_matches_closed_form(spark):
    X, df = _toy(spark, n=50)
    model = pca_fit(df, k=3)
    got = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_transform(df, model).collect()
    }
    W = np.asarray(model.components)
    mu = np.asarray(model.mean)
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], (X[i] - mu) @ W.T, atol=1e-9)


def test_pca_reconstruction_identity(spark):
    """MSE (sum ||x - lift(project(x))||^2 / (n-1)) equals the residual
    eigenvalue mass trace(C) - sum(top-k) - components, mean and
    transform must ALL be right for this to hold."""
    X, df = _toy(spark, n=300, dim=10, seed=3)
    model = pca_fit(df, k=4)
    mse = pca_reconstruction_error(df, model)
    residual = model.total_variance - sum(model.eigenvalues)
    assert mse == pytest.approx(residual, rel=1e-9, abs=1e-12)


def test_pca_excludes_null_and_ragged_rows(spark):
    X, _ = _toy(spark, n=40, dim=6)
    rows = [(i, [float(x) for x in X[i]]) for i in range(40)]
    rows.append((100, None))
    rows.append((101, [1.0, 2.0]))  # wrong width
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = pca_fit(df, k=2)
    assert model.n == 40
    mu, W, w = _numpy_pca(X, 2)
    np.testing.assert_allclose(model.mean, mu, atol=1e-9)


def test_pca_fit_validation(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, k=2)
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match=">= 2"):
        pca_fit(one, k=1)
    _, df = _toy(spark, n=10, dim=4)
    with pytest.raises(ValueError, match="outside"):
        pca_fit(df, k=5)


def test_random_project_deterministic_and_jl(spark):
    X, df = _toy(spark, n=60, dim=32, seed=5)
    a = {
        r["vec_id"]: tuple(r["rp"])
        for r in random_project(df, 16, seed=9).collect()
    }
    b = {
        r["vec_id"]: tuple(r["rp"])
        for r in random_project(df, 16, seed=9).collect()
    }
    assert a == b  # seed-deterministic
    c = random_project(df, 16, seed=10).collect()
    assert {r["vec_id"]: tuple(r["rp"]) for r in c} != a  # seed matters
    # JL: squared distances preserved within a loose factor for most
    # pairs (k=16 is small; assert the median distortion is tight and
    # the max is bounded - the projection matches numpy exactly, so
    # this is really checking the matrix convention end-to-end)
    rng = np.random.default_rng(9)
    M = rng.standard_normal((16, 32)) / np.sqrt(16)
    P = X @ M.T
    for i in (0, 7, 23):
        np.testing.assert_allclose(a[i], P[i], atol=1e-9)
    d_orig = ((X[0] - X[1:]) ** 2).sum(axis=1)
    d_proj = ((P[0] - P[1:]) ** 2).sum(axis=1)
    ratio = d_proj / d_orig
    assert 0.3 < np.median(ratio) < 1.7


def test_transform_and_project_null_ragged_passthrough(spark):
    """The transform is total over the rows the fit excluded: NULL and
    wrong-width vectors come back as NULL projections, never a crash."""
    X, _ = _toy(spark, n=10, dim=6)
    rows = [(i, [float(x) for x in X[i]]) for i in range(10)]
    rows += [(100, None), (101, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = pca_fit(df, k=2)
    got = {r["vec_id"]: r["pca"] for r in pca_transform(df, model).collect()}
    assert got[100] is None and got[101] is None
    assert got[0] is not None and len(got[0]) == 2
    rp = {r["vec_id"]: r["rp"] for r in random_project(df, 3).collect()}
    assert rp[100] is None and rp[101] is None and len(rp[0]) == 3


def test_dim_probe_skips_leading_null(spark):
    """A NULL vector in the first scanned row must not poison the
    width probe (ANSI size(NULL) = NULL)."""
    df = spark.createDataFrame(
        [(0, None)] + [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df.coalesce(1), k=1)
    assert model.n == 5
    assert len(random_project(df.coalesce(1), 2).collect()) == 6


def test_reconstruction_error_holdout_normalization(spark):
    """The denominator comes from the SCORED frame, not the fit corpus:
    a holdout slice must not be silently divided by the fit count."""
    X, df = _toy(spark, n=200, dim=6, seed=13)
    model = pca_fit(df, k=2)
    holdout = df.where("vec_id < 20")
    mse_hold = pca_reconstruction_error(holdout, model)
    W = np.asarray(model.components)
    mu = np.asarray(model.mean)
    Xc = X[:20] - mu
    R = (Xc @ W.T) @ W
    expected = ((Xc - R) ** 2).sum() / (20 - 1)
    assert mse_hold == pytest.approx(expected, rel=1e-9)
    with pytest.raises(ValueError, match=">= 2 valid"):
        pca_reconstruction_error(df.where("vec_id < 0"), model)
