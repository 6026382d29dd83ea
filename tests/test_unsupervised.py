"""Distributed k-means (operators/clustering.py) and PCA
(operators/decomp.py): Lloyd invariants, farthest-point init, moment
exactness, Eckart-Young on small planted datasets."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.decomp import (
    pca_fit,
    pca_transform,
    reconstruction_sse,
    second_moments,
)


def _planted(spark, n_per=40, k=3, d=6, spread=0.05):
    rng = np.random.RandomState(7)
    rows = []
    for g in range(k):
        mu = np.zeros(d)
        mu[g] = 2.0
        for i in range(n_per):
            v = mu + spread * rng.randn(d)
            rows.append((g * n_per + i, [float(x) for x in v], g))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, g int"
    )


def test_kmeans_recovers_planted_clusters(spark):
    df = _planted(spark)
    fit = kmeans_fit(df, k=3, iters=4)
    a = kmeans_assign(df, fit["centroids"])
    purity = (
        a.join(df.select(F.col("vec_id").alias("id"), "g"), "id")
        .groupBy("cluster", "g").count()
        .groupBy("cluster").agg(F.max("count").alias("m"))
        .agg(F.sum("m").alias("t")).collect()[0].t
    )
    assert purity == 120  # perfect recovery
    assert sorted(fit["sizes"]) == [40, 40, 40]


def test_kmeans_inertia_monotone_and_consistent(spark):
    df = _planted(spark, spread=0.8)
    fit = kmeans_fit(df, k=3, iters=5)
    ine = fit["inertia"]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(ine, ine[1:]))
    assert kmeans_inertia(df, fit["centroids"]) <= ine[-1] * (1 + 1e-12)


def test_kmeans_deterministic(spark):
    df = _planted(spark, spread=0.5)
    f1 = kmeans_fit(df, k=3, iters=3)
    f2 = kmeans_fit(df, k=3, iters=3)
    assert np.array_equal(f1["centroids"], f2["centroids"])
    assert f1["inertia"] == f2["inertia"]


def test_kmeans_hash_init_still_works(spark):
    df = _planted(spark)
    fit = kmeans_fit(df, k=3, iters=6, init="hash")
    ine = fit["inertia"]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(ine, ine[1:]))


def test_kmeans_rejects_bad_args(spark):
    df = _planted(spark, n_per=1, k=2)  # 2 rows
    with pytest.raises(ValueError, match="needs >= k"):
        kmeans_fit(df, k=5, iters=1)
    with pytest.raises(ValueError, match="unknown init"):
        kmeans_fit(df, k=2, iters=1, init="bogus")


def test_second_moments_exact(spark):
    df = _planted(spark, n_per=25, k=2, d=4)
    n, s, g = second_moments(df)
    x = np.asarray([r.embedding for r in df.select("embedding").collect()])
    assert n == 50
    assert np.allclose(s, x.sum(axis=0))
    assert np.allclose(g, x.T @ x)


def test_pca_variance_and_eckart_young(spark):
    df = _planted(spark, n_per=60, k=3, d=8, spread=0.3)
    model = pca_fit(df, n_components=3)
    w = model["eigvals"]
    assert np.all(np.diff(w) <= 1e-12)
    comps = model["components"]
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    proj = pca_transform(df, model)
    pn, ps, pg = second_moments(proj, vec_col="proj")
    pvar = np.diag(pg / pn - np.outer(ps / pn, ps / pn))
    assert np.allclose(pvar, w[:3], rtol=1e-8)
    sse = reconstruction_sse(df, model)
    assert abs(sse - pn * w[3:].sum()) <= 1e-8 * max(sse, 1.0)


def test_pca_projection_centers_data(spark):
    df = _planted(spark, n_per=30, k=2, d=5)
    model = pca_fit(df, n_components=2)
    proj = pca_transform(df, model)
    _, ps, _ = second_moments(proj, vec_col="proj")
    assert np.allclose(ps, 0.0, atol=1e-9)  # projections are mean-centered


def test_pca_rejects_tiny_input(spark):
    df = _planted(spark, n_per=1, k=1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(df)
