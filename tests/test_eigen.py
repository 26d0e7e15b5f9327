"""EigenAnalysis / PCA vs numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import georef
from geotables_jl_spark.operators.eigen import eigen_analysis, pca


@pytest.fixture(scope="module")
def feat(spark):
    rng = np.random.default_rng(3)
    X = rng.standard_normal((400, 3)) @ np.array(
        [[2.0, 0.3, 0.0], [0.0, 1.0, 0.5], [0.0, 0.0, 0.2]]
    )
    rows = [(i, float(x[0]), float(x[1]), float(x[2]), float(i), 0.0) for i, x in enumerate(X)]
    df = spark.createDataFrame(rows, "row_id long, a double, b double, c double, px double, py double")
    return georef(df, coords=["px", "py"]), X


def _collected(gtb, cols):
    rows = sorted(gtb.df.select("row_id", *cols).collect(), key=lambda r: r["row_id"])
    return np.array([[r[c] for c in cols] for r in rows])


def test_eigen_v_decorrelates(spark, feat):
    g, X = feat
    out = eigen_analysis(g, ["a", "b", "c"], proj="V")
    Y = _collected(out, ["pc1", "pc2", "pc3"])
    C = np.cov(Y.T)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-8  # rotated axes are uncorrelated
    # variances sorted descending (dominant axis first)
    v = np.diag(C)
    assert v[0] >= v[1] >= v[2]
    # matches numpy eigendecomposition of the sample covariance
    vals = np.sort(np.linalg.eigvalsh(np.cov(X.T)))[::-1]
    assert np.allclose(v, vals, rtol=1e-8)


def test_eigen_vd_whitens(spark, feat):
    g, _ = feat
    out = eigen_analysis(g, ["a", "b", "c"], proj="VD")
    Y = _collected(out, ["pc1", "pc2", "pc3"])
    assert np.allclose(np.cov(Y.T), np.eye(3), atol=1e-8)


def test_eigen_vdv_spheres(spark, feat):
    g, _ = feat
    out = eigen_analysis(g, ["a", "b", "c"], proj="VDV")
    Y = _collected(out, ["pc1", "pc2", "pc3"])
    assert np.allclose(np.cov(Y.T), np.eye(3), atol=1e-8)


def test_pca_chain(spark, feat):
    g, _ = feat
    out = pca(g, ["a", "b", "c"])
    Y = _collected(out, ["pc1", "pc2", "pc3"])
    C = np.cov(Y.T)
    assert np.abs(C - np.diag(np.diag(C))).max() < 1e-8
    assert "geometry" in out.df.columns  # domain rides along
