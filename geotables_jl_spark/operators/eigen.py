"""EigenAnalysis / PCA / DRS / SDS feature transforms.

Reference: the TableTransforms pipeline exposes ``EigenAnalysis(:V)``
(V = eigenvectors), ``:VD`` (whitening, a.k.a. DRS) and ``:VDV``
(sphering, SDS), plus ``PCA = ZScore → EigenAnalysis(:V)`` — exercised
in ``/root/reference/test/feature.jl:27-33``.

Spark-first plan: the d×d Gram/covariance matrix is ONE map-side
combinable aggregate over outer-product terms (d² sum columns — fine
for feature-table widths; this is the classic distributed-PCA shape:
O(n·d²) compiled work, O(d²) driver state, no iteration). The
eigendecomposition of the tiny d×d matrix happens driver-side in
numpy, and the projection is a pure column expression folded back into
the scan. No pyspark.ml dependency, no Python in the row path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable


def _cov_matrix(df, cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(means, covariance) via one aggregate pass (sum, sum of products)."""
    d = len(cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    aggs += [F.sum(F.col(c)).alias(f"__s_{i}") for i, c in enumerate(cols)]
    aggs += [
        F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"__p_{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    mu = np.array([row[f"__s_{i}"] / n for i in range(d)])
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            cij = row[f"__p_{i}_{j}"] / n - mu[i] * mu[j]
            cov[i, j] = cov[j, i] = cij
    # sample covariance (reference uses cov(), n-1 normalization)
    cov *= n / max(n - 1, 1)
    return mu, cov


def eigen_analysis(
    gtb: GeoTable, cols: list[str], proj: str = "V", out_prefix: str = "pc"
) -> GeoTable:
    """Project feature columns onto eigenvector axes.

    proj: 'V' (rotate), 'VD' (rotate + whiten — unit variance), 'VDV'
    (sphere — rotate, whiten, rotate back). Output columns
    ``{out_prefix}1..d`` replace the inputs; deterministic sign
    convention: each eigenvector's largest-|component| is positive.
    """
    if proj not in ("V", "VD", "VDV"):
        raise ValueError("proj must be V, VD or VDV")
    mu, cov = _cov_matrix(gtb.df, cols)
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic sign: dominant component of each axis positive
    for k in range(vecs.shape[1]):
        if vecs[np.argmax(np.abs(vecs[:, k])), k] < 0:
            vecs[:, k] = -vecs[:, k]
    M = vecs
    if proj in ("VD", "VDV"):
        M = M @ np.diag(1.0 / np.sqrt(np.maximum(vals, 1e-300)))
    if proj == "VDV":
        M = M @ vecs.T

    df = gtb.df
    centered = [F.col(c) - F.lit(float(m)) for c, m in zip(cols, mu)]
    out_cols = []
    for k in range(M.shape[1]):
        expr = None
        for i in range(len(cols)):
            term = centered[i] * F.lit(float(M[i, k]))
            expr = term if expr is None else expr + term
        out_cols.append(expr.alias(f"{out_prefix}{k + 1}"))
    keep = [c for c in df.columns if c not in cols and c not in (ROW_ID, GEOM)]
    return gtb._with(df.select(ROW_ID, *keep, *out_cols, GEOM))


def pca(gtb: GeoTable, cols: list[str], out_prefix: str = "pc") -> GeoTable:
    """PCA = ZScore → EigenAnalysis(:V) (reference transform chain)."""
    from geotables_jl_spark.operators.transforms import zscore

    return eigen_analysis(zscore(gtb, *cols), cols, proj="V", out_prefix=out_prefix)
