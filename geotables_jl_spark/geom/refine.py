"""Arrow-batch exact-predicate refinement over candidate pairs.

This is the only Python that runs in the geojoin hot path, and it is
batch-vectorized: within each Arrow batch, candidate pairs are grouped by
the polygon side's geometry id, each distinct polygon's ring is decoded
once, and all its candidate points are tested in one numpy call
(winding-number PIP, ``geom/kernel.py``). Polygon-vs-polygon pairs fall
back to a per-pair loop — those batches are small by construction (the
cell prefilter already bounds candidates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geotables_jl_spark.geom import kernel

EPS = kernel.EPS


def _as_struct_arrays(series: pd.Series):
    """Decompose a geometry-struct pandas Series (dicts per row) into
    (kind, x, y, rings) arrays."""
    n = len(series)
    kind = np.empty(n, dtype=np.int64)
    x = np.full(n, np.nan)
    y = np.full(n, np.nan)
    rings = [None] * n
    for i, g in enumerate(series.to_numpy()):
        kind[i] = g["kind"]
        if g["x"] is not None:
            x[i] = g["x"]
            y[i] = g["y"]
        rings[i] = g["rings"]
    return kind, x, y, rings


def refine_mask(
    lgeom: pd.Series,
    rgeom: pd.Series,
    lid: np.ndarray,
    rid: np.ndarray,
    pred: str,
) -> np.ndarray:
    """Boolean mask of pairs satisfying the exact predicate.

    pred ∈ {"intersects", "within", "contains"}:
    within  = left ⊆ right (reference ``issubset``),
    contains = right ⊆ left.
    """
    lkind, lx, ly, lrings = _as_struct_arrays(lgeom)
    rkind, rx, ry, rrings = _as_struct_arrays(rgeom)
    if pred == "contains":
        return _refine(rkind, rx, ry, rrings, rid, lkind, lx, ly, lrings, lid, "within")
    return _refine(lkind, lx, ly, lrings, lid, rkind, rx, ry, rrings, rid, pred)


def _ring(rings_obj) -> np.ndarray:
    return np.asarray(rings_obj[0], dtype=np.float64)


def _refine(lkind, lx, ly, lrings, lid, rkind, rx, ry, rrings, rid, pred) -> np.ndarray:
    n = len(lkind)
    out = np.zeros(n, dtype=bool)

    pt_pt = (lkind == 1) & (rkind == 1)
    if pt_pt.any():
        ii = np.flatnonzero(pt_pt)
        out[ii] = (np.abs(lx[ii] - rx[ii]) <= EPS) & (np.abs(ly[ii] - ry[ii]) <= EPS)

    # point-left vs polygon-right: vectorize per distinct right polygon
    pt_poly = (lkind == 1) & (rkind == 3)
    if pt_poly.any():
        idx = np.flatnonzero(pt_poly)
        order = idx[np.argsort(rid[idx], kind="stable")]
        start = 0
        while start < len(order):
            end = start
            g = rid[order[start]]
            while end < len(order) and rid[order[end]] == g:
                end += 1
            ii = order[start:end]
            ring = _ring(rrings[ii[0]])
            # point vs polygon: intersects == within (boundary-inclusive)
            out[ii] = kernel.points_in_ring(lx[ii], ly[ii], ring)
            start = end

    # polygon-left vs point-right: vectorize per distinct left polygon
    poly_pt = (lkind == 3) & (rkind == 1)
    if poly_pt.any():
        idx = np.flatnonzero(poly_pt)
        order = idx[np.argsort(lid[idx], kind="stable")]
        start = 0
        while start < len(order):
            end = start
            g = lid[order[start]]
            while end < len(order) and lid[order[end]] == g:
                end += 1
            ii = order[start:end]
            if pred == "within":
                out[ii] = False  # a polygon is never ⊆ a point
            else:
                ring = _ring(lrings[ii[0]])
                out[ii] = kernel.points_in_ring(rx[ii], ry[ii], ring)
            start = end

    poly_poly = (lkind == 3) & (rkind == 3)
    if poly_poly.any():
        for i in np.flatnonzero(poly_poly):
            ra = _ring(lrings[i])
            rb = _ring(rrings[i])
            if pred == "intersects":
                out[i] = kernel.polygon_intersects_polygon(ra, rb)
            else:
                out[i] = kernel.polygon_within_polygon(ra, rb)
    return out
