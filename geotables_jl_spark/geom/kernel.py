"""Vectorized geometry kernels (numpy over Arrow batches).

These are the exact-refinement predicates of the two-stage spatial join:
the candidate stage is a JVM cell equi-join (``geom/cells.py``); only the
surviving (left, right) pairs reach these kernels inside
``mapInPandas`` — no per-row Python anywhere else.

Semantics mirror Meshes.jl predicates as exercised by the reference tests
(``test/operations.jl:11-24,51-72``): boundary-inclusive. A point on the
shared corner of 4 grid cells intersects (and is a subset of) all 4 cells
(``test/operations.jl:11-21,60-72``).

Point-in-polygon = winding number (nonzero rule) + explicit on-boundary
test, vectorized over all points tested against one ring at a time (pair
batches are grouped by geometry id, so each distinct polygon's ring is
decoded once per batch).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-12


def point_on_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: point lies on the boundary of the (open) ring."""
    xs = ring[0::2]
    ys = ring[1::2]
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    # (npoints, nedges)
    dx = (x2 - x1)[None, :]
    dy = (y2 - y1)[None, :]
    rx = px[:, None] - x1[None, :]
    ry = py[:, None] - y1[None, :]
    cross = dx * ry - dy * rx
    dot = rx * dx + ry * dy
    seglen2 = dx * dx + dy * dy
    on_seg = (np.abs(cross) <= EPS * np.maximum(1.0, np.sqrt(seglen2))) & (dot >= -EPS) & (dot <= seglen2 + EPS)
    return on_seg.any(axis=1)


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray, boundary: bool = True) -> np.ndarray:
    """Winding-number point-in-polygon, vectorized over points.

    boundary=True counts points on the boundary as inside (Meshes.jl
    ``intersects``/``issubset`` semantics for points vs polygons).
    """
    xs = ring[0::2]
    ys = ring[1::2]
    x1, y1 = xs[None, :], ys[None, :]
    x2, y2 = np.roll(xs, -1)[None, :], np.roll(ys, -1)[None, :]
    pxc = px[:, None]
    pyc = py[:, None]
    # winding number via crossing sign accumulation
    is_left = (x2 - x1) * (pyc - y1) - (pxc - x1) * (y2 - y1)
    up = (y1 <= pyc) & (y2 > pyc) & (is_left > 0)
    down = (y1 > pyc) & (y2 <= pyc) & (is_left < 0)
    wn = up.sum(axis=1).astype(np.int64) - down.sum(axis=1).astype(np.int64)
    inside = wn != 0
    if boundary:
        inside |= point_on_ring(px, py, ring)
    return inside


def segments_cross(ring_a: np.ndarray, ring_b: np.ndarray) -> bool:
    """True if any edge of ring_a properly or improperly intersects any edge
    of ring_b (all-pairs, vectorized)."""
    ax1, ay1 = ring_a[0::2], ring_a[1::2]
    ax2, ay2 = np.roll(ax1, -1), np.roll(ay1, -1)
    bx1, by1 = ring_b[0::2], ring_b[1::2]
    bx2, by2 = np.roll(bx1, -1), np.roll(by1, -1)

    # orient(p, q, r) for all combinations: (nA, nB)
    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    A1x, A1y = ax1[:, None], ay1[:, None]
    A2x, A2y = ax2[:, None], ay2[:, None]
    B1x, B1y = bx1[None, :], by1[None, :]
    B2x, B2y = bx2[None, :], by2[None, :]
    d1 = orient(A1x, A1y, A2x, A2y, B1x, B1y)
    d2 = orient(A1x, A1y, A2x, A2y, B2x, B2y)
    d3 = orient(B1x, B1y, B2x, B2y, A1x, A1y)
    d4 = orient(B1x, B1y, B2x, B2y, A2x, A2y)
    proper = ((d1 > EPS) & (d2 < -EPS) | (d1 < -EPS) & (d2 > EPS)) & (
        (d3 > EPS) & (d4 < -EPS) | (d3 < -EPS) & (d4 > EPS)
    )
    if proper.any():
        return True

    # collinear/touching cases: endpoint of one segment on the other
    def on_segment(px, py, qx, qy, rx, ry, d):
        # r collinear with pq (d≈0) and within bbox of pq
        return (
            (np.abs(d) <= EPS)
            & (rx >= np.minimum(px, qx) - EPS)
            & (rx <= np.maximum(px, qx) + EPS)
            & (ry >= np.minimum(py, qy) - EPS)
            & (ry <= np.maximum(py, qy) + EPS)
        )

    t = (
        on_segment(A1x, A1y, A2x, A2y, B1x, B1y, d1)
        | on_segment(A1x, A1y, A2x, A2y, B2x, B2y, d2)
        | on_segment(B1x, B1y, B2x, B2y, A1x, A1y, d3)
        | on_segment(B1x, B1y, B2x, B2y, A2x, A2y, d4)
    )
    return bool(t.any())


def polygon_intersects_polygon(ring_a: np.ndarray, ring_b: np.ndarray) -> bool:
    """Simple-polygon intersection test: vertex containment either way, or
    edge crossing. Correct for simple (non-self-intersecting) polygons."""
    if points_in_ring(ring_b[0::2], ring_b[1::2], ring_a).any():
        return True
    if points_in_ring(ring_a[0::2], ring_a[1::2], ring_b).any():
        return True
    return segments_cross(ring_a, ring_b)


def polygon_within_polygon(ring_a: np.ndarray, ring_b: np.ndarray) -> bool:
    """ring_a ⊆ ring_b for simple polygons: all vertices of A inside B and
    no proper edge crossings taking A outside B.

    For convex-cell-in-simple-polygon (the grid⊆poly case of
    ``test/operations.jl:51-58``) all-vertices-inside + no proper crossing
    is exact."""
    if not points_in_ring(ring_a[0::2], ring_a[1::2], ring_b).all():
        return False
    # a proper edge crossing means part of A is outside B
    ax1, ay1 = ring_a[0::2], ring_a[1::2]
    ax2, ay2 = np.roll(ax1, -1), np.roll(ay1, -1)
    bx1, by1 = ring_b[0::2], ring_b[1::2]
    bx2, by2 = np.roll(bx1, -1), np.roll(by1, -1)
    A1x, A1y = ax1[:, None], ay1[:, None]
    A2x, A2y = ax2[:, None], ay2[:, None]
    B1x, B1y = bx1[None, :], by1[None, :]
    B2x, B2y = bx2[None, :], by2[None, :]
    d1 = (A2x - A1x) * (B1y - A1y) - (A2y - A1y) * (B1x - A1x)
    d2 = (A2x - A1x) * (B2y - A1y) - (A2y - A1y) * (B2x - A1x)
    d3 = (B2x - B1x) * (A1y - B1y) - (B2y - B1y) * (A1x - B1x)
    d4 = (B2x - B1x) * (A2y - B1y) - (B2y - B1y) * (A2x - B1x)
    proper = ((d1 > EPS) & (d2 < -EPS) | (d1 < -EPS) & (d2 > EPS)) & (
        (d3 > EPS) & (d4 < -EPS) | (d3 < -EPS) & (d4 > EPS)
    )
    return not bool(proper.any())


def point_distance(lx: np.ndarray, ly: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    return np.hypot(lx - rx, ly - ry)
