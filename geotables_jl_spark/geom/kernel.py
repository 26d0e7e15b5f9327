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


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of an open flat ring: >0 CCW (outer by
    convention), <0 CW (hole by convention in multipolygons)."""
    xs = ring[0::2]
    ys = ring[1::2]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    return float(np.sum(xs * y2 - x2 * ys) / 2.0)


def split_rings(rings: list, kind: int) -> tuple[list, list]:
    """(outers, holes) for a polygon-family geometry.

    kind=3 (PolyArea, reference ``Meshes.PolyArea`` with inner rings):
    rings[0] is the outer, rings[1:] are holes — positional, orientation-
    agnostic, matching the reference's (outer, holes...) constructor.
    kind=5 (Multi of polygons): orientation-based — CCW rings are part
    outers, CW rings are holes (``st_collect_polygons`` flattens parts,
    so position no longer identifies the outer).
    """
    rr = [np.asarray(r, dtype=np.float64) for r in rings]
    if kind == 3:
        return rr[:1], rr[1:]
    outers = [r for r in rr if ring_signed_area(r) >= 0.0]
    holes = [r for r in rr if ring_signed_area(r) < 0.0]
    return outers, holes


def points_in_poly(px: np.ndarray, py: np.ndarray, rings: list, kind: int) -> np.ndarray:
    """Hole-aware boundary-inclusive point-in-polygon over all parts:
    inside ⇔ (inside some outer ring) AND NOT (strictly inside a hole).
    A point ON a hole boundary is ON the polygon's boundary ⇒ inside
    (Meshes.jl boundary-inclusive semantics)."""
    outers, holes = split_rings(rings, kind)
    inside = np.zeros(len(px), dtype=bool)
    for ring in outers:
        inside |= points_in_ring(px, py, ring)
    for hole in holes:
        if not inside.any():
            break
        on_h = point_on_ring(px, py, hole)
        strict_in_h = points_in_ring(px, py, hole, boundary=False) & ~on_h
        inside &= ~strict_in_h
    return inside


def poly_intersects_poly(rings_a: list, kind_a: int, rings_b: list, kind_b: int) -> bool:
    """Filled-region intersection for polygon-family geometries with
    holes: vertex of either geometry inside the other (hole-aware), or
    any boundary-ring crossing (a crossing touches the shared boundary,
    which is part of both filled regions — boundary-inclusive)."""
    ra_all = [np.asarray(r, dtype=np.float64) for r in rings_a]
    rb_all = [np.asarray(r, dtype=np.float64) for r in rings_b]
    for r in rb_all:
        if points_in_poly(r[0::2], r[1::2], rings_a, kind_a).any():
            return True
    for r in ra_all:
        if points_in_poly(r[0::2], r[1::2], rings_b, kind_b).any():
            return True
    return any(segments_cross(ra, rb) for ra in ra_all for rb in rb_all)


def poly_within_poly(rings_a: list, kind_a: int, rings_b: list, kind_b: int) -> bool:
    """A ⊆ B for polygon-family geometries with holes: every vertex of
    every ring of A inside B (hole-aware), no proper boundary crossing,
    and no hole of B poking strictly into A's filled region (detected by
    a B-hole vertex strictly inside A — exact for the simple fixtures
    the reference exercises; a hole fully containing a part of A is
    caught by the vertex test on A)."""
    ra_all = [np.asarray(r, dtype=np.float64) for r in rings_a]
    for r in ra_all:
        if not points_in_poly(r[0::2], r[1::2], rings_b, kind_b).all():
            return False
    outers_b, holes_b = split_rings(rings_b, kind_b)
    rb_all = outers_b + holes_b
    for ra in ra_all:
        for rb in rb_all:
            if _proper_cross(ra, rb):
                return False
    for hb in holes_b:
        hx, hy = hb[0::2], hb[1::2]
        on_a = np.zeros(len(hx), dtype=bool)
        for ra in ra_all:
            on_a |= point_on_ring(hx, hy, ra)
        # B-hole vertex strictly inside A ⇒ the hole bites into A's cover
        if (points_in_poly(hx, hy, rings_a, kind_a) & ~on_a).any():
            return False
    return True


def _proper_cross(ring_a: np.ndarray, ring_b: np.ndarray) -> bool:
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
    return bool(proper.any())


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
