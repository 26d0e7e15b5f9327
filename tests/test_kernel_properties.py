"""Property-based (hypothesis) checks for the numpy geometry kernels and
the WKB codecs — the code every spatial predicate ultimately trusts.

The point-in-polygon oracle here is an INDEPENDENT algorithm (even-odd
ray casting, scalar loop) — for simple polygons the winding number is
0/±1, so the two must agree everywhere off the boundary. Polygons are
random star-shaped rings (guaranteed simple); points within a small
distance of any boundary segment are filtered out, since the kernel is
deliberately boundary-inclusive with an EPS band and the oracle is not.

No SparkSession — pure driver-level numpy, so hundreds of examples run
in seconds.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geotables_jl_spark.geom.kernel import (
    points_in_poly,
    points_in_ring,
    poly_intersects_poly,
    poly_within_poly,
    ring_signed_area,
)
from geotables_jl_spark.sources.geoparquet import _decode_one, _encode_one


# -- geometry generators ------------------------------------------------------


@st.composite
def star_ring_centered(draw, cx_range=(-5.0, 5.0), r_range=(0.5, 2.0)):
    """(flat open CCW ring, (cx, cy)) of a random star-shaped (hence
    simple) polygon, star-shaped ABOUT (cx, cy). Two hypothesis-found
    pitfalls shape this generator: scaling about the VERTEX MEAN is not
    containment-safe for a non-convex star (only the star center is),
    and jitter must keep every consecutive angular gap < 180° — at
    ±0.4·step a triangle's gap can reach 216°, which puts the center
    OUTSIDE the polygon and voids star-shapedness entirely. ±0.2·step
    bounds the gap at step·1.4 ≤ 168° for n ≥ 3."""
    n = draw(st.integers(min_value=3, max_value=12))
    cx = draw(st.floats(*cx_range, allow_nan=False, allow_infinity=False))
    cy = draw(st.floats(*cx_range, allow_nan=False, allow_infinity=False))
    jitter = draw(st.lists(st.floats(-0.2, 0.2), min_size=n, max_size=n))
    radii = draw(st.lists(st.floats(*r_range), min_size=n, max_size=n))
    step = 2.0 * math.pi / n
    flat: list[float] = []
    for i in range(n):
        a = (i + jitter[i]) * step  # ascending angles → CCW, simple
        flat.extend((cx + radii[i] * math.cos(a), cy + radii[i] * math.sin(a)))
    return flat, (cx, cy)


@st.composite
def star_ring(draw, cx_range=(-5.0, 5.0), r_range=(0.5, 2.0)):
    """Flat open CCW ring of a random star-shaped (hence simple) polygon."""
    return draw(star_ring_centered(cx_range=cx_range, r_range=r_range))[0]


def _scale_about(ring: list[float], s: float, cx: float, cy: float) -> list[float]:
    a = np.asarray(ring, dtype=np.float64)
    out = a.copy()
    out[0::2] = cx + (a[0::2] - cx) * s
    out[1::2] = cy + (a[1::2] - cy) * s
    return out.tolist()


def _scale_about_center(ring: list[float], s: float) -> list[float]:
    a = np.asarray(ring, dtype=np.float64)
    return _scale_about(ring, s, float(a[0::2].mean()), float(a[1::2].mean()))


def _translate(ring: list[float], tx: float, ty: float) -> list[float]:
    a = np.asarray(ring, dtype=np.float64).copy()
    a[0::2] += tx
    a[1::2] += ty
    return a.tolist()


# -- independent oracles ------------------------------------------------------


def _raycast(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd crossing test, scalar — independent of the winding kernel."""
    xs, ys = ring[0::2], ring[1::2]
    n = len(xs)
    inside = False
    j = n - 1
    for i in range(n):
        if (ys[i] > py) != (ys[j] > py):
            xint = xs[i] + (py - ys[i]) * (xs[j] - xs[i]) / (ys[j] - ys[i])
            if px < xint:
                inside = not inside
        j = i
    return inside


def _dist_to_ring(px: float, py: float, ring: np.ndarray) -> float:
    xs, ys = ring[0::2], ring[1::2]
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    dx, dy = x2 - xs, y2 - ys
    seglen2 = np.maximum(dx * dx + dy * dy, 1e-300)
    t = np.clip(((px - xs) * dx + (py - ys) * dy) / seglen2, 0.0, 1.0)
    qx, qy = xs + t * dx, ys + t * dy
    return float(np.sqrt((px - qx) ** 2 + (py - qy) ** 2).min())


# -- properties ---------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    ring=star_ring(),
    pts=st.lists(
        st.tuples(st.floats(-8, 8, width=64), st.floats(-8, 8, width=64)),
        min_size=1,
        max_size=20,
    ),
)
def test_winding_matches_independent_raycast(ring, pts):
    r = np.asarray(ring, dtype=np.float64)
    keep = [(x, y) for x, y in pts if _dist_to_ring(x, y, r) > 1e-6]
    if not keep:
        return
    px = np.asarray([p[0] for p in keep])
    py = np.asarray([p[1] for p in keep])
    got = points_in_ring(px, py, r)
    want = np.asarray([_raycast(x, y, r) for x, y in keep])
    assert (got == want).all()


@settings(max_examples=150, deadline=None)
@given(ring=star_ring(), pts=st.lists(st.tuples(st.floats(-8, 8), st.floats(-8, 8)), max_size=15))
def test_holed_polygon_matches_composed_oracle(ring, pts):
    """kind=3 rings=[outer, hole]: inside ⇔ raycast(outer) and not
    strictly raycast(hole) — composed from the independent oracle."""
    hole = _scale_about_center(ring, 0.45)
    ro = np.asarray(ring, dtype=np.float64)
    rh = np.asarray(hole, dtype=np.float64)
    keep = [
        (x, y)
        for x, y in pts
        if _dist_to_ring(x, y, ro) > 1e-6 and _dist_to_ring(x, y, rh) > 1e-6
    ]
    if not keep:
        return
    px = np.asarray([p[0] for p in keep])
    py = np.asarray([p[1] for p in keep])
    got = points_in_poly(px, py, [ring, hole], kind=3)
    want = np.asarray([_raycast(x, y, ro) and not _raycast(x, y, rh) for x, y in keep])
    assert (got == want).all()


@settings(max_examples=200, deadline=None)
@given(ring=star_ring(), tx=st.floats(-100, 100), ty=st.floats(-100, 100))
def test_signed_area_orientation_and_translation(ring, tx, ty):
    r = np.asarray(ring, dtype=np.float64)
    a = ring_signed_area(r)
    assert a > 0.0  # star_ring emits CCW
    rev = np.asarray(list(zip(r[0::2][::-1], r[1::2][::-1])), dtype=np.float64).ravel()
    assert math.isclose(ring_signed_area(rev), -a, rel_tol=1e-9)
    shifted = np.asarray(_translate(ring, tx, ty), dtype=np.float64)
    assert math.isclose(ring_signed_area(shifted), a, rel_tol=1e-6, abs_tol=1e-7)


@settings(max_examples=100, deadline=None)
@given(rc=star_ring_centered())
def test_poly_containment_invariants(rc):
    ring, (cx, cy) = rc
    # shrinking about the STAR CENTER is containment-safe: every scaled
    # vertex stays on its center ray at a fraction of its boundary
    # distance (star-shapedness); the vertex mean would not be
    shrunk = _scale_about(ring, 0.5, cx, cy)
    far = _translate(ring, 100.0, 0.0)  # diameter ≤ 4 ≪ 100 → disjoint
    assert poly_intersects_poly([ring], 3, [ring], 3)
    assert poly_within_poly([shrunk], 3, [ring], 3)
    assert poly_intersects_poly([shrunk], 3, [ring], 3)
    assert not poly_intersects_poly([ring], 3, [far], 3)
    assert not poly_within_poly([ring], 3, [far], 3)
    # a holed container no longer contains a probe poking into the hole
    # (scaling about the center keeps probe ⊂ hole ⊂ ring similar stars)
    hole = _scale_about(ring, 0.6, cx, cy)
    probe = _scale_about(ring, 0.3, cx, cy)  # strictly inside the hole
    assert not poly_within_poly([probe], 3, [ring, hole], 3)


# -- WKB round-trips ----------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(allow_nan=False, allow_infinity=False, width=64),
    y=st.floats(allow_nan=False, allow_infinity=False, width=64),
)
def test_wkb_point_roundtrip_bit_exact(x, y):
    g = {"kind": 1, "x": x, "y": y, "rings": None}
    d = _decode_one(_encode_one(g))
    assert d["kind"] == 1 and d["x"] == x and d["y"] == y  # bit-exact doubles


@settings(max_examples=100, deadline=None)
@given(ring=star_ring())
def test_wkb_polygon_with_hole_roundtrip(ring):
    hole = _scale_about_center(ring, 0.5)
    d = _decode_one(_encode_one({"kind": 3, "rings": [ring, hole]}))
    assert d["kind"] == 3
    assert d["rings"] == [ring, hole]  # open rings preserved exactly
    r = np.asarray(ring)
    assert d["xmin"] == min(min(r[0::2]), min(np.asarray(hole)[0::2]))


@settings(max_examples=100, deadline=None)
@given(ring=star_ring(cx_range=(-2.0, 2.0)))
def test_wkb_multipolygon_roundtrip_preserves_parts(ring):
    """Two disjoint parts, the first holed: orientation grouping must
    survive encode→decode (outers CCW, holes CW)."""
    hole_ccw = _scale_about_center(ring, 0.5)
    h = np.asarray(hole_ccw, dtype=np.float64)
    hole = np.asarray(list(zip(h[0::2][::-1], h[1::2][::-1])), dtype=np.float64).ravel().tolist()
    part2 = _translate(ring, 50.0, 0.0)
    rings = [ring, hole, part2]
    d = _decode_one(_encode_one({"kind": 5, "rings": rings}))
    assert d["kind"] == 5 and d["rings"] == rings
    # filled-region semantics identical after the round-trip
    px = np.asarray([float(np.mean(np.asarray(ring)[0::2]))])
    py = np.asarray([float(np.mean(np.asarray(ring)[1::2]))])
    assert (points_in_poly(px, py, rings, 5) == points_in_poly(px, py, d["rings"], 5)).all()


def test_wkb_big_endian_point_decodes():
    """Other writers may emit big-endian WKB — decode must honor byte 0."""
    import struct

    wkb = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.5, -2.25)
    d = _decode_one(wkb)
    assert d["kind"] == 1 and d["x"] == 1.5 and d["y"] == -2.25
