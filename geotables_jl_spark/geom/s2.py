"""S2 cell ids — the sphere-correct global tiling named by the north rule
("H3/S2 index"), implemented three times from the published algorithm
(S2 geometry library docs/papers; quadratic projection + Hilbert curve)
and cross-checked bit-for-bit:

1. ``with_s2_cell`` — pure Spark column expressions (zero Python in the
   hot path): the 100 TB path. Face/uv/st run in whole-stage codegen;
   the Hilbert fold runs 4 bits per step against a 1024-entry
   constant-folded lookup array inside a single ``aggregate()``
   higher-order function (one lambda body for all 8 steps — an unrolled
   projection chain makes Catalyst inline a copy of the uv/sqrt tree
   per step and codegen compile time explodes).
2. ``s2_cell_from_xyz_np`` — vectorized numpy twin for Arrow kernels and
   tests (same 4-bit LUT).
3. ``s2_cell_sql`` — generated ANSI SQL (chained CTEs, one 2-bit Hilbert
   step per level) runnable by DuckDB: the driver-oracle twin.

Determinism contract (what makes a bit-exact SQL oracle possible): from a
direction vector (x, y, z) the cell id needs only abs/compare (exact),
division (IEEE correctly rounded), ``1 ± 3u`` and ``s * 2^30``
(correctly rounded), ``sqrt`` (correctly rounded by IEEE-754 on every
platform), multiply by 0.5 (exact — power of two), ``floor`` (exact) and
integer bit math (exact). No trig. Hence numpy, the JVM and DuckDB agree
on every bit. The lat/lon convenience entry points DO use each engine's
``cos``/``sin`` (not correctly-rounded, may differ by 1 ulp across
libm/JVM) — a point within ~1 ulp of a leaf-cell boundary can land in
the adjacent cell; tests bound this and the oracle-gated queries use the
xyz form.

Reference parity note: GeoTables.jl has no spatial index at all (its
geojoin is a brute-force nested loop, src/geoops/geojoin.jl:120-124);
the S2 scheme here is the scale replacement mandated by the north rule —
cell ids serve as storage bucketing/partition keys, rollup keys, and
equi-join candidate keys, with the existing Arrow kernels doing exact
refinement.

Cell id layout (the public S2 scheme): 3 face bits, 2*level Hilbert
position bits, one trailing marker bit, zero-padded to 64; interpreted
here as SIGNED int64 (faces 4-5 set bit 63) so Spark/parquet/DuckDB
BIGINT carry it natively.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_LEVEL = 30
_SWAP = 1
_INVERT = 2

# kPosToIJ[orientation][position] -> ij (i<<1 | j): the published Hilbert
# traversal order per orientation; everything else is derived from it.
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)
POS_TO_ORIENT = (_SWAP, 0, 0, _SWAP | _INVERT)

# inverse: IJ_TO_POS[orientation][ij] -> position
IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in POS_TO_IJ
)


def _build_lut4() -> np.ndarray:
    """1024-entry table folding FOUR Hilbert levels at once:
    ``LUT[orient<<8 | nib_i<<4 | nib_j] = pos8<<2 | new_orient``."""
    lut = np.zeros(1024, dtype=np.int64)
    for orient0 in range(4):
        for ni in range(16):
            for nj in range(16):
                o, pos = orient0, 0
                for b in range(3, -1, -1):
                    ij = (((ni >> b) & 1) << 1) | ((nj >> b) & 1)
                    p = IJ_TO_POS[o][ij]
                    pos = (pos << 2) | p
                    o ^= POS_TO_ORIENT[p]
                lut[(orient0 << 8) | (ni << 4) | nj] = (pos << 2) | o
    return lut


LUT4 = _build_lut4()

# faceUVtoXYZ axes (norm, u-axis, v-axis) — used to DERIVE u,v formulas
# and for decoding in tests: u = (p . U) / (p . N), v = (p . V) / (p . N).
FACE_NORM = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (-1, 0, 0), (0, -1, 0), (0, 0, -1))
FACE_UAXIS = ((0, 1, 0), (-1, 0, 0), (-1, 0, 0), (0, 0, -1), (0, 0, -1), (0, 1, 0))
FACE_VAXIS = ((0, 0, 1), (0, 0, 1), (0, -1, 0), (0, -1, 0), (1, 0, 0), (1, 0, 0))


# ---------------------------------------------------------------------------
# numpy (vectorized twin — Arrow kernels, tests)
# ---------------------------------------------------------------------------

def _face_np(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    f = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(f, [x, y, z])
    return np.where(comp < 0, f + 3, f).astype(np.int64)


def _uv_np(face: np.ndarray, x, y, z) -> tuple[np.ndarray, np.ndarray]:
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return u, v


def _st_np(u: np.ndarray) -> np.ndarray:
    # one sqrt serves both branches: for u<0, 1-0.5*sqrt(1-3u) ==
    # 1-0.5*sqrt(1+3|u|) bit-exactly (avoids NaN warnings from the
    # unselected np.where arm when 1+3u < 0)
    s = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0, s, 1.0 - s)


def _uv_from_st_np(s: np.ndarray) -> np.ndarray:
    """Inverse of ``_st_np``: u = (4s²-1)/3 for s ≥ ½, mirrored below."""
    hi = (4.0 * s * s - 1.0) / 3.0
    t = 1.0 - s
    lo = -(4.0 * t * t - 1.0) / 3.0
    return np.where(s >= 0.5, hi, lo)


def _ij_np(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(s * float(1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1).astype(np.int64)


def _fold_np(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """(face, leaf i, leaf j) -> int64 cell id at ``level``. Hilbert fold,
    4 bits per step; i,j padded to 32 bits (the two extra leading (0,0)
    quadrants contribute 00-position bits and toggle the orientation
    twice — a no-op, so the initial orientation face&1 holds)."""
    orient = (face & 1).astype(np.int64)
    pos = np.zeros_like(orient, dtype=np.uint64)
    for k in range(7, -1, -1):
        ni = (i >> (4 * k)) & 15
        nj = (j >> (4 * k)) & 15
        val = LUT4[(orient << 8) | (ni << 4) | nj]
        pos = (pos << np.uint64(8)) | (val >> 2).astype(np.uint64)
        orient = val & 3
    leaf = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    snapped = (leaf & (~(lsb - np.uint64(1))) & ~lsb) | lsb
    return snapped.view(np.int64)


def s2_cell_from_xyz_np(x, y, z, level: int) -> np.ndarray:
    """int64 S2 cell ids at ``level`` for direction vectors (need not be
    normalized — face/u/v are ratios). Bit-identical to the Spark and SQL
    twins on any IEEE-754 platform (see module docstring)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    face = _face_np(x, y, z)
    u, v = _uv_np(face, x, y, z)
    i, j = _ij_np(_st_np(u)), _ij_np(_st_np(v))
    return _fold_np(face, i, j, level)


def s2_cell_from_latlon_np(lat_deg, lon_deg, level: int) -> np.ndarray:
    """Convenience: lat/lon degrees -> cell id. Uses libm trig (1-ulp
    engine-dependent near leaf-cell boundaries — see module docstring)."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cp = np.cos(phi)
    return s2_cell_from_xyz_np(cp * np.cos(lam), cp * np.sin(lam), np.sin(phi), level)


def s2_cell_scalar(x: float, y: float, z: float, level: int) -> int:
    """Independent per-level (2-bit) reference implementation — a
    different mechanism than the 4-bit LUT twins; used to cross-validate
    the table construction in tests."""
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        f = 0 if ax > az else 2
    else:
        f = 1 if ay > az else 2
    comp = (x, y, z)[f]
    face = f + 3 if comp < 0 else f
    n, ua, va = FACE_NORM[face], FACE_UAXIS[face], FACE_VAXIS[face]
    den = x * n[0] + y * n[1] + z * n[2]
    u = (x * ua[0] + y * ua[1] + z * ua[2]) / den
    v = (x * va[0] + y * va[1] + z * va[2]) / den

    def st(w: float) -> float:
        return 0.5 * (1.0 + 3.0 * w) ** 0.5 if w >= 0 else 1.0 - 0.5 * (1.0 - 3.0 * w) ** 0.5

    def ij(s: float) -> int:
        return min(max(int(np.floor(s * (1 << MAX_LEVEL))), 0), (1 << MAX_LEVEL) - 1)

    i, j = ij(st(u)), ij(st(v))
    orient, pos = face & 1, 0
    for b in range(MAX_LEVEL - 1, -1, -1):
        q = ((((i >> b) & 1) << 1) | ((j >> b) & 1))
        p = IJ_TO_POS[orient][q]
        pos = (pos << 2) | p
        orient ^= POS_TO_ORIENT[p]
    leaf = (face << 61) | (pos << 1) | 1
    lsb = 1 << (2 * (MAX_LEVEL - level))
    snapped = (leaf & ~(2 * lsb - 1)) | lsb
    return snapped - (1 << 64) if snapped >= (1 << 63) else snapped


# ---------------------------------------------------------------------------
# Cap covering (the filter half of S2-indexed dwithin / kNN joins).
#
# Method: for each face, bound the cap's u,v extent by interval
# arithmetic — a cap point q satisfies |q·A - c·A| <= chord for any unit
# axis A, and a point ON face f has q·N_f >= 1/sqrt(3) — so
# u = (q·U)/(q·N) lies in an exactly computable interval. The st range
# follows (uv->st is monotonic), then the level-k ij window (±1 cell
# rounding margin). This is a rigorous SUPERSET of the cells containing
# any point within ``chord`` of the center (false positives are removed
# by the exact refine stage; a miss would be a correctness bug — the
# test suite hunts for one with adversarial boundary sampling).
# ---------------------------------------------------------------------------

_FACE_N = np.array(FACE_NORM, dtype=np.float64)
_FACE_U = np.array(FACE_UAXIS, dtype=np.float64)
_FACE_V = np.array(FACE_VAXIS, dtype=np.float64)
_MIN_FACE_DOT = 1.0 / np.sqrt(3.0) - 1e-12


def s2_level_for_chord(chord: float, max_cells_per_side: float = 3.0) -> int:
    """Coarsest level whose cap-cover window stays ~``max_cells_per_side``
    cells wide: st-halfwidth <= (9/4)·theta (|du/dtheta| <= 3 on a face,
    |ds/du| <= 3/4), so pick level with (9/4)·theta·2^k <= side."""
    theta = 2.0 * float(np.arcsin(min(max(chord, 1e-15), 2.0) / 2.0))
    k = int(np.floor(np.log2(max(max_cells_per_side / (2.25 * theta), 1.0))))
    return max(0, min(MAX_LEVEL, k))


def _interval_div(num_lo, num_hi, den_lo, den_hi):
    """[num]/[den] with den > 0: elementwise interval quotient."""
    lo = np.minimum(num_lo / den_lo, num_lo / den_hi)
    hi = np.maximum(num_hi / den_lo, num_hi / den_hi)
    return lo, hi


def s2_cap_cells_np(x, y, z, chord, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Level-``level`` cells covering the cap of euclidean (chord) radius
    ``chord`` around each direction. Inputs are normalized internally.
    Returns CSR-style ``(row_ids, cells)``: for input row r, its cover is
    ``cells[row_ids == r]`` (rows emitted in ascending order). ``chord``
    may be a scalar or a per-row array."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    nrm = np.sqrt(x * x + y * y + z * z)
    with np.errstate(divide="ignore", invalid="ignore"):
        x, y, z = x / nrm, y / nrm, z / nrm
    eps = np.broadcast_to(np.asarray(chord, dtype=np.float64), x.shape)
    n_rows = x.shape[0]
    shift = MAX_LEVEL - level
    max_idx = (1 << level) - 1
    out_rows: list[np.ndarray] = []
    out_cells: list[np.ndarray] = []
    for f in range(6):
        nf, uf, vf = _FACE_N[f], _FACE_U[f], _FACE_V[f]
        dn = x * nf[0] + y * nf[1] + z * nf[2]
        du = x * uf[0] + y * uf[1] + z * uf[2]
        dv = x * vf[0] + y * vf[1] + z * vf[2]
        den_lo = np.maximum(dn - eps, _MIN_FACE_DOT)
        den_hi = dn + eps
        active = den_lo <= den_hi
        if not active.any():
            continue
        u_lo, u_hi = _interval_div(du - eps, du + eps, den_lo, den_hi)
        v_lo, v_hi = _interval_div(dv - eps, dv + eps, den_lo, den_hi)
        active &= (u_lo <= 1.0) & (u_hi >= -1.0) & (v_lo <= 1.0) & (v_hi >= -1.0)
        if not active.any():
            continue
        idx = np.flatnonzero(active)
        scale = float(1 << level)
        i0 = np.clip(np.floor(_st_np(np.clip(u_lo[idx], -1.0, 1.0)) * scale) - 1, 0, max_idx).astype(np.int64)
        i1 = np.clip(np.floor(_st_np(np.clip(u_hi[idx], -1.0, 1.0)) * scale) + 1, 0, max_idx).astype(np.int64)
        j0 = np.clip(np.floor(_st_np(np.clip(v_lo[idx], -1.0, 1.0)) * scale) - 1, 0, max_idx).astype(np.int64)
        j1 = np.clip(np.floor(_st_np(np.clip(v_hi[idx], -1.0, 1.0)) * scale) + 1, 0, max_idx).astype(np.int64)
        wi, wj = i1 - i0 + 1, j1 - j0 + 1
        cnt = wi * wj
        total = int(cnt.sum())
        if total == 0:
            continue
        rep = np.repeat(np.arange(len(idx)), cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        di, dj = off // wj[rep], off % wj[rep]
        i_lv = i0[rep] + di
        j_lv = j0[rep] + dj
        # Disk filter: the (i,j) window is a conservative RECTANGLE in
        # (u,v) ~7× the cap's area; drop cells provably disjoint from
        # the cap before they inflate the join's broadcast map and probe
        # fan-out. A cell is kept iff chord(cell_center, p) ≤ chord +
        # circ, where circ bounds the cell's center→anywhere chord:
        # chord ≤ arc ≤ Δu + Δv (|∂p/∂u| ≤ 1 on a face) and
        # |du/ds| = (8/3)·max(s, 1-s), maxed over the cell's s-range —
        # so a cell intersecting the cap always satisfies the test by
        # the triangle inequality (rigor preserved; exactness of the
        # final refine is unaffected either way). Measured: 40 → ~23
        # cells/point (1.7× fewer join probes) on the kNN profile's
        # level-6 covers, more at levels fine relative to the radius.
        h = 1.0 / scale
        s_lo = i_lv.astype(np.float64) * h
        t_lo = j_lv.astype(np.float64) * h
        u_c = _uv_from_st_np(s_lo + 0.5 * h)
        v_c = _uv_from_st_np(t_lo + 0.5 * h)
        cx = nf[0] + u_c * uf[0] + v_c * vf[0]
        cy = nf[1] + u_c * uf[1] + v_c * vf[1]
        cz = nf[2] + u_c * uf[2] + v_c * vf[2]
        cn = np.sqrt(cx * cx + cy * cy + cz * cz)
        cx, cy, cz = cx / cn, cy / cn, cz / cn
        xi, yi, zi = x[idx][rep], y[idx][rep], z[idx][rep]
        d_c = np.sqrt((cx - xi) ** 2 + (cy - yi) ** 2 + (cz - zi) ** 2)
        slope_u = (8.0 / 3.0) * np.maximum(s_lo + h, 1.0 - s_lo)
        slope_v = (8.0 / 3.0) * np.maximum(t_lo + h, 1.0 - t_lo)
        circ = 0.5 * h * (slope_u + slope_v)
        keep = d_c <= eps[idx][rep] + circ
        if not keep.all():
            rep, i_lv, j_lv = rep[keep], i_lv[keep], j_lv[keep]
            total = len(rep)
            if total == 0:
                continue
        ii = i_lv << shift
        jj = j_lv << shift
        fface = np.full(total, f, dtype=np.int64)
        out_rows.append(idx[rep])
        out_cells.append(_fold_np(fface, ii, jj, level))
    if not out_rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rows = np.concatenate(out_rows)
    cells = np.concatenate(out_cells)
    order = np.argsort(rows, kind="stable")
    del n_rows
    return rows[order], cells[order]


# ---------------------------------------------------------------------------
# Spark columns (the 100 TB path — all whole-stage codegen)
# ---------------------------------------------------------------------------

_LUT_LIT = None


def _lut_lit() -> Column:
    global _LUT_LIT
    if _LUT_LIT is None:
        # one py4j call (a 1024-element F.array(*lits) costs ~20 s of
        # driver round-trips); constant-folds to a single array literal
        _LUT_LIT = F.lit([int(v) for v in LUT4.tolist()])
    return _LUT_LIT


def _st_col(u: Column) -> Column:
    return F.when(u >= 0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * u)).otherwise(
        F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * u)
    )


def _ij_col(s: Column) -> Column:
    scaled = F.floor(s * F.lit(float(1 << MAX_LEVEL)))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << MAX_LEVEL) - 1)).cast("long")


def with_s2_cell(
    df: DataFrame,
    level: int,
    out: str = "s2_cell",
    xyz: tuple[str, str, str] | None = None,
    latlon: tuple[str, str] | None = None,
) -> DataFrame:
    """Add an int64 S2 cell-id column. ``xyz`` names three direction
    columns (bit-exact, oracle-able); ``latlon`` names (lat, lon) degree
    columns (engine-trig convenience). Zero-vector rows get NULL.

    Plan shape: one projection chain, all codegen — at 10^12 rows this
    fuses into the scan; the cell id is the Iceberg-style partition /
    bucketing key for everything downstream.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    if (xyz is None) == (latlon is None):
        raise ValueError("pass exactly one of xyz=('x','y','z') or latlon=('lat','lon')")
    pre = "__s2_"
    if latlon is not None:
        lat, lon = (F.radians(F.col(c).cast("double")) for c in latlon)
        df = df.withColumns({
            pre + "x": F.cos(lat) * F.cos(lon),
            pre + "y": F.cos(lat) * F.sin(lon),
            pre + "z": F.sin(lat),
        })
        xs, ys, zs = pre + "x", pre + "y", pre + "z"
    else:
        xs, ys, zs = xyz
    x, y, z = F.col(xs).cast("double"), F.col(ys).cast("double"), F.col(zs).cast("double")
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    f0 = F.when(ax > ay, F.when(ax > az, F.lit(0)).otherwise(F.lit(2))).otherwise(
        F.when(ay > az, F.lit(1)).otherwise(F.lit(2))
    )
    comp = F.when(f0 == 0, x).when(f0 == 1, y).otherwise(z)
    df = df.withColumn(pre + "f", F.when(comp == 0, F.lit(None)).when(comp < 0, f0 + 3).otherwise(f0))
    face = F.col(pre + "f")
    # every taken branch has a provably nonzero denominator (the face's
    # major component); NULL face (zero vector) takes no branch, which
    # keeps ANSI mode's divide-by-zero check happy
    u = (
        F.when(face == 0, y / x).when(face == 1, -x / y).when(face == 2, -x / z)
        .when(face == 3, z / x).when(face == 4, z / y).when(face == 5, -y / z)
    )
    v = (
        F.when(face == 0, z / x).when(face == 1, z / y).when(face == 2, -y / z)
        .when(face == 3, y / x).when(face == 4, -x / y).when(face == 5, -x / z)
    )
    df = df.withColumns({pre + "i": _ij_col(_st_col(u)), pre + "j": _ij_col(_st_col(v))})
    i, j = F.col(pre + "i"), F.col(pre + "j")
    # Hilbert fold as ONE aggregate() higher-order function: the state
    # struct (ir, jr, o, p) walks the 8 four-bit steps with the lambda
    # body built exactly once. An unrolled withColumns chain here is a
    # correctness-equivalent trap: Catalyst inlines each step into the
    # next (the refs are single-use, so CollapseProject fires) and the
    # codegen tree grows a copy of the face/u/v/sqrt sub-tree per step —
    # observed 25+ min of driver-side StringBuilder churn per query.
    # aggregate() keeps the plan linear; eval is JVM-interpreted over a
    # constant-folded LUT literal, no Python anywhere.
    mask32 = F.lit((1 << 32) - 1).cast("long")
    init = F.struct(
        i.alias("ir"),  # i,j occupy bits 0..29; treated as 32-bit padded
        j.alias("jr"),
        face.bitwiseAND(F.lit(1)).cast("long").alias("o"),
        F.lit(0).cast("long").alias("p"),
    )

    def _step(st: Column, _: Column) -> Column:
        ni = F.shiftright(st["ir"], 28).bitwiseAND(F.lit(15))
        nj = F.shiftright(st["jr"], 28).bitwiseAND(F.lit(15))
        key = F.shiftleft(st["o"], 8).bitwiseOR(F.shiftleft(ni, 4)).bitwiseOR(nj)
        val = F.element_at(_lut_lit(), (key + 1).cast("int"))
        return F.struct(
            F.shiftleft(st["ir"], 4).bitwiseAND(mask32).alias("ir"),
            F.shiftleft(st["jr"], 4).bitwiseAND(mask32).alias("jr"),
            val.bitwiseAND(F.lit(3)).cast("long").alias("o"),
            F.shiftleft(st["p"], 8).bitwiseOR(F.shiftright(val, 2).cast("long")).alias("p"),
        )

    pos = F.aggregate(
        F.sequence(F.lit(1), F.lit(8)), init, _step, lambda st: st["p"]
    )
    df = df.withColumn(pre + "p", pos)
    # signed face base avoids 64-bit overflow checks: faces 4,5 wrap negative
    base = (F.when(face >= 4, face - 8).otherwise(face)).cast("long") * F.lit(1 << 61).cast("long")
    drop = 2 * (MAX_LEVEL - level)
    pos_l = F.shiftright(F.col(pre + "p"), drop)
    cell = base + F.shiftleft(pos_l, drop + 1) + F.lit(1 << drop).cast("long")
    # NULL face (zero vector), NULL coords, and non-finite coords all
    # have no cell. Neither slips out on its own: a NULL/NaN coordinate
    # still picks a face (NULL/NaN comparisons are falsy, so an
    # otherwise-branch fires) and the ij clamp's greatest(NULL, 0)
    # swallows the NULL into 0 — emitting a deterministic-garbage id
    # without this. ±Inf must be masked here too: abs(inf) comparisons
    # are TRUE, so an infinite coordinate picks a real face and clamps
    # to a valid-looking edge cell, while the Arrow twin's isfinite
    # mask yields NULL — the bit-parity contract requires NULL on both.
    inf = F.lit(float("inf"))
    bad = (
        face.isNull()
        | x.isNull() | y.isNull() | z.isNull()
        | F.isnan(x) | F.isnan(y) | F.isnan(z)
        | (F.abs(x) == inf) | (F.abs(y) == inf) | (F.abs(z) == inf)
    )
    df = df.withColumn(out, F.when(bad, F.lit(None).cast("long")).otherwise(cell))
    return df.drop(*[c for c in df.columns if c.startswith(pre)])


def with_s2_cell_arrow(
    df: DataFrame,
    level: int,
    out: str = "s2_cell",
    xyz: tuple[str, str, str] = ("x", "y", "z"),
) -> DataFrame:
    """Arrow-kernel twin of :func:`with_s2_cell`: one mapInPandas stage
    running the vectorized numpy LUT fold (``s2_cell_from_xyz_np``),
    bit-identical to the codegen column on any IEEE-754 platform
    (property-tested in tests/test_s2.py) at ~6× its per-row throughput —
    the codegen twin's ``aggregate()`` Hilbert fold is JVM-interpreted
    per row and its large expression tree costs seconds of variable
    plan/JIT overhead per query. Zero-vector, NULL-coordinate, and
    NaN-coordinate rows get NULL, matching the column version. All input
    columns pass through."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out} long"
    xc, yc, zc = xyz

    def _iter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x, y, z = (pdf[c].to_numpy(dtype="float64") for c in (xc, yc, zc))
            # NULL coords arrive as NaN through to_numpy and would pass a
            # pure !=0 guard (NaN != 0 is True) into the LUT fold, yielding
            # an arbitrary cell where the codegen twin yields NULL — mask
            # non-finite rows too so the twins stay bit-identical
            ok = ((x != 0) | (y != 0) | (z != 0)) & (
                np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
            )
            cell = pd.array(s2_cell_from_xyz_np(x, y, z, level), dtype="Int64")
            if not ok.all():
                cell[~ok] = None
            pdf = pdf.copy()
            pdf[out] = cell
            yield pdf

    return df.mapInPandas(_iter, schema=schema)


def s2_parent_col(cell: Column, level: int) -> Column:
    """Snap a cell id to a coarser level — pure bit math (codegen)."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return cell.bitwiseAND(F.lit(~(2 * lsb - 1))).bitwiseOR(F.lit(lsb))


def s2_token_col(cell: Column) -> Column:
    """Canonical hex token: 16-digit zero-padded hex with trailing zeros
    stripped (face-0 ids can have leading zero nibbles)."""
    return F.regexp_replace(F.lpad(F.lower(F.hex(cell)), 16, "0"), "0+$", "")


def s2_parent_py(cell: int, level: int) -> int:
    lsb = 1 << (2 * (MAX_LEVEL - level))
    u = cell & ((1 << 64) - 1)
    snapped = (u & ~(2 * lsb - 1)) | lsb
    return snapped - (1 << 64) if snapped >= (1 << 63) else snapped


def s2_level_py(cell: int) -> int:
    u = cell & ((1 << 64) - 1)
    return MAX_LEVEL - ((u & -u).bit_length() - 1) // 2


def s2_token_py(cell: int) -> str:
    return format(cell & ((1 << 64) - 1), "016x").rstrip("0")


# ---------------------------------------------------------------------------
# Generated SQL (DuckDB oracle twin) — 2-bit Hilbert step per level
# ---------------------------------------------------------------------------

def s2_cell_sql(source: str, x: str, y: str, z: str, level: int, out: str = "s2_cell",
                keep: list[str] | None = None) -> str:
    """Return a SELECT (chained CTEs) computing the same int64 cell id in
    ANSI SQL over ``source`` (a table/view/subquery name). ``x,y,z`` are
    column/expression strings; rows with a zero major component or any
    NaN coordinate are dropped (the column twins emit NULL for those).
    ``keep`` lists pass-through columns."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    keep_cols = ", ".join(keep) + "," if keep else ""
    # flattened 16-entry transition tables: idx = orient*4 + ij
    pos_tbl = [IJ_TO_POS[o][q] for o in range(4) for q in range(4)]
    orient_tbl = [o ^ POS_TO_ORIENT[IJ_TO_POS[o][q]] for o in range(4) for q in range(4)]

    def case16(idx_expr: str, tbl: list[int]) -> str:
        whens = " ".join(f"WHEN {n} THEN {tbl[n]}" for n in range(16))
        return f"CASE ({idx_expr}) {whens} END"

    st = lambda w: (f"CASE WHEN {w} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {w}) "
                    f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {w}) END")
    ctes = [f"""__s2_in AS (
  SELECT {keep_cols} CAST({x} AS DOUBLE) AS px, CAST({y} AS DOUBLE) AS py, CAST({z} AS DOUBLE) AS pz
  FROM {source}
)""", f"""__s2_face AS (
  SELECT *, CASE WHEN comp < 0 THEN f0 + 3 ELSE f0 END AS face FROM (
    SELECT *, CASE f0 WHEN 0 THEN px WHEN 1 THEN py ELSE pz END AS comp FROM (
      SELECT {keep_cols} px, py, pz,
             CASE WHEN abs(px) > abs(py)
                  THEN CASE WHEN abs(px) > abs(pz) THEN 0 ELSE 2 END
                  ELSE CASE WHEN abs(py) > abs(pz) THEN 1 ELSE 2 END END AS f0
      FROM __s2_in)) WHERE comp <> 0
        AND px IS NOT NULL AND py IS NOT NULL AND pz IS NOT NULL
        AND NOT (isnan(px) OR isnan(py) OR isnan(pz))
)""", f"""__s2_uv AS (
  SELECT {keep_cols} face,
    CASE face WHEN 0 THEN py/px WHEN 1 THEN -px/py WHEN 2 THEN -px/pz
              WHEN 3 THEN pz/px WHEN 4 THEN pz/py ELSE -py/pz END AS fu,
    CASE face WHEN 0 THEN pz/px WHEN 1 THEN pz/py WHEN 2 THEN -py/pz
              WHEN 3 THEN py/px WHEN 4 THEN -px/py ELSE -px/pz END AS fv
  FROM __s2_face
)""", f"""__s2_ij AS (
  SELECT {keep_cols} face,
    least(greatest(CAST(floor(({st('fu')}) * 1073741824.0) AS BIGINT), 0), 1073741823) AS i,
    least(greatest(CAST(floor(({st('fv')}) * 1073741824.0) AS BIGINT), 0), 1073741823) AS j
  FROM __s2_uv
)""", f"""__s2_h0 AS (
  SELECT {keep_cols} face, i, j, face & 1 AS o, CAST(0 AS BIGINT) AS pos FROM __s2_ij
)"""]
    for l in range(level):
        b = MAX_LEVEL - 1 - l
        idx = f"(o * 4) + (((i >> {b}) & 1) * 2) + ((j >> {b}) & 1)"
        ctes.append(f"""__s2_h{l + 1} AS (
  SELECT {keep_cols} face, i, j,
         {case16(idx, orient_tbl)} AS o,
         (pos * 4) + {case16(idx, pos_tbl)} AS pos
  FROM __s2_h{l}
)""")
    base = "CASE WHEN face >= 4 THEN face - 8 ELSE face END"
    shift = 61 - 2 * level
    final = (f"SELECT {keep_cols} ({base}) * 2305843009213693952 + pos * {1 << shift} "
             f"+ {1 << (shift - 1)} AS {out} FROM __s2_h{level}")
    return "WITH " + ",\n".join(ctes) + "\n" + final
