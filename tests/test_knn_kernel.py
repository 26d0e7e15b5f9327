"""Property test of the one-pass exact kNN kernel (geom/knn_kernel.py)
against a brute-force numpy reference — no Spark session needed, so it
exercises hostile layouts (clustered + far outliers that force the
in-kernel escalation and brute-force tail, duplicated coordinates that
force distance ties, k ≥ n2, tiny chunk budgets) cheaply.

Reference parity: tie order is (dist, rid) ascending, matching the JVM
rounds and the DuckDB oracle (``src/geoops/geojoin.jl`` has no kNN — the
kind is mandated by the driver north star, so the oracle IS the spec).
"""

from __future__ import annotations

import numpy as np

from geotables_jl_spark.geom.knn_kernel import (
    RightIndex,
    pack_cells_np,
    score_batch_exact,
)


def _brute_ref(lx, ly, rid, rx, ry, k):
    order = np.argsort(rid, kind="stable")
    rid, rx, ry = rid[order], rx[order], ry[order]
    out = []
    for x, y in zip(lx, ly):
        d = np.sqrt((x - rx) ** 2 + (y - ry) ** 2)
        o = np.argsort(d, kind="stable")[: min(k, len(rid))]
        out.append(list(zip(rid[o].tolist(), d[o].tolist())))
    return out


def test_score_batch_exact_matches_brute_force():
    rng = np.random.default_rng(42)
    for trial in range(40):
        n2 = int(rng.integers(1, 400))
        n1 = int(rng.integers(1, 500))
        k = int(rng.integers(1, 12))
        layout = trial % 3
        if layout == 0:  # uniform
            rx, ry = rng.uniform(0, 100, n2), rng.uniform(0, 100, n2)
            lx, ly = rng.uniform(0, 100, n1), rng.uniform(0, 100, n1)
        elif layout == 1:  # dense cluster + far outliers → escalate/brute
            rx, ry = rng.normal(50, 1, n2), rng.normal(50, 1, n2)
            lx = np.concatenate(
                [rng.normal(50, 1, n1 // 2), rng.uniform(-1e4, 1e4, n1 - n1 // 2)]
            )
            ly = np.concatenate(
                [rng.normal(50, 1, n1 // 2), rng.uniform(-1e4, 1e4, n1 - n1 // 2)]
            )
        else:  # duplicated coords → distance ties at the k boundary
            base = rng.uniform(0, 10, max(n2 // 4, 1))
            rx, ry = rng.choice(base, n2), rng.choice(base, n2)
            lx, ly = rng.choice(base, n1), rng.choice(base, n1)
        rid = rng.permutation(n2).astype(np.int64) * 7 + 3
        lid = np.arange(n1, dtype=np.int64)
        cell = float(rng.uniform(0.05, 30))
        idx = RightIndex(rid.copy(), rx.copy(), ry.copy(), cell)
        lcell = pack_cells_np(
            np.floor(lx / cell).astype(np.int64), np.floor(ly / cell).astype(np.int64)
        )
        radius = int(rng.integers(1, 3))
        budget = int(rng.choice([64, 1000, 262144]))
        cols, off, ridv, distv = score_batch_exact(lid, lx, ly, lcell, idx, radius, k, budget)
        ref = _brute_ref(lx, ly, rid, rx, ry, k)
        # complete accounting: every input row appears exactly once
        assert sorted(cols["__lid"].tolist()) == lid.tolist()
        for pos in range(n1):
            i = int(cols["__lid"][pos])
            got = list(zip(ridv[off[pos] : off[pos + 1]].tolist(), distv[off[pos] : off[pos + 1]].tolist()))
            assert got == ref[i], (
                f"trial {trial} layout {layout} lid {i}: k={k} n2={n2} "
                f"cell={cell:.4f} r={radius} budget={budget}"
            )


def test_score_batch_exact_empty_sides():
    idx = RightIndex(np.empty(0, np.int64), np.empty(0), np.empty(0), 1.0)
    lid = np.arange(3, dtype=np.int64)
    lx = ly = np.zeros(3)
    lcell = pack_cells_np(np.zeros(3, np.int64), np.zeros(3, np.int64))
    cols, off, ridv, distv = score_batch_exact(lid, lx, ly, lcell, idx, 1, 5)
    assert (cols["__cnt"] == 0).all() and len(ridv) == 0 and list(off) == [0, 0, 0, 0]
    idx2 = RightIndex(np.array([7], np.int64), np.array([0.5]), np.array([0.5]), 1.0)
    cols, off, ridv, distv = score_batch_exact(
        np.empty(0, np.int64), np.empty(0), np.empty(0), np.empty(0, np.int64), idx2, 1, 5
    )
    assert len(ridv) == 0 and list(off) == [0]
