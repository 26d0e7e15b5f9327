"""S2-cell-indexed spherical joins — the web-scale realization of the
reference's geojoin matching (``/root/reference/src/geoops/geojoin.jl``:
brute-force nested loops over ``intersects``/kNN) as the mandated
two-stage cell-indexed broadcast-or-shuffle join:

1. **filter** — candidate pairs by S2 cell equality: the right side
   carries its single level-k cell (pure JVM codegen,
   ``geom/s2.with_s2_cell``); the left side explodes to the rigorous
   cap cover of its search radius (vectorized numpy Arrow kernel,
   ``geom/s2.s2_cap_cells_np``). Optional explicit salting splits
   pathological cells (megacities at web scale) beyond what AQE's
   skew-join handles.
2. **refine** — exact chord-distance predicate in whole-stage codegen
   (no Python): a right point has exactly one cell, so a pair meets in
   at most one cell and needs no dedup.

kNN runs the same filter/refine as **cell-ring expansion**: each round
covers a cap of the current search radius; a row is *certified* when its
k-th candidate lies within the covered radius (every point inside the
cover radius is guaranteed to be a candidate — cover is a superset by
construction), otherwise it escalates to a 3× radius (and a
correspondingly coarser level) next round. ``chord >= 2`` covers the
whole sphere, so the loop degrades gracefully to brute force and is
exact at any k without a special arm.

Scale shape: the right table never shuffles more than once per round
(hash on cell id, or broadcast when small); the left explodes ~10-25×
into its cover, the published inverted-index trade. Rounds after the
first touch only uncertified rows (empty-region points), a vanishing
fraction under any realistic density.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geotables_jl_spark.geom import s2

__all__ = ["s2_point_prep", "s2_dwithin_join", "s2_knn_join"]


def s2_point_prep(
    df: DataFrame,
    id_col: str,
    xyz: tuple[str, str, str] | None = None,
    latlon: tuple[str, str] | None = None,
    keep: Iterable[str] = (),
) -> DataFrame:
    """Project to (id, nx, ny, nz): unit direction vectors. ``xyz`` input
    is normalized with the exact expression ``c / sqrt(x²+y²+z²)`` (one
    formula shared with the SQL oracle twins — bit-exact); ``latlon``
    uses engine trig (see geom/s2.py docstring for the 1-ulp caveat).
    Zero vectors yield NULL and are dropped."""
    if (xyz is None) == (latlon is None):
        raise ValueError("pass exactly one of xyz= or latlon=")
    if latlon is not None:
        lat, lon = (F.radians(F.col(c).cast("double")) for c in latlon)
        out = df.select(
            F.col(id_col),
            (F.cos(lat) * F.cos(lon)).alias("nx"),
            (F.cos(lat) * F.sin(lon)).alias("ny"),
            F.sin(lat).alias("nz"),
            *keep,
        )
        return out
    x, y, z = (F.col(c).cast("double") for c in xyz)
    nrm = F.sqrt(x * x + y * y + z * z)
    return df.select(
        F.col(id_col),
        F.when(nrm > 0, x / nrm).alias("nx"),
        F.when(nrm > 0, y / nrm).alias("ny"),
        F.when(nrm > 0, z / nrm).alias("nz"),
        *keep,
    ).where(F.col("nx").isNotNull())


def _chord2(l: str, r: str) -> Column:
    dx = F.col(l + "x") - F.col(r + "x")
    dy = F.col(l + "y") - F.col(r + "y")
    dz = F.col(l + "z") - F.col(r + "z")
    return dx * dx + dy * dy + dz * dz


def _cover_explode(left: DataFrame, chord_col: str | None, chord: float | None,
                   level: int, extra: list[str]) -> DataFrame:
    """Arrow kernel: explode each left point into its cap-cover cells.
    ``chord_col`` names a per-row radius column (kNN rounds) or ``chord``
    is a constant (dwithin)."""
    cols = ["lid", "lx", "ly", "lz"] + extra + ([chord_col] if chord_col else [])
    src = left.select(*cols)
    schema = ", ".join(
        [f"{c} double" if c not in ("lid",) else "lid long" for c in cols]
    ) + ", __cell long"

    def _iter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ch = pdf[chord_col].to_numpy() if chord_col else chord
            rows, cells = s2.s2_cap_cells_np(
                pdf["lx"].to_numpy(), pdf["ly"].to_numpy(), pdf["lz"].to_numpy(),
                ch, level,
            )
            out = pdf.iloc[rows].reset_index(drop=True)
            out["__cell"] = cells
            yield out

    return src.mapInPandas(_iter, schema=schema)


def _right_cells(right: DataFrame, level: int) -> DataFrame:
    r = right.select(
        F.col("rid"), F.col("nx").alias("rx"), F.col("ny").alias("ry"), F.col("nz").alias("rz")
    )
    r = s2.with_s2_cell(r, level, out="__cell", xyz=("rx", "ry", "rz"))
    return r.where(F.col("__cell").isNotNull())


def s2_dwithin_join(
    left: DataFrame,
    right: DataFrame,
    chord: float,
    level: int | None = None,
    salt: int = 1,
    broadcast_right: bool | None = None,
) -> DataFrame:
    """All (lid, rid, chord2) pairs with euclidean chord distance <=
    ``chord`` between unit vectors (monotone in great-circle distance:
    chord = 2·sin(angle/2)). Inputs are ``s2_point_prep`` outputs with
    columns (lid|rid, nx, ny, nz).

    Plan: right → single cell id (codegen); left → cap-cover explode
    (Arrow); equi-join on cell (broadcast if ``broadcast_right``, else
    shuffle with optional ``salt``-way hot-cell splitting); exact chord²
    refine in codegen. No dedup needed (right cell unique per rid)."""
    lvl = level if level is not None else s2.s2_level_for_chord(chord)
    l = _cover_explode(
        left.select(F.col("lid"), F.col("nx").alias("lx"), F.col("ny").alias("ly"),
                    F.col("nz").alias("lz")),
        None, chord, lvl, [],
    )
    r = _right_cells(right, lvl)
    if salt > 1:
        # replicate the (smaller) right side across salt ids; split the
        # exploded left's hot cells by row-id hash — same shape as the
        # planar geojoin's explicit skew salting (operators/geojoin.py)
        l = l.withColumn("__salt", F.pmod(F.hash(F.col("lid")), F.lit(salt)))
        r = r.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        on = ["__cell", "__salt"]
    else:
        on = ["__cell"]
    rr = F.broadcast(r) if broadcast_right else r
    pairs = l.join(rr, on=on, how="inner")
    out = pairs.where(_chord2("l", "r") <= F.lit(float(chord) * float(chord))).select(
        "lid", "rid", _chord2("l", "r").alias("chord2")
    )
    return out


def s2_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    n_right: int | None = None,
    chord0: float | None = None,
    max_rounds: int = 6,
    broadcast_right: bool | None = None,
) -> DataFrame:
    """Exact k nearest right points per left point by chord distance,
    ties broken by ascending rid — via S2 cell-ring expansion: cover the
    current radius, certify rows whose k-th candidate is inside the
    covered radius, escalate the rest 3×. Returns (lid, rid, chord2,
    rank), rank 1..k.

    ``n_right`` sizes the initial radius (uniform-density estimate
    ``theta0 ~ 2*sqrt(k/n)``); pass it to avoid the planning-time
    ``count()`` (the stats-injection escape hatch, same contract as the
    planar kNN's planning aggregates)."""
    if chord0 is None:
        if n_right is None:
            n_right = right.count()
        theta0 = 2.0 * math.sqrt(max(k, 1) / max(n_right, 1))
        chord0 = min(2.0, 1.5 * theta0)
    spark = left.sparkSession
    remaining = left.select(
        F.col("lid"), F.col("nx").alias("lx"), F.col("ny").alias("ly"), F.col("nz").alias("lz")
    )
    results = []
    chord = float(chord0)
    for rnd in range(max_rounds):
        lvl = s2.s2_level_for_chord(chord)
        l = _cover_explode(remaining, None, chord, lvl, [])
        r = _right_cells(right, lvl)
        rr = F.broadcast(r) if broadcast_right else r
        cand = l.join(rr, on="__cell", how="inner").select(
            "lid", "rid", _chord2("l", "r").alias("chord2")
        )
        # candidates beyond the covered radius can never certify a row
        # (a row with < k survivors fails the __n >= k certificate and is
        # recomputed at the escalated radius anyway) — filter them out
        # BEFORE the window so the lid-shuffle carries ~cap-area rows,
        # not ~cover-area rows (the cover oversamples the cap ~6×).
        # Skipped on the full-sphere round: there the filter saves nothing
        # and an ulp of fp error at exactly-antipodal chord2 == 4 could
        # drop an exact candidate.
        if chord < 2.0:
            cand = cand.where(F.col("chord2") <= F.lit(chord * chord))
        # top-k per lid (partitioned window — one shuffle on lid)
        from pyspark.sql import Window

        w = Window.partitionBy("lid").orderBy(F.col("chord2").asc(), F.col("rid").asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        full_sphere = chord >= 2.0
        if full_sphere:
            results.append(topk)
            break
        # certificate: the k-th candidate lies within the covered radius
        kth = topk.groupBy("lid").agg(
            F.max("rank").alias("__n"), F.max("chord2").alias("__kth2")
        )
        cert = kth.where(
            (F.col("__n") >= k) & (F.col("__kth2") <= F.lit(chord * chord))
        ).select("lid")
        done = topk.join(F.broadcast(cert) if broadcast_right else cert, "lid", "inner")
        # checkpoint this round's certified output so escalation doesn't
        # recompute it (localCheckpoint: executor-local, no lineage)
        results.append(done.localCheckpoint(eager=False))
        remaining = remaining.join(cert, "lid", "left_anti").localCheckpoint(eager=False)
        if remaining.isEmpty():
            break
        chord = min(2.0, chord * 3.0)
    else:
        # max_rounds exhausted without reaching the whole sphere: one
        # exact final pass at chord=2 (full cover — always certified)
        lvl = 0
        l = _cover_explode(remaining, None, 2.0, lvl, [])
        r = _right_cells(right, lvl)
        cand = l.join(r, on="__cell", how="inner").select(
            "lid", "rid", _chord2("l", "r").alias("chord2")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("lid").orderBy(F.col("chord2").asc(), F.col("rid").asc())
        results.append(cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k))
    out = results[0]
    for df in results[1:]:
        out = out.unionByName(df)
    return out
