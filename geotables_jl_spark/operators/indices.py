"""Domain-driven partition / sample / sort (reference ``src/indices.jl:5-11``
shims; methods exercised in ``test/indices.jl:5-37``).

Every method is a pure column expression producing a partition-id /
sort-key column — no shuffles beyond what the consumer asks for.
Centroids come from ``st_centroid`` (JVM shoelace math).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable
from geotables_jl_spark.functions.geomfuncs import st_centroid

PARTITION_COL = "partition_id"


def _centroid_xy(g: Column) -> tuple[Column, Column]:
    c = st_centroid(g)
    return c["x"], c["y"]


def partition_uniform(gtb: GeoTable, k: int, seed: int = 42) -> GeoTable:
    """UniformPartition: k roughly equal random parts. Deterministic:
    hash(row_id, seed) mod k."""
    pid = F.pmod(F.hash(F.col(ROW_ID), F.lit(seed)), F.lit(k))
    return gtb._with(gtb.df.withColumn(PARTITION_COL, pid))


def partition_fraction(gtb: GeoTable, fraction: float, seed: int = 42) -> GeoTable:
    """FractionPartition: two parts, first ≈ fraction of rows."""
    u = F.pmod(F.hash(F.col(ROW_ID), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    pid = F.when(u < fraction, F.lit(0)).otherwise(F.lit(1))
    return gtb._with(gtb.df.withColumn(PARTITION_COL, pid))


def partition_block(gtb: GeoTable, bx: float, by: float | None = None) -> GeoTable:
    """BlockPartition: tile the plane with bx × by blocks; id packs the
    block coordinates (this IS the raster↔vector tile assignment)."""
    by = by if by is not None else bx
    cx, cy = _centroid_xy(F.col(GEOM))
    pid = F.floor(cx / F.lit(bx)) * F.lit(1 << 31) + F.floor(cy / F.lit(by))
    return gtb._with(gtb.df.withColumn(PARTITION_COL, pid.cast("long")))


def partition_bisect(gtb: GeoTable, dx: float, dy: float, point: tuple[float, float] = (0.0, 0.0)) -> GeoTable:
    """BisectPointPartition: split by the plane through `point` with
    normal (dx, dy)."""
    cx, cy = _centroid_xy(F.col(GEOM))
    side = (cx - F.lit(point[0])) * F.lit(dx) + (cy - F.lit(point[1])) * F.lit(dy)
    return gtb._with(gtb.df.withColumn(PARTITION_COL, F.when(side >= 0, 1).otherwise(0)))


def partition_direction(gtb: GeoTable, dx: float, dy: float, nbins: int = 10) -> GeoTable:
    """DirectionPartition: bin by projection onto a direction — exact
    ntile over the global order, computed distributed (range-bucket rank,
    ``operators/ranking.py``), ties broken by row_id."""
    from geotables_jl_spark.operators.ranking import ntile_col

    cx, cy = _centroid_xy(F.col(GEOM))
    proj = cx * F.lit(dx) + cy * F.lit(dy)
    df = ntile_col(gtb.df, proj, nbins, out=PARTITION_COL, tiebreak=[F.col(ROW_ID).asc()])
    return gtb._with(df.withColumn(PARTITION_COL, F.col(PARTITION_COL) - 1))


def partition_predicate(gtb: GeoTable, pred: Column) -> GeoTable:
    """IndexPredicatePartition: boolean predicate → parts {0,1}."""
    return gtb._with(gtb.df.withColumn(PARTITION_COL, F.when(pred, 1).otherwise(0)))


def partition_product(gtb: GeoTable, *cols: str) -> GeoTable:
    """ProductPartition: cross of existing partition-id columns."""
    pid = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return gtb._with(gtb.df.withColumn(PARTITION_COL, F.hash(pid).cast("long")))


def partition_ball(gtb: GeoTable, radius: float) -> GeoTable:
    """BallPartition: points within the same radius-``radius`` ball share
    a part. Scale approximation of the reference's ball grouping: snap
    centroids to a 2r grid (every pair in a part is within 2r·√2; exact
    ball merging needs a sequential scan the reference does in-memory —
    the cell form is the distributable equivalent, one column expr)."""
    cx, cy = _centroid_xy(F.col(GEOM))
    s = 2.0 * radius
    pid = F.floor(cx / F.lit(s)) * F.lit(1 << 31) + F.floor(cy / F.lit(s))
    return gtb._with(gtb.df.withColumn(PARTITION_COL, pid.cast("long")))


def partition_ball_exact(gtb: GeoTable, radius: float) -> GeoTable:
    """Reference-exact BallPartition: sweep rows in ``row_id`` order;
    each unassigned row seeds a new part and captures every unassigned
    row within ``radius`` of it (Meshes.jl ball grouping is this
    sequential seed scan — order-dependent by construction, so no
    shuffle-parallel formulation can reproduce it exactly). The sweep
    runs driver-side over (row_id, cx, cy) only — numpy-vectorized per
    seed, fine to ~10M rows; beyond that use :func:`partition_ball`
    (the cell approximation) and accept the different part boundaries."""
    import numpy as np

    cx, cy = _centroid_xy(F.col(GEOM))
    pdf = (
        gtb.df.select(F.col(ROW_ID).alias("rid"), cx.alias("px"), cy.alias("py"))
        .orderBy("rid")
        .toPandas()
    )
    rid = pdf["rid"].to_numpy()
    px = pdf["px"].to_numpy(float)
    py = pdf["py"].to_numpy(float)
    pid = np.full(len(rid), -1, dtype=np.int64)
    next_pid = 0
    for i in range(len(rid)):
        if pid[i] >= 0:
            continue
        free = pid < 0
        d2 = (px - px[i]) ** 2 + (py - py[i]) ** 2
        pid[free & (d2 <= radius * radius)] = next_pid
        next_pid += 1
    spark = gtb.df.sparkSession
    mapping = spark.createDataFrame(
        [(int(r), int(p)) for r, p in zip(rid, pid)], f"{ROW_ID} long, {PARTITION_COL} long"
    )
    out = gtb.df.join(F.broadcast(mapping), on=ROW_ID, how="left")
    return gtb._with(out)


def partition_hierarchical(gtb: GeoTable, coarse: float, fine: float) -> GeoTable:
    """HierarchicalPartition: coarse block id + nested fine block id —
    two-level tiling (coarse id in the high bits). Matches the
    reference's nested-partition composition as pure column math."""
    cx, cy = _centroid_xy(F.col(GEOM))
    cid = F.floor(cx / F.lit(coarse)) * F.lit(1 << 15) + F.floor(cy / F.lit(coarse))
    fid = F.floor((cx % F.lit(coarse)) / F.lit(fine)) * F.lit(1 << 7) + F.floor(
        (cy % F.lit(coarse)) / F.lit(fine)
    )
    pid = cid * F.lit(1 << 16) + fid
    return gtb._with(gtb.df.withColumn(PARTITION_COL, pid.cast("long")))


def sample_uniform(gtb: GeoTable, n: int, seed: int = 42) -> GeoTable:
    """UniformSampling(n) without replacement — deterministic: order by
    hash(row_id, seed), take n (TABLESAMPLE-style reservoir is not
    deterministic across partitioning; rank-based is)."""
    u = F.hash(F.col(ROW_ID), F.lit(seed))
    return gtb._with(gtb.df.orderBy(u, F.col(ROW_ID)).limit(n))


def sort_direction(gtb: GeoTable, dx: float, dy: float) -> GeoTable:
    """DirectionSort: global sort by projection of centroid onto (dx,dy)
    — range-partitioned sort, no window."""
    cx, cy = _centroid_xy(F.col(GEOM))
    proj = cx * F.lit(dx) + cy * F.lit(dy)
    return gtb._with(gtb.df.orderBy(proj.asc(), F.col(ROW_ID).asc()))
