"""Geometry accessor/constructor column expressions — all JVM-side.

These are the scalar geometry functions admitted inside @transform/@combine
expressions in the reference (``centroid``, ``coords``, ``area`` — exercised
at ``test/operations.jl:453-461,495-496,569``), expressed as pure Spark
column math over the geometry struct (whole-stage codegen; no UDF):

- ``st_x/st_y``: point coordinates
- ``st_centroid``: point → itself; polygon → exact area-weighted centroid
  via ``F.aggregate`` over the ring (shoelace formula)
- ``st_area``: shoelace area (0 for points)
- ``st_collect_*``: geometry reduction to multipoint/multipolygon —
  the Spark form of the reference's ``Multi(domain)`` default combine
  reduction (``src/geoops/combine.jl:52-57,75-81``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geotables_jl_spark.geom.model import KIND_MULTIPOINT, KIND_MULTIPOLYGON, st_point


def st_x(g: Column) -> Column:
    return g["x"]


def st_y(g: Column) -> Column:
    return g["y"]


def _ring(g: Column) -> Column:
    return F.element_at(g["rings"], 1)


def _vertex(ring: Column, i: Column) -> tuple[Column, Column]:
    # i is 0-based vertex index; ring is flat [x0,y0,x1,y1,...]
    return F.element_at(ring, i * 2 + 1), F.element_at(ring, i * 2 + 2)


def _ring_sum(ring: Column, term_of) -> Column:
    """Σ over the closed edges of one flat ring of ``term_of(x1,y1,x2,y2)``."""
    n = (F.size(ring) / 2).cast("int")
    idx = F.sequence(F.lit(0), n - 1)

    def term(i: Column) -> Column:
        x1, y1 = _vertex(ring, i)
        j = (i + 1) % n
        x2, y2 = _vertex(ring, j)
        return term_of(x1, y1, x2, y2)

    return F.aggregate(F.transform(idx, term), F.lit(0.0), lambda acc, t: acc + t)


def _all_rings_sum(g: Column, term_of) -> Column:
    """Signed Σ of a shoelace-style edge term over ALL rings. With the
    builder orientation convention (outer CCW, holes CW —
    ``geom/model._oriented``) the hole contribution subtracts, so
    area/centroid are hole-exact without any branching."""
    per_ring = F.transform(g["rings"], lambda ring: _ring_sum(ring, term_of))
    return F.aggregate(per_ring, F.lit(0.0), lambda acc, t: acc + t)


def st_area(g: Column) -> Column:
    """Unsigned polygon area (shoelace over all rings: holes subtract);
    0.0 for points."""
    poly_area = F.abs(
        _all_rings_sum(g, lambda x1, y1, x2, y2: x1 * y2 - x2 * y1)
    ) / F.lit(2.0)
    return F.when(g["kind"] == 1, F.lit(0.0)).otherwise(poly_area)


def st_centroid(g: Column) -> Column:
    """Centroid geometry: identity for points; exact area centroid for
    polygons incl. holes/multi parts (falls back to the outer-ring vertex
    mean for degenerate zero-area rings)."""
    a2 = _all_rings_sum(g, lambda x1, y1, x2, y2: x1 * y2 - x2 * y1)  # 2A signed
    cx = _all_rings_sum(
        g, lambda x1, y1, x2, y2: (x1 + x2) * (x1 * y2 - x2 * y1)
    ) / (F.lit(3.0) * a2)
    cy = _all_rings_sum(
        g, lambda x1, y1, x2, y2: (y1 + y2) * (x1 * y2 - x2 * y1)
    ) / (F.lit(3.0) * a2)
    # degenerate ring: vertex mean of the outer ring
    ring = _ring(g)
    xs = F.filter(ring, lambda v, i: i % 2 == 0)
    ys = F.filter(ring, lambda v, i: i % 2 == 1)
    mx = F.aggregate(xs, F.lit(0.0), lambda a, v: a + v) / F.size(xs)
    my = F.aggregate(ys, F.lit(0.0), lambda a, v: a + v) / F.size(ys)
    px = F.when(F.abs(a2) > 1e-300, cx).otherwise(mx)
    py = F.when(F.abs(a2) > 1e-300, cy).otherwise(my)
    return F.when(g["kind"] == 1, g).otherwise(st_point(px, py))


def st_collect_points(sorted_geoms: Column) -> Column:
    """Multipoint from an array of point-geometry structs (already sorted
    deterministically by the caller — SURVEY §7 hard part #5)."""
    flat = F.flatten(F.transform(sorted_geoms, lambda g: F.array(g["x"], g["y"])))
    xs = F.transform(sorted_geoms, lambda g: g["x"])
    ys = F.transform(sorted_geoms, lambda g: g["y"])
    return F.struct(
        F.lit(KIND_MULTIPOINT).alias("kind"),
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
        F.array(flat).alias("rings"),
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


def st_collect_polygons(sorted_geoms: Column) -> Column:
    """Multipolygon from an array of polygon-geometry structs."""
    rings = F.flatten(F.transform(sorted_geoms, lambda g: g["rings"]))
    return F.struct(
        F.lit(KIND_MULTIPOLYGON).alias("kind"),
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
        rings.alias("rings"),
        F.array_min(F.transform(sorted_geoms, lambda g: g["xmin"])).alias("xmin"),
        F.array_min(F.transform(sorted_geoms, lambda g: g["ymin"])).alias("ymin"),
        F.array_max(F.transform(sorted_geoms, lambda g: g["xmax"])).alias("xmax"),
        F.array_max(F.transform(sorted_geoms, lambda g: g["ymax"])).alias("ymax"),
    )


def st_distance_points(g1: Column, g2: Column) -> Column:
    return F.hypot(g1["x"] - g2["x"], g1["y"] - g2["y"])
