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


def _shoelace_terms(g: Column) -> Column:
    """array of per-edge cross terms x_i*y_{i+1} - x_{i+1}*y_i (closed ring)."""
    ring = _ring(g)
    n = (F.size(ring) / 2).cast("int")
    idx = F.sequence(F.lit(0), n - 1)

    def term(i: Column) -> Column:
        x1, y1 = _vertex(ring, i)
        j = (i + 1) % n
        x2, y2 = _vertex(ring, j)
        return x1 * y2 - x2 * y1

    return F.transform(idx, term)


def st_area(g: Column) -> Column:
    """Unsigned polygon area (shoelace); 0.0 for points."""
    poly_area = F.abs(
        F.aggregate(_shoelace_terms(g), F.lit(0.0), lambda acc, t: acc + t)
    ) / F.lit(2.0)
    return F.when(g["kind"] == 1, F.lit(0.0)).otherwise(poly_area)


def st_centroid(g: Column) -> Column:
    """Centroid geometry: identity for points; exact area centroid for
    polygons (falls back to vertex mean for degenerate zero-area rings)."""
    ring = _ring(g)
    n = (F.size(ring) / 2).cast("int")
    idx = F.sequence(F.lit(0), n - 1)

    def cx_term(i: Column) -> Column:
        x1, y1 = _vertex(ring, i)
        j = (i + 1) % n
        x2, y2 = _vertex(ring, j)
        return (x1 + x2) * (x1 * y2 - x2 * y1)

    def cy_term(i: Column) -> Column:
        x1, y1 = _vertex(ring, i)
        j = (i + 1) % n
        x2, y2 = _vertex(ring, j)
        return (y1 + y2) * (x1 * y2 - x2 * y1)

    a2 = F.aggregate(_shoelace_terms(g), F.lit(0.0), lambda acc, t: acc + t)  # 2A signed
    cx = F.aggregate(F.transform(idx, cx_term), F.lit(0.0), lambda acc, t: acc + t) / (F.lit(3.0) * a2)
    cy = F.aggregate(F.transform(idx, cy_term), F.lit(0.0), lambda acc, t: acc + t) / (F.lit(3.0) * a2)
    # degenerate ring: vertex mean
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
