"""CRS handling: table-level CRS property + reprojection as column math.

The reference auto-reprojects the right table of a geojoin into the left
CRS (``src/geoops/geojoin.jl:216-224``) via the Proj transform. We keep
the CRS as a GeoTable property and implement the transforms the engine
needs as pure column expressions (JVM, codegen'd — no pyproj dependency):

- LatLon (EPSG:4326) ↔ WebMercator (EPSG:3857), spherical formulas
- identity for matching CRS names

Anything else raises — plug additional CRS pairs into ``_TRANSFORMS``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, GeoTable
from geotables_jl_spark.geom.model import st_point

R = 6378137.0  # WGS84 spherical radius used by WebMercator


def _latlon_to_webmercator(x: Column, y: Column) -> tuple[Column, Column]:
    # x = lon, y = lat (degrees)
    mx = x * F.lit(R * math.pi / 180.0)
    my = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(y) / F.lit(2.0))) * F.lit(R)
    return mx, my


def _webmercator_to_latlon(x: Column, y: Column) -> tuple[Column, Column]:
    lon = x / F.lit(R * math.pi / 180.0)
    lat = F.degrees(F.atan(F.sinh(y / F.lit(R))))
    return lon, lat


_TRANSFORMS = {
    ("LatLon", "WebMercator"): _latlon_to_webmercator,
    ("WebMercator", "LatLon"): _webmercator_to_latlon,
}


def reproject(gtb: GeoTable, target_crs: str) -> GeoTable:
    """Reproject a point-geometry GeoTable into ``target_crs``.

    Polygon reprojection (vertex-wise ``F.transform`` over rings) is
    supported for the same CRS pairs.
    """
    if gtb.crs == target_crs:
        return gtb
    key = (gtb.crs, target_crs)
    if key not in _TRANSFORMS:
        raise ValueError(f"no CRS transform registered for {key}")
    fn = _TRANSFORMS[key]
    g = F.col(GEOM)
    nx, ny = fn(g["x"], g["y"])
    # v1: points reproject exactly; polygons via vertex-wise map on rings
    new_point = st_point(nx, ny)
    is_point = g["kind"] == 1
    # ring vertices: pairs (x,y) flat — transform with index-parity trick
    def _ring_map(ring: Column) -> Column:
        n = F.size(ring)
        idx = F.sequence(F.lit(0), n - 1)
        return F.transform(
            idx,
            lambda i: F.when(
                i % 2 == 0, fn(F.element_at(ring, i + 1), F.element_at(ring, i + 2))[0]
            ).otherwise(fn(F.element_at(ring, i), F.element_at(ring, i + 1))[1]),
        )

    new_rings = F.transform(g["rings"], _ring_map)
    xs = F.flatten(F.transform(new_rings, lambda r: F.filter(r, lambda v, i: i % 2 == 0)))
    ys = F.flatten(F.transform(new_rings, lambda r: F.filter(r, lambda v, i: i % 2 == 1)))
    new_poly = F.struct(
        g["kind"].alias("kind"),
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
        new_rings.alias("rings"),
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )
    out = gtb.df.withColumn(GEOM, F.when(is_point, new_point).otherwise(new_poly))
    return GeoTable(df=out, crs=target_crs, lenunit=gtb.lenunit, grid=gtb.grid, units=dict(gtb.units))
