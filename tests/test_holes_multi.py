"""Polygon holes (PolyArea inner rings) + Multi mixed-geometry support
(reference ``test/operations.jl:3-24``; PolyArea holes are first-class in
Meshes.jl). Kernel-level numpy tests need no Spark session; Spark-level
tests drive the holed geometry through georef → geojoin / spatial select.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef
from geotables_jl_spark.geom import kernel
from geotables_jl_spark.geom.model import (
    KIND_MULTIPOINT,
    KIND_MULTIPOLYGON,
    geom_rows_from_polygons,
    point_row,
    st_polygon_lit,
)
from geotables_jl_spark.operators.geojoin import geojoin, spatial_filter

# 10×10 square with a 2×2 hole at its center
OUTER = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
HOLE = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)]


def _flat(v):
    return np.array([c for xy in v for c in xy], dtype=np.float64)


def _holed_rings():
    rows = geom_rows_from_polygons([OUTER], holes=[[HOLE]])
    return rows[0]["rings"]


def test_points_in_poly_respects_holes():
    rings = _holed_rings()
    px = np.array([5.0, 1.0, 5.0, 4.0, 9.0, 11.0])
    py = np.array([5.0, 1.0, 4.0, 4.0, 9.0, 5.0])
    got = kernel.points_in_poly(px, py, rings, 3)
    #           hole  solid  on-hole-edge  hole-corner  solid  outside
    assert got.tolist() == [False, True, True, True, True, False]


def test_hole_orientation_is_normalized():
    rows = geom_rows_from_polygons([OUTER], holes=[[HOLE]])
    rr = [np.asarray(r) for r in rows[0]["rings"]]
    assert kernel.ring_signed_area(rr[0]) > 0  # outer CCW
    assert kernel.ring_signed_area(rr[1]) < 0  # hole CW
    # same answer regardless of the orientation the caller supplied
    rows2 = geom_rows_from_polygons([OUTER[::-1]], holes=[[HOLE[::-1]]])
    assert rows2[0]["rings"] == rows[0]["rings"]


def test_poly_poly_with_holes():
    holed = _holed_rings()
    inside_hole = [_flat([(4.6, 4.6), (5.4, 4.6), (5.4, 5.4), (4.6, 5.4)])]
    crossing_hole_edge = [_flat([(3.0, 4.5), (5.0, 4.5), (5.0, 5.5), (3.0, 5.5)])]
    solid_band = [_flat([(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)])]
    spanning_hole = [_flat([(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0)])]

    assert not kernel.poly_intersects_poly(inside_hole, 3, holed, 3)
    assert kernel.poly_intersects_poly(crossing_hole_edge, 3, holed, 3)
    assert kernel.poly_intersects_poly(solid_band, 3, holed, 3)
    assert kernel.poly_intersects_poly(spanning_hole, 3, holed, 3)

    assert kernel.poly_within_poly(solid_band, 3, holed, 3)
    assert not kernel.poly_within_poly(inside_hole, 3, holed, 3)
    assert not kernel.poly_within_poly(spanning_hole, 3, holed, 3)
    # a holed polygon is within its own outer ring
    outer_only = [np.asarray(holed[0])]
    assert kernel.poly_within_poly(holed, 3, outer_only, 3)
    # ...but the outer square is NOT within the holed polygon
    assert not kernel.poly_within_poly(outer_only, 3, holed, 3)


def test_multipolygon_orientation_split():
    # two CCW parts + one CW hole inside part 1, flattened as kind=5
    part1 = _flat(OUTER)
    hole1 = _flat(HOLE[::-1])  # CW
    part2 = _flat([(20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0)])
    rings = [part1, hole1, part2]
    px = np.array([5.0, 1.0, 25.0, 15.0])
    py = np.array([5.0, 1.0, 5.0, 5.0])
    got = kernel.points_in_poly(px, py, rings, 5)
    assert got.tolist() == [False, True, True, False]


def test_spark_geojoin_holed_polygon(spark):
    """Left = one holed polygon; right = points inside hole / solid /
    outside. Hole-interior points must NOT aggregate into the match."""
    from pyspark.sql import types as T

    from tests.fixtures import _schema

    geom_rows = geom_rows_from_polygons([OUTER], holes=[[HOLE]])
    left_df = spark.createDataFrame(
        [{"row_id": 0, "name": "holed", "geometry": geom_rows[0]}],
        _schema([T.StructField("name", T.StringType())]),
    )
    left = GeoTable(df=left_df, crs="Cartesian")

    pts = [(0, 5.0, 5.0, 100.0), (1, 1.0, 1.0, 10.0), (2, 9.0, 9.0, 20.0), (3, 11.0, 5.0, 40.0)]
    right_df = spark.createDataFrame(pts, "row_id long, px double, py double, v double")
    right = georef(right_df, coords=["px", "py"])

    out = geojoin(left, right, aggs={"v": "sum"}, kind="left").df.collect()
    assert len(out) == 1
    assert out[0]["v"] == pytest.approx(30.0)  # only the two solid points

    # spatial_filter with a holed query geometry
    got = spatial_filter(right.df, st_polygon_lit(OUTER, holes=[HOLE])).collect()
    assert sorted(r["row_id"] for r in got) == [1, 2]


def test_area_centroid_with_holes(spark):
    from geotables_jl_spark.functions.geomfuncs import st_area, st_centroid

    df = spark.range(1).select(st_polygon_lit(OUTER, holes=[HOLE]).alias("geometry"))
    r = df.select(
        st_area(F.col("geometry")).alias("a"),
        st_centroid(F.col("geometry"))["x"].alias("cx"),
        st_centroid(F.col("geometry"))["y"].alias("cy"),
    ).collect()[0]
    assert r["a"] == pytest.approx(100.0 - 4.0)
    # symmetric hole at the center leaves the centroid at the center
    assert r["cx"] == pytest.approx(5.0) and r["cy"] == pytest.approx(5.0)

    # asymmetric hole pushes the centroid away from it
    hole2 = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]
    df2 = spark.range(1).select(st_polygon_lit(OUTER, holes=[hole2]).alias("geometry"))
    r2 = df2.select(
        st_area(F.col("geometry")).alias("a"),
        st_centroid(F.col("geometry"))["x"].alias("cx"),
    ).collect()[0]
    assert r2["a"] == pytest.approx(96.0)
    assert r2["cx"] > 5.0


def test_spark_geojoin_multipolygon(spark):
    """Mixed-geometry right side incl. a kind=5 Multi (two parts, one
    holed): aggregate-on-match counts respect part membership and holes
    (reference Multi in GeometrySet, test/operations.jl:3-8)."""
    from pyspark.sql import types as T

    from tests.fixtures import _schema

    part1 = [c for xy in OUTER for c in xy]
    hole1 = [c for xy in HOLE[::-1] for c in xy]  # CW hole
    part2 = [20.0, 0.0, 30.0, 0.0, 30.0, 10.0, 20.0, 10.0]
    multi = {
        "kind": 5, "x": None, "y": None,
        "rings": [part1, hole1, part2],
        "xmin": 0.0, "ymin": 0.0, "xmax": 30.0, "ymax": 10.0,
    }
    left_df = spark.createDataFrame(
        [{"row_id": 0, "name": "multi", "geometry": multi}],
        _schema([T.StructField("name", T.StringType())]),
    )
    left = GeoTable(df=left_df, crs="Cartesian")
    pts = [
        (0, 5.0, 5.0, 1.0),    # in hole of part 1 -> excluded
        (1, 1.0, 1.0, 2.0),    # part 1 solid
        (2, 25.0, 5.0, 4.0),   # part 2
        (3, 15.0, 5.0, 8.0),   # between parts -> excluded
    ]
    right = georef(
        spark.createDataFrame(pts, "row_id long, px double, py double, v double"),
        coords=["px", "py"],
    )
    out = geojoin(left, right, aggs={"v": "sum"}, kind="left").df.collect()
    assert len(out) == 1 and out[0]["v"] == pytest.approx(6.0)


def test_fully_mixed_kind_geojoin_single_arrow_pass(spark):
    """Both sides carry BOTH points and polygons — the branch where
    round-1 split pt-pt pairs JVM-side and re-evaluated the cell-join
    subtree twice; now one Arrow pass (kernel short-circuits pt-pt).
    Hand-known match sets."""
    from pyspark.sql import types as T

    from geotables_jl_spark.core.geotable import GeoTable
    from geotables_jl_spark.geom.model import GEOMETRY_TYPE, geom_rows_from_polygons, point_row
    from geotables_jl_spark.operators.geojoin import geojoin

    lpolys = geom_rows_from_polygons(
        [[(0, 0), (4, 0), (4, 4), (0, 4)], [(10, 10), (14, 10), (14, 14), (10, 14)]]
    )
    lg = [lpolys[0], lpolys[1], point_row(2.0, 2.0), point_row(12.0, 12.0)]
    rpolys = geom_rows_from_polygons([[(1, 1), (3, 1), (3, 3), (1, 3)]])
    rg = [point_row(2.0, 2.0), point_row(99.0, 99.0), rpolys[0]]
    ldf = spark.createDataFrame([(i, f"L{i}") for i in range(4)], "row_id long, lname string")
    rdf = spark.createDataFrame([(i, float(i + 1)) for i in range(3)], "row_id long, val double")
    schema = T.StructType(
        [T.StructField("row_id", T.LongType()), T.StructField("geometry", GEOMETRY_TYPE)]
    )
    gl = GeoTable(df=ldf.join(spark.createDataFrame(list(enumerate(lg)), schema), "row_id"))
    gr = GeoTable(df=rdf.join(spark.createDataFrame(list(enumerate(rg)), schema), "row_id"))
    out = geojoin(gl, gr, kind="left").df.orderBy("row_id").collect()
    # L0 poly ∩ {r-point(2,2), r-poly} → mean(1,3)=2; L1 nothing; L2 point
    # (2,2) ∩ {r-point, r-poly} → 2; L3 nothing
    assert [(r["row_id"], r["val"]) for r in out] == [(0, 2.0), (1, None), (2, 2.0), (3, None)]
