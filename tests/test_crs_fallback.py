"""Long-tail CRS fallback (functions/crs.py): the Arrow vertex kernel is
fully tested with an injected fake transform (no projection lib needed);
the thin pyproj glue is exercised only when pyproj is installed.
Reference accepts any CoordRefSystems CRS (src/georef.jl:186-188)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, georef
from geotables_jl_spark.functions.crs import (
    _pyproj,
    parse_crs,
    transform_geometry_vertexwise,
)
from geotables_jl_spark.geom.model import st_polygon_lit


def _make_affine_txy():
    # deterministic fake "projection": x' = 2x + 1, y' = y - 3.
    # Defined as a nested closure at each call site so cloudpickle
    # serializes it BY VALUE — a module-level function from a test file
    # pickles by reference and executors can't import test modules.
    def factory():
        return lambda x, y: (2.0 * x + 1.0, y - 3.0)

    return factory


def test_vertexwise_kernel_points(spark):
    df = spark.createDataFrame(
        [(i, float(i), float(2 * i)) for i in range(50)], "row_id long, px double, py double"
    )
    g = georef(df, coords=["px", "py"]).df
    out = transform_geometry_vertexwise(g, _make_affine_txy())
    assert out.schema == g.schema
    rows = {r["row_id"]: r[GEOM] for r in out.collect()}
    for i in range(50):
        geom = rows[i]
        assert geom["kind"] == 1
        assert geom["x"] == 2.0 * i + 1.0 and geom["y"] == 2.0 * i - 3.0
        # point bbox collapses to the point
        assert (geom["xmin"], geom["ymin"], geom["xmax"], geom["ymax"]) == (
            geom["x"], geom["y"], geom["x"], geom["y"],
        )


def test_vertexwise_kernel_polygon_rings_and_bbox(spark):
    outer = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
    df = spark.range(1).withColumnRenamed("id", "row_id").withColumn(
        GEOM, st_polygon_lit(outer, holes=[hole])
    )
    out = transform_geometry_vertexwise(df, _make_affine_txy()).collect()[0][GEOM]
    assert out["kind"] == 3 and len(out["rings"]) == 2
    for ring_in, ring_out in zip(df.collect()[0][GEOM]["rings"], out["rings"]):
        assert len(ring_in) == len(ring_out)
        for j in range(0, len(ring_in), 2):
            assert ring_out[j] == 2.0 * ring_in[j] + 1.0
            assert ring_out[j + 1] == ring_in[j + 1] - 3.0
    # bbox over ALL rings, recomputed in transformed space
    assert (out["xmin"], out["ymin"], out["xmax"], out["ymax"]) == (1.0, -3.0, 9.0, 1.0)


def test_unregistered_code_errors_mention_fallback():
    if _pyproj() is not None:
        pytest.skip("pyproj present: unregistered codes resolve instead of erroring")
    with pytest.raises(ValueError, match="pyproj"):
        parse_crs("EPSG:27700")  # British National Grid — no closed form here


@pytest.mark.skipif(_pyproj() is None, reason="pyproj not installed")
def test_pyproj_roundtrip_stereographic(spark):
    """EPSG:27700 (British National Grid) round-trip through the
    fallback kernel — VERDICT r2 'Next round' #7's done criterion.
    (Was EPSG:3413 until that gained a closed form in the registry.)"""
    from geotables_jl_spark.functions.crs import reproject

    rows = [(i, 50.0 + i * 0.3, -5.0 + i * 0.3) for i in range(20)]  # (id, lat, lon)
    g = georef(
        spark.createDataFrame(rows, "row_id long, lat double, lon double"),
        coords=["lat", "lon"],
    )
    ps = reproject(g, "EPSG:27700")
    assert ps.crs == "EPSG:27700"
    back = reproject(ps, "LatLon")
    got = {r["row_id"]: (r[GEOM]["x"], r[GEOM]["y"]) for r in back.df.collect()}
    for i, lat, lon in rows:
        assert math.isclose(got[i][0], lon, abs_tol=1e-9)
        assert math.isclose(got[i][1], lat, abs_tol=1e-9)


@pytest.mark.skipif(_pyproj() is None, reason="pyproj not installed")
def test_geojoin_auto_reproject_pyproj(spark):
    """geojoin auto-reprojects a pyproj-fallback right table into the
    left CRS before matching."""
    from geotables_jl_spark.core.geotable import GeoTable
    from geotables_jl_spark.functions.crs import reproject
    from geotables_jl_spark.geom.model import st_box
    from geotables_jl_spark.operators.geojoin import geojoin

    rows = [(i, 52.0 + (i % 5) * 0.1, -1.5 + (i % 7) * 0.1) for i in range(100)]
    pts = georef(
        spark.createDataFrame(rows, "row_id long, lat double, lon double"),
        coords=["lat", "lon"],
    )
    right = reproject(pts, "EPSG:27700")
    tiles = spark.createDataFrame([(0,)], "row_id long").withColumn(
        GEOM, st_box(F.lit(-1.6), F.lit(51.9), F.lit(-1.2), F.lit(52.3))
    )
    left = GeoTable(df=tiles.withColumn("tile", F.lit(0)), crs="LatLon")
    out = geojoin(left, right, aggs={"lat": "count"}, kind="inner")
    n = out.df.collect()[0]["lat"]
    want = sum(1 for _, la, lo in rows if 51.9 <= la <= 52.3 and -1.6 <= lo <= -1.2)
    assert n == want
