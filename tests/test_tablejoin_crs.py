"""tablejoin golden fixture (reference test/operations.jl:256-311 style)
+ CRS reprojection and geojoin auto-reprojection + kNN golden values."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef
from geotables_jl_spark.functions.crs import reproject
from geotables_jl_spark.operators.geojoin import geojoin, knn_join
from geotables_jl_spark.operators.tablejoin import tablejoin


def _points(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return georef(df, coords=["x", "y"])


def test_tablejoin_left_dup_keys(spark):
    g = _points(
        spark,
        [(0, "a", 0.0, 0.0), (1, "b", 1.0, 0.0), (2, "c", 2.0, 0.0), (3, None, 3.0, 0.0)],
        "row_id long, k string, x double, y double",
    )
    tab = spark.createDataFrame(
        [(0, "a", 10.0), (1, "a", 20.0), (2, "b", 5.0), (3, None, 99.0)],
        "row_id long, k string, v double",
    )
    out = {r["row_id"]: r for r in tablejoin(g, tab, on=["k"]).df.collect()}
    assert out[0]["v"] == pytest.approx(15.0)  # mean of duplicate matches
    assert out[1]["v"] == pytest.approx(5.0)
    assert out[2]["v"] is None  # no match → missing
    assert out[3]["v"] == pytest.approx(99.0)  # NULL key matches NULL (isequal)
    assert len(out) == 4

    inner = tablejoin(g, tab, on=["k"], kind="inner").df
    assert sorted(r["row_id"] for r in inner.collect()) == [0, 1, 3]


def test_tablejoin_custom_aggs(spark):
    g = _points(spark, [(0, "a", 0.0, 0.0)], "row_id long, k string, x double, y double")
    tab = spark.createDataFrame(
        [(0, "a", 10.0), (1, "a", 20.0), (2, "a", 60.0)], "row_id long, k string, v double"
    )
    out = tablejoin(g, tab, on=["k"], aggs={"v": "sum"}).df.collect()[0]
    assert out["v"] == pytest.approx(90.0)
    out = tablejoin(g, tab, on=["k"], aggs={"v": "last"}).df.collect()[0]
    assert out["v"] == pytest.approx(60.0)  # last in right row order (row_id)


def test_crs_roundtrip(spark):
    g = _points(
        spark,
        [(0, 10.0, 45.0), (1, -120.0, -33.0)],
        "row_id long, x double, y double",
    )
    g = GeoTable(df=g.df, crs="LatLon")
    merc = reproject(g, "WebMercator")
    back = reproject(merc, "LatLon")
    rows = {r["row_id"]: r["geometry"] for r in back.df.collect()}
    assert rows[0]["x"] == pytest.approx(10.0, abs=1e-9)
    assert rows[0]["y"] == pytest.approx(45.0, abs=1e-9)
    assert rows[1]["y"] == pytest.approx(-33.0, abs=1e-9)
    # spot value: lon 10° → x = 10 * R * pi/180
    m = {r["row_id"]: r["geometry"] for r in merc.df.collect()}
    assert m[0]["x"] == pytest.approx(10.0 * 6378137.0 * math.pi / 180.0)


def test_geojoin_auto_reproject(spark):
    left = GeoTable(
        df=_points(spark, [(0, 10.0, 45.0)], "row_id long, x double, y double").df,
        crs="LatLon",
    )
    # right table in WebMercator at the same physical location
    mx = 10.0 * 6378137.0 * math.pi / 180.0
    my = math.log(math.tan(math.pi / 4 + math.radians(45.0) / 2)) * 6378137.0
    right = GeoTable(
        df=_points(spark, [(0, mx, my, 7.0)], "row_id long, x double, y double, v double").df,
        crs="WebMercator",
    )
    out = geojoin(left, right).df.collect()[0]
    assert out["v"] == pytest.approx(7.0)  # reprojection made the points coincide


def test_knn_golden(spark):
    left = _points(spark, [(0, 0.0, 0.0)], "row_id long, x double, y double")
    right = _points(
        spark,
        [(1, 1.0, 0.0), (2, 0.0, 2.0), (3, 3.0, 0.0), (4, 0.0, 4.0)],
        "row_id long, x double, y double",
    )
    got = sorted(
        (r["rank"], r["neighbor_id"], r["distance"]) for r in knn_join(left, right, k=3).collect()
    )
    assert got == [(1, 1, 1.0), (2, 2, 2.0), (3, 3, 3.0)]


def test_knn_tie_break_by_id(spark):
    left = _points(spark, [(0, 0.0, 0.0)], "row_id long, x double, y double")
    right = _points(
        spark,
        [(5, 1.0, 0.0), (2, -1.0, 0.0), (9, 0.0, 1.0)],
        "row_id long, x double, y double",
    )
    got = [(r["rank"], r["neighbor_id"]) for r in knn_join(left, right, k=3).collect()]
    assert sorted(got) == [(1, 2), (2, 5), (3, 9)]  # equal distances → id order
