"""Skew salting: salted cell joins return identical results, and the
auto-salt planner reacts to hot cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid
from geotables_jl_spark.operators.geojoin import geojoin, plan_salt


def _pts(spark, n=500):
    df = spark.range(n).select(
        F.col("id").alias("row_id"),
        ((F.col("id") * 37) % 100 / 10.0).alias("x"),
        ((F.col("id") * 91) % 100 / 10.0).alias("y"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return georef(df, coords=["x", "y"])


def _tiles(spark):
    g = georef_grid(spark, 10, 10, ox=0.0, oy=0.0, sx=1.0, sy=1.0)
    return GeoTable(
        df=g.df.select("row_id", F.col("row_id").alias("tile_id"), "geometry"), crs=g.crs, grid=g.grid
    )


def test_salted_join_same_result(spark):
    pts = _pts(spark)
    tiles = _tiles(spark)
    plain = geojoin(tiles, pts, aggs={"v": "sum"}, kind="inner", salt=1)
    salted = geojoin(tiles, pts, aggs={"v": "sum"}, kind="inner", salt=4)
    a = sorted((r["tile_id"], r["v"]) for r in plain.df.select("tile_id", "v").collect())
    b = sorted((r["tile_id"], r["v"]) for r in salted.df.select("tile_id", "v").collect())
    assert a == b and len(a) > 0


def test_plan_salt_hot_cell(spark):
    # all points in ONE cell → hot-cell histogram drives the salt factor up
    df = spark.range(4000).select(
        F.col("id").alias("row_id"), F.lit(0.5).alias("x"), F.lit(0.5).alias("y")
    )
    hot = georef(df, coords=["x", "y"])
    assert plan_salt(hot.df, cell_size=1.0, target_per_key=1000) == 4
    # flat data → no salting
    flat = _pts(spark, 400)
    assert plan_salt(flat.df, cell_size=1.0, target_per_key=1000) == 1


def test_auto_salt_smoke(spark):
    pts = _pts(spark)
    tiles = _tiles(spark)
    res = geojoin(tiles, pts, aggs={"v": "sum"}, kind="inner", salt="auto")
    assert res.df.count() > 0
