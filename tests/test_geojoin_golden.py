"""Port of the reference geojoin golden tests (test/operations.jl:26-104)."""

import statistics

import pytest

from tests.fixtures import (
    B_VALUES,
    POINT_POLY,
    POINTQUADS,
    POLY_POINTS,
    gtb_grid,
    gtb_points,
    gtb_polys,
)

from geotables_jl_spark.operators.geojoin import geojoin


def _by_row_id(gtb):
    return {r["row_id"]: r.asDict() for r in gtb.df.collect()}


def test_left_join_polys_points(spark):
    # geojoin(gtb1, gtb2): per polygon, mean of matched b (operations.jl:27-34)
    out = geojoin(gtb_polys(spark), gtb_points(spark))
    rows = _by_row_id(out)
    assert set(rows) == {0, 1, 2, 3}
    for poly_1b, pts in POLY_POINTS.items():
        expected = statistics.mean(B_VALUES[p - 1] for p in pts)
        assert rows[poly_1b - 1]["b"] == pytest.approx(expected)
        assert rows[poly_1b - 1]["a"] == poly_1b


def test_left_join_std_agg(spark):
    # geojoin(gtb1, gtb2, :b => std) (operations.jl:36-43)
    out = geojoin(gtb_polys(spark), gtb_points(spark), aggs={"b": "std"})
    rows = _by_row_id(out)
    for poly_1b, pts in POLY_POINTS.items():
        expected = statistics.stdev(B_VALUES[p - 1] for p in pts)
        assert rows[poly_1b - 1]["b"] == pytest.approx(expected)


def test_left_join_points_polys(spark):
    # geojoin(gtb2, gtb1): a = [1,1,2,2,missing,3,3,4,4] (operations.jl:45-49)
    out = geojoin(gtb_points(spark), gtb_polys(spark))
    rows = _by_row_id(out)
    assert set(rows) == set(range(9))
    for i in range(9):
        assert rows[i]["a"] == POINT_POLY[i]
        assert rows[i]["b"] == pytest.approx(B_VALUES[i])


def test_grid_within_polys(spark):
    # geojoin(gtb3, gtb1, pred=issubset) (operations.jl:51-58)
    out = geojoin(gtb_grid(spark), gtb_polys(spark), pred="within")
    rows = _by_row_id(out)
    def lin(i, j):
        return (j - 1) * 10 + i
    assert rows[lin(9, 2) - 1]["a"] == 2
    assert rows[lin(9, 3) - 1]["a"] == 2
    assert rows[lin(5, 9) - 1]["a"] == 4
    assert rows[lin(4, 9) - 1]["a"] == 4
    # a cell crossing a polygon boundary is NOT within it
    assert rows[lin(1, 1) - 1]["a"] is None


def test_points_within_grid_last_agg(spark):
    # geojoin(gtb2, gtb3, :c => last, pred=issubset): each point ⊆ its 4
    # touching cells, last = highest cell id (operations.jl:60-72)
    out = geojoin(gtb_points(spark), gtb_grid(spark), aggs={"c": "last"}, pred="within")
    rows = _by_row_id(out)
    for p in range(9):
        assert rows[p]["c"] == POINTQUADS[p][-1], f"point {p+1}"


def test_inner_join_points_polys(spark):
    # geojoin(gtb2, gtb1, kind=:inner): drops unmatched point 5 (operations.jl:84-89)
    out = geojoin(gtb_points(spark), gtb_polys(spark), kind="inner")
    rows = _by_row_id(out)
    assert set(rows) == {0, 1, 2, 3, 5, 6, 7, 8}
    expected_a = [1, 1, 2, 2, None, 3, 3, 4, 4]
    for i in rows:
        assert rows[i]["a"] == expected_a[i]


def test_inner_join_grid_points_last(spark):
    # geojoin(gtb3, gtb2, :b => last, kind=:inner) (operations.jl:91-104)
    out = geojoin(gtb_grid(spark), gtb_points(spark), aggs={"b": "last"}, kind="inner")
    rows = _by_row_id(out)
    expected_cells = sorted({c for quad in POINTQUADS for c in quad})
    assert set(rows) == {c - 1 for c in expected_cells}
    # cell pointquads[p][1] (2nd cell of each quad) has exactly point p's b
    # unless a later point also touches it; check the reference's asserts:
    for p in range(9):
        cell_1b = POINTQUADS[p][1]
        # points touching this cell, in row order; last one wins
        touchers = [q for q in range(9) if cell_1b in POINTQUADS[q]]
        expected_b = B_VALUES[touchers[-1]]
        assert rows[cell_1b - 1]["b"] == pytest.approx(expected_b)


def test_default_agg_int_first_float_mean(spark):
    """Port of test/operations.jl:144-166: integer columns are
    Categorical scitype → default agg = FIRST (in row order), float
    columns are Continuous → default agg = MEAN (the rule of
    src/geoops/utils.jl:24-26). Two unit boxes, three points: box 1
    matches point 1 only, box 2 matches points 2 and 3."""
    from pyspark.sql import types as T

    from geotables_jl_spark.core.geotable import georef
    from geotables_jl_spark.geom.model import geom_rows_from_polygons, point_row
    from tests.fixtures import _schema

    boxes = [
        [(0, 0), (1, 0), (1, 1), (0, 1)],
        [(1, 1), (2, 1), (2, 2), (1, 2)],
    ]
    brows = [
        {"row_id": i, "a": 0.1 * (i + 1), "geometry": g}
        for i, g in enumerate(geom_rows_from_polygons(boxes))
    ]
    gtb1 = georef(
        spark.createDataFrame(brows, _schema([T.StructField("a", T.DoubleType(), False)]))
    )
    pts = [(0.5, 0.5), (1.2, 1.2), (1.8, 1.8)]
    prows = [
        {"row_id": i, "b": i + 1, "c": float(i + 1), "geometry": point_row(x, y)}
        for i, (x, y) in enumerate(pts)
    ]
    gtb2 = georef(
        spark.createDataFrame(
            prows,
            _schema(
                [
                    T.StructField("b", T.LongType(), False),
                    T.StructField("c", T.DoubleType(), False),
                ]
            ),
        )
    )
    out = geojoin(gtb1, gtb2)
    rows = _by_row_id(out)
    assert set(rows) == {0, 1}
    assert rows[0]["b"] == 1 and rows[1]["b"] == 2  # first, int stays int
    assert rows[0]["c"] == 1.0 and rows[1]["c"] == pytest.approx(2.5)  # mean
    assert rows[0]["a"] == pytest.approx(0.1) and rows[1]["a"] == pytest.approx(0.2)


def test_on_conjunct(spark):
    # geojoin with on= attribute conjunct (operations.jl:199-254 flavor):
    # polygon side gets key column; only points with equal key match
    from pyspark.sql import functions as F

    polys = gtb_polys(spark)
    polys = polys._with(polys.df.withColumn("key", F.col("a") % 2))
    pts = gtb_points(spark)
    pts = pts._with(pts.df.withColumn("key", F.lit(1)))
    out = geojoin(polys, pts, on=["key"])
    rows = _by_row_id(out)
    # polys 1,3 have key=1 → match their points; polys 2,4 key=0 → NULL
    assert rows[0]["b"] == pytest.approx(statistics.mean([B_VALUES[0], B_VALUES[1]]))
    assert rows[2]["b"] == pytest.approx(statistics.mean([B_VALUES[5], B_VALUES[6]]))
    assert rows[1]["b"] is None
    assert rows[3]["b"] is None


def test_geometry_only_right_side(spark):
    # reference allows values === nothing (src/geotable.jl:48,
    # test/noattribs.jl): geojoin against a geometry-only right table
    # degrades to a spatial semi-join marker, no aggregate columns
    from pyspark.sql import functions as F

    polys = gtb_polys(spark)
    pts = gtb_points(spark)
    pts = pts._with(pts.df.select("row_id", "geometry"))
    out = geojoin(polys, pts, kind="inner")
    assert out.df.count() == 4  # every fixture poly contains >=1 point
    left_out = geojoin(polys, pts, kind="left")
    assert left_out.df.count() == 4
