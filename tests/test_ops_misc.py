"""setops / indices / transforms / geomfuncs / grid tests."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid, grid_subset
from geotables_jl_spark.functions.geomfuncs import st_area, st_centroid
from geotables_jl_spark.geom.model import GEOMETRY_TYPE, geom_rows_from_polygons, point_row
from geotables_jl_spark.operators import transforms as TR
from geotables_jl_spark.operators.indices import (
    PARTITION_COL,
    partition_block,
    partition_bisect,
    partition_uniform,
    sample_uniform,
    sort_direction,
)
from geotables_jl_spark.operators.setops import geotable_equal, hcat, vcat


def _points(spark, n=10, acol="a"):
    rows = [{"row_id": i, acol: float(i), "geometry": point_row(float(i), float(i % 3))} for i in range(n)]
    schema = T.StructType(
        [
            T.StructField("row_id", T.LongType(), False),
            T.StructField(acol, T.DoubleType(), True),
            T.StructField("geometry", GEOMETRY_TYPE, False),
        ]
    )
    return georef(spark.createDataFrame(rows, schema))


def test_hcat_dedup_names(spark):
    g1 = _points(spark, 5, "a")
    g2 = _points(spark, 5, "a")
    out = hcat(g1, g2)
    assert out.names == ["a", "a_", "geometry"]
    assert out.nrow() == 5


def test_vcat_union_and_intersect(spark):
    g1 = _points(spark, 3, "a")
    g2 = _points(spark, 4, "b")
    u = vcat(g1, g2, kind="union")
    assert u.nrow() == 7
    assert set(u.names) == {"a", "b", "geometry"}
    # row ids renumbered 0..6
    assert sorted(r["row_id"] for r in u.df.collect()) == list(range(7))
    with pytest.raises(ValueError):
        vcat(g1, g2, kind="intersect")
    g3 = _points(spark, 4, "a")
    i = vcat(g1, g3, kind="intersect")
    assert i.names == ["a", "geometry"]
    assert i.nrow() == 7


def test_geotable_equal(spark):
    g1 = _points(spark, 5)
    assert geotable_equal(g1, _points(spark, 5))
    assert not geotable_equal(g1, _points(spark, 6))


def test_partition_permutation_invariant(spark):
    # partition indices are a permutation of all rows (test/indices.jl:5-26)
    g = _points(spark, 100)
    for part in (partition_uniform(g, 7), partition_block(g, 3.0), partition_bisect(g, 1.0, 1.0)):
        assert part.df.count() == 100
        assert part.df.select("row_id").distinct().count() == 100
        assert part.df.filter(F.col(PARTITION_COL).isNull()).count() == 0
    assert partition_uniform(g, 7).df.select(PARTITION_COL).distinct().count() <= 7


def test_sample_and_sort(spark):
    g = _points(spark, 100)
    s = sample_uniform(g, 10)
    assert s.nrow() == 10
    # deterministic
    ids1 = sorted(r["row_id"] for r in s.df.collect())
    ids2 = sorted(r["row_id"] for r in sample_uniform(g, 10).df.collect())
    assert ids1 == ids2
    srt = sort_direction(g, 1.0, 0.0)
    xs = [r["geometry"]["x"] for r in srt.df.collect()]
    assert xs == sorted(xs)


def test_feature_transforms(spark):
    g = _points(spark, 50)
    assert TR.select(g, "a").names == ["a", "geometry"]
    assert TR.reject(g, "a").names == ["geometry"]
    assert TR.rename(g, {"a": "b"}).names == ["b", "geometry"]
    assert TR.filter_rows(g, F.col("a") > 40).nrow() == 9
    c = TR.center(g, "a")
    mean_after = c.df.agg(F.avg("a")).collect()[0][0]
    assert mean_after == pytest.approx(0.0, abs=1e-9)
    mm = TR.minmax(g, "a")
    lohi = mm.df.agg(F.min("a"), F.max("a")).collect()[0]
    assert lohi[0] == pytest.approx(0.0) and lohi[1] == pytest.approx(1.0)
    z = TR.zscore(g, "a")
    stats = z.df.agg(F.avg("a"), F.stddev_samp("a")).collect()[0]
    assert stats[0] == pytest.approx(0.0, abs=1e-9) and stats[1] == pytest.approx(1.0)
    de = TR.dropextrema(g, "a", 0.25, 0.75)
    assert 0 < de.nrow() < 50
    sc = TR.stdcoords(g)
    bounds = sc.df.agg(
        F.min(F.col("geometry")["x"]), F.max(F.col("geometry")["x"])
    ).collect()[0]
    assert bounds[0] == pytest.approx(-0.5) and bounds[1] == pytest.approx(0.5)
    sl = TR.slice_box(g, x=(0.0, 10.0))
    assert sl.nrow() == 11


def test_geomfuncs_area_centroid(spark):
    polys = geom_rows_from_polygons([[(0, 0), (4, 0), (4, 2), (0, 2)], [(0, 0), (3, 0), (0, 3)]])
    rows = [{"row_id": i, "geometry": g} for i, g in enumerate(polys)]
    schema = T.StructType(
        [T.StructField("row_id", T.LongType(), False), T.StructField("geometry", GEOMETRY_TYPE, False)]
    )
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        "row_id",
        st_area(F.col("geometry")).alias("area"),
        st_centroid(F.col("geometry"))["x"].alias("cx"),
        st_centroid(F.col("geometry"))["y"].alias("cy"),
    ).orderBy("row_id").collect()
    assert out[0]["area"] == pytest.approx(8.0)
    assert (out[0]["cx"], out[0]["cy"]) == (pytest.approx(2.0), pytest.approx(1.0))
    assert out[1]["area"] == pytest.approx(4.5)
    assert (out[1]["cx"], out[1]["cy"]) == (pytest.approx(1.0), pytest.approx(1.0))


def test_grid_relation_and_subset(spark):
    g = georef_grid(spark, 10, 10)
    assert g.nrow() == 100
    # cell 0 is the unit square at origin
    r0 = g.df.filter(F.col("row_id") == 0).collect()[0]["geometry"]
    assert (r0["xmin"], r0["ymin"], r0["xmax"], r0["ymax"]) == (0.0, 0.0, 1.0, 1.0)
    # column-major: cell id 13 → i=3, j=1
    r13 = g.df.filter(F.col("row_id") == 13).collect()[0]
    assert (r13["i"], r13["j"]) == (3, 1)
    sub = grid_subset(g, 2, 4, 3, 5)
    assert sub.nrow() == 9
    assert sub.grid.nx == 3 and sub.grid.ny == 3
    assert sub.grid.ox == 2.0 and sub.grid.oy == 3.0


def test_spatial_select(spark):
    from geotables_jl_spark.geom.model import st_polygon_lit

    g = _points(spark, 10)
    # triangle covering points with x in [0,4] region (boundary-inclusive)
    sel = g.spatial_select(st_polygon_lit([(0, -1), (4.5, -1), (4.5, 4), (0, 4)]))
    ids = sorted(r["row_id"] for r in sel.df.collect())
    assert ids == [0, 1, 2, 3, 4]


def test_scatter_onto_parent(spark):
    g = _points(spark, 10)
    view = g.rows(F.col("a") > 6.0)
    back = view.scatter_onto(g)
    assert back.nrow() == 10
    vals = {r["row_id"]: r["a"] for r in back.df.collect()}
    assert vals[9] == 9.0 and vals[0] is None


def test_grid_view_box_stays_raster(spark):
    """Reference test/views.jl:12-19: view(10x10 grid, Box((1,1),(5,5)))
    is the 6x6 sub-grid of all intersecting cells with the attribute
    values of the corresponding parent cells."""
    from geotables_jl_spark.core.geotable import grid_view_box

    g = georef_grid(spark, 10, 10)
    g = g._with(g.df.withColumn("a", F.col("row_id") + 1))
    v = grid_view_box(g, 1.0, 1.0, 5.0, 5.0)
    assert v.grid is not None
    assert (v.grid.nx, v.grid.ny) == (6, 6)
    assert (v.grid.ox, v.grid.oy) == (0.0, 0.0)
    got = sorted(r["a"] for r in v.df.collect())
    want = sorted(
        base + off for base in (1, 11, 21, 31, 41, 51) for off in range(6)
    )
    assert got == want
    # non-intersecting box errors rather than returning an empty raster
    import pytest as _pt

    with _pt.raises(ValueError):
        grid_view_box(g, 50.0, 50.0, 60.0, 60.0)
