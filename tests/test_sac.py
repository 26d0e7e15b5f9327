"""Split-apply-combine golden tests (reference test/operations.jl:313-627)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GeoTable, georef
from geotables_jl_spark.geom.model import GEOMETRY_TYPE, point_row
from geotables_jl_spark.operators.sac import apply_groups, combine, groupby, transform


def _gtb(spark, x, y, z):
    """F5 fixture (test/operations.jl:334-337): 8 rows, 8 points."""
    rows = [
        {
            "row_id": i,
            "x": None if x[i] is None else float(x[i]),
            "y": None if y[i] is None else float(y[i]),
            "z": z[i],
            "geometry": point_row(float(i % 4), float(i // 4)),
        }
        for i in range(8)
    ]
    schema = T.StructType(
        [
            T.StructField("row_id", T.LongType(), False),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("y", T.DoubleType(), True),
            T.StructField("z", T.LongType(), True),
            T.StructField("geometry", GEOMETRY_TYPE, False),
        ]
    )
    return georef(spark.createDataFrame(rows, schema))


def test_groupby_combine_basic(spark):
    # x = 1,1,1,1,2,2,2,2 → two groups; sum(z) per group
    g = _gtb(spark, [1.0] * 4 + [2.0] * 4, [1, 1, 2, 2, 3, 3, 4, 4], list(range(1, 9)))
    out = combine(groupby(g, "x"), aggs={"z": "sum"})
    rows = {r["x"]: r for r in out.df.collect()}
    assert rows[1.0]["z"] == 1 + 2 + 3 + 4
    assert rows[2.0]["z"] == 5 + 6 + 7 + 8
    # first-appearance row ids: 0 and 4
    assert rows[1.0]["row_id"] == 0
    assert rows[2.0]["row_id"] == 4
    # geometry reduced to multipoint of 4 members
    assert rows[1.0]["geometry"]["kind"] == 4
    assert len(rows[1.0]["geometry"]["rings"][0]) == 8


def test_groupby_nulls_group_together(spark):
    # missing keys group together (isequal semantics, operations.jl:392-404)
    g = _gtb(spark, [1.0, 1.0, None, None, 2.0, 2.0, 2.0, 2.0], [0] * 8, list(range(8)))
    out = combine(groupby(g, "x"), aggs={"z": "count"})
    rows = {r["x"]: r["z"] for r in out.df.collect()}
    assert rows[None] == 2
    assert rows[1.0] == 2
    assert rows[2.0] == 4


def test_groupby_negzero_distinct(spark):
    # isequal(0.0, -0.0) == false → distinct groups (operations.jl:405-414)
    g = _gtb(spark, [0.0, 0.0, 0.0, -0.0, 2.0, 2.0, 2.0, 2.0], [0] * 8, list(range(8)))
    out = combine(groupby(g, "x"), aggs={"z": "count"})
    counts = sorted(r["z"] for r in out.df.collect())
    assert counts == [1, 3, 4]  # -0.0 alone, 0.0 x3, 2.0 x4


def test_transform_arithmetic(spark):
    # ndata.z == sdata.x - 2 * sdata.y (operations.jl:442-447)
    g = _gtb(spark, [float(i) for i in range(8)], [float(i * 2) for i in range(8)], [0] * 8)
    out = transform(g, w=F.col("x") - 2 * F.col("y"))
    for r in out.df.collect():
        assert r["w"] == r["x"] - 2 * r["y"]


def test_transform_geometry_swap(spark):
    # replacing :geometry swaps the domain (transform.jl:56-57)
    from geotables_jl_spark.geom.model import st_point

    g = _gtb(spark, [0.0] * 8, [0.0] * 8, [0] * 8)
    out = transform(g, geometry=st_point(F.col("geometry")["x"] + 10.0, F.col("geometry")["y"]))
    xs = [r["geometry"]["x"] for r in out.df.orderBy("row_id").collect()]
    assert xs == [10.0, 11.0, 12.0, 13.0, 10.0, 11.0, 12.0, 13.0]


def test_transform_cannot_replace_group_keys(spark):
    g = _gtb(spark, [1.0] * 8, [0.0] * 8, [0] * 8)
    with pytest.raises(ValueError):
        transform(groupby(g, "x"), x=F.lit(0.0))


def test_combine_whole_table(spark):
    g = _gtb(spark, [1.0] * 4 + [2.0] * 4, [0] * 8, list(range(1, 9)))
    out = combine(g, aggs={"z": "sum", "x": "mean"}, geometry="centroid")
    row = out.df.collect()[0]
    assert row["z"] == 36
    assert row["x"] == pytest.approx(1.5)
    assert row["geometry"]["kind"] == 1
    assert row["geometry"]["x"] == pytest.approx(1.5)  # mean of 0,1,2,3,0,1,2,3


def test_combine_custom_column_agg(spark):
    g = _gtb(spark, [1.0] * 4 + [2.0] * 4, [0] * 8, list(range(1, 9)))
    out = combine(groupby(g, "x"), aggs={"z": F.max("z") - F.min("z")}, geometry=None)
    rows = {r["x"]: r["z"] for r in out.df.collect()}
    assert rows[1.0] == 3 and rows[2.0] == 3
    assert "geometry" not in out.df.columns


def test_apply_groups(spark):
    g = _gtb(spark, [1.0] * 4 + [2.0] * 4, [0] * 8, list(range(1, 9)))

    def per_group(pdf):
        pdf = pdf.copy()
        pdf["zrank"] = pdf["z"].rank().astype("int64")
        return pdf[["x", "z", "zrank"]]

    out = apply_groups(groupby(g, "x"), per_group, schema="x double, z long, zrank long")
    rows = out.collect()
    assert len(rows) == 8
    assert {r["zrank"] for r in rows} == {1, 2, 3, 4}
