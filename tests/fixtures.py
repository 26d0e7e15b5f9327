"""Golden fixtures mirroring the reference's geojoin test
(``test/operations.jl:2-24``): 4 polygons, 9 points, 10x10 unit grid,
with hand-known containment sets (``test/operations.jl:27-104``)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid
from geotables_jl_spark.geom.model import GEOMETRY_TYPE, geom_rows_from_polygons, point_row

POLYS = [
    [(1, 1), (5, 1), (3, 3)],
    [(6, 0), (10, 0), (10, 8)],
    [(1, 4), (4, 4), (6, 6), (3, 6)],
    [(1, 8), (4, 7), (7, 8), (5, 10), (3, 10)],
]

POINTS = [(3, 2), (3, 3), (9, 2), (8, 2), (6, 4), (4, 5), (3, 5), (5, 9), (3, 9)]

# deterministic stand-in for the reference's rand(9)
B_VALUES = [0.11, 0.52, 0.93, 0.24, 0.65, 0.06, 0.47, 0.88, 0.39]

# expected match sets: point index (1-based) per polygon (test/operations.jl:27-34)
POLY_POINTS = {1: [1, 2], 2: [3, 4], 3: [6, 7], 4: [8, 9]}
# point -> polygon (1-based; point 5 unmatched) (test/operations.jl:49)
POINT_POLY = [1, 1, 2, 2, None, 3, 3, 4, 4]

# pointquads: 1-based column-major linear cell ids of the 4 cells each point
# touches (test/operations.jl:11-21); linds[i,j] = (j-1)*10 + i
def _l(i, j):
    return (j - 1) * 10 + i

POINTQUADS = [
    [_l(3, 2), _l(4, 2), _l(3, 3), _l(4, 3)],
    [_l(3, 3), _l(4, 3), _l(3, 4), _l(4, 4)],
    [_l(9, 2), _l(10, 2), _l(9, 3), _l(10, 3)],
    [_l(8, 2), _l(9, 2), _l(8, 3), _l(9, 3)],
    [_l(6, 4), _l(7, 4), _l(6, 5), _l(7, 5)],
    [_l(4, 5), _l(5, 5), _l(4, 6), _l(5, 6)],
    [_l(3, 5), _l(4, 5), _l(3, 6), _l(4, 6)],
    [_l(5, 9), _l(6, 9), _l(5, 10), _l(6, 10)],
    [_l(3, 9), _l(4, 9), _l(3, 10), _l(4, 10)],
]


def _schema(attr_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        [T.StructField("row_id", T.LongType(), False)]
        + attr_fields
        + [T.StructField("geometry", GEOMETRY_TYPE, False)]
    )


def gtb_polys(spark: SparkSession) -> GeoTable:
    """gtb1 = georef((; a=1:4), gset) — test/operations.jl:22."""
    rows = [
        {"row_id": i, "a": i + 1, "geometry": g}
        for i, g in enumerate(geom_rows_from_polygons(POLYS))
    ]
    df = spark.createDataFrame(rows, _schema([T.StructField("a", T.LongType(), False)]))
    return georef(df)


def gtb_points(spark: SparkSession) -> GeoTable:
    """gtb2 = georef((; b=rand(9)), pset) — test/operations.jl:23."""
    rows = [
        {"row_id": i, "b": B_VALUES[i], "geometry": point_row(x, y)}
        for i, (x, y) in enumerate(POINTS)
    ]
    df = spark.createDataFrame(rows, _schema([T.StructField("b", T.DoubleType(), False)]))
    return georef(df)


def gtb_grid(spark: SparkSession) -> GeoTable:
    """gtb3 = georef((; c=1:100), CartesianGrid(10,10)) — test/operations.jl:24.

    c = 1-based column-major cell id == row_id + 1."""
    g = georef_grid(spark, 10, 10)
    from pyspark.sql import functions as F

    df = g.df.withColumn("c", F.col("row_id") + 1)
    df = df.select("row_id", "i", "j", "c", "geometry")
    return GeoTable(df=df, grid=g.grid)
