from geotables_jl_spark.geom.model import (
    GEOMETRY_TYPE,
    KIND_POINT,
    KIND_POLYGON,
    KIND_MULTIPOINT,
    KIND_MULTIPOLYGON,
    st_point,
    st_polygon_lit,
    st_box,
    geom_rows_from_polygons,
)

__all__ = [
    "GEOMETRY_TYPE",
    "KIND_POINT",
    "KIND_POLYGON",
    "KIND_MULTIPOINT",
    "KIND_MULTIPOLYGON",
    "st_point",
    "st_polygon_lit",
    "st_box",
    "geom_rows_from_polygons",
]
