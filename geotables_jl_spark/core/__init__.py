from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid

__all__ = ["GeoTable", "georef", "georef_grid"]
