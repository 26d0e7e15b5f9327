from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid, georef_grid_nd, grid_subset_nd

__all__ = ["GeoTable", "georef", "georef_grid", "georef_grid_nd", "grid_subset_nd"]
