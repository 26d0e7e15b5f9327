"""Phase-level profile of the scaling geojoin job at one parallelism.

    python tools/profile_scaling.py <cpus> <input_dir>
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid
from geotables_jl_spark.geom.cells import envelope_stats, choose_cell_size
from geotables_jl_spark.operators.geojoin import geojoin
from geotables_jl_spark.session import get_spark


def main() -> None:
    cpus = int(sys.argv[1])
    input_dir = sys.argv[2]
    spark = get_spark(f"prof-{cpus}", cpus=cpus)

    def tick(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"PHASE {label}: {time.perf_counter() - t0:.2f}s", flush=True)
        return out

    pages = georef(spark.read.parquet(input_dir), coords=["lat", "lon"])
    pages = GeoTable(
        df=pages.df.withColumn("page_id", F.col("row_id")).select("row_id", "page_id", "url", "geometry"),
        crs=pages.crs,
    )
    g = georef_grid(spark, 36, 18, ox=-180.0, oy=-90.0, sx=10.0, sy=10.0)
    tiles = GeoTable(
        df=g.df.select("row_id", F.col("row_id").alias("tile_id"), "geometry"),
        crs="LatLon",
        grid=g.grid,
    )
    tick("warm_count", lambda: pages.df.count())
    tick("count2", lambda: pages.df.count())
    tick("env_stats_pages", lambda: envelope_stats(pages.df))
    tick("env_stats_tiles", lambda: envelope_stats(tiles.df))
    for i in range(2):
        res = tick(f"geojoin_build_{i}", lambda: geojoin(tiles, pages, aggs={"page_id": "count", "url": "min"}, kind="inner"))
        tick(f"geojoin_exec_{i}", lambda: res.df.write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
