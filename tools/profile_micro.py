"""Microbenchmark of geojoin pipeline pieces at one parallelism.

    python tools/profile_micro.py <cpus> <input_dir>
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid
from geotables_jl_spark.geom.cells import cell_cover, point_cell
from geotables_jl_spark.operators.geojoin import _bbox_overlap
from geotables_jl_spark.session import get_spark

GEOM = "geometry"


def main() -> None:
    cpus = int(sys.argv[1])
    input_dir = sys.argv[2]
    spark = get_spark(f"micro-{cpus}", cpus=cpus)

    def tick(label, fn, n=2):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"MICRO {label}: {best:.2f}s", flush=True)

    raw = spark.read.parquet(input_dir)
    tick("scan_count", lambda: raw.count())
    tick("scan_agg_minmax", lambda: raw.agg(F.min("lat"), F.max("lon")).collect())

    pages = georef(raw, coords=["lat", "lon"])
    pdf = pages.df.select("row_id", "url", GEOM)
    tick("georef_agg", lambda: pdf.agg(F.min(F.col(GEOM)["xmin"])).collect())

    cov = pdf.select("row_id", "url", F.explode(cell_cover(F.col(GEOM), 10.0)).alias("__cell"),
                     F.col(GEOM).alias("__lgeom"))
    tick("cover_explode_agg", lambda: cov.agg(F.min("__cell")).collect())

    pc = pdf.select("row_id", "url", point_cell(F.col(GEOM), 10.0).alias("__cell"),
                    F.col(GEOM).alias("__lgeom"))
    tick("point_cell_agg", lambda: pc.agg(F.min("__cell")).collect())

    g = georef_grid(spark, 36, 18, ox=-180.0, oy=-90.0, sx=10.0, sy=10.0)
    tiles = g.df.select(F.col("row_id").alias("__lid"), F.col(GEOM).alias("__tgeom"),
                        F.explode(cell_cover(F.col(GEOM), 10.0)).alias("__cell"))

    joined = F.broadcast(tiles).join(cov, tiles["__cell"] == cov["__cell"], "inner")
    joined = joined.filter(_bbox_overlap(F.col("__tgeom"), F.col("__lgeom")))
    tick("bjoin_count", lambda: joined.count())

    aggd = joined.groupBy("__lid").agg(F.count(F.lit(1)).alias("c"), F.min("url").alias("u"))
    tick("bjoin_agg_collect", lambda: aggd.collect())

    # same but joining on precomputed single point cell, no geometry payload
    cov2 = pdf.select("row_id", "url", point_cell(F.col(GEOM), 10.0).alias("__cell"),
                      F.col(GEOM)["x"].alias("px"), F.col(GEOM)["y"].alias("py"))
    tiles2 = g.df.select(F.col("row_id").alias("__lid"),
                         F.col(GEOM)["xmin"].alias("txmin"), F.col(GEOM)["ymin"].alias("tymin"),
                         F.col(GEOM)["xmax"].alias("txmax"), F.col(GEOM)["ymax"].alias("tymax"),
                         F.explode(cell_cover(F.col(GEOM), 10.0)).alias("__cell"))
    j2 = F.broadcast(tiles2).join(cov2, tiles2["__cell"] == cov2["__cell"], "inner")
    j2 = j2.filter((F.col("px") >= F.col("txmin")) & (F.col("px") <= F.col("txmax"))
                   & (F.col("py") >= F.col("tymin")) & (F.col("py") <= F.col("tymax")))
    a2 = j2.groupBy("__lid").agg(F.count(F.lit(1)).alias("c"), F.min("url").alias("u"))
    tick("flat_join_agg_collect", lambda: a2.collect())


if __name__ == "__main__":
    main()
