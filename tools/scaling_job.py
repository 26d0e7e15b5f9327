"""One scaling-run worker: the flagship geojoin (intersects) and kNN
jobs at a given parallelism, on a deterministically amplified corpus.

    python tools/scaling_job.py <cpus> [amp] [sf_dir]

Prints one JSON line per job: {"job", "cpus", "rows", "sec", "rows_per_sec"}.
Run in a fresh process per parallelism level (one JVM each) — this is
the sandbox stand-in for the north rule's N vs 4N executor clusters.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef, georef_grid
from geotables_jl_spark.operators.geojoin import geojoin, knn_join
from geotables_jl_spark.session import get_spark
from geotables_jl_spark.sources.webpages import extract_geotags, webpages_from_df


def amplified_pages(spark, sf_dir: str, amp: int):
    """documents × amp with distinct doc_ids → distinct urls/coords.

    The fixture parquet is one row group = one input split; a real
    corpus has thousands of splits, so hash-repartition on the key
    BEFORE the explode — otherwise the whole scan+explode+geotag stage
    runs as a single task and the scaling measurement is bogus."""
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang", "source")
    doc = doc.repartition(spark.sparkContext.defaultParallelism * 3, "doc_id")
    doc = doc.withColumn("__copy", F.explode(F.sequence(F.lit(0), F.lit(amp - 1))))
    doc = doc.withColumn("doc_id", F.col("doc_id") * amp + F.col("__copy")).drop("__copy")
    pages = extract_geotags(webpages_from_df(doc))
    pages = pages.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    return georef(pages, coords=["lat", "lon"])


def run_geojoin(spark, sf_dir: str, amp: int) -> dict:
    pages = amplified_pages(spark, sf_dir, amp)
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
    n_rows = pages.df.count()
    t0 = time.perf_counter()
    res = geojoin(tiles, pages, aggs={"page_id": "count", "url": "min"}, kind="inner")
    res.df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return {"job": "geojoin_intersects", "rows": n_rows, "sec": round(dt, 3)}


def run_knn(spark, sf_dir: str, amp: int) -> dict:
    pages = amplified_pages(spark, sf_dir, amp)
    pages = GeoTable(df=pages.df.select("row_id", "geometry"), crs=pages.crs)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    supp = (
        supp.withColumn("sx", ((k * 7919) % 3600) / 10.0 - 180.0 + 0.05)
        .withColumn("sy", ((k * 104729) % 1700) / 10.0 - 85.0 + 0.05)
        .withColumn("row_id", k)
        .select("row_id", "sx", "sy")
    )
    supp = georef(supp, coords=["sx", "sy"], crs="LatLon")
    n_rows = pages.df.count()
    t0 = time.perf_counter()
    knn_join(pages, supp, k=3).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return {"job": "geojoin_knn", "rows": n_rows, "sec": round(dt, 3)}


def main() -> None:
    cpus = int(sys.argv[1])
    amp = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(f"scaling-{cpus}", cpus=cpus)
    # warm-up at tiny amplification: JVM/codegen/parquet-footer costs
    run_geojoin(spark, sf_dir, 1)
    run_knn(spark, sf_dir, 1)
    for res in (run_geojoin(spark, sf_dir, amp), run_knn(spark, sf_dir, amp)):
        res["cpus"] = cpus
        res["rows_per_sec"] = round(res["rows"] / res["sec"], 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
