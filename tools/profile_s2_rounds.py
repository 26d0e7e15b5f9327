"""Phase-level profile of s2_knn_join's DataFrame ROUNDS arm
(engine="rounds" — the default broadcast path now runs the one-map-stage
kernel, geom/s2_knn_kernel.py) at one parallelism level — quantifies the
non-scaling overhead (per-round broadcast build of the directory cover,
planning, checkpoint barriers) against the scalable kernel work.

    python tools/profile_s2_rounds.py <cpus> <input_dir> [sf_dir]

Phases:
  bc_build    — broadcast-hash-relation build cost in isolation: a 1-row
                left joined against the full exploded directory cover
                (the join's wall is ~all build, no probe work)
  knn_full    — the real s2_knn_join (default chord0, multi-round)
  knn_1round  — chord0 inflated 4x so round 1 certifies ~everything
                (delta vs knn_full = the tail rounds' cost)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geotables_jl_spark.operators.geojoin_s2 import s2_knn_join, s2_point_prep
from geotables_jl_spark.session import get_spark
from tools.scaling_job import _supplier_directory


def main() -> None:
    cpus = int(sys.argv[1])
    input_dir = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(f"s2prof-{cpus}", cpus=cpus)

    def tick(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"PHASE {label}: {time.perf_counter() - t0:.2f}s", flush=True)
        return out

    pages = spark.read.parquet(input_dir).select(F.col("row_id").alias("lid"), "lat", "lon")
    left = s2_point_prep(pages, "lid", latlon=("lat", "lon"))
    supp = _supplier_directory(spark, sf_dir).withColumnRenamed("row_id", "rid").repartition(64)
    right = s2_point_prep(supp, "rid", latlon=("lat", "lon"))
    n_right = supp.count()
    n_rows = pages.count()
    print(f"rows={n_rows} directory={n_right} cpus={cpus}", flush=True)

    # warm JVM + Python worker pool (same as scaling_job)
    left.limit(1000).count()
    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    k = 10
    theta0 = 2.0 * math.sqrt(k / n_right)
    chord0 = min(2.0, 1.5 * theta0)

    one = left.limit(1)
    for i in range(2):
        tick(f"bc_build_{i}", lambda: s2_knn_join(
            one, right, k=k, n_right=n_right, n_left=1,
            broadcast_right=True, chord0=chord0, engine="rounds",
        ).write.format("noop").mode("overwrite").save())

    for i in range(2):
        tick(f"knn_full_{i}", lambda: s2_knn_join(
            left, right, k=k, n_right=n_right, n_left=n_rows, broadcast_right=True, engine="rounds"
        ).write.format("noop").mode("overwrite").save())

    for i in range(2):
        tick(f"knn_1round_{i}", lambda: s2_knn_join(
            left, right, k=k, n_right=n_right, n_left=n_rows,
            broadcast_right=True, chord0=min(2.0, 4.0 * chord0), engine="rounds",
        ).write.format("noop").mode("overwrite").save())


if __name__ == "__main__":
    main()
