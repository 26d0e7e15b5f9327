"""Benchmark harness: runs every driver query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is materialized through Spark's noop sink (full execution, no
collect/driver funnel). A small warm-up query absorbs JVM/codegen
startup so per-query numbers reflect steady-state execution.

Optional env:
- SPARK_GRAFT_BENCH_QUERIES: comma-separated subset to run
- SPARK_GRAFT_BENCH_REPEAT: repetitions per query (default 1, best-of)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from geotables_jl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # best-of-2 default: this host's available CPU drifts by minutes
    # (noisy neighbors); a single sample can misattribute a slow host
    # window to a query by 10x
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only = set(subset.split(",")) if subset else None

    sf = _sf_from_dir(sf_dir)
    spark = get_spark("bench", cpus=cpus)

    # warm-up: JVM + codegen + parquet footer caches, plus the Python
    # worker pool (first Arrow/pandas stage otherwise pays ~15s spawning
    # one worker per core — a long-running cluster keeps pools warm)
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    from pyspark.sql import functions as F

    def _noop_batch(it):
        for pdf in it:
            yield pdf

    spark.range(cpus * 4).repartition(cpus).withColumn("v", F.col("id") * 2).mapInPandas(
        _noop_batch, schema="id long, v long"
    ).write.format("noop").mode("overwrite").save()

    # gated queries + bench-only production-path twins (e.g. the
    # xxhash64 simhash vs the md5_60 oracle family the gate replays)
    qs = {**E.queries(), **getattr(E, "bench_extra", dict)()}
    times: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    # flagship throughput: geotagged pages joined into tiles, rows/sec
    n_pages = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    flagship = times.get("webpages_tiles")
    out = {
        "metric": "suite_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "flagship_rows_per_sec": round(n_pages / flagship, 1) if flagship else None,
    }
    print(json.dumps(out))


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


if __name__ == "__main__":
    main()
