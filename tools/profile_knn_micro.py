"""Micro-profile of per-row candidate scoring + top-k strategies for the
kNN map round: measures which expression shape stays cheap at 40M rows.

    python tools/profile_knn_micro.py [nrows] [ncand]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from geotables_jl_spark.session import get_spark


def timed(name, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 65
    k = 10
    spark = get_spark("knn-micro", cpus=16)
    base = spark.range(n).select(
        F.col("id").alias("lid"),
        (F.col("id") % 1000 / 7.0).alias("lx"),
        (F.col("id") % 997 / 7.0).alias("ly"),
        F.transform(
            F.sequence(F.lit(1), F.lit(m)),
            lambda i: F.struct(
                ((F.col("id") + i * 37) % 1009 / 7.0).alias("__rx"),
                ((F.col("id") + i * 91) % 1013 / 7.0).alias("__ry"),
                (F.col("id") * 100 + i).alias("__rid"),
            ),
        ).alias("cands"),
    )
    base = base.persist()
    base.count()
    timed("baseline_noop_scan", base.select("lid", "lx", "ly"))

    def cmp(a, b):
        return (
            F.when(a["__dist"] < b["__dist"], F.lit(-1))
            .when(a["__dist"] > b["__dist"], F.lit(1))
            .when(a["__rid"] < b["__rid"], F.lit(-1))
            .when(a["__rid"] > b["__rid"], F.lit(1))
            .otherwise(F.lit(0))
        )

    score = lambda c: F.struct(
        F.hypot(F.col("lx") - c["__rx"], F.col("ly") - c["__ry"]).alias("__dist"),
        c["__rid"].alias("__rid"),
    )

    # A: transform only (scoring cost alone)
    a = base.select("lid", F.transform("cands", score).alias("s")).select("lid", F.size("s").alias("z"))
    timed("A_transform_score_only", a)

    # B: score + natural-ordering sort (struct(dist,rid) is orderable)
    b = base.select("lid", F.array_sort(F.transform("cands", score)).alias("s"))
    b = b.select("lid", F.slice("s", 1, k).alias("top"), F.size("s").alias("cnt"))
    timed("B_natural_sort_split_proj", b)

    # C: score + comparator sort, split projections
    c = base.select("lid", F.array_sort(F.transform("cands", score), cmp).alias("s"))
    c = c.select("lid", F.slice("s", 1, k).alias("top"), F.size("s").alias("cnt"))
    timed("C_comparator_sort_split_proj", c)

    # D: comparator sort, single projection w/ 3 consumers (round-1 shape)
    srt = F.array_sort(F.transform("cands", score), cmp)
    d = base.select(
        "lid",
        F.size(srt).alias("cnt"),
        F.slice(srt, 1, k).alias("top"),
        F.element_at(F.slice(srt, 1, k), 5)["__dist"].alias("kth"),
    )
    timed("D_comparator_sort_3x_eval", d)

    # E: explode + codegen dist + groupBy collect_list + natural sort
    e = base.select("lid", "lx", "ly", F.explode("cands").alias("c"))
    e = e.select(
        "lid",
        F.struct(
            F.hypot(F.col("lx") - F.col("c")["__rx"], F.col("ly") - F.col("c")["__ry"]).alias("__dist"),
            F.col("c")["__rid"].alias("__rid"),
        ).alias("s"),
    )
    e = e.groupBy("lid").agg(F.slice(F.array_sort(F.collect_list("s")), 1, k).alias("top"))
    timed("E_explode_groupby_sort", e)


if __name__ == "__main__":
    main()
