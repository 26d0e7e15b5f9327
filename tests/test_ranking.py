"""Distributed global ranking (operators/ranking.py) vs the SQL window
functions it replaces — exact parity, including ties, plus the
no-unpartitioned-window plan guarantee (VERDICT round 1, wrong #1)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from geotables_jl_spark.operators.ranking import TOTAL, global_rank, ntile_col, percent_rank_col


def _table(spark, n=5000, ties=True):
    df = spark.range(n).withColumnRenamed("id", "row_id")
    # values with heavy ties (mod 97) or near-unique, deterministic
    v = (F.col("row_id") * 7919) % (97 if ties else 1_000_003)
    return df.withColumn("v", v.cast("double")).repartition(16)


def test_global_row_number_matches_window(spark):
    df = _table(spark, ties=True)
    got = global_rank(df, F.col("v"), out="rnk", tiebreak=[F.col("row_id").asc()], keep_total=True)
    totals = got.select(TOTAL).distinct().collect()
    assert [int(t[0]) for t in totals] == [5000]
    got = got.drop(TOTAL)
    want = df.withColumn("rnk", F.row_number().over(W.orderBy(F.col("v").asc(), F.col("row_id").asc())).cast("long"))
    assert got.select("row_id", "rnk").exceptAll(want.select("row_id", "rnk")).count() == 0


def test_global_rank_mode_ties(spark):
    df = _table(spark, ties=True)
    got = global_rank(df, F.col("v"), out="rnk", mode="rank")
    want = df.withColumn("rnk", F.rank().over(W.orderBy(F.col("v").asc())).cast("long"))
    assert got.select("row_id", "rnk").exceptAll(want.select("row_id", "rnk")).count() == 0


def test_percent_rank_matches_window(spark):
    df = _table(spark, n=3000, ties=True)
    got = percent_rank_col(df, F.col("v"), out="pr")
    want = df.withColumn("pr", F.percent_rank().over(W.orderBy(F.col("v").asc())))
    j = got.select("row_id", F.col("pr").alias("a")).join(
        want.select("row_id", F.col("pr").alias("b")), "row_id"
    )
    assert j.filter(F.abs(F.col("a") - F.col("b")) > 1e-12).count() == 0


def test_ntile_matches_window(spark):
    for n, tiles in ((3000, 7), (10, 3), (4, 7)):
        df = _table(spark, n=n, ties=False)
        got = ntile_col(df, F.col("v"), tiles, out="t", tiebreak=[F.col("row_id").asc()])
        want = df.withColumn("t", F.ntile(tiles).over(W.orderBy(F.col("v").asc(), F.col("row_id").asc())))
        assert got.select("row_id", "t").exceptAll(want.select("row_id", "t")).count() == 0, (n, tiles)


def test_no_unpartitioned_window_in_plans(spark):
    """The replaced operators' plans must not contain a Window with an
    empty partition spec (single-task collapse)."""
    from geotables_jl_spark.core.geotable import georef
    from geotables_jl_spark.operators.indices import partition_direction
    from geotables_jl_spark.operators.transforms import quantile_transform

    df = spark.range(500).withColumnRenamed("id", "row_id")
    df = df.withColumn("x", (F.col("row_id") % 50).cast("double")).withColumn(
        "y", (F.col("row_id") % 31).cast("double")
    ).withColumn("v", ((F.col("row_id") * 13) % 89).cast("double"))
    gtb = georef(df, coords=["x", "y"])
    for out in (quantile_transform(gtb, "v"), partition_direction(gtb, 1.0, 0.5)):
        plan = out.df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                # every window in these plans must be partitioned by the
                # range bucket — an empty partition spec = one-task sort
                assert "__rk_bkt" in line, line
