"""Distributed global ranking — the scale-correct replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (which collapses the whole
table into ONE task — the textbook 100×-scale killer).

Plan shape (range-bucket rank):

  1. one approx-quantile aggregate over the rank value → ~``nbuckets``
     range boundaries (driver gets a tiny array);
  2. every row is assigned a bucket with STRICT-less comparisons against
     the boundaries (pure codegen column math). Strict-less means a tie
     group (equal values) can never straddle two buckets, which is what
     makes exact ``rank``/``percent_rank`` semantics composable from
     per-bucket ranks;
  3. one per-bucket count aggregate → cumulative offsets (driver, tiny);
  4. final pass: ``row_number``/``rank`` over a window PARTITIONED BY
     bucket + the broadcast offset literal.

Every stage is a map or a map-side-combinable aggregate; the only sort is
per-bucket (~n/nbuckets rows per task). Worst case is data-inherent: one
mega-tie value forms one bucket (exact rank of a tie group is a global
property, so no exact method can split it).

Replaces the three round-1 unpartitioned windows (VERDICT "What's wrong"
#1): ``quantile_transform``, ``partition_direction``, ``q_sort_direction``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_BKT = "__rk_bkt"
_VAL = "__rk_val"


def _bucket_expr(val: Column, bounds: list[float]) -> Column:
    """bucket(v) = #{boundary b : b < v} — monotone in v, constant on tie
    groups (strict-less keeps equal values together)."""
    e = F.lit(0)
    for b in bounds:
        e = e + (F.lit(float(b)) < val).cast("int")
    return e


def global_rank(
    df: DataFrame,
    value: Column,
    out: str = "__grank",
    tiebreak: list[Column] | None = None,
    mode: str = "row_number",
    nbuckets: int | None = None,
) -> tuple[DataFrame, int]:
    """Add a 1-based global rank column ordered by ``value`` (ascending,
    NULLs excluded from ordering guarantees — pre-filter if needed).

    mode="row_number": unique ranks, ties broken by ``tiebreak`` columns.
    mode="rank": competition rank (ties share the rank of their first row)
    — the building block of exact ``percent_rank``.

    Returns (df_with_rank, total_rows) — the total falls out of the
    bucket-count pass, so callers needing n (percent_rank, ntile) don't
    pay another job.
    """
    if mode not in ("row_number", "rank"):
        raise ValueError("mode must be 'row_number' or 'rank'")
    tiebreak = list(tiebreak or [])
    spark = df.sparkSession
    if nbuckets is None:
        nbuckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = df.withColumn(_VAL, value.cast("double"))

    probs = [i / nbuckets for i in range(1, nbuckets)]
    row = d.agg(F.percentile_approx(_VAL, F.array(*[F.lit(p) for p in probs]), 1000).alias("q")).collect()[0]
    bounds = sorted(set(float(b) for b in (row["q"] or []) if b is not None))

    d = d.withColumn(_BKT, _bucket_expr(F.col(_VAL), bounds))
    counts = {r[_BKT]: r["cnt"] for r in d.groupBy(_BKT).agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total = int(sum(counts.values()))
    offsets, acc = [], 0
    for b in range(len(bounds) + 1):
        offsets.append(acc)
        acc += counts.get(b, 0)

    w = W.partitionBy(_BKT).orderBy(F.col(_VAL).asc(), *tiebreak)
    rn = F.row_number().over(w) if mode == "row_number" else F.rank().over(w)
    off = F.element_at(F.array(*[F.lit(o) for o in offsets]), F.col(_BKT) + 1)
    return d.withColumn(out, (off + rn).cast("long")).drop(_VAL, _BKT), total


def percent_rank_col(df: DataFrame, value: Column, out: str) -> DataFrame:
    """Exact ``percent_rank`` = (rank - 1) / (n - 1), distributed."""
    ranked, total = global_rank(df, value, out=out, mode="rank")
    denom = max(total - 1, 1)
    return ranked.withColumn(out, (F.col(out) - F.lit(1)).cast("double") / F.lit(float(denom)))


def ntile_col(
    df: DataFrame, value: Column, n: int, out: str, tiebreak: list[Column] | None = None
) -> DataFrame:
    """Exact ``ntile(n)`` over the global order — 1-based tile id, same
    remainder distribution as the SQL window function (first ``N % n``
    tiles get the extra row)."""
    ranked, total = global_rank(df, value, out="__rk_rn", tiebreak=tiebreak, mode="row_number")
    q, r = divmod(total, n) if total else (0, 0)
    rn = F.col("__rk_rn")
    if q == 0:
        tile = rn  # fewer rows than tiles: tile i = row i (SQL semantics)
    else:
        big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
        tile = F.when(rn <= F.lit(big), (rn - 1) / F.lit(q + 1)).otherwise(
            F.lit(r) + (rn - 1 - F.lit(big)) / F.lit(q)
        )
        tile = F.floor(tile) + 1
    return ranked.withColumn(out, tile.cast("int")).drop("__rk_rn")
