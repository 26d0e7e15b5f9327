"""hcat / vcat / equality — reference ``src/api/dataframes.jl:130-289``,
``src/abstractgeotable.jl:56-72``."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable


def hcat(*gtbs: GeoTable, validate: bool = True) -> GeoTable:
    """Column concat; requires identical domain (same row_id spine —
    reference errors on domain mismatch, ``dataframes.jl:140-144``).
    Duplicate names deduped with '_' suffix (``dataframes.jl:154-165``).
    Plan: joins on row_id — with equal domains this is a co-partitioned
    equi-join; broadcast when a side is small.

    validate=True checks spine equality with one count per side (cheap:
    counts equal + inner join preserves the count ⇒ identical id sets).
    At 10^12 rows pass validate=False when the spines are equal by
    construction (e.g. two transforms of one table) to skip the counts."""
    if not gtbs:
        raise ValueError("hcat of nothing")
    base = gtbs[0]
    out = base.df
    taken = set(out.columns)
    n_base = out.count() if validate else None
    for g in gtbs[1:]:
        right = g.df.drop(GEOM)
        if validate and g.df.count() != n_base:
            raise ValueError(
                "hcat: tables with different domains (row counts differ — "
                "reference throws, src/api/dataframes.jl:140-144)"
            )
        for c in right.columns:
            if c == ROW_ID:
                continue
            new = c
            while new in taken:
                new = new + "_"
            if new != c:
                right = right.withColumnRenamed(c, new)
            taken.add(new)
        out = out.join(right, on=ROW_ID, how="inner")
    if validate and len(gtbs) > 1 and out.count() != n_base:
        # equal counts but different id sets: the inner join shrank
        raise ValueError(
            "hcat: tables with different domains (row_id spines disagree — "
            "reference throws, src/api/dataframes.jl:140-144)"
        )
    attrs = [c for c in out.columns if c not in (ROW_ID, GEOM)]
    return base._with(out.select(ROW_ID, *attrs, GEOM))


def vcat(*gtbs: GeoTable, kind: str = "union") -> GeoTable:
    """Row concat. kind='union': outer column union, missing-fill
    (``dataframes.jl:222-264``); kind='intersect': common columns only,
    error if none (``dataframes.jl:266-289``). Domains concatenated;
    row_id renumbered by table offset (positional concat semantics)."""
    if kind not in ("union", "intersect"):
        raise ValueError("kind must be 'union' or 'intersect'")
    if not gtbs:
        raise ValueError("vcat of nothing")
    dfs = [g.df for g in gtbs]
    if kind == "intersect":
        common = set(dfs[0].columns)
        for d in dfs[1:]:
            common &= set(d.columns)
        common -= {ROW_ID, GEOM}
        if not common:
            raise ValueError("no common columns to vcat with kind='intersect'")
        cols = [c for c in dfs[0].columns if c in common]
        dfs = [d.select(ROW_ID, *cols, GEOM) for d in dfs]

    # renumber row ids: table i offset by sum of prior counts (one tiny
    # count job per table; at scale prefer precomputed counts)
    offset = 0
    parts: list[DataFrame] = []
    for d in dfs:
        parts.append(d.withColumn(ROW_ID, F.col(ROW_ID) + F.lit(offset)))
        offset += d.count()
    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=(kind == "union")), parts)
    attrs = [c for c in out.columns if c not in (ROW_ID, GEOM)]
    return gtbs[0]._with(out.select(ROW_ID, *attrs, GEOM))


def geotable_equal(g1: GeoTable, g2: GeoTable) -> bool:
    """Null-safe full equality (test helper; reference ``==`` at
    ``src/abstractgeotable.jl:56-72``)."""
    d1, d2 = g1.df, g2.df
    if set(d1.columns) != set(d2.columns):
        return False
    cols = d1.columns
    return d1.select(cols).exceptAll(d2.select(cols)).isEmpty() and d2.select(cols).exceptAll(
        d1.select(cols)
    ).isEmpty()
