"""tablejoin — equi-only aggregate-on-match join.

Reference ``src/geoops/tablejoin.jl:36-129``: same fused
JOIN+GROUP BY+AGG shape as geojoin but matching purely on ``on``
attribute equality (``isequal`` → null-safe ``<=>``); the left table
keeps its domain. Physical plan: plain equi-join (Catalyst picks
broadcast for a small right side) → groupBy(left row id) → agg → spine
join. No spatial stages at all.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable
from geotables_jl_spark.operators.geojoin import _rename_collisions, build_aggs

_LID = "__lid"
_RID = "__rid"


def tablejoin(
    gtb: GeoTable,
    table: DataFrame,
    on: Iterable[str],
    aggs: dict[str, str] | None = None,
    kind: str = "left",
) -> GeoTable:
    if kind not in ("left", "inner"):
        raise ValueError("kind must be 'left' or 'inner'")
    on = list(on)
    if not on:
        raise ValueError("tablejoin requires on= columns")

    if gtb.units:
        from geotables_jl_spark.functions.units import normalize_affine

        gtb = normalize_affine(gtb)

    df1 = gtb.df
    df2 = table
    if ROW_ID not in df2.columns:
        df2 = df2.withColumn(ROW_ID, F.monotonically_increasing_id())
    if GEOM in df2.columns:
        df2 = df2.drop(GEOM)
    df2, renames = _rename_collisions(df1, df2, on)
    right_cols = [c for c in df2.columns if c != ROW_ID and c not in on]
    if aggs:
        from geotables_jl_spark.operators.geojoin import _agg_expr

        mapped = {}
        for key, name in aggs.items():
            new_key = renames.get(key, key)
            if new_key not in right_cols:
                raise ValueError(f"tablejoin agg on unknown right column {key!r}")
            _agg_expr(name, new_key, _RID)
            mapped[new_key] = name
        aggs = mapped

    l = df1.select(F.col(ROW_ID).alias(_LID), *on)
    r = df2.select(F.col(ROW_ID).alias(_RID), *[F.col(c).alias(f"__r_{c}") for c in on], *right_cols)
    cond = None
    for c in on:
        k = l[c].eqNullSafe(r[f"__r_{c}"])  # isequal semantics (geojoin.jl:226)
        cond = k if cond is None else (cond & k)
    matched = l.join(r, cond, "inner")

    agg_exprs = build_aggs(df2, right_cols, aggs, rid_col=_RID)
    agg = matched.groupBy(_LID).agg(*agg_exprs)

    how = "left" if kind == "left" else "inner"
    out = df1.join(agg, df1[ROW_ID] == agg[_LID], how).drop(_LID)
    left_attrs = [c for c in df1.columns if c not in (ROW_ID, GEOM)]
    out = out.select(ROW_ID, *left_attrs, *right_cols, GEOM)
    return GeoTable(df=out, crs=gtb.crs, lenunit=gtb.lenunit, grid=gtb.grid, units=dict(gtb.units), kind_hint=gtb.kind_hint)
