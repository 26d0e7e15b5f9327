"""Split-apply-combine: @groupby / @transform / @combine as DataFrame planners.

Reference (``src/geoops/groupby.jl``, ``transform.jl``, ``combine.jl``):
- ``@groupby(gtb, keys)``: isequal grouping — missing groups together
  (Spark groupBy groups NULLs natively); 0.0 and -0.0 are DISTINCT groups
  (``test/operations.jl:405-414``) while Spark normalizes -0.0 == 0.0 in
  grouping keys — parity restored by grouping on an extra sign-at-zero
  shadow column for float keys.
- ``@transform``: add/replace columns row-wise; replacing ``geometry``
  swaps the domain (``transform.jl:56-57``). On a grouped table, applies
  to the parent but cannot replace grouping columns (``transform.jl:73-84``).
- ``@combine``: per-group reduction; group-key columns prepended
  (``combine.jl:83-89``); geometry default-reduces to the Multi collection
  of member geometries in row order (``combine.jl:52-57,75-81``), or a
  user reduction (e.g. centroid, ``test/operations.jl:569-575``).

Spark plan: one hash-shuffle groupBy with map-side partial aggregation;
group "first appearance order" is carried as ``min(row_id)`` and becomes
the output row_id (reference orders groups by first occurrence,
``groupby.jl:47``). Arbitrary per-group logic = ``apply_groups``
(applyInPandas).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable
from geotables_jl_spark.functions.geomfuncs import st_collect_points, st_collect_polygons
from geotables_jl_spark.geom.model import st_point
from geotables_jl_spark.operators.geojoin import _agg_expr

_SHADOW = "__signz_"


def _sign_at_zero(c: Column) -> Column:
    """-1 for -0.0, +1 for +0.0, 0 elsewhere (incl. NULL): distinguishes
    IEEE zero signs — 1.0/x diverges in sign at ±0."""
    # Spark's double→string cast preserves the IEEE sign: "-0.0" vs "0.0"
    neg = c.cast("string").startswith("-")
    return (
        F.when((c == 0.0) & neg, F.lit(-1))
        .when((c == 0.0), F.lit(1))
        .otherwise(F.lit(0))
    )


@dataclass
class GroupedGeoTable:
    gtb: GeoTable
    keys: list[str]
    strict_isequal: bool

    def _grouping(self) -> tuple[DataFrame, list[str], list[str]]:
        """(df, grouping cols, shadow cols). Float keys get a sign-at-zero
        shadow so grouping matches Julia isequal exactly."""
        df = self.gtb.df
        gcols: list[str] = []
        shadows: list[str] = []
        for k in self.keys:
            gcols.append(k)
            dtype = df.schema[k].dataType
            if self.strict_isequal and isinstance(dtype, (T.DoubleType, T.FloatType)):
                sh = _SHADOW + k
                df = df.withColumn(sh, _sign_at_zero(F.col(k)))
                gcols.append(sh)
                shadows.append(sh)
        return df, gcols, shadows


def groupby(gtb: GeoTable, *keys: str, strict_isequal: bool = True) -> GroupedGeoTable:
    return GroupedGeoTable(gtb=gtb, keys=list(keys), strict_isequal=strict_isequal)


def transform(obj: GeoTable | GroupedGeoTable, **exprs: Column):
    """@transform: add/replace columns. Assigning ``geometry=`` swaps the
    domain (grid metadata dropped — a transformed domain is a GeometrySet,
    mirroring ``src/geoops/combine.jl:66``)."""
    grouped = isinstance(obj, GroupedGeoTable)
    gtb = obj.gtb if grouped else obj
    if grouped:
        bad = set(exprs) & set(obj.keys)
        if bad:
            raise ValueError(f"cannot replace grouping columns {sorted(bad)}")  # transform.jl:73-84
    df = gtb.df
    geom_swap = GEOM in exprs
    for name, col in exprs.items():
        df = df.withColumn(name, col)
    out = GeoTable(
        df=df,
        crs=gtb.crs,
        lenunit=gtb.lenunit,
        grid=None if geom_swap else gtb.grid,
        units=dict(gtb.units),
        # a swapped geometry column has unknown kind; otherwise preserved
        kind_hint=None if geom_swap else gtb.kind_hint,
    )
    return GroupedGeoTable(gtb=out, keys=obj.keys, strict_isequal=obj.strict_isequal) if grouped else out


def _geometry_reduction(geometry) -> Column | None:
    """Geometry combine reduction over the group's members, collected in
    row order (deterministic under shuffle: sort by row_id inside the
    aggregate — SURVEY §7 hard part #5)."""
    sorted_geoms = F.expr(
        f"transform(array_sort(collect_list(struct(`{ROW_ID}`, `{GEOM}`))), s -> s.`{GEOM}`)"
    )
    if geometry is None:
        return None
    if isinstance(geometry, Column):
        return geometry
    if geometry == "multi":
        return F.when(
            F.element_at(sorted_geoms, 1)["kind"] == 1, st_collect_points(sorted_geoms)
        ).otherwise(st_collect_polygons(sorted_geoms))
    if geometry == "centroid":
        xs = F.transform(sorted_geoms, lambda g: g["x"])
        ys = F.transform(sorted_geoms, lambda g: g["y"])
        n = F.size(xs).cast("double")
        return st_point(
            F.aggregate(xs, F.lit(0.0), lambda a, v: a + v) / n,
            F.aggregate(ys, F.lit(0.0), lambda a, v: a + v) / n,
        )
    raise ValueError(f"unknown geometry reduction {geometry!r}")


def combine(
    obj: GeoTable | GroupedGeoTable,
    aggs: dict[str, str | Column] | None = None,
    geometry: str | Column | None = "multi",
) -> GeoTable:
    """@combine: whole-table or per-group reduction — one output row per
    group, group keys prepended (``combine.jl:83-89``), geometry reduced.

    aggs: column -> agg name ("mean","sum","std","median","first","last",
    "min","max","count","collect") or a ready aggregate Column.
    geometry: "multi" (default), "centroid", a Column, or None to drop.
    """
    grouped = isinstance(obj, GroupedGeoTable)
    gtb = obj.gtb if grouped else obj
    aggs = aggs or {}

    agg_exprs: list[Column] = [F.min(ROW_ID).alias("__first_row")]
    for c, spec in aggs.items():
        agg_exprs.append(spec.alias(c) if isinstance(spec, Column) else _agg_expr(spec, c, ROW_ID).alias(c))
    geom_expr = _geometry_reduction(geometry)
    if geom_expr is not None:
        agg_exprs.append(geom_expr.alias(GEOM))

    if grouped:
        df, gcols, shadows = obj._grouping()
        res = df.groupBy(*gcols).agg(*agg_exprs).drop(*shadows)
        keys = obj.keys
    else:
        res = gtb.df.agg(*agg_exprs)
        keys = []

    res = res.withColumn(ROW_ID, F.col("__first_row")).drop("__first_row")
    final = [ROW_ID] + keys + list(aggs) + ([GEOM] if geom_expr is not None else [])
    # geometry reduction replaces the domain: 'centroid' provably yields
    # points; 'multi'/custom reductions have unknown kind
    kh = "point" if geometry == "centroid" else None
    return GeoTable(df=res.select(*final), crs=gtb.crs, lenunit=gtb.lenunit, grid=None, units=dict(gtb.units),
                    kind_hint=kh if geom_expr is not None else None)


def apply_groups(obj: GroupedGeoTable, fn, schema: str | T.StructType) -> DataFrame:
    """Arbitrary per-group pandas logic (reference Partition iteration,
    ``test/operations.jl:426-428``) = applyInPandas."""
    df, gcols, _ = obj._grouping()
    return df.groupBy(*gcols).applyInPandas(fn, schema=schema)
