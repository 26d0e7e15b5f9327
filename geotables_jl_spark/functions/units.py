"""Unit metadata + affine-unit normalization.

Reference semantics (``/root/reference/src/geoops/utils.jl:39-59``):
before any aggregation mixes values, columns in *affine* units (°C, °F
— units whose conversion has an offset) are converted to their absolute
counterpart (K), because averaging affine quantities is meaningless in
the affine frame. Linear units (m, km, s...) are left alone and only
tracked as metadata.

Units ride in ``GeoTable.units`` ({column: unit}); ``normalize_affine``
is the eager pre-pass ``geojoin``/``tablejoin``/``combine`` apply, as a
pure column expression (codegen'd; at 100 TB this fuses into the scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable

#: affine unit → (absolute unit, column transform)
_AFFINE = {
    "degC": ("K", lambda c: c + F.lit(273.15)),
    "degF": ("K", lambda c: (c - F.lit(32.0)) * F.lit(5.0 / 9.0) + F.lit(273.15)),
}


def with_units(gtb: GeoTable, units: dict[str, str]) -> GeoTable:
    out = gtb._with(gtb.df)
    out.units.update(units)
    return out


def normalize_affine(gtb: GeoTable) -> GeoTable:
    """Convert every affine-united column to its absolute unit (°C/°F→K).

    Idempotent; non-affine units pass through untouched. Mirrors the
    reference's uadjust pre-pass applied by geojoin at
    ``src/geoops/geojoin.jl:89-90``."""
    df = gtb.df
    new_units = dict(gtb.units)
    for col, unit in gtb.units.items():
        if unit in _AFFINE and col in df.columns:
            absu, fn = _AFFINE[unit]
            df = df.withColumn(col, fn(F.col(col)))
            new_units[col] = absu
    out = GeoTable(df=df, crs=gtb.crs, lenunit=gtb.lenunit, grid=gtb.grid, units=new_units, kind_hint=gtb.kind_hint)
    return out
