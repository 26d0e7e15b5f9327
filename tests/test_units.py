"""Affine-unit normalization (reference src/geoops/utils.jl:39-59):
°C/°F → K before any aggregation mixes values; linear units untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import georef
from geotables_jl_spark.functions.units import normalize_affine, with_units
from geotables_jl_spark.operators.sac import combine, groupby


@pytest.fixture()
def temps(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 10.0, 1.0, 1.0), (1, 100.0, 20.0, 2.0, 2.0), (2, 212.0, 30.0, 3.0, 3.0)],
        "row_id long, t_f double, t_c double, x double, y double",
    )
    g = georef(df, coords=["x", "y"])
    return with_units(g, {"t_f": "degF", "t_c": "degC", "x": "m"})


def test_normalize_affine(temps):
    out = normalize_affine(temps)
    rows = {r["row_id"]: r for r in out.df.collect()}
    assert rows[0]["t_f"] == pytest.approx(255.3722222222222)  # 0 °F
    assert rows[2]["t_f"] == pytest.approx(373.15)  # 212 °F = 100 °C
    assert rows[1]["t_c"] == pytest.approx(293.15)  # 20 °C
    assert out.units == {"t_f": "K", "t_c": "K", "x": "m"}
    # idempotent
    again = normalize_affine(out)
    assert again.df.select("t_f", "t_c").collect() == out.df.select("t_f", "t_c").collect()


def test_combine_after_normalization(spark, temps):
    norm = normalize_affine(temps)
    g = with_units(norm, {})
    res = combine(
        groupby(g, "row_id") if False else g,  # whole-table reduction
        aggs={"mean_c": F.avg("t_c")},
        geometry=None,
    )
    got = res.df.collect()[0]["mean_c"]
    assert got == pytest.approx((283.15 + 293.15 + 303.15) / 3)
