"""Learn transform — fit a model on the geotable, fold predictions back.

Reference: ``Learn(label(d, "y"))`` in the feature-transform pipeline
(``/root/reference/test/feature.jl:71-76`` via StatsLearnModels.jl): the
transform trains on the input table and ``apply`` attaches the model's
predictions; the domain is unchanged.

Spark-first shape (mirrors ``operators/eigen.py``): the normal-equation
system X'X / X'y is ONE map-side-combinable aggregate over outer-product
terms — O(n·d²) compiled column math, O(d²) driver state, zero
iteration. The tiny (d+1)×(d+1) solve happens driver-side and the fitted
surface folds back into the scan as a pure codegen expression; no Python
ever touches a row. At 10^12 rows this is a single scan + one small
shuffle-free aggregate.

The single-feature path uses the closed-form slope/intercept expressions
instead of a linear solve so the arithmetic is reproducible term-for-term
in ANSI SQL (the driver-oracle bit-exactness contract — every multiply
and divide has an identical twin in ``oracle_sql()``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable

_NUMERIC = (
    T.DoubleType, T.FloatType, T.LongType, T.IntegerType, T.ShortType, T.ByteType
)


def learn_ols(
    gtb: GeoTable, target: str, *features: str, out: str | None = None
) -> GeoTable:
    """Ordinary-least-squares Learn: fit ``target ~ 1 + features`` and
    attach the fitted values as column ``out`` (default
    ``{target}_hat``). Features default to every numeric attribute
    column except the target."""
    df = gtb.df
    feats = list(features)
    if not feats:
        feats = [
            c
            for c in df.columns
            if c not in (ROW_ID, GEOM, target)
            and isinstance(df.schema[c].dataType, _NUMERIC)
        ]
    if not feats:
        raise ValueError("learn_ols needs at least one numeric feature column")
    out = out or f"{target}_hat"
    y = F.col(target).cast("double")

    if len(feats) == 1:
        # closed form: slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx),
        # intercept = (Σy − slope·Σx) / n — written identically in the
        # SQL oracle, so fitted values are bit-exact across engines.
        x = F.col(feats[0]).cast("double")
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(x * y).alias("sxy"),
        ).collect()[0]
        n = float(row["n"])
        denom = n * row["sxx"] - row["sx"] * row["sx"]
        slope = (n * row["sxy"] - row["sx"] * row["sy"]) / denom if denom else 0.0
        b0 = (row["sy"] - slope * row["sx"]) / n
        pred = F.lit(b0) + F.lit(slope) * x
        return gtb._with(df.withColumn(out, pred))

    # general case: one aggregate pass builds the (d+1)×(d+1) Gram matrix
    # (intercept column folded in as the constant 1 feature)
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feats]
    d = len(cols)
    aggs = [
        F.sum(cols[i] * cols[j]).alias(f"__g_{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    aggs += [F.sum(cols[i] * y).alias(f"__b_{i}") for i in range(d)]
    row = df.agg(*aggs).collect()[0]
    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = row[f"__g_{i}_{j}"]
    b = np.array([row[f"__b_{i}"] for i in range(d)])
    beta = np.linalg.lstsq(G, b, rcond=None)[0]
    pred = F.lit(float(beta[0]))
    for i, c in enumerate(feats):
        pred = pred + F.lit(float(beta[i + 1])) * F.col(c).cast("double")
    return gtb._with(df.withColumn(out, pred))
