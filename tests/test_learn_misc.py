"""Learn (OLS) + the representation/functional transforms from the
reference feature-pipeline list (``/root/reference/test/feature.jl:4-43``):
Identity, RowTable/ColTable, Functional, StdFeats, Learn."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, georef
from geotables_jl_spark.operators import transforms as TR
from geotables_jl_spark.operators.learn import learn_ols


@pytest.fixture(scope="module")
def gtb(spark):
    rows = [
        (i, float(i), 2.5 * i - 1.0 + 0.1 * ((i * 7) % 5), float((i * 3) % 7), i % 3)
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, ["row_id", "x", "y", "w", "cat"])
    df = df.withColumn("px", F.col("x")).withColumn("py", F.col("w"))
    return georef(df, coords=["px", "py"])


def test_identity_rowtable_coltable_noop(gtb):
    base = gtb.df.orderBy(ROW_ID).collect()
    for t in (TR.identity, TR.rowtable, TR.coltable):
        out = t(gtb)
        assert out.df.columns == gtb.df.columns
        assert out.df.orderBy(ROW_ID).collect() == base


def test_functional_exp_log_roundtrip(gtb):
    out = TR.functional(TR.functional(gtb, "exp", "x"), "log", "x")
    got = [r["x"] for r in out.df.orderBy(ROW_ID).collect()]
    want = [r["x"] for r in gtb.df.orderBy(ROW_ID).collect()]
    assert got == pytest.approx(want, rel=1e-12)


def test_functional_defaults_to_numeric_attrs(gtb):
    out = TR.functional(gtb, "abs")
    # cat is numeric → transformed; geometry/row_id untouched
    assert out.df.columns == gtb.df.columns


def test_functional_unknown_fn(gtb):
    with pytest.raises(ValueError):
        TR.functional(gtb, "nope")


def test_stdfeats_standardizes_fractional_only(gtb):
    out = TR.stdfeats(gtb)
    stats = out.df.agg(
        F.avg("x").alias("mx"),
        F.stddev_samp("x").alias("sx"),
        F.avg("y").alias("my"),
        F.stddev_samp("y").alias("sy"),
        F.sum("cat").alias("scat"),
    ).collect()[0]
    assert abs(stats["mx"]) < 1e-9 and abs(stats["sx"] - 1.0) < 1e-9
    assert abs(stats["my"]) < 1e-9 and abs(stats["sy"] - 1.0) < 1e-9
    # int column untouched
    orig = gtb.df.agg(F.sum("cat")).collect()[0][0]
    assert stats["scat"] == orig


def _numpy_ols(X, y):
    A = np.column_stack([np.ones(len(y))] + [X[:, i] for i in range(X.shape[1])])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    return A @ beta


def test_learn_ols_single_feature_matches_numpy(gtb):
    out = learn_ols(gtb, "y", "x")
    rows = out.df.orderBy(ROW_ID).collect()
    X = np.array([[r["x"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    want = _numpy_ols(X, y)
    got = np.array([r["y_hat"] for r in rows])
    assert np.allclose(got, want, rtol=1e-9)
    # fit is non-trivial (actual slope, not the mean)
    assert np.std(got) > 1.0


def test_learn_ols_multi_feature_matches_numpy(gtb):
    out = learn_ols(gtb, "y", "x", "w")
    rows = out.df.orderBy(ROW_ID).collect()
    X = np.array([[r["x"], r["w"]] for r in rows])
    y = np.array([r["y"] for r in rows])
    want = _numpy_ols(X, y)
    got = np.array([r["y_hat"] for r in rows])
    assert np.allclose(got, want, rtol=1e-8)


def test_learn_ols_default_features(gtb):
    # defaults = every numeric attribute except the target
    out = learn_ols(gtb, "y")
    assert "y_hat" in out.df.columns
    r2_cols = [c for c in out.df.columns if c != GEOM]
    assert set(r2_cols) >= {"row_id", "x", "y", "w", "cat", "y_hat"}


def test_learn_ols_requires_feature(spark):
    df = spark.createDataFrame([(1, "a", 0.0, 0.0)], ["row_id", "s", "px", "py"])
    g = georef(df, coords=["px", "py"])
    with pytest.raises(ValueError):
        learn_ols(g, "s")
