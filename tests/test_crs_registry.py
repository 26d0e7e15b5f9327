"""CRS registry (functions/crs.py): EPSG/ESRI code resolution, UTM
transverse-Mercator and Lambert-conformal-conic closed forms, roundtrip
accuracy, projection invariants, and geojoin auto-reprojection across
authority codes (reference accepts ``EPSG{...}``/``ESRI{...}``,
``src/georef.jl:185-188``; geojoin CRS alignment
``src/geoops/geojoin.jl:216-224``)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from geotables_jl_spark.core.geotable import GeoTable, georef
from geotables_jl_spark.functions.crs import canonical_crs, parse_crs, reproject
from geotables_jl_spark.operators.geojoin import geojoin


def test_canonical_codes():
    assert canonical_crs("EPSG:4326") == "LatLon"
    assert canonical_crs("epsg:3857") == "WebMercator"
    assert canonical_crs("EPSG{4326}") == "LatLon"  # reference spelling
    assert canonical_crs("EPSG:32630") == "UTM:30N"
    assert canonical_crs("EPSG:32723") == "UTM:23S"
    assert canonical_crs("UTM:30n") == "UTM:30N"
    assert canonical_crs("EPSG:2154") == "EPSG:2154"
    assert canonical_crs("ESRI:102004") == "ESRI:102004"
    assert canonical_crs("LatLon") == "LatLon"
    with pytest.raises(ValueError):
        parse_crs("EPSG:99999")
    with pytest.raises(ValueError):
        parse_crs("UTM:61N")


def _roundtrip_err(spark, crs_spec: str, pts: list[tuple[float, float]]) -> float:
    """max |Δ| in degrees after LatLon → crs → LatLon."""
    df = spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(pts)], "row_id long, lat double, lon double"
    )
    g = georef(df, coords=["lat", "lon"])
    there = reproject(g, crs_spec)
    assert there.crs == canonical_crs(crs_spec)
    back = reproject(there, "LatLon")
    got = {
        r["row_id"]: (r["y"], r["x"])
        for r in back.df.select(
            "row_id", F.col("geometry")["x"].alias("x"), F.col("geometry")["y"].alias("y")
        ).collect()
    }
    return max(
        max(abs(got[i][0] - lat), abs(got[i][1] - lon)) for i, (lat, lon) in enumerate(pts)
    )


def test_utm_roundtrip_and_invariants(spark):
    pts = [(52.0, -3.2), (48.85, -1.1), (40.0, -5.9), (55.5, 0.5), (36.1, -2.0)]
    # zone 30N covers lon ∈ [-6, 0]; series accuracy ~1e-9 deg
    assert _roundtrip_err(spark, "EPSG:32630", pts) < 1e-9

    # invariant: a point ON the central meridian (lon0 = -3 for zone 30)
    # maps to easting = FE = 500000 exactly, northing > 0 in the north
    df = spark.createDataFrame([(0, 52.0, -3.0)], "row_id long, lat double, lon double")
    r = reproject(georef(df, coords=["lat", "lon"]), "UTM:30N").df.select(
        F.col("geometry")["x"].alias("e"), F.col("geometry")["y"].alias("n")
    ).collect()[0]
    assert abs(r["e"] - 500000.0) < 1e-6
    # meridian arc from equator to 52° is ~5,763 km (within 10 km sanity)
    assert abs(r["n"] - 5763343) < 10000

    # southern hemisphere: false northing 10,000,000
    df = spark.createDataFrame([(0, -33.9, -70.7)], "row_id long, lat double, lon double")
    r = reproject(georef(df, coords=["lat", "lon"]), "EPSG:32719").df.select(
        F.col("geometry")["y"].alias("n")
    ).collect()[0]
    assert 0 < r["n"] < 10000000


def test_lcc_roundtrip_and_invariants(spark):
    pts = [(48.85, 2.35), (43.6, 1.44), (50.6, 3.06), (44.8, -0.58)]
    assert _roundtrip_err(spark, "EPSG:2154", pts) < 1e-9  # Lambert-93
    pts_us = [(39.0, -96.0), (34.0, -118.0), (41.0, -74.0)]
    assert _roundtrip_err(spark, "ESRI:102004", pts_us) < 1e-9

    # invariant: the natural origin (lat0=46.5, lon0=3) of Lambert-93 maps
    # to exactly (FE, FN) = (700000, 6600000)
    df = spark.createDataFrame([(0, 46.5, 3.0)], "row_id long, lat double, lon double")
    r = reproject(georef(df, coords=["lat", "lon"]), "EPSG:2154").df.select(
        F.col("geometry")["x"].alias("e"), F.col("geometry")["y"].alias("n")
    ).collect()[0]
    assert abs(r["e"] - 700000.0) < 1e-6 and abs(r["n"] - 6600000.0) < 1e-6

    # parametric spelling builds the same projection
    assert (
        _roundtrip_err(spark, "LCC:49,44,46.5,3,700000,6600000", pts) < 1e-9
    )


def test_projection_chain_webmercator_utm(spark):
    # hub-and-spoke: WebMercator → UTM without an explicit pair entry
    pts = [(51.5, -0.12), (48.2, -4.5)]
    df = spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(pts)], "row_id long, lat double, lon double"
    )
    wm = reproject(georef(df, coords=["lat", "lon"]), "EPSG:3857")
    utm = reproject(wm, "UTM:30N")
    back = reproject(utm, "EPSG:4326")
    got = {
        r["row_id"]: (r["y"], r["x"])
        for r in back.df.select(
            "row_id", F.col("geometry")["x"].alias("x"), F.col("geometry")["y"].alias("y")
        ).collect()
    }
    for i, (lat, lon) in enumerate(pts):
        assert abs(got[i][0] - lat) < 1e-8 and abs(got[i][1] - lon) < 1e-8


def test_geojoin_auto_reproject_epsg_codes(spark):
    """Right table georef'd under EPSG:3857 joins a LatLon polygon left:
    geojoin reprojects right→left automatically; per-tile counts must
    match a direct lon/lat tiling of the source rows (roundtrip error is
    ~1e-9 deg, far inside the 0.5° margin from every tile edge)."""
    import math as m

    from geotables_jl_spark.geom.model import st_box

    R = 6378137.0
    # points at tile centers of a 6x4 grid of 10° tiles over [-30,30)x[-20,20)
    rows = [
        (i, -30.0 + 10.0 * (i % 6) + 5.0 + 0.3 * (i % 3), -20.0 + 10.0 * (i % 4) + 5.0)
        for i in range(200)
    ]  # (id, lon, lat)
    mrows = [
        (i, 1, lon * R * m.pi / 180.0, m.log(m.tan(m.pi / 4 + m.radians(lat) / 2)) * R)
        for i, lon, lat in rows
    ]
    right = georef(
        spark.createDataFrame(mrows, "row_id long, one int, mx double, my double"),
        coords=["mx", "my"],
        crs="EPSG:3857",
    )
    assert right.crs == "WebMercator"

    tiles = [
        (ti, tj, -30.0 + 10.0 * ti, -20.0 + 10.0 * tj) for ti in range(6) for tj in range(4)
    ]
    tdf = spark.createDataFrame(
        [(ti * 4 + tj, ti, tj, x0, y0) for ti, tj, x0, y0 in tiles],
        "row_id long, ti int, tj int, x0 double, y0 double",
    )
    left = georef(
        tdf.withColumn(
            "geometry",
            st_box(F.col("x0"), F.col("y0"), F.col("x0") + 10.0, F.col("y0") + 10.0),
        ).drop("x0", "y0"),
        crs="EPSG:4326",
    )
    assert left.crs == "LatLon"

    out = geojoin(left, right, aggs={"one": "count"}, kind="left")
    got = {(r["ti"], r["tj"]): r["one"] for r in out.df.collect()}
    from collections import Counter

    want = Counter((int((lon + 30) // 10), int((lat + 20) // 10)) for _, lon, lat in rows)
    for ti in range(6):
        for tj in range(4):
            assert got[(ti, tj)] == want.get((ti, tj)), (ti, tj, got[(ti, tj)], want.get((ti, tj)))


def test_polar_stereographic_roundtrip_and_invariants(spark):
    """Polar Stereographic variant B (EPSG 9829): EPSG:3413/3976/3031
    NSIDC/Antarctic grids + parametric PS: spelling."""
    pts_n = [(85.0, 10.0), (75.0, -120.0), (70.0, -45.0), (60.1, 179.5)]
    assert _roundtrip_err(spark, "EPSG:3413", pts_n) < 1e-9
    pts_s = [(-85.0, 30.0), (-71.0, 0.0), (-60.0, -170.0), (-89.9, 12.0)]
    assert _roundtrip_err(spark, "EPSG:3031", pts_s) < 1e-9
    assert _roundtrip_err(spark, "EPSG:3976", pts_s) < 1e-9
    assert _roundtrip_err(spark, "PS:70,-45,0,0", pts_n) < 1e-9

    def project(crs, lat, lon):
        df = spark.createDataFrame([(0, lat, lon)], "row_id long, lat double, lon double")
        r = reproject(georef(df, coords=["lat", "lon"]), crs).df.select(
            F.col("geometry")["x"].alias("e"), F.col("geometry")["y"].alias("n")
        ).collect()[0]
        return r["e"], r["n"]

    # the pole maps to exactly (FE, FN) = (0, 0), any longitude
    for lon in (0.0, 33.0, -170.0):
        e, n = project("EPSG:3413", 90.0, lon)
        assert abs(e) < 1e-6 and abs(n) < 1e-6
        e, n = project("EPSG:3031", -90.0, lon)
        assert abs(e) < 1e-6 and abs(n) < 1e-6

    # orientation: on the central meridian (lon0=-45 for 3413) easting
    # is 0 and northing negative (grid north points along lon0)
    e, n = project("EPSG:3413", 70.0, -45.0)
    assert abs(e) < 1e-6 and n < 0

    # scale is TRUE at the standard parallel: the projected length of a
    # small arc along 70°N equals its ellipsoidal parallel length
    # a·m(70°)·dλ (independent recomputation of m here)
    a, e2 = 6378137.0, 0.00669437999014132
    phi = math.radians(70.0)
    m_ts = math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)
    dlam = math.radians(0.01)
    e1, n1 = project("EPSG:3413", 70.0, -45.0)
    e2_, n2 = project("EPSG:3413", 70.0, -45.0 + 0.01)
    proj_len = math.hypot(e2_ - e1, n2 - n1)
    true_len = a * m_ts * dlam
    assert abs(proj_len / true_len - 1.0) < 1e-6


def test_canonical_ps_codes():
    assert canonical_crs("EPSG:3413") == "EPSG:3413"
    assert canonical_crs("epsg:3031") == "EPSG:3031"
    with pytest.raises(ValueError):
        parse_crs("PS:70,-45,0")  # needs 4 params
