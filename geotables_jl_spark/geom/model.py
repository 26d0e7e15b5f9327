"""Geometry column model.

The reference (GeoTables.jl) stores geometries as Meshes.jl objects zipped
positionally with the attribute table (``src/geotable.jl:34-37``). Here a
geometry is one nullable struct column so that every row is
``(attributes..., geometry)`` exactly like the reference's Tables.jl row
view (``src/api/tables.jl:41-55``):

    geometry: struct<
        kind:   int        -- 1=point, 3=polygon, 4=multipoint, 5=multipolygon
        x, y:   double     -- point coordinates (kind=1 only)
        rings:  array<array<double>>  -- flat [x0,y0,x1,y1,...] per ring/part
        xmin, ymin, xmax, ymax: double -- envelope, ALWAYS populated
    >

The envelope lives inside the struct so the cell-cover / bbox-prefilter
stages of the spatial join are pure JVM column expressions (no Python).
Exact predicates (winding-number point-in-polygon etc.) run over Arrow
batches in ``geom/kernel.py``.

Polygon rings are stored open (first vertex not repeated), outer ring =
rings[0]; multipolygon = one outer ring per part (holes: later phase).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

KIND_POINT = 1
KIND_POLYGON = 3
KIND_MULTIPOINT = 4
KIND_MULTIPOLYGON = 5

GEOMETRY_TYPE = T.StructType(
    [
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("rings", T.ArrayType(T.ArrayType(T.DoubleType())), True),
        T.StructField("xmin", T.DoubleType(), False),
        T.StructField("ymin", T.DoubleType(), False),
        T.StructField("xmax", T.DoubleType(), False),
        T.StructField("ymax", T.DoubleType(), False),
    ]
)

_D = T.DoubleType()


def st_point(x: Column | float, y: Column | float) -> Column:
    """Point geometry from column expressions (JVM-side, no UDF).

    Mirrors the point builder of reference ``src/georef.jl:160-176``.
    """
    xc = x if isinstance(x, Column) else F.lit(float(x))
    yc = y if isinstance(y, Column) else F.lit(float(y))
    xc = xc.cast(_D)
    yc = yc.cast(_D)
    null_rings = F.lit(None).cast(T.ArrayType(T.ArrayType(_D)))
    return F.struct(
        F.lit(KIND_POINT).alias("kind"),
        xc.alias("x"),
        yc.alias("y"),
        null_rings.alias("rings"),
        xc.alias("xmin"),
        yc.alias("ymin"),
        xc.alias("xmax"),
        yc.alias("ymax"),
    )


def _ring_envelope(flat: list[float]) -> tuple[float, float, float, float]:
    xs = flat[0::2]
    ys = flat[1::2]
    return min(xs), min(ys), max(xs), max(ys)


def _signed_area(flat: list[float]) -> float:
    xs = flat[0::2]
    ys = flat[1::2]
    n = len(xs)
    return sum(xs[i] * ys[(i + 1) % n] - xs[(i + 1) % n] * ys[i] for i in range(n)) / 2.0


def _oriented(flat: list[float], ccw: bool) -> list[float]:
    """Normalize ring orientation: outer rings CCW, holes CW — the
    convention that lets Multi (kind=5) flattened rings keep their
    outer/hole identity by orientation alone (``geom/kernel.split_rings``)."""
    if (_signed_area(flat) >= 0.0) == ccw:
        return flat
    pairs = list(zip(flat[0::2], flat[1::2]))[::-1]
    return [c for xy in pairs for c in xy]


def st_polygon_lit(
    vertices: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> Column:
    """Literal polygon geometry from driver-side vertex lists: outer ring
    + optional holes (reference ``PolyArea(outer, holes...)`` with inner
    rings). rings[0] = outer (normalized CCW), rings[1:] = holes
    (normalized CW); envelope from the outer ring."""
    flat = _oriented([float(c) for xy in vertices for c in xy], ccw=True)
    xmin, ymin, xmax, ymax = _ring_envelope(flat)
    ring_cols = [F.array(*[F.lit(v) for v in flat])]
    for h in holes or []:
        hf = _oriented([float(c) for xy in h for c in xy], ccw=False)
        ring_cols.append(F.array(*[F.lit(v) for v in hf]))
    return F.struct(
        F.lit(KIND_POLYGON).alias("kind"),
        F.lit(None).cast(_D).alias("x"),
        F.lit(None).cast(_D).alias("y"),
        F.array(*ring_cols).alias("rings"),
        F.lit(xmin).alias("xmin"),
        F.lit(ymin).alias("ymin"),
        F.lit(xmax).alias("xmax"),
        F.lit(ymax).alias("ymax"),
    )


def st_box(xmin: Column | float, ymin: Column | float, xmax: Column | float, ymax: Column | float) -> Column:
    """Axis-aligned box as a polygon geometry, from column expressions.

    Used by the lazy grid relation (reference ``CartesianGrid`` cells are
    generated on demand, ``src/georef.jl:120-129``): the cell polygon is a
    *generator expression* over the cell id — no geometry is materialized
    until this column is evaluated.
    """
    x0 = (xmin if isinstance(xmin, Column) else F.lit(float(xmin))).cast(_D)
    y0 = (ymin if isinstance(ymin, Column) else F.lit(float(ymin))).cast(_D)
    x1 = (xmax if isinstance(xmax, Column) else F.lit(float(xmax))).cast(_D)
    y1 = (ymax if isinstance(ymax, Column) else F.lit(float(ymax))).cast(_D)
    ring = F.array(x0, y0, x1, y0, x1, y1, x0, y1)
    return F.struct(
        F.lit(KIND_POLYGON).alias("kind"),
        F.lit(None).cast(_D).alias("x"),
        F.lit(None).cast(_D).alias("y"),
        F.array(ring).alias("rings"),
        x0.alias("xmin"),
        y0.alias("ymin"),
        x1.alias("xmax"),
        y1.alias("ymax"),
    )


def geom_rows_from_polygons(
    polys: list[list[tuple[float, float]]],
    holes: list[list[list[tuple[float, float]]]] | None = None,
) -> list[dict]:
    """Driver-side helper: polygon vertex lists (+ optional per-polygon
    hole lists) -> geometry dicts for ``spark.createDataFrame`` fixtures."""
    rows = []
    for pi, verts in enumerate(polys):
        flat = _oriented([float(c) for xy in verts for c in xy], ccw=True)
        xmin, ymin, xmax, ymax = _ring_envelope(flat)
        rings = [flat]
        for h in (holes[pi] if holes else []) or []:
            rings.append(_oriented([float(c) for xy in h for c in xy], ccw=False))
        rows.append(
            {
                "kind": KIND_POLYGON,
                "x": None,
                "y": None,
                "rings": rings,
                "xmin": xmin,
                "ymin": ymin,
                "xmax": xmax,
                "ymax": ymax,
            }
        )
    return rows


def point_row(x: float, y: float) -> dict:
    return {
        "kind": KIND_POINT,
        "x": float(x),
        "y": float(y),
        "rings": None,
        "xmin": float(x),
        "ymin": float(y),
        "xmax": float(x),
        "ymax": float(y),
    }
