"""GeoParquet / WKB interop: standard-format ingest & egress.

The engine's internal geometry is a struct column (``geom/model.py``);
the interchange standard is WKB inside parquet (GeoParquet). This module
converts both ways as Arrow-batched passes (``mapInPandas``) — the ONLY
place WKB bytes are touched; every interior operator works on the struct.
Closes the SURVEY §1.5 schema promise (WKB payload interop).

Encoding (little-endian ISO WKB):
- kind 1 (point)        ↔ WKB Point (type 1)
- kind 3 (polygon)      ↔ WKB Polygon (type 3): ring 0 outer + holes,
  rings closed on write (first vertex repeated), re-opened on read
- kind 4 (multipoint)   ↔ WKB MultiPoint (type 4)
- kind 5 (multipolygon) ↔ WKB MultiPolygon (type 6): CCW ring starts a
  part, following CW rings are its holes (``geom/model._oriented``)

Scale shape: both directions are map-only (no shuffle); decode prunes to
the WKB column + pass-through attributes, so a 10^12-row GeoParquet scan
streams straight through the converter into the cell-join pipeline.
"""

from __future__ import annotations

import struct as _struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotables_jl_spark.core.geotable import GEOM, ROW_ID, GeoTable, georef
from geotables_jl_spark.geom.model import GEOMETRY_TYPE

_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTIPOLYGON = 6


# ---------------------------------------------------------------------------
# python-side codecs (per geometry; run inside Arrow batches)


def _close_ring(flat: list[float]) -> np.ndarray:
    a = np.asarray(flat, dtype="<f8")
    return np.concatenate([a, a[:2]])


def _encode_one(g: dict) -> bytes:
    kind = g["kind"]
    if kind == 1:
        return b"\x01" + _struct.pack("<I", _WKB_POINT) + _struct.pack("<dd", g["x"], g["y"])
    if kind == 3:
        rings = g["rings"]
        out = [b"\x01", _struct.pack("<I", _WKB_POLYGON), _struct.pack("<I", len(rings))]
        for r in rings:
            closed = _close_ring(r)
            out.append(_struct.pack("<I", len(closed) // 2))
            out.append(closed.tobytes())
        return b"".join(out)
    if kind == 4:
        flat = np.asarray(g["rings"][0], dtype="<f8")
        n = len(flat) // 2
        out = [b"\x01", _struct.pack("<I", _WKB_MULTIPOINT), _struct.pack("<I", n)]
        for i in range(n):
            out.append(b"\x01" + _struct.pack("<I", _WKB_POINT))
            out.append(flat[2 * i : 2 * i + 2].tobytes())
        return b"".join(out)
    if kind == 5:
        # orientation-grouped parts: CCW opens a part, CW rings are holes
        from geotables_jl_spark.geom.kernel import ring_signed_area

        parts: list[list] = []
        for r in g["rings"]:
            if ring_signed_area(np.asarray(r, dtype=np.float64)) >= 0 or not parts:
                parts.append([r])
            else:
                parts[-1].append(r)
        out = [b"\x01", _struct.pack("<I", _WKB_MULTIPOLYGON), _struct.pack("<I", len(parts))]
        for rings in parts:
            out.append(b"\x01" + _struct.pack("<I", _WKB_POLYGON))
            out.append(_struct.pack("<I", len(rings)))
            for r in rings:
                closed = _close_ring(r)
                out.append(_struct.pack("<I", len(closed) // 2))
                out.append(closed.tobytes())
        return b"".join(out)
    raise ValueError(f"unsupported geometry kind for WKB: {kind}")


def _rd_u32(buf: memoryview, off: int, le: bool) -> tuple[int, int]:
    return _struct.unpack_from("<I" if le else ">I", buf, off)[0], off + 4


def _decode_rings(buf: memoryview, off: int, le: bool) -> tuple[list[list[float]], int]:
    nrings, off = _rd_u32(buf, off, le)
    rings = []
    for _ in range(nrings):
        npts, off = _rd_u32(buf, off, le)
        flat = np.frombuffer(buf, dtype="<f8" if le else ">f8", count=2 * npts, offset=off)
        off += 16 * npts
        # drop the closing vertex (stored open internally)
        if npts > 1 and flat[0] == flat[-2] and flat[1] == flat[-1]:
            flat = flat[:-2]
        rings.append(flat.astype(np.float64).tolist())
    return rings, off


def _decode_one(wkb: bytes) -> dict:
    buf = memoryview(wkb)
    le = buf[0] == 1
    gtype, off = _rd_u32(buf, 1, le)
    gtype &= 0xFF  # mask EWKB/Z flags of other writers
    if gtype == _WKB_POINT:
        x, y = _struct.unpack_from("<dd" if le else ">dd", buf, off)
        return {"kind": 1, "x": x, "y": y, "rings": None,
                "xmin": x, "ymin": y, "xmax": x, "ymax": y}
    if gtype == _WKB_POLYGON:
        rings, _ = _decode_rings(buf, off, le)
        return _poly_dict(3, rings)
    if gtype == _WKB_MULTIPOINT:
        n, off = _rd_u32(buf, off, le)
        flat = []
        for _ in range(n):
            ple = buf[off] == 1
            _, off2 = _rd_u32(buf, off + 1, ple)
            x, y = _struct.unpack_from("<dd" if ple else ">dd", buf, off2)
            flat.extend((x, y))
            off = off2 + 16
        return _poly_dict(4, [flat])
    if gtype == _WKB_MULTIPOLYGON:
        n, off = _rd_u32(buf, off, le)
        rings = []
        for _ in range(n):
            ple = buf[off] == 1
            _, off2 = _rd_u32(buf, off + 1, ple)
            rr, off = _decode_rings(buf, off2, ple)
            rings.extend(rr)
        return _poly_dict(5, rings)
    raise ValueError(f"unsupported WKB geometry type: {gtype}")


def _poly_dict(kind: int, rings: list[list[float]]) -> dict:
    xs = np.concatenate([np.asarray(r[0::2]) for r in rings])
    ys = np.concatenate([np.asarray(r[1::2]) for r in rings])
    return {
        "kind": kind, "x": None, "y": None, "rings": rings,
        "xmin": float(xs.min()), "ymin": float(ys.min()),
        "xmax": float(xs.max()), "ymax": float(ys.max()),
    }


# ---------------------------------------------------------------------------
# DataFrame-level converters (Arrow-batched map passes)


def wkb_to_geometry(df: DataFrame, wkb_col: str = "wkb", drop: bool = True) -> DataFrame:
    """Decode a WKB binary column into the engine geometry struct."""
    fields = [f for f in df.schema.fields if not (drop and f.name == wkb_col)]
    out_schema = T.StructType(fields + [T.StructField(GEOM, GEOMETRY_TYPE)])
    keep = [f.name for f in fields]

    def _iter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            geoms = [_decode_one(b) for b in pdf[wkb_col]]
            out = pdf[keep].copy()
            out[GEOM] = geoms
            yield out

    return df.mapInPandas(_iter, schema=out_schema)


def geometry_to_wkb(df: DataFrame, out_col: str = "wkb", drop: bool = True) -> DataFrame:
    """Encode the engine geometry struct into a WKB binary column."""
    fields = [f for f in df.schema.fields if not (drop and f.name == GEOM)]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.BinaryType())])
    keep = [f.name for f in fields]

    def _iter(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            wkb = [_encode_one(g) for g in pdf[GEOM]]
            out = pdf[keep].copy()
            out[out_col] = wkb
            yield out

    return df.mapInPandas(_iter, schema=out_schema)


def read_geoparquet(
    spark: SparkSession, path: str, wkb_col: str = "geometry", crs: str | None = None
) -> GeoTable:
    """GeoParquet file(s) → GeoTable: parquet scan (pushdown/pruning
    apply to the attribute columns) + WKB decode map pass."""
    raw = spark.read.parquet(path)
    decoded = wkb_to_geometry(raw, wkb_col=wkb_col)
    return georef(decoded, crs=crs)


def write_geoparquet(gtb: GeoTable, path: str, mode: str = "overwrite") -> None:
    """GeoTable → parquet with a WKB ``geometry`` column (GeoParquet
    layout; readers treating ``geometry`` as WKB interoperate)."""
    out = geometry_to_wkb(gtb.df, out_col=GEOM)
    out.write.mode(mode).parquet(path)
