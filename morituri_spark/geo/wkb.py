"""G1: WKB geometry bridge (SURVEY.md §2.7).

The reference validates WKB as its interchange format between OGR and GEOS
(/root/reference/plugins/ogr_util.hpp:36-80, golden hex in
tests/unit_test_util.cpp:154-176). This engine's native geometry is nested
double arrays; this module is the bridge to/from ISO WKB so results can
interoperate with GeoParquet / Iceberg geometry columns and PostGIS.

Pure ``struct``/NumPy — no GDAL/GEOS dependency. Little-endian (NDR) on
write, exactly like the reference's ``exportToWkb(wkbNDR, ...)``; both byte
orders accepted on read. Supported types: Point (1), LineString (2),
Polygon (3), MultiPolygon (6) — the shapes the reference round-trips.

Spark surface: Arrow-batched pandas UDFs. These run on the GEOMETRY side of
pipelines (zones, boundaries, way output) — dimension-sized by this
engine's design — so the per-row Python cost never touches the fact table.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType

_NDR = b"\x01"
T_POINT, T_LINESTRING, T_POLYGON, T_MULTIPOLYGON = 1, 2, 3, 6


def _coords_le(coords) -> np.ndarray:
    a = np.asarray(coords)
    if a.dtype == object:  # Arrow delivers nested arrays object-dtype
        a = np.stack([np.asarray(p, dtype=np.float64) for p in a])
    return a.astype("<f8", copy=False).reshape(-1, 2)


def encode_point(xy) -> bytes:
    return _NDR + struct.pack("<I", T_POINT) + _coords_le([xy]).tobytes()


def encode_linestring(coords) -> bytes:
    a = _coords_le(coords)
    return _NDR + struct.pack("<II", T_LINESTRING, len(a)) + a.tobytes()


def encode_polygon(rings) -> bytes:
    out = [_NDR, struct.pack("<II", T_POLYGON, len(rings))]
    for r in rings:
        a = _coords_le(r)
        out.append(struct.pack("<I", len(a)) + a.tobytes())
    return b"".join(out)


def encode_multipolygon(polygons) -> bytes:
    """``polygons``: list of ring-lists (each ring-list: exterior first)."""
    out = [_NDR, struct.pack("<II", T_MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        out.append(encode_polygon(rings))
    return b"".join(out)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = memoryview(buf)
        self.pos = 0

    def order(self) -> str:
        b = self.buf[self.pos]
        self.pos += 1
        if b == 1:
            return "<"
        if b == 0:
            return ">"
        raise ValueError(f"invalid WKB byte order {b}")

    def u32(self, bo: str) -> int:
        (v,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self, bo: str, n: int) -> list[list[float]]:
        vals = struct.unpack_from(f"{bo}{2 * n}d", self.buf, self.pos)
        self.pos += 16 * n
        return [[vals[2 * i], vals[2 * i + 1]] for i in range(n)]


def decode(buf: bytes):
    """→ (geom_type, payload): Point → [x,y]; LineString → coords;
    Polygon → rings; MultiPolygon → list of ring-lists."""
    r = _Reader(bytes(buf))
    return _decode_one(r)


def _decode_one(r: _Reader):
    bo = r.order()
    t = r.u32(bo)
    if t == T_POINT:
        return T_POINT, r.coords(bo, 1)[0]
    if t == T_LINESTRING:
        return T_LINESTRING, r.coords(bo, r.u32(bo))
    if t == T_POLYGON:
        return T_POLYGON, [r.coords(bo, r.u32(bo)) for _ in range(r.u32(bo))]
    if t == T_MULTIPOLYGON:
        out = []
        for _ in range(r.u32(bo)):
            t2, rings = _decode_one(r)
            if t2 != T_POLYGON:
                raise ValueError("MultiPolygon member is not a Polygon")
            out.append(rings)
        return T_MULTIPOLYGON, out
    raise ValueError(f"unsupported WKB geometry type {t}")


def wkb_to_rings(buf: bytes) -> list:
    """Polygon/MultiPolygon WKB → the engine's flat rings array (every ring
    of every member polygon; roles are recoverable via
    operators.admin.ring_roles containment parity)."""
    t, payload = decode(buf)
    if t == T_POLYGON:
        return payload
    if t == T_MULTIPOLYGON:
        return [ring for rings in payload for ring in rings]
    raise ValueError(f"expected (Multi)Polygon WKB, got type {t}")


# ---------------------------------------------------------------------------
# Spark surface (DataType objects: importable without an active session)
# ---------------------------------------------------------------------------

_COORDS = ArrayType(ArrayType(DoubleType()))
_RINGS = ArrayType(_COORDS)


@F.pandas_udf(BinaryType())
def linestring_to_wkb_udf(geometry: pd.Series) -> pd.Series:
    return geometry.map(lambda c: None if c is None else encode_linestring(c))


@F.pandas_udf(BinaryType())
def rings_to_wkb_udf(rings: pd.Series) -> pd.Series:
    """Engine rings → Polygon WKB (single exterior assumed by the caller;
    use multipolygon_to_wkb_udf when rings may hold several exteriors)."""
    return rings.map(lambda r: None if r is None else encode_polygon(r))


@F.pandas_udf(BinaryType())
def multipolygon_to_wkb_udf(rings: pd.Series) -> pd.Series:
    """Engine flat rings → MultiPolygon WKB, grouping holes under their
    exterior by containment parity (operators.admin.ring_roles)."""
    from ..operators.admin import ring_roles
    from .pip import points_in_ring_np, ring_np

    def build(rl):
        if rl is None:
            return None
        roles = ring_roles(rl)
        ext_idx = [i for i, outer in enumerate(roles) if outer]
        ext_np = {j: ring_np(rl[j]) for j in ext_idx}
        # nesting depth of each exterior = how many OTHER exteriors contain
        # its first vertex (island-in-lake-in-country nesting)
        depth = {}
        for j in ext_idx:
            px, py = np.asarray([ext_np[j][0, 0]]), np.asarray([ext_np[j][0, 1]])
            depth[j] = sum(
                1 for o in ext_idx
                if o != j and points_in_ring_np(px, py, ext_np[o])[0]
            )
        polys = {i: [rl[i]] for i in ext_idx}
        for i, outer in enumerate(roles):
            if outer:
                continue
            r = ring_np(rl[i])
            px, py = np.asarray([r[0, 0]]), np.asarray([r[0, 1]])
            # attach to the DEEPEST containing exterior: with nested
            # geometries a hole's vertex is inside every enclosing exterior;
            # the immediate parent is the one with maximal nesting depth
            containing = [
                j for j in ext_idx if points_in_ring_np(px, py, ext_np[j])[0]
            ]
            if containing:
                polys[max(containing, key=lambda j: depth[j])].append(rl[i])
        return encode_multipolygon([polys[i] for i in ext_idx])

    return rings.map(build)


@F.pandas_udf(_RINGS)
def wkb_to_rings_udf(buf: pd.Series) -> pd.Series:
    return buf.map(lambda b: None if b is None else wkb_to_rings(b))


@F.pandas_udf(_COORDS)
def wkb_to_linestring_udf(buf: pd.Series) -> pd.Series:
    def dec(b):
        if b is None:
            return None
        t, payload = decode(b)
        if t != T_LINESTRING:
            raise ValueError(f"expected LineString WKB, got type {t}")
        return payload

    return buf.map(dec)
