"""Hierarchical geocell index (pure NumPy; H3/S2-style API).

SURVEY.md §2.7 G9: the target engine needs batched cell encoding of image
footprints, parent-cell shuffle keys, and ring expansion for kNN. Neither
``h3`` nor ``s2`` wheels exist in this container, so the engine ships its own
deterministic equirectangular quad-grid with the same API shape
(``latlng_to_cell``, ``cell_to_parent``, ``grid_disk``, ``grid_ring``) —
vectorized NumPy end-to-end, exposed to Spark as Arrow pandas UDFs.

Cell id layout (int64, always positive):
    bits 58..62  resolution r  (0..29)
    bits 29..57  x = floor((lon+180)/360 * 2^r)   (29 bits)
    bits  0..28  y = floor((lat+90)/180 * 2^r)    (29 bits)

Properties used by the join planner:
  * parent(cell, r') = shift x,y right by (r-r'): pure bit math, no trig —
    safe inside whole-stage codegen via ``shiftright``/``bitwise and`` too.
  * neighbors at a resolution are x±1 (mod 2^r, wrapping the antimeridian),
    y±1 clamped at the poles — ring expansion is closed-form.
  * ids sort by (r, x, y) so ``repartitionByRange`` on the id yields
    spatially coherent partitions (Hilbert/Z-order would be tighter; x-major
    is sufficient and cheaper).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

MAX_RES = 29
_RES_SHIFT = 58
_X_SHIFT = 29
_MASK29 = (1 << 29) - 1


def latlng_to_cell(lon, lat, res: int):
    """Vectorized encode. ``lon``/``lat`` array-like degrees → int64 ids."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range [0, {MAX_RES}]")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << res
    # Half-open cells [edge, next_edge); the +180/+90 shift keeps x,y >= 0.
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    # lon=180 / lat=90 land exactly on the upper edge — clamp into range.
    np.clip(x, 0, int(n) - 1, out=x)
    np.clip(y, 0, int(n) - 1, out=y)
    return (np.int64(res) << _RES_SHIFT) | (x << _X_SHIFT) | y


def cell_res(cell):
    return (np.asarray(cell, dtype=np.int64) >> _RES_SHIFT) & 0x1F


def cell_xy(cell):
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> _X_SHIFT) & _MASK29, cell & _MASK29


def pack_cell(res, x, y):
    return (
        (np.asarray(res, dtype=np.int64) << _RES_SHIFT)
        | (np.asarray(x, dtype=np.int64) << _X_SHIFT)
        | np.asarray(y, dtype=np.int64)
    )


def cell_to_parent(cell, parent_res: int):
    """Ancestor at coarser resolution — pure bit shifts."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell resolution")
    shift = res - parent_res
    x, y = cell_xy(cell)
    return pack_cell(parent_res, x >> shift, y >> shift)


def compact_cover(cells: np.ndarray, res_min: int = 0) -> np.ndarray:
    """Mixed-resolution compaction of a single-res cover: every complete
    4-sibling group merges into its parent, recursively down to
    ``res_min`` — the S2/H3 "compact covering" idea re-done on this
    engine's quad grid. The covered REGION is exactly preserved (4
    children ≡ parent) and the output cells stay pairwise disjoint, so a
    point still matches at most one cover cell.

    Scale regime (documented, not defaulted): cover row count drops from
    O(area·4^res) toward O(perimeter·2^res) — decisive when huge zones
    meet high res (country-scale at res ≥ 12: 10⁶-10⁸ rows/zone become
    10³-10⁵). The price is on the JOIN's point side, which must probe one
    ancestor cell per resolution LEVEL present in the compacted cover
    (×L point rows, L ≤ res − res_min + 1) — so compaction wins exactly
    when cover rows rival point rows, and the fixed-res cover stays right
    for dimension-sized zones (the engine default)."""
    cur = np.unique(np.asarray(cells, dtype=np.int64))
    if len(cur) == 0:
        return cur
    r = int(cell_res(cur[:1])[0])
    out = []
    while r > res_min and len(cur) >= 4:
        parents = cell_to_parent(cur, r - 1)
        uniq, counts = np.unique(parents, return_counts=True)
        full = set(uniq[counts == 4].tolist())
        if not full:
            break
        merged = np.fromiter((int(p) in full for p in parents), dtype=bool, count=len(parents))
        out.append(cur[~merged])
        cur = np.asarray(sorted(full), dtype=np.int64)
        r -= 1
    out.append(cur)
    return np.sort(np.concatenate(out))


def expand_cover(cells: np.ndarray, res: int) -> np.ndarray:
    """Inverse of :func:`compact_cover`: every cell expands to its full
    descendant set at ``res`` (test/oracle utility)."""
    cells = np.asarray(cells, dtype=np.int64)
    out = []
    for c in cells:
        r = int(cell_res([c])[0])
        if r > res:
            raise ValueError("cell finer than target res")
        shift = res - r
        x, y = cell_xy([c])
        xs = (int(x[0]) << shift) + np.arange(1 << shift, dtype=np.int64)
        ys = (int(y[0]) << shift) + np.arange(1 << shift, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        out.append(pack_cell(res, gx.ravel(), gy.ravel()))
    return np.sort(np.concatenate(out)) if out else cells


def cell_bounds(cell):
    """(lon_min, lat_min, lon_max, lat_max) arrays for each cell."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_res(cell)
    x, y = cell_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon_min = x / n * 360.0 - 180.0
    lat_min = y / n * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / n, lat_min + 180.0 / n


def cell_center(cell):
    lon0, lat0, lon1, lat1 = cell_bounds(cell)
    return (lon0 + lon1) / 2.0, (lat0 + lat1) / 2.0


def grid_ring(cell: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance k (square ring); k=0 → the cell.

    Wraps x across the antimeridian; clips y at the poles. Scalar ``cell``
    (used per-query in the kNN expansion loop, vectorized over queries at the
    pandas-batch level, see geo/knn.py).
    """
    cell = int(cell)
    res = int(cell_res(cell))
    n = 1 << res
    x, y = cell_xy(cell)
    x, y = int(x), int(y)
    if k == 0:
        return np.array([cell], dtype=np.int64)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            xs.append(x + dx)
            ys.append(y + dy)
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            xs.append(x + dx)
            ys.append(y + dy)
    xs = np.asarray(xs, dtype=np.int64) % n  # wrap lon
    ys = np.asarray(ys, dtype=np.int64)
    keep = (ys >= 0) & (ys < n)  # clip lat
    return np.unique(pack_cell(res, xs[keep], ys[keep]))


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k."""
    return np.unique(np.concatenate([grid_ring(cell, i) for i in range(k + 1)]))


def cover_bbox(lon_min, lat_min, lon_max, lat_max, res: int) -> np.ndarray:
    """All cells at ``res`` whose box intersects the bbox (a superset cover —
    the correctness requirement for a join prefilter)."""
    n = 1 << res
    x0 = int(np.floor((lon_min + 180.0) / 360.0 * n))
    x1 = int(np.floor((lon_max + 180.0) / 360.0 * n))
    y0 = int(np.floor((lat_min + 90.0) / 180.0 * n))
    y1 = int(np.floor((lat_max + 90.0) / 180.0 * n))
    x0, x1 = max(x0, 0), min(x1, n - 1)
    y0, y1 = max(y0, 0), min(y1, n - 1)
    if x1 < x0 or y1 < y0:
        return np.empty(0, dtype=np.int64)
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_cell(res, gx.ravel(), gy.ravel())


def polygon_cover(rings, res: int) -> np.ndarray:
    """Cells at ``res`` intersecting the (multi)polygon: the union of each
    ring's own cover. Any zone point lies inside SOME ring by even-odd
    parity, so the union is a correct superset no matter which rings are
    exteriors — this is what makes two-island MultiPolygon zones
    (navteq.hpp:787-797 wkbMultiPolygon dispatch) representable in the flat
    rings model. Hole rings sit inside their exterior, so they only add
    cells the exterior already covers; no role information is needed.
    """
    from .pip import ring_np

    covers = [_ring_cover(ring_np(r), res) for r in rings]
    return np.unique(np.concatenate(covers)) if covers else np.empty(0, dtype=np.int64)


def _ring_cover(ext: np.ndarray, res: int) -> np.ndarray:
    """Cells intersecting ONE ring's region (bbox cover refined by: vertex
    in cell box, cell center inside ring, or ring edge crossing the box —
    each test conservative, so the result is a superset)."""
    cells = cover_bbox(ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max(), res)
    if len(cells) <= 4:
        return cells
    lon0, lat0, lon1, lat1 = cell_bounds(cells)
    keep = np.zeros(len(cells), dtype=bool)
    # (a) some polygon vertex inside the cell box
    vx, vy = ext[:, 0], ext[:, 1]
    for i in range(len(cells)):
        if np.any((vx >= lon0[i]) & (vx < lon1[i]) & (vy >= lat0[i]) & (vy < lat1[i])):
            keep[i] = True
    # (b) cell center inside the polygon (covers cells fully interior)
    from .pip import points_in_ring_np

    cx, cy = (lon0 + lon1) / 2, (lat0 + lat1) / 2
    keep |= points_in_ring_np(cx, cy, ext)
    # (c) exact: any polygon edge intersects the cell box (Liang–Barsky clip,
    # vectorized over edges per remaining cell) — keeps boundary cells whose
    # overlap is edge-only (no vertex inside, center outside).
    dx = vx[1:] - vx[:-1]
    dy = vy[1:] - vy[:-1]
    for i in np.nonzero(~keep)[0]:
        t0 = np.zeros(len(dx))
        t1 = np.ones(len(dx))
        ok = np.ones(len(dx), dtype=bool)
        for p, q in (
            (-dx, vx[:-1] - lon0[i]),
            (dx, lon1[i] - vx[:-1]),
            (-dy, vy[:-1] - lat0[i]),
            (dy, lat1[i] - vy[:-1]),
        ):
            par = p == 0
            ok &= ~(par & (q < 0))  # parallel and outside
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(par, 0.0, q / np.where(p == 0, 1.0, p))
            t0 = np.where(~par & (p < 0), np.maximum(t0, r), t0)
            t1 = np.where(~par & (p > 0), np.minimum(t1, r), t1)
        if np.any(ok & (t0 <= t1)):
            keep[i] = True
    return cells[keep]


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def cell_col(lon_col, lat_col, res: int):
    """Catalyst-native cell id (identical to ``latlng_to_cell``): pure
    floor + integer math, stays inside whole-stage codegen — the preferred
    form in hot paths (the pandas UDF variant below exists for Arrow-kernel
    composition and API parity)."""
    n = float(1 << res)
    nmax = (1 << res) - 1
    x = F.least(
        F.greatest(F.floor((lon_col + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(nmax),
    )
    y = F.least(
        F.greatest(F.floor((lat_col + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(nmax),
    )
    return (
        F.lit(res).cast("long") * F.lit(1 << _RES_SHIFT)
        + x * F.lit(1 << _X_SHIFT)
        + y
    )


def quadkey_col(lon_col, lat_col, res: int):
    """Bing-style quadkey STRING of the grid cell (tile-interop key): one
    base-4 digit per level, most-significant first — digit i is
    ``x_bit + 2·y_bit`` at bit (res−i), so every prefix of length r IS the
    quadkey of the resolution-r parent tile. That prefix property makes
    pyramid rollups a ``substring`` groupBy and tile-subtree reads a
    ``LIKE 'prefix%'`` pushdown on a sorted column. Pure floor + bit math
    over the SAME exact x/y as :func:`cell_col` (no Web-Mercator trig —
    ln/tan last-ulp behavior differs between libm implementations and
    would flip boundary tiles between engines), whole-stage codegen."""
    if not 1 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range [1, {MAX_RES}]")
    n = float(1 << res)
    nmax = (1 << res) - 1
    x = F.least(
        F.greatest(F.floor((lon_col + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(nmax),
    )
    y = F.least(
        F.greatest(F.floor((lat_col + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(nmax),
    )
    digits = [
        F.char(
            F.lit(48)
            + F.shiftright(x, res - i).bitwiseAND(F.lit(1))
            + F.lit(2) * F.shiftright(y, res - i).bitwiseAND(F.lit(1))
        )
        for i in range(1, res + 1)
    ]
    return F.concat(*digits)


def quadkey_to_cell(qk):
    """Vectorized decode: quadkey strings → cell ids (res = len(qk))."""
    out = []
    for s in np.asarray(qk):
        s = str(s)
        x = y = 0
        for ch in s:
            d = ord(ch) - 48
            if not 0 <= d <= 3:
                raise ValueError(f"invalid quadkey digit {ch!r} in {s!r}")
            x = (x << 1) | (d & 1)
            y = (y << 1) | (d >> 1)
        out.append((np.int64(len(s)) << _RES_SHIFT) | (np.int64(x) << _X_SHIFT) | np.int64(y))
    return np.asarray(out, dtype=np.int64)


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(lon_col, lat_col, length: int):
    """Standard geohash STRING (tile-interop key, the base32 sibling of
    :func:`quadkey_col`): ``length`` base32 characters encoding the
    bit-interleaved (lon, lat) bisection path, longitude bit first — the
    exact public geohash.org scheme, so keys round-trip through every
    external geohash library. Like quadkey, every length-r PREFIX is the
    geohash of the containing res-r cell (floor composes across the
    power-of-two grids), so pyramid rollups are a ``substring`` groupBy
    and subtree reads a ``LIKE 'prefix%'`` pushdown. Pure floor + bit
    math (no trig), whole-stage codegen; the bisection counts are
    ``ceil(5·length/2)`` lon bits and ``floor(5·length/2)`` lat bits, and
    every engine computing ``(lon+180)/360·2^n`` in this literal order
    gets the identical IEEE double, so digits replay exactly in SQL."""
    if not 1 <= length <= 12:
        raise ValueError(f"geohash length {length} out of range [1, 12]")
    nbits = 5 * length
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    x = F.least(
        F.greatest(
            F.floor((lon_col + 180.0) / 360.0 * float(1 << nlon)).cast("long"),
            F.lit(0),
        ),
        F.lit((1 << nlon) - 1),
    )
    y = F.least(
        F.greatest(
            F.floor((lat_col + 90.0) / 180.0 * float(1 << nlat)).cast("long"),
            F.lit(0),
        ),
        F.lit((1 << nlat) - 1),
    )
    chars = []
    for c in range(length):
        v = F.lit(0)
        for j in range(5):
            t = 5 * c + j  # interleaved bit index, 0 = most significant
            if t % 2 == 0:
                bit = F.shiftright(x, nlon - 1 - t // 2).bitwiseAND(F.lit(1))
            else:
                bit = F.shiftright(y, nlat - 1 - (t - 1) // 2).bitwiseAND(
                    F.lit(1)
                )
            v = v + bit * F.lit(1 << (4 - j))
        chars.append(
            F.substring(F.lit(GEOHASH32), (v + F.lit(1)).cast("int"), F.lit(1))
        )
    return F.concat(*chars)


def geohash_decode_bbox(gh: str):
    """Pure-Python inverse (test reference): geohash → (lon_lo, lon_hi,
    lat_lo, lat_hi) bounding box of the cell."""
    bits = []
    for ch in gh:
        d = GEOHASH32.index(ch)
        bits.extend((d >> (4 - j)) & 1 for j in range(5))
    lon_bits = bits[0::2]
    lat_bits = bits[1::2]
    ix = 0
    for b in lon_bits:
        ix = (ix << 1) | b
    iy = 0
    for b in lat_bits:
        iy = (iy << 1) | b
    nlon, nlat = len(lon_bits), len(lat_bits)
    lon_lo = ix / (1 << nlon) * 360.0 - 180.0
    lat_lo = iy / (1 << nlat) * 180.0 - 90.0
    return (
        lon_lo,
        lon_lo + 360.0 / (1 << nlon),
        lat_lo,
        lat_lo + 180.0 / (1 << nlat),
    )


def cell_udf(res: int):
    """``F.pandas_udf`` computing cell ids from lon/lat columns at ``res``."""

    @F.pandas_udf(LongType())
    def _encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(latlng_to_cell(lon.to_numpy(), lat.to_numpy(), res))

    return _encode


def parent_col(cell_col, parent_res: int, res: int):
    """Catalyst-native parent cell (no Python): bit math on the id column.

    Stays inside whole-stage codegen — used as the range-partitioning key.
    """
    shift = res - parent_res
    x = F.shiftright(cell_col.bitwiseAND(F.lit(_MASK29 << _X_SHIFT)), _X_SHIFT + shift)
    y = F.shiftright(cell_col.bitwiseAND(F.lit(_MASK29)), shift)
    return (
        F.lit(parent_res).cast("long") * F.lit(1 << _RES_SHIFT)
        + F.shiftleft(x, _X_SHIFT)
        + y
    )


def with_cell(df, res: int, lon="lon", lat="lat", out="cell"):
    return df.withColumn(out, cell_udf(res)(F.col(lon), F.col(lat)))
