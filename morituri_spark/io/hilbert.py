"""Hilbert-curve keys: the locality upgrade to the Morton z-order layout.

The Z-curve (io/layout.py) jumps across the map every time it exhausts a
quadrant, so a bbox cover needs many disjoint key intervals and parquet
row-group stats keep rows the query never wanted. The Hilbert curve
visits every cell of a quadrant before leaving it AND enters each child
adjacent to where it left the previous one — no jumps — so adjacent
quadtree quads merge into fewer, tighter intervals and each surviving
row group carries a higher fraction of true hits. Same machinery
otherwise: an axis-aligned depth-k quad still maps to ONE contiguous key
interval of length 4^(res-k) (the curve fills subtrees depth-first), so
the quadtree bbox cover, the cell→interval mapping, and the layout
read/write paths carry over from layout.py with only the key function
swapped (``write_spatial(..., curve="hilbert")``).

Key math is the classic per-bit quadrant walk (Wikipedia "Hilbert curve",
xy2d): consume (x, y) bits most-significant first; at each level the
Gray-coded quadrant index ``q = (3·rx) xor ry`` contributes two key bits,
then the frame reflects/transposes for the next level. The reflection
``n-1-x`` is a pure low-bit complement (``x xor (2^res - 1)``), so every
step is shift/and/xor — no trig, no division.

Spark form: ONE STAGED PROJECTION PER BIT (CLAUDE.md rule 9 — the step
references x and y multiple times, so inlining would grow the expression
tree ~3^res; multiply-referenced aliases keep CollapseProject from
merging the stages, and each stage is a trivial codegen method). The
NumPy mirror computes driver-side quad bases for range planning and is
the test oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from morituri_spark.geo import cells

_MASK29 = (1 << 29) - 1
_X_SHIFT = 29


# ---------------------------------------------------------------------------
# NumPy mirror (driver-side quad bases + test oracle)
# ---------------------------------------------------------------------------

def hilbert_xy(x, y, res: int):
    """Vectorized xy→d Hilbert index over ``res``-bit grid coordinates."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    n1 = np.int64((1 << res) - 1)
    d = np.zeros_like(x)
    for bit in range(res - 1, -1, -1):
        rx = (x >> bit) & 1
        ry = (y >> bit) & 1
        d += ((3 * rx) ^ ry) << (2 * bit)
        # frame rotation: ry==0 → (reflect if rx==1, then swap axes)
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, x ^ n1, x)
        y_f = np.where(flip, y ^ n1, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
    return d


def hilbert_np(lon, lat, res: int):
    """Hilbert index of the ``res``-resolution cell containing (lon, lat)."""
    cell = cells.latlng_to_cell(lon, lat, res)
    return hilbert_xy((cell >> _X_SHIFT) & _MASK29, cell & _MASK29, res)


# ---------------------------------------------------------------------------
# Catalyst form — staged per-bit projections
# ---------------------------------------------------------------------------

def with_hilbert(
    df: DataFrame, lon: str, lat: str, res: int, out: str = "hkey"
) -> DataFrame:
    """Append column ``out`` with the res-bit Hilbert key of (lon, lat).

    Emits ``res`` staged projections (one per bit — see module docstring);
    every stage is pure shift/and/xor inside whole-stage codegen. Key order
    matches :func:`hilbert_np` exactly (shared bit walk, shared floor
    encode via geo.cells), so driver-planned ranges prune correctly.
    """
    if not 1 <= res <= 29:
        raise ValueError(f"hilbert res {res} out of range [1, 29]")
    n1 = (1 << res) - 1
    cell = cells.cell_col(F.col(lon), F.col(lat), res)
    df = df.select(
        "*",
        F.shiftright(cell, _X_SHIFT).bitwiseAND(F.lit(_MASK29)).alias("_hx"),
        cell.bitwiseAND(F.lit(_MASK29)).alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for bit in range(res - 1, -1, -1):
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.shiftright(x, bit).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, bit).bitwiseAND(F.lit(1))
        q = (rx * F.lit(3)).bitwiseXOR(ry)
        x_f = F.when(ry == 1, x).otherwise(
            F.when(rx == 1, y.bitwiseXOR(F.lit(n1))).otherwise(y)
        )
        y_f = F.when(ry == 1, y).otherwise(
            F.when(rx == 1, x.bitwiseXOR(F.lit(n1))).otherwise(x)
        )
        df = df.select(
            *[c for c in df.columns if c not in ("_hx", "_hy", "_hd")],
            x_f.alias("_hx"),
            y_f.alias("_hy"),
            (d + F.shiftleft(q.cast("long"), 2 * bit)).alias("_hd"),
        )
    return df.withColumnRenamed("_hd", out).drop("_hx", "_hy")


# ---------------------------------------------------------------------------
# Range planning (quadtree bbox cover; quad → one contiguous interval)
# ---------------------------------------------------------------------------

def _quad_base(qx: int, qy: int, depth: int, res: int) -> int:
    """Start of the contiguous Hilbert interval of an aligned quad: the
    index of any inner cell with the low 2(res-depth) bits cleared."""
    s = res - depth
    h = int(hilbert_xy(np.array([qx << s]), np.array([qy << s]), res)[0])
    return h & ~((1 << (2 * s)) - 1)


def cell_h_interval(cell: int, res_sort: int) -> tuple[int, int]:
    """Hilbert twin of layout.cell_z_interval — the [h0, h1] interval of
    ``res_sort`` keys whose points fall inside ``cell``."""
    r = int(cells.cell_res(cell))
    if r > res_sort:
        raise ValueError(f"cell res {r} exceeds layout sort res {res_sort}")
    x = (cell >> _X_SHIFT) & _MASK29
    y = cell & _MASK29
    h0 = _quad_base(x, y, r, res_sort)
    return h0, h0 + (1 << (2 * (res_sort - r))) - 1


def hilbert_ranges(
    lon_min, lat_min, lon_max, lat_max, res: int, max_ranges: int = 32
):
    """Quadtree-split Hilbert intervals covering the bbox — same descent
    and budget policy as layout.morton_ranges, but the curve's no-jump
    adjacency makes neighboring quads merge into fewer surviving
    intervals (measured in tests/test_hilbert.py). No corner clip: the
    Hilbert index is not monotone in x or y, so there is no single
    corner-to-corner bound — the quad cover IS the bound. Every returned
    set is a superset of the exact cell set; reads stay exact through the
    lon/lat refine filter.
    """
    if lon_min > lon_max or lat_min > lat_max:
        raise ValueError(
            "bbox min must be <= max on both axes (antimeridian-crossing "
            "boxes: split into two reads at ±180)"
        )
    c0 = int(cells.latlng_to_cell(np.array([lon_min]), np.array([lat_min]), res)[0])
    c1 = int(cells.latlng_to_cell(np.array([lon_max]), np.array([lat_max]), res)[0])
    x0, y0 = (c0 >> _X_SHIFT) & _MASK29, c0 & _MASK29
    x1, y1 = (c1 >> _X_SHIFT) & _MASK29, c1 & _MASK29

    intervals: list[tuple[int, int]] = []
    frontier = [(0, 0, 0)]  # (depth, qx, qy)
    while frontier:
        partials = []
        for depth, qx, qy in frontier:
            s = res - depth
            cx0, cy0 = qx << s, qy << s
            cx1, cy1 = cx0 + (1 << s) - 1, cy0 + (1 << s) - 1
            if cx1 < x0 or cx0 > x1 or cy1 < y0 or cy0 > y1:
                continue
            if cx0 >= x0 and cx1 <= x1 and cy0 >= y0 and cy1 <= y1:
                h0 = _quad_base(qx, qy, depth, res)
                intervals.append((h0, h0 + (1 << (2 * s)) - 1))
            else:
                partials.append((depth, qx, qy))
        if not partials:
            break
        if len(intervals) + 4 * len(partials) > max_ranges or partials[0][0] == res:
            for depth, qx, qy in partials:  # out of budget: emit whole quads
                s = res - depth
                h0 = _quad_base(qx, qy, depth, res)
                intervals.append((h0, h0 + (1 << (2 * s)) - 1))
            break
        frontier = [
            (d + 1, qx * 2 + dx, qy * 2 + dy)
            for d, qx, qy in partials
            for dy in (0, 1)
            for dx in (0, 1)
        ]
    intervals.sort()
    merged = [intervals[0]]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
