"""Spatially-clustered parquet layout: Z-order keys + doubly-pruned bbox reads.

At 100 TB the dominant cost of every spatial query is the scan, and the
scan's cost is set at WRITE time by data layout. This module is the
Spark-native replacement for the reference's per-dataset file organisation
(comm2osm.cpp:49-81 drives one output per input region): instead of
region-files, points are written

  * partitioned by coarse parent cell (``cell_p`` directory column) —
    Spark's partition pruning skips whole directories for a bbox query;
  * sorted by fine-resolution Morton (Z-order) code within files — parquet
    row-group min/max stats on one long column let the reader skip row
    groups inside the surviving files.

A bbox read then stacks three filters, broadest first:

  1. ``cell_p IN cover_bbox(bbox, res_part)``   — directory pruning
  2. ``zorder BETWEEN z(min corner), z(max corner)`` — row-group pruning
     (valid superset range: spread() preserves bit order, so the Morton
     code is monotone in x and in y — every cell inside the box codes
     between the two corner codes; a BIGMIN/LITMAX walk would tighten the
     range further but is not needed for correctness)
  3. exact ``lon/lat BETWEEN`` refine — the result is exact, never
     approximate, regardless of how coarse the pruning layers are.

All key math is pure Catalyst bit arithmetic (whole-stage codegen; the
classic 5-stage bit-spread), with NumPy mirrors for tests and for computing
the corner codes on the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from morituri_spark.geo import cells

_MASK29 = (1 << 29) - 1
_X_SHIFT = 29

# 64-bit even-bit spread masks (classic Morton interleave, 5 stages)
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


# ---------------------------------------------------------------------------
# NumPy mirrors (driver-side corner codes + test oracle)
# ---------------------------------------------------------------------------

def spread_bits(v):
    """Spread the low 29 bits of ``v`` onto even bit positions (vectorized)."""
    v = np.asarray(v, dtype=np.int64)
    for sh, mask in _SPREAD:
        v = (v | (v << sh)) & mask
    return v


def zorder_np(lon, lat, res: int):
    """Morton code of the ``res``-resolution cell containing (lon, lat)."""
    cell = cells.latlng_to_cell(lon, lat, res)
    x = (cell >> _X_SHIFT) & _MASK29
    y = cell & _MASK29
    return spread_bits(x) | (spread_bits(y) << 1)


def morton_range(lon_min, lat_min, lon_max, lat_max, res: int):
    """Inclusive [zmin, zmax] bound covering every res-cell in the bbox."""
    zmin = int(zorder_np(np.array([lon_min]), np.array([lat_min]), res)[0])
    zmax = int(zorder_np(np.array([lon_max]), np.array([lat_max]), res)[0])
    return zmin, zmax


def _interleave2(x: int, y: int) -> int:
    return int(spread_bits(np.array([x]))[0]) | (int(spread_bits(np.array([y]))[0]) << 1)


def morton_ranges(lon_min, lat_min, lon_max, lat_max, res: int, max_ranges: int = 32):
    """Quadtree-split Z-ranges covering the bbox (tight BIGMIN-style pruning).

    The single corner-to-corner range is a valid bound but mostly dead
    space for wide boxes (the Z-curve leaves and re-enters the box). An
    axis-aligned quad at depth d maps to ONE contiguous z-interval of
    length 4^(res-d), so covering the bbox with ≤``max_ranges`` quads and
    merging adjacent intervals yields a small OR-of-BETWEENs that parquet
    row-group stats can prune against. Quads that still straddle the
    boundary when the budget runs out are emitted whole — every returned
    set is a superset of the exact cell range, never a subset.
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
    frontier = [(0, 0, 0)]  # (depth, qx, qy); quad side = 2^(res - depth) cells
    while frontier:
        partials = []
        for depth, qx, qy in frontier:
            s = res - depth
            cx0, cy0 = qx << s, qy << s
            cx1, cy1 = cx0 + (1 << s) - 1, cy0 + (1 << s) - 1
            if cx1 < x0 or cx0 > x1 or cy1 < y0 or cy0 > y1:
                continue
            if cx0 >= x0 and cx1 <= x1 and cy0 >= y0 and cy1 <= y1:
                z0 = _interleave2(cx0, cy0)
                intervals.append((z0, z0 + (1 << (2 * s)) - 1))
            else:
                partials.append((depth, qx, qy))
        if not partials:
            break
        if len(intervals) + 4 * len(partials) > max_ranges or partials[0][0] == res:
            for depth, qx, qy in partials:  # out of budget: emit whole quads
                s = res - depth
                z0 = _interleave2(qx << s, qy << s)
                intervals.append((z0, z0 + (1 << (2 * s)) - 1))
            break
        frontier = [
            (d + 1, qx * 2 + dx, qy * 2 + dy)
            for d, qx, qy in partials
            for dy in (0, 1)
            for dx in (0, 1)
        ]
    # clip to the corner bound (also a valid superset — the intersection of
    # two supersets is one): budget-exhausted whole quads overhang it
    zmin, zmax = _interleave2(x0, y0), _interleave2(x1, y1)
    intervals = [
        (max(lo, zmin), min(hi, zmax)) for lo, hi in intervals if hi >= zmin and lo <= zmax
    ]
    intervals.sort()
    merged = [intervals[0]]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


# ---------------------------------------------------------------------------
# Catalyst forms (pure bit math — stays inside whole-stage codegen)
# ---------------------------------------------------------------------------

def spread_bits_col(col):
    """Catalyst twin of :func:`spread_bits` (5 shift-or-mask stages)."""
    for sh, mask in _SPREAD:
        col = col.bitwiseOR(F.shiftleft(col, sh)).bitwiseAND(F.lit(mask))
    return col


def zorder_from_cell(cell_col):
    """Morton code from a cell-id column (strips the res bits)."""
    x = F.shiftright(cell_col.bitwiseAND(F.lit(_MASK29 << _X_SHIFT)), _X_SHIFT)
    y = cell_col.bitwiseAND(F.lit(_MASK29))
    return spread_bits_col(x).bitwiseOR(F.shiftleft(spread_bits_col(y), 1))


def zorder_col(lon_col, lat_col, res: int):
    """Morton code straight from lon/lat columns at ``res``."""
    return zorder_from_cell(cells.cell_col(lon_col, lat_col, res))


# ---------------------------------------------------------------------------
# Layout write / read
# ---------------------------------------------------------------------------

def write_spatial(
    df: DataFrame,
    path: str,
    res_part: int = 4,
    res_sort: int = 14,
    lon: str = "lon",
    lat: str = "lat",
    n_files: int | None = None,
    mode: str = "overwrite",
    parquet_options: dict | None = None,
    curve: str = "z",
) -> None:
    """Write ``df`` cell-partitioned + space-filling-key-clustered.

    ``res_part`` controls directory fan-out (4 → ≤256 coarse cells over the
    globe; keep ≤6 so the partition count stays object-store-friendly),
    ``res_sort`` the row-group clustering granularity. ``n_files`` bounds
    the shuffle width (defaults to the session shuffle partitions); each
    task writes one sorted file per coarse cell it holds, so row-group
    zorder stats are monotone within every file.

    ``curve`` picks the key: ``"z"`` (Morton, the default) or
    ``"hilbert"`` (io/hilbert.py — no-jump locality, fewer/tighter read
    intervals). The physical column is named ``zorder`` for either curve
    so every downstream read/prune path is curve-agnostic; the sidecar
    meta records which curve planned the keys and the readers dispatch
    range planning on it.
    """
    if curve == "hilbert":
        from morituri_spark.io.hilbert import with_hilbert

        keyed = with_hilbert(df, lon, lat, res_sort, out="zorder")
    elif curve == "z":
        keyed = df.withColumn(
            "zorder", zorder_col(F.col(lon), F.col(lat), res_sort)
        )
    else:
        raise ValueError(f"unknown curve {curve!r} (use 'z' or 'hilbert')")
    out = keyed.withColumn(
        "cell_p", cells.cell_col(F.col(lon), F.col(lat), res_part)
    )
    n = n_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    writer = (
        out.repartition(n, "cell_p")
        .sortWithinPartitions("cell_p", "zorder")
        .write.mode(mode)
        .partitionBy("cell_p")
    )
    for k, v in (parquet_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)
    meta = df.sparkSession.createDataFrame(
        [(res_part, res_sort, lon, lat, curve)],
        "res_part int, res_sort int, lon string, lat string, curve string",
    )
    meta.coalesce(1).write.mode("overwrite").json(path.rstrip("/") + "_layout_meta")


def read_layout_meta(spark: SparkSession, path: str) -> dict:
    row = spark.read.json(path.rstrip("/") + "_layout_meta").head()
    return row.asDict()


def read_bbox(
    spark: SparkSession,
    path: str,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    res_part: int | None = None,
    res_sort: int | None = None,
    lon: str | None = None,
    lat: str | None = None,
    max_ranges: int = 32,
    curve: str | None = None,
) -> DataFrame:
    """Exact bbox read through both pruning layers + refine filter.

    Layout parameters (including the space-filling curve) default to the
    ``_layout_meta`` sidecar written by :func:`write_spatial`. The zorder
    predicate is an OR of the quadtree-split :func:`morton_ranges` (or
    hilbert.hilbert_ranges for a Hilbert layout — parquet pushes
    disjunctions of range filters down to row-group stats either way).
    """
    if None in (res_part, res_sort, lon, lat):
        meta = read_layout_meta(spark, path)
        res_part = res_part if res_part is not None else int(meta["res_part"])
        res_sort = res_sort if res_sort is not None else int(meta["res_sort"])
        lon = lon or meta["lon"]
        lat = lat or meta["lat"]
        curve = curve or meta.get("curve") or "z"
    elif curve is None:
        # all layout params explicit: the caller may be pointing at bare
        # Morton-keyed parquet with no sidecar (pre-curve writes, external
        # controls) — consult the meta only if it exists, else Morton.
        # write_spatial always writes the sidecar, so a Hilbert layout can
        # never silently take this branch.
        try:
            curve = read_layout_meta(spark, path).get("curve") or "z"
        except Exception:
            curve = "z"
    cover = [int(c) for c in cells.cover_bbox(lon_min, lat_min, lon_max, lat_max, res_part)]
    if curve == "hilbert":
        from morituri_spark.io.hilbert import hilbert_ranges

        ranges = hilbert_ranges(
            lon_min, lat_min, lon_max, lat_max, res_sort, max_ranges=max_ranges
        )
    else:
        ranges = morton_ranges(lon_min, lat_min, lon_max, lat_max, res_sort, max_ranges=max_ranges)
    zpred = None
    for zlo, zhi in ranges:
        p = F.col("zorder").between(F.lit(zlo), F.lit(zhi))
        zpred = p if zpred is None else (zpred | p)
    df = spark.read.parquet(path)
    return df.where(
        F.col("cell_p").isin(cover)
        & zpred
        & F.col(lon).between(F.lit(float(lon_min)), F.lit(float(lon_max)))
        & F.col(lat).between(F.lit(float(lat_min)), F.lit(float(lat_max)))
    )


def cell_z_interval(cell: int, res_sort: int) -> tuple[int, int]:
    """The contiguous [z0, z1] interval of ``res_sort`` Morton codes whose
    points fall inside ``cell`` (any resolution ≤ res_sort): an aligned
    quad maps to exactly one Z-interval of length 4^(res_sort - res)."""
    r = int(cells.cell_res(cell))
    if r > res_sort:
        raise ValueError(f"cell res {r} exceeds layout sort res {res_sort}")
    s = res_sort - r
    x = (cell >> _X_SHIFT) & _MASK29
    y = cell & _MASK29
    z0 = _interleave2(x << s, y << s)
    return z0, z0 + (1 << (2 * s)) - 1


def read_cells(
    spark: SparkSession,
    path: str,
    cell_ids,
    res_part: int | None = None,
    res_sort: int | None = None,
    curve: str | None = None,
) -> DataFrame:
    """EXACT read of the points inside a set of cells (kNN ring/disk
    neighborhoods, polygon covers from :func:`cells.polygon_cover`).

    Unlike :func:`read_bbox` no refine filter is needed: an aligned quad's
    key interval contains precisely its descendant codes (true for Morton
    AND Hilbert — both fill subtrees depth-first), so interval membership
    IS cell membership at ``res_sort`` granularity. Intervals are merged
    before planning (adjacent ring cells collapse), and the directory
    layer prunes on each cell's ``res_part`` ancestor.
    """
    if None in (res_part, res_sort, curve):
        meta = read_layout_meta(spark, path)
        res_part = res_part if res_part is not None else int(meta["res_part"])
        res_sort = res_sort if res_sort is not None else int(meta["res_sort"])
        curve = curve or meta.get("curve") or "z"
    if curve == "hilbert":
        from morituri_spark.io.hilbert import cell_h_interval as _interval
    else:
        _interval = cell_z_interval
    cell_ids = [int(c) for c in cell_ids]
    parents: set[int] = set()
    for c in cell_ids:
        r = int(cells.cell_res(c))
        if r >= res_part:
            parents.add(int(cells.cell_to_parent(c, res_part)))
        else:  # coarser than the partition layer: expand to descendants
            d = res_part - r
            x = (c >> _X_SHIFT) & _MASK29
            y = c & _MASK29
            for i in range(1 << d):
                for j in range(1 << d):
                    parents.add(int(cells.pack_cell(res_part, (x << d) + i, (y << d) + j)))
    parents = sorted(parents)
    intervals = sorted(_interval(c, res_sort) for c in cell_ids)
    merged = [intervals[0]]
    for lo, hi in intervals[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    zpred = None
    for zlo, zhi in merged:
        p = F.col("zorder").between(F.lit(zlo), F.lit(zhi))
        zpred = p if zpred is None else (zpred | p)
    return spark.read.parquet(path).where(F.col("cell_p").isin(parents) & zpred)


def read_polygon(
    spark: SparkSession,
    path: str,
    rings,
    res_cover: int = 8,
    res_part: int | None = None,
    res_sort: int | None = None,
) -> DataFrame:
    """Exact read of the points inside a polygon through the layout: the
    polygon's cell cover (:func:`cells.polygon_cover` at ``res_cover``)
    prunes the scan via :func:`read_cells`, then the candidate slice runs
    the real ray-cast refine (geo.pip planner on a single literal zone) —
    the layout-backed form of the engine's spatial join.
    """
    from morituri_spark.geo import pip

    cover = cells.polygon_cover(rings, res_cover)
    cand = read_cells(spark, path, cover, res_part=res_part, res_sort=res_sort)
    zone = spark.createDataFrame(
        [(0, [[[float(x), float(y)] for x, y in ring] for ring in rings])],
        "zone_id long, rings array<array<array<double>>>",
    )
    return pip.assign_zones(cand, zone, res=res_cover).drop("zone_id")


def compact_spatial(
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    n_files: int | None = None,
) -> str:
    """Rewrite a spatial layout with bounded file count (small-file
    compaction — incremental appends at 100 TB accrete many small sorted
    files per coarse cell; row-group stats stay effective but per-file
    open/list overhead grows). Reads the layout, re-sorts, rewrites with
    the same meta. In-place (default) writes a sibling then swaps via
    rename — a brief unavailability window; at scale the swap is a catalog
    pointer flip (Iceberg-style snapshot commit), never a filesystem
    rename."""
    import os
    import shutil

    meta = read_layout_meta(spark, path)
    inplace = out_path is None
    dest = path.rstrip("/") + "__compact" if inplace else out_path
    df = spark.read.parquet(path).drop("zorder", "cell_p")
    write_spatial(
        df, dest,
        res_part=int(meta["res_part"]), res_sort=int(meta["res_sort"]),
        lon=meta["lon"], lat=meta["lat"], n_files=n_files,
        curve=meta.get("curve") or "z",
    )
    if inplace:
        shutil.rmtree(path)
        os.rename(dest, path)
        shutil.rmtree(path.rstrip("/") + "_layout_meta", ignore_errors=True)
        os.rename(dest.rstrip("/") + "_layout_meta", path.rstrip("/") + "_layout_meta")
        return path
    return dest


def prune_stats(path: str, ranges) -> dict:
    """Row-group-level evidence that the zorder clustering prunes: walks the
    parquet footers (local paths; at scale the engine relies on the scan's
    own stats filtering rather than this audit) and counts row groups whose
    [min, max] zorder overlaps any query range. ``ranges`` is a (zmin, zmax)
    pair or a list of them (the :func:`morton_ranges` output)."""
    import os

    import pyarrow.parquet as pq

    if ranges and isinstance(ranges[0], (int, np.integer)):
        ranges = [tuple(ranges)]
    total = kept = 0
    rows_total = rows_kept = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fname)).metadata
            zidx = md.schema.to_arrow_schema().names.index("zorder")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(zidx).statistics
                total += 1
                rows_total += md.row_group(rg).num_rows
                if st is None or any(st.min <= zhi and st.max >= zlo for zlo, zhi in ranges):
                    kept += 1
                    rows_kept += md.row_group(rg).num_rows
    return {
        "row_groups_total": total,
        "row_groups_overlapping": kept,
        "rows_total": rows_total,
        "rows_in_overlapping_groups": rows_kept,
    }
