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
) -> None:
    """Write ``df`` cell-partitioned + Z-order-clustered.

    ``res_part`` controls directory fan-out (4 → ≤256 coarse cells over the
    globe; keep ≤6 so the partition count stays object-store-friendly),
    ``res_sort`` the row-group clustering granularity. ``n_files`` bounds
    the shuffle width (defaults to the session shuffle partitions); each
    task writes one sorted file per coarse cell it holds, so row-group
    zorder stats are monotone within every file.
    """
    out = (
        df.withColumn("zorder", zorder_col(F.col(lon), F.col(lat), res_sort))
        .withColumn("cell_p", cells.cell_col(F.col(lon), F.col(lat), res_part))
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
        [(res_part, res_sort, lon, lat)], "res_part int, res_sort int, lon string, lat string"
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
) -> DataFrame:
    """Exact bbox read through both pruning layers + refine filter.

    Layout parameters default to the ``_layout_meta`` sidecar written by
    :func:`write_spatial`.
    """
    if None in (res_part, res_sort, lon, lat):
        meta = read_layout_meta(spark, path)
        res_part = res_part if res_part is not None else int(meta["res_part"])
        res_sort = res_sort if res_sort is not None else int(meta["res_sort"])
        lon = lon or meta["lon"]
        lat = lat or meta["lat"]
    cover = [int(c) for c in cells.cover_bbox(lon_min, lat_min, lon_max, lat_max, res_part)]
    zmin, zmax = morton_range(lon_min, lat_min, lon_max, lat_max, res_sort)
    df = spark.read.parquet(path)
    return df.where(
        F.col("cell_p").isin(cover)
        & F.col("zorder").between(F.lit(zmin), F.lit(zmax))
        & F.col(lon).between(F.lit(float(lon_min)), F.lit(float(lon_max)))
        & F.col(lat).between(F.lit(float(lat_min)), F.lit(float(lat_max)))
    )


def prune_stats(path: str, zmin: int, zmax: int) -> dict:
    """Row-group-level evidence that the zorder clustering prunes: walks the
    parquet footers (local paths; at scale the engine relies on the scan's
    own stats filtering rather than this audit) and counts row groups whose
    [min, max] zorder overlaps the query range."""
    import os

    import pyarrow.parquet as pq

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
                if st is None or (st.min <= zmax and st.max >= zmin):
                    kept += 1
                    rows_kept += md.row_group(rg).num_rows
    return {
        "row_groups_total": total,
        "row_groups_overlapping": kept,
        "rows_total": rows_total,
        "rows_in_overlapping_groups": rows_kept,
    }
