"""Raster terrain stencils — Horn slope/aspect over a DEM grid.

The raster-DSP member of the geo family (density.py bins, contour.py
traces isolines — this differentiates): given a DEM as (ix, iy, z)
grid cells, compute per interior cell the Horn 3×3 finite-difference
gradient and from it slope and aspect — the standard terrain derivative
(Horn 1981, the ArcGIS/GDAL default).

    gx = (z[E·NE·SE weighted 2·1·1] − z[W·NW·SW weighted 2·1·1]) / (8·cell)
    gy = (z[N row] − z[S row]) / (8·cell)            (same 1·2·1 weights)
    slope  = atan(sqrt(gx² + gy²))
    aspect = atan2(gy, −gx)

Spark-first shape: a 3×3 stencil is NOT eight self-joins — each cell
SCATTERS its z to its nine neighbors with the Horn weights (one
closed-form explode of the offset kernel), and one map-side-combinable
aggregate per target cell folds the weighted sums. ONE shuffle keyed by
cell, integer weighted sums are exact, and interior cells are exactly
those receiving nine contributions (no edge-padding branch). At 10¹²
cells this is the same shape as the tile rollup: shuffle volume 9×grid,
all pre-combined map-side.

Cross-engine exactness: gx/gy numerators are exact integers; slope and
aspect are each ONE shared double expression quantized to micro-degrees
(rule 16).

Reference scope: no counterpart in morituri; raster family extension
(the brief's raster↔vector tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Horn kernel: (dx, dy, weight in gx numerator, weight in gy numerator)
#: — the contribution of the cell at offset (dx, dy) FROM the target,
#: i.e. the scatter direction is (−dx, −dy).
_HORN = [
    (1, -1, 1, -1), (1, 0, 2, 0), (1, 1, 1, 1),
    (0, -1, 0, -2), (0, 0, 0, 0), (0, 1, 0, 2),
    (-1, -1, -1, -1), (-1, 0, -2, 0), (-1, 1, -1, 1),
]


def slope_aspect(
    dem: DataFrame,
    cell_size: float,
    ix_col: str = "ix",
    iy_col: str = "iy",
    z_col: str = "z",
) -> DataFrame:
    """→ (ix, iy, gx_num, gy_num, slope_deg, aspect_deg) for every
    INTERIOR cell (all eight neighbors present). ``gx_num``/``gy_num``
    are the exact integer Horn numerators (east- and north-positive);
    slope/aspect are micro-degree-quantized doubles, aspect in
    [−180°, 180°] measured counter-clockwise from east (atan2(gy, −gx)
    convention), NULL (and gx=gy=0) on flats.
    """
    if cell_size <= 0:
        raise ValueError(f"cell_size must be > 0, got {cell_size}")
    kernel = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                F.lit(wx).alias("wx"), F.lit(wy).alias("wy"),
            )
            for dx, dy, wx, wy in _HORN
        ]
    )
    scattered = dem.select(
        F.col(ix_col).cast("long").alias("_x"),
        F.col(iy_col).cast("long").alias("_y"),
        F.col(z_col).cast("long").alias("_z"),
        F.explode(kernel).alias("_k"),
    ).select(
        (F.col("_x") - F.col("_k.dx")).alias("ix"),
        (F.col("_y") - F.col("_k.dy")).alias("iy"),
        (F.col("_z") * F.col("_k.wx")).alias("_gx"),
        (F.col("_z") * F.col("_k.wy")).alias("_gy"),
    )
    sums = scattered.groupBy("ix", "iy").agg(
        F.sum("_gx").alias("gx_num"),
        F.sum("_gy").alias("gy_num"),
        F.count(F.lit(1)).alias("_n"),
    )
    interior = sums.where(F.col("_n") == 9)
    denom = F.lit(8.0 * float(cell_size))
    gx = F.col("gx_num").cast("double") / denom
    gy = F.col("gy_num").cast("double") / denom
    deg = F.lit(180.0 / 3.141592653589793)
    staged = interior.select(
        "ix", "iy", "gx_num", "gy_num",
        (F.atan(F.sqrt(gx * gx + gy * gy)) * deg).alias("_slope"),
        F.when(
            (F.col("gx_num") == 0) & (F.col("gy_num") == 0), F.lit(None)
        ).otherwise(F.atan2(gy, -gx) * deg).alias("_aspect"),
    )
    q = lambda c: (  # noqa: E731 — shared micro-degree quantizer
        F.floor(c * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    )
    return staged.select(
        "ix", "iy", "gx_num", "gy_num",
        q(F.col("_slope")).alias("slope_deg"),
        q(F.col("_aspect")).alias("aspect_deg"),
    )
