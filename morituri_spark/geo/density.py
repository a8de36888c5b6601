"""Grid density surface — point binning + separable 3x3 smoothing.

The 100-TB heatmap primitive: bin points to an integer lon/lat grid with
ONE map-side-combinable aggregate (cardinality collapses from points to
occupied cells at the first exchange), then smooth on the CELL relation
only — a 9-way literal-offset explode plus a second small aggregate.
The smoothing kernel is the integer binomial [[1,2,1],[2,4,2],[1,2,1]]/16
(the separable 3x3 Gaussian approximation), so every weight is an exact
dyadic rational and the surface is bit-stable across engines.

Scale shape: points never shuffle more than once; the explode runs over
occupied cells (bounded by grid size, not data size), so at 10^12 points
on a 1e7-cell grid the second stage is ~1e8 rows regardless of input
volume. Pure Catalyst — no Python, full whole-stage codegen.

Reference scope note: no counterpart in morituri (its raster side stops
at tile rollups); this extends the tile/zonal family (geo/cells.py,
multimodal zonal stats) with the density-surface case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (dx, dy, weight) of the binomial 3x3 kernel; weights sum to 16.
KERNEL_3X3 = [
    (-1, -1, 1), (0, -1, 2), (1, -1, 1),
    (-1, 0, 2), (0, 0, 4), (1, 0, 2),
    (-1, 1, 1), (0, 1, 2), (1, 1, 1),
]


def bin_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
) -> DataFrame:
    """(ix, iy, n_points): ONE map-side-combinable aggregate collapsing
    points to occupied integer grid cells — the shared first stage of
    the density surface, hotspot z-scores, and grid clustering."""
    # divide, don't multiply by a reciprocal: lon/cell and lon*(1/cell)
    # differ in the last ulp at exact cell boundaries (e.g. -180/15), and
    # floor() amplifies that ulp into an off-by-one cell vs the oracle.
    cell = F.lit(float(cell_deg))
    return (
        df.select(
            F.floor(F.col(lon) / cell).cast("long").alias("ix"),
            F.floor(F.col(lat) / cell).cast("long").alias("iy"),
        )
        .groupBy("ix", "iy")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def cell_density(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
    smooth: bool = True,
) -> DataFrame:
    """(ix, iy, n_points, density): ``n_points`` is the raw bin count of
    the cell itself (0 for halo cells that only receive smoothed mass);
    ``density`` the 3x3-binomial-smoothed count, rounded half-up to 4 dp.
    With ``smooth=False`` density equals the raw count and no halo rows
    appear."""
    binned = bin_cells(df, lon, lat, cell_deg)
    if not smooth:
        return binned.select(
            "ix", "iy", "n_points",
            F.col("n_points").cast("double").alias("density"),
        )
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                F.lit(w).alias("w"),
            )
            for dx, dy, w in KERNEL_3X3
        ]
    )
    spread = binned.select(
        "ix", "iy", "n_points", F.explode(offsets).alias("o")
    ).select(
        (F.col("ix") + F.col("o.dx")).alias("ix"),
        (F.col("iy") + F.col("o.dy")).alias("iy"),
        # raw count contributes only through the center tap
        F.when(
            (F.col("o.dx") == 0) & (F.col("o.dy") == 0), F.col("n_points")
        ).otherwise(F.lit(0)).alias("_self"),
        (F.col("n_points") * F.col("o.w")).alias("_mass"),
    )
    return (
        spread.groupBy("ix", "iy")
        .agg(
            F.sum("_self").alias("n_points"),
            F.round(F.sum("_mass") / F.lit(16.0), 4).alias("density"),
        )
        .select("ix", "iy", "n_points", "density")
    )
