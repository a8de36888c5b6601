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


#: marching-squares lookup (public algorithm, Lorensen-style 2D variant):
#: corner k of block (bx, by) is cell (bx + k%2, by + k//2); bit k set when
#: that cell's value >= threshold. Edge midpoints: B=(.5,0) R=(1,.5)
#: T=(.5,1) L=(0,.5). Ambiguous saddles (cases 6 and 9) take the
#: DISCONNECTED default (no center sample exists on a cell grid); the
#: choice is part of the operator contract and the oracle replays it.
MS_SEGMENTS = [
    (1, 0, 0.0, 0.5, 0.5, 0.0),   # L-B
    (2, 0, 0.5, 0.0, 1.0, 0.5),   # B-R
    (3, 0, 0.0, 0.5, 1.0, 0.5),   # L-R
    (4, 0, 0.0, 0.5, 0.5, 1.0),   # L-T
    (5, 0, 0.5, 0.0, 0.5, 1.0),   # B-T
    (6, 0, 0.0, 0.5, 0.5, 1.0),   # L-T   (saddle, disconnected default)
    (6, 1, 0.5, 0.0, 1.0, 0.5),   # B-R
    (7, 0, 1.0, 0.5, 0.5, 1.0),   # R-T
    (8, 0, 1.0, 0.5, 0.5, 1.0),   # R-T
    (9, 0, 0.0, 0.5, 0.5, 0.0),   # L-B   (saddle, disconnected default)
    (9, 1, 1.0, 0.5, 0.5, 1.0),   # R-T
    (10, 0, 0.5, 0.0, 0.5, 1.0),  # B-T
    (11, 0, 0.0, 0.5, 0.5, 1.0),  # L-T
    (12, 0, 0.0, 0.5, 1.0, 0.5),  # L-R
    (13, 0, 0.5, 0.0, 1.0, 0.5),  # B-R
    (14, 0, 0.0, 0.5, 0.5, 0.0),  # L-B
]


def contour_segments(
    cells: DataFrame,
    threshold: float,
    x_col: str = "ix",
    y_col: str = "iy",
    val_col: str = "n_points",
) -> DataFrame:
    """Marching-squares iso-contour of a cell grid at ``val_col >=
    threshold``: one segment row per (block, seg_idx) — (bx, by,
    case_idx, seg_idx, x1, y1, x2, y2) in CELL units (block corner at
    integer coordinates, crossings at edge midpoints — all values exact
    dyadic rationals, so the output is bit-stable across engines).

    Scale shape — pure Catalyst end to end: each occupied cell explodes
    to the 4 blocks it corners (literal-offset explode over the CELL
    relation, which is grid-bounded, never point-bounded), one
    map-side-combinable sum builds the 4-bit case index, and the segment
    lookup is a broadcast join against an 18-row literal table. Absent
    neighbors contribute bit 0 exactly like present cells below the
    threshold, so only blocks touching at least one occupied cell ever
    materialize; full-inside (15) and full-outside (0) blocks emit
    nothing.
    """
    spark = cells.sparkSession
    corners = cells.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col(x_col) - F.lit(dx)).alias("bx"),
                        (F.col(y_col) - F.lit(dy)).alias("by"),
                        F.when(
                            F.col(val_col) >= F.lit(threshold),
                            F.lit(1 << (dx + 2 * dy)),
                        ).otherwise(F.lit(0)).alias("bit"),
                    )
                    for dx in (0, 1)
                    for dy in (0, 1)
                ]
            )
        ).alias("_c")
    ).select("_c.bx", "_c.by", "_c.bit")
    blocks = (
        corners.groupBy("bx", "by")
        .agg(F.sum("bit").cast("int").alias("case_idx"))
        .where((F.col("case_idx") > 0) & (F.col("case_idx") < 15))
    )
    lut = spark.createDataFrame(
        MS_SEGMENTS, "case_idx int, seg_idx int, ox1 double, oy1 double, ox2 double, oy2 double"
    )
    return blocks.join(F.broadcast(lut), "case_idx").select(
        "bx", "by", "case_idx", "seg_idx",
        (F.col("bx") + F.col("ox1")).alias("x1"),
        (F.col("by") + F.col("oy1")).alias("y1"),
        (F.col("bx") + F.col("ox2")).alias("x2"),
        (F.col("by") + F.col("oy2")).alias("y2"),
    )
