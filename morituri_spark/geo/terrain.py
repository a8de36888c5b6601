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

from pyspark.sql import DataFrame, Window, functions as F

from .knn import _Round

#: Horn kernel: (dx, dy, weight in gx numerator, weight in gy numerator)
#: — the contribution of the cell at offset (dx, dy) FROM the target,
#: i.e. the scatter direction is (−dx, −dy).
_HORN = [
    (1, -1, 1, -1), (1, 0, 2, 0), (1, 1, 1, 1),
    (0, -1, 0, -2), (0, 0, 0, 0), (0, 1, 0, 2),
    (-1, -1, -1, -1), (-1, 0, -2, 0), (-1, 1, -1, 1),
]


def _horn_numerators(
    dem: DataFrame, ix_col: str, iy_col: str, z_col: str
) -> DataFrame:
    """(ix, iy, gx_num, gy_num) for interior cells — the shared Horn
    scatter stage of :func:`slope_aspect` and :func:`hillshade`: each
    cell scatters its z to its nine neighbors with the kernel weights,
    ONE map-side-combinable aggregate folds the exact integer gradient
    numerators, and interior = exactly nine contributions received."""
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
    return sums.where(F.col("_n") == 9).drop("_n")


def box_filter(
    dem: DataFrame,
    radius: int = 1,
    keys: list[str] | None = None,
    ix_col: str = "ix",
    iy_col: str = "iy",
    z_col: str = "z",
) -> DataFrame:
    """Separable (2r+1)×(2r+1) box sums — the summed-area / smoothing
    primitive — as TWO Catalyst range-frame windows instead of a
    (2r+1)² neighbor self-join: first Σz over ix∈[−r, r] within each
    (keys, iy) row, then Σ of those over iy∈[−r, r] within each
    (keys, ix) column. → input columns + (box_sum, box_n), where box_n
    is the in-bounds cell count (borders clip — box_n < (2r+1)² there),
    so callers can form exact means as a rational pair.

    Exactness: integer z stays integer end to end; a SQL replay with
    the same two RANGE frames matches bit-for-bit (ties are impossible
    — the frame is keyed by the unique cell coordinate).

    Scale shape: no join, no explode — two windows whose running state
    is O(r) per partition; partitions are raster rows then columns
    (bounded by raster extent, never by total cell count), and a keyed
    multi-raster table parallelizes over keys × rows. The self-join
    formulation this replaces shuffles (2r+1)² candidate rows per cell;
    this shuffles each cell twice, independent of r.

    Missing cells are treated as ABSENT (sparse rasters sum what
    exists), not zero-filled — box_n reports the actual support.
    """
    r = int(radius)
    if r < 0:
        raise ValueError(f"radius must be >= 0, got {r}")
    ks = list(keys or [])
    w_row = (
        Window.partitionBy(*ks, iy_col).orderBy(ix_col).rangeBetween(-r, r)
    )
    h = dem.select(
        *ks, ix_col, iy_col, z_col,
        F.sum(z_col).over(w_row).alias("_h"),
        F.count(F.lit(1)).over(w_row).alias("_hn"),
    )
    w_col = (
        Window.partitionBy(*ks, ix_col).orderBy(iy_col).rangeBetween(-r, r)
    )
    return h.select(
        *ks, ix_col, iy_col, z_col,
        F.sum("_h").over(w_col).alias("box_sum"),
        F.sum("_hn").over(w_col).alias("box_n"),
    )


def ridge_visibility(
    dem: DataFrame,
    eye_height: int = 2,
    keys: list[str] | None = None,
    ix_col: str = "ix",
    iy_col: str = "iy",
    z_col: str = "z",
) -> DataFrame:
    """West-edge line-of-sight sweep — per raster row, which cells an
    observer standing at the row's x=0 cell (eye ``eye_height`` above
    the terrain) can see: cell x is visible iff its elevation angle
    strictly exceeds every angle at 0 < x' < x (the classic running-max
    visibility sweep under viewshed analysis and radio/solar exposure).

    Exactness: the angle is the FLOOR-QUANTIZED integer slope
    ``sq(x) = floor(((z − h) · 2²⁰) / x)`` with h = z(row, 0) +
    eye_height — a pinned contract both engines compute identically
    (the 2²⁰ scale makes quantization collisions need slope agreement
    within ~1e-6, and int/int division stays exact below 2^53, rule
    28). Visibility is then a pure integer comparison against ONE
    running-max window (rows −∞..−1) — no float, no tie ambiguity.

    → (keys…, iy, n_visible, chk_x) where chk_x = Σ ix over visible
    cells (membership-sensitive). The observer cell x=0 is not counted;
    rows with no x=0 cell are absent (no observer).

    Scale shape: one window + one partial-aggregable groupBy, zero
    joins; partitions are raster rows (× keys), the window state is one
    integer. The naive formulation is an O(width²) per-row self-join.
    """
    ks = list(keys or [])
    w_row = Window.partitionBy(*ks, iy_col)
    h = (
        F.max(F.when(F.col(ix_col) == 0, F.col(z_col))).over(w_row)
        + F.lit(int(eye_height))
    ).alias("_h")
    staged = dem.select(*ks, ix_col, iy_col, z_col, h).where(
        F.col("_h").isNotNull()
    )
    # stage the quantized slope as its own projection (rule 9)
    sq = F.when(
        F.col(ix_col) > 0,
        F.floor(
            ((F.col(z_col) - F.col("_h")) * F.lit(1 << 20)) / F.col(ix_col)
        ).cast("long"),
    )
    staged = staged.select(*ks, ix_col, iy_col, sq.alias("_sq"))
    w_run = (
        Window.partitionBy(*ks, iy_col)
        .orderBy(ix_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vis = (F.col(ix_col) > 0) & (
        F.max("_sq").over(w_run).isNull()
        | (F.col("_sq") > F.max("_sq").over(w_run))
    )
    marked = staged.select(*ks, ix_col, iy_col, vis.alias("_v"))
    return marked.groupBy(*ks, iy_col).agg(
        F.sum(F.col("_v").cast("long")).alias("n_visible"),
        F.sum(F.when(F.col("_v"), F.col(ix_col)).otherwise(F.lit(0))).alias(
            "chk_x"
        ),
    )


def cardinal_viewshed(
    dem: DataFrame,
    eye_height: int = 2,
    keys: list[str] | None = None,
    ix_col: str = "ix",
    iy_col: str = "iy",
    z_col: str = "z",
) -> DataFrame:
    """Per-cell 4-direction viewshed — from how many of the four grid
    edges (an observer at the W/E end of the cell's row and the N/S end
    of its column, eye ``eye_height`` above terrain) each cell is
    visible. The 2-D generalization of :func:`ridge_visibility`'s
    west-edge sweep, under the SAME pinned floor-quantized integer
    slope contract ``sq(d) = floor(((z − h) · 2²⁰) / d)`` (d = distance
    from the observer along the ray) — visibility per direction is a
    strict integer comparison against one running-max window.

    → (keys…, ix, iy, dir_mask, n_dirs) for every cell at positive
    distance from all four observers; ``dir_mask`` packs W=1, E=2, N=4,
    S=8. Cells in an observer's own row/column position (d = 0 for that
    direction) are simply not visible in that direction; rows/columns
    missing their edge cell yield no visibility in that direction.

    Scale shape: TWO exchanges total — all row-partitioned windows
    (W/E sweeps + the row-edge anchors) evaluate under the (keys, iy)
    hash, then all column work under (keys, ix). Four ordered windows,
    zero joins; window state is one integer each.
    """
    ks = list(keys or [])
    eh = F.lit(int(eye_height))
    w_row = Window.partitionBy(*ks, iy_col)
    w_col = Window.partitionBy(*ks, ix_col)

    def _sq(h_col: str, d):
        # staged quantized slope (rule 9); NULL at d <= 0 or no anchor
        return F.when(
            d > 0,
            F.floor(
                ((F.col(z_col) - F.col(h_col)) * F.lit(1 << 20)) / d
            ).cast("long"),
        )

    def _vis(sq_name: str, part_cols, order):
        w_run = (
            Window.partitionBy(*part_cols)
            .orderBy(order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        run = F.max(sq_name).over(w_run)
        return F.coalesce(
            F.col(sq_name).isNotNull()
            & (run.isNull() | (F.col(sq_name) > run)),
            F.lit(False),
        )

    # ---- row-partitioned stage: anchors + W/E sweeps --------------------
    # all three anchors are independent full-frame aggregates, so ONE
    # Window pass computes them (the east anchor "z at max ix" is
    # max_by(z, ix) — identical value to the old two-pass
    # max(when(ix == xmax, z)), coordinates are unique per row)
    s2 = dem.select(
        *ks,
        F.col(ix_col).cast("long").alias(ix_col),
        F.col(iy_col).cast("long").alias(iy_col),
        F.col(z_col).cast("long").alias(z_col),
        F.max(ix_col).over(w_row).alias("_xmax"),
        (F.max(F.when(F.col(ix_col) == 0, F.col(z_col))).over(w_row) + eh).alias("_hw"),
        (F.max_by(F.col(z_col), F.col(ix_col)).over(w_row) + eh).alias("_he"),
    )
    s3 = s2.select(
        *ks,
        ix_col,
        iy_col,
        z_col,
        "_xmax",
        _sq("_hw", F.col(ix_col)).alias("_sqw"),
        _sq("_he", F.col("_xmax") - F.col(ix_col)).alias("_sqe"),
    )
    s4 = s3.select(
        *ks,
        ix_col,
        iy_col,
        z_col,
        _vis("_sqw", [*ks, iy_col], F.col(ix_col).asc()).alias("_vw"),
        _vis("_sqe", [*ks, iy_col], F.col(ix_col).desc()).alias("_ve"),
    )
    # ---- column-partitioned stage: anchors + N/S sweeps ------------------
    # same single-pass anchor merge as the row stage
    s6 = s4.select(
        "*",
        F.max(iy_col).over(w_col).alias("_ymax"),
        (F.max(F.when(F.col(iy_col) == 0, F.col(z_col))).over(w_col) + eh).alias("_hn"),
        (F.max_by(F.col(z_col), F.col(iy_col)).over(w_col) + eh).alias("_hs"),
    )
    s7 = s6.select(
        *ks,
        ix_col,
        iy_col,
        "_vw",
        "_ve",
        "_ymax",
        _sq("_hn", F.col(iy_col)).alias("_sqn"),
        _sq("_hs", F.col("_ymax") - F.col(iy_col)).alias("_sqs"),
    )
    s8 = s7.select(
        *ks,
        ix_col,
        iy_col,
        "_vw",
        "_ve",
        _vis("_sqn", [*ks, ix_col], F.col(iy_col).asc()).alias("_vn"),
        _vis("_sqs", [*ks, ix_col], F.col(iy_col).desc()).alias("_vs"),
    )
    mask = (
        F.col("_vw").cast("long")
        + F.col("_ve").cast("long") * 2
        + F.col("_vn").cast("long") * 4
        + F.col("_vs").cast("long") * 8
    )
    staged = s8.select(*ks, ix_col, iy_col, mask.alias("dir_mask"))
    return staged.select(
        *ks,
        ix_col,
        iy_col,
        "dir_mask",
        (
            F.col("dir_mask").bitwiseAND(1)
            + F.shiftright("dir_mask", 1).bitwiseAND(1)
            + F.shiftright("dir_mask", 2).bitwiseAND(1)
            + F.shiftright("dir_mask", 3).bitwiseAND(1)
        ).alias("n_dirs"),
    )


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
    interior = _horn_numerators(dem, ix_col, iy_col, z_col)
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


def hillshade(
    dem: DataFrame,
    cell_size: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    ix_col: str = "ix",
    iy_col: str = "iy",
    z_col: str = "z",
) -> DataFrame:
    """→ (ix, iy, gx_num, gy_num, shade) for every interior cell: the
    standard analytic hillshade (GDAL/ArcGIS default light: azimuth 315°
    clockwise from north, altitude 45°) as the Lambert dot product of the
    Horn surface normal with the light vector,

        shade = round(255 · max(0, (lz − lx·gx − ly·gy) / √(1+gx²+gy²)))

    with L = (cos alt·sin az, cos alt·cos az, sin alt) in (east, north,
    up). Unlike slope/aspect there is NO runtime trig — L is three driver-
    side literals and the only transcendental is sqrt, which IEEE 754
    requires correctly rounded in every engine, so ``shade`` is an exact
    uint8 integer both engines reproduce bit-for-bit (the rounding is the
    shared rule-16 half-up). Same scatter/aggregate envelope as
    :func:`slope_aspect`: one shuffle, map-side combinable, exact integer
    numerators."""
    import math

    if cell_size <= 0:
        raise ValueError(f"cell_size must be > 0, got {cell_size}")
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    lx = math.cos(alt) * math.sin(az)
    ly = math.cos(alt) * math.cos(az)
    lz = math.sin(alt)
    interior = _horn_numerators(dem, ix_col, iy_col, z_col)
    denom = F.lit(8.0 * float(cell_size))
    gx = F.col("gx_num").cast("double") / denom
    gy = F.col("gy_num").cast("double") / denom
    raw = (F.lit(lz) - F.lit(lx) * gx - F.lit(ly) * gy) / F.sqrt(
        F.lit(1.0) + gx * gx + gy * gy
    )
    return interior.select(
        "ix", "iy", "gx_num", "gy_num",
        F.floor(
            F.lit(255.0) * F.greatest(raw, F.lit(0.0)) + F.lit(0.5) + F.lit(1e-8)
        ).cast("int").alias("shade"),
    )


# --- D8 hydrology (r5 tenth session) ----------------------------------------
#
# D8 (O'Callaghan & Mark 1984): every cell drains to the steepest-descent
# neighbor among the eight present in the grid; cells with no strictly lower
# weighted drop are sinks. The steepness proxy is the exact-integer weighted
# drop (z − z_nb)·w with w = 10 for cardinal and 7 for diagonal neighbors
# (7/10 ≈ 1/√2 — a documented integer convention, deterministic and
# replayable in ANSI SQL, rather than a float distance division).
#
# Spark-first shape: the naive argmax-over-neighbors needs each target's own
# z next to each neighbor's z — a self-join. Instead note that within one
# weight class the target's z and w are CONSTANT across candidates, so
# argmax((z − z_nb)·w) ⇔ argmin(z_nb): the whole direction choice collapses
# into ONE scatter (9 offsets, self included) + ONE aggregate with three
# conditional struct-mins (min cardinal (z, k), min diagonal (z, k), self z)
# and a closed-form cross-class projection. No join, no HOF, one shuffle,
# all map-side combinable — the slope_aspect envelope.

#: D8 direction table: (dx, dy, direction index k, integer distance weight).
#: k orders E, NE, N, NW, W, SW, S, SE; ties inside a weight class break to
#: the smaller k, cross-class ties break to the cardinal.
_D8 = [
    (1, 0, 0, 10), (1, 1, 1, 7), (0, 1, 2, 10), (-1, 1, 3, 7),
    (-1, 0, 4, 10), (-1, -1, 5, 7), (0, -1, 6, 10), (1, -1, 7, 7),
]


def d8_flow_directions(
    dem: DataFrame,
    ix_col: str = "ix",
    iy_col: str = "iy",
    z_col: str = "z",
) -> DataFrame:
    """→ (ix, iy, z, dn_ix, dn_iy, drop_w, is_sink) for EVERY grid cell.

    ``dn_*`` is the D8 downstream neighbor (NULL on sinks), ``drop_w`` the
    exact integer weighted drop (z − z_dn)·w to it (NULL on sinks), and
    ``is_sink`` is true when no present neighbor is strictly lower under
    the weighted rule. Edge cells drain among their present neighbors
    (water never leaves the grid sideways — a border pit is a sink).
    Deterministic total tie rule: within a weight class the lower
    neighbor z wins, then the smaller direction index k; across classes
    an equal weighted drop goes to the cardinal. Flow edges strictly
    descend in z, so the flow graph is a forest — the acyclicity that
    :func:`flow_accumulation` and :func:`watershed_labels` rely on.
    """
    kernel = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                F.lit(k).alias("k"), F.lit(w).alias("w"),
            )
            for dx, dy, k, w in _D8
        ]
        + [F.struct(F.lit(0).alias("dx"), F.lit(0).alias("dy"),
                    F.lit(-1).alias("k"), F.lit(0).alias("w"))]
    )
    scattered = dem.select(
        F.col(ix_col).cast("long").alias("_x"),
        F.col(iy_col).cast("long").alias("_y"),
        F.col(z_col).cast("long").alias("_z"),
        F.explode(kernel).alias("_k"),
    ).select(
        # scatter TO the neighbor: the source becomes the target's candidate
        (F.col("_x") + F.col("_k.dx")).alias("ix"),
        (F.col("_y") + F.col("_k.dy")).alias("iy"),
        F.col("_z").alias("_nz"),
        # the direction FROM the target back to this source is the
        # opposite offset — precompute its index and offsets
        F.col("_k.k").alias("_k_src"),
        F.col("_k.w").alias("_w"),
        (-F.col("_k.dx")).alias("_bdx"),
        (-F.col("_k.dy")).alias("_bdy"),
    )
    # direction index as seen FROM the target (opposite of the scatter
    # direction): k and its opposite differ by 4 mod 8
    back_k = F.when(F.col("_k_src") < 0, F.lit(-1)).otherwise(
        (F.col("_k_src") + 4) % 8
    )
    cand = F.struct(
        F.col("_nz").alias("z"), back_k.alias("k"),
        F.col("_bdx").alias("dx"), F.col("_bdy").alias("dy"),
    )
    gathered = scattered.groupBy("ix", "iy").agg(
        F.max(F.when(F.col("_k_src") < 0, F.col("_nz"))).alias("z"),
        F.min(F.when((F.col("_k_src") >= 0) & (F.col("_w") == 10), cand)).alias("_c"),
        F.min(F.when((F.col("_k_src") >= 0) & (F.col("_w") == 7), cand)).alias("_d"),
    ).where(F.col("z").isNotNull())  # off-grid targets receive no self row
    gc = F.when(F.col("_c").isNotNull(), (F.col("z") - F.col("_c.z")) * 10)
    gd = F.when(F.col("_d").isNotNull(), (F.col("z") - F.col("_d.z")) * 7)
    staged = gathered.select(
        "ix", "iy", "z", "_c", "_d", gc.alias("_gc"), gd.alias("_gd"),
        # cardinal wins cross-class ties and the degenerate no-diagonal case
        F.when(
            F.col("_d").isNull()
            | (F.col("_c").isNotNull() & (gc >= gd)), F.lit("c")
        ).otherwise(F.lit("d")).alias("_pick"),
    )
    best_g = F.when(F.col("_pick") == "c", F.col("_gc")).otherwise(F.col("_gd"))
    best = F.when(F.col("_pick") == "c", F.col("_c")).otherwise(F.col("_d"))
    sink = best_g.isNull() | (best_g <= 0)
    return staged.select(
        "ix", "iy", "z",
        F.when(~sink, F.col("ix") + best.getField("dx")).alias("dn_ix"),
        F.when(~sink, F.col("iy") + best.getField("dy")).alias("dn_iy"),
        F.when(~sink, best_g).alias("drop_w"),
        sink.alias("is_sink"),
    )


def flow_accumulation(flows: DataFrame, max_rounds: int = 60) -> DataFrame:
    """→ (ix, iy, acc): the number of cells draining through each cell,
    itself included (acc = 1 + Σ acc over immediate upstream cells).
    ``flows`` is :func:`d8_flow_directions` output (sinks keep acc rows;
    their NULL ``dn_*`` simply contributes nothing downstream).

    Scale shape: per round ONE equi-join of the current state against the
    flow edges (keyed by cell) + ONE map-side-combinable sum keyed by the
    downstream cell; the fixed point is exact because the flow forest is
    acyclic (strict z descent), and iteration t is correct for every cell
    of flow-path depth ≤ t, so rounds = longest flow path (a terrain
    property — river main-stem length in cells — not a data-size
    property). States localCheckpoint per round (rule 14) and release
    their parent once materialized (rule 10); convergence is an exact
    bit_xor signature. A log-depth alternative (Euler-tour segmented
    scan) exists but needs list ranking — out of scope, documented.
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    cells = flows.select("ix", "iy")
    edges = (
        flows.where(~F.col("is_sink"))
        .select("ix", "iy", "dn_ix", "dn_iy")
        .localCheckpoint()
    )
    state = _Round.materialize(
        cells.select("ix", "iy", F.lit(1).cast("long").alias("acc")),
        truncate=True,
    )

    def _sig(df: DataFrame) -> int:
        row = df.agg(
            F.bit_xor(F.xxhash64("ix", "iy", "acc")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return hash((row["s"], row["n"]))

    sig = _sig(state.df)
    for _ in range(int(max_rounds)):
        inflow = (
            state.df.join(edges, ["ix", "iy"])
            .groupBy(
                F.col("dn_ix").alias("ix"), F.col("dn_iy").alias("iy")
            )
            .agg(F.sum("acc").alias("_in"))
        )
        nxt = (
            state.df.select("ix", "iy")
            .join(inflow, ["ix", "iy"], "left")
            .select(
                "ix", "iy",
                (F.lit(1) + F.coalesce(F.col("_in"), F.lit(0))).alias("acc"),
            )
        )
        new_state = _Round.materialize(nxt, truncate=True)
        new_sig = _sig(new_state.df)
        state.release()
        state = new_state
        if new_sig == sig:
            break
        sig = new_sig
    return state.df


def watershed_labels(flows: DataFrame, max_rounds: int = 20) -> DataFrame:
    """→ (ix, iy, sink_ix, sink_iy): every cell labeled with the sink its
    water reaches — the watershed (drainage-basin) partition of the grid.
    ``flows`` is :func:`d8_flow_directions` output.

    Scale shape: pointer doubling — state (cell → ptr) starts as the flow
    edge (sinks point to themselves), and each round substitutes
    ptr ← ptr(ptr) with ONE self-equi-join keyed by the pointee. Sinks
    are fixed points, so the state converges to the root sink in
    ⌈log₂ depth⌉ rounds — 20 rounds cover flow paths of 10⁶ cells. Same
    checkpoint/signature discipline as the other iterative ops.
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    state = _Round.materialize(
        flows.select(
            "ix", "iy",
            F.coalesce(F.col("dn_ix"), F.col("ix")).alias("px"),
            F.coalesce(F.col("dn_iy"), F.col("iy")).alias("py"),
        ),
        truncate=True,
    )

    def _sig(df: DataFrame) -> int:
        row = df.agg(
            F.bit_xor(F.xxhash64("ix", "iy", "px", "py")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return hash((row["s"], row["n"]))

    sig = _sig(state.df)
    for _ in range(int(max_rounds)):
        p = state.df.select(
            F.col("ix").alias("_jx"), F.col("iy").alias("_jy"),
            F.col("px").alias("_px2"), F.col("py").alias("_py2"),
        )
        nxt = state.df.join(
            p, (state.df["px"] == p["_jx"]) & (state.df["py"] == p["_jy"])
        ).select(
            "ix", "iy",
            F.col("_px2").alias("px"), F.col("_py2").alias("py"),
        )
        new_state = _Round.materialize(nxt, truncate=True)
        new_sig = _sig(new_state.df)
        state.release()
        state = new_state
        if new_sig == sig:
            break
        sig = new_sig
    return state.df.select(
        "ix", "iy",
        F.col("px").alias("sink_ix"), F.col("py").alias("sink_iy"),
    )


def pyramid_sums(
    dem: DataFrame,
    levels: int = 2,
    keys: list | None = None,
    x_col: str = "ix",
    y_col: str = "iy",
    v_col: str = "z",
) -> DataFrame:
    """Mipmap / overview pyramid over keyed rasters — the pixel-level
    twin of the tile-count pyramid: level ℓ cell (ix DIV 2^ℓ,
    iy DIV 2^ℓ) carries the EXACT integer sum and support count of its
    2^ℓ × 2^ℓ base block (callers derive means as one division; sums
    stay closed under aggregation, means don't — the same reason the
    zonal stats emit sufficient statistics).

    → (keys…, level, ix, iy, s, n) for levels 1..``levels``.

    Shape: HIERARCHICAL rollup — level ℓ+1 aggregates level ℓ (4 rows
    in, 1 out), not the base raster, so total work is a geometric
    series ≈ 4/3 of one base pass and each exchange is a quarter the
    size of the last. All integer `div` arithmetic (≡ ``//`` on
    non-negative indices); 10¹² pixels partition on (keys, coarse
    cell) and every aggregate is map-side combinable."""
    ks = list(keys) if keys else []
    cur = dem.selectExpr(
        *ks,
        f"CAST({x_col} AS BIGINT) AS ix",
        f"CAST({y_col} AS BIGINT) AS iy",
        f"CAST({v_col} AS BIGINT) AS s",
        "CAST(1 AS BIGINT) AS n",
    )
    outs = []
    n_levels = int(levels)
    for lvl in range(1, n_levels + 1):
        cur = (
            cur.selectExpr(
                *ks, "ix div 2 AS ix", "iy div 2 AS iy", "s", "n"
            )
            .groupBy(*ks, "ix", "iy")
            .agg(
                F.sum("s").cast("long").alias("s"),
                F.sum("n").cast("long").alias("n"),
            )
        )
        if lvl < n_levels:
            # materialize each intermediate level ONCE (r6): the union
            # below references level ℓ from every branch ℓ'>ℓ, and
            # Catalyst does NOT reuse the identical aggregate subtrees —
            # the un-checkpointed chain recomputed the full base pass per
            # level (measured 13.7s → 4.4s at 50M px / 4 levels). Eager
            # localCheckpoint (not persist) so the blocks are reclaimed
            # by the ContextCleaner when the result goes out of scope;
            # storage is bounded by base/4 rows — the standard mipmap
            # working set.
            cur = cur.localCheckpoint()
        outs.append(cur.selectExpr(
            *ks, f"CAST({lvl} AS BIGINT) AS level", "ix", "iy", "s", "n"
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
