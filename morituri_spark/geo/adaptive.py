"""Adaptive quadtree binning — split-until-≤N leaves over the quad grid.

The fixed-resolution grid (geo/cells.py) puts Tokyo and the Pacific in
equal-size cells; every skew defense downstream (PIP salting, knn
two-stage top-k, hot-bucket splitting) exists to absorb that mismatch.
:func:`adaptive_cells` removes it at the source: starting from
``res_min``, any cell holding more than ``max_points`` points splits into
its 4 children, recursively until ``res_max`` — the classic quadtree /
vector-tile "bucket ≤ N features" rule, computed here without iteration.

Because per-cell counts are monotone non-increasing with depth, the leaf
containing a point is simply its COARSEST ancestor in
[res_min, res_max] whose population is ≤ ``max_points`` (clamped to
res_max for cells hot at every level) — so the whole tree materializes
from ONE corpus-sized aggregate:

1. points collapse to finest-res cells (map-side combinable — the only
   stage that sees point rows);
2. each finest cell explodes one row per level (L = res_max−res_min+1,
   static power-of-two divisors → pure codegen integer math), and a
   second grid-bounded aggregate yields every ancestor's population;
3. a min-struct aggregate per finest cell picks the coarsest qualifying
   (level, ancestor) pair — NULL-skipping min, no iteration, no driver
   loop — and a final grid-bounded aggregate emits the leaves.

At 10¹² points on a 10⁷-cell finest grid with L = 12 the post-collapse
work is ~10⁸ thin rows; nothing is ever point-bounded after stage 1 and
nothing iterates, unlike a literal split-loop (L rounds of job-launch
overhead and a growing frontier — the shape rule 14 exists to contain).

Reference scope: no morituri counterpart (its tiling is fixed-res
z-levels); this is the scale path for balanced tile sinks and for
choosing PIP/knn cell resolutions from data rather than by hand.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import MAX_RES, _RES_SHIFT, _X_SHIFT, _MASK29, cell_col


def adaptive_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    max_points: int = 1000,
    res_min: int = 2,
    res_max: int = 10,
) -> DataFrame:
    """→ (cell_id, res, n_points): the quadtree leaves. Leaves are
    pairwise disjoint, cover every input point, and each holds
    ≤ ``max_points`` points unless res = ``res_max`` (a cell hot at the
    deepest level stays a leaf — surfaced by its count, never silently
    split further). Σ n_points = |df| exactly.

    All arithmetic is exact integer math on the packed cell id
    (res·2⁵⁸ + x·2²⁹ + y, geo/cells.py), replayable digit-for-digit by
    the SQL oracle; counts are exact longs — the leaf set is therefore
    bit-identical at any parallelism.
    """
    if not 0 <= res_min <= res_max <= MAX_RES:
        raise ValueError(
            f"need 0 <= res_min <= res_max <= {MAX_RES}, got [{res_min}, {res_max}]"
        )
    if max_points < 1:
        raise ValueError(f"max_points must be >= 1, got {max_points}")

    # stage 1 — the ONLY point-bounded stage; referenced once (lv is
    # recomputed from it per consumer, a narrow projection of a grid
    # table, cheaper than a second persist — rule 22)
    finest = (
        df.select(cell_col(F.col(lon), F.col(lat), res_max).alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint()
    )

    levels = list(range(res_min, res_max + 1))
    offs = F.array(*[
        F.struct(
            F.lit(r).alias("_r"),
            F.lit(1 << (res_max - r)).alias("_d"),
        )
        for r in levels
    ])
    # stage x/y once (rule 9), then one explode row per level; the parent
    # id is a pure-codegen DIV by a literal power of two
    lv = (
        finest.select(
            "_c", "_n",
            F.shiftright(
                F.col("_c").bitwiseAND(F.lit(_MASK29 << _X_SHIFT)), _X_SHIFT
            ).alias("_x"),
            F.col("_c").bitwiseAND(F.lit(_MASK29)).alias("_y"),
            F.explode(offs).alias("_o"),
        )
        .select(
            "_c", "_n",
            F.col("_o._r").alias("_r"),
            (
                F.col("_o._r").cast("long") * F.lit(1 << _RES_SHIFT)
                + F.expr("_x DIV _o._d") * F.lit(1 << _X_SHIFT)
                + F.expr("_y DIV _o._d")
            ).alias("_p"),
        )
    )
    # stage 2 — every ancestor's population (grid-bounded: cells × L rows)
    level_counts = lv.groupBy("_r", "_p").agg(F.sum("_n").alias("_cnt"))

    # stage 3 — coarsest qualifying ancestor per finest cell: NULL-skipping
    # lexicographic struct-min (for a fixed _c, _p is a function of _r, so
    # min-by-_r IS the coarsest level); hot-at-every-level cells fall back
    # to themselves (res_max leaf)
    decision = (
        lv.join(level_counts, ["_r", "_p"])
        .groupBy("_c")
        .agg(
            F.min(
                F.when(
                    F.col("_cnt") <= F.lit(int(max_points)),
                    F.struct(F.col("_r"), F.col("_p")),
                )
            ).alias("_best"),
            F.first("_n").alias("_n"),
        )
    )
    return (
        decision.groupBy(
            F.coalesce(F.col("_best._p"), F.col("_c")).alias("cell_id")
        )
        .agg(F.sum("_n").alias("n_points"))
        .select(
            "cell_id",
            F.shiftright(F.col("cell_id"), _RES_SHIFT).cast("int").alias("res"),
            "n_points",
        )
    )


def assign_adaptive(
    df: DataFrame,
    leaves: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    res_min: int = 2,
    res_max: int = 10,
) -> DataFrame:
    """Attach each point's quadtree leaf: ``leaf_cell`` + ``leaf_res``
    columns appended to ``df``. ``leaves`` is :func:`adaptive_cells`
    output built with the SAME (res_min, res_max) — leaves are pairwise
    disjoint, so each point matches exactly one.

    Join shape: the point explodes one ancestor id per level
    (L = res_max−res_min+1 thin rows, pure-codegen integer math — the
    compact-cover probe pattern, geo/pip.py) and inner-joins the leaf
    table on cell_id. The leaf table is grid-bounded — broadcast it when
    it fits (the planner's AQE does this automatically at leaf counts
    that matter); the explode side never shuffles more than L small ints
    per point. This is the balanced-tile-sink path: repartition by
    ``leaf_cell`` and every output file holds ≤ max_points rows (plus
    the res_max stragglers), regardless of how skewed the corpus is.
    """
    if not 0 <= res_min <= res_max <= MAX_RES:
        raise ValueError(
            f"need 0 <= res_min <= res_max <= {MAX_RES}, got [{res_min}, {res_max}]"
        )
    levels = list(range(res_min, res_max + 1))
    offs = F.array(*[
        F.struct(
            F.lit(r).alias("_r"),
            F.lit(1 << (res_max - r)).alias("_d"),
        )
        for r in levels
    ])
    staged = df.withColumn("_c", cell_col(F.col(lon), F.col(lat), res_max)).select(
        "*",
        F.shiftright(
            F.col("_c").bitwiseAND(F.lit(_MASK29 << _X_SHIFT)), _X_SHIFT
        ).alias("_x"),
        F.col("_c").bitwiseAND(F.lit(_MASK29)).alias("_y"),
    )
    probes = staged.select(
        "*",
        F.explode(offs).alias("_o"),
    ).select(
        "*",
        (
            F.col("_o._r").cast("long") * F.lit(1 << _RES_SHIFT)
            + F.expr("_x DIV _o._d") * F.lit(1 << _X_SHIFT)
            + F.expr("_y DIV _o._d")
        ).alias("_probe"),
    )
    lf = leaves.select(
        F.col("cell_id").alias("_probe"),
        F.col("cell_id").alias("leaf_cell"),
        F.col("res").alias("leaf_res"),
    )
    out_cols = [c for c in df.columns] + ["leaf_cell", "leaf_res"]
    return probes.join(lf, "_probe", "inner").select(*out_cols)
