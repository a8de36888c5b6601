"""Map-matching: snap points to their nearest polyline segment.

The north star's "nearest-feature enrichment" for the SEGMENT case —
geo/knn.py covers point↔point; this covers point↔street-segment (the
shape of morituri's street geometry, plugins/navteq/navteq.hpp link
records re-expressed relationally). Everything is pure Catalyst and
whole-stage-codegen'd (rule 1: no Python in the hot path):

1. **Candidates** come from a cell equi-join, never all-pairs: each
   segment's bbox, expanded by the snap radius, is covered with integer
   grid cells (a sequence×sequence explode — segments are short relative
   to the cell size, so the fan-out is small and bounded by
   ``max_cells_per_segment``); each point keys by its single cell. Any
   segment within ``radius`` of a point shares that point's cell by
   construction (bbox expansion covers the whole radius disk), so recall
   is exact.
2. **Refine** is the clamped-projection point-to-segment distance — five
   arithmetic staged projections (rule 9: separate columns, or Catalyst
   re-evaluates per reference), all in codegen.
3. **Argmin** is ONE partial-aggregable ``min(struct(dist, seg_id))`` per
   point — no window over the candidate relation, ties broken
   deterministically by segment id.

A point covered by k cells of candidates meets the same segment through
at most a few cells; duplicates are harmless under min() so no distinct
is spent on them. Skew: a mega-cell (urban core) concentrates candidate
pairs, but the aggregate is partial — map-side combine collapses each
point's candidates before the exchange, the same defense the PIP salted
path leans on.

Distance metric: local equirectangular — lon scaled by a caller-fixed
``cos_lat`` (constant, so both engines evaluate the identical expression
tree; the driver oracle replays it verbatim in DuckDB). Output distance
is in scaled degrees, rounded with the shared rule-16 epsilon so the
radius gate can't flip between engines.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: rule-16 shared rounding: half-up with a dust epsilon, 9 decimals.
_ROUND = "floor({x} * 1e9 + 0.5 + 1e-8) / 1e9"


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    cell_deg: float,
    cos_lat: float = 1.0,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    max_cells_per_segment: int = 4096,
) -> DataFrame:
    """→ (point_id, seg_id, dist) — each point's nearest segment within
    ``radius`` (scaled degrees), ties to the smallest segment id.

    ``points``: (point_id, lon, lat); ``segments``: (seg_id, ax, ay, bx,
    by) segment endpoints in degrees. ``cell_deg`` is the candidate grid
    pitch — it must be ≥ the typical segment extent for bounded fan-out
    (a segment spanning many cells still joins correctly, it just
    explodes into more cover rows; ``max_cells_per_segment`` raises
    rather than letting one continental segment fan out quadratically).
    """
    sx = F.lit(float(cos_lat))
    cs = F.lit(float(cell_deg))
    r = F.lit(float(radius))

    # --- segment cover: expanded-bbox integer cells --------------------
    seg = segments.select(
        seg_id,
        (F.col("ax") * sx).alias("_ax"), F.col("ay").alias("_ay"),
        (F.col("bx") * sx).alias("_bx"), F.col("by").alias("_by"),
    )
    seg = seg.select(
        seg_id, "_ax", "_ay", "_bx", "_by",
        F.floor((F.least("_ax", "_bx") - r) / cs).alias("_ix0"),
        F.floor((F.greatest("_ax", "_bx") + r) / cs).alias("_ix1"),
        F.floor((F.least("_ay", "_by") - r) / cs).alias("_iy0"),
        F.floor((F.greatest("_ay", "_by") + r) / cs).alias("_iy1"),
    )
    ncells = (F.col("_ix1") - F.col("_ix0") + 1) * (F.col("_iy1") - F.col("_iy0") + 1)
    # the assert feeds the sequence bound (coalesce(NULL, 0)) so Catalyst
    # cannot prune it (rule 18); a fan-out past the cap errors loudly
    # instead of silently exploding the cover
    guard = F.coalesce(
        F.assert_true(
            ncells <= max_cells_per_segment,
            F.concat(
                F.lit("snap_to_segments: segment fans out to "),
                ncells.cast("string"),
                F.lit(f" cells > max_cells_per_segment={max_cells_per_segment};"
                      " raise cell_deg or split the segment"),
            ),
        ).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    seg = seg.withColumn(
        "_ix", F.explode(F.sequence(F.col("_ix0") + guard, F.col("_ix1")))
    ).withColumn("_iy", F.explode(F.sequence("_iy0", "_iy1"))).select(
        seg_id, "_ax", "_ay", "_bx", "_by", "_ix", "_iy"
    )

    pts = points.select(
        point_id,
        (F.col("lon") * sx).alias("_px"), F.col("lat").alias("_py"),
    ).select(
        point_id, "_px", "_py",
        F.floor(F.col("_px") / cs).alias("_ix"),
        F.floor(F.col("_py") / cs).alias("_iy"),
    )

    # --- refine: clamped projection, staged per rule 9 ------------------
    cand = pts.join(seg, ["_ix", "_iy"])
    cand = cand.select(
        point_id, seg_id, "_px", "_py", "_ax", "_ay",
        (F.col("_bx") - F.col("_ax")).alias("_dx"),
        (F.col("_by") - F.col("_ay")).alias("_dy"),
    )
    cand = cand.withColumn("_len2", F.col("_dx") * F.col("_dx") + F.col("_dy") * F.col("_dy"))
    cand = cand.withColumn(
        "_t",
        F.when(F.col("_len2") == 0.0, F.lit(0.0)).otherwise(
            F.least(F.greatest(
                ((F.col("_px") - F.col("_ax")) * F.col("_dx")
                 + (F.col("_py") - F.col("_ay")) * F.col("_dy")) / F.col("_len2"),
                F.lit(0.0)), F.lit(1.0))
        ),
    )
    cand = cand.select(
        point_id, seg_id,
        (F.col("_px") - (F.col("_ax") + F.col("_t") * F.col("_dx"))).alias("_ex"),
        (F.col("_py") - (F.col("_ay") + F.col("_t") * F.col("_dy"))).alias("_ey"),
    )
    cand = cand.select(
        point_id, seg_id,
        F.expr(_ROUND.format(
            x="sqrt(_ex * _ex + _ey * _ey)")).alias("dist"),
    ).where(F.col("dist") <= r)

    # --- argmin: one partial agg ----------------------------------------
    best = (
        cand.groupBy(point_id)
        .agg(F.min(F.struct("dist", seg_id)).alias("_b"))
        .select(point_id, F.col(f"_b.{seg_id}").alias(seg_id), F.col("_b.dist").alias("dist"))
    )
    return best
