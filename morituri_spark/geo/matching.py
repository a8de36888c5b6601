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
    return_candidates: bool = False,
) -> DataFrame:
    """→ (point_id, seg_id, dist) — each point's nearest segment within
    ``radius`` (scaled degrees), ties to the smallest segment id. With
    ``return_candidates`` the pre-argmin candidate relation is returned
    instead — (point_id, seg_id, dist, dist_nano) for every in-radius
    pair — the shared input of :func:`hmm_map_match`.

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
        F.expr(
            "CAST(floor(sqrt(_ex * _ex + _ey * _ey) * 1e9 + 0.5 + 1e-8)"
            " AS BIGINT)"
        ).alias("dist_nano"),
    ).where(F.col("dist") <= r)

    if return_candidates:
        # a pair can meet through several cover cells — harmless under
        # the argmin below, but a trellis must see each (point, segment)
        # candidate ONCE: dedup through the hash aggregate (rule 21);
        # dist is a pure function of the pair so min == the value
        return cand.groupBy(point_id, seg_id).agg(
            F.min("dist").alias("dist"),
            F.min("dist_nano").alias("dist_nano"),
        )

    # --- argmin: one partial agg ----------------------------------------
    best = (
        cand.groupBy(point_id)
        .agg(F.min(F.struct("dist", seg_id)).alias("_b"))
        .select(point_id, F.col(f"_b.{seg_id}").alias(seg_id), F.col("_b.dist").alias("dist"))
    )
    return best


def hmm_map_match(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    cell_deg: float,
    switch_cost_nano: int,
    cos_lat: float = 1.0,
    track_col: str = "track_id",
    seq_col: str = "seq",
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    max_cells_per_segment: int = 4096,
) -> DataFrame:
    """→ (track_id, seq, point_id, seg_id, dist, cost): HMM map-matching —
    each point assigned the segment on the min-cost COHERENT path through
    its track, where :func:`snap_to_segments` would pick each point's
    nearest segment independently (and zig-zag at every parallel road).

    The classic composition (Newson–Krumm shape, integerized): emission
    cost = the snap candidate's distance in exact nano-degree units
    (``dist_nano`` — the same rule-16 quantity the snap oracle replays);
    transition = the uniform switch model (stay 0, change
    ``switch_cost_nano``), which needs no S×S matrix so the state space
    can be the whole street network. Decoding is
    :func:`morituri_spark.operators.viterbi.viterbi_costs`: ONE shuffle
    keyed by track, the DP vectorized per sequence in exact int64.

    ``points`` must carry (track_col, seq_col, point_id, lon, lat);
    a point with no candidate inside ``radius`` is a gap — the DP chains
    its neighbors directly (documented in viterbi_costs). Scale shape:
    candidates from the same cell equi-join as snap (never all-pairs);
    the only additions are one point-keyed join to recover track/seq and
    the track-keyed viterbi exchange."""
    cands = snap_to_segments(
        points, segments, radius, cell_deg,
        cos_lat=cos_lat, point_id=point_id, seg_id=seg_id,
        max_cells_per_segment=max_cells_per_segment,
        return_candidates=True,
    )
    keyed = cands.join(
        points.select(point_id, track_col, seq_col), point_id
    )
    from ..operators.viterbi import viterbi_costs

    emissions = keyed.select(
        F.col(track_col).cast("long").alias("key"),
        F.col(seq_col).cast("long").alias("step"),
        F.col(seg_id).cast("long").alias("state"),
        F.col("dist_nano").alias("e_cost"),
    )
    path = viterbi_costs(emissions, switch_cost=int(switch_cost_nano)).where(
        F.col("on_path")
    )
    return (
        path.join(
            keyed.select(
                F.col(track_col).cast("long").alias("key"),
                F.col(seq_col).cast("long").alias("step"),
                F.col(seg_id).cast("long").alias("state"),
                point_id, "dist",
            ),
            ["key", "step", "state"],
        )
        .select(
            F.col("key").alias(track_col),
            F.col("step").alias(seq_col),
            point_id,
            F.col("state").alias(seg_id),
            "dist",
            "cost",
        )
    )
