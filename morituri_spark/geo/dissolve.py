"""Polygon dissolve (merge-by-attribute) via shared-edge cancellation.

The classic GIS dissolve — census tracts → counties, admin L8 → L4,
per-tile land-cover patches → regional polygons — for TOPOLOGICALLY
CLEAN inputs: polygons that share a boundary share the identical vertex
sequence along it (the tessellation contract every admin/census dataset
this engine ingests satisfies; the reference's admin hierarchy,
navteq.hpp:1147-1156, is exactly such a tessellation).

The insight that makes dissolve a ONE-SHUFFLE DataFrame op instead of a
geometry-library union cascade: in a tessellation, an edge interior to a
group appears in EXACTLY TWO member rings (once per adjacent polygon,
opposite orientations), while a dissolved-boundary edge appears in
EXACTLY ONE. So:

1. explode rings → directed edges (pure Catalyst: one ``transform`` over
   vertex indices + ``explode``);
2. normalize each edge to an undirected key (lexicographic endpoint
   order);
3. ``groupBy(group, edge).count()`` — interior edges count 2 and cancel,
   count 1 is dissolved boundary, count > 2 is a non-manifold topology
   violation SURFACED (not silently absorbed).

Scale shape: edges ≈ vertices, so the only exchange moves O(total
vertices) narrow rows with map-side partial aggregation; no pairwise
polygon unions, no geometry library, no driver-side cascade. At 10¹²
vertices this is the same canonical groupBy shape as the engine's cell
rollups. Dissolved AREA needs no boundary walk at all — areas are
additive over a tessellation — so the per-group rollup is a second tiny
aggregate over per-polygon shoelace areas (4-40 vertex rings: the HOF
fold is off the hot path per working-note rule 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def boundary_edges(
    zones: DataFrame,
    group_col: str = "group_id",
    rings_col: str = "rings",
) -> DataFrame:
    """Undirected edges of each group's rings with their multiplicity.

    ``rings_col``: array<array<array<double>>> — per zone, a list of
    CLOSED rings (first point repeated last), each point ``[x, y]`` (the
    engine's line/ring layout, cf. simplify/overlay).

    Returns (``group_col``, x1, y1, x2, y2, multiplicity): multiplicity
    1 = dissolved boundary, 2 = interior (cancelled), >2 = non-manifold
    input surfaced to the caller. Zero-length edges are rejected with a
    raise inside the plan (assert_true) — they silently corrupt
    multiplicity counts.
    """
    ring = zones.select(group_col, F.explode(rings_col).alias("_ring"))
    e = ring.select(
        group_col,
        F.explode(
            F.expr(
                "transform(sequence(0, size(_ring) - 2), i -> struct("
                "_ring[i][0] AS ax, _ring[i][1] AS ay, "
                "_ring[i+1][0] AS bx, _ring[i+1][1] AS by))"
            )
        ).alias("_e"),
    ).select(group_col, "_e.ax", "_e.ay", "_e.bx", "_e.by")
    guard = F.coalesce(
        F.assert_true(
            (F.col("ax") != F.col("bx")) | (F.col("ay") != F.col("by")),
            F.lit("boundary_edges: zero-length ring edge"),
        ).cast("double"),
        F.lit(0.0),
    )
    fwd = (F.col("ax") < F.col("bx")) | (
        (F.col("ax") == F.col("bx")) & (F.col("ay") < F.col("by"))
    )
    norm = e.select(
        group_col,
        (F.when(fwd, F.col("ax")).otherwise(F.col("bx")) + guard).alias("x1"),
        F.when(fwd, F.col("ay")).otherwise(F.col("by")).alias("y1"),
        F.when(fwd, F.col("bx")).otherwise(F.col("ax")).alias("x2"),
        F.when(fwd, F.col("by")).otherwise(F.col("ay")).alias("y2"),
    )
    return norm.groupBy(group_col, "x1", "y1", "x2", "y2").agg(
        F.count(F.lit(1)).alias("multiplicity")
    )


def dissolve_stats(
    zones: DataFrame,
    group_col: str = "group_id",
    zone_id: str = "zone_id",
    rings_col: str = "rings",
) -> DataFrame:
    """Per-group dissolve rollup — the serving summary of the dissolved
    geometry without materializing it:

    (group, n_polys, dissolved_area, n_boundary_edges, boundary_len,
    sum_mid_x, sum_mid_y, n_nonmanifold)

    - ``dissolved_area``: Σ |shoelace(exterior rings)| over members —
      exact for a tessellation (interiors partition the union);
    - ``boundary_len`` + the midpoint sums positionally pin the
      dissolved OUTLINE (multiplicity-1 edges) without shipping it;
    - ``n_nonmanifold`` counts multiplicity>2 edge keys — 0 on clean
      input; surfaced, never silently dropped.

    Two aggregates total: the edge-cancellation groupBy (the only data-
    sized exchange) and a per-zone area fold reaggregated per group.
    """
    edges = boundary_edges(zones, group_col=group_col, rings_col=rings_col)
    hyp = F.sqrt(
        (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
        + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
    )
    eroll = edges.groupBy(group_col).agg(
        F.sum(F.when(F.col("multiplicity") == 1, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_boundary_edges"),
        F.sum(
            F.when(F.col("multiplicity") == 1, hyp).otherwise(F.lit(0.0))
        ).alias("boundary_len"),
        F.sum(
            F.when(
                F.col("multiplicity") == 1,
                (F.col("x1") + F.col("x2")) / F.lit(2.0),
            ).otherwise(F.lit(0.0))
        ).alias("sum_mid_x"),
        F.sum(
            F.when(
                F.col("multiplicity") == 1,
                (F.col("y1") + F.col("y2")) / F.lit(2.0),
            ).otherwise(F.lit(0.0))
        ).alias("sum_mid_y"),
        F.sum(
            F.when(F.col("multiplicity") > 2, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_nonmanifold"),
    )
    # per-zone shoelace over the EXTERIOR (first) ring; rings are closed,
    # so the fold over i = 0..n-2 covers every edge exactly once. HOF on
    # a small array, off the hot path (rule 8) — the area never touches
    # the edge exchange.
    area = zones.select(
        group_col,
        F.col(zone_id).alias("_zid"),
        F.abs(
            F.expr(
                f"aggregate(sequence(0, size({rings_col}[0]) - 2), "
                f"CAST(0.0 AS DOUBLE), (acc, i) -> acc + "
                f"{rings_col}[0][i][0] * {rings_col}[0][i+1][1] - "
                f"{rings_col}[0][i+1][0] * {rings_col}[0][i][1])"
            )
            / F.lit(2.0)
        ).alias("_area"),
    )
    aroll = area.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_polys"),
        F.sum("_area").alias("dissolved_area"),
    )
    return aroll.join(eroll, group_col).select(
        group_col,
        "n_polys",
        "dissolved_area",
        "n_boundary_edges",
        "boundary_len",
        "sum_mid_x",
        "sum_mid_y",
        "n_nonmanifold",
    )
