"""Convoy / co-movement detection — pairs of moving entities that stay
within a Chebyshev radius for at least ``min_len`` CONSECUTIVE ticks
(the flock/convoy primitive of movement analytics: carpool detection,
escort patterns, GPS-clone fraud, sensor pairing).

Semantics contract (engine-stable, SQL-replayable):

- input is one row per (entity, tick) with INTEGER lattice coordinates
  (the engine's 1e-7°-fixed-point convention covers real lon/lat);
- two entities are *together at tick t* iff both emit a position at t
  and Chebyshev distance max(|Δx|, |Δy|) ≤ ``radius`` — all-integer, no
  metric rounding;
- a *run* is a maximal set of consecutive ticks on which a pair is
  together (classic gaps-and-islands: group = t − row_number() ordered
  by t); runs shorter than ``min_len`` are dropped;
- output is one row per qualifying run: (id_a, id_b, start_t, end_t,
  run_len) with id_a < id_b — a total deterministic result.

Scale shape (the part a 100 TB movement table cares about):

- candidate pairs come from ONE equi-join keyed on (tick, cell_x,
  cell_y) with cell size = ``radius`` — the tick key splinters space
  hot-spots across time exactly like radius_join's time buckets, and
  within a tick only the 3×3 neighbor block is probed (the probe side
  explodes ×9, the build side keys by its single home cell, so each
  true pair surfaces exactly once per direction — no pair-level dedup
  shuffle; rule-24 discipline);
- the run detection is one window + one partial-aggregable groupBy on
  (id_a, id_b) — pair keys, which are naturally high-cardinality, so
  no skew defense is needed there (rule 20: defenses below the
  straggler regime are pure cost);
- a mega-cell (thousands of entities in one cell at one tick) would
  inflate the candidate join quadratically — that is a DATA property,
  surfaced by the same max-cell probe contract as radius_join; this
  operator keeps the plain join because convoy inputs are per-entity
  trajectories (one row per entity per tick), where cells hold traffic,
  not the corpus.

Reference scope: no counterpart in morituri; geo extension family
(SURVEY.md §2), sibling of knn.radius_join (fixed-radius space-time
contacts — this operator adds the PERSISTENCE dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def comovement_runs(
    points: DataFrame,
    radius: int = 2,
    min_len: int = 3,
    id_col: str = "entity_id",
    t_col: str = "tick",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """→ (id_a, id_b, start_t, end_t, run_len): maximal consecutive-tick
    runs (≥ ``min_len``) on which two entities stay within Chebyshev
    ``radius`` of each other. One input row per (entity, tick)."""
    r = int(radius)
    if r < 1:
        raise ValueError("radius must be >= 1 (integer lattice)")
    base = points.select(
        F.col(id_col).alias("eid"),
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    # home cell (floor division holds for negative coords too)
    cx = F.floor(F.col("x") / F.lit(r))
    cy = F.floor(F.col("y") / F.lit(r))
    build = base.select(
        F.col("eid").alias("id_b"),
        "t",
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    # probe side explodes to its 3×3 cell neighborhood: |Δcoord| <= r
    # with cell size r forces |Δcell| <= 1, so every true pair lands on
    # exactly one (tick, cell) key — found once per direction, deduped
    # by the id_a < id_b gate, never a pair-level distinct
    probe = base.select(
        F.col("eid").alias("id_a"),
        "t",
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dy -> "
                f"transform(sequence(-1, 1), dx -> "
                f"struct(CAST(floor(x / {r}) AS BIGINT) + dx AS cx, "
                f"CAST(floor(y / {r}) AS BIGINT) + dy AS cy))))"
            )
        ).alias("nb"),
    ).select("id_a", "t", "xa", "ya", "nb.cx", "nb.cy")
    together = (
        probe.join(build, ["t", "cx", "cy"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.greatest(
                    F.abs(F.col("xa") - F.col("xb")),
                    F.abs(F.col("ya") - F.col("yb")),
                )
                <= r
            )
        )
        .select("id_a", "id_b", "t")
    )
    w = Window.partitionBy("id_a", "id_b").orderBy("t")
    grp = together.withColumn("grp", F.col("t") - F.row_number().over(w))
    return (
        grp.groupBy("id_a", "id_b", "grp")
        .agg(
            F.min("t").alias("start_t"),
            F.max("t").alias("end_t"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .where(F.col("run_len") >= int(min_len))
        .drop("grp")
    )
