"""Distributed Hough line voting — dominant line detection in point
tables (GPS trace clouds, raster edge maps, LiDAR slices).

The Hough transform is the textbook example of an algorithm that IS a
groupBy: every point votes for the (θ, ρ) parameter cells of all lines
through it (ρ = x·cosθ + y·sinθ), and detected lines are the cells
whose vote count clears a threshold. In DataFrame terms:

1. a T-fold explode of the point table against a TINY literal angle
   table (T = 8-32 rows — broadcast for free, the fan-out is the
   algorithm, not a join artifact);
2. ρ-binning as one shared arithmetic expression;
3. ``groupBy(θ, bin).count()`` — map-side-combinable, so each task
   pre-collapses its votes to ≤ T·n_bins partial rows and the single
   exchange moves accumulator cells, NOT points;
4. a threshold filter on the counts.

At 10¹² points the exchange volume is bounded by T·n_bins·n_tasks
regardless of input size — the same partial-aggregate shape as the
engine's cell rollups. No UDF anywhere.

Determinism contract (the engine's trig discipline, cf. hillshade's
driver-literal light vector): cos/sin are PRECOMPUTED 6-dp decimal
literals baked into the plan — both engines parse the identical
decimal strings to identical doubles, every product/sum is then the
same IEEE op, and the half-up bin floor is the shared rule-16 rounding
— so vote counts are bit-stable across engines, not approximately so.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def theta_table(n_theta: int) -> list[tuple[int, float, float]]:
    """(k, cosθ_k, sinθ_k) for θ_k = k·π/n_theta, k = 0..n_theta−1 —
    each trig value rounded HALF-UP to 6 dp so the literals are short
    exact decimal strings both engines parse identically."""

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5 + 1e-8) / 1e6 if x >= 0 else -(
            math.floor(-x * 1e6 + 0.5 + 1e-8) / 1e6
        )

    out = []
    for k in range(n_theta):
        th = math.pi * k / n_theta
        out.append((k, r6(math.cos(th)), r6(math.sin(th))))
    return out


def hough_votes(
    points: DataFrame,
    n_theta: int = 8,
    rho_step: float = 4.0,
    x_col: str = "x",
    y_col: str = "y",
    keys: Sequence[str] = (),
) -> DataFrame:
    """→ (*keys, theta_k, rho_bin, votes): full Hough accumulator over
    the point table. ``rho_bin = floor(ρ/step + 1/2)`` (half-up, shared
    with SQL replays). ``keys`` (e.g. an image id) yields one
    independent accumulator per key group at no extra exchange — the
    key just widens the groupBy, and votes stay additive across any
    further rollup."""
    rows = theta_table(n_theta)
    angle = F.array(
        *[
            F.struct(
                F.lit(k).alias("theta_k"),
                F.lit(c).alias("c"),
                F.lit(s).alias("s"),
            )
            for k, c, s in rows
        ]
    )
    key_cols = [F.col(k) for k in keys]
    v = points.select(
        *key_cols,
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        F.explode(angle).alias("_a"),
    )
    rho = F.col("_x") * F.col("_a.c") + F.col("_y") * F.col("_a.s")
    binned = v.select(
        *keys,
        F.col("_a.theta_k").alias("theta_k"),
        F.floor(rho / F.lit(float(rho_step)) + F.lit(0.5)).alias("rho_bin"),
    )
    return binned.groupBy(*keys, "theta_k", "rho_bin").agg(
        F.count(F.lit(1)).alias("votes")
    )


def hough_lines(
    points: DataFrame,
    n_theta: int = 8,
    rho_step: float = 4.0,
    min_votes: int = 10,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """→ (theta_k, rho_bin, votes, rho_center): accumulator peaks with
    ≥ ``min_votes`` — the detected lines, each in normal form
    (θ = theta_k·π/n_theta, ρ ≈ rho_center)."""
    acc = hough_votes(
        points, n_theta=n_theta, rho_step=rho_step, x_col=x_col, y_col=y_col
    )
    return acc.where(F.col("votes") >= F.lit(int(min_votes))).select(
        "theta_k",
        "rho_bin",
        "votes",
        (F.col("rho_bin") * F.lit(float(rho_step))).alias("rho_center"),
    )
