"""Ripley's K / L point-pattern statistics over great-circle distance.

K(r) answers "how many neighbors does a typical point have within r,
relative to complete spatial randomness?" — the multi-scale companion to
the single-radius pair join (geo/knn.radius_join) and the grid statistics
(geo/clustering): K(r) > πr² means clustering at scale r, < πr²
dispersion. L(r) = sqrt(K/π) linearizes it (CSR ⇒ L(r) = r).

Estimator: the naive (border-ignoring) form

    K(r) = A / (n(n−1)) · Σ_{i≠j} 1[d_ij ≤ r]

with ``A`` the caller's study-window area (km²) and d the haversine
distance. No edge correction is applied — at the corpus scales this
engine targets (continent-wide captures, r ≪ window size) the boundary
term is negligible, and every published correction (Ripley isotropic,
translation) needs per-pair window geometry that would turn the thin
pair stream into a geometry join. Callers comparing small windows at
large r should subtract the known bias or shrink r.

Scale shape: ONE cell-cover pair join at max(radii) (the radius_join
machinery: latitude-aware disk covers, hot-cell salting, never corpus²);
per-radius membership is a broadcast join of the tiny radii list against
the pair stream, partially aggregated map-side before the single
exchange — so cost is pair-bounded at r_max regardless of how many radii
are evaluated.

Reference scope: no counterpart in morituri (its spatial side stops at
assignment joins); extends the point-statistics family for training-data
diagnostics (capture-density profiling, choosing dedup radii).
"""
from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .knn import radius_self_join


def ripley_k(
    df: DataFrame,
    radii_km: Sequence[float],
    area_km2: float,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    res: int | None = None,
    salt: int | str | None = "auto",
    hot_cell_threshold: int = 4_000_000,
) -> DataFrame:
    """→ one row per radius: (r_km, pair_count, k_est, l_est).

    ``pair_count`` is the ORDERED within-r pair count Σ_{i≠j} 1[d≤r]
    (exact integer: twice the unordered join count). ``k_est``/``l_est``
    are each ONE shared double expression over exact integers, rule-16
    rounded to 6 dp — the membership gate itself compares the
    half-up-6dp-rounded haversine (radius_join's contract), so pair sets
    are engine-identical. Radii with zero pairs are kept (k = 0). Rows
    are empty when n < 2 (K undefined) — an exact integer gate.
    """
    rs = sorted({float(r) for r in radii_km})
    if not rs or rs[0] <= 0.0:
        raise ValueError(f"radii_km must be positive, got {list(radii_km)}")
    spark = df.sparkSession
    radii = spark.createDataFrame([(r,) for r in rs], "r_km double")
    pts = df.select(
        F.col(id_col).alias("_pid"), F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    pairs = radius_self_join(
        pts, rs[-1], res=res, id_col="_pid",
        salt=salt, hot_cell_threshold=hot_cell_threshold,
    )
    cnt = (
        pairs.join(F.broadcast(radii), F.col("dist_km") <= F.col("r_km"))
        .groupBy("r_km")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    n_tab = pts.agg(F.count(F.lit(1)).alias("_n"))
    j = radii.join(cnt, "r_km", "left").crossJoin(F.broadcast(n_tab))
    ordered = (F.coalesce(F.col("_c"), F.lit(0)) * 2).alias("pair_count")
    n_d = F.col("_n").cast("double")
    k_raw = (
        F.lit(float(area_km2)) * (F.coalesce(F.col("_c"), F.lit(0)) * 2).cast("double")
        / (n_d * (n_d - F.lit(1.0)))
    )
    # stage the raw K once (rule 9: l_est re-references it; inlined, the
    # whole expression would re-evaluate per output column)
    staged = j.where(F.col("_n") >= 2).select(
        "r_km", ordered, k_raw.alias("_k_raw")
    )
    k6 = F.floor(F.col("_k_raw") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    l6 = (
        F.floor(
            F.sqrt(F.col("_k_raw") / F.lit(math.pi)) * F.lit(1e6)
            + F.lit(0.5) + F.lit(1e-8)
        )
        / F.lit(1e6)
    )
    return staged.select(
        "r_km", "pair_count", k6.alias("k_est"), l6.alias("l_est")
    )
