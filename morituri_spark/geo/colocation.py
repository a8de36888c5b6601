"""Colocation quotient (CLQ) — which categories cluster AROUND which.

Spatial co-location mining's core statistic, re-done on the cell grid:
for ordered category pair (a, b), how over- or under-represented is b
among a's spatial neighbors, relative to b's global share?

    CLQ(a→b) = (C_ab / T_a) / ((N_b − [a=b]) / (N − 1))

with the 3×3-cell neighborhood (including own cell, excluding self):

    C_ab = Σ_cells n_a(c) · Σ_{c'∈3×3(c)} n_b(c')  −  [a=b]·N_a
    T_a  = Σ_b C_ab        (every neighbor, any category)

CLQ > 1: b concentrates around a (co-location); CLQ < 1: segregation.
The [a=b] terms remove each point from its own neighbor set, and the
(N−1) denominator is the matching finite-population correction — the
standard Leslie-Kronenfeld form with cell-block neighborhoods instead
of k-nearest-neighbors (which would need a per-point kNN pass; the
block form needs only ONE grid-bounded join and is the scale-honest
variant at 10¹² points).

Every reduction is an exact integer sum, so the single double ratio is
engine-identical (rule 16: rounded to 6 dp). Scale shape: points
collapse to (cell, category) counts at ONE map-side-combinable
aggregate; the 9-offset explode + equi-join and both final aggregates
run over CELL×CATEGORY rows. Output is |categories|² rows.

Reference scope: no morituri counterpart; extends the density family
(geo/clustering.py) for caption/category co-occurrence mining.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_KEY_SPAN = 1_000_000


def colocation_quotient(
    df: DataFrame,
    cat_col: str = "cat",
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
) -> DataFrame:
    """→ (cat_a, cat_b, c_ab, t_a, clq) for every ordered category pair
    with at least one a-neighbor (T_a > 0; pairs with C_ab = 0 are kept —
    a true zero is the strongest segregation signal). Requires N ≥ 2 and
    drops target categories where N_b − [a=b] = 0 (CLQ undefined)."""
    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    cell = F.lit(float(cell_deg))
    # ONE point-bounded aggregate; referenced by both join sides and the
    # global sums — grid-bounded, one localCheckpoint (rule 21/10)
    cells = (
        df.select(
            F.floor(F.col(lon) / cell).cast("long").alias("ix"),
            F.floor(F.col(lat) / cell).cast("long").alias("iy"),
            F.col(cat_col).alias("_cat"),
        )
        .groupBy("ix", "iy", "_cat")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint()
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    left = cells.select(
        F.col("_cat").alias("cat_a"),
        F.col("_n").alias("_na"),
        F.explode(
            F.array(*[
                ((F.col("ix") + F.lit(dx)) * F.lit(_KEY_SPAN) + F.col("iy") + F.lit(dy))
                for dx, dy in offsets
            ])
        ).alias("_v"),
    )
    right = cells.select(
        (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("_v"),
        F.col("_cat").alias("cat_b"),
        F.col("_n").alias("_nb"),
    )
    raw = (
        left.join(right, "_v")
        .groupBy("cat_a", "cat_b")
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_raw"))
    )
    totals = cells.groupBy("_cat").agg(F.sum("_n").alias("_ncat"))
    grand = totals.agg(F.sum("_ncat").alias("_n_all"))

    # full category grid so a NEVER-co-occurring pair surfaces as the
    # true zero it is (the strongest segregation signal) — |cats|² rows,
    # left-joined to the observed sums
    grid = (
        totals.select(F.col("_cat").alias("cat_a"), F.col("_ncat").alias("_na_tot"))
        .crossJoin(
            totals.select(F.col("_cat").alias("cat_b"), F.col("_ncat").alias("_nb_tot"))
        )
    )
    # self-pair correction: a point is not its own neighbor
    c_ab = F.coalesce(F.col("_raw"), F.lit(0)) - F.when(
        F.col("cat_a") == F.col("cat_b"), F.col("_na_tot")
    ).otherwise(F.lit(0))
    j = (
        grid.join(raw, ["cat_a", "cat_b"], "left")
        .crossJoin(F.broadcast(grand))
        .select(
            "cat_a", "cat_b",
            c_ab.alias("c_ab"),
            F.col("_na_tot"), F.col("_nb_tot"), F.col("_n_all"),
        )
    )
    # T_a = Σ_b C_ab — a second tiny aggregate over the |cats|² rows
    t_a = j.groupBy("cat_a").agg(F.sum("c_ab").alias("t_a"))
    staged = (
        j.join(t_a, "cat_a")
        .withColumn(
            "_nb_eff",
            F.col("_nb_tot")
            - F.when(F.col("cat_a") == F.col("cat_b"), F.lit(1)).otherwise(F.lit(0)),
        )
        .where((F.col("t_a") > 0) & (F.col("_nb_eff") > 0) & (F.col("_n_all") > 1))
    )
    clq_raw = (
        F.col("c_ab").cast("double") / F.col("t_a").cast("double")
    ) / (
        F.col("_nb_eff").cast("double")
        / (F.col("_n_all").cast("double") - F.lit(1.0))
    )
    clq = F.floor(clq_raw * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    return staged.select("cat_a", "cat_b", "c_ab", "t_a", clq.alias("clq"))
