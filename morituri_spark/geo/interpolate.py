"""IDW (inverse-distance-weighted) surface interpolation on the cell grid.

Scattered samples → a gridded estimate surface: every sample contributes
to its own cell and the 8 neighbors, weighted by 1/(ε + d²) to the target
cell center. The classic raster-analytics op (temperature/elevation
surfaces; here: caption-density or quality-score surfaces over image
capture locations).

DETERMINISM CONTRACT (the scale feature): floating-point Σwᵢvᵢ is
partition-order-dependent — the same job on 32 vs 1000 executors (or two
runs with AQE) returns different last-ulp results, which poisons
downstream exact dedup/fingerprint stages. This implementation QUANTIZES
weights and values to integers (w = ⌊1e9/(1e-3+d²)⌋, v = ⌊value·1000⌋)
and sums them as DECIMAL(38,0) — exact at any parallelism, identical in
Spark and the SQL oracle, at a documented ≤0.1% weight / ≤0.001 value
quantization cost. The only float ops are the per-row d² (a fixed IEEE
expression of exact inputs) and ONE final division, rule-16 rounded.

Plan shape: bin → 9-way neighbor explode (shuffle volume 9·|points| of
small ints, the thin-cover discipline) → one map-side-combinable
aggregate over target cells. No join at all — the contribution explode
IS the candidate generation, so grid scale-up never changes the plan.

Reference scope: no counterpart in morituri (raster side stops at tile
rollups); extends the density/hotspot family (geo/clustering.py).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

W_SCALE = 1e9      # weight quantizer: w = floor(W_SCALE / (EPS + d2))
EPS = 1e-3         # caps the weight at 1e12 when a sample sits on a center
V_SCALE = 1000.0   # value quantizer: v = floor(value * V_SCALE)


def idw_surface(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    value_col: str = "value",
    cell_deg: float = 1.0,
) -> DataFrame:
    """→ (ix, iy, n_samples, idw_value): inverse-distance-squared estimate
    at each cell center from the samples in the 3×3 cell neighborhood
    (cells with no sample in their neighborhood emit nothing — they have
    no support). ``idw_value`` = Σwᵢvᵢ/Σwᵢ over quantized integers,
    rounded half-up to 6 dp."""
    cell = F.lit(float(cell_deg))
    # rule 9: stage bin/quantize as their own projection so the neighbor
    # explode references computed columns, not re-evaluated expressions
    binned = df.select(
        F.floor(F.col(lon) / cell).cast("long").alias("_px_ix"),
        F.floor(F.col(lat) / cell).cast("long").alias("_px_iy"),
        F.col(lon).cast("double").alias("_x"),
        F.col(lat).cast("double").alias("_y"),
        F.floor(F.col(value_col).cast("double") * F.lit(V_SCALE))
        .cast("long")
        .alias("_vq"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    contrib = binned.select(
        "_x", "_y", "_vq",
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("_px_ix") + F.lit(dx)).alias("ix"),
                    (F.col("_px_iy") + F.lit(dy)).alias("iy"),
                )
                for dx, dy in offsets
            ])
        ).alias("_t"),
    ).select("_x", "_y", "_vq", F.col("_t.ix").alias("ix"), F.col("_t.iy").alias("iy"))
    # target cell center; d² is one fixed IEEE expression of exact inputs
    cx = (F.col("ix").cast("double") + F.lit(0.5)) * cell
    cy = (F.col("iy").cast("double") + F.lit(0.5)) * cell
    d2 = (F.col("_x") - cx) * (F.col("_x") - cx) + (F.col("_y") - cy) * (F.col("_y") - cy)
    staged = contrib.select(
        "ix", "iy", "_vq",
        F.floor(F.lit(W_SCALE) / (F.lit(EPS) + d2)).cast("long").alias("_wq"),
    )
    agg = staged.groupBy("ix", "iy").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col("_wq").cast("decimal(38,0)")).alias("_sw"),
        F.sum(
            F.col("_wq").cast("decimal(19,0)") * F.col("_vq").cast("decimal(19,0)")
        ).alias("_swv"),
    )
    est = (
        F.col("_swv").cast("double")
        / F.col("_sw").cast("double")
        / F.lit(V_SCALE)
    )
    rounded = F.floor(est * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    return agg.where(F.col("_sw") > 0).select(
        "ix", "iy", "n_samples", rounded.alias("idw_value")
    )
