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


# --- GWR (r5 twelfth session) ------------------------------------------------
#
# Geographically weighted regression: at each cell center fit
# value ~ β0 + βx·x + βy·y by weighted least squares over the samples in
# the 3×3 neighborhood (Fotheringham/Brunsdon/Charlton's local-regression
# method — the standard "does the trend itself vary over space" upgrade
# of a global OLS surface). Where IDW answers "what is the local level",
# GWR answers "what is the local level AND local gradient".
#
# Same determinism contract as idw_surface: regressors, weights, and
# values are quantized to integers (x, y in 1e-6-cell local units around
# the target cell center; w = ⌊1e21 / (1e9 + xq² + yq²)⌋, the
# cell-unit 1/(1e-3 + d²) kernel scaled integer-exact; v = ⌊value·1000⌋)
# and the NINE weighted moments Σw, Σwx, Σwy, Σwx², Σwxy, Σwy², Σwv,
# Σwxv, Σwyv accumulate as DECIMAL(38,0) — exact at any parallelism.
# Every per-moment product is exactly ONE DECIMAL(19)×DECIMAL(19)
# multiply (the long-typed factor pairs are pre-staged), so neither
# engine's decimal type system overflows. The 3×3 normal equations are
# then solved in closed form (Cramer) in DOUBLE from the exact moments —
# the _GWR_* expression strings below are evaluated verbatim by BOTH
# Spark and the DuckDB oracle, so the only float arithmetic is a shared
# IEEE expression tree of identical exact inputs.

_GWR_DET = (
    "(s0*(sxx*syy - sxy*sxy) - sx*(sx*syy - sxy*sy) + sy*(sx*sxy - sxx*sy))"
)
_GWR_N0 = (
    "(sv*(sxx*syy - sxy*sxy) - sx*(sxv*syy - sxy*syv) + sy*(sxv*sxy - sxx*syv))"
)
_GWR_N1 = (
    "(s0*(sxv*syy - sxy*syv) - sv*(sx*syy - sxy*sy) + sy*(sx*syv - sxv*sy))"
)
_GWR_N2 = (
    "(s0*(sxx*syv - sxv*sxy) - sx*(sx*syv - sxv*sy) + sv*(sx*sxy - sxx*sy))"
)
# relative conditioning gate: |D| must exceed 1e-9 of the determinant's
# own term magnitudes, or the local design is (numerically) collinear —
# deterministic cross-engine because D and the terms are shared
# expressions of exact integers
_GWR_GATE = (
    f"abs({_GWR_DET}) > 1e-9 * (abs(s0*(sxx*syy - sxy*sxy))"
    " + abs(sx*(sx*syy - sxy*sy)) + abs(sy*(sx*sxy - sxx*sy)))"
)
# natural-unit conversion: regressors are 1e-6-cell integers and values
# are 1e-3 units, so βx,βy (value per cell) pick up ·1e6/1e3 = ·1e3 and
# β0 picks up /1e3; rule-16 rounding shared with the oracle
_GWR_B0 = f"floor({_GWR_N0} / {_GWR_DET} / 1e3 * 1e6 + 0.5 + 1e-8) / 1e6"
_GWR_BX = f"floor({_GWR_N1} / {_GWR_DET} * 1e3 * 1e6 + 0.5 + 1e-8) / 1e6"
_GWR_BY = f"floor({_GWR_N2} / {_GWR_DET} * 1e3 * 1e6 + 0.5 + 1e-8) / 1e6"


def gwr_surface(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    value_col: str = "value",
    cell_deg: float = 1.0,
) -> DataFrame:
    """→ (ix, iy, n_samples, beta0, beta_x, beta_y): local weighted-OLS
    fit of ``value_col`` on position at each cell center from the 3×3
    neighborhood samples. ``beta0`` is the fitted value AT the center
    (local coordinates are centered there); ``beta_x``/``beta_y`` are the
    local gradients in value-per-cell units, all rounded half-up to 6 dp.
    Cells whose local design is collinear (conditioning gate above) or
    has < 3 samples emit nothing.

    Plan shape (the scale feature, same as :func:`idw_surface`): bin →
    9-way neighbor explode of SMALL integer rows → ONE map-side-
    combinable decimal aggregate → closed-form Catalyst solve. No join,
    no UDF, no sort; grid scale-up never changes the plan."""
    cell = F.lit(float(cell_deg))
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
    # quantized local coordinates (1e-6-cell integer units around the
    # target center) — staged projection (rule 9) so the moment products
    # reference computed longs, not re-evaluated float expressions
    xq = F.floor(
        (F.col("_x") / cell - (F.col("ix").cast("double") + F.lit(0.5))) * F.lit(1e6)
    ).cast("long")
    yq = F.floor(
        (F.col("_y") / cell - (F.col("iy").cast("double") + F.lit(0.5))) * F.lit(1e6)
    ).cast("long")
    q = contrib.select(
        "ix", "iy", "_vq", xq.alias("_xq"), yq.alias("_yq")
    )
    # integer weight from the quantized offsets: 1e21/(1e9 + d2q) is the
    # cell-unit 1/(1e-3 + d²) kernel ×1e12; the division is ONE exactly-
    # rounded IEEE op of exact inputs, identical in both engines
    staged = q.select(
        "ix", "iy",
        F.floor(F.lit(1e21) / (F.lit(1e9) + (F.col("_xq") * F.col("_xq")
                                             + F.col("_yq") * F.col("_yq"))
                               .cast("double")))
        .cast("long").alias("_wq"),
        "_xq", "_yq", "_vq",
        (F.col("_xq") * F.col("_xq")).alias("_xx"),
        (F.col("_xq") * F.col("_yq")).alias("_xy"),
        (F.col("_yq") * F.col("_yq")).alias("_yy"),
        (F.col("_xq") * F.col("_vq")).alias("_xv"),
        (F.col("_yq") * F.col("_vq")).alias("_yv"),
    )

    def _m(a: str, b: str | None = None):
        w = F.col(a).cast("decimal(19,0)")
        return F.sum(w if b is None else w * F.col(b).cast("decimal(19,0)"))

    agg = staged.groupBy("ix", "iy").agg(
        F.count(F.lit(1)).alias("n_samples"),
        _m("_wq").alias("_s0"),
        _m("_wq", "_xq").alias("_sx"),
        _m("_wq", "_yq").alias("_sy"),
        _m("_wq", "_xx").alias("_sxx"),
        _m("_wq", "_xy").alias("_sxy"),
        _m("_wq", "_yy").alias("_syy"),
        _m("_wq", "_vq").alias("_sv"),
        _m("_wq", "_xv").alias("_sxv"),
        _m("_wq", "_yv").alias("_syv"),
    )
    dbl = agg.select(
        "ix", "iy", "n_samples",
        *[
            F.col(f"_s{k}").cast("double").alias(f"s{k}")
            for k in ("0", "x", "y", "xx", "xy", "yy", "v", "xv", "yv")
        ],
    )
    return (
        dbl.where(F.col("n_samples") >= 3)
        .where(F.expr(_GWR_GATE))
        .select(
            "ix", "iy", "n_samples",
            F.expr(_GWR_B0).alias("beta0"),
            F.expr(_GWR_BX).alias("beta_x"),
            F.expr(_GWR_BY).alias("beta_y"),
        )
    )
