"""Grid-density spatial clustering (DBSCAN-over-cells) and hotspot cells.

Two analytics built on the density-surface primitive (geo/density.py):

- :func:`grid_clusters` — the grid formulation of density-based
  clustering: points collapse to integer cells at ONE map-side-combinable
  aggregate; cells holding ≥ ``min_pts`` points are *core*; 8-adjacent
  core cells merge into clusters via the distributed large-star /
  small-star connected components (text/components.py — per-round lineage
  truncation, bit_xor convergence). Every stage is data-bounded only at
  the first aggregate; the edge join and CC rounds run over CELLS, so at
  10^12 points on a 10^7-cell grid the iterative part is ~10^7 rows.
- :func:`hotspot_cells` — Getis-Ord-flavored z-scores over occupied
  cells: μ/σ computed from EXACT integer sums (Σn, Σn², count), so both
  engines evaluate the identical double arithmetic — no accumulation-
  order dust for the oracle compare (CLAUDE.md rule 16 applies only to
  the final division, shared-epsilon rounded).
- :func:`morans_i` — global Moran's I spatial autocorrelation over the
  same occupied-cell grid with binary 8-neighbor weights. The cross
  term Σ_w (x_i−μ)(x_j−μ) expands to S_xy − μ·S_xs + W·μ², so every
  data-dependent reduction is an EXACT integer sum (Σ x_i x_j,
  Σ (x_i+x_j), pair count) and the single double expression evaluates
  identically in Spark and the SQL oracle.

Cell key packing: ``key = ix * 1_000_000 + iy`` — injective while
``|iy| < 500_000`` (any geographic grid at cell_deg ≥ 1e-3°; asserted),
and replayable as plain integer algebra by the SQL oracle.

Reference scope: no counterpart in morituri (raster side stops at tile
rollups); extends the density family for the training-data use cases
(dense-capture-region mining, over-represented-location downweighting).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .density import bin_cells

_KEY_SPAN = 1_000_000


def grid_clusters(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
    min_pts: int = 2,
    max_rounds: int = 30,
) -> DataFrame:
    """→ (ix, iy, n_points, cluster_id) for every core cell; cluster_id is
    the minimum packed cell key of the connected component (8-adjacency
    between core cells), so labels are deterministic."""
    from ..text.components import connected_components

    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    cells = bin_cells(df, lon, lat, cell_deg).where(
        F.col("n_points") >= F.lit(int(min_pts))
    )
    # core is referenced THREE times (neighbor explode, join-back side,
    # final label join): without materialization each branch re-runs the
    # full point aggregate (rule 21/22). The table is grid-bounded (tiny),
    # so one localCheckpoint trades three 10^12-row scans for one.
    core = cells.select(
        "ix", "iy", "n_points",
        (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("key"),
    ).localCheckpoint()

    edges = _neighbor_pairs(core).select("u", "v")

    labels = connected_components(edges, a_col="u", b_col="v", max_rounds=max_rounds)
    out = core.join(
        labels.withColumnRenamed("node", "key"), "key", "left"
    ).select(
        "ix", "iy", "n_points",
        # isolated core cells (no core neighbor) are their own cluster
        F.coalesce("cluster_id", "key").alias("cluster_id"),
    )
    return out


def _neighbor_pairs(core: DataFrame) -> DataFrame:
    """Ordered 8-adjacent pairs between core cells: each cell explodes to
    its 8 neighbor keys and equi-joins back on the core set — shuffle
    carries keys only (the thin-cover shape), never cell×cell."""
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    nbr = core.select(
        F.col("key").alias("u"),
        F.col("n_points").alias("n_u"),
        F.explode(
            F.array(*[
                ((F.col("ix") + F.lit(dx)) * F.lit(_KEY_SPAN) + F.col("iy") + F.lit(dy))
                for dx, dy in offsets
            ])
        ).alias("v"),
    )
    return nbr.join(
        core.select(F.col("key").alias("v"), F.col("n_points").alias("n_v")),
        "v",
        "inner",
    )


def morans_i(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
) -> DataFrame:
    """→ ONE row (n_cells, w_pairs, morans_i): global Moran's I of the
    occupied-cell point counts under binary 8-neighbor weights (W = count
    of ORDERED adjacent pairs, the standard row-binary formulation over
    the occupied cells only — empty cells carry no observation).

        I = (N / W) · Σ_w (x_i−μ)(x_j−μ) / Σ (x_i−μ)²
          = N·(S_xy − μ·S_xs + W·μ²) / (W·(S₂ − N·μ²))

    with S_xy = Σ_w x_i·x_j, S_xs = Σ_w (x_i+x_j), S₁/S₂/N the cell sums
    — all exact integer aggregates, so the only float math is one shared
    expression tree (rule 16: shared-epsilon rounded to 6 dp). Cells with
    no occupied neighbor contribute to N/S₁/S₂ but not W; the row is
    empty when W = 0 (no adjacent occupied cells — I undefined)."""
    # one materialization of the grid-bounded cell table — the pair sums
    # (a self-join) and the cell sums would otherwise each re-run the
    # full point aggregate
    cells = bin_cells(df, lon, lat, cell_deg).localCheckpoint()
    core = cells.select(
        "ix", "iy", "n_points",
        (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("key"),
    )
    pair_sums = _neighbor_pairs(core).agg(
        F.sum(F.col("n_u") * F.col("n_v")).alias("_sxy"),
        F.sum(F.col("n_u") + F.col("n_v")).alias("_sxs"),
        F.count(F.lit(1)).alias("_w"),
    )
    cell_sums = cells.agg(
        F.sum("n_points").alias("_s1"),
        F.sum(F.col("n_points") * F.col("n_points")).alias("_s2"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = cell_sums.crossJoin(F.broadcast(pair_sums))
    n_d = F.col("_n").cast("double")
    w_d = F.col("_w").cast("double")
    mu = F.col("_s1").cast("double") / n_d
    num = n_d * (F.col("_sxy").cast("double") - mu * F.col("_sxs").cast("double") + w_d * mu * mu)
    den = w_d * (F.col("_s2").cast("double") - n_d * mu * mu)
    i_raw = num / den
    i6 = F.floor(i_raw * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    return j.where(F.col("_w") > 0).select(
        F.col("_n").alias("n_cells"),
        F.col("_w").alias("w_pairs"),
        i6.alias("morans_i"),
    )


def hotspot_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
    z_threshold: float = 2.0,
) -> DataFrame:
    """→ (ix, iy, n_points, z) for occupied cells whose count sits
    ``z_threshold`` sample standard deviations above the occupied-cell
    mean. μ and σ² derive from exact integer sums (no stddev() — its
    accumulation order is nondeterministic across engines); z is
    shared-epsilon rounded to 6 decimals before the threshold gate so the
    boundary cannot flip between engines."""
    # stats + the per-cell z both consume the cell table — materialize it
    # once (grid-bounded) instead of re-running the point aggregate twice
    cells = bin_cells(df, lon, lat, cell_deg).localCheckpoint()
    stats = cells.agg(
        F.sum("n_points").alias("_s1"),
        F.sum(F.col("n_points") * F.col("n_points")).alias("_s2"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    joined = cells.crossJoin(F.broadcast(stats))
    mu = F.col("_s1").cast("double") / F.col("_cnt").cast("double")
    var = (
        F.col("_s2").cast("double") - F.col("_s1").cast("double") * mu
    ) / (F.col("_cnt").cast("double") - F.lit(1.0))
    staged = joined.select(
        "ix", "iy", "n_points",
        ((F.col("n_points").cast("double") - mu) / F.sqrt(var)).alias("_z_raw"),
    )
    z = F.floor(F.col("_z_raw") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    return staged.select("ix", "iy", "n_points", z.alias("z")).where(
        F.col("z") >= F.lit(float(z_threshold))
    )


def dbscan_points(
    df: DataFrame,
    eps_km: float,
    min_pts: int,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    max_rounds: int = 30,
) -> DataFrame:
    """Point-level DBSCAN over great-circle distance — the exact-eps
    companion to :func:`grid_clusters` (which buckets to cells first).

    → (id, is_core, cluster_id): sklearn-equivalent core/noise sets
    (``min_pts`` counts the point itself), with two determinism pins
    sklearn does not make: cluster labels are the component-minimum core
    id, and a border point reachable from SEVERAL clusters takes the
    MINIMUM label (sklearn's border assignment is scan-order-dependent).
    Noise labels are -1, never NULL.

    Scale shape: the only corpus-sized stages are the radius_join
    (one cell equi-join, geo/knn.py) and two keyed aggregates (degree
    count, border min-label); the iterative CC runs over CORE-CORE edges
    only. The directed pair set feeds THREE consumers (degree, core
    edges, border labels) — one localCheckpoint instead of three
    radius joins (rule 21/10).
    """
    from ..text.components import connected_components
    from .knn import radius_join

    pts = df.select(F.col(id_col).alias("_pid"), lon, lat)
    a = pts.select(F.col("_pid").alias("id_a"), lon, lat)
    b = pts.select(F.col("_pid").alias("id_b"), lon, lat)
    # directed pairs INCLUDING the self-pair (dist 0) — degree then counts
    # the point itself, matching sklearn's min_samples convention
    pairs = radius_join(a, b, eps_km).localCheckpoint()

    deg = pairs.groupBy("id_a").agg(F.count(F.lit(1)).alias("_n"))
    core = (
        deg.where(F.col("_n") >= F.lit(int(min_pts)))
        .select(F.col("id_a").alias("_cid"))
        .localCheckpoint()
    )

    core_edges = (
        pairs.where(F.col("id_a") < F.col("id_b"))
        .join(core.withColumnRenamed("_cid", "id_a"), "id_a")
        .join(core.withColumnRenamed("_cid", "id_b"), "id_b")
        .select("id_a", "id_b")
    )
    labels = connected_components(
        core_edges, a_col="id_a", b_col="id_b", max_rounds=max_rounds
    )

    core_lbl = (
        core.join(
            labels.withColumnRenamed("node", "_cid"), "_cid", "left"
        )
        # isolated cores (no core neighbor) are their own cluster
        .select(
            F.col("_cid").alias("_pid"),
            F.coalesce("cluster_id", F.col("_cid")).alias("_core_lbl"),
        )
        .localCheckpoint()
    )
    border_lbl = (
        pairs.join(
            core_lbl.withColumnRenamed("_pid", "id_b"), "id_b"
        )
        .groupBy("id_a")
        .agg(F.min("_core_lbl").alias("_border_lbl"))
        .withColumnRenamed("id_a", "_pid")
    )
    return (
        pts.select("_pid")
        .join(core_lbl, "_pid", "left")
        .join(border_lbl, "_pid", "left")
        .select(
            F.col("_pid").alias(id_col),
            F.col("_core_lbl").isNotNull().alias("is_core"),
            F.coalesce("_core_lbl", "_border_lbl", F.lit(-1)).alias("cluster_id"),
        )
    )
