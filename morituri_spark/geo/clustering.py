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

from pyspark.sql import DataFrame, Window, functions as F

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


def gi_star_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
    z_threshold: float = 1.0,
) -> DataFrame:
    """Getis-Ord Gi* hotspot statistic over occupied grid cells.

    → (ix, iy, n_points, w_i, s_i, gi_z) for every occupied cell whose
    |Gi*| ≥ ``z_threshold`` — positive z = hot spot (the cell AND its
    neighborhood carry more mass than chance), negative z = cold spot.
    Binary weights over the 3×3 block INCLUDING self (the * variant),
    restricted to OCCUPIED cells (empty cells carry no observation —
    the same convention as :func:`morans_i`).

        Gi* = (S_i − μ·W_i) / (σ·sqrt((N·W_i − W_i²)/(N−1)))

    with S_i = Σ_{j∈3×3(i)} x_j, W_i = |occupied ∩ 3×3(i)|, μ = Σx/N,
    σ the POPULATION sd (the standard Gi* formulation). Every
    data-dependent reduction is an exact integer sum (per-cell S_i/W_i
    from the 9-way key explode + equi-join; global Σx, Σx², N), so both
    engines evaluate ONE identical double expression; gi_z is rule-16
    rounded to 6 dp before the threshold gate.

    Scale shape: points collapse to cells at bin_cells' ONE map-side-
    combinable aggregate; the neighbor explode + equi-join and both
    aggregates run over CELLS (≤ 9·occupied rows) — the same
    grid-bounded story as :func:`morans_i`. Cells where the denominator
    degenerates (W_i = N, or σ = 0) are dropped — Gi* is undefined there.
    """
    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    # referenced three times (explode side, join-back side, global stats)
    # — grid-bounded, one localCheckpoint instead of three point scans
    cells = bin_cells(df, lon, lat, cell_deg).localCheckpoint()
    core = cells.select(
        "ix", "iy", "n_points",
        (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("key"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    nbr = core.select(
        F.col("key").alias("u"),
        F.explode(
            F.array(*[
                ((F.col("ix") + F.lit(dx)) * F.lit(_KEY_SPAN) + F.col("iy") + F.lit(dy))
                for dx, dy in offsets
            ])
        ).alias("v"),
    ).join(
        core.select(F.col("key").alias("v"), F.col("n_points").alias("n_v")),
        "v",
        "inner",
    )
    local = nbr.groupBy("u").agg(
        F.sum("n_v").alias("_si"),
        F.count(F.lit(1)).alias("_wi"),
    )
    stats = cells.agg(
        F.sum("n_points").alias("_s1"),
        F.sum(F.col("n_points") * F.col("n_points")).alias("_s2"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = (
        core.join(local, core["key"] == local["u"], "inner")
        .crossJoin(F.broadcast(stats))
    )
    n_d = F.col("_n").cast("double")
    w_d = F.col("_wi").cast("double")
    mu = F.col("_s1").cast("double") / n_d
    sigma = F.sqrt(F.col("_s2").cast("double") / n_d - mu * mu)
    denom = sigma * F.sqrt((n_d * w_d - w_d * w_d) / (n_d - F.lit(1.0)))
    # degenerate-denominator guard as EXACT integer predicates (a float
    # `denom > 0` lets NaN through — Spark orders NaN above every double —
    # and float dust could flip the gate between engines): variance > 0
    # iff N·Σx² − (Σx)² > 0, and N·W − W² > 0 iff W < N (W ≥ 1 via self)
    staged = j.where(
        (F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1") > 0)
        & (F.col("_wi") < F.col("_n"))
    ).select(
        "ix", "iy", "n_points", F.col("_wi").alias("w_i"),
        F.col("_si").alias("s_i"),
        ((F.col("_si").cast("double") - mu * w_d) / denom).alias("_z_raw"),
    )
    z = F.floor(F.col("_z_raw") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)
    return (
        staged.select("ix", "iy", "n_points", "w_i", "s_i", z.alias("gi_z"))
        .where(F.abs(F.col("gi_z")) >= F.lit(float(z_threshold)))
    )


def local_morans_cells(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Local Moran's I (Anselin LISA) per occupied grid cell — the local
    companion to :func:`morans_i` (which returns one global statistic)
    and :func:`gi_star_cells` (which measures neighborhood TOTALS; LISA
    measures neighborhood CO-DEVIATION, so it separates high-surrounded-
    by-high from high-surrounded-by-low).

    → (ix, iy, n_points, w_i, s_i, lisa_i, quadrant) for every occupied
    cell with ≥1 occupied 8-neighbor and non-degenerate variance:

        I_i = (x_i − μ)·(S_i − W_i·μ) / m2,   m2 = S₂/N − μ²

    with S_i = Σ_{j∈nbr(i)} x_j (EXCLUDING self — the standard LISA
    weights), W_i the occupied-neighbor count, μ/m2 from the occupied-cell
    population. quadrant ∈ {'HH','LL','HL','LH'} classifies the cell's
    own deviation × its neighborhood-mean deviation — and both gates are
    EXACT integer comparisons (x_i > μ ⟺ N·x_i > S₁; S_i/W_i > μ ⟺
    N·S_i > W_i·S₁), so the label can never flip on float dust between
    engines. lisa_i is the single shared double expression, rule-16
    rounded to 6 dp.

    Scale shape: identical to :func:`gi_star_cells` — one point-bounded
    map-side-combinable aggregate, then the 8-key explode + equi-join and
    two aggregates over CELLS only.
    """
    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    # referenced three times (explode side, join-back side, global stats)
    cells = bin_cells(df, lon, lat, cell_deg).localCheckpoint()
    core = cells.select(
        "ix", "iy", "n_points",
        (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("key"),
    )
    local = _neighbor_pairs(core).groupBy("u").agg(
        F.sum("n_v").alias("_si"),
        F.count(F.lit(1)).alias("_wi"),
    )
    stats = cells.agg(
        F.sum("n_points").alias("_s1"),
        F.sum(F.col("n_points") * F.col("n_points")).alias("_s2"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = (
        core.join(local, core["key"] == local["u"], "inner")
        .crossJoin(F.broadcast(stats))
    )
    n_d = F.col("_n").cast("double")
    mu = F.col("_s1").cast("double") / n_d
    m2 = F.col("_s2").cast("double") / n_d - mu * mu
    x_d = F.col("n_points").cast("double")
    i_raw = (x_d - mu) * (F.col("_si").cast("double") - F.col("_wi").cast("double") * mu) / m2
    # variance > 0 iff N·Σx² − (Σx)² > 0 — exact integer guard (a float
    # m2 > 0 lets NaN/dust through, same rationale as gi_star_cells)
    staged = j.where(
        F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1") > 0
    ).select(
        "ix", "iy", "n_points",
        F.col("_wi").alias("w_i"), F.col("_si").alias("s_i"),
        (F.floor(i_raw * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
         / F.lit(1e6)).alias("lisa_i"),
        # EXACT integer quadrant gates: scale both sides by N (and W_i)
        (F.col("_n") * F.col("n_points") > F.col("_s1")).alias("_own_hi"),
        (F.col("_n") * F.col("_si") > F.col("_wi") * F.col("_s1")).alias("_nbr_hi"),
    )
    return staged.select(
        "ix", "iy", "n_points", "w_i", "s_i", "lisa_i",
        F.when(F.col("_own_hi") & F.col("_nbr_hi"), F.lit("HH"))
        .when(~F.col("_own_hi") & ~F.col("_nbr_hi"), F.lit("LL"))
        .when(F.col("_own_hi"), F.lit("HL"))
        .otherwise(F.lit("LH"))
        .alias("quadrant"),
    )


def mann_kendall_cells(
    df: DataFrame,
    n_bins: int,
    lon: str = "lon",
    lat: str = "lat",
    t_bin: str = "t_bin",
    cell_deg: float = 1.0,
    z_threshold: float = 1.0,
) -> DataFrame:
    """Emerging-hotspot trend detection: per-cell Mann-Kendall test over
    a dense space-time cube (the grid analogue of ArcGIS's Emerging Hot
    Spot Analysis).

    Input rows carry (lon, lat, ``t_bin``) with t_bin ∈ [0, n_bins);
    the caller bins time however it likes (rule 12 NTZ forms for
    timestamps). → (ix, iy, total_points, s_stat, mk_z, trend) for every
    occupied cell: s_stat = Σ_{i<j} sign(x_j − x_i) over the cell's
    T = ``n_bins`` counts (missing bins count as ZERO — the cube is
    densified per occupied cell), tie-corrected normal approximation

        Var(S) = [T(T−1)(2T+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
        z = (S∓1)/sqrt(Var)  (continuity-corrected; 0 when S = 0 or Var = 0)

    and trend ∈ {'up','down','none'} by ``z_threshold``. S and the tie
    term are exact integers; z is the single shared double expression,
    rule-16 rounded to 6 dp before classification.

    Scale shape: points collapse to (cell, bin) counts at ONE map-side-
    combinable aggregate; densification explodes a closed-form
    sequence(0, T−1) per occupied cell; the pair self-join keys on the
    packed cell key so pairs (T(T−1)/2 per cell) are generated join-side
    and immediately partially aggregated — shuffle volume stays
    O(cells·T), never point-bounded. At 10¹² points on a 10⁷-cell grid
    with T = 64 the pair stage is ~2·10¹⁰ generated-then-folded rows
    across the cluster, with nothing materialized.
    """
    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    if n_bins < 2:
        raise ValueError(f"n_bins={n_bins} < 2: Mann-Kendall needs ≥ 2 bins")
    cell = F.lit(float(cell_deg))
    cube = (
        df.select(
            F.floor(F.col(lon) / cell).cast("long").alias("ix"),
            F.floor(F.col(lat) / cell).cast("long").alias("iy"),
            F.col(t_bin).cast("long").alias("_t"),
        )
        .groupBy("ix", "iy", "_t")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # densify: every occupied cell × every bin, zeros filled — referenced
    # by BOTH the pair join (twice) and the tie/total aggregates; the
    # cube is grid-bounded so one localCheckpoint beats four point scans
    occupied = cube.groupBy("ix", "iy").agg(F.sum("_n").alias("_total"))
    dense = (
        occupied.select(
            "ix", "iy", "_total",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_bins) - 1))).alias("_t"),
        )
        .join(cube, ["ix", "iy", "_t"], "left")
        .select(
            "ix", "iy", "_total", "_t",
            F.coalesce("_n", F.lit(0)).alias("_x"),
            (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("_key"),
        )
        .localCheckpoint()
    )
    keyed = dense.groupBy("_key").agg(
        F.first("ix").alias("ix"), F.first("iy").alias("iy"),
        F.first("_total").alias("total_points"),
    )
    staged = keyed.join(_mk_trend(dense, n_bins, "_x"), "_key").select(
        "ix", "iy", "total_points", F.col("_s").alias("s_stat"),
        "_z_raw",
    )
    # classify on the ROUNDED z (rule 16: the gate must see the same value
    # in both engines, or boundary dust flips the label)
    z6 = staged.select(
        "ix", "iy", "total_points", "s_stat",
        (F.floor(F.col("_z_raw") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
         / F.lit(1e6)).alias("mk_z"),
    )
    thr = F.lit(float(z_threshold))
    return z6.select(
        "ix", "iy", "total_points", "s_stat", "mk_z",
        F.when(F.col("mk_z") >= thr, F.lit("up"))
        .when(F.col("mk_z") <= -thr, F.lit("down"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


def _mk_trend(dense: DataFrame, n_bins: int, x_col: str) -> DataFrame:
    """(_key, _s, _z_raw): tie-corrected Mann-Kendall over the per-key
    series in ``dense`` (one row per (_key, _t); ``x_col`` the value —
    exact longs in :func:`mann_kendall_cells`, rule-16-rounded doubles in
    :func:`emerging_gi_star`; rounded doubles compare exactly, so the
    sign/tie algebra stays engine-identical either way)."""
    a = dense.select("_key", F.col("_t").alias("_ta"), F.col(x_col).alias("_xa"))
    b = dense.select("_key", F.col("_t").alias("_tb"), F.col(x_col).alias("_xb"))
    s = (
        a.join(b, "_key")
        .where(F.col("_tb") > F.col("_ta"))
        .groupBy("_key")
        .agg(F.sum(F.signum(F.col("_xb") - F.col("_xa")).cast("long")).alias("_s"))
    )
    t_i = F.col("_tg").cast("double")
    ties = (
        dense.groupBy("_key", x_col)
        .agg(F.count(F.lit(1)).alias("_tg"))
        .groupBy("_key")
        .agg(F.sum(t_i * (t_i - 1.0) * (2.0 * t_i + 5.0)).alias("_tie"))
    )
    t_d = float(n_bins)
    var_s = (
        F.lit(t_d * (t_d - 1.0) * (2.0 * t_d + 5.0)) - F.col("_tie")
    ) / F.lit(18.0)
    s_d = F.col("_s").cast("double")
    z_raw = F.when(
        (F.col("_s") == 0) | (var_s <= F.lit(0.0)), F.lit(0.0)
    ).otherwise(
        (s_d - F.signum(s_d)) / F.sqrt(var_s)
    )
    return s.join(ties, "_key").select("_key", "_s", z_raw.alias("_z_raw"))


def emerging_gi_star(
    df: DataFrame,
    n_bins: int,
    lon: str = "lon",
    lat: str = "lat",
    t_bin: str = "t_bin",
    cell_deg: float = 1.0,
    z_threshold: float = 1.0,
) -> DataFrame:
    """Full emerging-hot-spot analysis (the ESRI space-time-cube method):
    per-BIN Getis-Ord Gi* over the densified cube, then tie-corrected
    Mann-Kendall over each cell's Gi* z SERIES — a cell trends 'up' when
    its RELATIVE spatial concentration intensifies over time, which raw
    count trends (:func:`mann_kendall_cells`) cannot distinguish from
    uniform global growth.

    → (ix, iy, w_i, s_stat, mk_z, trend) per occupied cell. The per-bin
    population is the occupied-at-any-bin cell set (densified zeros are
    observations), so N and the 3×3-incl-self weights W_i are
    time-invariant; bins with degenerate variance (all-equal counts) or
    W_i = N contribute z = 0 — EXACT integer guards, same rationale as
    :func:`gi_star_cells`. Every per-bin reduction is an exact integer
    sum; each z_it is one shared double expression rounded to 6 dp
    BEFORE entering the MK stage, so sign comparisons and tie groups
    over the z series are engine-identical.

    Scale shape: one point-bounded aggregate, then everything runs over
    cells·T rows (the per-bin neighbor join is the thin 9-key explode;
    the MK pair stage generates T(T−1)/2 rows per cell join-side and
    folds immediately) — the same grid-bounded story as the parts it
    composes.
    """
    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    if n_bins < 2:
        raise ValueError(f"n_bins={n_bins} < 2: Mann-Kendall needs ≥ 2 bins")
    cell = F.lit(float(cell_deg))
    cube = (
        df.select(
            F.floor(F.col(lon) / cell).cast("long").alias("ix"),
            F.floor(F.col(lat) / cell).cast("long").alias("iy"),
            F.col(t_bin).cast("long").alias("_t"),
        )
        .groupBy("ix", "iy", "_t")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    occupied = cube.groupBy("ix", "iy").agg(F.sum("_n").alias("_total"))
    dense = (
        occupied.select(
            "ix", "iy",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_bins) - 1))).alias("_t"),
        )
        .join(cube, ["ix", "iy", "_t"], "left")
        .select(
            "ix", "iy", "_t",
            F.coalesce("_n", F.lit(0)).alias("_x"),
            (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("_key"),
        )
        .localCheckpoint()
    )
    # time-invariant neighborhood: W_i over occupied cells incl self
    core = dense.select("_key", "ix", "iy").distinct()
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    nbr_keys = core.select(
        F.col("_key").alias("_u"),
        F.explode(
            F.array(*[
                ((F.col("ix") + F.lit(dx)) * F.lit(_KEY_SPAN) + F.col("iy") + F.lit(dy))
                for dx, dy in offsets
            ])
        ).alias("_v"),
    ).join(core.select(F.col("_key").alias("_v")), "_v", "inner")
    w_tab = nbr_keys.groupBy("_u").agg(F.count(F.lit(1)).alias("_w"))
    # per-bin neighborhood sums: the same key pairs, joined to each bin's
    # values — (pairs × T) thin rows, folded immediately
    local = (
        nbr_keys.join(
            dense.select(F.col("_key").alias("_v"), "_t", F.col("_x").alias("_xv")),
            "_v",
        )
        .groupBy("_u", "_t")
        .agg(F.sum("_xv").alias("_si"))
    )
    # per-bin exact global sums + the constant N
    stats_t = dense.groupBy("_t").agg(
        F.sum("_x").alias("_s1"),
        F.sum(F.col("_x") * F.col("_x")).alias("_s2"),
        F.count(F.lit(1)).alias("_ncells"),
    )
    n_d = F.col("_ncells").cast("double")
    w_d = F.col("_w").cast("double")
    mu = F.col("_s1").cast("double") / n_d
    sigma = F.sqrt(F.col("_s2").cast("double") / n_d - mu * mu)
    denom = sigma * F.sqrt((n_d * w_d - w_d * w_d) / (n_d - F.lit(1.0)))
    z_it_raw = F.when(
        (F.col("_ncells") * F.col("_s2") - F.col("_s1") * F.col("_s1") <= 0)
        | (F.col("_w") >= F.col("_ncells"))
        | (F.col("_ncells") <= 1),
        F.lit(0.0),
    ).otherwise((F.col("_si").cast("double") - mu * w_d) / denom)
    zdense = (
        local.join(w_tab, "_u")
        .join(F.broadcast(stats_t), "_t")
        .select(
            F.col("_u").alias("_key"), "_t", F.col("_w"),
            (F.floor(z_it_raw * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
             / F.lit(1e6)).alias("_z6"),
        )
        .localCheckpoint()
    )
    keyed = zdense.groupBy("_key").agg(F.first("_w").alias("w_i"))
    out = (
        keyed.join(_mk_trend(zdense, n_bins, "_z6"), "_key")
        .join(core.select("_key", "ix", "iy"), "_key")
        .select(
            "ix", "iy", "w_i", F.col("_s").alias("s_stat"),
            (F.floor(F.col("_z_raw") * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8))
             / F.lit(1e6)).alias("mk_z"),
        )
    )
    thr = F.lit(float(z_threshold))
    return out.select(
        "ix", "iy", "w_i", "s_stat", "mk_z",
        F.when(F.col("mk_z") >= thr, F.lit("up"))
        .when(F.col("mk_z") <= -thr, F.lit("down"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )


def theil_sen_cells(
    df: DataFrame,
    n_bins: int,
    lon: str = "lon",
    lat: str = "lat",
    t_bin: str = "t_bin",
    cell_deg: float = 1.0,
    slope_threshold_micro: int = 500_000,
) -> DataFrame:
    """Theil–Sen trend slopes over the space-time cube: the MAGNITUDE
    companion to :func:`mann_kendall_cells`' significance test (ArcGIS's
    emerging-hot-spot pairing). Per occupied cell, the slope of the
    per-bin count series is the LOWER MEDIAN over all T(T−1)/2 pairwise
    slopes (x_j − x_i)/(j − i), missing bins densified to zero.

    Cross-engine exactness: each pairwise slope is quantized to integer
    MICRO-counts/bin — ``floor(dx·1e6 / dt)`` where dx, dt are exact
    integers, so the only float op is one IEEE double division shared
    verbatim with the SQL oracle — and the median is the (n+1)//2-th
    smallest (lower median: an ELEMENT, no interpolation). The trend
    label compares the integer slope against ``slope_threshold_micro``
    (exact; default ±0.5 counts/bin).

    Scale shape: points collapse to (cell, bin) counts map-side; the
    pair stage keys on the packed cell key and generates exactly
    T(T−1)/2 rows per occupied cell; the median is one row_number
    window over those ≤ T²/2-row groups (rule 20: no salting — per-cell
    sorts this size never straggle). Shuffle volume O(cells·T²),
    never point-bounded.
    """
    if cell_deg < 2e-4:
        raise ValueError(
            f"cell_deg={cell_deg} < 2e-4°: |iy| can exceed {_KEY_SPAN // 2} "
            "and the packed key stops being injective"
        )
    if n_bins < 2:
        raise ValueError(f"n_bins={n_bins} < 2: Theil-Sen needs >= 2 bins")
    cell = F.lit(float(cell_deg))
    cube = (
        df.select(
            F.floor(F.col(lon) / cell).cast("long").alias("ix"),
            F.floor(F.col(lat) / cell).cast("long").alias("iy"),
            F.col(t_bin).cast("long").alias("_t"),
        )
        .groupBy("ix", "iy", "_t")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    occupied = cube.groupBy("ix", "iy").agg(F.sum("_n").alias("_total"))
    dense = (
        occupied.select(
            "ix", "iy", "_total",
            F.explode(F.sequence(F.lit(0), F.lit(int(n_bins) - 1))).alias("_t"),
        )
        .join(cube, ["ix", "iy", "_t"], "left")
        .select(
            "ix", "iy", "_total", "_t",
            F.coalesce("_n", F.lit(0)).alias("_x"),
            (F.col("ix") * F.lit(_KEY_SPAN) + F.col("iy")).alias("_key"),
        )
    )
    a = dense.select(
        "_key", "ix", "iy", "_total",
        F.col("_t").alias("_ta"), F.col("_x").alias("_xa"),
    )
    b = dense.select("_key", F.col("_t").alias("_tb"), F.col("_x").alias("_xb"))
    # one IEEE double division, shared verbatim with the SQL oracle:
    # dx·1e6 is an exact double (|dx| « 2^33), dt ∈ [1, T)
    slope_micro = F.floor(
        (F.col("_xb") - F.col("_xa")).cast("double") * F.lit(1e6)
        / (F.col("_tb") - F.col("_ta")).cast("double")
    ).cast("long")
    pairs = (
        a.join(b, "_key")
        .where(F.col("_tb") > F.col("_ta"))
        .select("_key", "ix", "iy", "_total", "_ta", "_tb",
                slope_micro.alias("_sm"))
    )
    n_pairs = int(n_bins) * (int(n_bins) - 1) // 2
    med_rank = (n_pairs + 1) // 2
    w = Window.partitionBy("_key").orderBy("_sm", "_ta", "_tb")
    med = (
        pairs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == F.lit(med_rank))
    )
    thr = F.lit(int(slope_threshold_micro))
    return med.select(
        "ix", "iy",
        F.col("_total").alias("total_points"),
        F.col("_sm").alias("slope_micro"),
        (F.col("_sm").cast("double") / F.lit(1e6)).alias("slope"),
        F.when(F.col("_sm") >= thr, F.lit("up"))
        .when(F.col("_sm") <= -thr, F.lit("down"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )
