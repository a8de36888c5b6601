"""Point-in-polygon: NumPy ray-casting kernel + the spatial-join operator.

SURVEY.md §2.3 J10 / §2.7 G10: the reference gets containment for free via
the precomputed ``AREA_ID`` foreign key (navteq.hpp:988-1009 builds the maps,
navteq2osm_tag_parser.hpp:230-258 probes them); the target engine computes it.

Tie rule (documented, oracle-checked): even-odd crossing with **half-open
edges** — a ray cast toward +x counts an edge iff ``(y_i > y) != (y_j > y)``,
so a point exactly on a horizontal edge or bottom vertex belongs to the cell
below; results are deterministic and identical between the Spark kernel and
the driver-side brute-force oracle. Interior rings (holes) participate in the
same even-odd count, which handles multipolygon holes with zero extra logic.

Join strategies (the planner in ``assign_zones``):
  * ``broadcast`` — polygon set fits on every executor: ship flattened ring
    coordinate arrays in the UDF closure; one ``mapInPandas`` pass over the
    point side, zero shuffle. This is the path for dimension-sized zone
    tables (admin boundaries ~10⁴-10⁶ rings).
  * ``salted shuffle`` — polygon side too big to broadcast: explode polygon
    cell covers (geo/cells.polygon_cover), equi-join on cell id with explicit
    salting of skewed mega-cells (per-cell salt counts from a stats pass),
    then an Arrow-batched exact test. Shuffles only (point, cell, salt) and
    (zone, cell, salt, rings) rows — never a cross product.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from . import cells as C


def ring_np(ring) -> np.ndarray:
    """Coerce a ring (list/Arrow object-array of [lon,lat] pairs) → (n,2)
    float64. ``np.asarray`` alone chokes on Arrow's object-dtype nesting."""
    a = np.asarray(ring)
    if a.dtype == object:
        a = np.stack([np.asarray(p, dtype=np.float64) for p in a])
    return a.astype(np.float64, copy=False).reshape(-1, 2)


def points_in_ring_np(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing count of points against ONE ring. ring: (n,2)."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(px), dtype=bool)
    # Loop over edges (rings are short vs point batches); vectorized over points.
    for i in range(len(x0)):
        cond = (y0[i] > py) != (y1[i] > py)
        if not cond.any():
            continue
        xcross = (x1[i] - x0[i]) * (py - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= cond & (px < xcross)
    return inside


def points_in_polygon_np(px, py, rings) -> np.ndarray:
    """Even-odd over all rings (exterior + holes)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring_np(px, py, ring_np(ring))
    return inside


class FlatPolygons:
    """Zones flattened to contiguous NumPy buffers for broadcast closures.

    Arrow-friendly: one coordinate pool + offsets, one bbox per zone.
    """

    def __init__(self, zone_ids, ring_lists):
        self.zone_ids = np.asarray(zone_ids, dtype=np.int64)
        self.rings: list[list[np.ndarray]] = [
            [ring_np(r) for r in rl] for rl in ring_lists
        ]
        self.bbox = np.empty((len(self.rings), 4), dtype=np.float64)
        for i, rl in enumerate(self.rings):
            # bbox over ALL rings, not rings[0]: a MultiPolygon zone's second
            # exterior (island) lies outside the first ring's bbox and would
            # be pruned away otherwise. Holes never widen the true bbox.
            allr = np.vstack(rl)
            self.bbox[i] = (allr[:, 0].min(), allr[:, 1].min(), allr[:, 0].max(), allr[:, 1].max())

    def __len__(self):
        return len(self.zone_ids)

    def assign(self, px: np.ndarray, py: np.ndarray):
        """→ (point_idx, zone_id) arrays: every containing zone per point.
        O(n_zones) vectorized bbox passes per batch — fine for dimension-
        sized zone sets; :class:`GridIndexedPolygons` is the large-zone-set
        variant."""
        out_idx, out_zone = [], []
        for i, rl in enumerate(self.rings):
            b = self.bbox[i]
            cand = np.nonzero((px >= b[0]) & (px <= b[2]) & (py >= b[1]) & (py <= b[3]))[0]
            if len(cand) == 0:
                continue
            hit = points_in_polygon_np(px[cand], py[cand], rl)
            sel = cand[hit]
            if len(sel):
                out_idx.append(sel)
                out_zone.append(np.full(len(sel), self.zone_ids[i], dtype=np.int64))
        if not out_idx:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_idx), np.concatenate(out_zone)


class GridIndexedPolygons(FlatPolygons):
    """FlatPolygons + a uniform bbox grid: ``assign`` buckets the point
    batch by grid cell and tests only the zones whose bbox overlaps that
    cell. Results are identical to FlatPolygons (same bbox + even-odd
    tests after the coarser prefilter; asserted in tests).

    MEASURED NEGATIVE RESULT (r4) — kept as documentation, OFF by default:
    at 10k zones × 1M points the grid path ran 12.9s vs 3.5s for the plain
    per-zone bbox loop. The Arrow batch (~10k points) splinters into
    thousands of tiny per-cell NumPy calls whose Python dispatch overhead
    dwarfs the work, while the "naive" O(n_zones) loop is 10k CHEAP
    vectorized passes. The plain loop also beat the salted shuffle at
    every zone count tried (10k: 3.5 vs 6.3s; 20k: 5.9 vs 13.6s; 40k:
    8.8 vs >20s), which is why ``_KERNEL_ZONE_BUDGET`` was raised instead
    of indexing the kernel — broadcast's real limit is ring-set memory,
    not zone count."""

    def __init__(self, zone_ids, ring_lists, grid: int | None = None):
        super().__init__(zone_ids, ring_lists)
        n = max(len(self.rings), 1)
        # ~4 zones per occupied cell for uniformly-spread zone sets
        self.grid = int(grid) if grid else max(int(np.sqrt(n)) * 2, 1)
        gx0 = float(self.bbox[:, 0].min()) if n else 0.0
        gy0 = float(self.bbox[:, 1].min()) if n else 0.0
        gx1 = float(self.bbox[:, 2].max()) if n else 1.0
        gy1 = float(self.bbox[:, 3].max()) if n else 1.0
        self.gx0, self.gy0 = gx0, gy0
        self.sx = (gx1 - gx0) / self.grid or 1.0
        self.sy = (gy1 - gy0) / self.grid or 1.0
        self.cell_zones: dict[int, np.ndarray] = {}
        tmp: dict[int, list[int]] = {}
        for i in range(n):
            b = self.bbox[i]
            cx0, cx1 = self._cx(b[0]), self._cx(b[2])
            cy0, cy1 = self._cy(b[1]), self._cy(b[3])
            for cx in range(cx0, cx1 + 1):
                for cy in range(cy0, cy1 + 1):
                    tmp.setdefault(cx * (self.grid + 1) + cy, []).append(i)
        self.cell_zones = {k: np.asarray(v, dtype=np.int64) for k, v in tmp.items()}

    def _cx(self, x):
        return int(min(max((x - self.gx0) / self.sx, 0), self.grid))

    def _cy(self, y):
        return int(min(max((y - self.gy0) / self.sy, 0), self.grid))

    def assign(self, px: np.ndarray, py: np.ndarray):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        cx = np.clip(((px - self.gx0) / self.sx).astype(np.int64), 0, self.grid)
        cy = np.clip(((py - self.gy0) / self.sy).astype(np.int64), 0, self.grid)
        keys = cx * (self.grid + 1) + cy
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        bounds = np.nonzero(np.diff(sk))[0] + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sk)]))
        out_idx, out_zone = [], []
        for s, e in zip(starts, ends):
            zlist = self.cell_zones.get(int(sk[s]))
            if zlist is None:
                continue
            pts = order[s:e]
            bpx, bpy = px[pts], py[pts]
            for i in zlist:
                b = self.bbox[i]
                cand = np.nonzero(
                    (bpx >= b[0]) & (bpx <= b[2]) & (bpy >= b[1]) & (bpy <= b[3])
                )[0]
                if len(cand) == 0:
                    continue
                hit = points_in_polygon_np(bpx[cand], bpy[cand], self.rings[i])
                sel = pts[cand[hit]]
                if len(sel):
                    out_idx.append(sel)
                    out_zone.append(np.full(len(sel), self.zone_ids[i], dtype=np.int64))
        if not out_idx:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_idx), np.concatenate(out_zone)


def _collect_polygons(
    zones: DataFrame, zone_id="zone_id", rings_col="rings",
    grid_index: str = "never",
) -> FlatPolygons:
    """``grid_index='always'`` opts into GridIndexedPolygons — measured
    slower at every scale tried (see its docstring), so 'never' is the
    default and there is no 'auto'."""
    rows = zones.select(zone_id, rings_col).collect()
    ids, rls = [r[0] for r in rows], [r[1] for r in rows]
    if grid_index == "always":
        return GridIndexedPolygons(ids, rls)
    return FlatPolygons(ids, rls)


def assign_zones_broadcast(
    points: DataFrame,
    zones: DataFrame,
    lon="lon",
    lat="lat",
    zone_id="zone_id",
    rings_col="rings",
) -> DataFrame:
    """points ⨝spatial zones with the polygon side broadcast.

    Output: points' columns + ``zone_id`` (one row per containing zone; inner
    join semantics — points in no zone are dropped; use a left variant via
    unionByName if unmatched points are needed).
    """
    flat = _collect_polygons(zones, zone_id, rings_col)
    bc = points.sparkSession.sparkContext.broadcast(flat)
    out_schema = StructType(points.schema.fields + [zones.schema[zone_id]])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        poly = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx, zid = poly.assign(pdf[lon].to_numpy(), pdf[lat].to_numpy())
            if len(idx) == 0:
                continue
            out = pdf.iloc[idx].reset_index(drop=True)
            out[zone_id] = zid
            yield out

    return points.mapInPandas(run, schema=out_schema)


def zone_covers(
    zones: DataFrame, res: int, zone_id="zone_id", rings_col="rings",
    compact_res_min: int | None = None,
) -> DataFrame:
    """Explode each zone into its covering cells at ``res`` →
    (zone_id, cell, rings). The fan-out is the polygon side — small by
    assumption in the shuffle path (each zone covers O(area/cell_area) cells).

    ``compact_res_min`` enables mixed-resolution compaction
    (geo/cells.compact_cover): cover rows drop toward O(perimeter·2^res)
    for huge zones; the join's point side must then probe one ancestor per
    level in [compact_res_min, res] — see assign_zones_shuffle's
    ``compact_res_min`` for the regime trade."""
    rings_type = zones.schema[rings_col].dataType
    schema = StructType(
        [zones.schema[zone_id]]
    ).add("cell", "long").add(rings_col, rings_type)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_out, rings_out = [], [], []
            for zid, rings in zip(pdf[zone_id], pdf[rings_col]):
                cover = C.polygon_cover(rings, res)
                if compact_res_min is not None:
                    cover = C.compact_cover(cover, res_min=compact_res_min)
                ids.extend([zid] * len(cover))
                cell_out.append(cover)
                rings_out.extend([rings] * len(cover))
            if not ids:
                continue
            yield pd.DataFrame(
                {zone_id: ids, "cell": np.concatenate(cell_out), rings_col: rings_out}
            )

    return zones.select(zone_id, rings_col).mapInPandas(expand, schema=schema)


def zone_cells(
    zones: DataFrame, res: int, zone_id="zone_id", rings_col="rings",
    compact_res_min: int | None = None,
) -> DataFrame:
    """THIN cover: (zone_id, cell, _n_edges) — no ring payload. r4 fix for
    a measured scale hazard: :func:`zone_covers` attaches the full rings
    array to EVERY cover row, and at 1000 big zones × res 13 (14.2M cover
    rows) just materializing that cover cost 167s of Arrow transfer vs 47s
    for the compacted thin form. The shuffle join only ever needs
    (zone, cell) keys + the edge count for work prediction; rings travel
    once per (zone, salt) group via the cogroup."""
    schema = StructType([zones.schema[zone_id]]).add("cell", "long").add(
        "_n_edges", "integer"
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_out, ne_out = [], [], []
            for zid, rings in zip(pdf[zone_id], pdf[rings_col]):
                cover = C.polygon_cover(rings, res)
                if compact_res_min is not None:
                    cover = C.compact_cover(cover, res_min=compact_res_min)
                ne = sum(len(r) - 1 for r in rings)
                ids.extend([zid] * len(cover))
                cell_out.append(cover)
                ne_out.extend([ne] * len(cover))
            if not ids:
                continue
            yield pd.DataFrame(
                {zone_id: ids, "cell": np.concatenate(cell_out), "_n_edges": ne_out}
            )

    return zones.select(zone_id, rings_col).mapInPandas(expand, schema=schema)


def _auto_compact_res_min(est_points: int, est_cover_rows: int, res: int) -> int | None:
    """The measured compaction crossover (BENCH/BASELINE.md thin-cover
    section) as a routing rule: compaction pays ×L on the fact side
    (one ancestor probe per level) to divide the cover side by ≤ 4^(L-1),
    so it wins only once cover rows RIVAL point rows. Below the crossover →
    None (fixed-res cover); above → depth L ≈ log4(cover/points), clamped
    to [2, 7] levels, i.e. compact_res_min = res - (L - 1)."""
    import math

    pts = max(int(est_points), 1)
    if est_cover_rows < pts:
        return None
    levels = min(7, max(2, 1 + math.ceil(math.log(est_cover_rows / pts, 4))))
    return max(0, res - (levels - 1))


def estimate_cover_rows(zones: DataFrame, res: int, rings_col="rings") -> int:
    """Upper-bound estimate of the fixed-res cover row count: per zone the
    bbox cell-rectangle at ``res`` (polygon_cover emits a subset of it),
    summed with one zones-sided aggregation. HOF folds are fine here —
    zones-sized input, one pass, off the per-point hot path (rule 8)."""
    n = 1 << res
    flat = F.flatten(F.col(rings_col))
    x0 = F.aggregate(flat, F.lit(180.0), lambda a, p: F.least(a, p[0]))
    x1 = F.aggregate(flat, F.lit(-180.0), lambda a, p: F.greatest(a, p[0]))
    y0 = F.aggregate(flat, F.lit(90.0), lambda a, p: F.least(a, p[1]))
    y1 = F.aggregate(flat, F.lit(-90.0), lambda a, p: F.greatest(a, p[1]))

    def cell_x(c):
        return F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor((c + 180.0) / 360.0 * n)))

    def cell_y(c):
        return F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor((c + 90.0) / 180.0 * n)))

    per_zone = (cell_x(x1) - cell_x(x0) + 1) * (cell_y(y1) - cell_y(y0) + 1)
    row = zones.select(F.sum(per_zone).alias("est")).first()
    return int(row["est"] or 0)


def assign_zones_shuffle(
    points: DataFrame,
    zones: DataFrame,
    res: int,
    lon="lon",
    lat="lat",
    zone_id="zone_id",
    rings_col="rings",
    salt_target_work: float = 50_000_000.0,
    salt_floor_work: float = 400_000_000.0,
    compact_res_min: int | None | str = "auto",
) -> DataFrame:
    """Salted cell-equi-join PIP for polygon sides too large to broadcast.

    ``compact_res_min``: compact each zone's cover to mixed resolutions
    ≥ compact_res_min (geo/cells.compact_cover) and explode the POINT side
    by one ancestor cell per level in [compact_res_min, res]. Compacted
    cover cells are pairwise disjoint, so a point still pairs with a zone
    at most once and results are identical (equivalence-tested against the
    broadcast strategy). Regime: pays ×L on the fact side to divide the
    cover side by up to 4^(L-1) — the right trade only when cover rows
    rival point rows (country-scale zones at res ≥ 12).

    ``"auto"`` (default, r5): route by the measured crossover —
    :func:`estimate_cover_rows` (bbox upper bound, one zones-sided pass)
    vs ``points.count()``; below the crossover the fixed-res cover runs
    unchanged, above it the depth follows log4(cover/points)
    (:func:`_auto_compact_res_min`). Pass an int to force compaction, or
    ``None`` to force it off — both skip the estimate pass (at very large
    fact tables where even the count matters, pass the decision in).

    Plan: ONE stats pass counts points per cell; the salt decision is then
    WORK-based, not row-based: the exact test for a (zone, salt) group costs
    ~rows × zone_edges vectorized ops, so per zone the predicted work is
    ``n_edges(z) × Σ_{cells covered by z} count(cell)`` and the desired
    split factor ``ceil(work / salt_target_work)``. A cell's salt factor is
    the max over its covering zones — only cells feeding an actually-heavy
    group get factor > 1, so when no group is predicted to straggle the plan
    degenerates to the unsalted join and pays nothing (round-1 bench: a
    blanket row-count salt made the salted run 3.4× slower than its own
    control on light polygons). Point side gets ``salt = pmod(hash(lon,lat),
    factor)``; the cover side is replicated per salt; equi-join on
    (cell, salt) → Arrow exact test. The salt table is tiny (one row per
    hot cell) and broadcast.

    ``salt_target_work`` ≈ row·edge ops per Python task; the 5e7 default is
    ~0.5-1 s of vectorized NumPy — small enough to bound stragglers, large
    enough that salting never engages on trivially light groups.

    ``salt_floor_work`` is the straggler FLOOR: a zone splits only when its
    predicted work exceeds it. Splitting a group costs cover replication +
    broadcast fan-out on every point of its cells, worth paying only when
    the unsplit group would actually straggle (≥ several seconds serial —
    the r3 bench showed auto-salting 25-40% slower than its unsalted
    control on light zones whose groups were over ``salt_target_work`` but
    nowhere near straggler scale). 4e8 row·edge ops ≈ 4-8 s of one-task
    NumPy; below that the windowed tail, not the PIP task, dominates."""
    spark = points.sparkSession
    if compact_res_min == "auto":
        compact_res_min = _auto_compact_res_min(
            points.count(), estimate_cover_rows(zones, res, rings_col), res
        )
    if compact_res_min is None:
        pts = points.withColumn("cell", C.cell_col(F.col(lon), F.col(lat), res))
    else:
        pts = points.withColumn(
            "cell",
            F.explode(
                F.array(
                    *[
                        C.cell_col(F.col(lon), F.col(lat), l)
                        for l in range(compact_res_min, res + 1)
                    ]
                )
            ),
        )

    # THIN cover (zone_id, cell, _n_edges): ring arrays never replicate per
    # cover cell (see zone_cells — 27× fewer rows AND no per-row ring
    # payload for big zones); rings enter once per (zone, salt) group below
    covers = zone_cells(zones, res, zone_id, rings_col, compact_res_min)

    # --- stats pass (the only fact-table aggregation) ---
    cell_counts = pts.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt"))
    edges = covers
    zone_work = (
        edges.join(cell_counts, "cell", "inner")
        .groupBy(zone_id)
        .agg((F.sum(F.col("cnt") * F.col("_n_edges"))).alias("_work"))
        .select(
            zone_id,
            F.when(
                F.col("_work") >= F.lit(float(salt_floor_work)),
                F.least(
                    F.lit(256),
                    F.greatest(
                        F.lit(1), F.ceil(F.col("_work") / F.lit(float(salt_target_work)))
                    ),
                ),
            ).otherwise(F.lit(1)).cast("int").alias("_f"),
        )
    )
    salt_df = (
        edges.join(zone_work, zone_id)
        .groupBy("cell")
        .agg(F.max("_f").alias("n_salt"))
        .where(F.col("n_salt") > 1)
        # feeds TWO broadcasts (point side + cover side): persist so the
        # full stats aggregation over the fact table runs once, not twice
        .persist()
    )

    pts = pts.join(F.broadcast(salt_df), "cell", "left").withColumn(
        "salt",
        F.when(
            F.col("n_salt").isNotNull(),
            F.pmod(F.hash(F.col(lon), F.col(lat)), F.col("n_salt")),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop("n_salt")

    covers = covers.join(F.broadcast(salt_df), "cell", "left").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1))
    ).drop("n_salt")

    # candidates carry NO ring data — only (point cols, zone_id, salt).
    # Rings are cogrouped in once per (zone, salt) group, so the heavy
    # nested-array payload never rides the per-point shuffle.
    paired = pts.join(
        covers.select(zone_id, "cell", "salt"), ["cell", "salt"], "inner"
    ).drop("cell")
    # one rings row per (zone, salt) group, built from the ZONE table (not
    # the cover — rings never touched the cover rows): a zone's salt range
    # is the max n_salt over its cells (a shared hot cell can push it past
    # the zone's own factor). Renamed keys: identical attribute ids would
    # trip the ambiguous-self-join check in the cogroup.
    zone_max_salt = covers.groupBy(zone_id).agg(F.max("salt").alias("_ms"))
    zone_salts = (
        zones.select(F.col(zone_id).alias("_zid"), rings_col)
        .join(
            F.broadcast(zone_max_salt.select(F.col(zone_id).alias("_zid"), "_ms")),
            "_zid",
        )
        .withColumn("_zsalt", F.explode(F.sequence(F.lit(0), F.col("_ms"))))
        .select("_zid", "_zsalt", rings_col)
    )

    point_cols = [f.name for f in points.schema.fields]
    out_schema = StructType(points.schema.fields + [zones.schema[zone_id]])

    def exact(cands: pd.DataFrame, zone_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cands) == 0 or len(zone_pdf) == 0:
            return pd.DataFrame(columns=point_cols + [zone_id])
        rings = zone_pdf[rings_col].iloc[0]
        keep = points_in_polygon_np(
            cands[lon].to_numpy(), cands[lat].to_numpy(), rings
        )
        return cands.loc[keep, point_cols + [zone_id]]

    return (
        paired.groupBy(zone_id, "salt")
        .cogroup(zone_salts.groupBy("_zid", "_zsalt"))
        .applyInPandas(exact, schema=out_schema)
    )


def pip_expr(rings_col, lon_col, lat_col):
    """Even-odd ray-casting as a PURE CATALYST expression (higher-order
    ``aggregate`` over the ring edge list) — bit-identical semantics to
    ``points_in_polygon_np`` (same formula, same IEEE double ops), but it
    runs inside whole-stage codegen: no Python, no Arrow transfer.

    The Python-worker round-trip caps at a few M rows/s per NODE regardless
    of cores (measured in this sandbox: identity mapInPandas ≈ 4.5M rows/s
    at local[8] == local[32]); this expression removes that ceiling from
    the flagship path entirely.
    """

    def ring_crossings(ring):
        edge_idx = F.sequence(F.lit(1), F.size(ring) - 1)

        def crossing(acc, i):
            x0 = F.element_at(F.element_at(ring, i), 1)
            y0 = F.element_at(F.element_at(ring, i), 2)
            x1 = F.element_at(F.element_at(ring, i + 1), 1)
            y1 = F.element_at(F.element_at(ring, i + 1), 2)
            cond = (y0 > lat_col) != (y1 > lat_col)
            xcross = (x1 - x0) * (lat_col - y0) / (y1 - y0) + x0
            return acc + F.when(cond & (lon_col < xcross), 1).otherwise(0)

        return F.aggregate(edge_idx, F.lit(0), crossing)

    total = F.aggregate(rings_col, F.lit(0), lambda acc, ring: acc + ring_crossings(ring))
    return total % 2 == 1


def _zone_pip_condition(rings, lon_col, lat_col):
    """bbox gate + literal-edge crossing parity for ONE zone — a small
    expression that codegen compiles into one JIT-friendly method."""
    rs = [ring_np(r) for r in rings]
    allr = np.vstack(rs)  # bbox over ALL rings — island exteriors included
    bbox = (
        (lon_col >= float(allr[:, 0].min()))
        & (lon_col <= float(allr[:, 0].max()))
        & (lat_col >= float(allr[:, 1].min()))
        & (lat_col <= float(allr[:, 1].max()))
    )
    crossings = None
    for r in rs:
        for i in range(len(r) - 1):
            x0, y0 = float(r[i, 0]), float(r[i, 1])
            x1, y1 = float(r[i + 1, 0]), float(r[i + 1, 1])
            if y0 == y1:
                continue
            cond = (
                ((F.lit(y0) > lat_col) != (F.lit(y1) > lat_col))
                & (lon_col < F.lit(x1 - x0) * (lat_col - F.lit(y0)) / F.lit(y1 - y0) + F.lit(x0))
            )
            term = F.when(cond, 1).otherwise(0)
            crossings = term if crossings is None else crossings + term
    if crossings is None:
        return F.lit(False)
    return bbox & ((crossings % 2) == 1)


def assign_zones_union(
    points: DataFrame,
    zone_rows,
    lon="lon",
    lat="lat",
    zone_id="zone_id",
) -> DataFrame:
    """Small-zone-set fast path: ONE scan, all-zone membership per row.

    Each zone's `bbox AND crossing-parity` test over literal edges is its
    own array element (Catalyst splits projection expressions into separate
    generated methods, so every zone test stays under the JIT method
    budget), then ``explode(array_compact(...))`` fans out matches. No join,
    no Python, no rescans — a single whole-stage-codegen pass.
    """
    lon_c, lat_c = F.col(lon), F.col(lat)
    hits = F.array_compact(
        F.array(
            *[
                F.when(_zone_pip_condition(rings, lon_c, lat_c), F.lit(zid).cast("long"))
                for zid, rings in zone_rows
            ]
        )
    )
    cols = [f.name for f in points.schema.fields]
    return points.select(*cols, F.explode(hits).alias(zone_id))


# Up to this many TOTAL literal edges (across every zone) the one-scan
# union-of-per-zone-expressions path wins: each zone's bbox-gated test is its
# own array element, which Catalyst splits into a separate generated method,
# so every method stays far below janino's 64KB/JIT limits regardless of zone
# count. A single chained CASE over zones does NOT split (measured: ~100
# rectangle zones already fail janino compilation and silently fall back to
# interpreted evaluation), which is why there is no inlined-CASE middle path.
_UNION_EDGE_BUDGET = 4096

# Above this zone COUNT route to the cell-cover cogroup join. r4 raised it
# 4096 → 65536: the kernel's per-zone bbox loop is 10-40k CHEAP vectorized
# passes per batch and beat the salted shuffle at every count measured
# (10k zones × 1M pts: 3.5 vs 6.3s; 20k: 5.9 vs 13.6s; 40k: 8.8 vs >20s);
# a grid-indexed kernel was tried and measured SLOWER (GridIndexedPolygons
# docstring). Broadcast's true limit is the ring set's executor-memory
# footprint, which assign_zones' row-count threshold guards separately.
_KERNEL_ZONE_BUDGET = 65536


def assign_zones_catalyst(
    points: DataFrame,
    zones: DataFrame,
    res: int = 10,
    lon="lon",
    lat="lat",
    zone_id="zone_id",
    rings_col="rings",
    mid_strategy: str = "arrow",
    kernel_zone_budget: int = _KERNEL_ZONE_BUDGET,
) -> DataFrame:
    """Broadcast spatial join, physical shape chosen by total edge count:

      * ≤ ``_UNION_EDGE_BUDGET`` edges → ``assign_zones_union``: ONE
        whole-stage-codegen scan, per-zone literal-edge tests as array
        elements (JIT-friendly — each element becomes its own generated
        method), no join, no Python.
      * above the budget (big multi-ring admin polygons) → the Arrow
        broadcast kernel (``assign_zones_broadcast``): rings ship once in
        the closure, one vectorized ray-cast pass per batch. BENCHED in
        round 3 against the previous HOF-covers plan (cell-cover equi-join
        + interpreted ``pip_expr`` fold): the HOF path measured 24-45× slower
        at 64 zones × 102 edges (100k and 1M points) (bench.py
        ``pip_mid_hof_covers`` vs ``pip_mid_arrow_broadcast``) — Catalyst
        higher-order functions evaluate interpreted per edge per row
        (CLAUDE.md rule 8), while the kernel is one NumPy pass under the
        measured ~4.5M rows/s/node Python ceiling. ``mid_strategy='hof'``
        keeps the old plan reachable for cross-checks and re-benching.
    """
    zone_rows = [
        (r[0], r[1]) for r in zones.select(zone_id, rings_col).collect()
    ]
    n_edges = sum(len(ring) - 1 for _, rings in zone_rows for ring in rings)
    out_cols = [f.name for f in points.schema.fields] + [zone_id]

    if n_edges <= _UNION_EDGE_BUDGET:
        return assign_zones_union(points, zone_rows, lon, lat, zone_id).select(*out_cols)

    if mid_strategy == "arrow":
        if len(zone_rows) > kernel_zone_budget:
            # huge zone COUNT: the kernel's per-zone bbox loop would cost
            # O(n_zones) NumPy ops per batch — the cell-cover cogroup plan
            # (rings shipped once per zone group) is the right shape there
            return assign_zones_shuffle(
                points, zones, res, lon, lat, zone_id, rings_col
            )
        return assign_zones_broadcast(points, zones, lon, lat, zone_id, rings_col)

    covers = zone_covers(zones, res, zone_id, rings_col)
    pts = points.withColumn("_cell", C.cell_col(F.col(lon), F.col(lat), res))
    covers_r = covers.withColumnRenamed(rings_col, "_rings")
    cand = pts.join(F.broadcast(covers_r), pts["_cell"] == covers_r["cell"], "inner")
    return cand.where(pip_expr(F.col("_rings"), F.col(lon), F.col(lat))).select(*out_cols)


def assign_zones(
    points: DataFrame,
    zones: DataFrame,
    res: int = 12,
    broadcast_threshold: int = 100_000,
    **kw,
) -> DataFrame:
    """Planner: broadcast the polygon side when it fits (Catalyst PIP, no
    Python on the fact side), else salted shuffle.

    ``broadcast_threshold`` is in zone rows; at 100 TB the zone side (admin
    polygons) is normally ≪ the image side, so broadcast is the common case —
    mirroring the reference's hand-built broadcast hash joins
    (navteq.hpp:966-1009).
    """
    # limit+count instead of a full count: stops scanning as soon as the
    # threshold is exceeded, so a huge zone table costs one partition read,
    # not a full-table aggregation, to route to the shuffle path
    n = zones.limit(broadcast_threshold + 1).count()
    if n <= broadcast_threshold:
        return assign_zones_catalyst(points, zones, res=min(res, 10), **kw)
    return assign_zones_shuffle(points, zones, res, **kw)
