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
            ext = rl[0]
            self.bbox[i] = (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())

    def __len__(self):
        return len(self.zone_ids)

    def assign(self, px: np.ndarray, py: np.ndarray):
        """→ (point_idx, zone_id) arrays: every containing zone per point."""
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


def _collect_polygons(zones: DataFrame, zone_id="zone_id", rings_col="rings") -> FlatPolygons:
    rows = zones.select(zone_id, rings_col).collect()
    return FlatPolygons([r[0] for r in rows], [r[1] for r in rows])


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


def zone_covers(zones: DataFrame, res: int, zone_id="zone_id", rings_col="rings") -> DataFrame:
    """Explode each zone into its covering cells at ``res`` →
    (zone_id, cell, rings). The fan-out is the polygon side — small by
    assumption in the shuffle path (each zone covers O(area/cell_area) cells).
    """
    rings_type = zones.schema[rings_col].dataType
    schema = StructType(
        [zones.schema[zone_id]]
    ).add("cell", "long").add(rings_col, rings_type)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cell_out, rings_out = [], [], []
            for zid, rings in zip(pdf[zone_id], pdf[rings_col]):
                cover = C.polygon_cover(rings, res)
                ids.extend([zid] * len(cover))
                cell_out.append(cover)
                rings_out.extend([rings] * len(cover))
            if not ids:
                continue
            yield pd.DataFrame(
                {zone_id: ids, "cell": np.concatenate(cell_out), rings_col: rings_out}
            )

    return zones.select(zone_id, rings_col).mapInPandas(expand, schema=schema)


def _exact_test_schema(points: DataFrame, zones: DataFrame, zone_id: str) -> StructType:
    return StructType(points.schema.fields + [zones.schema[zone_id]])


def assign_zones_shuffle(
    points: DataFrame,
    zones: DataFrame,
    res: int,
    lon="lon",
    lat="lat",
    zone_id="zone_id",
    rings_col="rings",
    salt_target_rows: int = 200_000,
) -> DataFrame:
    """Salted cell-equi-join PIP for polygon sides too large to broadcast.

    Plan: stats pass counts points per cell → per-cell salt factor
    ``ceil(count / salt_target_rows)`` (only mega-cells get >1) → point side
    gets ``salt = pmod(hash(lon,lat), factor)``, cover side is replicated per
    salt via posexplode → equi-join on (cell, salt) → Arrow exact test.
    The salt table is tiny (one row per skewed cell) and broadcast.
    """
    spark = points.sparkSession
    pts = points.withColumn("cell", C.cell_udf(res)(F.col(lon), F.col(lat)))

    # --- stats pass: per-cell point counts → salt factors (skew only) ---
    salt_df = (
        pts.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "cell",
            F.greatest(F.lit(1), F.ceil(F.col("cnt") / F.lit(salt_target_rows)))
            .cast("int")
            .alias("n_salt"),
        )
        .where(F.col("n_salt") > 1)
    )

    pts = pts.join(F.broadcast(salt_df), "cell", "left").withColumn(
        "salt",
        F.when(
            F.col("n_salt").isNotNull(),
            F.pmod(F.hash(F.col(lon), F.col(lat)), F.col("n_salt")),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop("n_salt")

    covers = zone_covers(zones, res, zone_id, rings_col)
    covers = covers.join(F.broadcast(salt_df), "cell", "left").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1))
    ).drop("n_salt")

    paired = pts.join(covers, ["cell", "salt"], "inner").drop("cell", "salt")

    out_schema = _exact_test_schema(points, zones, zone_id)
    point_cols = [f.name for f in points.schema.fields]

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon].to_numpy()
            py = pdf[lat].to_numpy()
            # group by zone within the batch: one vectorized test per zone
            for _, grp in pdf.groupby(zone_id, sort=False).indices.items():
                rings = pdf[rings_col].iloc[grp[0]]
                keep[grp] = points_in_polygon_np(px[grp], py[grp], rings)
            out = pdf.loc[keep, point_cols + [zone_id]]
            if len(out):
                yield out

    return paired.mapInPandas(exact, schema=out_schema)


def assign_zones(
    points: DataFrame,
    zones: DataFrame,
    res: int = 12,
    broadcast_threshold: int = 100_000,
    **kw,
) -> DataFrame:
    """Planner: broadcast the polygon side when it fits, else salted shuffle.

    ``broadcast_threshold`` is in zone rows; at 100 TB the zone side (admin
    polygons) is normally ≪ the image side, so broadcast is the common case —
    mirroring the reference's hand-built broadcast hash joins
    (navteq.hpp:966-1009).
    """
    n = zones.count()
    if n <= broadcast_threshold:
        return assign_zones_broadcast(points, zones, **kw)
    return assign_zones_shuffle(points, zones, res, **kw)
