"""Flagship pipeline: images × admin zones → zone assignment → tile rollup.

The end-to-end path from SURVEY.md §4.2's physical-plan sketch:

    scan images (vectorized parquet, pruned to lon/lat/image_id)
      → G9 cell encode (Arrow pandas UDF)
      → J10 spatial join (broadcast polygons, or salted cell equi-join)
      → tile rollup: groupBy(zone, tile) counts   [map-side partial agg]

At 100 TB the scan is an Iceberg table partitioned by the parent cell
(``geo.cells.parent_col`` — pure bit math, usable as a hidden partition
transform); the sandbox reads parquet. Payload ``bytes`` are never touched
by this pipeline — column pruning keeps them out of the scan entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo import cells as C
from ..geo import pip


def assign_images_to_zones(
    images: DataFrame,
    zones: DataFrame,
    res: int = 12,
    broadcast_threshold: int = 100_000,
) -> DataFrame:
    """(image_id, lon, lat, zone_id, admin_lvl) — one row per containing zone.

    Projects to the three needed columns *before* the join so the binary
    payload column never enters the shuffle/broadcast path.
    """
    pts = images.select("image_id", "lon", "lat")
    assigned = pip.assign_zones(
        pts, zones.select("zone_id", "rings"), res=min(res, 10),
        broadcast_threshold=broadcast_threshold,
    )
    return assigned.join(F.broadcast(zones.select("zone_id", "admin_lvl")), "zone_id")


def tile_zone_rollup(assigned: DataFrame, tile_res: int = 7) -> DataFrame:
    """Raster-tile ↔ vector-zone join product: per (tile, zone) image counts.

    The tile is the geocell at ``tile_res`` (z-level tiling analog); the agg
    is a plain hash aggregate — partial (map-side) combine comes free.
    """
    return (
        assigned
        .withColumn("tile", C.cell_col(F.col("lon"), F.col("lat"), tile_res))
        .groupBy("tile", "zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("image_id").alias("first_image_id"),
        )
    )


def run_flagship(images: DataFrame, zones: DataFrame, res: int = 12, tile_res: int = 7) -> DataFrame:
    assigned = assign_images_to_zones(images, zones, res=res)
    return tile_zone_rollup(assigned, tile_res=tile_res)
