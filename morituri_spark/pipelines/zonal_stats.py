"""Raster↔vector zonal statistics: decoded image features aggregated per
admin zone (the raster-tile↔vector-zone join with real payload math, not
just counts).

Pipeline: images (binary payloads) → Arrow decode/feature kernel
(multimodal.ops.image_features) → spatial zone assignment (geo.pip planner)
→ per-zone feature statistics. The decode fan-in and the spatial join are
independent stages sharing the image_id key, so Catalyst joins them after
both prune to their needed columns — payload bytes never enter the spatial
side, lon/lat never enter the decode side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo import pip
from ..multimodal.ops import image_features


def zonal_image_stats(
    images: DataFrame,
    zones: DataFrame,
    res: int = 10,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ per (zone_id, admin_lvl): image count + channel-mean stats +
    phash-bit entropy proxy (mean popcount)."""
    feats = image_features(images, deterministic_fake=deterministic_fake)
    assigned = pip.assign_zones(
        images.select("image_id", "lon", "lat"),
        zones.select("zone_id", "rings"),
        res=res,
    )
    joined = assigned.join(feats, "image_id").join(
        F.broadcast(zones.select("zone_id", "admin_lvl")), "zone_id"
    )
    return joined.groupBy("zone_id", "admin_lvl").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.round(F.avg("mean_r"), 4).alias("avg_r"),
        F.round(F.avg("mean_g"), 4).alias("avg_g"),
        F.round(F.avg("mean_b"), 4).alias("avg_b"),
        F.round(F.avg("std_gray"), 4).alias("avg_texture"),
        F.round(F.avg(F.bit_count("phash")), 4).alias("avg_phash_bits"),
    )
