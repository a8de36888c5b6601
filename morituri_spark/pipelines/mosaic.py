"""Tile mosaic selection — best image per map tile.

The mosaic / basemap-curation primitive over a geo-tagged image corpus:
for every occupied tile, keep the single best image by a decoded quality
score (default: mean luminance from the REAL payload decode), with a
total deterministic order (score, then image_id) so re-runs and
different parallelism pick identical winners.

Spark shape: the quality pass reads only (image_id, payload, metadata)
and the position pass only (image_id, lon, lat) — two column-pruned
scans of the same source beat persisting a decoded intermediate
(CLAUDE.md rule 22); the winner per tile comes from ONE
map-side-combinable max_by aggregate (partial argmax per task, no
window sort, no per-tile row materialization).

Reference scope note: morituri has no mosaic operator; this composes the
engine's cell encoding (geo/cells.py, the navteq tiling analog) with the
multimodal decode kernel for the north-star image-corpus family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from morituri_spark.geo import cells as C
from morituri_spark.multimodal.ops import image_features


def best_per_tile(
    images: DataFrame,
    res: int,
    deterministic_fake: bool = False,
) -> DataFrame:
    """(tile, image_id, quality) — the per-tile argmax image.

    ``images``: (image_id, bytes, fmt, w, h, lon, lat) rows. Quality is
    the decoded mean luminance (mean over channels of per-channel means
    — equals the gray mean for the engine's decode contract). Ties break
    on image_id (max), making the winner a total deterministic function
    of the corpus.
    """
    feats = image_features(images, deterministic_fake=deterministic_fake)
    quality = feats.select(
        "image_id",
        (
            (F.col("mean_r") + F.col("mean_g") + F.col("mean_b")) / F.lit(3.0)
        ).alias("quality"),
    )
    pos = images.select(
        "image_id",
        C.cell_col(F.col("lon"), F.col("lat"), res).alias("tile"),
    )
    return (
        pos.join(quality, "image_id")
        .groupBy("tile")
        .agg(
            F.max_by(
                F.struct("quality", "image_id"),
                F.struct("quality", "image_id"),
            ).alias("_b")
        )
        .select(
            "tile",
            F.col("_b.image_id").alias("image_id"),
            F.col("_b.quality").alias("quality"),
        )
    )
