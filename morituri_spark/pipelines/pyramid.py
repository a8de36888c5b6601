"""Tile pyramid — multi-zoom rollup where each level feeds the next.

Tiling engines serve every zoom level; recomputing each level from the raw
table scans the 100 TB fact table once PER ZOOM. The cascade aggregates
level z-1 from level z's (already tiny) aggregates — one full scan total,
then log-depth rollups over data that shrinks 4× per level. Parent ids are
pure bit math (`cells.parent_col`), so every cascade step is a codegen
groupBy with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo import cells


def tile_pyramid(
    points: DataFrame,
    res_max: int,
    res_min: int,
    lon: str = "lon",
    lat: str = "lat",
    value_col: str | None = None,
) -> DataFrame:
    """→ (res, tile, n_points[, sum_value]) for every res in
    [res_min, res_max]. Only the res_max level touches the input."""
    if res_min > res_max:
        raise ValueError("res_min must be <= res_max")
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    level = (
        points.select(
            cells.cell_col(F.col(lon), F.col(lat), res_max).alias("tile"),
            *([F.col(value_col)] if value_col else []),
        )
        .groupBy("tile")
        .agg(*aggs)
    )
    out = level.withColumn("res", F.lit(res_max))
    for r in range(res_max - 1, res_min - 1, -1):
        roll = [F.sum("n_points").alias("n_points")]
        if value_col:
            roll.append(F.sum("sum_value").alias("sum_value"))
        level = (
            level.select(
                cells.parent_col(F.col("tile"), r, r + 1).alias("tile"),
                "n_points",
                *(["sum_value"] if value_col else []),
            )
            .groupBy("tile")
            .agg(*roll)
        )
        out = out.unionByName(level.withColumn("res", F.lit(r)))
    return out
