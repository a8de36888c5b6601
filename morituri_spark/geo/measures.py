"""Geodesic measures — haversine distance and per-key path length.

Pure Catalyst trigonometry (whole-stage codegen): no kernel, no shuffle
beyond the window's key partitioning. The same closed form evaluates in
any ANSI engine, so path lengths are oracle-checkable to fixed rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km (closed form, codegen-friendly)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def ring_areas(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Per-key shoelace area of the closed polygon through the ordered
    points (planar coordinates; |signed area| — self-intersections
    contribute with sign, the standard shoelace semantics). Pure window +
    aggregate expressions; the closing edge uses full-frame
    first/last_value so no second pass is needed."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cross = F.col(x) * F.lead(y).over(w) - F.lead(x).over(w) * F.col(y)
    staged = df.select(
        key_col,
        cross.alias("_cross"),
        F.first(x).over(wf).alias("_fx"),
        F.first(y).over(wf).alias("_fy"),
        F.last(x).over(wf).alias("_lx"),
        F.last(y).over(wf).alias("_ly"),
    )
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.abs(
                F.sum("_cross")
                + F.first("_lx") * F.first("_fy")
                - F.first("_fx") * F.first("_ly")
            )
            / 2.0,
            4,
        ).alias("ring_area"),
    )


def path_lengths(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-key traveled path length: one window (lag) + one aggregation —
    the shuffle is on the key only."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    step = haversine_km(
        F.lag(lon).over(w), F.lag(lat).over(w), F.col(lon), F.col(lat)
    )
    return (
        df.withColumn("_step", step)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("_step"), 4).alias("path_km"),
        )
    )
