"""Trajectory mining — stay-point (dwell) detection over ordered traces.

The classic stay-point rule (Li et al., "Mining user similarity based on
location history", GIS'08) walks each trace sequentially; the Spark-first
re-expression below is the gap-based variant used by large-scale
pipelines: a dwell BREAKS when the step to the previous point exceeds
``radius_km`` (strict >) or the time gap exceeds ``max_gap_s`` (strict >),
and a run qualifies as a stay when it spans >= ``min_points`` points and
>= ``min_duration_s`` seconds. That makes the whole operator two window
passes plus one aggregate over a single exchange:

- ONE hash exchange on ``key_col`` (the window partitioning); the final
  groupBy on (key, stay_id) reuses it (HashPartitioning(key) satisfies
  the clustered distribution of any superset key), so Catalyst plans NO
  second shuffle — verified via .explain in tests.
- Everything is closed-form Catalyst trigonometry/window algebra
  (whole-stage codegen, no Python), so the operator is SQL-oracle-able
  to fixed rounding and runs at scan speed on 10^12-row traces.

Timestamp diffs follow the project's NTZ parity rule (CLAUDE.md rule 12):
``timestampdiff(SECOND, date_trunc('SECOND', a), date_trunc('SECOND', b))``
equals DuckDB's ``date_diff('second', a, b)``.

Reference scope note: morituri (plugins/navteq) has no trajectory
operator — this is target-spec extension coverage for the
training-data-pipeline family (stay points are the standard POI /
home-location primitive for location-history corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from morituri_spark.geo.measures import haversine_km


def stay_points(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
    radius_km: float = 2.0,
    max_gap_s: int = 3600,
    min_duration_s: int = 300,
    min_points: int = 2,
) -> DataFrame:
    """(key, stay_id, n_points, start_ts, end_ts, duration_s, c_lon, c_lat)
    for every qualifying dwell; ``stay_id`` numbers runs 1..R in trace
    order (breaks included, so ids are stable whether or not a run
    qualifies). Centroid = arithmetic mean of member points, rounded
    half-up to 6 dp (shared with the SQL oracle)."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    # stage 1: lagged neighbors as their own projection (rule 9 — lag
    # re-evaluation is not CSE'd when inlined into the break predicate)
    lagged = df.select(
        key_col,
        ts_col,
        *[c for c in order_cols if c != ts_col],
        lon,
        lat,
        F.lag(lon).over(w).alias("_plon"),
        F.lag(lat).over(w).alias("_plat"),
        F.lag(ts_col).over(w).alias("_pts"),
    )
    gap_s = F.expr(
        f"timestampdiff(SECOND, date_trunc('SECOND', _pts),"
        f" date_trunc('SECOND', {ts_col}))"
    )
    brk = (
        F.col("_pts").isNull()
        | (haversine_km(F.col("_plon"), F.col("_plat"), F.col(lon), F.col(lat))
           > F.lit(float(radius_km)))
        | (gap_s > F.lit(int(max_gap_s)))
    ).cast("int")
    flagged = lagged.select(
        key_col, ts_col, *[c for c in order_cols if c != ts_col],
        lon, lat, brk.alias("_brk"),
    )
    runs = flagged.select(
        key_col, ts_col, lon, lat,
        F.sum("_brk").over(w).alias("stay_id"),
    )
    out = (
        runs.groupBy(key_col, "stay_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            # shared-epsilon half-up (rule 16): an n=2 dwell's centroid of
            # 1e-6-granular coordinates sits EXACTLY on the 5e-7 half
            # boundary, so F.round vs the oracle would be decided by float
            # dust; both engines evaluate this identical closed form.
            (F.floor(F.avg(lon) * 1e6 + 0.5 + 1e-8) / 1e6).alias("c_lon"),
            (F.floor(F.avg(lat) * 1e6 + 0.5 + 1e-8) / 1e6).alias("c_lat"),
        )
        .withColumn(
            "duration_s",
            F.expr(
                "timestampdiff(SECOND, date_trunc('SECOND', start_ts),"
                " date_trunc('SECOND', end_ts))"
            ),
        )
        .where(
            (F.col("n_points") >= int(min_points))
            & (F.col("duration_s") >= int(min_duration_s))
        )
    )
    return out.select(
        key_col, "stay_id", "n_points", "start_ts", "end_ts",
        "duration_s", "c_lon", "c_lat",
    )
