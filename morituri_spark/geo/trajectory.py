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


def resample_track(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
    interval_s: int = 900,
) -> DataFrame:
    """Fixed-interval track resampling — the normalization step before
    sequence models consume location histories: → (key, k, x, y) with the
    position linearly interpolated at ``k·interval_s`` seconds after the
    trace's first fix, for every k the trace spans. k=0 is the first fix;
    grid point k > 0 belongs to the unique segment with
    ``off_prev < k·T ≤ off_next`` (half-open on the left, so a fix landing
    exactly on the grid is emitted once, by the segment it closes).

    Plan shape: ONE exchange (the key window); each segment explodes only
    the grid points it covers (sequence guard, never descending), so
    output volume is duration/T per trace regardless of fix density —
    dense 1 Hz traces collapse, sparse traces interpolate. Second-diffs
    use the rule-12 NTZ-parity form; interpolated coordinates are
    shared-epsilon rounded (rule 16) with the fraction staged as the
    identical double expression on both engines."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    T = int(interval_s)
    staged = df.select(
        key_col, ts_col, *[c for c in order_cols if c != ts_col], lon, lat,
        F.first(ts_col).over(w).alias("_t0"),
        F.row_number().over(w).alias("_rn"),
    ).select(
        key_col, *order_cols, lon, lat, "_rn",
        F.expr(
            f"timestampdiff(SECOND, date_trunc('SECOND', _t0),"
            f" date_trunc('SECOND', {ts_col}))"
        ).alias("_off"),
    )
    seg = staged.select(
        key_col, lon, lat, "_rn", "_off",
        F.lead("_off").over(w).alias("_noff"),
        F.lead(lon).over(w).alias("_nlon"),
        F.lead(lat).over(w).alias("_nlat"),
    )

    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)

    # ONE explode covers both row kinds (a union of a k=0 branch and an
    # interpolation branch would recompute the window subtree twice —
    # rule 21): the trace's first row extends its sequence down to k=0,
    # where the interpolation CASE short-circuits to the fix itself (also
    # covering single-fix and duplicate-second-leading traces, whose
    # segment part is empty).
    lo = F.when(F.col("_rn") == 1, F.lit(0).cast("bigint")).otherwise(
        F.expr(f"_off div {T}") + F.lit(1)
    )
    hi = F.when(
        F.col("_noff").isNotNull() & (F.col("_noff") > F.col("_off")),
        F.expr(f"_noff div {T}"),
    ).otherwise(
        F.when(F.col("_rn") == 1, F.lit(0).cast("bigint")).otherwise(
            F.lit(-1).cast("bigint")
        )
    )
    ks = seg.select(
        key_col, lon, lat, "_off", "_noff", "_nlon", "_nlat",
        F.explode(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            )
        ).alias("k"),
    )
    f = (F.col("k") * F.lit(T) - F.col("_off")).cast("double") / (
        F.col("_noff") - F.col("_off")
    ).cast("double")
    # k·T == off happens ONLY for the injected k=0 on the first row (every
    # segment k satisfies k·T > off strictly), so the CASE is the exact
    # "grid point on the anchor fix" rule, not an approximation
    on_anchor = F.col("k") * F.lit(T) == F.col("_off")
    return ks.select(
        F.col(key_col),
        F.col("k").cast("int").alias("k"),
        _r6(
            F.when(on_anchor, F.col(lon)).otherwise(
                F.col(lon) + (F.col("_nlon") - F.col(lon)) * f
            )
        ).alias("x"),
        _r6(
            F.when(on_anchor, F.col(lat)).otherwise(
                F.col(lat) + (F.col("_nlat") - F.col(lat)) * f
            )
        ).alias("y"),
    )


def od_matrix(
    traces: DataFrame,
    zones: DataFrame,
    key_col: str,
    order_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
    assign=None,
) -> DataFrame:
    """Origin–destination flow matrix: (zone_o, zone_d, n_trips) counting
    each trace once, from its FIRST point's zone to its LAST point's (by
    ``order_cols``; unassigned endpoints land in zone -1).

    The zone-attribution sibling of :func:`segment_zone_lengths` for the
    mobility-corpus family (demand matrices, trip tables). Scale shape:

    - endpoints come from ONE map-side-combinable aggregate
      (min_by/max_by on the order struct) — no per-trace window sort,
      no second pass over the points;
    - BOTH endpoints ride one PIP assignment (a 2-row explode per trace,
      through the engine's planner-routed point-in-polygon join —
      broadcast / salted-shuffle / codegen per its own gates);
    - the flow rollup reuses the endpoint aggregate's hash exchange
      shape (groupBy on two small ints — partial agg before the only
      wide exchange).

    ``assign``: (points_df(point_id, lon, lat), zones) -> (point_id,
    zone_id); defaults to :func:`morituri_spark.geo.pip.
    assign_zones_broadcast`. Multi-assignment (overlapping zones) would
    double-count a trip per containing pair — feed non-overlapping
    admin zones (the engine's PIP zones are exclusive by the half-open
    edge rule).
    """
    if assign is None:
        from morituri_spark.geo import pip

        assign = pip.assign_zones_broadcast

    order_struct = F.struct(*[F.col(c) for c in order_cols])
    ends = traces.groupBy(F.col(key_col).alias("_k")).agg(
        F.min_by(F.struct(F.col(lon), F.col(lat)), order_struct).alias("_o"),
        F.max_by(F.struct(F.col(lon), F.col(lat)), order_struct).alias("_d"),
    )
    # one PIP pass over both endpoints: explode to (key, end, lon, lat)
    pts = ends.select(
        "_k",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("e"), F.col(f"_o.{lon}").alias("x"), F.col(f"_o.{lat}").alias("y")),
                F.struct(F.lit(1).alias("e"), F.col(f"_d.{lon}").alias("x"), F.col(f"_d.{lat}").alias("y")),
            )
        ).alias("_p"),
    ).select(
        F.concat_ws("#", F.col("_k").cast("string"), F.col("_p.e").cast("string")).alias("point_id"),
        F.col("_p.x").alias("lon"),
        F.col("_p.y").alias("lat"),
    )
    # two consumers (the PIP join and the unassigned-endpoint left join)
    # would each recompute the endpoint aggregate; truncate lineage once —
    # 2 rows per trace, far smaller than the corpus (rule 10/14 family)
    pts = pts.localCheckpoint()
    assigned = assign(pts, zones)
    back = pts.select("point_id").join(assigned, "point_id", "left").select(
        F.substring_index("point_id", "#", 1).alias("_k"),
        F.substring_index("point_id", "#", -1).cast("int").alias("_e"),
        F.coalesce(F.col("zone_id"), F.lit(-1)).alias("_z"),
    )
    flows = (
        back.groupBy("_k")
        .agg(
            F.max(F.when(F.col("_e") == 0, F.col("_z"))).alias("zone_o"),
            F.max(F.when(F.col("_e") == 1, F.col("_z"))).alias("zone_d"),
        )
        .groupBy("zone_o", "zone_d")
        .agg(F.count(F.lit(1)).alias("n_trips"))
    )
    return flows


def position_at(
    traces: DataFrame,
    queries: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Interpolated position of every key at every query instant — the
    geo AS-OF join ("where was entity k at time T"): linear interpolation
    between the bracketing fixes, CLAMPED to the first/last fix outside
    the trace's span. Keys with no fixes drop out (inner semantics).

    Shape (the as-of union-window pattern, operators/asof.py): fixes and
    query stamps union-tag into ONE relation, a forward and a backward
    keyed window each fill ONE whole-fix struct (never per-column fills —
    a spliced fill would pair lon from one fix with lat from another),
    and the lerp is closed-form Catalyst arithmetic. ONE exchange on the
    key; no join, no per-query probe. Seconds are whole-second epochs
    (rule 12: truncate then diff; session tz is UTC so the diffs equal
    DuckDB's). Outputs round half-up at 6 dp (rule 16, shared with the
    SQL oracle); ties (query exactly on a fix) take that fix exactly —
    fixes sort BEFORE queries at equal seconds in the forward window and
    AFTER them in the backward window, so both brackets land on the fix
    and the lerp degenerates to it bit-exactly.
    """
    fsec = F.unix_timestamp(F.date_trunc("SECOND", F.col(ts_col)))
    fixes = traces.select(
        F.col(key_col).alias("_k"),
        fsec.alias("_s"),
        F.lit(0).alias("_isq"),
        F.col(lon).alias("_flon"),
        F.col(lat).alias("_flat"),
        F.col(ts_col).alias("_qts"),
    )
    qs = queries.select(
        F.col(key_col).alias("_k"),
        fsec.alias("_s"),
        F.lit(1).alias("_isq"),
        F.lit(None).cast("double").alias("_flon"),
        F.lit(None).cast("double").alias("_flat"),
        F.col(ts_col).alias("_qts"),
    )
    u = fixes.unionByName(qs)
    fix_struct = F.when(
        F.col("_isq") == 0, F.struct("_s", "_flon", "_flat")
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_s", "_isq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_s").desc(), F.col("_isq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = u.select(
        "_k", "_s", "_isq", "_qts",
        F.last(fix_struct, ignorenulls=True).over(wf).alias("_prev"),
        F.last(fix_struct, ignorenulls=True).over(wb).alias("_next"),
    ).where(F.col("_isq") == 1)
    # clamp: missing bracket borrows the other side (span edges)
    prev = F.coalesce(F.col("_prev"), F.col("_next"))
    nxt = F.coalesce(F.col("_next"), F.col("_prev"))
    dt = nxt["_s"] - prev["_s"]
    frac = F.when(dt > 0, (F.col("_s") - prev["_s"]).cast("double") / dt.cast("double")).otherwise(F.lit(0.0))

    def _r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5) + F.lit(1e-8)) / F.lit(1e6)

    return staged.where(prev.isNotNull()).select(
        F.col("_k").alias(key_col),
        F.col("_qts").alias(ts_col),
        _r6(prev["_flon"] + (nxt["_flon"] - prev["_flon"]) * frac).alias("lon"),
        _r6(prev["_flat"] + (nxt["_flat"] - prev["_flat"]) * frac).alias("lat"),
    )


def track_motion(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-track motion features — the standard trace-quality /
    anomaly-filter columns for mobility and capture-path corpora:

    - ``path_km``: traveled geodesic length (4-dp, path_lengths' rule);
    - ``direct_km``: first→last haversine (6-dp);
    - ``tortuosity``: path/direct, 4-dp — 1.0 is a straight run; spoofed
      or noise-dominated traces read high; direct == 0 rounds to NULL
      (closed loops have no defined tortuosity);
    - ``max_speed_kmh``: max per-segment speed (segment haversine over
      rule-12 whole-second diffs, 4-dp per segment BEFORE the max, so
      both engines pick the same element); zero-duration segments
      (duplicate truncated seconds) are excluded — NULL when no segment
      has positive duration.

    ONE hash exchange on the key: the lag window and the final aggregate
    share partitioning, closed-form Catalyst end to end.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    step = haversine_km(
        F.lag(lon).over(w), F.lag(lat).over(w), F.col(lon), F.col(lat)
    )
    dt = F.expr(
        f"timestampdiff(SECOND, date_trunc('SECOND', lag({ts_col}) OVER "
        f"(PARTITION BY {key_col} ORDER BY {', '.join(order_cols)})),"
        f" date_trunc('SECOND', {ts_col}))"
    )
    staged = df.select(
        key_col,
        step.alias("_step"),
        dt.alias("_dt"),
        F.first(lon).over(wf).alias("_fx"),
        F.first(lat).over(wf).alias("_fy"),
        F.last(lon).over(wf).alias("_lx"),
        F.last(lat).over(wf).alias("_ly"),
    ).select(
        key_col, "_step", "_fx", "_fy", "_lx", "_ly",
        F.when(
            F.col("_dt") > 0,
            F.round(F.col("_step") / F.col("_dt") * F.lit(3600.0), 4),
        ).alias("_speed"),
    )
    direct = F.round(
        haversine_km(
            F.first("_fx"), F.first("_fy"), F.first("_lx"), F.first("_ly")
        ),
        6,
    )
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("_step"), 4).alias("path_km"),
        direct.alias("direct_km"),
        F.when(
            direct > 0, F.round(F.round(F.sum("_step"), 4) / direct, 4)
        ).alias("tortuosity"),
        F.max("_speed").alias("max_speed_kmh"),
    )


def geofence_visits(
    points: DataFrame,
    zone_rows,
    key_col: str = "key",
    t_col: str = "t",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Geofence enter/exit mining — collapse each ordered trace into
    VISIT runs: maximal spans of consecutive points inside the same
    fence (or outside every fence), with enter/exit instants and dwell.

    → (key, visit, zone_id, enter_t, exit_t, n_points, dwell): one row
    per run; ``zone_id`` NULL = outside every fence, ``visit`` is the
    1-based run index, ``exit_t`` = the next run's ``enter_t`` (NULL for
    the trace's open last run), ``dwell = exit_t − enter_t`` in
    ``t_col``'s own units. Overlapping fences resolve to the SMALLEST
    zone_id (a pinned deterministic tie rule — geofence sets are
    normally disjoint).

    Spark-first shape: zone membership is the stateless literal-edge
    PIP expression (pip._zone_pip_condition — whole-stage codegen, no
    join) reduced by ``array_min`` to one zone per point, then the runs
    are gaps-and-islands windows. ONE hash exchange on the key: the
    run groupBy and the exit-lead window both reuse the window's
    HashPartitioning (superset-key clustering), same as stay_points.
    """
    from .pip import _zone_pip_condition

    zone = F.array_min(
        F.array(
            *[
                F.when(
                    _zone_pip_condition(rings, F.col(lon_col), F.col(lat_col)),
                    F.lit(zid).cast("long"),
                )
                for zid, rings in zone_rows
            ]
        )
    )
    staged = points.select(
        F.col(key_col).alias("key"),
        F.col(t_col).alias("t"),
        zone.alias("zone_id"),
    )
    w = Window.partitionBy("key").orderBy("t")
    flagged = staged.select(
        "key",
        "t",
        "zone_id",
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.col("zone_id").eqNullSafe(F.lag("zone_id").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new"),
    )
    runs = flagged.select(
        "key",
        "t",
        "zone_id",
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("visit"),
    )
    agg = runs.groupBy("key", "visit").agg(
        F.max("zone_id").alias("zone_id"),
        F.min("t").alias("enter_t"),
        F.count(F.lit(1)).alias("n_points"),
    )
    wv = Window.partitionBy("key").orderBy("visit")
    return agg.select(
        "key",
        F.col("visit").cast("long").alias("visit"),
        "zone_id",
        "enter_t",
        F.lead("enter_t").over(wv).alias("exit_t"),
        F.col("n_points").cast("long").alias("n_points"),
    ).select(
        "key",
        "visit",
        "zone_id",
        "enter_t",
        "exit_t",
        "n_points",
        (F.col("exit_t") - F.col("enter_t")).alias("dwell"),
    )
