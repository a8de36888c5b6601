"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial pipeline (geocell encode → PIP
zone assignment → tile×zone rollup) over points derived from the sf0.001
``events`` table. ``queries()`` exposes one entry per implemented operator
family from SURVEY.md §2 (+ the training-data operators); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one. Non-SQL ops
(z-split goldens, ring chunking, turn restrictions, minhash/simhash, LSH
ANN, fingerprints) are rows-only checks by design.

Column names/types are aligned pairwise: every aggregate is aliased the
same on both sides, DuckDB sums are cast (sum() widens to HUGEINT
otherwise), doubles are rounded before comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# --- shared derivations ------------------------------------------------------

# Deterministic point cloud from the events table (computable in both
# engines): lon ∈ [0,10), lat ∈ [40,50). Explicit DOUBLE casts — Spark
# parses bare `100.0` as DECIMAL, DuckDB as DOUBLE; mixed precision breaks
# tie-order parity in the kNN oracle.
_LON = "CAST(user_id % 1000 AS DOUBLE) / CAST(100 AS DOUBLE)"
_LAT = "CAST(40 AS DOUBLE) + CAST(event_id % 1000 AS DOUBLE) / CAST(100 AS DOUBLE)"
# event-derived lon (decorrelated from _LAT): full [0,10) spread even when
# the user_id range is narrow
_IMG_LON = "CAST((event_id * 7) % 1000 AS DOUBLE) / CAST(100 AS DOUBLE)"

# globe-spanning derivation for the Z-order layout query: pruning layers only
# earn their keep when points cover many coarse cells
_GLON = "CAST((event_id * 7919) % 360000 AS DOUBLE) / CAST(1000 AS DOUBLE) - CAST(180 AS DOUBLE)"
_GLAT = "CAST((event_id * 104729) % 180000 AS DOUBLE) / CAST(1000 AS DOUBLE) - CAST(90 AS DOUBLE)"
_LAYOUT_BBOX = (-30.0, -45.0, 60.0, 30.0)

# clustered closed-form traces for the Hausdorff similarity join: 40 tracks
# in 8 base locations (5 tracks each, ~0.1-deg jitter per track, ~0.05-deg
# per-point spread) — in-group Hausdorff lands 2.9-11.3 km so a 10 km gate
# discriminates WITHIN groups; cross-group distances are >= 20 deg. All
# integer-modulo arithmetic with explicit DOUBLE casts (rule 5) so DuckDB
# replays the coordinates bit-for-bit.
_HTID = "event_id % 40"
_HSEL = "event_id % 7 = 0"
_HLON = (
    "CAST((event_id % 40) % 8 AS DOUBLE) * CAST(40 AS DOUBLE)"
    " - CAST(160 AS DOUBLE)"
    " + CAST(((event_id % 40) * 131) % 97 AS DOUBLE) / CAST(1000 AS DOUBLE)"
    " + CAST((event_id * 61) % 181 AS DOUBLE) / CAST(2000 AS DOUBLE)"
    " - CAST(45 AS DOUBLE) / CAST(1000 AS DOUBLE)"
)
_HLAT = (
    "CAST((((event_id % 40) % 8) * 23) % 100 AS DOUBLE) - CAST(50 AS DOUBLE)"
    " + CAST(((event_id % 40) * 173) % 89 AS DOUBLE) / CAST(1000 AS DOUBLE)"
    " + CAST((event_id * 37) % 151 AS DOUBLE) / CAST(2000 AS DOUBLE)"
    " - CAST(75 AS DOUBLE) / CAST(2000 AS DOUBLE)"
)

# non-uniform value bands for the range-join query (shared literal VALUES)
_BANDS = [(0, 0.0, 25.0), (1, 25.0, 40.0), (2, 40.0, 55.0), (3, 55.0, 80.0), (4, 80.0, 1000.0)]
_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS)

# per-source token budgets for the mixture sampler (n_chars as the token
# proxy — integral, exactly SQL-replayable); regimes: boundary-crossing,
# tight, single-doc, and everything-under-budget
_MIXTURE_BUDGETS = {"src0": 5000, "src1": 2500, "src2": 100, "src3": 99999}

# 3×3 offset rect grid (cell 3.4°, origin (0.9, 41.1)) overlapping the 4×4
# zone grid — the B side of the polygon-overlap join; grid lines chosen so
# no edge coincides with the A grid (no zero-area boundary-touch pairs)
_OVL_B = [
    (gy * 3 + gx, 0.9 + gx * 3.4, 41.1 + gy * 3.4, 0.9 + (gx + 1) * 3.4, 41.1 + (gy + 1) * 3.4)
    for gy in range(3)
    for gx in range(3)
]
_OVL_B_SQL = ", ".join(f"({z}, {x0}, {y0}, {x1}, {y1})" for z, x0, y0, x1, y1 in _OVL_B)

# 4×4 rect zone grid over the bbox (mirrors synth.zones_table admin_lvl=3).
_GRID = 4
_ZONES_SQL = ", ".join(
    f"({gy * _GRID + gx}, {gx * 2.5}, {40 + gy * 2.5}, {(gx + 1) * 2.5}, {40 + (gy + 1) * 2.5})"
    for gy in range(_GRID)
    for gx in range(_GRID)
)


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        F.expr(_LON).alias("lon"),
        F.expr(_LAT).alias("lat"),
    )


def _rect_zones(spark: SparkSession) -> DataFrame:
    rows = []
    for gy in range(_GRID):
        for gx in range(_GRID):
            x0, y0 = gx * 2.5, 40 + gy * 2.5
            x1, y1 = x0 + 2.5, y0 + 2.5
            ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
            rows.append((gy * _GRID + gx, [ring]))
    return spark.createDataFrame(rows, "zone_id long, rings array<array<array<double>>>")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- entry -------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP zone assignment + tile rollup on sf0.001 events."""
    from morituri_spark.geo import pip
    from morituri_spark.geo import cells as C

    sf_dir = "/root/testdata/sf0.001"
    pts = _points(spark, sf_dir)
    assigned = pip.assign_zones_broadcast(
        pts.withColumnRenamed("event_id", "point_id"), _rect_zones(spark)
    )
    return (
        assigned.withColumn("tile", C.cell_col(F.col("lon"), F.col("lat"), 6))
        .groupBy("tile", "zone_id")
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("point_id").alias("first_id"))
    )


# --- queries ----------------------------------------------------------------

def _q_pricing(spark, sf_dir):
    """A1-family multi-aggregate (TPC-H Q1 shape)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_dim_chain(spark, sf_dir):
    """J4 two-hop dimension chain with broadcast joins."""
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region")
    o = _read(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


def _q_semi(spark, sf_dir):
    """P7 semi-join: customers with ≥1 open ('O') order."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").where("o_orderstatus = 'O'")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


def _q_anti(spark, sf_dir):
    """P8 completeness/anti-join: customers with no orders at all."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def _q_min_pivot(spark, sf_dir):
    """A1 min-pivot: per part, min extendedprice per returnflag."""
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.round(F.min(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))), 2).alias("min_r"),
        F.round(F.min(F.when(F.col("l_returnflag") == "A", F.col("l_extendedprice"))), 2).alias("min_a"),
        F.round(F.min(F.when(F.col("l_returnflag") == "N", F.col("l_extendedprice"))), 2).alias("min_n"),
    )


def _q_group_collect(spark, sf_dir):
    """A2/A3 ordered group-collect (as a joined string for comparability)."""
    li = _read(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias("line_numbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def _q_window_lead(spark, sf_dir):
    """W1-family ordered-window logic: per-user value delta via lead."""
    from pyspark.sql.window import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.lead("value", 1).over(w) - F.col("value"), 4).alias("delta_next"),
    )


def _q_window_topk(spark, sf_dir):
    """J11-family windowed top-k: top-3 orders by totalprice per customer."""
    from pyspark.sql.window import Window

    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where("rk <= 3")
        .select("o_custkey", "o_orderkey", "rk")
    )


def _q_dedup_quantized(spark, sf_dir):
    """J7 quantized-equality dedup: first-writer-wins per value bucket."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.select(F.floor(F.col("value") * 100).cast("long").alias("bucket"), "event_id")
        .groupBy("bucket")
        .agg(F.min("event_id").alias("canonical_event"), F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def _q_case_tree(spark, sf_dir):
    """P4-family nested CASE decision tree."""
    o = _read(spark, sf_dir, "orders")
    cls = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            F.when(F.col("o_totalprice") >= 200000, "critical").otherwise("elevated"),
        )
        .when(F.col("o_orderstatus") == "F", "done")
        .otherwise("routine")
    )
    return o.groupBy(cls.alias("order_class")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


def _q_units_format(spark, sf_dir):
    """F6-F9 formatting parity: %.6g strings computed from part sizes."""
    from morituri_spark.functions.units import kg_to_t_udf, cm_to_m_udf, inch_to_feet_col

    p = _read(spark, sf_dir, "part")
    kg = (F.col("p_size") * 317 + F.col("p_partkey")).cast("long")
    return p.select(
        "p_partkey",
        kg_to_t_udf(kg).alias("as_tons"),
        cm_to_m_udf(kg).alias("as_meters"),
        inch_to_feet_col(kg).alias("as_feet"),
    )


def _q_string_merge(spark, sf_dir):
    """F11 postcode-merge semantics over nation/region names."""
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return j.select(
        "n_nationkey",
        F.when(F.col("n_name") == F.col("r_name"), F.col("n_name"))
        .otherwise(F.concat_ws(";", "n_name", "r_name"))
        .alias("merged_name"),
    )


def _q_hourly_rollup(spark, sf_dir):
    """Streaming-analog tumbling-window rollup in batch (events/hour/type)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def _q_chunk_groups(spark, sf_dir):
    """W4-family fixed-size chunking: lineitems per order in chunks of ≤3."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", F.floor((F.col("l_linenumber") - 1) / 3).alias("chunk"))
        .groupBy("l_orderkey", "chunk")
        .agg(F.count(F.lit(1)).alias("n_in_chunk"))
    )


def _q_pip_zones(spark, sf_dir):
    """J10 spatial join through the REAL PIP engine vs a SQL bbox oracle
    (rect zones make containment SQL-expressible; the tie rule is the
    engine's half-open edge rule on both sides)."""
    from morituri_spark.geo import pip

    pts = _points(spark, sf_dir).withColumnRenamed("event_id", "point_id")
    return pip.assign_zones_broadcast(pts, _rect_zones(spark)).select("point_id", "zone_id")


def _q_pip_zones_shuffle(spark, sf_dir):
    """Same join through the salted shuffle path (skew-safe variant)."""
    from morituri_spark.geo import pip

    pts = _points(spark, sf_dir).withColumnRenamed("event_id", "point_id")
    return pip.assign_zones_shuffle(
        # tiny work target → salting engages; correctness of the salt-split
        # cogroup path is what this oracle entry checks
        pts, _rect_zones(spark), res=7, salt_target_work=10_000.0
    ).select("point_id", "zone_id")


def _q_pip_zones_codegen(spark, sf_dir):
    """Same spatial join through the single-scan codegen path (literal-edge
    whens + explode) — third strategy, same SQL oracle."""
    from morituri_spark.geo import pip

    pts = _points(spark, sf_dir).withColumnRenamed("event_id", "point_id")
    zone_rows = [
        (r["zone_id"], r["rings"])
        for r in _rect_zones(spark).collect()
    ]
    return pip.assign_zones_union(pts, zone_rows).select("point_id", "zone_id")


def _q_pip_multipolygon(spark, sf_dir):
    """J10 over a MultiPolygon zone: two disjoint island exteriors, the
    first with a hole, in ONE zone row — oracle is the island/hole rect
    algebra with the engine's half-open edge rule."""
    from morituri_spark.geo import pip

    pts = _points(spark, sf_dir).withColumnRenamed("event_id", "point_id")
    rings = [
        [[1.0, 41.0], [3.0, 41.0], [3.0, 43.0], [1.0, 43.0], [1.0, 41.0]],
        [[1.5, 41.5], [2.5, 41.5], [2.5, 42.5], [1.5, 42.5], [1.5, 41.5]],
        [[6.0, 44.0], [8.0, 44.0], [8.0, 46.0], [6.0, 46.0], [6.0, 44.0]],
    ]
    zones = spark.createDataFrame(
        [(0, rings)], "zone_id long, rings array<array<array<double>>>"
    )
    return pip.assign_zones_catalyst(pts, zones, res=8).select("point_id", "zone_id")


def _q_cell_counts(spark, sf_dir):
    """G9 geocell encode — id bit math mirrored as SQL arithmetic."""
    from morituri_spark.geo import cells as C

    pts = _points(spark, sf_dir)
    return (
        pts.withColumn("cell", C.cell_col(F.col("lon"), F.col("lat"), 7))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def _q_tile_zone_rollup(spark, sf_dir):
    """Flagship raster-tile × vector-zone rollup (entry(), oracle-checked)."""
    from morituri_spark.geo import pip
    from morituri_spark.geo import cells as C

    pts = _points(spark, sf_dir).withColumnRenamed("event_id", "point_id")
    assigned = pip.assign_zones_broadcast(pts, _rect_zones(spark))
    return (
        assigned.withColumn("tile", C.cell_col(F.col("lon"), F.col("lat"), 6))
        .groupBy("tile", "zone_id")
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("point_id").alias("first_id"))
    )


def _q_spatial_layout(spark, sf_dir):
    """Z-order-clustered layout write + doubly-pruned bbox read (io/layout).

    Writes a globe-spanning event point cloud cell-partitioned and
    Morton-sorted, reads a bbox back through partition pruning + row-group
    zorder stats + exact refine, and aggregates. The DuckDB oracle computes
    the same aggregate with a plain WHERE over the source table — a hash
    match proves the pruned read path loses and invents nothing.
    """
    import os

    from morituri_spark.io import layout

    pts = _read(spark, sf_dir, "events").select(
        "event_id", "event_type", "value",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    path = f"/tmp/morituri_layout_{os.path.basename(sf_dir.rstrip('/'))}"
    layout.write_spatial(pts, path, res_part=3, res_sort=14)
    box = layout.read_bbox(spark, path, *_LAYOUT_BBOX)
    return box.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _q_interval_coverage(spark, sf_dir):
    """Interval union (operators/intervals.interval_coverage): per-key
    covered span over closed-form half-open intervals
    [37·id mod 10000, +1 + id mod 97) keyed by id mod 50 — overlapping
    and touching spans merge into islands via one running-max window +
    island-sum, one shuffle, all-integer arithmetic. The oracle replays
    the same gaps-and-islands windows verbatim."""
    from morituri_spark.operators.intervals import interval_coverage

    iv = _read(spark, sf_dir, "events").select(
        (F.col("event_id") % 50).alias("user_id"),
        ((F.col("event_id") * 37) % 10000).alias("start"),
        (
            (F.col("event_id") * 37) % 10000
            + F.col("event_id") % 97
            + 1
        ).alias("end"),
    )
    return interval_coverage(iv).select(
        F.col("key").cast("long").alias("key"),
        F.col("covered").cast("long").alias("covered"),
        F.col("n_islands").cast("long").alias("n_islands"),
        F.col("n_intervals").cast("long").alias("n_intervals"),
    )


def _q_funnel_stages(spark, sf_dir):
    """Funnel conversion (operators/funnel.funnel_stages): earliest
    in-order view→cart→buy completion per user, strictly-sequential
    (each stage must EXCEED the prior stage's completion instant — the
    tie rule the oracle replays). One conditional-min aggregate per
    stage joined back on the user key; no windows, no row explosion.
    Steps synth from event_id % 3."""
    from morituri_spark.operators.funnel import funnel_stages

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "ts",
        F.when(F.col("event_id") % 3 == 0, F.lit("view"))
        .when(F.col("event_id") % 3 == 1, F.lit("cart"))
        .otherwise(F.lit("buy"))
        .alias("step"),
    )
    out = funnel_stages(ev, ["view", "cart", "buy"])
    return out.select(
        F.col("key").cast("long").alias("key"),
        "t_1", "t_2", "t_3",
        F.col("stage").cast("int").alias("stage"),
    )


def _q_rolling_counts(spark, sf_dir):
    """Trailing range-frame aggregates (operators/rolling.rolling_counts):
    per event, the user's event count and value sum over the previous 6
    hours — ONE rangeBetween window, no self-join. The integer axis is
    the rule-12 tz-free second diff from a fixed epoch, so the RANGE
    frame (peers-at-equal-order included) is engine-exact."""
    from morituri_spark.operators.rolling import rolling_counts

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr(
            "timestampdiff(SECOND, date_trunc('SECOND',"
            " TIMESTAMP'2024-01-01 00:00:00'), date_trunc('SECOND', ts))"
        ).alias("t_s"),
        (F.col("event_id") % 100).alias("val"),
    )
    return rolling_counts(
        ev, "user_id", "t_s", range_width=21600, value_col="val"
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("t_s").cast("long").alias("t_s"),
        F.col("rolling_n").cast("long").alias("rolling_n"),
        F.col("rolling_sum").cast("long").alias("rolling_sum"),
    )


def _q_sessionize(spark, sf_dir):
    """Gap-based sessionization via F.session_window (operators/sessions);
    the oracle replays the gap rule with lag + running sum. Spark merges an
    event arriving EXACTLY gap after the previous one (inclusive bound,
    verified empirically in tests/test_sessions.py), so the oracle's
    new-session test is strict `>`."""
    from morituri_spark.operators.sessions import sessionize

    return sessionize(_read(spark, sf_dir, "events"), gap="30 minutes")


def _q_value_quantiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per event type (Spark
    `percentile` == DuckDB `quantile_cont`)."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25D)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
    )


def _q_diff_tables(spark, sf_dir):
    """Merkle-style table reconciliation (io/reconcile.diff_tables — the
    lineage/resume audit primitive): events vs a closed-form mutation of
    itself (drop every 131st key, +1.0 the value of every 97th, append
    every 211th under a shifted key). Per-bucket fingerprints (count +
    bit_xor + masked 31-bit sum, ONE map-side-combinable aggregate per
    side) prove equal buckets equal; only differing buckets re-scan into
    the row-level anti-joins — shuffle O(diff + buckets), never
    O(table). The oracle is an INDEPENDENT full outer join with IS
    DISTINCT FROM, so a green row proves the bucket routing lost
    nothing."""
    from morituri_spark.io.reconcile import diff_tables

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "value", "event_type"
    )
    b = ev.where("event_id % 131 <> 5").select(
        "event_id",
        F.when(F.expr("event_id % 97 = 3"), F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("value"),
        "event_type",
    ).unionByName(
        ev.where("event_id % 211 = 7").select(
            (F.col("event_id") + 10000000).alias("event_id"),
            "value", "event_type",
        )
    )
    return diff_tables(ev, b, ["event_id"])


def _q_quantiles_nosort(spark, sf_dir):
    """Sort-free exact quantiles (operators/quantiles.exact_quantiles):
    iterative histogram refinement — per round ONE map-side-combinable
    (quantile, bucket) count aggregate (kilobytes to the driver), ≤
    ceil(log_4096(domain)) + 2 rounds, NO shuffle of data rows ever —
    where value_quantiles' percentile() buffers whole groups and a
    sort-based rank would range-shuffle the entire table. Type-1
    semantics: smallest value with cumulative count ≥ ceil(q·n), the
    rank computed in IEEE double from the same literal q both engines
    parse (0.01·n can sit one ulp above an integer; both engines then
    ceil identically). The oracle is an independent full sort +
    row_number rank lookup."""
    from morituri_spark.operators.quantiles import exact_quantiles_df

    ev = _read(spark, sf_dir, "events").select(
        F.expr(
            "CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("vm")
    )
    return exact_quantiles_df(ev, "vm", [0.01, 0.25, 0.5, 0.9, 0.99])


def _q_cube_rollup(spark, sf_dir):
    """Multi-dimensional CUBE aggregate (type × day incl. margins); grouping
    nulls are coalesced to sentinels on both sides for the value compare."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return (
        ev.cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("1970-01-01").cast("timestamp")).alias("day"),
            "n",
            "sum_value",
        )
    )


def _q_asof_join(spark, sf_dir):
    """Backward as-of join (operators/asof: union + windowed gap-fill, one
    shuffle) — each non-purchase event picks up the user's most recent
    purchase value at-or-before its timestamp. Oracle: DuckDB's native
    ASOF LEFT JOIN. Right side is pre-aggregated unique per (user, ts) so
    tie-breaking is well-defined on both engines."""
    from morituri_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") != "purchase").select("event_id", "user_id", "ts")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(left, right, on="user_id").select(
        "event_id", "user_id", "last_purchase_value"
    )


def _q_range_join(spark, sf_dir):
    """Interval join via the binned equi-join (operators/rangejoin) — no
    nested-loop plan; the oracle is the plain inequality join."""
    from morituri_spark.operators.rangejoin import range_join

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(_BANDS, "band_id long, lo double, hi double")
    return range_join(ev, bands, "value").groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _q_hll_gate(spark, sf_dir):
    """Sketch-accuracy gate: approx_count_distinct (HLL++, rsd=0.02) vs the
    exact distinct count per event type — emits VIOLATION rows where the
    relative error exceeds 5%. Expected empty; the oracle is the empty set,
    so the driver's hash compare fails the round if the sketch drifts."""
    ev = _read(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return per_type.where(
        F.abs(F.col("approx_users") - F.col("exact_users"))
        > 0.05 * F.col("exact_users")
    ).select("event_type", "approx_users", "exact_users")


def _q_layout_polygon(spark, sf_dir):
    """read_polygon end-to-end: polygon cover → pruned read_cells → exact
    ray-cast refine, over the Z-order layout. A rectangular ring makes the
    containment SQL-expressible with the SAME half-open edge rule the PIP
    oracles established (bottom/left in, top/right out)."""
    import os

    from morituri_spark.io import layout

    pts = _read(spark, sf_dir, "events").select(
        "event_id", "value",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    path = f"/tmp/morituri_polyread_{os.path.basename(sf_dir.rstrip('/'))}"
    layout.write_spatial(pts, path, res_part=3, res_sort=14)
    ring = [[-20.0, -10.0], [45.0, -10.0], [45.0, 25.0], [-20.0, 25.0], [-20.0, -10.0]]
    inside = layout.read_polygon(spark, path, [ring], res_cover=6)
    return inside.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _q_simplify_violations(spark, sf_dir):
    """Douglas–Peucker gate (geo/simplify): per-user event polylines are
    simplified at eps, then an INDEPENDENT kernel re-measures the max
    deviation of every original vertex from the simplified line and checks
    endpoint preservation. Violations expected: none (empty-set oracle)."""
    import numpy as np
    import pandas as pd

    from morituri_spark.geo import simplify as SIM

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.expr(_GLON).alias("x"), F.expr(_GLAT).alias("y")
    )
    lines = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "x", "y"))
            ).alias("pts")
        )
        .where(F.size("pts") >= 3)
        .select(
            F.col("user_id").alias("geom_id"),
            F.transform("pts", lambda p: F.array(p["x"], p["y"])).alias("line"),
        )
    )
    eps = 2.0
    simplified = SIM.simplify_lines(lines, eps=eps).withColumnRenamed("line", "simp")
    joined = lines.join(simplified, "geom_id")

    def check(batches):
        for pdf in batches:
            bad = []
            for gid, line, simp in zip(pdf["geom_id"], pdf["line"], pdf["simp"]):
                o = np.asarray([[p[0], p[1]] for p in line])
                s = np.asarray([[p[0], p[1]] for p in simp])
                dev = SIM.max_deviation(o, s)
                ends_ok = (o[0] == s[0]).all() and (o[-1] == s[-1]).all()
                if dev > eps + 1e-9 or not ends_ok or len(s) > len(o):
                    bad.append((int(gid), float(dev)))
            yield pd.DataFrame(bad, columns=["geom_id", "deviation"])

    return joined.mapInPandas(check, "geom_id long, deviation double")


def _q_path_lengths(spark, sf_dir):
    """Geodesic per-user path length (geo/measures: haversine in pure
    Catalyst + one keyed window). The oracle evaluates the identical
    closed form — multiplication instead of power, explicit rounding —
    per the engine's DECIMAL/trig parity rules."""
    from morituri_spark.geo.measures import path_lengths

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return path_lengths(pts, "user_id", ["ts", "event_id"])


def _q_ring_areas(spark, sf_dir):
    """Shoelace polygon area per user over the ts-ordered point ring
    (geo/measures.ring_areas: one window + aggregate, closing edge via
    full-frame first/last). Oracle = the same closed form in SQL."""
    from morituri_spark.geo.measures import ring_areas

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return ring_areas(pts, "user_id", ["ts", "event_id"])


def _q_ring_areas_spherical(spark, sf_dir):
    """Spherical polygon area (geo/measures.ring_areas_spherical): the
    Chamberlain–Duquette sum over the same ts-ordered per-user rings as
    ring_areas_shoelace — one window + one aggregate, pure Catalyst
    trig. Oracle = identical term algebra in SQL; area rounds at 2 dp
    (continental magnitudes put cross-engine sum dust near 1e-4 km² —
    rule 16's margin ratio)."""
    from morituri_spark.geo.measures import ring_areas_spherical

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return ring_areas_spherical(pts, "user_id", ["ts", "event_id"])


def _seg_forms(div: str) -> dict:
    """Closed-form segment-family coordinates; ``div`` is the engine's
    integer-division token (Spark: ``div``, DuckDB: ``//``)."""
    return {
        "a_ax": "CAST((event_id % 90) % 10 AS DOUBLE)",
        "a_ay": f"CAST((event_id % 90) {div} 10 AS DOUBLE)",
        "b_ax": "CAST((event_id % 70) % 10 AS DOUBLE) * CAST(11 AS DOUBLE)"
                " / CAST(10 AS DOUBLE) + CAST(3 AS DOUBLE) / CAST(10 AS DOUBLE)",
        "b_ay": f"CAST((event_id % 70) {div} 10 AS DOUBLE) * CAST(23 AS DOUBLE)"
                " / CAST(20 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(10 AS DOUBLE)",
    }


_SEGA_S = {"ax": _seg_forms("div")["a_ax"], "ay": _seg_forms("div")["a_ay"]}
_SEGB_S = {"ax": _seg_forms("div")["b_ax"], "ay": _seg_forms("div")["b_ay"]}
_SEGA_D = {"ax": _seg_forms("//")["a_ax"], "ay": _seg_forms("//")["a_ay"]}
_SEGB_D = {"ax": _seg_forms("//")["b_ax"], "ay": _seg_forms("//")["b_ay"]}


def _q_segment_intersections(spark, sf_dir):
    """Line-segment intersection join (geo/overlay.segment_intersections):
    two closed-form segment families (diagonal grid vs sloped grid) —
    bbox cell covers equi-joined, distinct pairs, four staged
    orientation tests + the closed-form crossing point, pure Catalyst.
    Strict proper-crossing rule (endpoint touches / collinear overlaps
    excluded by contract). Oracle = brute-force all-pairs with the
    identical sign tests and t expression."""
    from morituri_spark.geo.overlay import segment_intersections

    ev = _read(spark, sf_dir, "events")
    a = ev.select(
        (F.col("event_id") % 90).alias("id_a"),
        F.expr(_SEGA_S["ax"]).alias("ax"), F.expr(_SEGA_S["ay"]).alias("ay"),
        (F.expr(_SEGA_S["ax"]) + F.expr("CAST(12 AS DOUBLE) / CAST(10 AS DOUBLE)")).alias("bx"),
        (F.expr(_SEGA_S["ay"]) + F.expr("CAST(8 AS DOUBLE) / CAST(10 AS DOUBLE)")).alias("by"),
    ).distinct()
    b = ev.select(
        (F.col("event_id") % 70).alias("id_b"),
        F.expr(_SEGB_S["ax"]).alias("ax"), F.expr(_SEGB_S["ay"]).alias("ay"),
        (F.expr(_SEGB_S["ax"]) + F.lit(1.0)).alias("bx"),
        (F.expr(_SEGB_S["ay"]) - F.expr("CAST(9 AS DOUBLE) / CAST(10 AS DOUBLE)")).alias("by"),
    ).distinct()
    return segment_intersections(a, b, 2.0).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "x", "y",
    )


def _q_track_motion(spark, sf_dir):
    """Per-track motion features (geo/trajectory.track_motion): traveled
    vs direct geodesic length, tortuosity, max per-segment speed over
    rule-12 second diffs — ONE keyed exchange, closed-form Catalyst. The
    oracle replays every rounded expression; per-segment speeds round
    BEFORE the max so both engines pick the same element."""
    from morituri_spark.geo.trajectory import track_motion

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return track_motion(pts, "user_id", "ts", ["ts", "event_id"])


def _q_ring_centroids(spark, sf_dir):
    """Area-weighted polygon centroids (geo/measures.ring_centroids) over
    the same per-user rings as the area queries — one window + one
    aggregate; the division happens once on the exact sums, degenerate
    rings drop, outputs shared-epsilon rounded at 6 dp."""
    from morituri_spark.geo.measures import ring_centroids

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return ring_centroids(pts, "user_id", ["ts", "event_id"])


def _q_tile_pyramid(spark, sf_dir):
    """Multi-zoom tile pyramid (pipelines/pyramid): one raw scan at
    res_max, every coarser level cascades from the previous level's
    aggregates via parent-cell bit math. The oracle aggregates each level
    DIRECTLY from raw — a hash match proves cascade == direct at every
    zoom."""
    from morituri_spark.pipelines.pyramid import tile_pyramid

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"), "value"
    )
    pyr = tile_pyramid(pts, res_max=8, res_min=5, value_col="value")
    return pyr.select(
        "res", "tile", "n_points", F.round("sum_value", 4).alias("sum_value")
    )


def _q_bucketed_join(spark, sf_dir):
    """Bucketed-layout join (io/bucketed): both sides written co-bucketed on
    the key, joined exchange-free (asserted in tests/test_bucketed.py), then
    rolled up. The oracle is the plain join — a hash match proves the
    pre-shuffled layout changes the plan, not the answer.
    """
    import os

    from morituri_spark.io import bucketed

    suffix = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    base = f"/tmp/morituri_bucketed_{suffix}"
    orders = _read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    bucketed.write_bucketed(orders, f"t_orders_{suffix}", "custkey", 8, path=f"{base}/orders")
    bucketed.write_bucketed(cust, f"t_cust_{suffix}", "custkey", 8, path=f"{base}/customer")
    joined = bucketed.cobucketed_join(spark, f"t_orders_{suffix}", f"t_cust_{suffix}", "custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _q_knn_ring(spark, sf_dir):
    """J11 kNN via geocell ring expansion, full SQL oracle (cross join +
    QUALIFY row_number in DuckDB)."""
    from morituri_spark.geo.knn import knn_join

    pts = _points(spark, sf_dir)
    queries = pts.where("event_id < 20").withColumnRenamed("event_id", "query_id")
    cands = pts.withColumnRenamed("event_id", "cand_id")
    return knn_join(queries, cands, k=3, res=8)


def _q_knn_ring_haversine(spark, sf_dir):
    """J11 kNN with the haversine metric (geo/knn.py:_dist_expr — polar-safe
    per-query termination bound): same ring expansion, great-circle km
    distances; DuckDB replays the identical closed form (r3 verdict #7)."""
    from morituri_spark.geo.knn import knn_join

    pts = _points(spark, sf_dir)
    queries = pts.where("event_id < 20").withColumnRenamed("event_id", "query_id")
    cands = pts.withColumnRenamed("event_id", "cand_id")
    out = knn_join(queries, cands, k=3, res=8, metric="haversine_km")
    # re-round to 6 dp (≈ mm): absorbs any 1-ulp libm divergence in the
    # sin/cos/asin chain between the JVM and DuckDB
    return out.withColumn("dist", F.round("dist", 6))


# Adversarially skewed candidate distribution for kNN: HALF the corpus
# collapses into one ~0.001° patch inside a single res-8 cell (lat 45.0 sits
# exactly on a cell boundary; the patch lies wholly in the cell above it),
# the other half scatters over a 300°×120° grid. Closed-form, so DuckDB
# replays it exactly.
_SKEW_LON = (
    "CASE WHEN event_id % 2 = 0 THEN 10.0 + CAST(event_id % 97 AS DOUBLE) * 1e-5 "
    "ELSE -150.0 + CAST(event_id % 300 AS DOUBLE) END"
)
_SKEW_LAT = (
    "CASE WHEN event_id % 2 = 0 THEN 45.0 + CAST(event_id % 89 AS DOUBLE) * 1e-5 "
    "ELSE -60.0 + CAST(event_id % 120 AS DOUBLE) END"
)


def _q_knn_mega_cell(spark, sf_dir):
    """J11 kNN under mega-cell skew (r5, verdict item #5): one cell holds
    HALF the candidate corpus, so ring 0 floods the in-cell queries with
    thousands of candidates — the shape the r4 two-stage per-round top-k
    (geo/knn.py topk_salt) exists for. topk_salt=8 keeps every sub-group
    far larger than k even at sf0.001, so the salt-merge (top-k of
    per-sub-group top-ks) is genuinely exercised and hash-pinned against
    the brute-force SQL oracle."""
    from morituri_spark.geo.knn import knn_join

    ev = _read(spark, sf_dir, "events")
    pts = ev.select(
        "event_id", F.expr(_SKEW_LON).alias("lon"), F.expr(_SKEW_LAT).alias("lat")
    )
    queries = pts.where("event_id < 20").withColumnRenamed("event_id", "query_id")
    cands = pts.withColumnRenamed("event_id", "cand_id")
    return knn_join(queries, cands, k=3, res=8, topk_salt=8)


def _q_dedup_exact(spark, sf_dir):
    """Exact text dedup groups (md5 hash groupBy)."""
    from morituri_spark.text.dedup import exact_duplicates

    return exact_duplicates(_read(spark, sf_dir, "documents"))


def _q_shingle_count(spark, sf_dir):
    """n-gram machinery: distinct 5-gram count per doc."""
    d = _read(spark, sf_dir, "documents")
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1)))
    return d.select(
        "doc_id",
        F.size(F.array_distinct(F.transform(idx, lambda i: F.col("text").substr(i, F.lit(5))))).alias(
            "n_shingles"
        ),
    )


def _q_frequent_tokens(spark, sf_dir):
    """Provably-exact distributed heavy hitters (text/heavyhitters.
    frequent_items): Misra-Gries candidate pass per task (bounded
    memory, mergeable-summaries purge) + exact broadcast-semi-join
    second pass — output is exactly the tokens with cnt*30 >= n_total,
    an integer comparison with several tokens sitting just either side
    of the boundary at this corpus. Capacity 30 < the corpus's 31
    distinct tokens, so the purge path actually runs here. The oracle
    is the straight SQL HAVING count the two-round plan must equal."""
    from morituri_spark.text.heavyhitters import frequent_items
    from morituri_spark.text.quality import _tokens

    toks = _read(spark, sf_dir, "documents").select(
        F.explode(_tokens("text")).alias("token")
    )
    return frequent_items(toks, "token", 1, 30).select(
        F.col("item").alias("token"), "cnt"
    )


def _q_token_counts(spark, sf_dir):
    from morituri_spark.text.quality import token_count_ws

    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id", token_count_ws().cast("long").alias("n_tokens"))


def _q_quality(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    length = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    return d.select(
        "doc_id",
        length.cast("long").alias("n_chars_q"),
        F.round(alpha / F.greatest(length, F.lit(1)), 4).alias("alpha_ratio"),
        F.round(punct / F.greatest(length, F.lit(1)), 4).alias("punct_ratio"),
    )


def _q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact form, oracle-checked)."""
    from morituri_spark.ml.simsearch import embedding_near_duplicates

    return embedding_near_duplicates(
        _read(spark, sf_dir, "embeddings"), threshold=0.3, exact=True
    )


def _q_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs via shared-shingle prefilter."""
    from morituri_spark.text.dedup import jaccard_pairs, shingle_df

    docs = _read(spark, sf_dir, "documents")
    sh = shingle_df(docs, n=5)
    pairs = (
        sh.withColumnRenamed("doc_id", "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), "shingle_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        jaccard_pairs(sh, pairs)
        .where(F.round("jaccard", 6) >= 0.3)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (text/decontam.decontaminate): per-doc
    13-gram overlap against a benchmark slice (docs with doc_id % 7 == 3 —
    deterministic, so the oracle rebuilds the identical benchmark). The
    benchmark gram set BROADCASTS; the corpus side's only exchange is the
    per-doc count partial-agg. Engine grams are xxhash64 over staged byte
    slices (rule 17); the oracle replays membership with raw substrings —
    identical SET semantics on the ASCII corpus (the established
    ngram_jaccard_pairs parity)."""
    from morituri_spark.text.decontam import decontaminate

    docs = _read(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 7 = 3")
    out = decontaminate(docs, bench, n=13, threshold=0.25)
    return out.withColumn("contaminated", F.col("contaminated").cast("int"))


def _q_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval (text/retrieval.bm25_topk): doc-as-query
    decontamination shape — every doc_id % 100 == 7 document retrieves
    its 5 best lexical matches from the corpus. Per-term contributions
    are floor-quantized to integer micro-units BEFORE the cross-term sum,
    so the score is an exact integer in both engines (a double sum would
    inherit each engine's accumulation order). Query-term stats broadcast
    into the postings scan; the ≥50%-df stopword gate is exact-integer
    and bounds every posting list entering the join."""
    from morituri_spark.text.retrieval import bm25_topk

    # the synth corpus is low-entropy (31 terms, df ≈ 80%); append a
    # deterministic rare marker token (m0..m39) per doc so retrieval has
    # a below-cap discriminative channel alongside the common terms
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" m"), (F.col("doc_id") % 40).cast("string")
        ).alias("text"),
    )
    qs = docs.where("doc_id % 100 = 7").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(docs, qs, k=5, max_df_pct=70)


def _q_edit1_pairs(spark, sf_dir):
    """Edit-distance-1 fuzzy self-join (text/fuzzy.edit1_pairs,
    SymSpell deletion-neighborhood blocking): recall-1.0 candidate
    blocking on the variant key — each string plus every 1-char
    deletion — then the exact JVM levenshtein verify. Instance: 300
    short keys 'w0'..'w299' (digit substitutions, insertions and
    deletions all occur). The oracle brute-forces all pairs with
    DuckDB's levenshtein."""
    from morituri_spark.text.fuzzy import edit1_pairs

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 300).alias("id"))
        .distinct()
        .select("id", F.format_string("w%d", F.col("id")).alias("s"))
    )
    return edit1_pairs(ids).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "s_a", "s_b",
        F.col("dist").cast("int").alias("dist"),
    )


def _q_tfidf_keywords(spark, sf_dir):
    """TF-IDF keyword extraction (text/retrieval.tfidf_top_terms): each
    document's 3 highest tf·ln(N/df) terms over the marker-augmented
    corpus (same rare-token channel as bm25_doc_retrieval). The product
    is one shared double expression quantized to integer micro-units, so
    ranks, tie-breaks and the selected rows are engine-exact."""
    from morituri_spark.text.retrieval import tfidf_top_terms

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" m"), (F.col("doc_id") % 40).cast("string")
        ).alias("text"),
    )
    return tfidf_top_terms(docs, k=3)


def _q_duplicate_spans(spark, sf_dir):
    """Cross-document duplicated-substring spans (text/decontam
    .duplicate_span_stats — the distributed re-expression of suffix-array
    substring dedup): per doc, the fraction of 12-byte window positions
    whose gram occurs in ≥2 distinct docs. Totals are closed-form from the
    byte length (no second scan); the dup-gram set is a two-level
    map-side-combinable aggregation."""
    from morituri_spark.text.decontam import duplicate_span_stats

    return duplicate_span_stats(_read(spark, sf_dir, "documents"), k=12)


def _q_mixture_budget(spark, sf_dir):
    """Curriculum-mixture sampling to per-domain TOKEN budgets
    (text/sampling.mixture_by_budget): deterministic hash-order prefix per
    source until the budget is crossed. The engine runs the two-pass
    bucketed form (range-bucket sums -> tiny driver prefix -> window only
    inside the boundary bucket); the oracle replays the semantics as ONE
    SQL window cumsum — equality proves the bucketed decomposition is
    exactly the straight prefix rule."""
    from morituri_spark.text.sampling import mixture_by_budget

    docs = _read(spark, sf_dir, "documents")
    return mixture_by_budget(
        docs, "source", _MIXTURE_BUDGETS, "n_chars", "doc_id", n_buckets=16
    )


def _q_segment_zone_lengths(spark, sf_dir):
    """Polyline → zone length-weighted assignment (geo/measures
    .segment_zone_lengths): per-user ts-ordered paths, each segment
    attributed to the zone containing its midpoint through the REAL PIP
    engine, per-zone geodesic road length. Oracle: the same lag-window +
    haversine closed form with the rect-zone bbox rule (the established
    half-open PIP parity)."""
    from morituri_spark.geo.measures import segment_zone_lengths

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return segment_zone_lengths(pts, _rect_zones(spark), "user_id", ["ts", "event_id"])


def _q_polygon_overlap(spark, sf_dir):
    """Polygon-polygon overlap join (geo/overlay.polygon_overlap_join):
    cell-cover candidate equi-join + Sutherland-Hodgman clip + shoelace
    area in one Arrow kernel. Rect zone sets make the exact intersection
    area SQL-expressible (interval algebra) while the ENGINE runs the
    general clip pipeline — the oracle checks the whole chain."""
    from morituri_spark.geo.overlay import polygon_overlap_join

    zb = spark.createDataFrame(
        [
            (z, [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]])
            for z, x0, y0, x1, y1 in _OVL_B
        ],
        "zone_id long, rings array<array<array<double>>>",
    )
    return polygon_overlap_join(_rect_zones(spark), zb, res=7)


# dwell-shaped closed-form trace: events in the same 1500-id block share
# an anchor cell (jitter <= ~0.11 km), block changes jump >= ~1400 km —
# both engines derive coordinates from the same integer formulas.
# block index spelled (id - id % 1500) / 1500: Spark's DIV isn't DuckDB
# syntax and DuckDB's // isn't Spark's — this form parses and evaluates
# identically in both engines (non-negative ids, exact at these magnitudes)
_TBLK = "CAST((event_id - (event_id % 1500)) / 1500 AS BIGINT)"
_TLON = (
    f"CAST(({_TBLK} * 7919) % 360000 AS DOUBLE) / CAST(1000 AS DOUBLE)"
    " - CAST(180 AS DOUBLE)"
    " + CAST((event_id * 104729) % 997 AS DOUBLE) / CAST(1000000 AS DOUBLE)"
)
_TLAT = (
    f"CAST(({_TBLK} * 104729) % 170000 AS DOUBLE) / CAST(1000 AS DOUBLE)"
    " - CAST(85 AS DOUBLE)"
    " + CAST((event_id * 7919) % 997 AS DOUBLE) / CAST(1000000 AS DOUBLE)"
)


def _q_stay_points(spark, sf_dir):
    """Trajectory stay-point detection (geo/trajectory.stay_points): per
    user, a dwell breaks on a > 1 km step or a > 400000 s gap; runs with
    >= 2 points and >= 3600 s span qualify. ONE exchange (window + reused
    groupBy partitioning, plan-asserted in tests). Oracle replays the
    identical window algebra: lag -> break flag -> running-sum stay_id ->
    gated aggregate, with the rule-12 NTZ second-diff and the rule-16
    shared-epsilon centroid rounding."""
    from morituri_spark.geo.trajectory import stay_points

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_TLON).alias("lon"), F.expr(_TLAT).alias("lat"),
    )
    return stay_points(
        pts, "user_id", "ts", ["ts", "event_id"],
        radius_km=1.0, max_gap_s=400000, min_duration_s=3600, min_points=2,
    )


def _q_render_tiles(spark, sf_dir):
    """Density-tile PNG rendering (geo/render.render_density_tiles): the
    raster SERVING end of the tiling engine. Points collapse to occupied
    pixels at the first map-side-combinable aggregate; the second
    aggregate carries ≤ W² structs per tile; the Arrow kernel rasterizes
    per TILE (grid-bounded) through the REAL PNG codec and proves the
    round trip in-engine (decode_ok byte-exact, raster_sum vs decoded_sum
    measured before/after the codec). value_cap=3 exercises saturation at
    this density. The oracle replays pixel binning → tile/local-index bit
    math → capped counts → the bit_xor checksum literally; decoded_sum
    equaling the SQL raster_sum pins the codec numerically from OUTSIDE
    the engine."""
    from morituri_spark.geo.render import render_density_tiles

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return render_density_tiles(pts, tile_res=3, px_bits=4, value_cap=3).drop(
        "png"
    )


def _q_cell_density(spark, sf_dir):
    """Grid density surface (geo/density.cell_density): 15-degree bins +
    3x3 binomial smoothing. Points collapse to occupied cells at the
    FIRST map-side-combinable aggregate; the 9-tap explode runs on cells
    only (grid-bounded, not data-bounded). Oracle: same binning (floor of
    a DIVISION — reciprocal-multiply flips boundary cells by one ulp) and
    the same dyadic /16 kernel, exact in both engines."""
    from morituri_spark.geo.density import cell_density

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return cell_density(pts, cell_deg=15.0)


# closed-form 63-bit perceptual hash over events: four 16-bit-ish fields
# from distinct multipliers (top field 15 bits keeps the sum < 2^63 —
# ANSI BIGINT overflow is an error, rule 14). Every id with id % 7 == 3
# is a planted near-dup of id-1: same base fields, low bits xor'd with
# flip ∈ {1,2,3} (hamming 1-2). Both engines evaluate the identical
# integer algebra; only the xor spelling differs (Spark `^`, DuckDB
# xor()).
_PH_PID = "CASE WHEN event_id % 7 = 3 THEN event_id - 1 ELSE event_id END"
_PH_FLIP = "CASE WHEN event_id % 7 = 3 THEN (event_id % 3) + 1 ELSE 0 END"


def _phash_expr(xor_fn) -> str:
    # PRIME field moduli (32749/65521/65407/65497), not powers of two:
    # with 65536-moduli every field shares period 65536 in pid, so
    # hash(pid) == hash(pid + 65536) — at 1M synth ids that structural
    # aliasing produced 7.1M exact-dup pairs vs the 142k planted ones
    # (and 115s vs 3.8s in the banded join). Distinct primes push the
    # joint period to their product (~1.4e19): collisions are birthday-
    # level, pairs are exactly the planted ones.
    pid, flip = _PH_PID, _PH_FLIP
    return (
        f"(({pid}) * 48271) % 32749 * 281474976710656"
        f" + (({pid}) * 40503) % 65521 * 4294967296"
        f" + (({pid}) * 69621) % 65407 * 65536"
        f" + {xor_fn(f'(({pid}) * 12345) % 65497', f'({flip})')}"
    )


def _q_phash_near_dup(spark, sf_dir):
    """Image perceptual-hash near-dup join (multimodal/ops.
    phash_near_duplicates → ml/hamming.hamming_near_duplicates): the
    pigeonhole-banded bucket EQUI-join (3 blocks for hamming ≤ 2) + exact
    bit_count(xor) verify, pure Catalyst. The oracle is a genuinely
    independent brute-force all-pairs DuckDB join — matching it proves
    the banding's exact-recall property, not just algebra replay."""
    from morituri_spark.multimodal.ops import phash_near_duplicates

    ph = _phash_expr(lambda a, b: f"({a}) ^ {b}")
    imgs = _read(spark, sf_dir, "events").select(
        F.col("event_id").alias("image_id"), F.expr(ph).alias("phash")
    )
    return phash_near_duplicates(imgs, max_hamming=2).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


# closed-form street segments for map-matching: 400 short segments
# (extent ≤ 0.5°) scattered by prime multipliers distinct from the point
# scatter's
_SEG_AX = "CAST((event_id * 13007) % 360000 AS DOUBLE) / CAST(1000 AS DOUBLE) - CAST(180 AS DOUBLE)"
_SEG_AY = "CAST((event_id * 20011) % 180000 AS DOUBLE) / CAST(1000 AS DOUBLE) - CAST(90 AS DOUBLE)"
_SEG_DX = "CAST((event_id * 31) % 1000 AS DOUBLE) / CAST(1000 AS DOUBLE) - CAST(0.5 AS DOUBLE)"
_SEG_DY = "CAST((event_id * 47) % 1000 AS DOUBLE) / CAST(1000 AS DOUBLE) - CAST(0.5 AS DOUBLE)"


def _q_snap_segments(spark, sf_dir):
    """Map-matching (geo/matching.snap_to_segments): each point's nearest
    street segment within 0.25° — cell-cover candidate EQUI-join (never
    all-pairs), codegen clamped-projection refine staged per rule 9, ONE
    partial-aggregable min(struct) argmin per point. The oracle is an
    independent brute-force all-pairs DuckDB join with the identical
    expression tree and rule-16 rounding — a green row proves the cover
    join's exact recall at this radius/cell pitch."""
    from morituri_spark.geo.matching import snap_to_segments

    ev = _read(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("point_id"),
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    segs = ev.where("event_id < 400").select(
        F.col("event_id").alias("seg_id"),
        F.expr(_SEG_AX).alias("ax"), F.expr(_SEG_AY).alias("ay"),
        F.expr(f"({_SEG_AX}) + ({_SEG_DX})").alias("bx"),
        F.expr(f"({_SEG_AY}) + ({_SEG_DY})").alias("by"),
    )
    out = snap_to_segments(pts, segs, radius=0.25, cell_deg=1.0)
    return out.select(
        F.col("point_id").cast("long").alias("point_id"),
        F.col("seg_id").cast("long").alias("seg_id"),
        F.col("dist").cast("double").alias("dist"),
    )


# `floor(x / k)` instead of `//`: Spark SQL has no `//` operator, and
# int/int `/` is exact float division in BOTH engines at these magnitudes
_HMM_S = "CAST(floor(event_id / 20) AS BIGINT)"
_HMM_PX = (
    "CAST(2 * (event_id % 20) AS DOUBLE)"
    f" + CAST({_HMM_S} AS DOUBLE) / CAST(10 AS DOUBLE)"
    f" + CAST(((event_id % 20) * 7 + {_HMM_S} * 13) % 10 AS DOUBLE)"
    " / CAST(100 AS DOUBLE)"
)
_HMM_PY = (
    f"CAST(6 * {_HMM_S} AS DOUBLE) / CAST(10 AS DOUBLE)"
    f" + CAST(((event_id % 20) * 3 + {_HMM_S} * 5) % 7 AS DOUBLE)"
    " / CAST(100 AS DOUBLE)"
)
_HMM_AX = (
    "CAST(2 * CAST(floor(event_id / 3) AS BIGINT) AS DOUBLE)"
    " + CAST(6 * (event_id % 3) AS DOUBLE) / CAST(100 AS DOUBLE)"
    " - CAST(6 AS DOUBLE) / CAST(100 AS DOUBLE)"
)
_HMM_LAM = 20_000_000


def _q_hmm_match(spark, sf_dir):
    """HMM map-matching (geo/matching.hmm_map_match): the Newson–Krumm
    composition over the engine's own pieces — snap CANDIDATES (cell
    equi-join, exact recall) feed operators/viterbi.viterbi_costs with
    the uniform switch model (stay 0, change λ — no S×S matrix, so the
    state space can be the whole street network). 20 tracks × 6 steps
    drift across each column's 3 near-parallel segments, so independent
    snapping zig-zags while the coherent path pays switches only when
    emissions beat λ = 0.02°. Emissions are the snap oracle's exact
    nano-degree integers; the oracle unrolls 6 forward + 6 backtrack
    MATERIALIZED DP stages with the kernel's tie rules (final: min
    (cost, state); predecessor: min achieving state id)."""
    from morituri_spark.geo.matching import hmm_map_match

    ev = _read(spark, sf_dir, "events")
    pts = ev.where("event_id < 120").select(
        (F.col("event_id") % 20).alias("track_id"),
        (F.col("event_id") / 20).cast("long").alias("seq"),
        F.col("event_id").alias("point_id"),
        F.expr(_HMM_PX).alias("lon"),
        F.expr(_HMM_PY).alias("lat"),
    )
    segs = ev.where("event_id < 60").select(
        F.col("event_id").alias("seg_id"),
        F.expr(_HMM_AX).alias("ax"),
        F.lit(0.0).alias("ay"),
        (F.expr(_HMM_AX) + F.lit(0.15)).alias("bx"),
        F.lit(3.2).alias("by"),
    )
    return hmm_map_match(
        pts, segs, radius=0.6, cell_deg=1.0, switch_cost_nano=_HMM_LAM
    )


def _hmm_oracle_sql(n_steps: int = 6) -> str:
    """Brute-force candidates (the snap oracle's clamped-projection CTE
    chain, nano-integer emissions) + the viterbi oracle's unrolled
    forward/backtrack stages with the uniform switch CASE in place of
    the dense transition table (rule 27: all stages MATERIALIZED)."""
    lam = _HMM_LAM
    parts = [f"""
        WITH p AS MATERIALIZED (
            SELECT event_id % 20 AS tid, CAST(floor(event_id / 20) AS BIGINT) AS s,
                   event_id AS pid, {_HMM_PX} AS px, {_HMM_PY} AS py
            FROM events WHERE event_id < 120),
        sg AS MATERIALIZED (
            SELECT event_id AS seg, {_HMM_AX} AS ax,
                   CAST(0.0 AS DOUBLE) AS ay,
                   ({_HMM_AX}) + 0.15 AS bx, CAST(3.2 AS DOUBLE) AS by
            FROM events WHERE event_id < 60),
        d0 AS (
            SELECT tid, s, pid, seg, px, py, ax, ay,
                   bx - ax AS dx, by - ay AS dy
            FROM p, sg),
        l0 AS (SELECT *, dx * dx + dy * dy AS len2 FROM d0),
        t0 AS (
            SELECT tid, s, pid, seg, px, py, ax, ay, dx, dy,
                   CASE WHEN len2 = 0.0 THEN 0.0
                        ELSE least(greatest(
                            ((px - ax) * dx + (py - ay) * dy) / len2,
                            0.0), 1.0) END AS tt
            FROM l0),
        e0 AS (
            SELECT tid, s, pid, seg,
                   px - (ax + tt * dx) AS ex, py - (ay + tt * dy) AS ey
            FROM t0),
        cand AS MATERIALIZED (
            SELECT tid, s, pid, seg,
                   floor(sqrt(ex * ex + ey * ey) * 1e9 + 0.5 + 1e-8) / 1e9
                       AS dist,
                   CAST(floor(sqrt(ex * ex + ey * ey) * 1e9 + 0.5 + 1e-8)
                        AS BIGINT) AS e
            FROM e0
            WHERE floor(sqrt(ex * ex + ey * ey) * 1e9 + 0.5 + 1e-8) / 1e9
                  <= 0.6),
        v0 AS MATERIALIZED (
            SELECT tid, seg, e AS cost FROM cand WHERE s = 0)"""]
    for t in range(1, n_steps):
        parts.append(f""",
        v{t} AS MATERIALIZED (
            SELECT c.tid, c.seg,
                   min(pv.cost
                       + CASE WHEN pv.seg = c.seg THEN 0 ELSE {lam} END
                       + c.e) AS cost
            FROM v{t - 1} pv
            JOIN cand c ON c.tid = pv.tid AND c.s = {t}
            GROUP BY c.tid, c.seg)""")
    last = n_steps - 1
    parts.append(f""",
        b{last} AS MATERIALIZED (
            SELECT tid, seg, cost FROM (
                SELECT tid, seg, cost, row_number() OVER (
                    PARTITION BY tid ORDER BY cost, seg) AS rn
                FROM v{last}) WHERE rn = 1)""")
    for t in range(last - 1, -1, -1):
        parts.append(f""",
        b{t} AS MATERIALIZED (
            SELECT tid, seg, cost FROM (
                SELECT pv.tid, pv.seg, pv.cost, row_number() OVER (
                    PARTITION BY pv.tid ORDER BY pv.seg) AS rn
                FROM v{t} pv
                JOIN b{t + 1} nb ON nb.tid = pv.tid
                JOIN cand c ON c.tid = pv.tid AND c.s = {t + 1}
                           AND c.seg = nb.seg
                WHERE pv.cost
                      + CASE WHEN pv.seg = nb.seg THEN 0 ELSE {lam} END
                      = nb.cost - c.e) WHERE rn = 1)""")
    picks = " UNION ALL ".join(
        f"SELECT tid, {t} AS s, seg, cost FROM b{t}" for t in range(n_steps)
    )
    parts.append(f"""
        SELECT pk.tid AS track_id, pk.s AS seq, c.pid AS point_id,
               pk.seg AS seg_id, c.dist AS dist, pk.cost AS cost
        FROM ({picks}) pk
        JOIN cand c ON c.tid = pk.tid AND c.s = pk.s AND c.seg = pk.seg""")
    return "".join(parts)


def _q_grid_clusters(spark, sf_dir):
    """Grid-density clustering (geo/clustering.grid_clusters — DBSCAN
    over cells): the dwell-shaped trace synth puts each 1500-id block in
    one tiny patch, so core cells (≥ 100 points) are the block anchors;
    8-adjacent cores merge through the distributed large-star/small-star
    CC (text/components.py). Oracle: identical binning + recursive-CTE
    reachability minimum (the near_dup_clusters pattern)."""
    from morituri_spark.geo.clustering import grid_clusters

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_TLON).alias("lon"), F.expr(_TLAT).alias("lat")
    )
    return grid_clusters(pts, cell_deg=1.0, min_pts=100)


def _q_hotspot_cells(spark, sf_dir):
    """Hotspot cells (geo/clustering.hotspot_cells): z-scores over
    occupied 15° cells with μ/σ² from EXACT integer sums (Σn, Σn², cnt)
    so both engines evaluate one identical double expression tree; z is
    rule-16 rounded before the ≥ 1.0 gate."""
    from morituri_spark.geo.clustering import hotspot_cells

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return hotspot_cells(pts, cell_deg=15.0, z_threshold=1.0)


def _q_semdedup(spark, sf_dir):
    """SemDeDup (ml/semdedup.semdedup): cluster-then-dedup semantic
    near-duplicate removal — Arrow matmul assignment to the 8 lowest-id
    seed centroids, within-cluster cogrouped pair kernel, drop-higher-id
    keep rule. The oracle replays assignment (row_number over rounded
    cosine DESC, centroid ASC) and the within-cluster pair EXISTS set
    exactly — recall is 1.0 by construction, not probabilistic."""
    from morituri_spark.ml.semdedup import semdedup

    return semdedup(
        _read(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.3, dim=64
    )


def _q_morans_i(spark, sf_dir):
    """Global Moran's I (geo/clustering.morans_i): spatial autocorrelation
    of occupied-cell point counts under binary 8-neighbor weights. Every
    data-dependent reduction is an exact integer sum (Σx_ix_j, Σ(x_i+x_j),
    pair count, Σx, Σx²) so both engines evaluate ONE identical double
    expression; I is rule-16 rounded to 6 dp."""
    from morituri_spark.geo.clustering import morans_i

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return morans_i(pts, cell_deg=5.0)


def _q_local_morans(spark, sf_dir):
    """Local Moran's I / Anselin LISA (geo/clustering.local_morans_cells):
    per-cell co-deviation with its 8-neighborhood, quadrant-classified
    HH/LL/HL/LH. The quadrant gates are EXACT integer comparisons
    (N·x_i vs S₁, N·S_i vs W_i·S₁), so the label is engine-identical by
    construction; lisa_i is the one shared double expression, rule-16
    rounded to 6 dp."""
    from morituri_spark.geo.clustering import local_morans_cells

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return local_morans_cells(pts, cell_deg=5.0)


def _q_emerging_gi(spark, sf_dir):
    """Full emerging-hot-spot analysis (geo/clustering.emerging_gi_star):
    per-bin Getis-Ord Gi* over the densified space-time cube, then
    Mann-Kendall over each cell's Gi* z series — detects cells whose
    RELATIVE concentration intensifies, which the raw-count MK can't
    separate from uniform growth. Synth: constant uniform background +
    a knot (every 4th event, coords/100) whose inclusion grows with
    t_bin. Per-bin reductions are exact integers; each z_it and the
    final mk_z are rule-16 rounded before any comparison."""
    from morituri_spark.geo.clustering import emerging_gi_star

    ev = _read(spark, sf_dir, "events")
    bg = ev.select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
        F.expr("event_id % 8").alias("t_bin"),
    )
    knot = ev.where(
        F.expr("event_id % 4 = 0 AND (event_id DIV 16) % 8 <= event_id % 8")
    ).select(
        (F.expr(_GLON) / F.lit(100.0)).alias("lon"),
        (F.expr(_GLAT) / F.lit(100.0)).alias("lat"),
        F.expr("event_id % 8").alias("t_bin"),
    )
    return emerging_gi_star(
        bg.unionByName(knot), n_bins=8, cell_deg=15.0, z_threshold=1.0
    )


def _q_colocation(spark, sf_dir):
    """Colocation quotient (geo/colocation.colocation_quotient): which
    event categories cluster AROUND which — purchases are compressed
    100× toward the origin so purchase→purchase reads strongly
    co-located and cross pairs segregated. Every reduction is an exact
    integer sum (per-cell n_a·n_b products, totals, self-pair
    corrections); the single double ratio is rule-16 rounded. True-zero
    pairs survive via the full category grid."""
    from morituri_spark.geo.colocation import colocation_quotient

    ev = _read(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    pts = ev.select(
        F.col("event_type").alias("cat"),
        F.when(is_p, F.expr(_GLON) / F.lit(100.0))
        .otherwise(F.expr(_GLON)).alias("lon"),
        F.when(is_p, F.expr(_GLAT) / F.lit(100.0))
        .otherwise(F.expr(_GLAT)).alias("lat"),
    )
    return colocation_quotient(pts, "cat", cell_deg=15.0)


def _q_adaptive_cells(spark, sf_dir):
    """Adaptive quadtree leaves (geo/adaptive.adaptive_cells): split any
    cell holding > 500 events into its 4 children, res 2 → 8, computed
    iteration-free from ONE point aggregate + two grid-bounded stages
    (monotone counts ⇒ leaf = coarsest qualifying ancestor, a
    NULL-skipping struct-min). All integer math on the packed cell id —
    the oracle replays every DIV/shift digit-for-digit."""
    from morituri_spark.geo.adaptive import adaptive_cells

    ev = _read(spark, sf_dir, "events")
    # uniform background + a 100×-compressed knot (every 4th event) near
    # the origin — the tree must stay coarse over the ocean and split
    # deep in the knot, or the test proves nothing about adaptivity
    bg = ev.select(F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"))
    knot = ev.where(F.expr("event_id % 4 = 0")).select(
        (F.expr(_GLON) / F.lit(100.0)).alias("lon"),
        (F.expr(_GLAT) / F.lit(100.0)).alias("lat"),
    )
    return adaptive_cells(bg.unionByName(knot), max_points=500,
                          res_min=2, res_max=8)


def _q_adaptive_assign(spark, sf_dir):
    """Point→leaf assignment (geo/adaptive.assign_adaptive): the
    ancestor-probe join (compact-cover pattern) rolled back up per leaf
    — the oracle is the SAME leaf-table SQL as adaptive_quadtree_cells,
    so a green row proves the join path and the aggregate path agree
    leaf-for-leaf, count-for-count."""
    from morituri_spark.geo.adaptive import adaptive_cells, assign_adaptive

    ev = _read(spark, sf_dir, "events")
    bg = ev.select(F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"))
    knot = ev.where(F.expr("event_id % 4 = 0")).select(
        (F.expr(_GLON) / F.lit(100.0)).alias("lon"),
        (F.expr(_GLAT) / F.lit(100.0)).alias("lat"),
    )
    pts = bg.unionByName(knot)
    leaves = adaptive_cells(pts, max_points=500, res_min=2, res_max=8)
    assigned = assign_adaptive(pts, leaves, res_min=2, res_max=8)
    return assigned.groupBy(
        F.col("leaf_cell").alias("cell_id"),
        F.col("leaf_res").alias("res"),
    ).agg(F.count(F.lit(1)).alias("n_points"))


def _q_gi_star(spark, sf_dir):
    """Getis-Ord Gi* hotspots (geo/clustering.gi_star_cells): the
    neighborhood-weighted sibling of grid_hotspot_cells — per-cell 3×3
    sums (incl. self) vs the global mean, binary weights over OCCUPIED
    cells. Per-cell S_i/W_i and global Σx/Σx²/N are exact integer
    aggregates; the degenerate-denominator guard is an exact integer
    predicate; gi_z is rule-16 rounded before the |z| ≥ 1 gate."""
    from morituri_spark.geo.clustering import gi_star_cells

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return gi_star_cells(pts, cell_deg=15.0, z_threshold=1.0)


def _q_emerging_hotspots(spark, sf_dir):
    """Emerging-hotspot trends (geo/clustering.mann_kendall_cells):
    per-cell tie-corrected Mann-Kendall over an 8-bin space-time cube.
    The synth trend is closed-form: a row enters when
    (event_id DIV 8) % 8 <= event_id % 8, so expected per-cell counts
    grow linearly in t_bin = event_id % 8 — upward trends the test must
    detect. S and the tie term are exact integers (tie products < 2^53,
    so the double sum is order-exact); z is rule-16 rounded BEFORE the
    trend classification."""
    from morituri_spark.geo.clustering import mann_kendall_cells

    ev = _read(spark, sf_dir, "events").where(
        F.expr("(event_id DIV 8) % 8 <= event_id % 8")
    )
    pts = ev.select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
        F.expr("event_id % 8").alias("t_bin"),
    )
    return mann_kendall_cells(pts, n_bins=8, cell_deg=15.0, z_threshold=1.0)


def _q_slope_aspect(spark, sf_dir):
    """Horn slope/aspect raster stencil (geo/terrain.slope_aspect) over
    the event-density DEM (10° bins, z = point count): each cell
    SCATTERS its z to its nine neighbors with the Horn weights and ONE
    map-side-combinable aggregate folds the gradient numerators — a 3×3
    stencil with one shuffle instead of eight self-joins. Numerators
    are exact integers; slope/aspect are shared micro-degree-quantized
    expressions. Interior = exactly nine contributions received."""
    from morituri_spark.geo.terrain import slope_aspect

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    dem = pts.select(
        F.floor(F.col("lon") / F.lit(10.0)).cast("long").alias("ix"),
        F.floor(F.col("lat") / F.lit(10.0)).cast("long").alias("iy"),
    ).groupBy("ix", "iy").agg(F.count(F.lit(1)).alias("z"))
    return slope_aspect(dem, cell_size=10.0)


def _q_hillshade(spark, sf_dir):
    """Analytic hillshade (geo/terrain.hillshade) over the same 10°
    event-density DEM as dem_slope_aspect: Lambert dot product of the
    Horn normal with the 315°/45° light vector. NO runtime trig — the
    light vector is three driver-side literals shared verbatim with the
    oracle, and sqrt is IEEE-correctly-rounded in both engines, so the
    uint8 shade is exact-integer reproducible (a STRONGER contract than
    slope/aspect's micro-degree quantization)."""
    from morituri_spark.geo.terrain import hillshade

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    dem = pts.select(
        F.floor(F.col("lon") / F.lit(10.0)).cast("long").alias("ix"),
        F.floor(F.col("lat") / F.lit(10.0)).cast("long").alias("iy"),
    ).groupBy("ix", "iy").agg(F.count(F.lit(1)).alias("z"))
    return hillshade(dem, cell_size=10.0)


def _hillshade_oracle_sql() -> str:
    # the IDENTICAL light-vector doubles hillshade() computes for
    # (az=315°, alt=45°), embedded via repr so both engines parse the
    # same bits; same scatter CTE as dem_slope_aspect, then the shared
    # no-trig Lambert expression with rule-16 half-up rounding.
    import math

    az, alt = math.radians(315.0), math.radians(45.0)
    lx = math.cos(alt) * math.sin(az)
    ly = math.cos(alt) * math.cos(az)
    lz = math.sin(alt)
    gx = "(CAST(gx_num AS DOUBLE) / 80.0)"
    gy = "(CAST(gy_num AS DOUBLE) / 80.0)"
    return f"""
        WITH pts AS (
            SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
        cube AS (
            SELECT CAST(floor(lon / 10.0) AS BIGINT) AS ix,
                   CAST(floor(lat / 10.0) AS BIGINT) AS iy,
                   count(*) AS z
            FROM pts GROUP BY 1, 2),
        kernel(dx, dy, wx, wy) AS (VALUES
            (1, -1, 1, -1), (1, 0, 2, 0), (1, 1, 1, 1),
            (0, -1, 0, -2), (0, 0, 0, 0), (0, 1, 0, 2),
            (-1, -1, -1, -1), (-1, 0, -2, 0), (-1, 1, -1, 1)),
        sums AS (
            SELECT c.ix - k.dx AS ix, c.iy - k.dy AS iy,
                   CAST(sum(c.z * k.wx) AS BIGINT) AS gx_num,
                   CAST(sum(c.z * k.wy) AS BIGINT) AS gy_num,
                   count(*) AS n
            FROM cube c CROSS JOIN kernel k
            GROUP BY 1, 2)
        SELECT ix, iy, gx_num, gy_num,
               CAST(floor(255.0 * greatest(
                     ({lz!r} - {lx!r} * {gx} - {ly!r} * {gy})
                     / sqrt(1.0 + {gx} * {gx} + {gy} * {gy}),
                     0.0) + 0.5 + 1e-8) AS INT) AS shade
        FROM sums WHERE n = 9
    """


def _hydro_dem(spark, sf_dir):
    """Closed-form 30×30 DEM shared by the D8 hydrology queries: a bowl
    plus modular noise, z = (ix−15)² + (iy−15)² + (7ix+13iy) mod 11 —
    one central basin and a ring of noise-made local pits, all exact
    integers both engines can replay. event_id % 900 covers 0..899 at
    every SF, so the grid is identical at sf0.001 and sf0.01."""
    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 900).alias("i"))
        .distinct()
    )
    return ids.select(
        (F.col("i") % 30).alias("ix"),
        (F.col("i") - F.col("i") % 30).alias("_r"),
    ).select(
        "ix", (F.col("_r") / 30).cast("long").alias("iy")
    ).select(
        "ix", "iy",
        (
            (F.col("ix") - 15) * (F.col("ix") - 15)
            + (F.col("iy") - 15) * (F.col("iy") - 15)
            + (F.col("ix") * 7 + F.col("iy") * 13) % 11
        ).alias("z"),
    )


def _q_d8_flow(spark, sf_dir):
    """D8 flow directions (geo/terrain.d8_flow_directions): steepest-
    descent drainage pointers over the closed-form bowl DEM. The
    argmax-over-8-neighbors collapses into ONE scatter + ONE aggregate
    (three conditional struct-mins) because within a distance-weight
    class the target's z is constant — no self-join, no HOF, one
    shuffle, exact integer weighted drops. The oracle replays the same
    rule with a neighbor join + per-class row_number pick."""
    from morituri_spark.geo.terrain import d8_flow_directions

    return d8_flow_directions(_hydro_dem(spark, sf_dir)).select(
        "ix", "iy", "z", "dn_ix", "dn_iy", "drop_w", "is_sink"
    )


def _q_flow_accumulation(spark, sf_dir):
    """D8 flow accumulation (geo/terrain.flow_accumulation): cells
    draining through each cell, itself included — per round ONE
    state⋈flow-edges equi-join + ONE map-side-combinable sum keyed by
    the downstream cell, bit_xor-signature convergence, rounds = the
    longest flow path (terrain-bound, not data-bound). The oracle
    counts downstream-path hits with a recursive CTE over the same
    flow edges (forest ⇒ terminates)."""
    from morituri_spark.geo.terrain import d8_flow_directions, flow_accumulation

    flows = d8_flow_directions(_hydro_dem(spark, sf_dir))
    return flow_accumulation(flows).select("ix", "iy", "acc")


def _q_watershed(spark, sf_dir):
    """Watershed (drainage-basin) labels (geo/terrain.watershed_labels):
    pointer doubling over the D8 forest — ptr ← ptr(ptr) is one
    self-equi-join per round, sinks are fixed points, convergence in
    ⌈log₂ depth⌉ rounds. The oracle follows each cell's flow path to
    its sink with a recursive CTE."""
    from morituri_spark.geo.terrain import d8_flow_directions, watershed_labels

    flows = d8_flow_directions(_hydro_dem(spark, sf_dir))
    return watershed_labels(flows).select("ix", "iy", "sink_ix", "sink_iy")


def _q_embedding_moments(spark, sf_dir):
    """Distributed embedding second moments (ml/pca.embedding_moments):
    each task folds its WHOLE Arrow batch iterator into one
    (n, Σx, ΣxᵀX) partial (rule 26) emitted as (i, j, v) triples, so the
    final combine is ONE map-side-combinable sum keyed by (i, j) —
    shuffle volume tasks×d², independent of row count. Values are
    quantized to 2²⁰ micro-units with the shared rule-16 formula, so
    int64 sums are order/partition-independent and byte-identical to
    the DuckDB unnest-pair replay."""
    from morituri_spark.ml.pca import embedding_moments

    emb = _read(spark, sf_dir, "embeddings")
    return embedding_moments(emb).select("i", "j", "v")


def _q_pca_gates(spark, sf_dir):
    """PCA whitening invariant gates (ml/pca.whitening_gates): fit the
    ZCA whitener from the exact-int moments, project every embedding
    through one Arrow matmul per batch, re-measure the covariance of
    the projected vectors, and emit (i, j, dev_micro) wherever it
    deviates from identity beyond 1e-4 — EMPTY is the assertion (the
    ann_recall_gates pattern). The d×d eigendecomposition is
    driver-side on collected aggregates, the same budget class as the
    IVF centroid collect."""
    from morituri_spark.ml.pca import whitening_gates

    emb = _read(spark, sf_dir, "embeddings")
    return whitening_gates(emb).select("i", "j", "dev_micro")


def _q_viterbi(spark, sf_dir):
    """Viterbi trellis decoding (operators/viterbi.viterbi_costs): the
    min-cost DP table plus backtracked optimal-path flags over 50
    closed-form 8-step tracks with 4 candidate states per step — the
    coherence layer over geo/matching's per-point snapping (and the HMM
    tagging shape for token sequences). ONE shuffle keyed by track;
    the whole DP runs as exact int64 NumPy inside one Arrow group; the
    dense 4×4 transition model ships in the kernel closure. The oracle
    unrolls the 8 forward DP stages and 8 backtrack stages as
    materialized CTEs (rule 27) with the same min-(cost, state) ties."""
    from morituri_spark.operators.viterbi import viterbi_costs

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 400).alias("v"))
        .distinct()
    )
    cand = ids.select(
        (F.col("v") % 50).alias("key"),
        F.expr("v DIV 50").alias("step"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("state"),
    ).select(
        "key", "step", F.col("state").cast("long").alias("state"),
        (
            (F.col("key") * 7 + F.col("step") * 11 + F.col("state") * 13) % 101
        ).alias("e_cost"),
    )
    a = F.col("state_from")
    b = F.col("state_to")
    trans = (
        ids.sparkSession.range(4)
        .select(F.col("id").alias("state_from"))
        .crossJoin(
            ids.sparkSession.range(4).select(F.col("id").alias("state_to"))
        )
        .select(
            "state_from", "state_to",
            (
                (a * 31 + b * 17) % 59
                + F.when(a == b, F.lit(0)).otherwise(F.lit(23))
            ).alias("t_cost"),
        )
    )
    return viterbi_costs(cand, trans).select(
        "key", "step", "state", "cost", "on_path"
    )


def _q_skyline(spark, sf_dir):
    """2D skyline / Pareto front (operators/skyline.skyline_2d): rows no
    other row dominates under (minimize x, maximize y), computed WITHOUT
    a global single-partition sort — one (bucket, x) aggregate, a
    per-bucket running-max window, and a tiny bucket-prefix broadcast.
    Closed-form points (event_id % 997, event_id·31 % 1009) carry exact
    integer ties and duplicate frontier rows; the oracle is the literal
    NOT EXISTS dominance anti-join."""
    from morituri_spark.operators.skyline import skyline_2d

    pts = (
        _read(spark, sf_dir, "events")
        .where("event_id % 5 = 0")
        .select(
            "event_id",
            (F.col("event_id") % 997).alias("x"),
            ((F.col("event_id") * 31) % 1009).alias("y"),
        )
    )
    return skyline_2d(pts, "x", "y", bucket_width=64).select("event_id", "x", "y")


def _q_theil_sen(spark, sf_dir):
    """Theil–Sen trend slopes (geo/clustering.theil_sen_cells): the
    magnitude companion to emerging_hotspots' Mann-Kendall significance
    test, over the SAME closed-form linear-growth space-time cube.
    Each pairwise slope is floor(dx*1e6/dt) — integers in, one shared
    IEEE double division — and the per-cell slope is the LOWER median
    (an element, no interpolation), so values and the ±0.5-counts/bin
    trend gate are engine-exact."""
    from morituri_spark.geo.clustering import theil_sen_cells

    ev = _read(spark, sf_dir, "events").where(
        F.expr("(event_id DIV 8) % 8 <= event_id % 8")
    )
    pts = ev.select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
        F.expr("event_id % 8").alias("t_bin"),
    )
    return theil_sen_cells(
        pts, n_bins=8, cell_deg=15.0, slope_threshold_micro=500_000
    )


def _quadkey_oracle_sql() -> str:
    """Rebuild every quadkey digit with the exact cell arithmetic
    (chr(48 + x_bit + 2·y_bit) per level, most-significant first)."""
    digits = " || ".join(
        f"chr(CAST(48 + ((x >> {8 - i}) & 1) + 2 * ((y >> {8 - i}) & 1) AS INT))"
        for i in range(1, 9)
    )
    return f"""
        WITH pts AS (
            SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
        xy AS (
            SELECT LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 256.0)
                                       AS BIGINT), 0), 255) AS x,
                   LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 256.0)
                                       AS BIGINT), 0), 255) AS y
            FROM pts),
        q AS (SELECT {digits} AS qk8 FROM xy)
        SELECT substring(qk8, 1, 4) AS qk4,
               count(*) AS n_points,
               count(DISTINCT qk8) AS n_subtiles
        FROM q GROUP BY 1
    """


def _q_crossmodal_dups(spark, sf_dir):
    """Cross-modal duplicate confirmation (pipelines/crossmodal.
    confirm_dups) over the brief's (image_id, caption, phash) shape:
    candidates from the banded phash Hamming join, confirmed by caption
    byte-equality via two id-joins of the pair set (never corpus²). The
    caption groups (event_id div 4) deliberately split the planted phash
    pairs — some confirm, some don't — and the oracle brute-forces BOTH
    conditions independently."""
    from morituri_spark.pipelines.crossmodal import confirm_dups

    ph = _phash_expr(lambda a, b: f"({a}) ^ {b}")
    imgs = _read(spark, sf_dir, "events").select(
        F.col("event_id").alias("image_id"),
        F.expr(ph).alias("phash"),
        F.format_string(
            "photo of scene %d", F.expr("event_id div 4")
        ).alias("caption"),
    )
    return confirm_dups(imgs, max_hamming=2).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


def _q_quadkey_pyramid(spark, sf_dir):
    """Quadkey tile pyramid (geo/cells.quadkey_col): base-4 tile-interop
    strings whose length-r PREFIX is the res-r parent tile, so the
    pyramid rollup is a substring groupBy (one exchange, map-side
    combinable). Pure floor + bit math — no Web-Mercator trig, whose
    libm last-ulp differences would flip boundary tiles between engines;
    the oracle rebuilds every digit with the identical arithmetic."""
    ev = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    from morituri_spark.geo.cells import quadkey_col

    qk = ev.select(quadkey_col(F.col("lon"), F.col("lat"), 8).alias("qk8"))
    return qk.groupBy(F.substring("qk8", 1, 4).alias("qk4")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("qk8").alias("n_subtiles"),
    )


def _geohash_oracle_sql() -> str:
    """Rebuild every base32 geohash character with the exact bisection
    arithmetic (interleaved lon-first bits, most-significant first) —
    same digit-replay strategy as :func:`_quadkey_oracle_sql`."""
    length, nbits = 6, 30
    nlon, nlat = (nbits + 1) // 2, nbits // 2
    chars = []
    for c in range(length):
        bits = []
        for j in range(5):
            t = 5 * c + j
            if t % 2 == 0:
                bits.append(f"((x >> {nlon - 1 - t // 2}) & 1) * {1 << (4 - j)}")
            else:
                bits.append(
                    f"((y >> {nlat - 1 - (t - 1) // 2}) & 1) * {1 << (4 - j)}"
                )
        v = " + ".join(bits)
        chars.append(
            "substring('0123456789bcdefghjkmnpqrstuvwxyz', "
            f"CAST(({v}) + 1 AS INT), 1)"
        )
    digits = " || ".join(chars)
    return f"""
        WITH pts AS (
            SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
        xy AS (
            SELECT LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {float(1 << nlon)})
                                       AS BIGINT), 0), {(1 << nlon) - 1}) AS x,
                   LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * {float(1 << nlat)})
                                       AS BIGINT), 0), {(1 << nlat) - 1}) AS y
            FROM pts),
        g AS (SELECT {digits} AS gh6 FROM xy)
        SELECT substring(gh6, 1, 3) AS gh3,
               count(*) AS n_points,
               count(DISTINCT gh6) AS n_subcells
        FROM g GROUP BY 1
    """


def _q_geohash_pyramid(spark, sf_dir):
    """Geohash tile-interop strings (geo/cells.geohash_col): the base32
    sibling of quadkey_pyramid — public geohash.org keys whose length-r
    PREFIX is the containing res-r cell, so the pyramid rollup is a
    substring groupBy (one exchange, map-side combinable) and subtree
    reads are a LIKE-prefix pushdown. Pure floor + bit math (no trig),
    whole-stage codegen; the oracle rebuilds every base32 character with
    the identical bisection arithmetic, so digits replay exactly."""
    from morituri_spark.geo.cells import geohash_col

    ev = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    gh = ev.select(geohash_col(F.col("lon"), F.col("lat"), 6).alias("gh6"))
    return gh.groupBy(F.substring("gh6", 1, 3).alias("gh3")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("gh6").alias("n_subcells"),
    )


def _hilbert_oracle_sql() -> str:
    """Replay the Hilbert per-bit quadrant walk as one CTE per bit (the
    SQL form of io/hilbert.with_hilbert's staged projections): each CTE
    reads the PREVIOUS stage's (x, y, d), so evaluation order is pinned
    exactly like the Spark plan's multiply-referenced alias stages."""
    res, n1 = 8, 255
    steps = []
    for i, bit in enumerate(range(res - 1, -1, -1)):
        prev = "xy" if i == 0 else f"it{i - 1}"
        steps.append(f"""
        it{i} AS (SELECT event_id,
            CASE WHEN ((y >> {bit}) & 1) = 1 THEN x
                 ELSE CASE WHEN ((x >> {bit}) & 1) = 1 THEN xor(y, {n1})
                      ELSE y END END AS x,
            CASE WHEN ((y >> {bit}) & 1) = 1 THEN y
                 ELSE CASE WHEN ((x >> {bit}) & 1) = 1 THEN xor(x, {n1})
                      ELSE x END END AS y,
            d + (xor(3 * ((x >> {bit}) & 1), (y >> {bit}) & 1) << {2 * bit}) AS d
        FROM {prev})""")
    its = ",".join(steps)
    return f"""
        WITH pts AS (
            SELECT event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events),
        xy AS (
            SELECT event_id,
                   LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 256.0)
                                       AS BIGINT), 0), 255) AS x,
                   LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 256.0)
                                       AS BIGINT), 0), 255) AS y,
                   CAST(0 AS BIGINT) AS d
            FROM pts),
        {its}
        SELECT event_id, d AS hkey FROM it{res - 1}
    """


def _q_hilbert_keys(spark, sf_dir):
    """Hilbert space-filling keys (io/hilbert.with_hilbert): the locality
    upgrade to the Morton z-order layout — no-jump curve, so bbox reads
    plan fewer/tighter key intervals (measured in tests/test_hilbert.py)
    while keeping the quad→one-contiguous-interval property the layout's
    pruning depends on. One staged projection per bit (rule 9: the step
    references x and y multiple times; inlining would grow the tree
    ~3^res), every stage pure shift/and/xor in whole-stage codegen. The
    oracle replays the identical walk as one CTE per bit — key-exact."""
    from morituri_spark.io.hilbert import with_hilbert

    ev = _read(spark, sf_dir, "events").select(
        "event_id", F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return with_hilbert(ev, "lon", "lat", 8, out="hkey").select(
        "event_id", "hkey"
    )


def _q_radius_pairs(spark, sf_dir):
    """Fixed-radius pair join (geo/knn.radius_join): every unordered
    event pair within 100 km — the DBSCAN-eps / co-location primitive.
    Candidates come from ONE cell equi-join (left side explodes to its
    latitude-aware disk cover, right side keys by home cell; never
    corpus²); the refine gate compares the 6-dp-rounded haversine on both
    engines so libm 1-ulp drift can't flip membership. The oracle brute
    forces the banded pair space (|Δlat| ≤ 1° is a strict superset of
    100 km) with the identical closed form."""
    from morituri_spark.geo.knn import radius_self_join

    pts = _read(spark, sf_dir, "events").select(
        "event_id", F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return radius_self_join(pts, 100.0, id_col="event_id").select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist_km",
    )


def _q_ripley_k(spark, sf_dir):
    """Ripley's K/L curve (geo/ripley.ripley_k): multi-scale clustering
    statistic — ONE cell-cover pair join at max(radii), per-radius
    membership via a broadcast join of the tiny radii list, zero-pair
    radii preserved. pair_count is an exact ordered-pair integer; K and L
    are one shared double expression each, rule-16 rounded to 6 dp; the
    membership gate compares the half-up-6dp haversine on both engines.
    The oracle brute-forces the |Δlat| ≤ 1° band (a strict superset of
    100 km) with the identical closed form."""
    from morituri_spark.geo.ripley import ripley_k

    pts = _read(spark, sf_dir, "events").select(
        "event_id", F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    return ripley_k(pts, [25.0, 50.0, 100.0], 510_072_000.0, id_col="event_id")


def _q_dbscan_points(spark, sf_dir):
    """Point-level DBSCAN (geo/clustering.dbscan_points): radius_join
    candidate pairs → degree gate (min_pts counts the point itself) →
    large-star/small-star CC over CORE-CORE edges only → deterministic
    border assignment (MIN core-neighbor label; sklearn's is scan-order-
    dependent), noise = -1. The oracle replays the full spec: banded
    brute-force pairs, degree, recursive-CTE reachability minimum, and
    the min-label border rule."""
    from morituri_spark.geo.clustering import dbscan_points

    pts = _read(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.expr(_GLON).alias("lon"),
        F.expr(_GLAT).alias("lat"),
    )
    return dbscan_points(pts, eps_km=100.0, min_pts=3).select(
        F.col("id").cast("long").alias("id"),
        "is_core",
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _q_spacetime_pairs(spark, sf_dir):
    """Space-time co-location join (geo/knn.radius_join with
    time_col/window_s): event pairs within 100 km AND 6 hours. The time
    key buckets truncated-second epochs into window-wide integer windows
    (adjacent-bucket probe explode), so the equi-join key is
    (cell, bucket) — the time dimension splinters hot cells before the
    salt gate looks. dt_s is the signed truncated-second delta (rule 12:
    truncate then diff = DuckDB date_diff('second')). 558 of the 6198
    spatial pairs survive the 3-day gate at sf0.01 (9 at sf0.001) — the
    window bites at both driver scales."""
    from morituri_spark.geo.knn import spacetime_self_join

    pts = _read(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"), "ts",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return spacetime_self_join(pts, 100.0, 259200, id_col="id").select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dist_km",
        F.col("dt_s").cast("long").alias("dt_s"),
    )


_POS_AT_STAMPS = ["2024-01-08 12:00:00", "2024-01-15 12:00:00", "2024-01-22 12:00:00"]


def _q_position_at(spark, sf_dir):
    """Geo as-of interpolation (geo/trajectory.position_at): per-user
    position at three fixed noon instants — fixes and query stamps union
    into one relation, forward+backward keyed windows each fill ONE
    whole-fix struct, closed-form lerp with clamped span edges. ONE
    exchange, no join. The oracle replays the identical union-window
    plan in DuckDB (IGNORE NULLS last_value both directions, same frac
    and rule-16 rounding expressions)."""
    from morituri_spark.geo.trajectory import position_at

    fixes = _read(spark, sf_dir, "events").select(
        "user_id", "ts", F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat")
    )
    qs = (
        _read(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.array(*[F.lit(s).cast("timestamp") for s in _POS_AT_STAMPS])
            ).alias("ts"),
        )
    )
    return position_at(fixes, qs, "user_id").select(
        F.col("user_id").cast("long").alias("user_id"), "ts", "lon", "lat"
    )


def _q_tile_mosaic(spark, sf_dir):
    """Tile mosaic selection (pipelines/mosaic.best_per_tile): best image
    per res-7 tile by REAL-decode mean luminance, ties broken by
    image_id — one map-side-combinable max_by argmax, no window sort.
    Runs the real PNG decode; the oracle replays the constant-image
    closed forms (gray is an exact integer by the blue-channel mod-3
    adjustment) plus the engine's floor cell arithmetic and a
    row_number argmax."""
    from morituri_spark.pipelines.mosaic import best_per_tile

    return best_per_tile(_constant_images(spark, sf_dir), res=7).select(
        F.col("tile").cast("long").alias("tile"),
        "image_id",
        "quality",
    )


def _q_contour_segments(spark, sf_dir):
    """Marching-squares iso-contour (geo/density.contour_segments) over a
    derived cell grid: one 4-block literal explode per occupied cell, a
    map-side-combinable bit sum builds the case index, an 18-row
    broadcast LUT emits midpoint segments — pure Catalyst, grid-bounded.
    The cell value is max((event_id*31)%97) per cell so the surface has
    contrast at BOTH driver scales; the oracle re-derives the full
    pipeline in SQL with its own copy of the public segment table (an
    independent spec pin, like the z-split golden vectors)."""
    from morituri_spark.geo.density import contour_segments

    cells = (
        _read(spark, sf_dir, "events")
        .select(
            (F.col("event_id") % 24).alias("ix"),
            F.expr("(event_id div 24) % 16").alias("iy"),
            ((F.col("event_id") * 31) % 97).alias("v"),
        )
        .groupBy("ix", "iy")
        .agg(F.max("v").alias("n_points"))
    )
    return contour_segments(cells, 60.0).select(
        F.col("bx").cast("long").alias("bx"),
        F.col("by").cast("long").alias("by"),
        F.col("case_idx").cast("int").alias("case_idx"),
        F.col("seg_idx").cast("int").alias("seg_idx"),
        "x1", "y1", "x2", "y2",
    )


def _q_od_matrix(spark, sf_dir):
    """Origin–destination flow matrix (geo/trajectory.od_matrix): per-user
    first→last endpoints via ONE min_by/max_by aggregate (no window
    sort), both endpoints through ONE pass of the real PIP engine
    (planner-routed), flows rolled up on (zone_o, zone_d). The oracle
    replays endpoints with a row_number window and containment with the
    same half-open bbox rule the pip_zone_assign oracles pin."""
    from morituri_spark.geo.trajectory import od_matrix

    traces = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_LON).alias("lon"), F.expr(_LAT).alias("lat"),
    )
    return od_matrix(traces, _rect_zones(spark), "user_id", ["ts", "event_id"]).select(
        F.col("zone_o").cast("long").alias("zone_o"),
        F.col("zone_d").cast("long").alias("zone_d"),
        F.col("n_trips").cast("long").alias("n_trips"),
    )


def _q_zone_hulls(spark, sf_dir):
    """Per-group convex hulls (geo/hull.py): two-stage monotone chain —
    map-side partial hulls over the input's own partitioning, ONE
    exchange of hull candidates, exact chain per group. The synth is an
    integer parabola (strictly convex: every (x, x²) point is a hull
    vertex, in x order, CCW from lex-min) plus strictly-interior chord
    midpoints (k²+2k+2 vs the parabola's k²+2k+1 — one integer unit
    above, 22 units below the top chord) and planted duplicates, so the
    oracle is the closed-form vertex list while the kernel runs the real
    general algorithm. Coordinates pass through the kernel untouched —
    both engines compute them from the same CAST arithmetic, so the
    value compare is bit-strict."""
    from morituri_spark.geo.hull import convex_hulls

    j = "((event_id div 5) % 50)"
    g = "(event_id % 5)"
    xu = (
        f"(CASE WHEN {j} < 25 THEN {j} WHEN {j} < 48 THEN {j} - 24"
        f" ELSE {j} - 44 END)"
    )
    yu = (
        f"(CASE WHEN {j} < 25 THEN {j} * {j}"
        f" WHEN {j} < 48 THEN ({j}-25)*({j}-25) + 2*({j}-25) + 2"
        f" ELSE ({j}-44)*({j}-44) END)"
    )
    lon = (
        f"CAST({g} * 30 - 60 AS DOUBLE)"
        f" + CAST({xu} AS DOUBLE) / CAST(100 AS DOUBLE)"
    )
    lat = (
        f"CAST({g} * 10 - 20 AS DOUBLE)"
        f" + CAST({yu} AS DOUBLE) / CAST(1000 AS DOUBLE)"
    )
    pts = _read(spark, sf_dir, "events").select(
        F.expr(g).alias("zone"),
        F.expr(lon).alias("lon"),
        F.expr(lat).alias("lat"),
    )
    return convex_hulls(pts, "zone").select(
        F.col("zone").cast("long").alias("zone"),
        F.col("vertex_idx").cast("int").alias("vertex_idx"),
        "lon",
        "lat",
    )


def _q_hausdorff_pairs(spark, sf_dir):
    """Discrete-Hausdorff track-similarity join (geo/similarity.py):
    tracks compact to sorted coordinate arrays (one exchange), candidate
    pairs come from the anchor→points radius_join cell equi-join (a
    strict superset: Hausdorff <= d forces each anchor within d of the
    other track), and the exact refine is a tiled NumPy haversine-matrix
    kernel with every pairwise distance rounded half-up to 6 dp BEFORE
    the min/max reductions — the same values the oracle's
    min(round(d,6)) → max → max pipeline reduces, so both engines select
    identical doubles. The 10 km gate discriminates WITHIN the 5-track
    base groups (78 of 80 in-group pairs pass at sf0.01)."""
    from morituri_spark.geo.similarity import hausdorff_join

    pts = (
        _read(spark, sf_dir, "events")
        .where(F.expr(_HSEL))
        .select(
            F.expr(_HTID).alias("track_id"),
            F.col("event_id").alias("seq"),
            F.expr(_HLON).alias("lon"),
            F.expr(_HLAT).alias("lat"),
        )
    )
    return hausdorff_join(pts, 10.0, id_col="track_id", seq_col="seq").select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "hausdorff_km",
    )


def _q_dtw_pairs(spark, sf_dir):
    """DTW track-similarity join (geo/similarity.dtw_join) — the order-
    sensitive sibling of hausdorff_track_pairs over the SAME 40-track
    fixture, truncated to 8 points per track (row_number both engines).
    Candidates: every warping path pays the (first, first) cell, so
    DTW <= 55 km forces first-point distance <= 55 km — one head-to-head
    radius_join is a provable superset (all in-group head gaps are under
    16 km; cross-group gaps are thousands). Refine: the O(min(n,m))-
    memory anti-diagonal DP, per-cell arithmetic d + min(up, left,
    upleft) with 6-dp pre-rounding — bit-identical to the oracle's 15
    unrolled MATERIALIZED diagonal stages (rule 27). 55 km splits the 80
    in-group pairs ~42/38, so the gate is value-discriminative."""
    from morituri_spark.geo.similarity import dtw_join
    from pyspark.sql import Window

    pts = (
        _read(spark, sf_dir, "events")
        .where(F.expr(_HSEL))
        .select(
            F.expr(_HTID).alias("track_id"),
            F.col("event_id").alias("seq"),
            F.expr(_HLON).alias("lon"),
            F.expr(_HLAT).alias("lat"),
        )
    )
    w = Window.partitionBy("track_id").orderBy("seq")
    pts8 = (
        pts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 8)
        .drop("_rn")
    )
    return dtw_join(pts8, 55.0, id_col="track_id", seq_col="seq").select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "dtw_km",
    )


def _q_frechet_pairs(spark, sf_dir):
    """Discrete-Fréchet track join (geo/similarity.frechet_join) — the
    bounded-deviation sibling of dtw_track_pairs over the SAME 40-track
    8-point fixture: per-cell combine is max(d, min(up, left, upleft))
    (Eiter–Mannila), so the result is a MAX over 6-dp-pre-rounded
    distances — selection-exact cross-engine, no accumulated float at
    all. Candidates: every coupling pays the (first, first) cell, so the
    head↔head radius_join at the gate is a provable superset. The 8 km
    gate discriminates WITHIN the 8 base groups (in-group Fréchet spans
    ~3-13 km on this fixture)."""
    from morituri_spark.geo.similarity import frechet_join
    from pyspark.sql import Window

    pts = (
        _read(spark, sf_dir, "events")
        .where(F.expr(_HSEL))
        .select(
            F.expr(_HTID).alias("track_id"),
            F.col("event_id").alias("seq"),
            F.expr(_HLON).alias("lon"),
            F.expr(_HLAT).alias("lat"),
        )
    )
    w = Window.partitionBy("track_id").orderBy("seq")
    pts8 = (
        pts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 8)
        .drop("_rn")
    )
    return frechet_join(pts8, 8.0, id_col="track_id", seq_col="seq").select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "frechet_km",
    )


def _dtw_oracle_sql(
    frechet: bool = False, out_col: str = "dtw_km", thr: float = 55.0
) -> str:
    """15 unrolled anti-diagonal DP stages, each AS MATERIALIZED (rule
    27: every stage references the previous two; inlining would re-read
    the base scan exponentially). Cell arithmetic is the kernel's
    d + least(predecessors) — or, with ``frechet=True``, the
    Eiter–Mannila greatest(d, least(predecessors)) — the 1e18 sentinel is
    never selected because every non-origin cell has at least one real
    predecessor."""
    hav = (
        "floor((2 * 6371.0088 * asin(sqrt(least("
        "power(sin(radians(b.lat - a.lat) / 2), 2)"
        " + cos(radians(a.lat)) * cos(radians(b.lat))"
        " * power(sin(radians(b.lon - a.lon) / 2), 2), 1.0))))"
        " * 1e6 + 0.5 + 1e-8) / 1e6"
    )
    unions = " ".join(f"UNION ALL SELECT * FROM s{k}" for k in range(1, 15))

    def _cell(best: str) -> str:
        return f"greatest(d.d, {best})" if frechet else f"d.d + {best}"

    best3 = (
        "least(coalesce(up.cost, 1e18), coalesce(lf.cost, 1e18),"
        " coalesce(ul.cost, 1e18))"
    )
    stages = []
    for t in range(2, 15):
        stages.append(f"""
            s{t} AS MATERIALIZED (
              SELECT d.ia, d.ib, d.i, {t} AS t,
                     {_cell(best3)} AS cost
              FROM d
              LEFT JOIN s{t - 1} up ON up.ia = d.ia AND up.ib = d.ib
                                   AND up.i = d.i - 1
              LEFT JOIN s{t - 1} lf ON lf.ia = d.ia AND lf.ib = d.ib
                                   AND lf.i = d.i
              LEFT JOIN s{t - 2} ul ON ul.ia = d.ia AND ul.ib = d.ib
                                   AND ul.i = d.i - 1
              WHERE d.i + d.j = {t})""")
    return f"""
        WITH pts AS MATERIALIZED (
          SELECT tid, rn - 1 AS k, lon, lat FROM (
            SELECT {_HTID} AS tid,
                   row_number() OVER (PARTITION BY {_HTID}
                                      ORDER BY event_id) AS rn,
                   {_HLON} AS lon, {_HLAT} AS lat
            FROM events WHERE {_HSEL}) t
          WHERE rn <= 8),
        pairs AS MATERIALIZED (
          SELECT a.tid AS ia, b.tid AS ib
          FROM (SELECT DISTINCT tid FROM pts) a
          JOIN (SELECT DISTINCT tid FROM pts) b ON a.tid < b.tid),
        d AS MATERIALIZED (
          SELECT p.ia, p.ib, a.k AS i, b.k AS j, {hav} AS d
          FROM pairs p
          JOIN pts a ON a.tid = p.ia
          JOIN pts b ON b.tid = p.ib),
        lens AS MATERIALIZED (
          SELECT tid, count(*) AS n FROM pts GROUP BY tid),
        s0 AS MATERIALIZED (
          SELECT ia, ib, i, 0 AS t, d AS cost FROM d WHERE i = 0 AND j = 0),
        s1 AS MATERIALIZED (
          SELECT d.ia, d.ib, d.i, 1 AS t,
                 {_cell("least(coalesce(up.cost, 1e18),"
                        " coalesce(lf.cost, 1e18))")} AS cost
          FROM d
          LEFT JOIN s0 up ON up.ia = d.ia AND up.ib = d.ib
                         AND up.i = d.i - 1
          LEFT JOIN s0 lf ON lf.ia = d.ia AND lf.ib = d.ib
                         AND lf.i = d.i
          WHERE d.i + d.j = 1),{",".join(stages)},
        allcells AS (
          SELECT * FROM s0 {unions}),
        final AS (
          -- the DP's terminal cell per pair is (n_a - 1, n_b - 1) on
          -- diagonal n_a + n_b - 2: read it by LENGTH, not by a fixed
          -- stage, so truncated tracks (tiny SFs yield < 8 points) land
          -- on the same cell the kernel returns
          SELECT c.ia, c.ib, c.cost
          FROM allcells c
          JOIN lens la ON la.tid = c.ia
          JOIN lens lb ON lb.tid = c.ib
          WHERE c.t = la.n + lb.n - 2 AND c.i = la.n - 1)
        SELECT ia AS id_a, ib AS id_b,
               floor(cost * 1e6 + 0.5 + 1e-8) / 1e6 AS {out_col}
        FROM final
        WHERE floor(cost * 1e6 + 0.5 + 1e-8) / 1e6 <= {thr}
    """


def _q_resample_track(spark, sf_dir):
    """Fixed-interval trajectory resampling (geo/trajectory.resample_track):
    every user's 29-day event trace interpolated to a daily grid anchored
    at their first fix — ONE keyed exchange, per-segment sequence explode
    bounded by duration/T. Oracle replays off-diffs, the half-open grid
    membership (off < k·T ≤ noff via integer division), and the identical
    staged interpolation expression."""
    from morituri_spark.geo.trajectory import resample_track

    pts = _read(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"),
    )
    return resample_track(
        pts, "user_id", "ts", ["ts", "event_id"], interval_s=86400
    )


def _q_idw_surface(spark, sf_dir):
    """IDW interpolation surface (geo/interpolate.idw_surface): event
    values interpolated to 5° cell centers from the 3×3 neighborhood,
    QUANTIZED integer weights (⌊1e9/(1e-3+d²)⌋) summed as DECIMAL(38,0)
    — partition-order-independent by construction, so Spark and DuckDB
    agree exactly; the only float ops are the shared d² expression and
    one final division."""
    from morituri_spark.geo.interpolate import idw_surface

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"), "value"
    )
    return idw_surface(pts, cell_deg=5.0)


def _q_gwr_surface(spark, sf_dir):
    """Geographically weighted regression (geo/interpolate.gwr_surface):
    per-cell weighted-OLS fit of value on position over the 3×3
    neighborhood — IDW's sibling that also returns the LOCAL GRADIENT.
    Regressors/weights/values quantized to integers (1e-6-cell local
    coords, ⌊1e21/(1e9+d2q)⌋ kernel weights), nine moments summed as
    DECIMAL(38,0) — exact at any parallelism — then the 3×3 Cramer solve
    runs as the SAME expression text (_GWR_* strings) in Catalyst and
    DuckDB, so the only float arithmetic is a shared IEEE tree of exact
    integer inputs."""
    from morituri_spark.geo.interpolate import gwr_surface

    pts = _read(spark, sf_dir, "events").select(
        F.expr(_GLON).alias("lon"), F.expr(_GLAT).alias("lat"), "value"
    )
    return gwr_surface(pts, cell_deg=5.0)


def _gwr_oracle_sql() -> str:
    """Replays gwr_surface stage-for-stage; the solve reuses the
    module's _GWR_* expression strings verbatim (shared IEEE tree)."""
    from morituri_spark.geo.interpolate import (
        _GWR_B0, _GWR_BX, _GWR_BY, _GWR_GATE,
    )

    moments = {
        "s0": None, "sx": "xq", "sy": "yq", "sxx": "xx", "sxy": "xy",
        "syy": "yy", "sv": "vq", "sxv": "xv", "syv": "yv",
    }
    sums = ",\n                   ".join(
        f"sum(CAST(wq AS DECIMAL(19,0))) AS d_{k}" if c is None
        else f"sum(CAST(wq AS DECIMAL(19,0)) * CAST({c} AS DECIMAL(19,0))) AS d_{k}"
        for k, c in moments.items()
    )
    casts = ", ".join(f"CAST(d_{k} AS DOUBLE) AS {k}" for k in moments)
    return f"""
        WITH pts AS (
            SELECT {_GLON} AS lon, {_GLAT} AS lat, value FROM events),
        b AS (
            SELECT CAST(floor(lon / 5.0) AS BIGINT) AS px,
                   CAST(floor(lat / 5.0) AS BIGINT) AS py,
                   lon AS x, lat AS y,
                   CAST(floor(value * 1000.0) AS BIGINT) AS vq
            FROM pts),
        c AS (
            SELECT b.*, px + dx.d AS ix, py + dy.d AS iy
            FROM b,
                 (VALUES (-1), (0), (1)) AS dx(d),
                 (VALUES (-1), (0), (1)) AS dy(d)),
        q AS (
            SELECT ix, iy, vq,
                   CAST(floor((x / 5.0 - (CAST(ix AS DOUBLE) + 0.5)) * 1e6)
                        AS BIGINT) AS xq,
                   CAST(floor((y / 5.0 - (CAST(iy AS DOUBLE) + 0.5)) * 1e6)
                        AS BIGINT) AS yq
            FROM c),
        s AS (
            SELECT ix, iy,
                   CAST(floor(1e21 / (1e9 + CAST(xq * xq + yq * yq AS DOUBLE)))
                        AS BIGINT) AS wq,
                   xq, yq, vq,
                   xq * xq AS xx, xq * yq AS xy, yq * yq AS yy,
                   xq * vq AS xv, yq * vq AS yv
            FROM q),
        a AS (
            SELECT ix, iy, count(*) AS n_samples,
                   {sums}
            FROM s GROUP BY 1, 2),
        m AS (
            SELECT ix, iy, n_samples, {casts} FROM a)
        SELECT ix, iy, n_samples,
               {_GWR_B0} AS beta0,
               {_GWR_BX} AS beta_x,
               {_GWR_BY} AS beta_y
        FROM m
        WHERE n_samples >= 3 AND {_GWR_GATE}
    """


def _q_chunk_text(spark, sf_dir):
    """Overlapping token-window chunking (text/chunking.chunk_text — the
    RAG/pretraining splitter): 32-token windows, 8-token overlap, last
    window short. Shuffle-free (in-row sequence + posexplode); the oracle
    replays the DIV chunk-count closed form and 1-based token slicing."""
    from morituri_spark.text.chunking import chunk_text

    return chunk_text(
        _read(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


def _q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 to vec 0 (J11-family, oracle-checked)."""
    from morituri_spark.ml.simsearch import topk_bruteforce

    emb = _read(spark, sf_dir, "embeddings")
    query = emb.where("vec_id = 0").first()["embedding"]
    return topk_bruteforce(emb, [float(x) for x in query], k=10)


# --- oracle-checked composed pipelines (reference entry points 1 and 3) ----
#
# The synth fixtures use NumPy RNG (not SQL-reproducible), so these derive
# their NAVSTREETS-shaped inputs from the parquet tables with pure SQL
# arithmetic — identical on both engines — and run the REAL operators
# (prepare_z_groups → split_ways → tag projection → dense ids; rings →
# chunk_rings → relations). The oracle re-derives the expected output in
# closed form from the reference's split/chunk semantics.

# Per-link z-vector shapes (6-vertex links, 0-based idx), split closed-form
# hand-derived from navteq.hpp:347-469 (verified against the 44 goldens):
#   shape 0: no z rows                  → [(0,5,·)]             (no-z path)
#   shape 1: z at idx 1,2               → [(0,3,z),(3,5,0)]
#   shape 2: z at idx 1,4 (gap)         → [(0,2,z),(2,3,0),(3,5,z)]
#   shape 3: z at idx 2,3 (head)        → [(0,1,0),(1,4,z),(4,5,0)]
# Ferry links (W2) drop all interior z pairs → single [(0,5,0)] segment.
_LINKS_FILTER = "o_orderkey < 8000"

# Attribute derivations shared verbatim by the Spark input builder and the
# oracle's links CTE (STRING is a valid type alias in both dialects).
_STREET_ATTR_SQL = {
    "ST_NAME": "concat('Road ', CAST(o_orderkey % 10 AS STRING))",
    "FUNC_CLASS": "CAST(o_orderkey % 5 + 1 AS STRING)",
    "ROUTE_TYPE": "CASE WHEN o_orderkey % 3 = 0 THEN '' ELSE CAST(o_orderkey % 6 + 1 AS STRING) END",
    "URBAN": "CASE WHEN o_orderkey % 2 = 0 THEN 'Y' ELSE 'N' END",
    "DIR_TRAVEL": "CASE WHEN o_orderkey % 7 < 2 THEN 'F' WHEN o_orderkey % 7 < 4 THEN 'T' ELSE 'B' END",
    "SPEED_CAT": "CAST(o_orderkey % 8 + 1 AS STRING)",
    "FR_SPD_LIM": (
        "CASE o_orderkey % 11 WHEN 0 THEN '0' WHEN 1 THEN '998' WHEN 2 THEN '999' "
        "WHEN 3 THEN '30' WHEN 4 THEN '50' WHEN 5 THEN '80' WHEN 6 THEN '100' "
        "WHEN 7 THEN '130' WHEN 8 THEN '50' WHEN 9 THEN '60' ELSE '70' END"
    ),
    "TO_SPD_LIM": (
        "CASE WHEN o_orderkey % 13 = 0 THEN '0' WHEN o_orderkey % 13 = 1 THEN '998' "
        "WHEN o_orderkey % 13 = 2 THEN '999' WHEN o_orderkey % 13 = 3 THEN '30' "
        "WHEN o_orderkey % 13 = 4 THEN '50' WHEN o_orderkey % 13 = 5 THEN '100' "
        "ELSE CAST((o_orderkey % 13) * 10 AS STRING) END"
    ),
    "AR_AUTO": "CASE WHEN o_orderkey % 19 = 0 THEN 'N' ELSE 'Y' END",
    "AR_BUS": "CASE WHEN o_orderkey % 23 = 0 THEN 'N' ELSE 'Y' END",
    "AR_TAXIS": "CASE WHEN o_orderkey % 29 = 0 THEN 'N' ELSE 'Y' END",
    "AR_PEDEST": "CASE WHEN o_orderkey % 17 = 3 THEN 'N' ELSE 'Y' END",
    "AR_TRUCKS": "CASE WHEN o_orderkey % 31 = 0 THEN 'N' ELSE 'Y' END",
    "AR_EMERVEH": "CASE WHEN o_orderkey % 37 = 0 THEN 'N' ELSE 'Y' END",
    "AR_MOTOR": "CASE WHEN o_orderkey % 41 = 0 THEN 'N' ELSE 'Y' END",
    "AR_TRAFF": "CASE WHEN o_orderkey % 43 = 0 THEN 'N' ELSE 'Y' END",
    "PUB_ACCESS": "CASE WHEN o_orderkey % 47 = 0 THEN 'N' ELSE 'Y' END",
    "PRIVATE": "CASE WHEN o_orderkey % 53 = 0 THEN 'Y' ELSE 'N' END",
    "PAVED": "CASE WHEN o_orderkey % 2 = 1 THEN 'Y' ELSE 'N' END",
    "BRIDGE": "CASE WHEN o_orderkey % 59 = 0 THEN 'Y' ELSE 'N' END",
    "TUNNEL": "CASE WHEN o_orderkey % 61 = 0 THEN 'Y' ELSE 'N' END",
    "TOLLWAY": "CASE WHEN o_orderkey % 67 = 0 THEN 'Y' ELSE 'N' END",
    "ROUNDABOUT": "CASE WHEN o_orderkey % 71 = 0 THEN 'Y' ELSE 'N' END",
    "FOURWHLDR": "CASE WHEN o_orderkey % 73 = 0 THEN 'Y' ELSE 'N' END",
    "PHYS_LANES": "CAST(o_orderkey % 5 AS STRING)",
    "L_POSTCODE": "CASE WHEN o_orderkey % 4 = 0 THEN '' ELSE CAST(5500 + o_orderkey % 3 AS STRING) END",
    "R_POSTCODE": "CASE WHEN o_orderkey % 6 = 0 THEN '' ELSE CAST(5500 + o_orderkey % 2 AS STRING) END",
    "FERRY_TYPE": "CASE WHEN o_orderkey % 17 = 0 THEN 'B' WHEN o_orderkey % 17 = 1 THEN 'R' ELSE 'H' END",
    # J4 area chain inputs (street_conversion, r5): areas 1-5 exist in the
    # literal MtdArea table; 0 and 6 are deliberately unmatched (→ metric)
    "L_AREA_ID": "CAST(o_orderkey % 7 AS BIGINT)",
    "R_AREA_ID": "CAST(o_orderkey % 5 + 1 AS BIGINT)",
    # house-number interpolation inputs (G8 gating, navteq.hpp:536-544)
    "ADDR_TYPE": "CASE WHEN o_orderkey % 3 = 0 THEN 'B' ELSE '' END",
    "L_REFADDR": "CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE CAST(2 + o_orderkey % 7 AS STRING) END",
    "L_NREFADDR": "CAST(40 + o_orderkey % 9 AS STRING)",
    "L_ADDRSCH": "CASE WHEN o_orderkey % 4 = 0 THEN 'E' WHEN o_orderkey % 4 = 1 THEN 'O' WHEN o_orderkey % 4 = 2 THEN 'M' ELSE '' END",
    "R_REFADDR": "CAST(1 + o_orderkey % 6 AS STRING)",
    "R_NREFADDR": "CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE CAST(41 + o_orderkey % 8 AS STRING) END",
    "R_ADDRSCH": "CASE WHEN o_orderkey % 5 = 0 THEN 'O' WHEN o_orderkey % 5 = 1 THEN 'E' ELSE 'M' END",
}

_STREET_GEOM_SQL = (
    "transform(sequence(0, 5), j -> array("
    "CAST(o_orderkey % 100 AS DOUBLE) * 0.01 + CAST(j AS DOUBLE) * 0.001, "
    "CAST(o_orderkey % 90 AS DOUBLE) * 0.1))"
)


def _derived_streets(spark, sf_dir):
    o = _read(spark, sf_dir, "orders").where(_LINKS_FILTER).select("o_orderkey")
    cols = [F.col("o_orderkey").cast("long").alias("LINK_ID")]
    cols += [F.expr(sql).alias(name) for name, sql in _STREET_ATTR_SQL.items()]
    cols.append(F.expr(_STREET_GEOM_SQL).alias("geometry"))
    streets = o.select(*cols)
    zl = (
        o.where("o_orderkey % 4 != 0")
        .select(
            F.col("o_orderkey").cast("long").alias("LINK_ID"),
            F.expr("CAST(o_orderkey % 5 + 1 AS INT)").alias("Z_LEVEL"),
            F.explode(
                F.expr(
                    "CASE CAST(o_orderkey % 4 AS INT) WHEN 1 THEN array(2, 3) "
                    "WHEN 2 THEN array(2, 5) ELSE array(3, 4) END"
                )
            ).alias("POINT_NUM"),
        )
        .select("LINK_ID", F.col("POINT_NUM").cast("int").alias("POINT_NUM"), "Z_LEVEL")
    )
    return streets, zl


def _q_street_ways_oracle(spark, sf_dir):
    """Entry point 1 (street conversion) hash-checked end-to-end: derived
    streets + z-vectors → the REAL prepare_z_groups/split_ways/tag-
    projection/dense-id pipeline; the oracle recomputes segments and tags in
    closed form (navteq.hpp:347-469 split semantics, tag_parser:21-221)."""
    from morituri_spark.operators import streets as ST

    streets, zl = _derived_streets(spark, sf_dir)
    ways = ST.street_ways(streets, zl)
    return ways.select(
        "way_id", "link_id", F.col("seg_seq").cast("int").alias("seg_seq"),
        F.col("from_idx").cast("int").alias("from_idx"),
        F.col("to_idx").cast("int").alias("to_idx"),
        "layer", "name", "highway", "oneway", "maxspeed", "here_speed_cat",
        "surface", "toll",
    )


def _derived_restriction_inputs(spark, sf_dir):
    """Closed-form turn-restriction inputs shared by turn_restrictions_oracle
    and the nodes-free turn_restrictions variant: chained streets with dense
    row_number link ids (link L spans x∈[c·0.005, (c+1)·0.005], c = L mod
    50, so consecutive ids in a row share an endpoint), rdms/cdms from
    modulo arithmetic. Returns (rdms, cdms, ways, nodes)."""
    from pyspark.sql.window import Window

    from morituri_spark.operators import streets as ST
    from morituri_spark.sources import synth

    o = _read(spark, sf_dir, "orders").where(_LINKS_FILTER).select("o_orderkey")
    n_links = o.count()
    # dense ids: the window is single-partition but over ≤8k dimension rows
    base = o.select(
        F.row_number().over(Window.orderBy("o_orderkey")).cast("long").alias("lid"),
        "o_orderkey",
    )
    geom = (
        "transform(sequence(0, 5), j -> array("
        "CAST(lid % 50 AS DOUBLE) * 0.005 + CAST(j AS DOUBLE) * 0.001, "
        "CAST(CAST(lid / 50 AS BIGINT) AS DOUBLE) * 0.01))"
    )
    streets = base.select(
        F.col("lid").alias("LINK_ID"),
        F.expr(geom).alias("geometry"),
        *[F.expr(sql).alias(name) for name, sql in _STREET_ATTR_SQL.items()],
    )
    rd3 = (
        base.where(f"lid % 10 = 2 AND lid % 50 <= 47 AND lid + 2 <= {n_links}")
        .select(
            F.col("lid").alias("LINK_ID"),
            (F.col("lid") + 5000).alias("COND_ID"),
            F.explode(
                F.expr("array(struct(lid + 1 AS MAN_LINKID, 0 AS SEQ),"
                       " struct(lid + 2 AS MAN_LINKID, 1 AS SEQ))")
            ).alias("_m"),
        )
        .select("LINK_ID", "COND_ID", F.col("_m.MAN_LINKID").alias("MAN_LINKID"),
                F.col("_m.SEQ").cast("int").alias("SEQ"))
    )
    rd2 = base.where(f"lid % 10 = 7 AND lid % 50 <= 48 AND lid + 1 <= {n_links}").select(
        F.col("lid").alias("LINK_ID"),
        (F.col("lid") + 5000).alias("COND_ID"),
        (F.col("lid") + 1).alias("MAN_LINKID"),
        F.lit(0).alias("SEQ"),
    )
    rdms = rd3.unionByName(rd2)
    cdms = base.where("lid % 10 = 2").select(
        F.col("lid").alias("LINK_ID"),
        (F.col("lid") + 5000).alias("COND_ID"),
        # half the 3-link conds carry COND_TYPE≠7 → skipped (navteq:949-950)
        F.expr("CAST(CASE WHEN lid % 20 = 2 THEN 3 ELSE 7 END AS INT)").alias("COND_TYPE"),
    )
    zl = synth.zlevels_table(spark, [])
    ways = ST.street_ways(streets, zl)
    nodes = ST.street_nodes(streets, zl)
    return rdms, cdms, ways, nodes


def _q_turn_restrictions_oracle(spark, sf_dir):
    """Entry point 2 (turn restrictions) hash-checked end-to-end over the
    shared closed-form inputs (_derived_restriction_inputs). Exercises A3
    sequence collect, the found-and-≠7 skip, W5 orientation walk, P8
    completeness, and J9 via-node resolution (2-way case gets a
    shared-endpoint node member). The oracle derives the surviving
    relations in closed form."""
    from morituri_spark.operators import restrictions as R

    rdms, cdms, ways, nodes = _derived_restriction_inputs(spark, sf_dir)
    rels = R.build_turn_restrictions(rdms, cdms, ways, nodes)
    return rels.select(
        "relation_id",
        "cond_id",
        F.size("members").cast("int").alias("n_members"),
        F.exists("members", lambda m: m["mtype"] == "node").alias("has_via_node"),
        "restriction",
        "type",
    )


def _q_house_numbers_oracle(spark, sf_dir):
    """G6-G8 house-number interpolation ways, hash-checked on structure:
    the offset-curve geometry is float-heavy, but the gating (ADDR_TYPE='B',
    non-empty ref/nref, schema ∉ {'', 'M'}), per-side interpolation tag,
    ref/nref numbers, and node count (collinear 6-vertex input → 6 offset
    points) are closed-form."""
    from morituri_spark.geo.curves import house_number_ways

    streets, _ = _derived_streets(spark, sf_dir)
    return house_number_ways(streets).select(
        "link_id", "side", "addr_interpolation",
        "ref_housenumber", "nref_housenumber",
        F.col("n_nodes").cast("int").alias("n_nodes"),
    )


def _q_admin_relations_oracle(spark, sf_dir):
    """Entry point 3 (admin boundaries) hash-checked: nation-derived
    polygons (ring sizes straddle the 1000-node chunk limit) through the
    REAL chunk_rings/relations pipeline; oracle computes chunk counts with
    the do-while closed form (navteq.hpp:675-692: ways = 1+⌊(n-1)/999⌋)."""
    from morituri_spark.operators import admin as A

    n = _read(spark, sf_dir, "nation")
    verts = (
        "CASE n_nationkey % 4 WHEN 0 THEN 4 WHEN 1 THEN 998 "
        "WHEN 2 THEN 999 ELSE 1000 END"
    )
    outer = (
        f"transform(sequence(0, {verts} - 1), j -> array("
        f"CAST(n_nationkey AS DOUBLE) + 0.1 * cos(2 * pi() * j / {verts}), "
        f"CAST(n_nationkey AS DOUBLE) + 0.1 * sin(2 * pi() * j / {verts})))"
    )
    outer_closed = f"concat({outer}, slice({outer}, 1, 1))"
    inner = (
        "transform(sequence(0, 3), j -> array("
        "CAST(n_nationkey AS DOUBLE) + 0.01 * cos(2 * pi() * j / 4), "
        "CAST(n_nationkey AS DOUBLE) + 0.01 * sin(2 * pi() * j / 4)))"
    )
    inner_closed = f"concat({inner}, slice({inner}, 1, 1))"
    adminbndy = n.select(
        F.expr("CAST(n_nationkey + 1 AS BIGINT)").alias("AREA_ID"),
        F.expr("CAST(n_nationkey % 5 + 1 AS INT)").alias("level"),
        F.expr(
            f"CASE WHEN n_nationkey % 2 = 0 THEN array({outer_closed}, {inner_closed}) "
            f"ELSE array({outer_closed}) END"
        ).alias("rings"),
    )
    mtd_area = n.select(
        F.expr("CAST(n_nationkey + 1 AS BIGINT)").alias("AREA_ID"),
        F.expr("CAST(n_nationkey % 7 + 1 AS INT)").alias("ADMIN_LVL"),
        F.lit("ENG").alias("LANG_CODE"),
        F.expr("concat('Area ', CAST(n_nationkey AS STRING))").alias("AREA_NAME"),
        F.lit(101).cast("long").alias("GOVT_CODE"),
    )
    out = A.convert_admin_boundaries(adminbndy, mtd_area)
    return out["relations"].select(
        "relation_id",
        "area_id",
        "admin_level",
        F.size("outer_way_ids").alias("n_outer"),
        F.size("inner_way_ids").alias("n_inner"),
    )


# --- rows-only queries (no SQL equivalent; driver records a weaker check) ---

def _q_zsplit_golden(spark, sf_dir):
    """W1 z-level splitting over the reference's 44 golden vectors, through
    the CATALYST expression fold — the oracle below derives the expected
    segment table from the independent Python port of the reference kernel,
    so the two implementations check each other."""
    from morituri_spark.operators import zsplit
    from morituri_spark.sources.synth import zlevels_table

    GOLDEN = zsplit.GOLDEN_VECTORS
    vectors = [(100 + i, [int(t) for t in s.split()]) for i, (s, _) in enumerate(GOLDEN)]
    zl = zlevels_table(spark, vectors)
    groups = zsplit.prepare_z_groups(zl)
    n_points = spark.createDataFrame(
        [(100 + i, len(s.split())) for i, (s, _) in enumerate(GOLDEN)],
        "link_id long, n_points int",
    )
    inp = n_points.join(groups, "link_id").withColumn("is_ferry", F.lit(False))
    return zsplit.split_ways_catalyst(inp)


def _zsplit_oracle_sql() -> str:
    """Expected z-split segments as a VALUES table, computed by the Python
    kernel (the port the 44 reference goldens pin) — independent of the
    Catalyst fold the query runs."""
    from morituri_spark.operators.zsplit import GOLDEN_VECTORS, split_link

    rows = []
    for i, (s, _) in enumerate(GOLDEN_VECTORS):
        zs = [int(t) for t in s.split()]
        pairs = [(j, z) for j, z in enumerate(zs) if z != 0]
        for seq, (f, t, z) in enumerate(split_link(len(zs), pairs)):
            rows.append(f"({100 + i}, {seq}, {f}, {t}, {z})")
    values = ", ".join(rows)
    return f"""
        SELECT CAST(link_id AS BIGINT) AS link_id, CAST(seg_seq AS INT) AS seg_seq,
               CAST(from_idx AS INT) AS from_idx, CAST(to_idx AS INT) AS to_idx,
               CAST(z_lvl AS INT) AS z_lvl
        FROM (VALUES {values}) AS t(link_id, seg_seq, from_idx, to_idx, z_lvl)
    """


def _ring_chunk_oracle_sql() -> str:
    """Expected chunk sizes from the closed-form do-while (Python
    chunk_bounds) — independent of the Catalyst chunking the query runs."""
    from morituri_spark.operators.rings import chunk_bounds

    sizes = [2, 5, 10, 100, 999, 1000, 1001, 1002]
    rows = []
    for zi, s in enumerate(sizes):
        n_nodes = s + 1  # ring arrays in the query have s+1 points (closed)
        for seq, (a, b) in enumerate(chunk_bounds(n_nodes)):
            rows.append(f"({zi}, {seq}, {b - a})")
    values = ", ".join(rows)
    return f"""
        SELECT CAST(zone_id AS BIGINT) AS zone_id, CAST(way_seq AS INT) AS way_seq,
               CAST(n_nodes AS INT) AS n_nodes
        FROM (VALUES {values}) AS t(zone_id, way_seq, n_nodes)
    """


def _q_ring_chunk(spark, sf_dir):
    from morituri_spark.operators.rings import chunk_rings

    sizes = [2, 5, 10, 100, 999, 1000, 1001, 1002]
    rows = [
        (zi, 0, [[0.0, 0.0]] + [[float(i), float(i)] for i in range(1, s)] + [[0.0, 0.0]])
        for zi, s in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "zone_id long, ring_idx int, ring array<array<double>>")
    return chunk_rings(df).select("zone_id", "way_seq", F.size("way_nodes").alias("n_nodes"))


def _q_street_conversion(spark, sf_dir):
    """Entry point 1 WITH the full dimension chain (J2-J4, r5 — previously a
    NumPy-RNG rows-only demo): closed-form Cdms/CndMod conditions and the
    literal MtdArea/MtdCntryRef tables drive link_restrictions
    (operators/streets.py:52-108) — per-link MIN nonzero MOD_VAL per type,
    any-imperial-wins L/R-area units, and the fixture-pinned %.6g / feet-
    inches formatting (util.hpp:165-189) — the surface street_ways_oracle
    does not cover. The DuckDB oracle replays conditions, mins, the
    imperial flag, and both format families symbolically."""
    from morituri_spark.operators import streets as ST
    from morituri_spark.sources import synth

    streets, zl = _derived_streets(spark, sf_dir)
    o = _read(spark, sf_dir, "orders").where(_LINKS_FILTER).select("o_orderkey")
    # condition A on every link ≡1 (mod 3); condition B additionally on ≡1
    # (mod 6) links, so those links carry TWO conds (exercises the per-type
    # MIN); A's mod row is withheld on ≡0 (mod 11) links (inner-join drop)
    # and zeroed on ≡0 (mod 13) links (the MOD_VAL > 0 gate).
    cond_a = o.where("o_orderkey % 3 = 1").selectExpr(
        "CAST(o_orderkey AS BIGINT) AS LINK_ID",
        "CAST(o_orderkey * 10 + 1 AS BIGINT) AS COND_ID",
        "CAST(7 AS INT) AS COND_TYPE",
    )
    cond_b = o.where("o_orderkey % 6 = 1").selectExpr(
        "CAST(o_orderkey AS BIGINT) AS LINK_ID",
        "CAST(o_orderkey * 10 + 2 AS BIGINT) AS COND_ID",
        "CAST(3 AS INT) AS COND_TYPE",
    )
    mod_a = o.where("o_orderkey % 3 = 1 AND o_orderkey % 11 != 0").selectExpr(
        "CAST(o_orderkey * 10 + 1 AS BIGINT) AS COND_ID",
        "CAST(41 + o_orderkey % 5 AS INT) AS MOD_TYPE",
        "CAST(CASE WHEN o_orderkey % 13 = 0 THEN 0 "
        "ELSE 100 + o_orderkey % 4000 END AS BIGINT) AS MOD_VAL",
    )
    mod_b = o.where("o_orderkey % 6 = 1").selectExpr(
        "CAST(o_orderkey * 10 + 2 AS BIGINT) AS COND_ID",
        "CAST(41 + o_orderkey % 2 AS INT) AS MOD_TYPE",
        "CAST(50 + o_orderkey % 3000 AS BIGINT) AS MOD_VAL",
    )
    ways = ST.street_ways(
        streets, zl, cond_a.unionByName(cond_b), mod_a.unionByName(mod_b),
        synth.mtd_area_table(spark), synth.mtd_cntry_ref_table(spark),
    )
    return ways.select(
        "way_id", "link_id", F.col("seg_seq").cast("int").alias("seg_seq"),
        "layer", "highway", "name", "maxspeed",
        "maxheight", "maxwidth", "maxlength", "maxweight", "maxaxleload",
    )


def _q_turn_restrictions(spark, sf_dir):
    """Entry point 2 WITHOUT the nodes table (r5 — previously a NumPy-RNG
    rows-only demo): the same closed-form chained-street parameterization as
    turn_restrictions_oracle, but build_turn_restrictions runs with
    nodes=None — the reference's warning path (navteq.hpp:97-134) where a
    2-way restriction's via NODE cannot be resolved, so members stay
    ways-only (n_members = 2 instead of 3)."""
    from morituri_spark.operators import restrictions as R

    rdms, cdms, ways, _nodes = _derived_restriction_inputs(spark, sf_dir)
    rels = R.build_turn_restrictions(rdms, cdms, ways)
    return rels.select(
        "relation_id", "cond_id",
        F.size("members").cast("int").alias("n_members"), "restriction", "type",
    )


def _q_admin_boundaries(spark, sf_dir):
    """Entry point 3 over the LITERAL fixture boundaries (r5 — now
    golden-oracled): the five hand-written polygons (rectangles, a hexagon,
    one rect-with-hole) and the literal MtdArea names/levels are
    deterministic, so the expected relation table is a closed-form VALUES
    oracle (containment-parity ring roles, 2×level admin_level, single
    sub-1000-node chunk per ring)."""
    from morituri_spark.operators import admin as A
    from morituri_spark.sources import synth

    out = A.convert_admin_boundaries(synth.adminbndy_table(spark), synth.mtd_area_table(spark))
    return out["relations"].select(
        "relation_id", "area_id", "admin_level",
        F.size("outer_way_ids").alias("n_outer"), F.size("inner_way_ids").alias("n_inner"),
    )


def _q_minhash_neardup(spark, sf_dir):
    """Full MinHash-LSH pipeline (k-min-aggregate signatures → banding →
    bucket join → exact-Jaccard verify), ORACLE-CHECKED: the SQL-replayable
    affine hash family + base-256 shingle ids let DuckDB recompute the
    identical signatures, candidate pairs, and Jaccard values."""
    from morituri_spark.text.dedup import (
        affine_hash_expr, affine_hash_params, minhash_near_duplicates,
        shingle_df_sql,
    )

    return minhash_near_duplicates(
        _read(spark, sf_dir, "documents"), threshold=0.5,
        hash_exprs=affine_hash_expr(affine_hash_params(64)),
        shingle_fn=shingle_df_sql,
    ).select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


def _q_near_dup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: the oracle-checked MinHash pair graph fed through
    distributed connected components (text/components.py large-star/
    small-star). The DuckDB oracle replays the same pairs and labels them
    with a recursive-CTE reachability min — a hash match proves the
    iterative DataFrame algorithm computes exact components."""
    from morituri_spark.text.components import connected_components
    from morituri_spark.text.dedup import (
        affine_hash_expr, affine_hash_params, minhash_near_duplicates,
        shingle_df_sql,
    )

    pairs = minhash_near_duplicates(
        _read(spark, sf_dir, "documents"), threshold=0.5,
        hash_exprs=affine_hash_expr(affine_hash_params(64)),
        shingle_fn=shingle_df_sql,
    ).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


def _q_dedup_representatives(spark, sf_dir):
    """The dedup END USE: drop every non-representative cluster member
    (keep the component minimum), return the surviving corpus profile per
    language. Composition of the oracled MinHash pairs + connected
    components + an anti-join."""
    from morituri_spark.text.components import connected_components
    from morituri_spark.text.dedup import (
        affine_hash_expr, affine_hash_params, minhash_near_duplicates,
        shingle_df_sql,
    )

    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, threshold=0.5,
        hash_exprs=affine_hash_expr(affine_hash_params(64)),
        shingle_fn=shingle_df_sql,
    ).select("doc_a", "doc_b")
    dropped = (
        connected_components(pairs, "doc_a", "doc_b")
        .where(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("doc_id"))
    )
    kept = docs.join(dropped, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _q_stratified_sample(spark, sf_dir):
    """Deterministic per-language hash sampling (text/sampling): membership
    = affine-hash(doc_id) under a per-stratum threshold — rerun-stable,
    partition-invariant, and exactly replayable in ANSI SQL."""
    from morituri_spark.text.sampling import stratified_sample

    docs = _read(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.2, "fr": 0.1}, key_col="doc_id"
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def _q_pagerank(spark, sf_dir):
    """Integer-exact PageRank (graph/pagerank.pagerank_exact): ranks are
    BIGINTs in units of scale/n, per-edge contributions are exact
    integer divisions, every reduction an exact integer sum — the SAME
    bits at any parallelism (tested), which is what makes a hash-exact
    recursive-CTE oracle possible where float PageRank cannot have one.
    Graph: 400 nodes from event_id % 400 with three closed-form edge
    families (affine, quadratic, +1 cycle — the cycle guarantees every
    node has in- AND out-degree, so the oracle's recursive term needs no
    dangling branch; the operator itself handles dangling mass, tested
    separately). 8 rounds, damping 85/100."""
    from morituri_spark.graph.pagerank import pagerank_exact

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 400).alias("i"))
        .distinct()
    )
    edges = (
        ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 400).alias("dst"))
        .unionAll(
            ids.select(
                F.col("i").alias("src"),
                ((F.col("i") * F.col("i") + 3) % 400).alias("dst"),
            )
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 400).alias("dst"))
        )
        .distinct()
    )
    return pagerank_exact(edges, iters=8).select(
        F.col("node").cast("long").alias("node"),
        F.col("rank").cast("long").alias("rank"),
    )


def _q_bfs_distances(spark, sf_dir):
    """Multi-source BFS (graph/bfs.multi_source_bfs): hop distance to the
    nearest of 4 seed nodes over the SAME closed-form 400-node graph
    pagerank_doc_quality uses, with the minimum-source-id witness (the
    greedy per-round min equals min-over-all-shortest-origins — proved in
    the module docstring). Each round is one frontier⋈edges equi-join +
    anti-join + min-agg; states localCheckpoint per round (rule 14) with
    superseded rounds released (rule 10). The oracle replays it as a
    recursive CTE over (node, dist, src) states."""
    from morituri_spark.graph.bfs import multi_source_bfs

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 400).alias("i"))
        .distinct()
    )
    edges = (
        ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 400).alias("dst"))
        .unionAll(
            ids.select(
                F.col("i").alias("src"),
                ((F.col("i") * F.col("i") + 3) % 400).alias("dst"),
            )
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 400).alias("dst"))
        )
        .distinct()
    )
    sources = ids.where("i % 100 = 0").select(F.col("i").alias("node"))
    return multi_source_bfs(edges, sources, max_hops=15)


def _q_sssp_costs(spark, sf_dir):
    """Weighted multi-source shortest paths (graph/sssp.shortest_paths):
    minimum integer edge-cost to the nearest of 4 seed nodes over the
    SAME closed-form 400-node graph bfs_hop_distances uses, weighted
    w = (src*3 + dst*5) % 13 + 1, with the min-source witness over the
    lexicographic (cost, src) semiring (struct-min relaxation — the
    weighted analogue of BFS's greedy-min proof). Each round is one
    state⋈edges equi-join + struct-min agg, both map-side combinable;
    integer costs keep the result engine-exact. The oracle replays it
    as a recursive CTE over (node, cost, src, hops) states with the
    measured bounds (optimal paths here: ≤13 hops, cost ≤56)."""
    from morituri_spark.graph.sssp import shortest_paths

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 400).alias("i"))
        .distinct()
    )
    edges = (
        ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 400).alias("dst"))
        .unionAll(
            ids.select(
                F.col("i").alias("src"),
                ((F.col("i") * F.col("i") + 3) % 400).alias("dst"),
            )
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 400).alias("dst"))
        )
        .distinct()
        .select(
            "src", "dst",
            ((F.col("src") * 3 + F.col("dst") * 5) % 13 + 1).alias("w"),
        )
    )
    sources = ids.where("i % 100 = 0").select(F.col("i").alias("node"))
    return shortest_paths(edges, sources, max_rounds=20).select(
        F.col("node").cast("long").alias("node"),
        F.col("cost").cast("long").alias("cost"),
        F.col("src").cast("long").alias("src"),
    )


def _q_triangle_counts(spark, sf_dir):
    """Per-node triangle counts (graph/triangles.triangle_counts,
    Latapy's compact-forward): degree-ordered edge orientation bounds
    the wedge fan-out by O(sqrt(m)) on any degree distribution, then
    two equi-joins (wedge + closure) count each triangle exactly once.
    Runs over the closed-form 400-node graph with a second ring edge
    (i, i+2) so every consecutive id triple closes a triangle (433
    triangles total). The oracle counts the same triangles with the
    canonical a<b<c three-way self-join."""
    from morituri_spark.graph.triangles import triangle_counts

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 400).alias("i"))
        .distinct()
    )
    edges = (
        ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 400).alias("dst"))
        .unionAll(
            ids.select(
                F.col("i").alias("src"),
                ((F.col("i") * F.col("i") + 3) % 400).alias("dst"),
            )
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 400).alias("dst"))
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 2) % 400).alias("dst"))
        )
    )
    return triangle_counts(edges).select(
        F.col("node").cast("long").alias("node"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


def _q_k_core(spark, sf_dir):
    """k-core decomposition (graph/kcore.k_core): iterative degree
    peeling to the fixed point — one map-side-combinable degree agg +
    two semi-joins per round, edge set localCheckpointed per round.
    The instance plants a dense community (ids < 40 with four extra
    chord rings) inside the closed-form 400-node graph: at k=7 peeling
    cascades for 8 rounds and exactly the 40 planted nodes survive.
    The oracle unrolls 10 peel stages (measured fixed point: 8)."""
    from morituri_spark.graph.kcore import k_core

    ids = (
        _read(spark, sf_dir, "events")
        .select((F.col("event_id") % 400).alias("i"))
        .distinct()
    )
    base = (
        ids.select(F.col("i").alias("src"), ((F.col("i") * 7 + 1) % 400).alias("dst"))
        .unionAll(
            ids.select(
                F.col("i").alias("src"),
                ((F.col("i") * F.col("i") + 3) % 400).alias("dst"),
            )
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 1) % 400).alias("dst"))
        )
        .unionAll(
            ids.select(F.col("i").alias("src"), ((F.col("i") + 2) % 400).alias("dst"))
        )
    )
    small = ids.where("i < 40")
    planted = None
    for j in (3, 5, 7, 11):
        ring = small.select(
            F.col("i").alias("src"), ((F.col("i") + j) % 40).alias("dst")
        )
        planted = ring if planted is None else planted.unionAll(ring)
    return k_core(base.unionAll(planted), k=7).select(
        F.col("node").cast("long").alias("node"),
        F.col("core_degree").cast("long").alias("core_degree"),
    )


def _viterbi_oracle_sql(n_steps: int = 8) -> str:
    """Unrolled Viterbi oracle (rule 27: every stage AS MATERIALIZED —
    each references its predecessor multiple times through the joins):
    forward stages v0..v{T-1} carry min cumulative cost per (track,
    state); backtrack stages b{T-1}..b0 re-derive the optimal path with
    the kernel's exact tie rule (final: min (cost, state); predecessor:
    min achieving state)."""
    parts = [
        """
        WITH ids AS MATERIALIZED (
            SELECT DISTINCT event_id % 400 AS v FROM events),
        cand AS MATERIALIZED (
            SELECT v % 50 AS k, v // 50 AS s, st.st AS st,
                   ((v % 50) * 7 + (v // 50) * 11 + st.st * 13) % 101 AS e
            FROM ids CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS st) st),
        tr AS MATERIALIZED (
            SELECT a.a AS sf, b.b AS st2,
                   (a.a * 31 + b.b * 17) % 59
                   + CASE WHEN a.a = b.b THEN 0 ELSE 23 END AS t
            FROM (SELECT unnest([0, 1, 2, 3]) AS a) a
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) b),
        v0 AS MATERIALIZED (
            SELECT k, st, e AS cost FROM cand WHERE s = 0)"""
    ]
    for t in range(1, n_steps):
        parts.append(f""",
        v{t} AS MATERIALIZED (
            SELECT c.k, c.st, min(p.cost + tr.t + c.e) AS cost
            FROM v{t - 1} p
            JOIN tr ON tr.sf = p.st
            JOIN cand c ON c.k = p.k AND c.s = {t} AND c.st = tr.st2
            GROUP BY c.k, c.st)""")
    last = n_steps - 1
    parts.append(f""",
        b{last} AS MATERIALIZED (
            SELECT k, st, cost FROM (
                SELECT k, st, cost, row_number() OVER (
                    PARTITION BY k ORDER BY cost, st) AS rn
                FROM v{last}) WHERE rn = 1)""")
    for t in range(last - 1, -1, -1):
        parts.append(f""",
        b{t} AS MATERIALIZED (
            SELECT k, st, cost FROM (
                SELECT p.k, p.st, p.cost, row_number() OVER (
                    PARTITION BY p.k ORDER BY p.st) AS rn
                FROM v{t} p
                JOIN b{t + 1} nb ON nb.k = p.k
                JOIN tr ON tr.sf = p.st AND tr.st2 = nb.st
                JOIN cand c ON c.k = p.k AND c.s = {t + 1} AND c.st = nb.st
                WHERE p.cost + tr.t = nb.cost - c.e) WHERE rn = 1)""")
    fwd = "\n            UNION ALL ".join(
        f"SELECT k, CAST({t} AS BIGINT) AS s, st, cost FROM v{t}"
        for t in range(n_steps)
    )
    bck = "\n            UNION ALL ".join(
        f"SELECT k, CAST({t} AS BIGINT) AS s, st FROM b{t}"
        for t in range(n_steps)
    )
    parts.append(f""",
        fwd AS ({fwd}),
        bck AS ({bck})
        SELECT fwd.k AS key, fwd.s AS step, CAST(fwd.st AS BIGINT) AS state,
               CAST(fwd.cost AS BIGINT) AS cost,
               (bck.st IS NOT NULL) AS on_path
        FROM fwd LEFT JOIN bck
          ON bck.k = fwd.k AND bck.s = fwd.s AND bck.st = fwd.st""")
    return "".join(parts)


#: Shared D8 oracle prefix (rule 27: reused stages AS MATERIALIZED). The
#: steepest-descent pick replays d8_flow_directions' exact rule: per
#: weight class the min (nz, k) neighbor via row_number, then the
#: cross-class compare on integer weighted drops with cardinal-wins-ties.
_HYDRO_PREFIX = """
    WITH RECURSIVE dem AS MATERIALIZED (
        SELECT i % 30 AS ix, i // 30 AS iy,
               (i % 30 - 15) * (i % 30 - 15)
               + (i // 30 - 15) * (i // 30 - 15)
               + ((i % 30) * 7 + (i // 30) * 13) % 11 AS z
        FROM (SELECT DISTINCT event_id % 900 AS i FROM events)),
    nb AS (
        SELECT c.ix, c.iy, c.z, n.z AS nz,
               n.ix - c.ix AS dx, n.iy - c.iy AS dy,
               CASE WHEN n.ix = c.ix OR n.iy = c.iy THEN 10 ELSE 7 END AS w,
               CASE WHEN n.ix - c.ix = 1 AND n.iy - c.iy = 0 THEN 0
                    WHEN n.ix - c.ix = 1 AND n.iy - c.iy = 1 THEN 1
                    WHEN n.ix - c.ix = 0 AND n.iy - c.iy = 1 THEN 2
                    WHEN n.ix - c.ix = -1 AND n.iy - c.iy = 1 THEN 3
                    WHEN n.ix - c.ix = -1 AND n.iy - c.iy = 0 THEN 4
                    WHEN n.ix - c.ix = -1 AND n.iy - c.iy = -1 THEN 5
                    WHEN n.ix - c.ix = 0 AND n.iy - c.iy = -1 THEN 6
                    ELSE 7 END AS k
        FROM dem c JOIN dem n
          ON n.ix BETWEEN c.ix - 1 AND c.ix + 1
         AND n.iy BETWEEN c.iy - 1 AND c.iy + 1
         AND NOT (n.ix = c.ix AND n.iy = c.iy)),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY ix, iy, w
                                     ORDER BY nz, k) AS rn
        FROM nb),
    pick AS (
        SELECT ix, iy, any_value(z) AS z,
               max(CASE WHEN w = 10 THEN nz END) AS cz,
               max(CASE WHEN w = 10 THEN dx END) AS cdx,
               max(CASE WHEN w = 10 THEN dy END) AS cdy,
               max(CASE WHEN w = 7 THEN nz END) AS dz,
               max(CASE WHEN w = 7 THEN dx END) AS ddx,
               max(CASE WHEN w = 7 THEN dy END) AS ddy
        FROM ranked WHERE rn = 1 GROUP BY 1, 2),
    d8 AS MATERIALIZED (
        SELECT ix, iy, z,
               CASE WHEN sink THEN NULL
                    ELSE ix + CASE WHEN pc THEN cdx ELSE ddx END END AS dn_ix,
               CASE WHEN sink THEN NULL
                    ELSE iy + CASE WHEN pc THEN cdy ELSE ddy END END AS dn_iy,
               CASE WHEN sink THEN NULL ELSE g END AS drop_w,
               sink AS is_sink
        FROM (SELECT *, (g IS NULL OR g <= 0) AS sink FROM (
              SELECT *, CASE WHEN pc THEN (z - cz) * 10
                             ELSE (z - dz) * 7 END AS g FROM (
                  SELECT *, (dz IS NULL OR (cz IS NOT NULL
                             AND (z - cz) * 10 >= (z - dz) * 7)) AS pc
                  FROM pick)))),
    flows AS MATERIALIZED (
        SELECT ix, iy, dn_ix, dn_iy FROM d8 WHERE NOT is_sink),
    paths(ix, iy, cx, cy) AS (
        SELECT ix, iy, dn_ix, dn_iy FROM flows
        UNION ALL
        SELECT p.ix, p.iy, f.dn_ix, f.dn_iy
        FROM paths p JOIN flows f ON f.ix = p.cx AND f.iy = p.cy)
"""


def _kcore_oracle_sql(k: int = 7, stages: int = 10) -> str:
    """Unrolled peel: degree → keep → filter edge set, ``stages`` times
    (the measured fixed point on this instance is 8 rounds)."""
    parts = [
        """
        WITH ids AS (
            SELECT DISTINCT event_id % 400 AS i FROM events),
        e0 AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM (
                SELECT i AS src, (i * 7 + 1) % 400 AS dst FROM ids
                UNION ALL SELECT i, (i * i + 3) % 400 FROM ids
                UNION ALL SELECT i, (i + 1) % 400 FROM ids
                UNION ALL SELECT i, (i + 2) % 400 FROM ids
                UNION ALL SELECT i, (i + 3) % 40 FROM ids WHERE i < 40
                UNION ALL SELECT i, (i + 5) % 40 FROM ids WHERE i < 40
                UNION ALL SELECT i, (i + 7) % 40 FROM ids WHERE i < 40
                UNION ALL SELECT i, (i + 11) % 40 FROM ids WHERE i < 40)
            WHERE src <> dst)"""
    ]
    for s in range(1, stages + 1):
        parts.append(f"""
        d{s} AS MATERIALIZED (
            SELECT node, count(*) AS deg FROM (
                SELECT a AS node FROM e{s - 1}
                UNION ALL SELECT b FROM e{s - 1})
            GROUP BY 1),
        e{s} AS MATERIALIZED (
            SELECT e.a, e.b FROM e{s - 1} e
            JOIN d{s} da ON da.node = e.a AND da.deg >= {k}
            JOIN d{s} db ON db.node = e.b AND db.deg >= {k})""")
    parts.append(f"""
        SELECT node, count(*) AS core_degree FROM (
            SELECT a AS node FROM e{stages}
            UNION ALL SELECT b FROM e{stages})
        GROUP BY 1 HAVING count(*) >= {k}""")
    return ",".join(parts[:1]) + "," + ",".join(parts[1:-1]) + parts[-1]


def _q_weighted_sample(spark, sf_dir):
    """Quality-weighted Bernoulli sampling (text/sampling.weighted_sample):
    inclusion probability proportional to a per-row weight (n_chars as
    the quality proxy, clamped at 4000) — the per-row-rate
    generalization of the fixed-rate hash samplers, same affine coin, so
    samples nest across rates and stay join-consistent. The oracle
    replays the identical frac→floor threshold expression."""
    from morituri_spark.text.sampling import weighted_sample

    docs = _read(spark, sf_dir, "documents")
    out = weighted_sample(
        docs, "doc_id", F.col("n_chars"), rate_at_max=0.6, max_weight=4000.0
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def _q_weighted_topk(spark, sf_dir):
    """Fixed-size per-stratum weighted sampling (text/sampling.
    weighted_topk_sample, Efraimidis-Spirakis A-Res): exactly k=20 docs
    per language, inclusion odds proportional to the clamped-n_chars
    quality weight. The deterministic uniform is the shared affine coin
    ((h+1)/2³¹ — exact binary scaling); the rank u^(1/w) is rule-16
    rounded BEFORE ranking with doc_id as the total tie-break, so the
    cross-engine pow() ulp cannot reorder the cut. The oracle replays
    rank and row_number exactly."""
    from morituri_spark.text.sampling import weighted_topk_sample

    docs = _read(spark, sf_dir, "documents")
    out = weighted_topk_sample(
        docs, "lang", "doc_id",
        F.least(F.col("n_chars").cast("double"), F.lit(4000.0)) / F.lit(4000.0),
        k=20,
    )
    return out.select("lang", "doc_id", "n_chars", "rank_key", "rk")


def _q_pack_sequences(spark, sf_dir):
    """Greedy token-budget packing per language (text/packing Arrow
    kernel — running fill with reset, inexpressible as a window). The
    oracle replays the same sequential semantics with a linear recursive
    CTE."""
    from morituri_spark.text.packing import pack_greedy

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    packed = pack_greedy(docs, "n_chars", budget=2000, part_col="lang", order_col="doc_id")
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("pack_chars"),
    )


def _q_pii_redaction(spark, sf_dir):
    """PII scrub (text/quality.redact_pii, chained regexp_replace in pure
    Catalyst) over documents salted with deterministic synthetic PII. The
    oracle replays the same RE2/Java-portable patterns in DuckDB (with the
    'g' flag — DuckDB replaces first-match-only by default); md5 of the
    redacted text makes the compare byte-strict."""
    from morituri_spark.text.quality import pii_counts, redact_pii

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 50),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 (415) 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    counts = pii_counts("text")
    return docs.select(
        "doc_id",
        F.md5(redact_pii("text")).alias("redacted_md5"),
        *[c.alias(n) for n, c in counts.items()],
    )


def _q_repetition_ratios(spark, sf_dir):
    """Gopher-style repetition quality gates (text/quality.repetition_stats):
    duplicate-line, duplicate-3-gram and top-2-gram fractions per document —
    explode + two-stage agg, DuckDB replays via regexp_split + unnest."""
    from morituri_spark.text.quality import repetition_stats

    return repetition_stats(_read(spark, sf_dir, "documents"))


def _q_lm_perplexity(spark, sf_dir):
    """Bigram LM perplexity scoring (text/lm.lm_nll_scores): add-one-
    smoothed bigram NLL per document, self-trained on the corpus —
    the KenLM-style quality filter. Per-bigram ln-probabilities are
    quantized to exact integer micro-nats before summing (the BM25
    micro-unit scheme), so the per-doc sums and the high-perplexity
    integer gate are bit-identical in Spark and the DuckDB replay."""
    from morituri_spark.text.lm import lm_nll_scores

    return lm_nll_scores(_read(spark, sf_dir, "documents"))


def _q_simhash_neardup(spark, sf_dir):
    """SimHash near-dup (Arrow bit-vote kernel → 4×16-bit block join →
    Hamming verify), ORACLE-CHECKED via the 62-bit SQL-replayable token
    hash family (token_hashes_sql)."""
    from morituri_spark.text.dedup import simhash_near_duplicates, token_hashes_sql

    return simhash_near_duplicates(
        _read(spark, sf_dir, "documents"), max_hamming=6,
        token_hashes_col=token_hashes_sql(),
    )


def _q_langid(spark, sf_dir):
    from morituri_spark.text.quality import predict_language

    return predict_language(_read(spark, sf_dir, "documents")).select(
        "doc_id", "pred_lang", F.round("pred_score", 6).alias("pred_score")
    )


def _langid_oracle_sql() -> str:
    """SQL mirror of the stopword-ratio argmax; tie-break = lexicographically
    greatest language code (Spark's array_max over (score, lang) structs),
    so the CASE tests languages in descending code order."""
    from morituri_spark.text.quality import STOPWORDS

    score_cols = []
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(toks, x -> x IN ({lst}))) * 1.0"
            f" / greatest(len(toks), 1) AS s_{lang}"
        )
    langs_desc = sorted(STOPWORDS, reverse=True)
    g = "greatest(" + ", ".join(f"s_{l}" for l in STOPWORDS) + ")"
    case = "CASE WHEN " + g + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {g} THEN '{l}'" for l in langs_desc
    ) + " END"
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text),
                     '[^a-zA-Zà-ÿÀ-ß'']+'), x -> x <> '') AS toks
          FROM documents),
        s AS (SELECT doc_id, {', '.join(score_cols)} FROM t)
        SELECT doc_id, {case} AS pred_lang, round({g}, 6) AS pred_score FROM s
    """


def _q_fingerprint(spark, sf_dir):
    """Winnowing fingerprint (Arrow rolling-hash kernel), ORACLE-CHECKED in
    the SQL-replayable field (base 131 mod 2³¹-1; ASCII text ⇒ utf-8 bytes
    = code points, so DuckDB recomputes the identical windows/min/xor)."""
    from morituri_spark.text.dedup import MERSENNE31
    from morituri_spark.text.quality import fingerprint

    return fingerprint(
        _read(spark, sf_dir, "documents"), window=16, base=131, mod=MERSENNE31
    )


def _ann_inputs(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding").where("query_id < 20")
    return q, emb


def _q_ann_lsh(spark, sf_dir):
    """LSH ANN (sign-bucket equi-join → exact cosine → windowed top-k),
    ORACLE-CHECKED: ±1 Rademacher planes are embedded as literals in the
    DuckDB oracle, which replays bucket assignment and ranking."""
    from morituri_spark.ml.simsearch import ann_topk_lsh, rademacher_planes

    q, emb = _ann_inputs(spark, sf_dir)
    return ann_topk_lsh(
        q, emb, dim=64, k=3, n_bits=8, planes=rademacher_planes(64, 8)
    )


def _q_payload_fidelity(spark, sf_dir):
    """Per-row image invariants (BASELINE.json): decoded pixels vs source
    (PSNR; inf for lossless, >= 40dB for lossy), caption byte-equality,
    phash match — as a DataFrame so the driver sees the gate itself."""
    import numpy as np
    import pandas as pd

    from morituri_spark.sources import images as I
    from morituri_spark.sources import synth

    images = synth.images_table(spark, 300, partitions=4, px=8)

    def check(batches):
        for pdf in batches:
            rows = {"image_id": [], "psnr_ok": [], "caption_ok": [], "phash_ok": []}
            # zip of columns, not iterrows (no per-row Series construction)
            for image_id, buf, fmt, caption, phash, lon, lat in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"],
                pdf["phash"], pdf["lon"], pdf["lat"],
            ):
                i = int(image_id[3:])
                rng = np.random.default_rng(synth.SEED + i)
                src = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                dec = I.decode(bytes(buf), fmt)
                psnr = I.psnr(src, dec)
                rows["image_id"].append(image_id)
                rows["psnr_ok"].append(bool(psnr >= 40.0))
                rows["caption_ok"].append(
                    caption == f"photo {i} near ({lon:.3f},{lat:.3f})"
                )
                rows["phash_ok"].append(int(phash) == I.phash(src))
            yield pd.DataFrame(rows)

    out = images.mapInPandas(
        check, "image_id string, psnr_ok boolean, caption_ok boolean, phash_ok boolean"
    )
    return out.where("NOT (psnr_ok AND caption_ok AND phash_ok)")


_STREAM_RUNS = [0]


def _q_streaming_rollup(spark, sf_dir):
    """§2.8 Structured Streaming: stream the derived point cloud from a
    parquet dir (availableNow trigger), run the stateless codegen PIP +
    watermarked hourly window rollup, drain to a memory sink, return the
    result. 60-minute windows align to epoch hours, so the oracle is a
    plain date_trunc aggregation."""
    import tempfile

    from morituri_spark.streaming.pipeline import (
        run_available_now, stream_images, streaming_tile_rollup,
    )

    ev = _read(spark, sf_dir, "events").where("event_id % 5 = 0")
    src = ev.select(
        "event_id",
        # watermarks need TIMESTAMP (LTZ); parquet ts is NTZ (session is UTC,
        # so values are unchanged by the cast)
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr(_LON).alias("lon"),
        F.expr(_LAT).alias("lat"),
    )
    d = tempfile.mkdtemp(prefix="stream_src_")
    src.write.mode("overwrite").parquet(d)
    stream = stream_images(spark, d, src.schema)
    zone_rows = [(r["zone_id"], r["rings"]) for r in _rect_zones(spark).collect()]
    rollup = streaming_tile_rollup(
        stream, zone_rows, tile_res=6, watermark="1 minute",
        window="60 minutes", ts_col="ts",
    )
    _STREAM_RUNS[0] += 1
    name = f"drv_stream_rollup_{_STREAM_RUNS[0]}"
    q = run_available_now(rollup, query_name=name)
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"),
        "tile", "zone_id", "n_images",
    )


def _q_streaming_first_seen(spark, sf_dir):
    """§2.8 CUSTOM STATEFUL streaming operator (applyInPandasWithState):
    first-seen dedup over a re-keyed events stream (key = event_id % 500 →
    ~20 re-deliveries per key at sf0.01). The source is ONE file → one
    availableNow micro-batch, so the first-seen timestamp is the global
    min and the oracle is a plain min/count aggregation."""
    import tempfile

    from morituri_spark.streaming.pipeline import stream_images
    from morituri_spark.streaming.stateful import streaming_first_seen

    ev = _read(spark, sf_dir, "events").select(
        (F.col("event_id") % 500).alias("key"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="first_seen_src_")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    stream = stream_images(spark, d, ev.schema, max_files_per_trigger=64)
    out = streaming_first_seen(stream, key_col="key", ts_col="ts")
    _STREAM_RUNS[0] += 1
    name = f"drv_first_seen_{_STREAM_RUNS[0]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "key",
        F.col("first_ts").cast("timestamp_ntz").alias("first_ts"),
        "n_first",
    )


def _q_streaming_dedup(spark, sf_dir):
    """§2.8 streaming EXACT dedup (streaming/stateful.streaming_dedup):
    the streaming face of dedup_exact — each content hash emits once with
    the introducing batch's lowest doc_id. A salted duplicate table (every
    doc_id % 7 == 0 re-delivered with a shifted id) over ONE file → one
    availableNow micro-batch, so the oracle is plain md5/min/count SQL."""
    import tempfile

    from morituri_spark.streaming.pipeline import stream_images
    from morituri_spark.streaming.stateful import streaming_dedup

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.where("doc_id % 7 = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    src = docs.unionByName(dup)
    d = tempfile.mkdtemp(prefix="sdedup_src_")
    src.coalesce(1).write.mode("overwrite").parquet(d)
    stream = stream_images(spark, d, src.schema, max_files_per_trigger=64)
    out = streaming_dedup(stream, content_col="text", id_col="doc_id")
    _STREAM_RUNS[0] += 1
    name = f"drv_sdedup_{_STREAM_RUNS[0]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name).select("content_hash", "doc_id", "n_dropped")


def _q_wkb_roundtrip(spark, sf_dir):
    """G1 WKB bridge gate: zones → MultiPolygon WKB → rings; rows where the
    ring set does not survive the round-trip (expect 0)."""
    from morituri_spark.geo import wkb as W
    from morituri_spark.sources import synth

    zones = synth.zones_table(spark)
    back = zones.select(
        "zone_id",
        "rings",
        W.wkb_to_rings_udf(W.multipolygon_to_wkb_udf("rings")).alias("rings2"),
    )
    mismatch = F.expr(
        "array_sort(transform(rings, r -> xxhash64(r)))"
        " != array_sort(transform(rings2, r -> xxhash64(r)))"
    )
    return back.where(mismatch).select("zone_id")


def _q_ann_ivf(spark, sf_dir):
    """IVF ANN (inverted-list assignment → probe join → exact cosine →
    windowed top-k), ORACLE-CHECKED with a deterministic fixed coarse
    quantizer whose centroids the DuckDB oracle carries as literals (the
    k-means-trained quantizer stays the data-adaptive path, pytest-pinned)."""
    from morituri_spark.ml.simsearch import ann_topk_ivf, fixed_centroids

    q, emb = _ann_inputs(spark, sf_dir)
    return ann_topk_ivf(
        q, emb, k=3, n_lists=16, n_probe=2, centroids=fixed_centroids(16, 64)
    )


def _q_ann_ivf_indexed(spark, sf_dir):
    """IVF ANN over the PERSISTED list-partitioned index (ml.simsearch
    build_ivf_index → partition-pruned probe scan). Same fixed quantizer
    and parameters as ann_ivf_topk, so it shares that oracle — a hash match
    proves the layout changes the scan, not the answer."""
    import os

    from morituri_spark.ml.simsearch import (
        ann_topk_ivf_indexed, build_ivf_index, fixed_centroids,
    )

    q, emb = _ann_inputs(spark, sf_dir)
    path = f"/tmp/morituri_ivf_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
    build_ivf_index(emb, path, n_lists=16, centroids=fixed_centroids(16, 64))
    return ann_topk_ivf_indexed(spark, path, q, k=3, n_probe=2)


def _q_embedding_near_dup_lsh(spark, sf_dir):
    """The SCALE path of embedding near-dup (LSH sign-bucket prefilter →
    exact cosine verify), oracle-checked with literal Rademacher planes:
    DuckDB replays the bucket assignment and the pair verify. The exact
    all-pairs form is oracled separately (embedding_near_dup)."""
    from morituri_spark.ml.simsearch import rademacher_planes, with_lsh_bucket

    emb = _read(spark, sf_dir, "embeddings")
    ab = with_lsh_bucket(
        emb.select("vec_id", "embedding"), dim=64, n_bits=8,
        planes=rademacher_planes(64, 8),
    )
    a = ab.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_va"), "bucket")
    b = ab.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_vb"), "bucket")
    paired = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(F.col("_va"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(F.col("_vb"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return (
        paired.withColumn("cosine", F.round(dot / (na * nb), 6))
        .where(F.col("cosine") >= 0.3)
        .select("vec_a", "vec_b", "cosine")
        .distinct()
    )


def _embedding_lsh_oracle_sql() -> str:
    from morituri_spark.ml.simsearch import rademacher_planes

    H = rademacher_planes(64, 8)
    bucket = " + ".join(
        f"(CASE WHEN list_inner_product(v, {_sql_arr(H[i])}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (SELECT vec_id, v, {bucket} AS bucket FROM e)
        SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b,
               round(CAST(list_cosine_similarity(a.v, b2.v) AS DOUBLE), 6) AS cosine
        FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        WHERE round(CAST(list_cosine_similarity(a.v, b2.v) AS DOUBLE), 6) >= 0.3
    """


def _q_ann_recall(spark, sf_dir):
    """Recall gate for BOTH approximate ANN paths vs the exact top-k on the
    same inputs: per (method, query) recall@3; emits the queries whose
    recall falls below the pinned floor of 1/3 — the structural guarantee
    that an ANN path always recovers an exact-match query (self lands in
    its own bucket/list at cosine 1.0). Measured recall at sf0.01 is
    LSH mean 0.37 / IVF-2probe mean 0.47 on these near-random embeddings.
    Expected output: EMPTY (the closed-form oracle). The filter compares
    UNROUNDED recall (1/3 rounds to 0.3333 < 1/3)."""
    from morituri_spark.ml.simsearch import (
        ann_topk_ivf, ann_topk_lsh, fixed_centroids, knn_join_bruteforce,
        rademacher_planes,
    )

    q, emb = _ann_inputs(spark, sf_dir)
    exact = knn_join_bruteforce(q, emb, k=3).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    floors = {"lsh": 1.0 / 3.0, "ivf": 1.0 / 3.0}
    approx = {
        "lsh": ann_topk_lsh(q, emb, dim=64, k=3, n_bits=8, planes=rademacher_planes(64, 8)),
        "ivf": ann_topk_ivf(q, emb, k=3, n_lists=16, n_probe=2, centroids=fixed_centroids(16, 64)),
    }
    out = None
    for method, df in approx.items():
        hits = (
            exact.join(
                df.select("query_id", "vec_id"),
                (exact["query_id"] == df["query_id"]) & (exact["exact_id"] == df["vec_id"]),
                "left",
            )
            .groupBy(exact["query_id"].alias("query_id"))
            .agg((F.count(df["vec_id"]) / F.lit(3.0)).alias("recall"))
            .where(F.col("recall") < F.lit(floors[method]) - 1e-9)
            .select(
                F.lit(method).alias("method"),
                "query_id",
                F.round("recall", 4).alias("recall"),
            )
        )
        out = hits if out is None else out.unionByName(hits)
    return out


def _q_audio_features(spark, sf_dir):
    """Real WAV/PCM16 path (multimodal/audio.py), now ORACLE-CHECKED: the
    PCM samples are a closed-form waveform ``floor(sin(((2π)·f)·t/rate)·
    13106.8)`` that DuckDB recomputes symbolically, so the oracle derives
    rms/peak/zero-crossings straight from the sample formula while the
    query goes through encode_wav → decode_wav → the Arrow feature kernel.
    A feature mismatch means the codec or kernel broke."""
    from morituri_spark.multimodal import audio as A

    return A.audio_features(_audio_clips_df(spark))


def _rect_zones_lvl(spark: SparkSession) -> DataFrame:
    """The 4×4 rect grid with an admin_lvl column (for pipelines that join
    zone attributes)."""
    return _rect_zones(spark).withColumn("admin_lvl", F.lit(3).cast("int"))


def _constant_images(spark, sf_dir, n: int = 500) -> DataFrame:
    """Deterministic REAL-payload image table whose decoded pixel stats are
    closed-form: image i is a constant-color 8×8 PNG with channels
    (i%256, 3i%256, 7i%256) at the events-derived (lon, lat). The payload
    goes through the real PNG encoder here and the real decoder inside
    image_features — but mean_r/g/b, std_gray (0) and phash (0 for a
    constant image) are SQL arithmetic, so DuckDB can oracle the zonal
    rollup end-to-end."""
    import numpy as np
    import pandas as pd

    from morituri_spark.sources import images as I

    ev = _read(spark, sf_dir, "events").where(f"event_id < {n}")
    base = ev.select(
        F.col("event_id").alias("i"),
        # decorrelated from _LAT so the points spread across the whole
        # 4×4 zone grid (the user_id-based _LON covers only 2 columns of
        # the grid at small sf)
        F.expr(_IMG_LON).alias("lon"),
        F.expr(_LAT).alias("lat"),
    )

    def gen(batches):
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": [],
                    "lon": [], "lat": []}
            for i, lon, lat in zip(pdf["i"], pdf["lon"], pdf["lat"]):
                i = int(i)
                r, g = i % 256, (i * 3) % 256
                # blue adjusted so r+g+b ≡ 0 (mod 3): the gray value
                # (r+g+b)/3 is then an exact small integer, which pins
                # phash of a constant image to exactly 0 (blocks > mean is
                # False everywhere) — no float-representability edge
                b = (i * 7) % 256 - ((r + g + (i * 7) % 256) % 3)
                if b < 0:
                    b += 3
                arr = np.empty((8, 8, 3), dtype=np.uint8)
                arr[:, :, 0] = r
                arr[:, :, 1] = g
                arr[:, :, 2] = b
                rows["image_id"].append(f"img{i:08d}")
                rows["bytes"].append(I.encode(arr, "png"))
                rows["fmt"].append("png")
                rows["w"].append(8)
                rows["h"].append(8)
                rows["lon"].append(float(lon))
                rows["lat"].append(float(lat))
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "image_id string, bytes binary, fmt string, w int, h int, "
        "lon double, lat double",
    )


def _gradient_images(spark, sf_dir, n: int = 500, w: int = 16, h: int = 16) -> DataFrame:
    """Deterministic REAL-payload image table whose PIXELS (not just
    stats) are closed-form: image i has channel values
    r=(i+2y+3x)%256, g=(2i+y+5x)%256, b=(3i+4y+x)%256 at pixel (y,x) —
    spatially varying, so per-patch sums and the position-weighted
    checksum pin patch indexing/orientation. Payloads go through the real
    PNG encoder here and the real decoder inside extract_patches."""
    import numpy as np
    import pandas as pd

    from morituri_spark.sources import images as I

    ev = _read(spark, sf_dir, "events").where(f"event_id < {n}")
    base = ev.select(F.col("event_id").alias("i"))

    def gen(batches):
        ys, xs = np.mgrid[0:h, 0:w]
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            for i in pdf["i"]:
                i = int(i)
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[:, :, 0] = (i + 2 * ys + 3 * xs) % 256
                arr[:, :, 1] = (2 * i + ys + 5 * xs) % 256
                arr[:, :, 2] = (3 * i + 4 * ys + xs) % 256
                rows["image_id"].append(f"img{i:08d}")
                rows["bytes"].append(I.encode(arr, "png"))
                rows["fmt"].append("png")
                rows["w"].append(w)
                rows["h"].append(h)
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen, "image_id string, bytes binary, fmt string, w int, h int"
    )


def _q_extract_patches(spark, sf_dir):
    """ViT-style patch tokenization (multimodal/ops.extract_patches) over
    real PNG payloads: 16×16 gradient images → 8×8 patch grid rows with
    exact integer channel sums + position-weighted checksum (layout-
    sensitive: a transposed or mis-offset patch flips it) and mean_gray
    as ONE IEEE division of an exact integer sum. The oracle re-derives
    every pixel from the gradient closed form and aggregates per patch —
    decode → slice → tokenize checked end-to-end, not just stats."""
    from morituri_spark.multimodal.ops import extract_patches

    return extract_patches(_gradient_images(spark, sf_dir), patch=8).drop(
        "patch_bytes"
    )


def _q_image_quality(spark, sf_dir):
    """Image capture-quality gates (multimodal/ops.image_quality): blur
    (gradient energy) + exposure clipping over REAL PNG payloads — the
    image-side siblings of the Gopher text gates. All reductions are
    exact integers in 3× fixed-point gray (so r≠g≠b thirds stay exact);
    both booleans are exact integer comparisons; sharpness/clip_frac are
    shared double expressions rule-16 rounded. The oracle re-derives
    every pixel from the gradient closed form (the vit_patch_tokens
    fixture) and replays the identical sums."""
    from morituri_spark.multimodal.ops import image_quality

    return image_quality(
        _gradient_images(spark, sf_dir), blur_thr_milli=5000, max_clip_pct=0
    )


def _q_color_hist_dups(spark, sf_dir):
    """Exact RGB color-histogram near-duplicate pairs (multimodal/ops.
    color_histograms + histogram_near_duplicates) over REAL PNG payloads:
    the color-space sibling of phash_near_dup (structure) and
    image_quality_gates (exposure). 400 gradient images → the (i, i+256)
    pairs are pixel-identical (channels are mod-256 in i), planting 144
    exact duplicates at l1 = 0 among the near pairs. Blocking is the
    dominant-bin bucket join (min(struct(-cnt, bin)) — one map-side-
    combinable aggregate, rule 25); the L1 needs no full-outer bin join
    because counts are non-negative and blocked pairs always share the
    dominant bin: L1 = Σ_shared|ca−cb| + (total−Σca) + (total−Σcb). The
    oracle re-derives every pixel from the gradient closed form and
    replays histogram → dominant bin → bucket pairs → L1 literally."""
    from morituri_spark.multimodal.ops import (
        color_histograms,
        histogram_near_duplicates,
    )

    hists = color_histograms(
        _gradient_images(spark, sf_dir, n=400), bins_per_channel=4
    )
    return histogram_near_duplicates(hists, max_l1=64, total=256)


def _q_augment(spark, sf_dir):
    """Deterministic augmentation sweep (multimodal/ops.augment_images):
    every gradient image crossed with the six exact pixel permutations
    (flips + quarter rotations), re-encoded through the REAL PNG codec,
    with the position-weighted checksum computed from the RE-DECODED
    payload — one integer per (image, op) pins decode → transform →
    encode → decode AND the orientation of the transform. The oracle
    replays the checksum by substituting source coordinates into the
    gradient closed form per op (rot90 is CCW: target[y,x] =
    source[x, W−1−y])."""
    from morituri_spark.multimodal.ops import augment_images

    return augment_images(_gradient_images(spark, sf_dir, n=300)).drop("png")


def _q_jpeg_progressive_roundtrip(spark, sf_dir):
    """PROGRESSIVE JPEG (r5, verdict #4) end-to-end: the same constant-color
    images as jpeg_constant_roundtrip, but encoded with
    jpeg_encode_progressive (SOF2 — spectral-selection + successive-
    approximation scans, DC Al=1 → AC bands → refinements) and decoded by
    the multi-scan decoder inside image_features' Arrow kernel. The
    progressive encoder shares the baseline's quantization pipeline, so the
    decoded values land on the SAME closed-form chain — this query shares
    jpeg_constant_roundtrip's DuckDB oracle, and a hash match proves the
    scan script changes the stream, not the answer."""
    return _q_jpeg_roundtrip(spark, sf_dir, progressive=True)


def _q_jpeg_roundtrip(spark, sf_dir, n: int = 200, progressive: bool = False):
    """REAL baseline-JPEG codec end-to-end (sources/jpeg.py, r4 — closes
    the r3 'largest honest stub'): constant-color 8×8 images encoded with
    the pure-NumPy T.81 encoder, decoded inside image_features' Arrow
    kernel. A constant block is DC-only, so the decoded color is the pure
    arithmetic chain RGB→YCbCr→quantize(DC)→dequantize→+128→RGB with the
    codec's shared floor(x+0.5+1e-8) rounding — which the DuckDB oracle
    replays literally (quality 85 ⇒ q0_lum = q0_chroma = 5). std_gray = 0
    pins uniformity; mean_r/g/b pin the decode values. phash is excluded:
    for a constant image its bits flip on ±1-ulp float dust (block mean
    vs np.mean of 64 identical values), which no SQL oracle can replay —
    the PNG fixture (zonal_image_stats) pins phash instead."""
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal.ops import image_features
    from morituri_spark.sources import jpeg as J

    ev = _read(spark, sf_dir, "events").where(f"event_id < {n}")
    base = ev.select(F.col("event_id").alias("i"))

    enc = J.jpeg_encode_progressive if progressive else J.jpeg_encode

    def gen(batches):
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            for i in pdf["i"]:
                i = int(i)
                r, g, b = i % 256, (i * 3) % 256, (i * 7) % 256
                arr = np.empty((8, 8, 3), dtype=np.uint8)
                arr[:, :, 0], arr[:, :, 1], arr[:, :, 2] = r, g, b
                rows["image_id"].append(f"jimg{i:08d}")
                rows["bytes"].append(enc(arr, 85))
                rows["fmt"].append("jpeg")
                rows["w"].append(8)
                rows["h"].append(8)
            yield pd.DataFrame(rows)

    imgs = base.mapInPandas(
        gen, "image_id string, bytes binary, fmt string, w int, h int"
    )
    return image_features(imgs).select(
        "image_id",
        "mean_r",
        "mean_g",
        "mean_b",
        # non-integer grays ((r+g+b)/3) leave ~1e-15 dust in np.std; round
        # to 9 dp so 'uniform ⇒ 0' survives the raw string compare
        F.round("std_gray", 9).alias("std_gray"),
    )


def _jpeg_roundtrip_oracle_sql() -> str:
    # floor(x + 0.5 + 1e-8) == the codec's _round_half_up; every literal
    # cast to DOUBLE (rule 5). quality 85: s = 200-170 = 30;
    # q0 = (16*30+50)//100 = 5 (lum), (17*30+50)//100 = 5 (chroma).
    rhu = "floor({x} + CAST(0.5 AS DOUBLE) + CAST(1e-8 AS DOUBLE))"
    clip = "least(greatest({x}, CAST(0 AS DOUBLE)), CAST(255 AS DOUBLE))"

    def rc(x):
        return clip.format(x=rhu.format(x=x))

    return f"""
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 200),
        rgb AS (
          SELECT i,
                 CAST(i % 256 AS DOUBLE) AS r,
                 CAST((i * 3) % 256 AS DOUBLE) AS g,
                 CAST((i * 7) % 256 AS DOUBLE) AS b
          FROM ids),
        ycc AS (
          SELECT i,
            {rc(x="CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g + CAST(0.114 AS DOUBLE) * b")} AS y,
            {rc(x="CAST(128 AS DOUBLE) - CAST(0.168735892 AS DOUBLE) * r - CAST(0.331264108 AS DOUBLE) * g + CAST(0.5 AS DOUBLE) * b")} AS cb,
            {rc(x="CAST(128 AS DOUBLE) + CAST(0.5 AS DOUBLE) * r - CAST(0.418687589 AS DOUBLE) * g - CAST(0.081312411 AS DOUBLE) * b")} AS cr
          FROM rgb),
        rec AS (
          SELECT i,
            {rc(x=rhu.format(x="CAST(8 AS DOUBLE) * (y - CAST(128 AS DOUBLE)) / CAST(5 AS DOUBLE)") + " * CAST(5 AS DOUBLE) / CAST(8 AS DOUBLE) + CAST(128 AS DOUBLE)")} AS ry,
            {rc(x=rhu.format(x="CAST(8 AS DOUBLE) * (cb - CAST(128 AS DOUBLE)) / CAST(5 AS DOUBLE)") + " * CAST(5 AS DOUBLE) / CAST(8 AS DOUBLE) + CAST(128 AS DOUBLE)")} AS rcb,
            {rc(x=rhu.format(x="CAST(8 AS DOUBLE) * (cr - CAST(128 AS DOUBLE)) / CAST(5 AS DOUBLE)") + " * CAST(5 AS DOUBLE) / CAST(8 AS DOUBLE) + CAST(128 AS DOUBLE)")} AS rcr
          FROM ycc)
        SELECT printf('jimg%08d', i) AS image_id,
          {rc(x="ry + CAST(1.402 AS DOUBLE) * (rcr - CAST(128 AS DOUBLE))")} AS mean_r,
          {rc(x="ry - CAST(0.344136286 AS DOUBLE) * (rcb - CAST(128 AS DOUBLE)) - CAST(0.714136286 AS DOUBLE) * (rcr - CAST(128 AS DOUBLE))")} AS mean_g,
          {rc(x="ry + CAST(1.772 AS DOUBLE) * (rcb - CAST(128 AS DOUBLE))")} AS mean_b,
          CAST(0 AS DOUBLE) AS std_gray
        FROM rec
    """


def _audio_clips_df(spark):
    """The shared closed-form WAV clip table (see _q_audio_features)."""
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal import audio as A

    rate, n = 16_000, 4_000
    t = np.arange(n, dtype=np.float64)
    rows = []
    for i in range(50):
        freq = 200.0 + 10.0 * i
        s = np.floor(np.sin(((2 * np.pi) * freq) * t / rate) * 13106.8).astype(np.int16)
        rows.append((f"clip{i:04d}", bytes(A.encode_wav(s, rate))))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))


def _audio_gated_clips_df(spark):
    """Closed-form WAV clips with muted 50ms windows: window w of clip i
    is digital silence when (w + i) % 5 < 2 — adjacent mutes produce
    multi-frame islands for silence_segments."""
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal import audio as A

    rate, win, n_win = 16_000, 800, 10
    t = np.arange(win * n_win, dtype=np.float64)
    rows = []
    for i in range(50):
        freq = 200.0 + 10.0 * i
        s = np.floor(np.sin(((2 * np.pi) * freq) * t / rate) * 13106.8)
        gate = ((t // win).astype(np.int64) + i) % 5 >= 2
        rows.append((f"clip{i:04d}", bytes(A.encode_wav((s * gate).astype(np.int16), rate))))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))


def _q_silence_segments(spark, sf_dir):
    """Audio silence-segment detection (multimodal/audio.silence_segments):
    REAL WAV decode → 50ms frame RMS (Arrow kernel) → gaps-and-islands
    interval union (operators/intervals.py). The gated synth mutes
    windows (w + i) % 5 < 2, so every clip has adjacent silent frames
    that must merge; the oracle replays the decode symbolically (the
    audio_frames sample replay) and the same island windows."""
    from morituri_spark.multimodal import audio as A

    return A.silence_segments(_audio_gated_clips_df(spark), frame_ms=50)


def _silence_oracle_sql() -> str:
    return """
        WITH clips AS (SELECT CAST(unnest(range(0, 50)) AS BIGINT) AS i),
        s AS (
          SELECT i, CAST(t AS BIGINT) AS t,
                 CAST(floor(sin(((2 * pi()) * (200.0 + 10.0 * CAST(i AS DOUBLE)))
                      * CAST(t AS DOUBLE) / 16000.0) * 13106.8) AS BIGINT)
                 * CASE WHEN (t // 800 + i) % 5 >= 2 THEN 1 ELSE 0 END AS v
          FROM clips, LATERAL (SELECT unnest(range(0, 8000)) AS t) ts),
        f AS (
          SELECT i, t // 800 AS w,
                 sqrt(avg((v / 32768.0) * (v / 32768.0))) AS rms
          FROM s GROUP BY 1, 2),
        silent AS (
          SELECT printf('clip%04d', i) AS audio_id,
                 w * 50 AS s, w * 50 + 50 AS e
          FROM f WHERE rms <= 0.0),
        staged AS (
          SELECT audio_id, s, e,
                 max(e) OVER (PARTITION BY audio_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pme
          FROM silent),
        flagged AS (
          SELECT audio_id, s, e,
                 CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk
          FROM staged),
        islands AS (
          SELECT audio_id, s, e,
                 sum(brk) OVER (PARTITION BY audio_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
          FROM flagged)
        SELECT audio_id, CAST(island AS BIGINT) AS island,
               CAST(min(s) AS BIGINT) AS silence_start_ms,
               CAST(max(e) AS BIGINT) AS silence_end_ms,
               count(*) AS n_frames
        FROM islands GROUP BY 1, 2
    """


def _q_audio_frames(spark, sf_dir):
    """Fixed-window audio frame sampling (the video-frame-sampling analog):
    50ms windows over the closed-form clips → per-frame RMS, oracle-checked
    the same way as audio_features (DuckDB groups the symbolic samples by
    t // 800)."""
    from morituri_spark.multimodal import audio as A

    return A.sample_audio_frames(_audio_clips_df(spark), frame_ms=50)


def _audio_frames_oracle_sql() -> str:
    return """
        WITH clips AS (SELECT CAST(unnest(range(0, 50)) AS BIGINT) AS i),
        s AS (
          SELECT i, CAST(t AS BIGINT) AS t,
                 CAST(floor(sin(((2 * pi()) * (200.0 + 10.0 * CAST(i AS DOUBLE)))
                      * CAST(t AS DOUBLE) / 16000.0) * 13106.8) AS BIGINT) AS v
          FROM clips, LATERAL (SELECT unnest(range(0, 4000)) AS t) ts),
        f AS (
          SELECT i, t // 800 AS frame_seq,
                 sqrt(avg((v / 32768.0) * (v / 32768.0))) AS rms
          FROM s GROUP BY 1, 2)
        SELECT printf('clip%04d', i) AS audio_id,
               CAST(frame_seq AS INT) AS frame_seq,
               CAST(frame_seq * 50 AS BIGINT) AS start_ms,
               round(rms, 9) AS rms
        FROM f
    """


def _q_zonal_stats(spark, sf_dir):
    """Raster-feature × vector-zone zonal statistics (payload decode +
    spatial join + per-zone aggregation), oracle-checked via the
    constant-color image table (_constant_images)."""
    from morituri_spark.pipelines.zonal_stats import zonal_image_stats

    return zonal_image_stats(_constant_images(spark, sf_dir), _rect_zones_lvl(spark), res=9)


def _q_flagship_images(spark, sf_dir):
    """Full flagship image pipeline (cell encode → PIP planner → tile×zone
    rollup) over events-derived image points — oracle-checked (the round-2
    synth-RNG variant was rows-only)."""
    from morituri_spark.pipelines import flagship

    ev = _read(spark, sf_dir, "events")
    images = ev.select(
        F.format_string("img%08d", F.col("event_id")).alias("image_id"),
        F.expr(_LON).alias("lon"),
        F.expr(_LAT).alias("lat"),
    )
    return flagship.run_flagship(images, _rect_zones_lvl(spark), res=10, tile_res=7)


def _shapefile_fixture_rows():
    """Closed-form shapefile fixture shared by the query (which WRITES it
    as real .shp/.dbf bytes and reads it back through the distributed
    readers) and the oracle (which re-derives the expected table)."""
    rows = []
    for i in range(1, 41):
        n_pts = 2 + i % 3
        part = [[i * 0.5 + j * 0.25, i * 0.25 + j * 0.125] for j in range(n_pts)]
        rows.append((i, part, f"Street {i}", str(30 + (i % 5) * 10)))
    return rows


def _q_shapefile_ingest(spark, sf_dir):
    """S1/S2 real binary ingest: the fixture is WRITTEN as an actual ESRI
    .shp/.shx + dBASE .dbf (io/shapefile.py writers), then read back
    through the distributed .shx-offset readers and joined — the oracle
    re-derives the expected rows in closed form. Golden tests against the
    reference's faroe-islands fixture live in tests/test_shapefile.py."""
    import tempfile

    from morituri_spark.io import shapefile as S

    rows = _shapefile_fixture_rows()
    d = tempfile.mkdtemp(prefix="shp_fixture_")
    base = f"{d}/roads"
    S.write_shp(base + ".shp", [(i, [part]) for i, part, _n, _s in rows], S.SHAPE_POLYLINE)
    S.write_dbf(base + ".dbf", [("ST_NAME", "C", 20), ("SPEED", "N", 3)],
                [[n, s] for _i, _p, n, s in rows])
    df = S.shapefile_table(spark, base)
    return df.select(
        "fid",
        "shape_type",
        F.size(F.element_at("parts", 1)).alias("n_points"),
        F.round(F.element_at(F.element_at(F.element_at("parts", 1), 1), 1), 6).alias("x0"),
        F.round(F.element_at(F.element_at(F.element_at("parts", 1), -1), 2), 6).alias("y_last"),
        F.col("ST_NAME").alias("st_name"),
        F.col("SPEED").alias("speed"),
    )


def _shapefile_oracle_sql() -> str:
    vals = ", ".join(
        f"({i}, 3, {len(part)}, {round(part[0][0], 6)}, {round(part[-1][1], 6)}, "
        f"'{name}', '{speed}')"
        for i, part, name, speed in _shapefile_fixture_rows()
    )
    return f"""
        SELECT CAST(fid AS BIGINT) AS fid, CAST(shape_type AS INT) AS shape_type,
               CAST(n_points AS INT) AS n_points,
               CAST(x0 AS DOUBLE) AS x0, CAST(y_last AS DOUBLE) AS y_last,
               st_name, speed
        FROM (VALUES {vals}) AS t(fid, shape_type, n_points, x0, y_last, st_name, speed)
    """


# --- oracle generators for the (formerly rows-only) hash/ANN/media ops ----
#
# Technique (FIXTURES.md §12, applied here in round 3): restructure the
# query onto an ANSI-SQL-replayable parameterization of the SAME operator
# (hash family / quantizer / waveform as shared literals), then have DuckDB
# recompute the full pipeline symbolically. The engine code path under test
# is unchanged — k-min-aggregate signatures, banding, bucket joins, Arrow
# kernels, codecs — only the opaque JVM hash (xxhash64) / RNG inputs are
# swapped for closed forms.


def _minhash_oracle_sql() -> str:
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params

    P = MERSENNE31
    params = affine_hash_params(64)
    values = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    sid = " + ".join(
        f"CAST(ascii(substr(text, CAST(i AS INT) + {j}, 1)) AS BIGINT) * {256 ** (4 - j)}"
        for j in range(5)
    )
    return f"""
        WITH sh AS (
          SELECT DISTINCT doc_id, {sid} AS sid
          FROM documents, LATERAL (
              SELECT unnest(range(1, greatest(length(text) - 3, 2))) AS i) t),
        params(pi, a, b) AS (VALUES {values}),
        mh AS (
          SELECT doc_id, pi, min((a * (sid % {P}) + b) % {P}) AS mv
          FROM sh CROSS JOIN params GROUP BY doc_id, pi),
        bands AS (
          SELECT doc_id, pi // 4 AS band, list(mv ORDER BY pi) AS sig
          FROM mh GROUP BY doc_id, pi // 4),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN sh x ON x.doc_id = c.doc_a
          JOIN sh y ON y.doc_id = c.doc_b AND y.sid = x.sid
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        FROM inter
        JOIN sz sa ON doc_a = sa.doc_id
        JOIN sz sb ON doc_b = sb.doc_id
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    """


def _stratified_sample_oracle_sql() -> str:
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params
    from morituri_spark.text.sampling import sample_threshold

    a, b = affine_hash_params(1, seed=42)[0]
    thr = {lang: sample_threshold(r) for lang, r in (("en", 0.5), ("de", 0.2), ("fr", 0.1))}
    case = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(thr.items()))
    return f"""
        SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM documents
        WHERE ({a} * (doc_id % {MERSENNE31}) + {b}) % {MERSENNE31}
              < (CASE {case} ELSE 0 END)
        GROUP BY lang
    """


def _weighted_sample_oracle_sql() -> str:
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params

    a, b = affine_hash_params(1, seed=42)[0]
    return f"""
        SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM documents
        WHERE ({a} * (doc_id % {MERSENNE31}) + {b}) % {MERSENNE31}
              < CAST(floor(least(CAST(n_chars AS DOUBLE), CAST(4000 AS DOUBLE))
                           / CAST(4000 AS DOUBLE) * CAST(0.6 AS DOUBLE)
                           * CAST({MERSENNE31} AS DOUBLE)) AS BIGINT)
        GROUP BY lang
    """


def _weighted_topk_oracle_sql() -> str:
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params

    a, b = affine_hash_params(1, seed=42)[0]
    return f"""
        WITH staged AS (
            SELECT lang, doc_id, n_chars,
                   floor(pow((CAST(({a} * (doc_id % {MERSENNE31}) + {b})
                                   % {MERSENNE31} AS DOUBLE) + 1.0)
                             / 2147483648.0,
                             1.0 / (least(CAST(n_chars AS DOUBLE),
                                          CAST(4000 AS DOUBLE))
                                    / CAST(4000 AS DOUBLE)))
                         * 1e6 + 0.5 + 1e-8) / 1e6 AS rank_key
            FROM documents
            WHERE least(CAST(n_chars AS DOUBLE), CAST(4000 AS DOUBLE))
                  / CAST(4000 AS DOUBLE) > 0.0),
        ranked AS (
            SELECT lang, doc_id, n_chars, rank_key,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY rank_key DESC, doc_id) AS rk
            FROM staged)
        SELECT lang, doc_id, n_chars, rank_key, rk
        FROM ranked WHERE rk <= 20
    """


def _mixture_budget_oracle_sql() -> str:
    """The mixture sampler's semantics as ONE window cumsum: a doc is
    selected iff the running token total strictly before it (hash order,
    key tie-break) is under the domain's budget. The engine's bucketed
    two-pass must equal this exactly."""
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params

    a, b = affine_hash_params(1, seed=42)[0]
    doms = ", ".join(f"'{d}'" for d in sorted(_MIXTURE_BUDGETS))
    case = " ".join(
        f"WHEN source = '{d}' THEN {v}" for d, v in sorted(_MIXTURE_BUDGETS.items())
    )
    return f"""
        WITH t AS (
            SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_tokens,
                   ({a} * (doc_id % {MERSENNE31}) + {b}) % {MERSENNE31} AS h
            FROM documents WHERE source IN ({doms})),
        c AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
            FROM t)
        SELECT doc_id, source, n_tokens FROM c
        WHERE cum_before < (CASE {case} ELSE 0 END)
    """


def _tile_pyramid_oracle_sql() -> str:
    """Each zoom level aggregated DIRECTLY from raw (the cascade must match)."""
    parts = []
    for r in range(5, 9):
        n = 1 << r
        parts.append(f"""
            SELECT {r} AS res,
                   {r} * 288230376151711744
                     + CAST(floor((lon + 180) / 360 * {n}) AS BIGINT) * 536870912
                     + CAST(floor((lat + 90) / 180 * {n}) AS BIGINT) AS tile,
                   count(*) AS n_points,
                   round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
            FROM pts GROUP BY 1, 2""")
    return (
        f"WITH pts AS (SELECT value, {_GLON} AS lon, {_GLAT} AS lat FROM events)\n"
        + " UNION ALL ".join(parts)
    )


def _near_dup_clusters_oracle_sql() -> str:
    """Connected components over the minhash pair graph: the same pair SQL
    as the minhash oracle, labeled via recursive-CTE reachability minimum."""
    inner = _minhash_oracle_sql()
    return f"""
        WITH RECURSIVE und AS (
            SELECT doc_a AS a, doc_b AS b FROM ({inner})
            UNION
            SELECT doc_b AS a, doc_a AS b FROM ({inner})
        ),
        reach(src, dst) AS (
            SELECT a, a FROM und
            UNION
            SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst
        )
        SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    """


def _simhash_oracle_sql() -> str:
    from morituri_spark.text.dedup import MERSENNE31, affine_hash_params

    P = MERSENNE31
    (a1, b1), (a2, b2) = affine_hash_params(2, seed=7)
    blocks = " OR ".join(
        f"((a.s >> {bk * 16}) & 65535) = ((b.s >> {bk * 16}) & 65535)"
        for bk in range(4)
    )
    return f"""
        WITH tk AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text),
                     '[^a-z0-9]+'), x -> x <> '')) AS tok
          FROM documents),
        tid AS (
          SELECT doc_id,
                 list_reduce(list_transform(range(1, length(tok) + 1),
                     j -> CAST(ascii(substr(tok, CAST(j AS INT), 1)) AS BIGINT)),
                     (acc, c) -> (acc * 131 + c) % {P}) AS t
          FROM tk),
        th AS (
          SELECT doc_id,
                 (({a1} * t + {b1}) % {P}) * {1 << 31} + (({a2} * t + {b2}) % {P}) AS h
          FROM tid),
        votes AS (
          SELECT doc_id, j,
                 sum(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, LATERAL (SELECT unnest(range(0, 62)) AS j) b
          GROUP BY 1, 2),
        sh AS (
          SELECT doc_id,
                 sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS s
          FROM votes GROUP BY 1)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE ({blocks}) AND bit_count(xor(a.s, b.s)) <= 6
    """


def _fingerprint_oracle_sql() -> str:
    from morituri_spark.text.dedup import MERSENNE31

    P = MERSENNE31
    h = " + ".join(
        f"CAST(ascii(substr(text, CAST(i AS INT) + {j}, 1)) AS BIGINT) * {pow(131, j, P)}"
        for j in range(16)
    )
    return f"""
        WITH w AS (
          SELECT doc_id, (i - 1) // 16 AS s, ({h}) % {P} AS h
          FROM documents, LATERAL (
              SELECT unnest(range(1, length(text) - 14)) AS i) t),
        m AS (SELECT doc_id, s, min(h) AS mh FROM w GROUP BY 1, 2)
        SELECT doc_id, bit_xor(mh) AS fingerprint FROM m GROUP BY 1
    """


def _audio_oracle_sql() -> str:
    return """
        WITH clips AS (SELECT CAST(unnest(range(0, 50)) AS BIGINT) AS i),
        s AS (
          SELECT i, CAST(t AS BIGINT) AS t,
                 CAST(floor(sin(((2 * pi()) * (200.0 + 10.0 * CAST(i AS DOUBLE)))
                      * CAST(t AS DOUBLE) / 16000.0) * 13106.8) AS BIGINT) AS v
          FROM clips, LATERAL (SELECT unnest(range(0, 4000)) AS t) ts),
        x AS (SELECT i, t, v, lead(v) OVER (PARTITION BY i ORDER BY t) AS nv FROM s),
        f AS (
          SELECT i, count(*) AS n,
                 sqrt(avg((v / 32768.0) * (v / 32768.0))) AS rms,
                 max(abs(v)) / 32768.0 AS peak,
                 sum(CASE WHEN nv IS NOT NULL AND ((v < 0) != (nv < 0))
                          THEN 1 ELSE 0 END) AS zc
          FROM x GROUP BY i)
        SELECT printf('clip%04d', i) AS audio_id,
               CAST(16000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               round(n / 16000.0, 6) AS duration_s,
               round(rms, 9) AS rms,
               round(peak, 9) AS peak,
               round(zc / (n - 1.0), 9) AS zero_crossing_rate
        FROM f
    """


def _zonal_oracle_sql() -> str:
    return f"""
        SELECT z.zone_id, CAST(3 AS INT) AS admin_lvl,
               count(*) AS n_images,
               round(avg(e.event_id % 256), 4) AS avg_r,
               round(avg((e.event_id * 3) % 256), 4) AS avg_g,
               round(avg(CASE WHEN (e.event_id * 7) % 256
                                   - ((e.event_id % 256 + (e.event_id * 3) % 256
                                      + (e.event_id * 7) % 256) % 3) < 0
                              THEN (e.event_id * 7) % 256
                                   - ((e.event_id % 256 + (e.event_id * 3) % 256
                                      + (e.event_id * 7) % 256) % 3) + 3
                              ELSE (e.event_id * 7) % 256
                                   - ((e.event_id % 256 + (e.event_id * 3) % 256
                                      + (e.event_id * 7) % 256) % 3)
                         END), 4) AS avg_b,
               CAST(0.0 AS DOUBLE) AS avg_texture,
               CAST(0.0 AS DOUBLE) AS avg_phash_bits
        FROM (SELECT event_id, {_IMG_LON} AS lon, {_LAT} AS lat
              FROM events WHERE event_id < 500) e
        JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
          ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
        GROUP BY z.zone_id
    """


def _flagship_images_oracle_sql() -> str:
    return f"""
        SELECT 7 * 288230376151711744
                 + CAST(floor((e.lon + 180) / 360 * 128) AS BIGINT) * 536870912
                 + CAST(floor((e.lat + 90) / 180 * 128) AS BIGINT) AS tile,
               z.zone_id,
               count(*) AS n_images,
               min(e.image_id) AS first_image_id
        FROM (SELECT printf('img%08d', event_id) AS image_id,
                     {_LON} AS lon, {_LAT} AS lat FROM events) e
        JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
          ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
        GROUP BY 1, 2
    """


def _sql_arr(row) -> str:
    return "[" + ", ".join(repr(float(x)) for x in row) + "]"


def _ann_lsh_oracle_sql() -> str:
    from morituri_spark.ml.simsearch import rademacher_planes

    H = rademacher_planes(64, 8)
    bucket = " + ".join(
        f"(CASE WHEN list_inner_product(v, {_sql_arr(H[i])}) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 20),
        p AS (SELECT q.query_id, c.vec_id,
                     round(CAST(list_cosine_similarity(q.qv, c.v) AS DOUBLE), 6) AS cosine
              FROM q JOIN b c USING (bucket))
        SELECT query_id, vec_id, CAST(rk - 1 AS INT) AS rank, cosine FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
            FROM p) t
        WHERE rk <= 3
    """


def _ann_ivf_oracle_sql() -> str:
    from morituri_spark.ml.simsearch import fixed_centroids

    C = fixed_centroids(16, 64)
    cent_vals = ", ".join(f"({j}, {_sql_arr(C[j])})" for j in range(len(C)))
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cent(j, c) AS (VALUES {cent_vals}),
        ea AS (SELECT e.vec_id, e.v,
                      (SELECT j FROM cent
                       ORDER BY list_inner_product(e.v, c) DESC, j LIMIT 1) AS lst
               FROM e),
        qa AS (SELECT e.vec_id AS query_id, e.v AS qv, l.j AS lst
               FROM e, LATERAL (SELECT j FROM cent
                                ORDER BY list_inner_product(e.v, c) DESC, j LIMIT 2) l
               WHERE e.vec_id < 20),
        p AS (SELECT qa.query_id, c.vec_id,
                     round(CAST(list_cosine_similarity(qa.qv, c.v) AS DOUBLE), 6) AS cosine
              FROM qa JOIN ea c USING (lst))
        SELECT query_id, vec_id, CAST(rk - 1 AS INT) AS rank, cosine FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
            FROM p) t
        WHERE rk <= 3
    """


def _q_ann_pq(spark, sf_dir):
    """PQ-scan ANN (ml/simsearch.py ann_topk_pq, r5): the corpus is encoded
    to m=8 3-bit codes (argmin codeword per subspace on the normalized
    vector) and scored by ADC — per query one (m × n_codes) dot-product
    lookup table, each candidate = 8 gathers; candidates cross the wire as
    CODES, never vectors. ORACLE-CHECKED end-to-end: the fixed codebooks
    embed as literals in DuckDB SQL, which replays normalize → encode →
    LUT → ADC in the kernel's exact left-to-right float order, then both
    sides rank on the shared rounded score."""
    from morituri_spark.ml.simsearch import ann_topk_pq, fixed_pq_codebooks

    q, emb = _ann_inputs(spark, sf_dir)
    return ann_topk_pq(q, emb, k=3, m=8, n_codes=8,
                       codebooks=fixed_pq_codebooks(8, 8, 64))


def _pq_oracle_sql() -> str:
    """SQL replay of the PQ/ADC chain with codebook literals. Reduction
    order contract: every `+` chain below is left-associated, matching the
    kernel's element-sequential accumulators (np.sum's pairwise blocking
    would NOT match — CLAUDE.md rule 16's argmin-sensitive cousin: encode
    compares UNROUNDED distances, so the two engines must produce
    bit-identical doubles, not merely round-6-identical)."""
    from morituri_spark.ml.simsearch import fixed_pq_codebooks

    B = fixed_pq_codebooks(8, 8, 64)
    m, n_codes, dsub = B.shape
    norm = " + ".join(f"e[{i + 1}] * e[{i + 1}]" for i in range(64))
    ncols = ", ".join(f"e[{i + 1}] / n AS x{i + 1}" for i in range(64))
    dl_cols = []
    for j in range(m):
        dists = []
        for c in range(n_codes):
            terms = " + ".join(
                f"(x{j * dsub + d + 1} - ({float(B[j, c, d])!r})) *"
                f" (x{j * dsub + d + 1} - ({float(B[j, c, d])!r}))"
                for d in range(dsub)
            )
            dists.append(f"({terms})")
        dl_cols.append("[" + ", ".join(dists) + f"] AS dl{j}")
    code_cols = ", ".join(
        f"list_indexof(dl{j}, list_min(dl{j})) - 1 AS code{j}" for j in range(m)
    )
    cases = []
    for j in range(m):
        whens = " ".join(
            "WHEN {c} THEN ({dot})".format(
                c=c,
                dot=" + ".join(
                    f"q.x{j * dsub + d + 1} * ({float(B[j, c, d])!r})"
                    for d in range(dsub)
                ),
            )
            for c in range(n_codes)
        )
        cases.append(f"(CASE c.code{j} {whens} END)")
    score = " + ".join(cases)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        en AS (SELECT vec_id, e, sqrt({norm}) AS n FROM e),
        nx AS (SELECT vec_id, {ncols} FROM en),
        dl AS (SELECT vec_id, {", ".join(dl_cols)} FROM nx),
        c AS (SELECT vec_id, {code_cols} FROM dl),
        q AS (SELECT vec_id AS query_id, * EXCLUDE (vec_id) FROM nx WHERE vec_id < 20),
        scored AS (SELECT q.query_id, c.vec_id, round({score}, 6) AS adc_score
                   FROM q CROSS JOIN c)
        SELECT query_id, vec_id, CAST(rk - 1 AS INT) AS rank, adc_score FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY adc_score DESC, vec_id) AS rk
            FROM scored) t
        WHERE rk <= 3
    """


def _q_dissolve(spark, sf_dir):
    """Polygon dissolve (geo/dissolve.py dissolve_stats): merge-by-
    attribute over a topologically clean tessellation via shared-edge
    cancellation — interior edges appear in exactly two member rings and
    cancel in ONE map-side-combinable groupBy; no geometry library, no
    pairwise unions. The synth is a 24×16 unit-square grid (built in pure
    Catalyst from event ids) dissolved into four 12×8 blocks, with ONE
    planted duplicate cell (event 384 re-emits cell (0,0)) so the
    non-manifold surfacing path is driver-checked too: group 0 reads
    n_polys 97, two multiplicity-3 edges, and a 38-edge boundary (the
    duplicate's two outer edges pair up and leave the boundary). All
    coordinates are small integers in doubles, so every sum — shoelace
    areas, unit edge lengths, midpoint halves — is exact and the value
    compare is bit-strict with no rounding anywhere."""
    from morituri_spark.geo.dissolve import dissolve_stats

    cells = (
        _read(spark, sf_dir, "events")
        .where("event_id < 385")
        .select(
            (F.col("event_id") % 24).alias("ix"),
            F.expr("(event_id div 24) % 16").alias("iy"),
            F.col("event_id").alias("zone_id"),
        )
    )
    x0 = F.col("ix").cast("double")
    y0 = F.col("iy").cast("double")
    x1 = (F.col("ix") + 1).cast("double")
    y1 = (F.col("iy") + 1).cast("double")
    ring = F.array(
        F.array(x0, y0), F.array(x1, y0), F.array(x1, y1),
        F.array(x0, y1), F.array(x0, y0),
    )
    zones = cells.select(
        (F.expr("ix div 12") + 2 * F.expr("iy div 8")).alias("gid"),
        "zone_id",
        F.array(ring).alias("rings"),
    )
    return dissolve_stats(zones, group_col="gid", zone_id="zone_id").select(
        F.col("gid").cast("long").alias("gid"),
        "n_polys", "dissolved_area", "n_boundary_edges", "boundary_len",
        "sum_mid_x", "sum_mid_y", "n_nonmanifold",
    )


def _q_hough(spark, sf_dir):
    """Distributed Hough line voting (geo/hough.py hough_lines): every
    point votes for the (θ, ρ) cells of all lines through it — a T-fold
    literal explode + ONE map-side-combinable groupBy whose exchange is
    bounded by T·n_bins·n_tasks regardless of input size. The point
    cloud is the sf-scaled lattice (7·id mod 199, 13·id mod 211); trig
    is 6-dp half-up decimal literals baked into BOTH plans (the
    hillshade driver-literal discipline), so rho bins are identical
    doubles in the two engines and the vote counts compare bit-strict."""
    from morituri_spark.geo.hough import hough_lines

    pts = _read(spark, sf_dir, "events").select(
        ((F.col("event_id") * 7) % 199).cast("double").alias("x"),
        ((F.col("event_id") * 13) % 211).cast("double").alias("y"),
    )
    return hough_lines(pts, n_theta=8, rho_step=4.0, min_votes=10).select(
        F.col("theta_k").cast("int").alias("theta_k"),
        F.col("rho_bin").cast("long").alias("rho_bin"),
        F.col("votes").cast("long").alias("votes"),
        "rho_center",
    )


def _hough_oracle_sql() -> str:
    """SQL replay of the vote pipeline with the SAME trig literals the
    engine bakes into its plan (theta_table's 6-dp half-up decimals) —
    both engines parse identical decimal strings to identical doubles,
    every product/sum/floor is then the same IEEE op."""
    from morituri_spark.geo.hough import theta_table

    vals = ", ".join(f"({k}, {c!r}, {s!r})" for k, c, s in theta_table(8))
    return f"""
        WITH pts AS (
            SELECT CAST((event_id * 7) % 199 AS DOUBLE) AS x,
                   CAST((event_id * 13) % 211 AS DOUBLE) AS y
            FROM events),
        ang(theta_k, c, s) AS (VALUES {vals}),
        v AS (
            SELECT theta_k,
                   CAST(floor((x * c + y * s) / 4.0 + 0.5) AS BIGINT) AS rho_bin
            FROM pts, ang),
        acc AS (SELECT theta_k, rho_bin, count(*) AS votes FROM v GROUP BY ALL)
        SELECT CAST(theta_k AS INT) AS theta_k, rho_bin, votes,
               CAST(rho_bin AS DOUBLE) * 4.0 AS rho_center
        FROM acc WHERE votes >= 10
    """


def _q_equalize_otsu(spark, sf_dir):
    """Otsu threshold + histogram equalization (multimodal/enhance.py)
    over REAL PNG payloads: the data-sized work is one decode+bincount
    scan kernel; everything algorithmic runs on the ≤766-row-per-image
    sparse histogram in codegen Catalyst (bounded window frames, never a
    global sort). The between-class score is emitted as its EXACT integer
    (numerator², denominator) pair — the float ratio only drives the
    argmax — so the whole output is integers plus the image id: no
    rounding anywhere. The oracle re-derives every pixel from the
    gradient closed form (the vit_patch_tokens fixture) and replays
    prefix sums → argmax → remap in SQL windows."""
    from morituri_spark.multimodal.enhance import equalize_otsu

    return equalize_otsu(_gradient_images(spark, sf_dir, n=300))


def _q_bpe(spark, sf_dir):
    """Distributed BPE merge training (text/bpe.py bpe_train): R=3 greedy
    rounds of pair-count → global top-1 → corpus merge over the documents
    table. Pair counts are map-side-combinable (the one data-sized
    exchange per round moves accumulator cells); the top-1 compiles to
    TakeOrderedAndProject; the merge is a broadcast crossJoin + one
    string replace whose left-to-right non-overlap contract Spark and
    DuckDB share, so the oracle replays the whole trajectory with
    unrolled AS MATERIALIZED CTE stages (rule 27). Ties break to the
    lexicographically smallest pair — deterministic on the ASCII corpus."""
    from morituri_spark.text.bpe import bpe_train

    docs = _read(spark, sf_dir, "documents").select("text")
    return bpe_train(docs, rounds=3)


def _bpe_oracle_sql(rounds: int = 3) -> str:
    """Unrolled-iteration BPE oracle: each round MATERIALIZED (a plain
    CTE would inline the previous corpus per reference and re-read the
    base scan exponentially — rule 27), pair explode via
    list_transform(range(...)) (1-based DuckDB arrays), merge via the
    shared replace contract."""

    def rnd(r: int, src: str) -> str:
        return f"""
        p{r} AS MATERIALIZED (
            SELECT pair, count(*) AS cnt FROM (
              SELECT unnest(list_transform(range(1, len(t)),
                            j -> t[j] || ' ' || t[j+1])) AS pair
              FROM (SELECT string_split(text, ' ') AS t FROM {src}))
            GROUP BY 1),
        b{r} AS MATERIALIZED (
            SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
        m{r} AS MATERIALIZED (
            SELECT trim(replace(' ' || text || ' ', ' ' || pair || ' ',
                        ' ' || replace(pair, ' ', '') || ' ')) AS text
            FROM {src}, b{r}),
        t{r} AS (
            SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total
            FROM m{r})"""

    stages = ",".join(
        rnd(r, f"m{r - 1}" if r > 1 else "c0") for r in range(1, rounds + 1)
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, pair, cnt,"
        f" total AS total_tokens_after FROM b{r}, t{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH c0 AS MATERIALIZED (SELECT text FROM documents)," + stages
        + f" SELECT * FROM ({rows})"
    )


def _q_collocations(spark, sf_dir):
    """PMI collocation mining (text/collocations.py): statistically-bound
    phrases over the documents table — positional PMI where every
    marginal is a rollup of the ONE bigram-count aggregate (the corpus
    scans once; the two marginal joins key single words against
    aggregate relations, so stopword skew stays AQE-splittable). The
    score ships floor-rounded to integer micro-nats with the rule-16
    epsilon absorbing cross-libm ln ulp dust (the lm.py scheme); counts
    are exact integers, so the compare is strict."""
    from morituri_spark.text.collocations import collocations

    docs = _read(spark, sf_dir, "documents")
    return collocations(docs, "doc_id", "text", min_count=20)


def _q_edge_hough(spark, sf_dir):
    """Sobel edge extraction → per-image Hough line voting
    (multimodal/edges.py + geo/hough.py): the raster→vector composition
    — REAL PNG decode, exact integer Sobel L1 magnitude on 3×-gray
    (edge membership is an integer comparison), sparse edge points feed
    the keyed Hough accumulator (one map-side-combinable groupBy; the
    image key just widens it). On the gradient fixture the mod-256 wrap
    boundaries of the linear channel forms ARE straight lines, so the
    detector finds real structure, not noise. The oracle re-derives
    pixels from the closed form, replays the 3×3 stencil as a weighted
    neighbor join, and re-votes with the same 6-dp trig literals."""
    from morituri_spark.geo.hough import hough_votes
    from morituri_spark.multimodal.edges import edge_points

    ep = edge_points(_gradient_images(spark, sf_dir, n=200), threshold=400)
    hv = hough_votes(
        ep.select(
            "image_id",
            F.col("x").cast("double").alias("x"),
            F.col("y").cast("double").alias("y"),
        ),
        n_theta=8,
        rho_step=4.0,
        keys=["image_id"],
    )
    return hv.where("votes >= 3").select(
        "image_id",
        F.col("theta_k").cast("int").alias("theta_k"),
        F.col("rho_bin").cast("long").alias("rho_bin"),
        F.col("votes").cast("long").alias("votes"),
    )


def _edge_hough_oracle_sql() -> str:
    """Pixel closed form → Sobel as a weighted 3×3 neighbor join →
    the same literal-trig vote replay as hough_line_votes."""
    from morituri_spark.geo.hough import theta_table

    vals = ", ".join(f"({k}, {c!r}, {s!r})" for k, c, s in theta_table(8))
    return f"""
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 200),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        k(dx, dy, wx, wy) AS (VALUES
            (-1,-1,-1,-1),(0,-1,0,-2),(1,-1,1,-1),
            (-1,0,-2,0),(0,0,0,0),(1,0,2,0),
            (-1,1,-1,1),(0,1,0,2),(1,1,1,1)),
        sob AS (
            SELECT p.i, p.y, p.x,
                   abs(sum(k.wx * q.g3)) + abs(sum(k.wy * q.g3)) AS mag
            FROM pix p JOIN k ON TRUE
            JOIN pix q ON q.i = p.i AND q.y = p.y + k.dy AND q.x = p.x + k.dx
            WHERE p.y BETWEEN 1 AND 14 AND p.x BETWEEN 1 AND 14
            GROUP BY 1, 2, 3),
        e AS (SELECT i, x, y FROM sob WHERE mag >= 400),
        ang(theta_k, c, s) AS (VALUES {vals}),
        v AS (
            SELECT i, theta_k,
                   CAST(floor((CAST(x AS DOUBLE) * c + CAST(y AS DOUBLE) * s)
                              / 4.0 + 0.5) AS BIGINT) AS rho_bin
            FROM e, ang),
        acc AS (
            SELECT i, theta_k, rho_bin, count(*) AS votes
            FROM v GROUP BY ALL)
        SELECT printf('img%08d', i) AS image_id,
               CAST(theta_k AS INT) AS theta_k, rho_bin, votes
        FROM acc WHERE votes >= 3
    """


def _q_harris_corners(spark, sf_dir):
    """Harris corners (multimodal/corners.py): per-image top-5 keypoints
    by the ALL-INTEGER response r20 = 20·det(M) − trace(M)² (k=1/20)
    over Sobel structure tensors on real PNG payloads, ranked by the
    total order (r20 DESC, y, x) — the oracle replays Sobel as a
    weighted 3×3 join (the edge-Hough evidence class), the window sums
    as a second 3×3 join, and the ranking as row_number()."""
    from morituri_spark.multimodal.corners import harris_corners

    return harris_corners(_gradient_images(spark, sf_dir, n=150), k=5)


def _harris_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        k(dx, dy, wx, wy) AS (VALUES
            (-1,-1,-1,-1),(0,-1,0,-2),(1,-1,1,-1),
            (-1,0,-2,0),(0,0,0,0),(1,0,2,0),
            (-1,1,-1,1),(0,1,0,2),(1,1,1,1)),
        sob AS (
            SELECT p.i, p.y, p.x,
                   sum(k.wx * q.g3) AS gx, sum(k.wy * q.g3) AS gy
            FROM pix p JOIN k ON TRUE
            JOIN pix q ON q.i = p.i AND q.y = p.y + k.dy AND q.x = p.x + k.dx
            WHERE p.y BETWEEN 1 AND 14 AND p.x BETWEEN 1 AND 14
            GROUP BY 1, 2, 3),
        win AS (
            SELECT a.i, a.y, a.x,
                   sum(b.gx * b.gx) AS sxx, sum(b.gy * b.gy) AS syy,
                   sum(b.gx * b.gy) AS sxy
            FROM sob a JOIN sob b
              ON b.i = a.i AND b.y BETWEEN a.y - 1 AND a.y + 1
                           AND b.x BETWEEN a.x - 1 AND a.x + 1
            WHERE a.y BETWEEN 2 AND 13 AND a.x BETWEEN 2 AND 13
            GROUP BY 1, 2, 3),
        resp AS (
            SELECT i, y, x,
                   20 * (sxx * syy - sxy * sxy)
                   - (sxx + syy) * (sxx + syy) AS r20
            FROM win),
        ranked AS (
            SELECT i, y, x, r20,
                   row_number() OVER (PARTITION BY i
                                      ORDER BY r20 DESC, y, x) AS rk
            FROM resp WHERE r20 > 0)
        SELECT printf('img%08d', i) AS image_id, CAST(rk AS BIGINT) AS "rank",
               CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CAST(r20 AS BIGINT) AS r20
        FROM ranked WHERE rk <= 5
    """


def _q_chamfer_hist(spark, sf_dir):
    """Chamfer 3-4 distance transform (multimodal/distance.py): per-image
    integer distance-to-mask field over real PNG payloads, emitted as an
    exact per-distance histogram with membership checksums. The kernel
    relaxes min-plus to fixpoint; the oracle re-derives the SAME field as
    shortest paths over the 3/4-weighted 8-neighbor graph via a capped
    recursive CTE (the blob/dbscan evidence class) — two independent
    formulations of one metric."""
    from morituri_spark.multimodal.distance import chamfer_histogram

    return chamfer_histogram(_gradient_images(spark, sf_dir, n=100), threshold=384)


def _chamfer_oracle_sql() -> str:
    # cap 60 = the 16×16 grid's chamfer diameter (15 diagonals); every
    # shortest path fits under it, and the UNION-dedup recursion is
    # state-bounded at pixels × 61 levels per image
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 100),
        pix AS (
            SELECT i, y, x, y * 16 + x AS pid,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        mask AS (SELECT i, pid FROM pix WHERE g3 >= 384),
        adj AS (
            SELECT a.i, a.pid AS pa, b.pid AS pb,
                   CASE WHEN a.y <> b.y AND a.x <> b.x THEN 4 ELSE 3 END AS w
            FROM pix a JOIN pix b
              ON b.i = a.i AND abs(a.y - b.y) <= 1 AND abs(a.x - b.x) <= 1
             AND NOT (a.y = b.y AND a.x = b.x)),
        paths AS (
            WITH RECURSIVE r AS (
                SELECT i, pid, 0 AS dist FROM mask
                UNION
                SELECT adj.i, adj.pb AS pid, r.dist + adj.w AS dist
                FROM r JOIN adj ON adj.i = r.i AND adj.pa = r.pid
                WHERE r.dist + adj.w <= 60)
            SELECT i, pid, min(dist) AS dist FROM r GROUP BY i, pid)
        SELECT printf('img%08d', i) AS image_id, CAST(dist AS BIGINT) AS dist,
               CAST(count(*) AS BIGINT) AS n_pixels,
               CAST(sum(pid + 1) AS BIGINT) AS chk_pos
        FROM paths GROUP BY i, dist
    """


def _q_glcm_features(spark, sf_dir):
    """GLCM texture (multimodal/texture.py): per-image, per-offset
    ALL-INTEGER co-occurrence feature numerators (n_pairs, contrast,
    energy², homogeneity·840) over REAL PNG payloads at 8 gray levels
    and offsets (0,1)/(1,0). The oracle re-derives pixels from the
    gradient closed form, quantizes with the same exact floor, and
    replays each offset as a self-join + grouped integer aggregates."""
    from morituri_spark.multimodal.texture import glcm_features

    return glcm_features(_gradient_images(spark, sf_dir, n=120), levels=8)


def _glcm_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 120),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        lvl AS (
            SELECT i, y, x,
                   CAST(floor((g3 * 8) / 766.0) AS BIGINT) AS lv
            FROM pix),
        offs(dy, dx) AS (VALUES (0, 1), (1, 0)),
        cooc AS (
            SELECT p.i, o.dy, o.dx, p.lv AS la, q.lv AS lb,
                   count(*) AS c
            FROM lvl p JOIN offs o ON TRUE
            JOIN lvl q ON q.i = p.i AND q.y = p.y + o.dy
                      AND q.x = p.x + o.dx
            GROUP BY ALL)
        SELECT printf('img%08d', i) AS image_id,
               CAST(dy AS BIGINT) AS dy, CAST(dx AS BIGINT) AS dx,
               CAST(sum(c) AS BIGINT) AS n_pairs,
               CAST(sum(c * (la - lb) * (la - lb)) AS BIGINT) AS contrast,
               CAST(sum(c * c) AS BIGINT) AS energy_sq,
               CAST(sum(c * (840 // (1 + abs(la - lb)))) AS BIGINT)
                   AS homog840
        FROM cooc GROUP BY 1, 2, 3
    """


def _q_lbp_histogram(spark, sf_dir):
    """LBP texture (multimodal/texture.py): per-image histogram of 8-bit
    local-binary-pattern codes (fixed E→NE weight ring, neighbor ≥
    center) over interior pixels of REAL PNG payloads — all-integer, so
    the oracle's weighted 8-neighbor join replay matches bit-exactly."""
    from morituri_spark.multimodal.texture import lbp_histogram

    return lbp_histogram(_gradient_images(spark, sf_dir, n=120))


def _lbp_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 120),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        k(dy, dx, w) AS (VALUES
            (0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
            (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128)),
        codes AS (
            SELECT p.i, p.y, p.x,
                   sum(CASE WHEN q.g3 >= p.g3 THEN k.w ELSE 0 END) AS code
            FROM pix p JOIN k ON TRUE
            JOIN pix q ON q.i = p.i AND q.y = p.y + k.dy
                      AND q.x = p.x + k.dx
            WHERE p.y BETWEEN 1 AND 14 AND p.x BETWEEN 1 AND 14
            GROUP BY 1, 2, 3)
        SELECT printf('img%08d', i) AS image_id,
               CAST(code AS BIGINT) AS code,
               CAST(count(*) AS BIGINT) AS cnt
        FROM codes GROUP BY 1, 2
    """


def _q_run_lengths(spark, sf_dir):
    """Binary run-length texture (multimodal/texture.py): per-image
    histogram of horizontal run lengths of the g3≥384 mask over REAL PNG
    payloads. The oracle re-derives the mask from the closed form and
    replays runs as gaps-and-islands (x − row_number per row)."""
    from morituri_spark.multimodal.texture import run_length_hist

    return run_length_hist(_gradient_images(spark, sf_dir, n=150), threshold=384)


def _run_lengths_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        mask AS (SELECT i, y, x FROM pix WHERE g3 >= 384),
        isl AS (
            SELECT i, y, x,
                   x - row_number() OVER (PARTITION BY i, y ORDER BY x)
                       AS grp
            FROM mask),
        runs AS (
            SELECT i, count(*) AS run_len
            FROM isl GROUP BY i, y, grp)
        SELECT printf('img%08d', i) AS image_id,
               CAST(run_len AS BIGINT) AS run_len,
               CAST(count(*) AS BIGINT) AS cnt
        FROM runs GROUP BY 1, 2
    """


def _q_image_moments(spark, sf_dir):
    """Image moments (multimodal/moments.py): per-image exact raw
    moments and central-moment numerators (×m00) of the g3≥384 mask
    over REAL PNG payloads. The oracle re-derives the mask from the
    gradient closed form and replays every moment as a grouped integer
    aggregate — all-integer, no centroid float."""
    from morituri_spark.multimodal.moments import image_moments

    return image_moments(_gradient_images(spark, sf_dir, n=150), threshold=384)


def _image_moments_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        mask AS (SELECT i, y, x FROM pix WHERE g3 >= 384),
        raw AS (
            SELECT i,
                   CAST(count(*) AS BIGINT) AS m00,
                   CAST(sum(x) AS BIGINT) AS m10,
                   CAST(sum(y) AS BIGINT) AS m01,
                   CAST(sum(x * x) AS BIGINT) AS m20,
                   CAST(sum(y * y) AS BIGINT) AS m02,
                   CAST(sum(x * y) AS BIGINT) AS m11
            FROM mask GROUP BY i)
        SELECT printf('img%08d', i) AS image_id,
               m00, m10, m01, m20, m02, m11,
               m00 * m20 - m10 * m10 AS mu20n,
               m00 * m02 - m01 * m01 AS mu02n,
               m00 * m11 - m10 * m01 AS mu11n
        FROM raw
    """


def _q_thinning(spark, sf_dir):
    """Zhang-Suen thinning (multimodal/thinning.py): exactly 8
    sub-iterations of the published two-phase thinning over the g3≥384
    mask of REAL PNG payloads, emitted as exact populations + the
    position-weighted skeleton checksum. The oracle unrolls the SAME 8
    sub-iterations as MATERIALIZED CTE stages (rule 27 — each stage
    self-joins its predecessor twice), with the neighbor ring pivoted
    through conditional aggregates — the morphology evidence class,
    iterated and condition-gated."""
    from morituri_spark.multimodal.thinning import thinning_stats

    return thinning_stats(
        _gradient_images(spark, sf_dir, n=60), threshold=384, n_steps=8
    )


def _thinning_oracle_sql() -> str:
    from morituri_spark.multimodal.thinning import RING

    pivots = ", ".join(
        f"coalesce(max(CASE WHEN b.y = a.y + {dy} AND b.x = a.x + {dx}"
        f" THEN b.m END), 0) AS p{idx}"
        for idx, (dy, dx) in enumerate(RING, start=2)
    )
    ring = [2, 3, 4, 5, 6, 7, 8, 9]
    trans = " + ".join(
        f"(CASE WHEN p{a} = 0 AND p{b} = 1 THEN 1 ELSE 0 END)"
        for a, b in zip(ring, ring[1:] + ring[:1])
    )

    def _stage(prev: str, name: str, phase: int) -> str:
        g = (
            "p2 * p4 * p6 = 0 AND p4 * p6 * p8 = 0"
            if phase == 0
            else "p2 * p4 * p8 = 0 AND p2 * p6 * p8 = 0"
        )
        return f"""
        {name} AS MATERIALIZED (
            SELECT i, y, x,
                   CASE WHEN m = 1
                             AND (p2+p3+p4+p5+p6+p7+p8+p9) BETWEEN 2 AND 6
                             AND ({trans}) = 1 AND {g}
                        THEN 0 ELSE m END AS m
            FROM (
                SELECT a.i, a.y, a.x, a.m, {pivots}
                FROM {prev} a LEFT JOIN {prev} b
                  ON b.i = a.i AND abs(b.y - a.y) <= 1
                 AND abs(b.x - a.x) <= 1
                 AND NOT (b.y = a.y AND b.x = a.x)
                GROUP BY a.i, a.y, a.x, a.m))"""

    stages = ",".join(
        _stage(f"s{k}", f"s{k + 1}", k % 2) for k in range(8)
    )
    return f"""
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 60),
        s0 AS MATERIALIZED (
            SELECT i, y, x,
                   CASE WHEN (i + 2 * y + 3 * x) % 256
                             + (2 * i + y + 5 * x) % 256
                             + (3 * i + 4 * y + x) % 256 >= 384
                        THEN 1 ELSE 0 END AS m
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),{stages}
        SELECT printf('img%08d', a0.i) AS image_id,
               a0.n AS n_mask, a8.n AS n_skel,
               a0.n - a8.n AS n_deleted, a8.chk AS chk_skel
        FROM (SELECT i, CAST(sum(m) AS BIGINT) AS n FROM s0 GROUP BY i) a0
        JOIN (SELECT i, CAST(sum(m) AS BIGINT) AS n,
                     CAST(sum(m * (y * 16 + x + 1)) AS BIGINT) AS chk
              FROM s8 GROUP BY i) a8 ON a8.i = a0.i
    """


#: literal needle dictionary shared by the engine query and the oracle
_NEEDLES = ("the", "and", "ing", "ion", "ent", "for", "ate", "tion",
            "er", "re", "data", "of")


def _q_pattern_hits(spark, sf_dir):
    """Multi-pattern substring counting (text/patterns.py): every
    document scored against a broadcast literal dictionary — the count
    is the left-to-right non-overlapping occurrence count via the
    length-delta-of-replace identity, a convention Spark and DuckDB
    share, so the oracle's VALUES-dictionary replay is exact."""
    from morituri_spark.text.patterns import pattern_hit_counts

    needles = spark.createDataFrame(
        [(n,) for n in _NEEDLES], "needle string"
    )
    return pattern_hit_counts(_read(spark, sf_dir, "documents"), needles)


def _pattern_hits_oracle_sql() -> str:
    vals = ", ".join(f"({n!r})" for n in _NEEDLES)
    return f"""
        WITH nd(needle) AS (VALUES {vals}),
        lowered AS (SELECT doc_id, lower(text) AS t FROM documents),
        scored AS (
            SELECT doc_id, needle,
                   CAST((length(t) - length(replace(t, needle, '')))
                        / length(needle) AS BIGINT) AS hits
            FROM lowered CROSS JOIN nd)
        SELECT doc_id, needle, hits FROM scored WHERE hits > 0
    """


def _q_box_filter(spark, sf_dir):
    """Separable box filter (geo/terrain.box_filter): exact (2r+1)²
    box sums + support counts over 40 closed-form 24×24 keyed rasters
    — TWO Catalyst range-frame windows (rows then columns) instead of a
    25-way neighbor self-join. The oracle replays the same two RANGE
    frames in DuckDB; integers end to end."""
    from morituri_spark.geo.terrain import box_filter

    ev = _read(spark, sf_dir, "events").where("event_id < 23040")
    dem = ev.selectExpr(
        "event_id % 40 AS g",
        "CAST(floor(event_id / 40.0) AS BIGINT) % 24 AS ix",
        "CAST(floor(event_id / 960.0) AS BIGINT) AS iy",
    ).selectExpr(
        "g", "ix", "iy",
        "(7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z",
    )
    return box_filter(dem, radius=2, keys=["g"]).select(
        F.col("g").cast("long").alias("g"),
        F.col("ix").cast("long").alias("ix"),
        F.col("iy").cast("long").alias("iy"),
        F.col("z").cast("long").alias("z"),
        F.col("box_sum").cast("long").alias("box_sum"),
        F.col("box_n").cast("long").alias("box_n"),
    )


def _box_filter_oracle_sql() -> str:
    return """
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 23040),
        cells AS (
            SELECT event_id % 40 AS g,
                   CAST(floor(event_id / 40.0) AS BIGINT) % 24 AS ix,
                   CAST(floor(event_id / 960.0) AS BIGINT) AS iy
            FROM ev),
        dem AS (
            SELECT g, ix, iy,
                   (7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z
            FROM cells),
        h AS (
            SELECT g, ix, iy, z,
                   sum(z) OVER (PARTITION BY g, iy ORDER BY ix
                                RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                       AS hsum,
                   count(*) OVER (PARTITION BY g, iy ORDER BY ix
                                RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                       AS hn
            FROM dem)
        SELECT g, ix, iy, z,
               CAST(sum(hsum) OVER (PARTITION BY g, ix ORDER BY iy
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
                   AS box_sum,
               CAST(sum(hn) OVER (PARTITION BY g, ix ORDER BY iy
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
                   AS box_n
        FROM h
    """


def _q_orientation_hist(spark, sf_dir):
    """Gradient-orientation histogram (multimodal/edges.
    orientation_histogram): per-image 8-class sign-magnitude octant
    code over Sobel gradients of REAL PNG payloads, with per-class
    exact pixel counts and L1-magnitude sums. The oracle replays Sobel
    as the weighted 3×3 neighbor join (edge-Hough/Harris evidence
    class) and classes with the same pinned integer predicate."""
    from morituri_spark.multimodal.edges import orientation_histogram

    return orientation_histogram(_gradient_images(spark, sf_dir, n=150))


def _orientation_hist_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        k(dx, dy, wx, wy) AS (VALUES
            (-1,-1,-1,-1),(0,-1,0,-2),(1,-1,1,-1),
            (-1,0,-2,0),(0,0,0,0),(1,0,2,0),
            (-1,1,-1,1),(0,1,0,2),(1,1,1,1)),
        sob AS (
            SELECT p.i, p.y, p.x,
                   sum(k.wx * q.g3) AS gx, sum(k.wy * q.g3) AS gy
            FROM pix p JOIN k ON TRUE
            JOIN pix q ON q.i = p.i AND q.y = p.y + k.dy AND q.x = p.x + k.dx
            WHERE p.y BETWEEN 1 AND 14 AND p.x BETWEEN 1 AND 14
            GROUP BY 1, 2, 3),
        classed AS (
            SELECT i,
                   (CASE WHEN gx > 0 THEN 1 ELSE 0 END)
                   + 2 * (CASE WHEN gy > 0 THEN 1 ELSE 0 END)
                   + 4 * (CASE WHEN abs(gx) >= abs(gy) THEN 1 ELSE 0 END)
                       AS octant,
                   abs(gx) + abs(gy) AS mag
            FROM sob WHERE gx <> 0 OR gy <> 0)
        SELECT printf('img%08d', i) AS image_id,
               CAST(octant AS BIGINT) AS octant,
               CAST(count(*) AS BIGINT) AS n_pixels,
               CAST(sum(mag) AS BIGINT) AS sum_mag
        FROM classed GROUP BY 1, 2
    """


def _q_frequent_pairs(spark, sf_dir):
    """Market-basket pair mining (text/basket.frequent_pairs): pair
    supports + lift in micro-units over closed-form baskets (500
    baskets × up to 20 items from event_id arithmetic), with the
    Apriori prune applied before pairing. The oracle brute-forces the
    deduped pair join and shares the lift expression."""
    from morituri_spark.text.basket import frequent_pairs

    ev = _read(spark, sf_dir, "events").where("event_id < 10000")
    baskets = ev.selectExpr(
        "event_id % 500 AS basket_id",
        "format_string('i%02d', (event_id * 7 + event_id % 13) % 40)"
        " AS item",
    )
    return frequent_pairs(baskets, min_support=3)


def _frequent_pairs_oracle_sql() -> str:
    return """
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 10000),
        bi AS (
            SELECT DISTINCT event_id % 500 AS b,
                   printf('i%02d', (event_id * 7 + event_id % 13) % 40)
                       AS i
            FROM ev),
        n AS (SELECT count(DISTINCT b) AS nb FROM bi),
        supp AS (SELECT i, count(*) AS s FROM bi GROUP BY i),
        pruned AS (
            SELECT bi.b, bi.i, supp.s
            FROM bi JOIN supp USING (i) WHERE supp.s >= 3),
        pairs AS (
            SELECT a.i AS item_a, c.i AS item_b, count(*) AS supp_ab,
                   max(a.s) AS sa, max(c.s) AS sb
            FROM pruned a JOIN pruned c ON c.b = a.b AND a.i < c.i
            GROUP BY 1, 2
            HAVING count(*) >= 3),
        staged AS (
            SELECT item_a, item_b, supp_ab,
                   (CAST(nb AS DOUBLE) * CAST(supp_ab AS DOUBLE))
                   / (CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) AS lift
            FROM pairs CROSS JOIN n)
        SELECT item_a, item_b, CAST(supp_ab AS BIGINT) AS supp_ab,
               CAST(floor(lift * 1e6 + 0.5 + 1e-8) AS BIGINT)
                   AS lift_micro
        FROM staged
    """


def _q_ridge_visibility(spark, sf_dir):
    """West-edge line-of-sight sweep (geo/terrain.ridge_visibility)
    over the same closed-form 40×24×24 keyed rasters as
    box_filter_grid: per-row visible-cell counts + membership checksum
    under the floor-quantized integer-slope contract (2²⁰ scale). The
    engine's running-max window is replayed by the oracle's ROWS frame;
    both engines share the exact floor-division expression."""
    from morituri_spark.geo.terrain import ridge_visibility

    ev = _read(spark, sf_dir, "events").where("event_id < 23040")
    dem = ev.selectExpr(
        "event_id % 40 AS g",
        "CAST(floor(event_id / 40.0) AS BIGINT) % 24 AS ix",
        "CAST(floor(event_id / 960.0) AS BIGINT) AS iy",
    ).selectExpr(
        "g", "ix", "iy",
        "(7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z",
    )
    return ridge_visibility(dem, eye_height=2, keys=["g"]).select(
        F.col("g").cast("long").alias("g"),
        F.col("iy").cast("long").alias("iy"),
        F.col("n_visible").cast("long").alias("n_visible"),
        F.col("chk_x").cast("long").alias("chk_x"),
    )


def _ridge_visibility_oracle_sql() -> str:
    return """
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 23040),
        cells AS (
            SELECT event_id % 40 AS g,
                   CAST(floor(event_id / 40.0) AS BIGINT) % 24 AS ix,
                   CAST(floor(event_id / 960.0) AS BIGINT) AS iy
            FROM ev),
        dem AS (
            SELECT g, ix, iy,
                   (7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z
            FROM cells),
        obs AS (SELECT g, iy, z + 2 AS h FROM dem WHERE ix = 0),
        st AS (
            SELECT d.g, d.iy, d.ix,
                   CASE WHEN d.ix > 0 THEN
                        CAST(floor(((d.z - o.h) * 1048576) / d.ix)
                             AS BIGINT)
                   END AS sq
            FROM dem d JOIN obs o ON o.g = d.g AND o.iy = d.iy),
        mk AS (
            SELECT g, iy, ix, sq,
                   max(sq) OVER (PARTITION BY g, iy ORDER BY ix
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS rm
            FROM st),
        vis AS (
            SELECT g, iy, ix,
                   (ix > 0 AND (rm IS NULL OR sq > rm)) AS v
            FROM mk)
        SELECT g, iy,
               CAST(sum(CASE WHEN v THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_visible,
               CAST(sum(CASE WHEN v THEN ix ELSE 0 END) AS BIGINT)
                   AS chk_x
        FROM vis GROUP BY 1, 2
    """


def _q_kn_bigram(spark, sf_dir):
    """Kneser-Ney bigram LM (text/lm.kn_bigram_probs): interpolated-KN
    probabilities for every observed bigram type of the documents
    corpus, in exact micro-units. The p_KN formula is ONE expression
    string shared verbatim between the engine (F.expr) and the oracle
    SQL over identical integer counts, so the doubles agree bitwise."""
    from morituri_spark.text.lm import kn_bigram_probs

    return kn_bigram_probs(_read(spark, sf_dir, "documents"))


def _kn_bigram_oracle_sql() -> str:
    from morituri_spark.text.lm import _KN_P_EXPR

    p_expr = _KN_P_EXPR.format(d="0.75")
    return f"""
        WITH toks AS (
            SELECT doc_id, t.term, t.pos
            FROM documents,
            LATERAL (
                SELECT unnest(regexp_split_to_array(lower(text),
                              '[^a-z0-9]+')) AS term,
                       generate_subscripts(regexp_split_to_array(lower(text),
                              '[^a-z0-9]+'), 1) AS pos
            ) t
            WHERE t.term <> ''),
        bg AS (
            SELECT doc_id, w1, w2 FROM (
                SELECT doc_id, term AS w1,
                       lead(term) OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS w2
                FROM toks)
            WHERE w2 IS NOT NULL),
        cbg AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
        cctx AS (
            SELECT w1, count(*) AS cctx, count(DISTINCT w2) AS n1fw
            FROM bg GROUP BY 1),
        n1bw AS (SELECT w2, count(*) AS n1bw FROM cbg GROUP BY 1),
        nbb AS (SELECT count(*) AS nbb FROM cbg),
        staged AS (
            SELECT w1, w2, cbg, {p_expr} AS p
            FROM cbg JOIN cctx USING (w1) JOIN n1bw USING (w2)
            CROSS JOIN nbb)
        SELECT w1, w2, CAST(cbg AS BIGINT) AS cbg,
               CAST(floor(p * 1e6 + 0.5 + 1e-8) AS BIGINT) AS p_micro
        FROM staged
    """


def _q_dag_longest(spark, sf_dir):
    """DAG critical path (graph/dag.py): per-node longest weighted path
    length from any in-degree-0 node, over a closed-form 120-node DAG
    (edges u → u+3..9, weights 1..5 from event_id arithmetic — forward
    edges only, so acyclicity is by construction). The engine relaxes
    max-plus by rounds with lineage truncation; the oracle explores the
    same graph with a recursive CTE and takes per-node max — iterative
    relaxation checked against exhaustive path enumeration."""
    from morituri_spark.graph.dag import longest_paths

    ev = _read(spark, sf_dir, "events").where("event_id < 1500")
    edges = ev.selectExpr(
        "event_id % 90 AS src",
        "event_id % 90 + 9 + event_id % 6 AS dst",
        "event_id % 5 + 1 AS w",
    ).where("dst < 90")
    # min edge span 9 on 90 nodes bounds the hop depth at 10 — the
    # known_depth fast path still verifies with a final fixpoint round
    return longest_paths(edges, max_rounds=60, known_depth=10).select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("dist"),
    )


def _dag_longest_oracle_sql() -> str:
    # rule 27: the edge relation is referenced by nodes/srcs/recursion —
    # AS MATERIALIZED stops DuckDB re-inlining the scan per reference
    return """
        WITH e AS MATERIALIZED (
            SELECT event_id % 90 AS src,
                   event_id % 90 + 9 + event_id % 6 AS dst,
                   event_id % 5 + 1 AS w
            FROM events
            WHERE event_id < 1500
              AND event_id % 90 + 9 + event_id % 6 < 90),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        srcs AS (
            SELECT node FROM nodes
            WHERE node NOT IN (SELECT dst FROM e)),
        paths AS (
            WITH RECURSIVE rr AS (
                SELECT node, 0 AS dist FROM srcs
                UNION
                SELECT e.dst AS node, rr.dist + e.w AS dist
                FROM rr JOIN e ON e.src = rr.node)
            SELECT node, max(dist) AS dist FROM rr GROUP BY node)
        SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
        FROM paths
    """


def _q_convoy(spark, sf_dir):
    """Convoy detection (geo/convoy.py): maximal consecutive-tick runs
    on which two entities stay within Chebyshev radius 2, over a
    closed-form 60-entity × 40-tick trajectory table (12 convoys of 5
    entities sharing a base path, with a modular perturbation that
    breaks runs). The engine finds candidates through the (tick, cell)
    equi-join with a ×9 probe-side explode; the oracle brute-forces the
    per-tick pairs and replays the gaps-and-islands window — two
    independent formulations of one relation."""
    from morituri_spark.geo.convoy import comovement_runs

    ev = _read(spark, sf_dir, "events").where("event_id < 2400")
    st1 = ev.selectExpr(
        "event_id % 60 AS eid",
        "CAST(floor(event_id / 60.0) AS BIGINT) AS t",
    )
    st2 = st1.selectExpr(
        "eid", "t", "eid % 12 AS g", "CAST(floor(eid / 12.0) AS BIGINT) AS k"
    )
    pts = st2.selectExpr(
        "eid",
        "t",
        "(13 * g + 4 * t) % 120 + k % 3"
        " + (CASE WHEN (eid + t) % 9 = 0 THEN 7 ELSE 0 END) AS x",
        "(7 * g + 3 * t) % 120 + k % 2 AS y",
    )
    return comovement_runs(
        pts, radius=2, min_len=3, id_col="eid", t_col="t"
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("start_t").cast("long").alias("start_t"),
        F.col("end_t").cast("long").alias("end_t"),
        F.col("run_len").cast("long").alias("run_len"),
    )


def _convoy_oracle_sql() -> str:
    return """
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 2400),
        st1 AS (
            SELECT event_id % 60 AS eid,
                   CAST(floor(event_id / 60.0) AS BIGINT) AS t
            FROM ev),
        st2 AS (
            SELECT eid, t, eid % 12 AS g,
                   CAST(floor(eid / 12.0) AS BIGINT) AS k
            FROM st1),
        pts AS (
            SELECT eid, t,
                   (13 * g + 4 * t) % 120 + k % 3
                   + (CASE WHEN (eid + t) % 9 = 0 THEN 7 ELSE 0 END) AS x,
                   (7 * g + 3 * t) % 120 + k % 2 AS y
            FROM st2),
        pairs AS (
            SELECT a.eid AS id_a, b.eid AS id_b, a.t
            FROM pts a JOIN pts b ON b.t = a.t AND a.eid < b.eid
            WHERE greatest(abs(a.x - b.x), abs(a.y - b.y)) <= 2),
        isl AS (
            SELECT id_a, id_b, t,
                   t - row_number() OVER (PARTITION BY id_a, id_b
                                          ORDER BY t) AS grp
            FROM pairs),
        runs AS (
            SELECT id_a, id_b, min(t) AS start_t, max(t) AS end_t,
                   count(*) AS run_len
            FROM isl GROUP BY id_a, id_b, grp)
        SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
               CAST(start_t AS BIGINT) AS start_t,
               CAST(end_t AS BIGINT) AS end_t,
               CAST(run_len AS BIGINT) AS run_len
        FROM runs WHERE run_len >= 3
    """


def _q_median_filter(spark, sf_dir):
    """3×3 median filter (multimodal/filters.py): per-image exact stats
    of the median-filtered g3 field over the valid interior of REAL PNG
    payloads — population, Σ median, position-weighted checksum, min and
    max. The median is the 5th-smallest of nine integers (a pure order
    statistic — duplicate values cannot make it engine-dependent), so
    the oracle's 9-neighbor-join + row_number()=5 replay is bit-exact."""
    from morituri_spark.multimodal.filters import median_filter_stats

    return median_filter_stats(_gradient_images(spark, sf_dir, n=120))


def _median_filter_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 120),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        nine AS (
            SELECT p.i, p.y, p.x, q.g3,
                   row_number() OVER (PARTITION BY p.i, p.y, p.x
                                      ORDER BY q.g3, q.y, q.x) AS rk
            FROM pix p JOIN pix q
              ON q.i = p.i AND q.y BETWEEN p.y - 1 AND p.y + 1
                           AND q.x BETWEEN p.x - 1 AND p.x + 1
            WHERE p.y BETWEEN 1 AND 14 AND p.x BETWEEN 1 AND 14),
        med AS (SELECT i, y, x, g3 AS m FROM nine WHERE rk = 5)
        SELECT printf('img%08d', i) AS image_id,
               CAST(count(*) AS BIGINT) AS n_interior,
               CAST(sum(m) AS BIGINT) AS sum_med,
               CAST(sum((y * 16 + x + 1) * m) AS BIGINT) AS chk_pos,
               CAST(min(m) AS BIGINT) AS min_med,
               CAST(max(m) AS BIGINT) AS max_med
        FROM med GROUP BY 1
    """


def _q_template_match(spark, sf_dir):
    """SAD template matching (multimodal/filters.py): per image the
    best fully-in-bounds placement of the closed-form 4×4 integer
    template under the total order (sad ASC, y0, x0) over REAL PNG
    payloads. The oracle regenerates the template with generate_series,
    scores every offset as a grouped |diff| sum, and ranks with
    row_number() under the same order."""
    from morituri_spark.multimodal.filters import template_match_sad

    return template_match_sad(_gradient_images(spark, sf_dir, n=100))


def _template_match_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 100),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        t AS (
            SELECT u, v, ((7 * u + 11 * v + 13) * 17) % 766 AS tv
            FROM generate_series(0, 3) us(u), generate_series(0, 3) vs(v)),
        offs AS (
            SELECT y0, x0
            FROM generate_series(0, 12) a(y0), generate_series(0, 12) b(x0)),
        scores AS (
            SELECT p.i, o.y0, o.x0, sum(abs(p.g3 - t.tv)) AS sad
            FROM offs o JOIN t ON TRUE
            JOIN pix p ON p.y = o.y0 + t.u AND p.x = o.x0 + t.v
            GROUP BY 1, 2, 3),
        ranked AS (
            SELECT i, y0, x0, sad,
                   row_number() OVER (PARTITION BY i
                                      ORDER BY sad, y0, x0) AS rk
            FROM scores)
        SELECT printf('img%08d', i) AS image_id,
               CAST(y0 AS BIGINT) AS y0, CAST(x0 AS BIGINT) AS x0,
               CAST(sad AS BIGINT) AS sad
        FROM ranked WHERE rk = 1
    """


def _q_blob_stats(spark, sf_dir):
    """Blob analysis (multimodal/blobs.py): per-image 4-connected
    component labeling of the g3>=384 mask over REAL PNG payloads, each
    component named by its smallest row-major pixel index (a total
    deterministic naming, no tie rule needed) with exact integer
    size/bbox/centroid-sum stats. The oracle re-derives the mask from
    the gradient closed form and reproduces the labeling with a
    recursive-CTE min-label propagation (the dbscan_points evidence
    class) — the general algorithm checked against an independent
    fixpoint formulation, not a closed-form special case."""
    from morituri_spark.multimodal.blobs import blob_stats

    return blob_stats(_gradient_images(spark, sf_dir, n=150), threshold=384)


def _q_morphology(spark, sf_dir):
    """Binary morphology (multimodal/morphology.py): per-image 3×3
    erode/dilate/opening/closing of the g3>=384 mask over REAL PNG
    payloads, with exact populations AND position-weighted membership
    checksums (Σ (y·W+x+1) over set pixels — a single shifted pixel flips
    them). Border convention outside-is-0 is pinned in both engines. The
    oracle re-derives the mask from the gradient closed form and replays
    each operator as a 3×3 neighborhood self-join min/max."""
    from morituri_spark.multimodal.morphology import morphology_stats

    return morphology_stats(_gradient_images(spark, sf_dir, n=150), threshold=384)


def _morphology_oracle_sql() -> str:
    """Each morphology stage is one 3×3 neighborhood self-join (min for
    erode with the border CASE, max for dilate); opening/closing chain
    the staged relations. All-integer arithmetic end to end."""

    def _erode(src: str, name: str) -> str:
        return f"""
            {name} AS (
                SELECT p.i, p.y, p.x,
                       CASE WHEN p.y > 0 AND p.y < 15 AND p.x > 0 AND p.x < 15
                            THEN min(q.m) ELSE 0 END AS m
                FROM {src} p JOIN {src} q
                  ON q.i = p.i AND q.y BETWEEN p.y - 1 AND p.y + 1
                               AND q.x BETWEEN p.x - 1 AND p.x + 1
                GROUP BY p.i, p.y, p.x)"""

    def _dilate(src: str, name: str) -> str:
        return f"""
            {name} AS (
                SELECT p.i, p.y, p.x, max(q.m) AS m
                FROM {src} p JOIN {src} q
                  ON q.i = p.i AND q.y BETWEEN p.y - 1 AND p.y + 1
                               AND q.x BETWEEN p.x - 1 AND p.x + 1
                GROUP BY p.i, p.y, p.x)"""

    def _agg(src: str, n: str, chk: str | None) -> str:
        cols = f"CAST(sum(m) AS BIGINT) AS {n}"
        if chk:
            cols += f", CAST(sum(m * (y * 16 + x + 1)) AS BIGINT) AS {chk}"
        return f"(SELECT i, {cols} FROM {src} GROUP BY i)"

    return f"""
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   CASE WHEN (i + 2 * y + 3 * x) % 256
                             + (2 * i + y + 5 * x) % 256
                             + (3 * i + 4 * y + x) % 256 >= 384
                        THEN 1 ELSE 0 END AS m
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),{_erode("pix", "er")},{_dilate("pix", "di")},{_dilate("er", "op")},{_erode("di", "cl")}
        SELECT printf('img%08d', am.i) AS image_id,
               am.n_mask, ae.n_erode, ad.n_dilate, ao.n_open, ac.n_close,
               am.chk_mask, ao.chk_open, ac.chk_close
        FROM {_agg("pix", "n_mask", "chk_mask")} am
        JOIN {_agg("er", "n_erode", None)} ae ON ae.i = am.i
        JOIN {_agg("di", "n_dilate", None)} ad ON ad.i = am.i
        JOIN {_agg("op", "n_open", "chk_open")} ao ON ao.i = am.i
        JOIN {_agg("cl", "n_close", "chk_close")} ac ON ac.i = am.i
    """


# --- per-key time-series diagnostics (operators/timeseries.py) -----------
# Shared closed-form fixture: 200 keys × up to 48 ticks from event_id
# arithmetic, with a planted mean shift (at tick 16 + key % 17) and a
# planted cycle (period 2 + key % 4) on top of a modular noise floor —
# every value an exact integer both engines rebuild identically.
_TS_V = (
    "(3 * t + 5 * key) % 17"
    " + (CASE WHEN t >= 16 + key % 17 THEN 8 ELSE 0 END)"
    " + (CASE WHEN t % (2 + key % 4) = 0 THEN 6 ELSE 0 END)"
)


def _ts_series(spark, sf_dir):
    ev = _read(spark, sf_dir, "events").where("event_id < 9600")
    return ev.selectExpr(
        "event_id % 200 AS key",
        "CAST(floor(event_id / 200.0) AS BIGINT) AS t",
    ).selectExpr("key", "t", f"{_TS_V} AS v")


_TS_SER_SQL = f"""
        ev AS (SELECT event_id FROM events WHERE event_id < 9600),
        ser AS (
            SELECT key, t, {_TS_V} AS v
            FROM (SELECT event_id % 200 AS key,
                         CAST(floor(event_id / 200.0) AS BIGINT) AS t
                  FROM ev))
"""


def _q_cusum(spark, sf_dir):
    """Scaled-CUSUM changepoint detection (operators/timeseries.
    cusum_changepoints): per key, the rank maximizing |n·P_r − r·S|
    (earliest on ties) over the planted-mean-shift series — the
    denominators-cleared mean-shift detector, exact integers end to
    end. The oracle replays the prefix-sum window and the argmax via
    QUALIFY row_number."""
    from morituri_spark.operators.timeseries import cusum_changepoints

    return cusum_changepoints(_ts_series(spark, sf_dir)).select(
        F.col("key").cast("long").alias("key"),
        F.col("n").cast("long").alias("n"),
        F.col("cp_rank").cast("long").alias("cp_rank"),
        F.col("cp_t").cast("long").alias("cp_t"),
        F.col("cusum_abs_max").cast("long").alias("cusum_abs_max"),
    )


def _cusum_oracle_sql() -> str:
    return f"""
        WITH {_TS_SER_SQL},
        st AS (
            SELECT key, t,
                   sum(v) OVER (PARTITION BY key ORDER BY t) AS p,
                   row_number() OVER (PARTITION BY key ORDER BY t) AS r,
                   count(*) OVER (PARTITION BY key) AS n,
                   sum(v) OVER (PARTITION BY key) AS s
            FROM ser),
        c AS (SELECT key, t, r, n, n * p - r * s AS c FROM st)
        SELECT CAST(key AS BIGINT) AS key, CAST(n AS BIGINT) AS n,
               CAST(r AS BIGINT) AS cp_rank, CAST(t AS BIGINT) AS cp_t,
               CAST(abs(c) AS BIGINT) AS cusum_abs_max
        FROM c
        QUALIFY row_number() OVER (PARTITION BY key
                                   ORDER BY abs(c) DESC, r ASC) = 1
    """


def _q_acf(spark, sf_dir):
    """Exact-integer autocorrelation (operators/timeseries.acf_lags):
    per (key, lag ∈ 1..3) the mean-cleared numerator
    Σ(n·v_t − S)(n·v_{t+ℓ} − S), denominator n·(n·Σv² − S²), and the
    rule-16 micro-rounded ratio. The oracle replays the lead() window
    and shares the rounding expression."""
    from morituri_spark.operators.timeseries import acf_lags

    return acf_lags(_ts_series(spark, sf_dir), max_lag=3).select(
        F.col("key").cast("long").alias("key"),
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.col("num").cast("long").alias("num"),
        F.col("den").cast("long").alias("den"),
        "acf_micro",
    )


def _acf_oracle_sql() -> str:
    return f"""
        WITH {_TS_SER_SQL},
        st AS (
            SELECT key, v,
                   lead(v, 1) OVER (PARTITION BY key ORDER BY t) AS w1,
                   lead(v, 2) OVER (PARTITION BY key ORDER BY t) AS w2,
                   lead(v, 3) OVER (PARTITION BY key ORDER BY t) AS w3,
                   count(*) OVER (PARTITION BY key) AS n,
                   sum(v) OVER (PARTITION BY key) AS s,
                   sum(v * v) OVER (PARTITION BY key) AS q
            FROM ser),
        terms AS (
            SELECT key, lag, n, s, q,
                   CASE lag WHEN 1 THEN (n * v - s) * (n * w1 - s)
                            WHEN 2 THEN (n * v - s) * (n * w2 - s)
                            ELSE (n * v - s) * (n * w3 - s) END AS term
            FROM st CROSS JOIN (VALUES (1), (2), (3)) lags(lag)),
        agg AS (
            SELECT key, lag, max(n) AS n,
                   sum(term) AS num,
                   max(n) * (max(n) * max(q) - max(s) * max(s)) AS den
            FROM terms GROUP BY 1, 2)
        SELECT CAST(key AS BIGINT) AS key, CAST(lag AS BIGINT) AS lag,
               CAST(n AS BIGINT) AS n, CAST(num AS BIGINT) AS num,
               CAST(den AS BIGINT) AS den,
               CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6
                          + 0.5 + 1e-8) AS BIGINT) AS acf_micro
        FROM agg WHERE den <> 0
    """


def _q_dominant_period(spark, sf_dir):
    """Folded dominant-period detection (operators/timeseries.
    dominant_period): per key, argmax over candidate periods
    {2,3,4,6,8} of the integer fold score p·Σ_phase S_phase²
    (smallest p on ties) — the variance-of-phase-means order when
    candidates divide the series length, exact integer max_by. The
    oracle folds via t % p over a VALUES list and replays the argmax
    with QUALIFY."""
    from morituri_spark.operators.timeseries import dominant_period

    return dominant_period(_ts_series(spark, sf_dir), periods=(2, 3, 4, 6, 8)).select(
        F.col("key").cast("long").alias("key"),
        F.col("best_p").cast("long").alias("best_p"),
        F.col("best_score").cast("long").alias("best_score"),
        F.col("n").cast("long").alias("n"),
    )


def _dominant_period_oracle_sql() -> str:
    return f"""
        WITH {_TS_SER_SQL},
        ph AS (
            SELECT key, p, t % p AS phase, sum(v) AS sp, count(*) AS np
            FROM ser CROSS JOIN (VALUES (2), (3), (4), (6), (8)) ps(p)
            GROUP BY 1, 2, 3),
        sc AS (
            SELECT key, p, p * sum(sp * sp) AS score, sum(np) AS n
            FROM ph GROUP BY 1, 2)
        SELECT CAST(key AS BIGINT) AS key, CAST(p AS BIGINT) AS best_p,
               CAST(score AS BIGINT) AS best_score, CAST(n AS BIGINT) AS n
        FROM sc
        QUALIFY row_number() OVER (PARTITION BY key
                                   ORDER BY score DESC, p ASC) = 1
    """


# --- pipeline-plumbing family (fifteenth session) -------------------------


def _q_scd2(spark, sf_dir):
    """Type-2 SCD history build (operators/history.scd2_intervals):
    collapse a 300-key change-event log (value steps every 4 ticks)
    into validity intervals — null-safe run edges via lag(), intervals
    closed by lead(), 1-based versions, open-interval current flag.
    The oracle replays the same two windows."""
    from morituri_spark.operators.history import scd2_intervals

    ev = _read(spark, sf_dir, "events").where("event_id < 9600")
    log = ev.selectExpr(
        "event_id % 300 AS key",
        "CAST(floor(event_id / 300.0) AS BIGINT) AS ts",
    ).selectExpr(
        "key", "ts", "(3 * CAST(floor(ts / 4.0) AS BIGINT) + key) % 5 AS v"
    )
    return scd2_intervals(log, key_col="key", ts_col="ts", val_cols=("v",)).select(
        F.col("key").cast("long").alias("key"),
        F.col("v").cast("long").alias("v"),
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        F.col("version").cast("long").alias("version"),
        "is_current",
    )


def _scd2_oracle_sql() -> str:
    return """
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 9600),
        base AS (
            SELECT event_id % 300 AS key,
                   CAST(floor(event_id / 300.0) AS BIGINT) AS ts
            FROM ev),
        ser AS (
            SELECT key, ts,
                   (3 * CAST(floor(ts / 4.0) AS BIGINT) + key) % 5 AS v
            FROM base),
        flag AS (
            SELECT key, ts, v,
                   row_number() OVER w AS rn,
                   lag(v) OVER w AS pv
            FROM ser WINDOW w AS (PARTITION BY key ORDER BY ts)),
        edges AS (
            SELECT key, ts, v FROM flag
            WHERE rn = 1 OR v IS DISTINCT FROM pv),
        iv AS (
            SELECT key, v, ts AS valid_from,
                   lead(ts) OVER w2 AS valid_to,
                   row_number() OVER w2 AS version
            FROM edges WINDOW w2 AS (PARTITION BY key ORDER BY ts))
        SELECT CAST(key AS BIGINT) AS key, CAST(v AS BIGINT) AS v,
               CAST(valid_from AS BIGINT) AS valid_from,
               CAST(valid_to AS BIGINT) AS valid_to,
               CAST(version AS BIGINT) AS version,
               valid_to IS NULL AS is_current
        FROM iv
    """


def _q_snm_pairs(spark, sf_dir):
    """Sorted-neighborhood ER blocking (text/blocking.
    sorted_neighborhood_pairs): candidate pairs at sort-rank distance
    ≤ 3 within 7 blocks of the documents table, sort key a colliding
    modular string so the id tie-break is exercised. The oracle
    replays the lead() window with a VALUES-unrolled stack."""
    from morituri_spark.text.blocking import sorted_neighborhood_pairs

    recs = _read(spark, sf_dir, "documents").selectExpr(
        "doc_id AS id",
        "doc_id % 7 AS blk",
        "concat('k', lpad(CAST((doc_id * 13) % 97 AS STRING), 3, '0')) AS sk",
    )
    return sorted_neighborhood_pairs(
        recs, id_col="id", sort_col="sk", block_col="blk", window=4
    ).select(
        F.col("blk").cast("long").alias("blk"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "sk_a",
        "sk_b",
        F.col("rank_dist").cast("long").alias("rank_dist"),
    )


def _snm_oracle_sql() -> str:
    return """
        WITH recs AS (
            SELECT doc_id AS id, doc_id % 7 AS blk,
                   'k' || lpad(CAST((doc_id * 13) % 97 AS VARCHAR), 3, '0')
                       AS sk
            FROM documents),
        st AS (
            SELECT blk, id, sk,
                   lead(id, 1) OVER w AS id1, lead(sk, 1) OVER w AS sk1,
                   lead(id, 2) OVER w AS id2, lead(sk, 2) OVER w AS sk2,
                   lead(id, 3) OVER w AS id3, lead(sk, 3) OVER w AS sk3
            FROM recs WINDOW w AS (PARTITION BY blk ORDER BY sk, id)),
        pairs AS (
            SELECT blk, id AS id_a, sk AS sk_a, d AS rank_dist,
                   CASE d WHEN 1 THEN id1 WHEN 2 THEN id2 ELSE id3 END
                       AS id_b,
                   CASE d WHEN 1 THEN sk1 WHEN 2 THEN sk2 ELSE sk3 END
                       AS sk_b
            FROM st CROSS JOIN (VALUES (1), (2), (3)) ds(d))
        SELECT CAST(blk AS BIGINT) AS blk, CAST(id_a AS BIGINT) AS id_a,
               CAST(id_b AS BIGINT) AS id_b, sk_a, sk_b,
               CAST(rank_dist AS BIGINT) AS rank_dist
        FROM pairs WHERE id_b IS NOT NULL
    """


def _q_cardinal_viewshed(spark, sf_dir):
    """Per-cell 4-direction viewshed (geo/terrain.cardinal_viewshed)
    over eight 24×20 keyed rasters: W/E/N/S edge observers, the shared
    floor-quantized integer-slope contract (2²⁰ scale), dir_mask packs
    W=1 E=2 N=4 S=8. The oracle replays the four running-max windows
    and both anchor stages."""
    from morituri_spark.geo.terrain import cardinal_viewshed

    ev = _read(spark, sf_dir, "events").where("event_id < 3840")
    dem = ev.selectExpr(
        "event_id % 8 AS g",
        "CAST(floor(event_id / 8.0) AS BIGINT) % 24 AS ix",
        "CAST(floor(event_id / 192.0) AS BIGINT) AS iy",
    ).selectExpr(
        "g", "ix", "iy",
        "(7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z",
    )
    return cardinal_viewshed(dem, eye_height=2, keys=["g"]).select(
        F.col("g").cast("long").alias("g"),
        F.col("ix").cast("long").alias("ix"),
        F.col("iy").cast("long").alias("iy"),
        F.col("dir_mask").cast("long").alias("dir_mask"),
        F.col("n_dirs").cast("long").alias("n_dirs"),
    )


def _cardinal_viewshed_oracle_sql() -> str:
    return """
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 3840),
        cells AS (
            SELECT event_id % 8 AS g,
                   CAST(floor(event_id / 8.0) AS BIGINT) % 24 AS ix,
                   CAST(floor(event_id / 192.0) AS BIGINT) AS iy
            FROM ev),
        dem AS (
            SELECT g, ix, iy,
                   (7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z
            FROM cells),
        a AS (
            SELECT g, ix, iy, z,
                   max(ix) OVER wr AS xmax,
                   max(CASE WHEN ix = 0 THEN z END) OVER wr + 2 AS hw,
                   max(iy) OVER wc AS ymax,
                   max(CASE WHEN iy = 0 THEN z END) OVER wc + 2 AS hn
            FROM dem
            WINDOW wr AS (PARTITION BY g, iy), wc AS (PARTITION BY g, ix)),
        b AS (
            SELECT *,
                   max(CASE WHEN ix = xmax THEN z END)
                       OVER (PARTITION BY g, iy) + 2 AS he,
                   max(CASE WHEN iy = ymax THEN z END)
                       OVER (PARTITION BY g, ix) + 2 AS hs
            FROM a),
        sq AS (
            SELECT g, ix, iy,
                   CASE WHEN ix > 0 THEN
                        CAST(floor(((z - hw) * 1048576) / ix) AS BIGINT)
                   END AS sqw,
                   CASE WHEN xmax - ix > 0 THEN
                        CAST(floor(((z - he) * 1048576) / (xmax - ix))
                             AS BIGINT)
                   END AS sqe,
                   CASE WHEN iy > 0 THEN
                        CAST(floor(((z - hn) * 1048576) / iy) AS BIGINT)
                   END AS sqn,
                   CASE WHEN ymax - iy > 0 THEN
                        CAST(floor(((z - hs) * 1048576) / (ymax - iy))
                             AS BIGINT)
                   END AS sqs
            FROM b),
        mk AS (
            SELECT g, ix, iy, sqw, sqe, sqn, sqs,
                   max(sqw) OVER (PARTITION BY g, iy ORDER BY ix ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS rw,
                   max(sqe) OVER (PARTITION BY g, iy ORDER BY ix DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS re,
                   max(sqn) OVER (PARTITION BY g, ix ORDER BY iy ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS rn_,
                   max(sqs) OVER (PARTITION BY g, ix ORDER BY iy DESC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS rs
            FROM sq),
        m AS (
            SELECT g, ix, iy,
                   CASE WHEN sqw IS NOT NULL AND (rw IS NULL OR sqw > rw)
                        THEN 1 ELSE 0 END
                 + CASE WHEN sqe IS NOT NULL AND (re IS NULL OR sqe > re)
                        THEN 2 ELSE 0 END
                 + CASE WHEN sqn IS NOT NULL AND (rn_ IS NULL OR sqn > rn_)
                        THEN 4 ELSE 0 END
                 + CASE WHEN sqs IS NOT NULL AND (rs IS NULL OR sqs > rs)
                        THEN 8 ELSE 0 END AS dir_mask
            FROM mk)
        SELECT CAST(g AS BIGINT) AS g, CAST(ix AS BIGINT) AS ix,
               CAST(iy AS BIGINT) AS iy,
               CAST(dir_mask AS BIGINT) AS dir_mask,
               CAST((dir_mask & 1) + ((dir_mask >> 1) & 1)
                    + ((dir_mask >> 2) & 1) + ((dir_mask >> 3) & 1)
                    AS BIGINT) AS n_dirs
        FROM m
    """


def _q_streaming_sessionize(spark, sf_dir):
    """§2.8 streaming sessionization (streaming/pipeline.
    streaming_sessionize): the batch session_window operator under a
    watermark, drained availableNow in complete mode over one file →
    one micro-batch. Gap rule inherited (inclusive merge bound, rule
    11), so the oracle's new-session test is strict `>`."""
    import tempfile

    from morituri_spark.streaming.pipeline import (
        run_available_now, stream_images, streaming_sessionize,
    )

    ev = _read(spark, sf_dir, "events").where("event_id % 3 = 0").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    d = tempfile.mkdtemp(prefix="stream_sess_")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    stream = stream_images(spark, d, ev.schema, max_files_per_trigger=64)
    sess = streaming_sessionize(
        stream, gap="30 minutes", watermark="1 minute"
    )
    _STREAM_RUNS[0] += 1
    name = f"drv_stream_sess_{_STREAM_RUNS[0]}"
    q = run_available_now(sess, query_name=name, output_mode="complete")
    q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        F.col("duration_s").cast("long").alias("duration_s"),
    )


def _streaming_sessionize_oracle_sql() -> str:
    return """
        WITH src AS (
            SELECT user_id, ts, event_id FROM events WHERE event_id % 3 = 0),
        flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM src
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, new_s DESC
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
                   AS duration_s
        FROM sess GROUP BY user_id, sid
    """


# --- sixteenth session: FAST corners, geofence visits, merge upsert -------


def _block_images(spark, sf_dir, n: int = 150, w: int = 16, h: int = 16):
    """Real-PNG images with ONE closed-form bright rectangle per image
    (bounds vary with i) — rectangle corners are the classic FAST
    segment-test targets; a smooth gradient never fires (a linear ramp
    lights at most half the circle, 8 < 9 contiguous). Channels are 200
    inside / 30 outside → g3 = 600 / 90, a 510 step ≫ t."""
    import numpy as np
    import pandas as pd

    from morituri_spark.sources import images as I

    ev = _read(spark, sf_dir, "events").where(f"event_id < {n}")
    base = ev.select(F.col("event_id").alias("i"))

    def gen(batches):
        ys, xs = np.mgrid[0:h, 0:w]
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            for i in pdf["i"]:
                i = int(i)
                a, c = 2 + i % 5, 3 + (i * 2) % 5
                inside = (ys >= a) & (ys < a + 6) & (xs >= c) & (xs < c + 7)
                arr = np.full((h, w, 3), 30, dtype=np.uint8)
                arr[inside] = 200
                rows["image_id"].append(f"img{i:08d}")
                rows["bytes"].append(I.encode(arr, "png"))
                rows["fmt"].append("png")
                rows["w"].append(w)
                rows["h"].append(h)
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen, "image_id string, bytes binary, fmt string, w int, h int"
    )


def _q_fast_corners(spark, sf_dir):
    """FAST-9 segment-test corners (multimodal/corners.fast_corners)
    over real PNG payloads of per-image closed-form rectangles (whose
    corners actually fire the detector): counts + membership checksum
    under the all-integer bitmask arc test (m·65537 doubles the circle
    so every circular window is one shift). The oracle replays the
    16-offset circle as a VALUES join and the identical 16-term
    shift-mask OR."""
    from morituri_spark.multimodal.corners import fast_corners

    return fast_corners(_block_images(spark, sf_dir, n=150), t=30, arc=9)


def _fast_oracle_sql() -> str:
    from morituri_spark.multimodal.corners import FAST_CIRCLE

    offs = ", ".join(
        f"({j}, {dx}, {dy})" for j, (dx, dy) in enumerate(FAST_CIRCLE)
    )
    bright = " OR ".join(
        f"(((bm * 65537) >> {s}) & 511 = 511)" for s in range(16)
    )
    dark = " OR ".join(
        f"(((dm * 65537) >> {s}) & 511 = 511)" for s in range(16)
    )
    return f"""
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   CASE WHEN y >= 2 + i % 5 AND y < 2 + i % 5 + 6
                         AND x >= 3 + (i * 2) % 5 AND x < 3 + (i * 2) % 5 + 7
                        THEN 600 ELSE 90 END AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        c AS (
            SELECT p.i, p.y, p.x,
                   sum(CASE WHEN q.g3 > p.g3 + 30 THEN 1 << o.j
                            ELSE 0 END) AS bm,
                   sum(CASE WHEN q.g3 < p.g3 - 30 THEN 1 << o.j
                            ELSE 0 END) AS dm
            FROM pix p
            JOIN (VALUES {offs}) o(j, dx, dy) ON TRUE
            JOIN pix q ON q.i = p.i AND q.y = p.y + o.dy
                       AND q.x = p.x + o.dx
            WHERE p.y BETWEEN 3 AND 12 AND p.x BETWEEN 3 AND 12
            GROUP BY 1, 2, 3),
        f AS (
            SELECT i, y, x, ({bright}) AS bright, ({dark}) AS dark
            FROM c)
        SELECT printf('img%08d', i) AS image_id,
               CAST(sum(CASE WHEN bright OR dark THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_corners,
               CAST(sum(CASE WHEN bright THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bright,
               CAST(sum(CASE WHEN dark THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dark,
               CAST(sum(CASE WHEN bright OR dark THEN y * 16 + x ELSE 0 END)
                    AS BIGINT) AS chk_yx
        FROM f GROUP BY 1
    """


def _q_geofence(spark, sf_dir):
    """Geofence visit mining (geo/trajectory.geofence_visits): 50
    closed-form tracks crossing the rect-zone grid (and leaving it —
    lon runs to 34.9° vs the grid's 25°), collapsed into visit runs
    with enter/exit/dwell. Membership is the literal-edge ray-cast;
    on these half-open rectangles the oracle's bbox join replays it
    exactly (the pip_* evidence class)."""
    from morituri_spark.geo.trajectory import geofence_visits

    ev = _read(spark, sf_dir, "events").where("event_id < 5000")
    pts = ev.selectExpr(
        "event_id % 50 AS key",
        "CAST(floor(event_id / 50.0) AS BIGINT) AS t",
    ).selectExpr(
        "key",
        "t",
        "CAST((key * 7 + t) % 350 AS DOUBLE) / 10.0 AS lon",
        "40.0 + CAST((key * 3 + 2 * t) % 250 AS DOUBLE) / 10.0 AS lat",
    )
    zone_rows = [
        (r["zone_id"], r["rings"]) for r in _rect_zones(spark).collect()
    ]
    return geofence_visits(pts, zone_rows).select(
        F.col("key").cast("long").alias("key"),
        F.col("visit").cast("long").alias("visit"),
        F.col("zone_id").cast("long").alias("zone_id"),
        F.col("enter_t").cast("long").alias("enter_t"),
        F.col("exit_t").cast("long").alias("exit_t"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("dwell").cast("long").alias("dwell"),
    )


def _geofence_oracle_sql() -> str:
    return f"""
        WITH ev AS (SELECT event_id FROM events WHERE event_id < 5000),
        base AS (
            SELECT event_id % 50 AS key,
                   CAST(floor(event_id / 50.0) AS BIGINT) AS t
            FROM ev),
        pts AS (
            SELECT key, t,
                   CAST((key * 7 + t) % 350 AS DOUBLE) / 10.0 AS lon,
                   40.0 + CAST((key * 3 + 2 * t) % 250 AS DOUBLE) / 10.0
                       AS lat
            FROM base),
        zoned AS (
            SELECT p.key, p.t, min(z.zone_id) AS zone_id
            FROM pts p LEFT JOIN (VALUES {_ZONES_SQL})
                 z(zone_id, x0, y0, x1, y1)
              ON p.lon >= z.x0 AND p.lon < z.x1
             AND p.lat >= z.y0 AND p.lat < z.y1
            GROUP BY 1, 2),
        flag AS (
            SELECT key, t, zone_id,
                   CASE WHEN row_number() OVER w = 1
                             OR zone_id IS DISTINCT FROM lag(zone_id) OVER w
                        THEN 1 ELSE 0 END AS new_r
            FROM zoned WINDOW w AS (PARTITION BY key ORDER BY t)),
        runs AS (
            SELECT key, t, zone_id,
                   sum(new_r) OVER (PARTITION BY key ORDER BY t
                                    ROWS UNBOUNDED PRECEDING) AS visit
            FROM flag),
        agg AS (
            SELECT key, visit, max(zone_id) AS zone_id,
                   min(t) AS enter_t, count(*) AS n_points
            FROM runs GROUP BY 1, 2),
        fin AS (
            SELECT key, visit, zone_id, enter_t,
                   lead(enter_t) OVER (PARTITION BY key ORDER BY visit)
                       AS exit_t,
                   n_points
            FROM agg)
        SELECT CAST(key AS BIGINT) AS key, CAST(visit AS BIGINT) AS visit,
               CAST(zone_id AS BIGINT) AS zone_id,
               CAST(enter_t AS BIGINT) AS enter_t,
               CAST(exit_t AS BIGINT) AS exit_t,
               CAST(n_points AS BIGINT) AS n_points,
               CAST(exit_t - enter_t AS BIGINT) AS dwell
        FROM fin
    """


def _q_merge_upsert(spark, sf_dir):
    """MERGE-INTO upsert (operators/history.merge_upsert): a CDC batch
    derived from orders (every 7th change a delete, every 5th an
    insert under a shifted key, latest o_orderkey wins per key) applied
    to the customer snapshot. The oracle replays latest-change with
    row_number DESC + the full-outer CASE."""
    from morituri_spark.operators.history import merge_upsert

    snap = _read(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS key", "c_mktsegment AS v"
    )
    chg = _read(spark, sf_dir, "orders").selectExpr(
        "CASE WHEN o_orderkey % 5 = 0 THEN 1000000 + o_custkey"
        " ELSE o_custkey END AS key",
        "CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op",
        "o_orderkey AS seq",
        "o_orderstatus AS v",
    )
    return merge_upsert(snap, chg).select(
        F.col("key").cast("long").alias("key"), "v"
    )


def _merge_upsert_oracle_sql() -> str:
    return """
        WITH snap AS (SELECT c_custkey AS key, c_mktsegment AS v
                      FROM customer),
        chg AS (
            SELECT CASE WHEN o_orderkey % 5 = 0 THEN 1000000 + o_custkey
                        ELSE o_custkey END AS key,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
                   o_orderkey AS seq, o_orderstatus AS v
            FROM orders),
        latest AS (
            SELECT key, op, v FROM (
                SELECT key, op, v,
                       row_number() OVER (PARTITION BY key
                                          ORDER BY seq DESC) AS rn
                FROM chg) WHERE rn = 1)
        SELECT CAST(coalesce(s.key, l.key) AS BIGINT) AS key,
               CASE WHEN l.key IS NOT NULL THEN l.v ELSE s.v END AS v
        FROM snap s FULL OUTER JOIN latest l ON s.key = l.key
        WHERE l.key IS NULL OR l.op = 'U'
    """


def _q_brief_descriptors(spark, sf_dir):
    """BRIEF binary descriptors (multimodal/corners.brief_descriptors) at
    the top-5 Harris corners of the closed-form gradient images: bit j =
    [g3[p+a_j] < g3[p+b_j]] over the pinned deterministic sampling
    pattern, packed into ONE positive int64 (n_bits=56). The oracle
    replays Sobel + the structure-tensor window as 3×3 joins (the
    harris_corners_topk evidence class), restricts the rank domain to
    the patch interior (y, x ∈ [4, 11] at patch=4), and rebuilds the
    descriptor as a VALUES join over the same literal pattern."""
    from morituri_spark.multimodal.corners import brief_descriptors

    return brief_descriptors(
        _gradient_images(spark, sf_dir, n=150), k=5, n_bits=56, patch=4
    )


def _brief_oracle_sql() -> str:
    from morituri_spark.multimodal.corners import _brief_pattern

    pat = ", ".join(
        f"({j}, {ay}, {ax}, {by}, {bx})"
        for j, ((ay, ax), (by, bx)) in enumerate(_brief_pattern(56, 4))
    )
    return f"""
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        pix AS (
            SELECT i, y, x,
                   (i + 2 * y + 3 * x) % 256
                   + (2 * i + y + 5 * x) % 256
                   + (3 * i + 4 * y + x) % 256 AS g3
            FROM ids, generate_series(0, 15) ys(y),
                 generate_series(0, 15) xs(x)),
        k(dx, dy, wx, wy) AS (VALUES
            (-1,-1,-1,-1),(0,-1,0,-2),(1,-1,1,-1),
            (-1,0,-2,0),(0,0,0,0),(1,0,2,0),
            (-1,1,-1,1),(0,1,0,2),(1,1,1,1)),
        sob AS (
            SELECT p.i, p.y, p.x,
                   sum(k.wx * q.g3) AS gx, sum(k.wy * q.g3) AS gy
            FROM pix p JOIN k ON TRUE
            JOIN pix q ON q.i = p.i AND q.y = p.y + k.dy AND q.x = p.x + k.dx
            WHERE p.y BETWEEN 1 AND 14 AND p.x BETWEEN 1 AND 14
            GROUP BY 1, 2, 3),
        win AS (
            SELECT a.i, a.y, a.x,
                   sum(b.gx * b.gx) AS sxx, sum(b.gy * b.gy) AS syy,
                   sum(b.gx * b.gy) AS sxy
            FROM sob a JOIN sob b
              ON b.i = a.i AND b.y BETWEEN a.y - 1 AND a.y + 1
                           AND b.x BETWEEN a.x - 1 AND a.x + 1
            WHERE a.y BETWEEN 4 AND 11 AND a.x BETWEEN 4 AND 11
            GROUP BY 1, 2, 3),
        ranked AS (
            SELECT i, y, x,
                   row_number() OVER (PARTITION BY i ORDER BY
                       20 * (sxx * syy - sxy * sxy)
                       - (sxx + syy) * (sxx + syy) DESC, y, x) AS rk
            FROM win
            WHERE 20 * (sxx * syy - sxy * sxy)
                  - (sxx + syy) * (sxx + syy) > 0),
        corners AS (SELECT i, y, x, rk FROM ranked WHERE rk <= 5)
        SELECT printf('img%08d', c.i) AS image_id,
               CAST(c.rk AS BIGINT) AS "rank",
               CAST(c.y AS BIGINT) AS y, CAST(c.x AS BIGINT) AS x,
               CAST(sum(CASE WHEN pa.g3 < pb.g3
                             THEN CAST(1 AS BIGINT) << b.j
                             ELSE 0 END) AS BIGINT) AS "desc"
        FROM corners c
        JOIN (VALUES {pat}) b(j, ay, ax, "by", bx) ON TRUE
        JOIN pix pa ON pa.i = c.i AND pa.y = c.y + b.ay
                   AND pa.x = c.x + b.ax
        JOIN pix pb ON pb.i = c.i AND pb.y = c.y + b."by"
                   AND pb.x = c.x + b.bx
        GROUP BY 1, 2, 3, 4
    """


def _q_pitch_amdf(spark, sf_dir):
    """Integer AMDF pitch tracking (multimodal/audio.pitch_amdf) over the
    shared closed-form sine clips: per 50 ms frame, the lag ℓ ∈ [16, 64]
    minimizing D(ℓ) = Σ_{n<736} |x[n] − x[n+ℓ]| — span fixed across lags,
    smallest-lag tie-break, every intermediate an exact integer. The
    oracle replays the sine samples symbolically (the audio_features
    evidence class) and the literal D sweep with a (d, lag) row_number
    argmin."""
    from morituri_spark.multimodal import audio as A

    return A.pitch_amdf(
        _audio_clips_df(spark), lag_min=16, lag_max=64, frame_ms=50
    )


def _pitch_amdf_oracle_sql() -> str:
    return """
        WITH clips AS (SELECT CAST(unnest(range(0, 50)) AS BIGINT) AS i),
        s AS (
          SELECT i, CAST(t AS BIGINT) AS t,
                 CAST(floor(sin(((2 * pi()) * (200.0 + 10.0 * CAST(i AS DOUBLE)))
                      * CAST(t AS DOUBLE) / 16000.0) * 13106.8) AS BIGINT) AS v
          FROM clips, LATERAL (SELECT unnest(range(0, 4000)) AS t) ts),
        d AS (
          SELECT a.i, a.t // 800 AS k, l.lg,
                 CAST(sum(abs(a.v - b.v)) AS BIGINT) AS d
          FROM s a
          JOIN (SELECT CAST(unnest(range(16, 65)) AS BIGINT) AS lg) l ON TRUE
          JOIN s b ON b.i = a.i AND b.t = a.t + l.lg
          WHERE a.t % 800 < 736
          GROUP BY 1, 2, 3),
        best AS (
          SELECT i, k, lg, d,
                 row_number() OVER (PARTITION BY i, k ORDER BY d, lg) AS rn
          FROM d)
        SELECT printf('clip%04d', i) AS audio_id,
               CAST(k AS BIGINT) AS frame_seq,
               CAST(lg AS BIGINT) AS best_lag,
               CAST(d AS BIGINT) AS amdf_min,
               CAST(736 AS BIGINT) AS span
        FROM best WHERE rn = 1
    """


def _q_ring_self_intersections(spark, sf_dir):
    """Simple-polygon validity audit (geo/overlay.ring_self_intersections):
    200 closed-form quad rings — even ids simple squares (no findings),
    odd ids bowties whose diagonal edges 0 and 2 properly cross at the
    exact integer center. The operator runs the cell-cover candidate
    join + strict orientation refine over in-row edge lists with
    adjacency/wrap post-filters; the oracle replays the edge list and
    the identical d1..d4 sign tests + crossing point all-pairs."""
    from morituri_spark.geo.overlay import ring_self_intersections

    ev = _read(spark, sf_dir, "events").where("event_id < 200")
    rings = ev.selectExpr(
        "event_id AS ring_id",
        "CAST((event_id * 7) % 100 AS DOUBLE) AS x0",
        "CAST((event_id * 13) % 100 AS DOUBLE) AS y0",
        "CAST(event_id % 2 AS DOUBLE) AS p",
    ).selectExpr(
        "ring_id",
        "array(array(x0, y0),"
        " array(x0 + CAST(2 AS DOUBLE), y0 + CAST(2 AS DOUBLE) * p),"
        " array(x0 + CAST(2 AS DOUBLE),"
        "       y0 + CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - p)),"
        " array(x0, y0 + CAST(2 AS DOUBLE)),"
        " array(x0, y0)) AS ring",
    )
    return ring_self_intersections(rings, "ring_id", "ring", 1.0).select(
        F.col("ring_id").cast("long").alias("ring_id"), "i", "j", "x", "y"
    )


def _ring_self_intersections_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 200),
        v AS (
            SELECT i, CAST((i * 7) % 100 AS DOUBLE) AS x0,
                   CAST((i * 13) % 100 AS DOUBLE) AS y0,
                   CAST(i % 2 AS DOUBLE) AS p
            FROM ids),
        pts AS (
            SELECT i, n,
                   CASE WHEN n IN (1, 2) THEN x0 + CAST(2 AS DOUBLE)
                        ELSE x0 END AS px,
                   CASE n WHEN 1 THEN y0 + CAST(2 AS DOUBLE) * p
                          WHEN 2 THEN y0 + CAST(2 AS DOUBLE)
                                      * (CAST(1 AS DOUBLE) - p)
                          WHEN 3 THEN y0 + CAST(2 AS DOUBLE)
                          ELSE y0 END AS py
            FROM v, generate_series(0, 4) ns(n)),
        e AS (
            SELECT a.i, a.n AS ei, a.px AS ax, a.py AS ay,
                   b.px AS bx, b.py AS by
            FROM pts a JOIN pts b ON b.i = a.i AND b.n = a.n + 1),
        pairs AS (
            SELECT p.i, p.ei, q.ei AS ej,
                   p.ax, p.ay, p.bx, p.by,
                   q.ax AS cx, q.ay AS cy, q.bx AS dx, q.by AS dy
            FROM e p JOIN e q ON q.i = p.i AND q.ei > p.ei + 1
            WHERE NOT (p.ei = 0 AND q.ei = 3)),
        c AS (
            SELECT *,
                   (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) AS d1,
                   (bx - ax) * (dy - ay) - (by - ay) * (dx - ax) AS d2,
                   (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx) AS d3,
                   (dx - cx) * (by - cy) - (dy - cy) * (bx - cx) AS d4
            FROM pairs),
        x AS (
            SELECT i, ei, ej, ax, ay, bx - ax AS dax, by - ay AS day,
                   ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx))
                   / ((bx - ax) * (dy - cy) - (by - ay) * (dx - cx)) AS t
            FROM c WHERE d1 * d2 < 0 AND d3 * d4 < 0)
        SELECT CAST(i AS BIGINT) AS ring_id, CAST(ei AS BIGINT) AS i,
               CAST(ej AS BIGINT) AS j,
               floor((ax + t * dax) * 1e6 + 0.5 + 1e-8) / 1e6 AS x,
               floor((ay + t * day) * 1e6 + 0.5 + 1e-8) / 1e6 AS y
        FROM x
    """


def _det_boxes(spark, sf_dir, n_img: int, per_img: int, shift: int = 0):
    """Closed-form detection boxes over events: image i carries per_img
    half-open integer boxes with modular-arithmetic corners/sizes/scores
    both engines replay as literals. shift offsets the corners (used to
    build a ground-truth set that partially overlaps the predictions)."""
    ev = _read(spark, sf_dir, "events").where(
        f"event_id < {n_img * per_img}"
    )
    return ev.selectExpr(
        f"CAST(event_id / {per_img} AS BIGINT) AS i",
        f"event_id % {per_img} AS j",
    ).selectExpr(
        "printf('img%08d', i) AS image_id",
        "j AS box_id",
        f"(i * 3 + j * 17 + {shift}) % 40 AS x0",
        f"(i * 5 + j * 23 + {shift}) % 40 AS y0",
        f"(i * 3 + j * 17 + {shift}) % 40 + 4 + (i + 3 * j + {shift}) % 12 AS x1",
        f"(i * 5 + j * 23 + {shift}) % 40 + 4 + (2 * i + j + {shift}) % 10 AS y1",
        "(i * 7 + j * 31) % 100 AS score",
    )


_DET_BOX_SQL = """
            SELECT i, j,
                   (i * 3 + j * 17 + {shift}) % 40 AS x0,
                   (i * 5 + j * 23 + {shift}) % 40 AS y0,
                   (i * 3 + j * 17 + {shift}) % 40
                     + 4 + (i + 3 * j + {shift}) % 12 AS x1,
                   (i * 5 + j * 23 + {shift}) % 40
                     + 4 + (2 * i + j + {shift}) % 10 AS y1,
                   (i * 7 + j * 31) % 100 AS s
            FROM (SELECT event_id // {per_img} AS i,
                         event_id % {per_img} AS j
                  FROM events WHERE event_id < {n_rows})"""

#: exact integer suppression/gate predicate: IoU(a, b) > thr/1000
_DET_SUPP = (
    "greatest(0, least(a.x1, b.x1) - greatest(a.x0, b.x0))"
    " * greatest(0, least(a.y1, b.y1) - greatest(a.y0, b.y0)) * 1000"
    " > {thr} * ((a.x1 - a.x0) * (a.y1 - a.y0)"
    " + (b.x1 - b.x0) * (b.y1 - b.y0)"
    " - greatest(0, least(a.x1, b.x1) - greatest(a.x0, b.x0))"
    " * greatest(0, least(a.y1, b.y1) - greatest(a.y0, b.y0)))"
)


def _q_nms(spark, sf_dir):
    """Greedy NMS (multimodal/detections.nms_boxes) over 200 images × 6
    closed-form integer boxes at IoU > 0.3: visit (score DESC, box_id),
    keep iff inter·1000 ≤ 300·union vs every kept box — ALL-integer
    arithmetic, zero rounding surface. The oracle unrolls the greedy
    loop as 6 materialized stages (rule 27), each picking the top
    surviving box then filtering the suppressed (the DP-oracle evidence
    class)."""
    from morituri_spark.multimodal.detections import nms_boxes

    return nms_boxes(_det_boxes(spark, sf_dir, 200, 6), iou_thr_milli=300)


def _nms_oracle_sql() -> str:
    b_sql = _DET_BOX_SQL.format(shift=0, per_img=6, n_rows=1200)
    supp = _DET_SUPP.format(thr=300)
    stages = []
    for k in range(1, 7):
        src = "b" if k == 1 else f"s{k - 1}"
        stages.append(
            f"""k{k} AS MATERIALIZED (
                SELECT i, j, x0, y0, x1, y1, s FROM (
                    SELECT {src}.*, row_number() OVER (
                        PARTITION BY i ORDER BY s DESC, j) AS rn
                    FROM {src}) WHERE rn = 1)"""
        )
        if k < 6:
            stages.append(
                f"""s{k} AS MATERIALIZED (
                SELECT b.* FROM {src} b JOIN k{k} a USING (i)
                WHERE b.j <> a.j AND NOT ({supp}))"""
            )
    picks = "\n            UNION ALL\n            ".join(
        f"SELECT i, CAST({k} AS BIGINT) AS keep_rank, j, s FROM k{k}"
        for k in range(1, 7)
    )
    return f"""
        WITH b AS MATERIALIZED ({b_sql}),
        {", ".join(stages)}
        SELECT printf('img%08d', i) AS image_id, keep_rank,
               CAST(j AS BIGINT) AS box_id, CAST(s AS BIGINT) AS score
        FROM ({picks})
    """


def _q_detection_matches(spark, sf_dir):
    """Greedy pred↔GT matching (multimodal/detections.match_detections,
    the COCO/VOC evaluation step) over 200 images × 4 predictions × 4
    shifted ground truths at IoU > 0.2: each prediction (score DESC,
    box_id) takes the unmatched GT maximizing iou_micro = inter·10⁶ DIV
    union (exact integer division per rule 28, ties to smallest gt_id).
    The oracle unrolls 4 materialized stages, each excluding the GTs
    taken by earlier stages."""
    from morituri_spark.multimodal.detections import match_detections

    preds = _det_boxes(spark, sf_dir, 200, 4)
    gts = _det_boxes(spark, sf_dir, 200, 4, shift=2).selectExpr(
        "image_id", "box_id AS gt_id", "x0", "y0", "x1", "y1"
    )
    return match_detections(preds, gts, iou_thr_milli=200)


def _detection_matches_oracle_sql() -> str:
    p_sql = _DET_BOX_SQL.format(shift=0, per_img=4, n_rows=800)
    g_sql = _DET_BOX_SQL.format(shift=2, per_img=4, n_rows=800)
    gate = _DET_SUPP.format(thr=200)
    # candidate pairs: prediction a × gt b passing the IoU gate, with the
    # exact integer-division ranking score
    stages = []
    for k in range(1, 5):
        excl = (
            ""
            if k == 1
            else "AND NOT EXISTS (SELECT 1 FROM ("
            + " UNION ALL ".join(
                f"SELECT i, gt_id FROM m{x}" for x in range(1, k)
            )
            + f") t WHERE t.i = c.i AND t.gt_id = c.gt_id)"
        )
        stages.append(
            f"""m{k} AS MATERIALIZED (
                SELECT i, j, s, gt_id, iou_micro FROM (
                    SELECT c.*, row_number() OVER (PARTITION BY c.i
                        ORDER BY c.iou_micro DESC, c.gt_id) AS rn
                    FROM cand c WHERE c.rk = {k} {excl})
                WHERE rn = 1)"""
        )
    matched = " UNION ALL ".join(
        f"SELECT * FROM m{k}" for k in range(1, 5)
    )
    return f"""
        WITH p AS MATERIALIZED (
            SELECT q.*, row_number() OVER (PARTITION BY i
                ORDER BY s DESC, j) AS rk
            FROM ({p_sql}) q),
        g AS MATERIALIZED ({g_sql}),
        cand AS MATERIALIZED (
            SELECT a.i, a.j, a.s, a.rk, b.j AS gt_id,
                   CAST(floor((greatest(0, least(a.x1, b.x1)
                       - greatest(a.x0, b.x0))
                     * greatest(0, least(a.y1, b.y1)
                       - greatest(a.y0, b.y0)) * 1000000.0)
                     / ((a.x1 - a.x0) * (a.y1 - a.y0)
                        + (b.x1 - b.x0) * (b.y1 - b.y0)
                        - greatest(0, least(a.x1, b.x1)
                          - greatest(a.x0, b.x0))
                        * greatest(0, least(a.y1, b.y1)
                          - greatest(a.y0, b.y0)))) AS BIGINT) AS iou_micro
            FROM p a JOIN g b ON b.i = a.i AND ({gate})),
        {", ".join(stages)},
        m AS ({matched})
        SELECT printf('img%08d', p.i) AS image_id,
               CAST(p.j AS BIGINT) AS box_id, CAST(p.s AS BIGINT) AS score,
               CAST(m.gt_id AS BIGINT) AS matched_gt,
               CAST(m.iou_micro AS BIGINT) AS iou_micro
        FROM p LEFT JOIN m ON m.i = p.i AND m.j = p.j
    """


def _q_mask_rle(spark, sf_dir):
    """COCO-order RLE of packed binary masks (multimodal/masks.
    mask_rle_runs): 150 closed-form 16×16 masks — pixel (y, x) of mask i
    is on iff (i + 2y + 3x) % 7 < 3 — packed row-major to bits, decoded
    and scanned COLUMN-major (pos = x·16 + y) into maximal 1-runs. The
    oracle replays the pixels symbolically and the runs with the
    gaps-and-islands idiom (pos − row_number)."""
    import numpy as np
    import pandas as pd

    from morituri_spark.multimodal.masks import mask_rle_runs, pack_mask

    base = (
        _read(spark, sf_dir, "events")
        .where("event_id < 150")
        .select(F.col("event_id").alias("i"))
    )

    def gen(batches):
        ys, xs = np.mgrid[0:16, 0:16]
        for pdf in batches:
            rows = {"image_id": [], "mask": [], "w": [], "h": []}
            for i in pdf["i"]:
                i = int(i)
                m = ((i + 2 * ys + 3 * xs) % 7) < 3
                rows["image_id"].append(f"img{i:08d}")
                rows["mask"].append(pack_mask(m))
                rows["w"].append(16)
                rows["h"].append(16)
            yield pd.DataFrame(rows)

    masks = base.mapInPandas(gen, "image_id string, mask binary, w int, h int")
    return mask_rle_runs(masks)


def _mask_rle_oracle_sql() -> str:
    return """
        WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
        on_pix AS (
            SELECT i, x * 16 + y AS pos
            FROM ids, generate_series(0, 15) ys(y), generate_series(0, 15) xs(x)
            WHERE (i + 2 * y + 3 * x) % 7 < 3),
        isl AS (
            SELECT i, pos,
                   pos - row_number() OVER (PARTITION BY i ORDER BY pos) AS grp
            FROM on_pix),
        runs AS (
            SELECT i, min(pos) AS start, count(*) AS length
            FROM isl GROUP BY i, grp)
        SELECT printf('img%08d', i) AS image_id,
               CAST(row_number() OVER (PARTITION BY i ORDER BY start)
                    AS BIGINT) AS run_idx,
               CAST(start AS BIGINT) AS start,
               CAST(length AS BIGINT) AS length
        FROM runs
    """


def _q_anchor_assign(spark, sf_dir):
    """Anchor-assignment training targets (multimodal/detections.
    assign_anchors) over the 200-image closed-form GT boxes: a 4×4 grid
    × 2 anchor shapes per image, each anchor taking the GT maximizing
    the DIV-quantized iou_micro among those with IoU > 0.25 — pure
    whole-stage-codegen Catalyst (sequence-explodes, literal offsets,
    ONE map-side-combinable max_by per rule 25). The oracle replays the
    grid with generate_series and the argmax with a row_number."""
    from morituri_spark.multimodal.detections import assign_anchors

    gts = _det_boxes(spark, sf_dir, 200, 4, shift=2).selectExpr(
        "image_id", "box_id AS gt_id", "x0", "y0", "x1", "y1"
    )
    return assign_anchors(
        gts, grid_w=4, grid_h=4, cell=12, sizes=((8, 8), (12, 16)),
        pos_thr_milli=250,
    )


def _anchor_assign_oracle_sql() -> str:
    g_sql = _DET_BOX_SQL.format(shift=2, per_img=4, n_rows=800)
    # literal per-size geometry: (ox, oy, sw, sh) for cell=12
    return f"""
        WITH g AS MATERIALIZED ({g_sql}),
        a AS (
            SELECT i, gx, gy, s,
                   (gy * 4 + gx) * 2 + s AS anchor_id,
                   gx * 12 + CASE s WHEN 0 THEN 2 ELSE 0 END AS ax0,
                   gy * 12 + CASE s WHEN 0 THEN 2 ELSE -2 END AS ay0,
                   gx * 12 + CASE s WHEN 0 THEN 10 ELSE 12 END AS ax1,
                   gy * 12 + CASE s WHEN 0 THEN 10 ELSE 14 END AS ay1
            FROM (SELECT DISTINCT i FROM g),
                 generate_series(0, 3) gys(gy),
                 generate_series(0, 3) gxs(gx),
                 generate_series(0, 1) ss(s)),
        cand AS (
            SELECT a.i, a.anchor_id, a.gx, a.gy, a.s, g.j AS gt_id,
                   greatest(0, least(a.ax1, g.x1) - greatest(a.ax0, g.x0))
                   * greatest(0, least(a.ay1, g.y1) - greatest(a.ay0, g.y0))
                     AS inter,
                   (a.ax1 - a.ax0) * (a.ay1 - a.ay0)
                   + (g.x1 - g.x0) * (g.y1 - g.y0)
                   - greatest(0, least(a.ax1, g.x1) - greatest(a.ax0, g.x0))
                   * greatest(0, least(a.ay1, g.y1) - greatest(a.ay0, g.y0))
                     AS un
            FROM a JOIN g ON g.i = a.i),
        pos AS (
            SELECT i, anchor_id, gx, gy, s, gt_id,
                   CAST(floor(inter * 1000000.0 / un) AS BIGINT) AS iou_micro
            FROM cand WHERE inter * 1000 > 250 * un),
        best AS (
            SELECT *, row_number() OVER (PARTITION BY i, anchor_id
                ORDER BY iou_micro DESC, gt_id) AS rn
            FROM pos)
        SELECT printf('img%08d', i) AS image_id,
               CAST(anchor_id AS BIGINT) AS anchor_id,
               CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
               CAST(s AS BIGINT) AS size_idx,
               CAST(gt_id AS BIGINT) AS matched_gt, iou_micro
        FROM best WHERE rn = 1
    """


def _q_detection_ap(spark, sf_dir):
    """Per-class interpolated average precision (multimodal/detections.
    average_precision) COMPOSED over per-class greedy matching: the 200
    closed-form images' predictions and shifted GTs carry class
    (i + j) % 3, matching runs per (image, class) key through
    match_detections, and AP ranks per class by (score DESC, key,
    box_id) with the DIV-quantized precision and the suffix-max
    interpolation — every output an exact integer. The oracle unrolls
    the 2-deep per-(image, class) greedy then replays the identical
    windows."""
    from morituri_spark.multimodal.detections import (
        average_precision,
        match_detections,
    )

    preds = _det_boxes(spark, sf_dir, 200, 4).selectExpr(
        "printf('%s#%d', image_id, (CAST(substr(image_id, 4) AS BIGINT)"
        " + box_id) % 3) AS key",
        "box_id", "x0", "y0", "x1", "y1", "score",
    )
    gts = _det_boxes(spark, sf_dir, 200, 4, shift=2).selectExpr(
        "printf('%s#%d', image_id, (CAST(substr(image_id, 4) AS BIGINT)"
        " + box_id) % 3) AS key",
        "box_id AS gt_id", "x0", "y0", "x1", "y1",
    )
    m = match_detections(preds, gts, iou_thr_milli=200, id_col="key")
    matches = m.selectExpr(
        "CAST(split(key, '#')[1] AS BIGINT) AS cls",
        "key", "box_id", "score",
        "matched_gt IS NOT NULL AS is_tp",
    )
    gt_counts = gts.selectExpr(
        "CAST(split(key, '#')[1] AS BIGINT) AS cls"
    ).groupBy("cls").agg(F.count(F.lit(1)).alias("n_gt"))
    return average_precision(
        matches, gt_counts, class_col="cls", order_cols=("key", "box_id")
    ).select(
        "cls",
        F.col("n_gt").cast("long").alias("n_gt"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.col("n_tp").cast("long").alias("n_tp"),
        F.col("ap_num_micro").cast("long").alias("ap_num_micro"),
    )


def _detection_ap_oracle_sql() -> str:
    p_sql = _DET_BOX_SQL.format(shift=0, per_img=4, n_rows=800)
    g_sql = _DET_BOX_SQL.format(shift=2, per_img=4, n_rows=800)
    gate = _DET_SUPP.format(thr=200)
    # per-(image, class) greedy: at most 2 predictions share a class
    # within an image (j ∈ 0..3 mod 3), so 2 stages suffice
    return f"""
        WITH p AS MATERIALIZED (
            SELECT q.*, (i + j) % 3 AS cls, row_number() OVER (
                PARTITION BY i, (i + j) % 3 ORDER BY s DESC, j) AS rk
            FROM ({p_sql}) q),
        g AS MATERIALIZED (
            SELECT q.*, (i + j) % 3 AS cls FROM ({g_sql}) q),
        cand AS MATERIALIZED (
            SELECT a.i, a.cls, a.j, a.s, a.rk, b.j AS gt_id,
                   CAST(floor((greatest(0, least(a.x1, b.x1)
                       - greatest(a.x0, b.x0))
                     * greatest(0, least(a.y1, b.y1)
                       - greatest(a.y0, b.y0)) * 1000000.0)
                     / ((a.x1 - a.x0) * (a.y1 - a.y0)
                        + (b.x1 - b.x0) * (b.y1 - b.y0)
                        - greatest(0, least(a.x1, b.x1)
                          - greatest(a.x0, b.x0))
                        * greatest(0, least(a.y1, b.y1)
                          - greatest(a.y0, b.y0)))) AS BIGINT) AS iou_micro
            FROM p a JOIN g b ON b.i = a.i AND b.cls = a.cls AND ({gate})),
        m1 AS MATERIALIZED (
            SELECT i, cls, j, gt_id FROM (
                SELECT c.*, row_number() OVER (PARTITION BY c.i, c.cls
                    ORDER BY c.iou_micro DESC, c.gt_id) AS rn
                FROM cand c WHERE c.rk = 1) WHERE rn = 1),
        m2 AS MATERIALIZED (
            SELECT i, cls, j, gt_id FROM (
                SELECT c.*, row_number() OVER (PARTITION BY c.i, c.cls
                    ORDER BY c.iou_micro DESC, c.gt_id) AS rn
                FROM cand c WHERE c.rk = 2
                  AND NOT EXISTS (SELECT 1 FROM m1
                      WHERE m1.i = c.i AND m1.cls = c.cls
                        AND m1.gt_id = c.gt_id)) WHERE rn = 1),
        m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
        scored AS (
            SELECT p.cls, p.s,
                   printf('img%08d#%d', p.i, p.cls) AS key, p.j,
                   (m.gt_id IS NOT NULL) AS is_tp
            FROM p LEFT JOIN m ON m.i = p.i AND m.cls = p.cls AND m.j = p.j),
        ranked AS (
            SELECT cls, is_tp,
                   row_number() OVER (PARTITION BY cls
                       ORDER BY s DESC, key, j) AS k,
                   sum(CASE WHEN is_tp THEN 1 ELSE 0 END) OVER (
                       PARTITION BY cls ORDER BY s DESC, key, j
                       ROWS UNBOUNDED PRECEDING) AS tp_cum
            FROM scored),
        prec AS (
            SELECT cls, is_tp, k,
                   CAST(floor(tp_cum * 1000000.0 / k) AS BIGINT)
                     AS prec_micro
            FROM ranked),
        interp AS (
            SELECT cls, is_tp,
                   max(prec_micro) OVER (PARTITION BY cls ORDER BY k
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                     AS ip
            FROM prec),
        agg AS (
            SELECT cls, count(*) AS n_pred,
                   sum(CASE WHEN is_tp THEN 1 ELSE 0 END) AS n_tp,
                   sum(CASE WHEN is_tp THEN ip ELSE 0 END) AS ap_num_micro
            FROM interp GROUP BY cls),
        gc AS (SELECT cls, count(*) AS n_gt FROM g GROUP BY cls)
        SELECT CAST(agg.cls AS BIGINT) AS cls,
               CAST(gc.n_gt AS BIGINT) AS n_gt,
               CAST(agg.n_pred AS BIGINT) AS n_pred,
               CAST(agg.n_tp AS BIGINT) AS n_tp,
               CAST(agg.ap_num_micro AS BIGINT) AS ap_num_micro
        FROM agg JOIN gc ON gc.cls = agg.cls
    """


def _q_bleu_captions(spark, sf_dir):
    """BLEU clipped n-gram counts (text/metrics.bleu_clip_counts) over
    250 caption pairs from the documents table (candidate doc d vs
    reference doc d+250): exact integer sufficient statistics
    (clipped, total) per (pair, n ≤ 4) — tokens staged once (rule 9),
    grams from chained sequence-explodes, the clip through a
    (pair, n, gram) hash-aggregate join (rule 21). The oracle replays
    with string_split + 1-based list slices."""
    from morituri_spark.text.metrics import bleu_clip_counts

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.where("doc_id < 250").selectExpr(
        "doc_id AS pair_id", "text AS cand"
    )
    b = docs.where("doc_id >= 250 AND doc_id < 500").selectExpr(
        "doc_id - 250 AS pair_id", "text AS ref"
    )
    return bleu_clip_counts(a.join(b, "pair_id"), n_max=4)


def _bleu_captions_oracle_sql() -> str:
    return """
        WITH docs AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents WHERE doc_id < 500),
        p AS (
            SELECT a.doc_id AS pair_id, a.toks AS cand, b.toks AS ref
            FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 250
            WHERE a.doc_id < 250),
        -- static position series (captions are < 256 tokens; laterally
        -- parameterized generate_series trips a DuckDB binder assertion)
        ks AS (SELECT unnest(range(1, 256)) AS k),
        cgc AS (
            SELECT pair_id, n, array_to_string(cand[k : k + n - 1], ' ')
                     AS gram, count(*) AS cc
            FROM p, generate_series(1, 4) ns(n), ks
            WHERE k <= len(cand) - n + 1
            GROUP BY 1, 2, 3),
        rgc AS (
            SELECT pair_id, n, array_to_string(ref[k : k + n - 1], ' ')
                     AS gram, count(*) AS rc
            FROM p, generate_series(1, 4) ns(n), ks
            WHERE k <= len(ref) - n + 1
            GROUP BY 1, 2, 3),
        tot AS (SELECT pair_id, n, sum(cc) AS total FROM cgc GROUP BY 1, 2),
        clip AS (
            SELECT c.pair_id, c.n, sum(least(c.cc, r.rc)) AS clipped
            FROM cgc c JOIN rgc r USING (pair_id, n, gram)
            GROUP BY 1, 2)
        SELECT tot.pair_id, CAST(tot.n AS BIGINT) AS n,
               CAST(coalesce(clip.clipped, 0) AS BIGINT) AS clipped,
               CAST(tot.total AS BIGINT) AS total
        FROM tot LEFT JOIN clip USING (pair_id, n)
    """


def _seg_runs(spark, sf_dir, shift_s: int, shift_l: int):
    """Closed-form RLE segment runs over events: image i (150 images) ×
    segment s ∈ 0..2 × run k ∈ 0..2, run k living in its own 40-wide
    block so runs within a segment are disjoint by construction."""
    ev = _read(spark, sf_dir, "events").where("event_id < 1350")
    return ev.selectExpr(
        "CAST(floor(event_id / CAST(9 AS DOUBLE)) AS BIGINT) AS i",
        "CAST(floor(event_id / CAST(3 AS DOUBLE)) AS BIGINT) % 3 AS s",
        "event_id % 3 AS k",
    ).selectExpr(
        "printf('img%08d', i) AS image_id",
        "s AS seg_id",
        f"k * 40 + (i * 7 + s * 11 + {shift_s}) % 20 AS start",
        f"5 + (i + s + k + {shift_l}) % 15 AS length",
    )


_SEG_RUN_SQL = """
            SELECT i, s, k,
                   k * 40 + (i * 7 + s * 11 + {shift_s}) % 20 AS start,
                   5 + (i + s + k + {shift_l}) % 15 AS len
            FROM (SELECT event_id // 9 AS i, (event_id // 3) % 3 AS s,
                         event_id % 3 AS k
                  FROM events WHERE event_id < 1350)"""


def _q_panoptic(spark, sf_dir):
    """Panoptic-quality sufficient statistics (multimodal/masks.
    panoptic_quality) over closed-form RLE segments: 150 images × 3
    pred + 3 GT segments × 3 disjoint runs each; run overlaps through
    the binned interval_overlap_join (operators/rangejoin — never
    |runs|², exactly-once via the first-shared-bin rule), exact integer
    IoU at thr 0.5, per-image (n_pred, n_gt, n_matched, sum_iou_micro).
    The oracle replays the runs symbolically and the overlap join
    directly (DuckDB non-equi join at oracle scale)."""
    from morituri_spark.multimodal.masks import panoptic_quality

    pred = _seg_runs(spark, sf_dir, 0, 0)
    gt = _seg_runs(spark, sf_dir, 3, 1)
    return panoptic_quality(pred, gt, iou_thr_milli=500, bin_width=16.0)


def _panoptic_oracle_sql() -> str:
    p_sql = _SEG_RUN_SQL.format(shift_s=0, shift_l=0)
    g_sql = _SEG_RUN_SQL.format(shift_s=3, shift_l=1)
    return f"""
        WITH p AS MATERIALIZED ({p_sql}),
        g AS MATERIALIZED ({g_sql}),
        ov AS (
            SELECT a.i, a.s AS sp, b.s AS sg,
                   least(a.start + a.len, b.start + b.len)
                   - greatest(a.start, b.start) AS ovl
            FROM p a JOIN g b ON b.i = a.i
              AND a.start < b.start + b.len AND b.start < a.start + a.len),
        inter AS (
            SELECT i, sp, sg, sum(ovl) AS inter FROM ov GROUP BY 1, 2, 3),
        ta AS (SELECT i, s, sum(len) AS t FROM p GROUP BY 1, 2),
        tb AS (SELECT i, s, sum(len) AS t FROM g GROUP BY 1, 2),
        m AS (
            SELECT inter.i, sp, sg, inter,
                   ta.t + tb.t - inter AS un
            FROM inter
            JOIN ta ON ta.i = inter.i AND ta.s = inter.sp
            JOIN tb ON tb.i = inter.i AND tb.s = inter.sg
            WHERE inter * 1000 > 500 * (ta.t + tb.t - inter)),
        mm AS (
            SELECT i, count(*) AS n_matched,
                   sum(CAST(floor(inter * 1000000.0 / un) AS BIGINT))
                     AS sum_iou_micro
            FROM m GROUP BY i),
        np_ AS (SELECT i, count(DISTINCT s) AS n_pred FROM p GROUP BY i),
        ng AS (SELECT i, count(DISTINCT s) AS n_gt FROM g GROUP BY i)
        SELECT printf('img%08d', np_.i) AS image_id,
               CAST(np_.n_pred AS BIGINT) AS n_pred,
               CAST(ng.n_gt AS BIGINT) AS n_gt,
               CAST(coalesce(mm.n_matched, 0) AS BIGINT) AS n_matched,
               CAST(coalesce(mm.sum_iou_micro, 0) AS BIGINT)
                 AS sum_iou_micro
        FROM np_ JOIN ng ON ng.i = np_.i
        LEFT JOIN mm ON mm.i = np_.i
    """


def _q_confusion(spark, sf_dir):
    """Detection confusion matrix (multimodal/detections.
    detection_confusion) from class-AGNOSTIC greedy matching: the 200
    closed-form images' preds (class (i + 2j) % 3) and shifted GTs
    (class (i + g) % 3) match per image at IoU > 0.2, matched pairs
    count under (pred_cls, gt_cls), FPs under (pred_cls, NULL), missed
    GTs under (NULL, gt_cls). The oracle reuses the unrolled 4-stage
    greedy then aggregates the identical class formulas."""
    from morituri_spark.multimodal.detections import (
        detection_confusion,
        match_detections,
    )

    preds = _det_boxes(spark, sf_dir, 200, 4)
    gts = _det_boxes(spark, sf_dir, 200, 4, shift=2).selectExpr(
        "image_id", "box_id AS gt_id", "x0", "y0", "x1", "y1"
    )
    m = match_detections(preds, gts, iou_thr_milli=200)
    pc = preds.selectExpr(
        "image_id", "box_id",
        "(CAST(substr(image_id, 4) AS BIGINT) + 2 * box_id) % 3 AS cls",
    )
    gc = gts.selectExpr(
        "image_id", "gt_id",
        "(CAST(substr(image_id, 4) AS BIGINT) + gt_id) % 3 AS cls",
    )
    return detection_confusion(m, pc, gc).select(
        F.col("pred_cls").cast("long").alias("pred_cls"),
        F.col("gt_cls").cast("long").alias("gt_cls"),
        F.col("n").cast("long").alias("n"),
    )


def _confusion_oracle_sql() -> str:
    p_sql = _DET_BOX_SQL.format(shift=0, per_img=4, n_rows=800)
    g_sql = _DET_BOX_SQL.format(shift=2, per_img=4, n_rows=800)
    gate = _DET_SUPP.format(thr=200)
    stages = []
    for k in range(1, 5):
        excl = (
            ""
            if k == 1
            else "AND NOT EXISTS (SELECT 1 FROM ("
            + " UNION ALL ".join(
                f"SELECT i, gt_id FROM m{x}" for x in range(1, k)
            )
            + ") t WHERE t.i = c.i AND t.gt_id = c.gt_id)"
        )
        stages.append(
            f"""m{k} AS MATERIALIZED (
                SELECT i, j, gt_id FROM (
                    SELECT c.*, row_number() OVER (PARTITION BY c.i
                        ORDER BY c.iou_micro DESC, c.gt_id) AS rn
                    FROM cand c WHERE c.rk = {k} {excl})
                WHERE rn = 1)"""
        )
    matched = " UNION ALL ".join(f"SELECT * FROM m{k}" for k in range(1, 5))
    return f"""
        WITH p AS MATERIALIZED (
            SELECT q.*, row_number() OVER (PARTITION BY i
                ORDER BY s DESC, j) AS rk
            FROM ({p_sql}) q),
        g AS MATERIALIZED ({g_sql}),
        cand AS MATERIALIZED (
            SELECT a.i, a.j, a.rk, b.j AS gt_id,
                   CAST(floor((greatest(0, least(a.x1, b.x1)
                       - greatest(a.x0, b.x0))
                     * greatest(0, least(a.y1, b.y1)
                       - greatest(a.y0, b.y0)) * 1000000.0)
                     / ((a.x1 - a.x0) * (a.y1 - a.y0)
                        + (b.x1 - b.x0) * (b.y1 - b.y0)
                        - greatest(0, least(a.x1, b.x1)
                          - greatest(a.x0, b.x0))
                        * greatest(0, least(a.y1, b.y1)
                          - greatest(a.y0, b.y0)))) AS BIGINT) AS iou_micro
            FROM p a JOIN g b ON b.i = a.i AND ({gate})),
        {", ".join(stages)},
        m AS ({matched}),
        pred_rows AS (
            SELECT (p.i + 2 * p.j) % 3 AS pred_cls,
                   CASE WHEN m.gt_id IS NULL THEN NULL
                        ELSE (p.i + m.gt_id) % 3 END AS gt_cls
            FROM p LEFT JOIN m ON m.i = p.i AND m.j = p.j),
        fn_rows AS (
            SELECT CAST(NULL AS BIGINT) AS pred_cls,
                   (g.i + g.j) % 3 AS gt_cls
            FROM g WHERE NOT EXISTS (SELECT 1 FROM m
                WHERE m.i = g.i AND m.gt_id = g.j)),
        allrows AS (
            SELECT * FROM pred_rows UNION ALL SELECT * FROM fn_rows)
        SELECT CAST(pred_cls AS BIGINT) AS pred_cls,
               CAST(gt_cls AS BIGINT) AS gt_cls,
               CAST(count(*) AS BIGINT) AS n
        FROM allrows GROUP BY 1, 2
    """


def _q_mosaic(spark, sf_dir):
    """Mosaic-augmentation box remapping (multimodal/detections.
    mosaic_boxes): 200 images × 3 closed-form boxes land in 50 4-image
    mosaics (quadrant corner offsets on a 128-canvas), then clip to a
    closed-form 64×64 crop window, dropping degenerate and
    sub-min_area boxes — all integer, pure Catalyst with one broadcast
    join. The oracle replays the layout as literal expressions."""
    from morituri_spark.multimodal.detections import mosaic_boxes

    ev = _read(spark, sf_dir, "events").where("event_id < 600")
    boxes = ev.selectExpr(
        "CAST(floor(event_id / CAST(3 AS DOUBLE)) AS BIGINT) AS i",
        "event_id % 3 AS j",
    ).selectExpr(
        "i AS img_idx",
        "j AS box_id",
        "(i * 3 + j * 17) % 50 AS x0",
        "(i * 5 + j * 23) % 50 AS y0",
        "(i * 3 + j * 17) % 50 + 4 + (i + 3 * j) % 14 AS x1",
        "(i * 5 + j * 23) % 50 + 4 + (2 * i + j) % 12 AS y1",
        "(i * 7 + j * 31) % 100 AS score",
    )
    crops = (
        _read(spark, sf_dir, "events")
        .where("event_id < 50")
        .selectExpr(
            "event_id AS mosaic_id",
            "(event_id * 13) % 64 AS cx",
            "(event_id * 29) % 64 AS cy",
        )
    )
    return mosaic_boxes(boxes, crops, size=64, min_area=4)


def _mosaic_oracle_sql() -> str:
    return """
        WITH b AS (
            SELECT i, j,
                   (i * 3 + j * 17) % 50 AS x0,
                   (i * 5 + j * 23) % 50 AS y0,
                   (i * 3 + j * 17) % 50 + 4 + (i + 3 * j) % 14 AS x1,
                   (i * 5 + j * 23) % 50 + 4 + (2 * i + j) % 12 AS y1,
                   (i * 7 + j * 31) % 100 AS s
            FROM (SELECT event_id // 3 AS i, event_id % 3 AS j
                  FROM events WHERE event_id < 600)),
        c AS (
            SELECT event_id AS m, (event_id * 13) % 64 AS cx,
                   (event_id * 29) % 64 AS cy
            FROM events WHERE event_id < 50),
        placed AS (
            SELECT b.i // 4 AS mosaic_id, b.i, b.j, b.s,
                   b.x0 + CASE WHEN b.i % 4 IN (1, 3) THEN 64 ELSE 0 END
                     - c.cx AS tx0,
                   b.y0 + CASE WHEN b.i % 4 IN (2, 3) THEN 64 ELSE 0 END
                     - c.cy AS ty0,
                   b.x1 + CASE WHEN b.i % 4 IN (1, 3) THEN 64 ELSE 0 END
                     - c.cx AS tx1,
                   b.y1 + CASE WHEN b.i % 4 IN (2, 3) THEN 64 ELSE 0 END
                     - c.cy AS ty1
            FROM b JOIN c ON c.m = b.i // 4),
        clipped AS (
            SELECT mosaic_id, i, j, s,
                   greatest(tx0, 0) AS nx0, greatest(ty0, 0) AS ny0,
                   least(tx1, 64) AS nx1, least(ty1, 64) AS ny1
            FROM placed)
        SELECT CAST(mosaic_id AS BIGINT) AS mosaic_id,
               CAST(i AS BIGINT) AS img_idx, CAST(j AS BIGINT) AS box_id,
               CAST(nx0 AS BIGINT) AS x0, CAST(ny0 AS BIGINT) AS y0,
               CAST(nx1 AS BIGINT) AS x1, CAST(ny1 AS BIGINT) AS y1,
               CAST(s AS BIGINT) AS score
        FROM clipped
        WHERE nx1 > nx0 AND ny1 > ny0 AND (nx1 - nx0) * (ny1 - ny0) >= 4
    """


def _q_apportion(spark, sf_dir):
    """Largest-remainder budget apportionment (text/sampling.
    apportion_budget): per-stratum counts of the first 1000 events
    (stratum = event_id % 37) apportion a 613-row budget by the exact
    Hamilton rule — integral `div`/`%` quotas (no float anywhere),
    leftover to the largest remainders with smallest-key ties. The
    oracle replays with DuckDB's `//` and the identical window."""
    from morituri_spark.text.sampling import apportion_budget

    counts = (
        _read(spark, sf_dir, "events")
        .where("event_id < 1000")
        .selectExpr("event_id % 37 AS stratum")
        .groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return apportion_budget(counts, 613)


def _apportion_oracle_sql() -> str:
    return """
        WITH c AS (
            SELECT event_id % 37 AS stratum, count(*) AS cnt
            FROM events WHERE event_id < 1000 GROUP BY 1),
        t AS (SELECT sum(cnt) AS total FROM c),
        q AS (
            SELECT stratum, cnt,
                   cnt * 613 // total AS base,
                   cnt * 613 % total AS rem
            FROM c, t),
        l AS (SELECT 613 - sum(base) AS leftover FROM q),
        r AS (
            SELECT q.*, row_number() OVER (ORDER BY rem DESC, stratum)
                     AS rk, l.leftover
            FROM q, l)
        SELECT CAST(stratum AS BIGINT) AS stratum, CAST(cnt AS BIGINT) AS cnt,
               CAST(base AS BIGINT) AS base,
               CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
                 AS extra,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                 AS BIGINT) AS alloc
        FROM r
    """


def _q_ring_nesting(spark, sf_dir):
    """Multipolygon ring-nesting classification (geo/overlay.
    ring_nesting_depth): 100 polygon groups of 4 axis-aligned square
    rings — rings 0..2 strictly nested, ring 3 nested for even groups
    and a detached shell (+200 offset) for odd — classified by the
    half-open even-odd ray cast in pure Catalyst. Axis-aligned edges
    keep every crossing test exact (vertical edges intersect at ax;
    horizontal edges never pass the y-straddle gate). The oracle
    replays the identical ray cast over a VALUES corner table."""
    from morituri_spark.geo.overlay import ring_nesting_depth

    ev = _read(spark, sf_dir, "events").where("event_id < 400")
    rings = ev.selectExpr(
        "CAST(floor(event_id / CAST(4 AS DOUBLE)) AS BIGINT) AS p",
        "event_id % 4 AS r",
    ).selectExpr(
        "p AS poly_id",
        "r AS ring_id",
        "CAST((p * 7) % 50 + r + CASE WHEN r = 3 AND p % 2 = 1"
        " THEN 200 ELSE 0 END AS DOUBLE) AS cx",
        "CAST((p * 13) % 50 + r AS DOUBLE) AS cy",
        "CAST(40 - 10 * r AS DOUBLE) AS hs",
    ).selectExpr(
        "poly_id", "ring_id",
        "array(array(cx - hs, cy - hs), array(cx + hs, cy - hs),"
        " array(cx + hs, cy + hs), array(cx - hs, cy + hs),"
        " array(cx - hs, cy - hs)) AS ring",
    )
    return ring_nesting_depth(rings)


def _ring_nesting_oracle_sql() -> str:
    return """
        WITH base AS (
            SELECT event_id // 4 AS p, event_id % 4 AS r
            FROM events WHERE event_id < 400),
        geo AS (
            SELECT p, r,
                   CAST((p * 7) % 50 + r + CASE WHEN r = 3 AND p % 2 = 1
                        THEN 200 ELSE 0 END AS DOUBLE) AS cx,
                   CAST((p * 13) % 50 + r AS DOUBLE) AS cy,
                   CAST(40 - 10 * r AS DOUBLE) AS hs
            FROM base),
        corners(n, sx, sy) AS (VALUES
            (0, -1, -1), (1, 1, -1), (2, 1, 1), (3, -1, 1)),
        edges AS (
            SELECT g.p, g.r,
                   g.cx + a.sx * g.hs AS ax, g.cy + a.sy * g.hs AS ay,
                   g.cx + b.sx * g.hs AS bx, g.cy + b.sy * g.hs AS by
            FROM geo g
            JOIN corners a ON TRUE
            JOIN corners b ON b.n = (a.n + 1) % 4),
        pts AS (SELECT p, r, cx - hs AS px, cy - hs AS py FROM geo),
        crossings AS (
            SELECT t.p, t.r, e.r AS rb, count(*) AS n_cross
            FROM pts t JOIN edges e ON e.p = t.p AND e.r <> t.r
            WHERE (e.ay > t.py) <> (e.by > t.py)
              AND t.px < e.ax + (t.py - e.ay) / (e.by - e.ay)
                                * (e.bx - e.ax)
            GROUP BY 1, 2, 3),
        depth AS (
            SELECT p, r, sum(n_cross % 2) AS d
            FROM crossings GROUP BY 1, 2)
        SELECT CAST(g.p AS BIGINT) AS poly_id,
               CAST(g.r AS BIGINT) AS ring_id,
               CAST(coalesce(d.d, 0) AS BIGINT) AS depth,
               CASE WHEN coalesce(d.d, 0) % 2 = 0 THEN 'exterior'
                    ELSE 'hole' END AS role
        FROM geo g LEFT JOIN depth d ON d.p = g.p AND d.r = g.r
    """


def _q_exif_boxes(spark, sf_dir):
    """EXIF-orientation box normalization (multimodal/detections.
    exif_orient_boxes): the 200-image closed-form boxes with per-image
    orientation code (i % 8) + 1 and per-image stored dims rewrite into
    upright coordinates via the literal corner remaps (codes 5-8 swap
    the output dims) — pure Catalyst CASE, all integer."""
    from morituri_spark.multimodal.detections import exif_orient_boxes

    boxes = _det_boxes(spark, sf_dir, 200, 3).selectExpr(
        "image_id", "box_id", "x0", "y0", "x1", "y1", "score",
        "(CAST(substr(image_id, 4) AS BIGINT) % 8) + 1 AS orient",
        "64 + CAST(substr(image_id, 4) AS BIGINT) % 8 AS w",
        "64 + (3 * CAST(substr(image_id, 4) AS BIGINT)) % 8 AS h",
    )
    return exif_orient_boxes(boxes)


def _exif_boxes_oracle_sql() -> str:
    b_sql = _DET_BOX_SQL.format(shift=0, per_img=3, n_rows=600)
    return f"""
        WITH b AS (
            SELECT q.*, (i % 8) + 1 AS o,
                   64 + i % 8 AS w, 64 + (3 * i) % 8 AS h
            FROM ({b_sql}) q)
        SELECT printf('img%08d', i) AS image_id,
               CAST(j AS BIGINT) AS box_id, CAST(s AS BIGINT) AS score,
               CAST(o AS BIGINT) AS orient,
               CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
               CAST(CASE o WHEN 2 THEN w - x1 WHEN 3 THEN w - x1
                    WHEN 5 THEN y0 WHEN 6 THEN h - y1 WHEN 7 THEN h - y1
                    WHEN 8 THEN y0 ELSE x0 END AS BIGINT) AS x0,
               CAST(CASE o WHEN 3 THEN h - y1 WHEN 4 THEN h - y1
                    WHEN 5 THEN x0 WHEN 6 THEN x0 WHEN 7 THEN w - x1
                    WHEN 8 THEN w - x1 ELSE y0 END AS BIGINT) AS y0,
               CAST(CASE o WHEN 2 THEN w - x0 WHEN 3 THEN w - x0
                    WHEN 5 THEN y1 WHEN 6 THEN h - y0 WHEN 7 THEN h - y0
                    WHEN 8 THEN y1 ELSE x1 END AS BIGINT) AS x1,
               CAST(CASE o WHEN 3 THEN h - y0 WHEN 4 THEN h - y0
                    WHEN 5 THEN x1 WHEN 6 THEN x1 WHEN 7 THEN w - x0
                    WHEN 8 THEN w - x0 ELSE y1 END AS BIGINT) AS y1,
               CAST(CASE WHEN o IN (5, 6, 7, 8) THEN h ELSE w END
                    AS BIGINT) AS out_w,
               CAST(CASE WHEN o IN (5, 6, 7, 8) THEN w ELSE h END
                    AS BIGINT) AS out_h
        FROM b
    """


def _q_tracklets(spark, sf_dir):
    """Tracking-by-detection tracklet stitching (multimodal/detections.
    iou_tracklets): 100 videos × 5 frames × 3 drifting closed-form
    boxes — adjacent frames greedily match per (video, frame) key at
    IoU > 0.3 (the match_detections kernel, third in-window use) and
    match edges link into tracks via connected components (large-star/
    small-star, lineage-truncated). The oracle unrolls the 3-deep
    per-frame-pair greedy then 5 materialized rounds of min-label
    propagation (diameter ≤ 4) — the iterative-oracle evidence class
    (k-core/DP)."""
    from morituri_spark.multimodal.detections import iou_tracklets

    ev = _read(spark, sf_dir, "events").where("event_id < 1500")
    dets = ev.selectExpr(
        "CAST(floor(event_id / CAST(15 AS DOUBLE)) AS BIGINT) AS v",
        "CAST(floor(event_id / CAST(3 AS DOUBLE)) AS BIGINT) % 5 AS f",
        "event_id % 3 AS b",
    ).selectExpr(
        "printf('v%06d', v) AS video",
        "f AS frame",
        "b AS box_id",
        "(v * 3 + b * 17) % 30 + 2 * f AS x0",
        "(v * 5 + b * 23) % 30 + f AS y0",
        "(v * 3 + b * 17) % 30 + 2 * f + 8 + (v + b) % 6 AS x1",
        "(v * 5 + b * 23) % 30 + f + 8 + (2 * v + b) % 5 AS y1",
        "(v * 7 + b * 31 + f * 11) % 100 AS score",
    )
    return iou_tracklets(dets, iou_thr_milli=300)


def _tracklets_oracle_sql() -> str:
    gate = (
        "greatest(0, least(a.x1, b.x1) - greatest(a.x0, b.x0))"
        " * greatest(0, least(a.y1, b.y1) - greatest(a.y0, b.y0)) * 1000"
        " > 300 * ((a.x1 - a.x0) * (a.y1 - a.y0)"
        " + (b.x1 - b.x0) * (b.y1 - b.y0)"
        " - greatest(0, least(a.x1, b.x1) - greatest(a.x0, b.x0))"
        " * greatest(0, least(a.y1, b.y1) - greatest(a.y0, b.y0)))"
    )
    stages = []
    for k in range(1, 4):
        excl = (
            ""
            if k == 1
            else "AND NOT EXISTS (SELECT 1 FROM ("
            + " UNION ALL ".join(
                f"SELECT v, f, gt_id FROM m{x}" for x in range(1, k)
            )
            + ") t WHERE t.v = c.v AND t.f = c.f AND t.gt_id = c.gt_id)"
        )
        stages.append(
            f"""m{k} AS MATERIALIZED (
                SELECT v, f, b, gt_id FROM (
                    SELECT c.*, row_number() OVER (PARTITION BY c.v, c.f
                        ORDER BY c.iou_micro DESC, c.gt_id) AS rn
                    FROM cand c WHERE c.rk = {k} {excl})
                WHERE rn = 1)"""
        )
    prop = []
    for k in range(1, 6):
        prop.append(
            f"""l{k} AS MATERIALIZED (
                SELECT a.src AS node, min(l.lbl) AS lbl
                FROM adj a JOIN l{k - 1} l ON l.node = a.dst
                GROUP BY a.src)"""
        )
    return f"""
        WITH boxes AS MATERIALIZED (
            SELECT v, f, b,
                   (v * 3 + b * 17) % 30 + 2 * f AS x0,
                   (v * 5 + b * 23) % 30 + f AS y0,
                   (v * 3 + b * 17) % 30 + 2 * f + 8 + (v + b) % 6 AS x1,
                   (v * 5 + b * 23) % 30 + f + 8 + (2 * v + b) % 5 AS y1,
                   (v * 7 + b * 31 + f * 11) % 100 AS s,
                   printf('v%06d#%d#%d', v, f, b) AS node
            FROM (SELECT event_id // 15 AS v, (event_id // 3) % 5 AS f,
                         event_id % 3 AS b
                  FROM events WHERE event_id < 1500)),
        p AS MATERIALIZED (
            SELECT q.*, row_number() OVER (PARTITION BY v, f
                ORDER BY s DESC, b) AS rk
            FROM boxes q WHERE f < 4),
        cand AS MATERIALIZED (
            SELECT a.v, a.f, a.b, a.rk, b.b AS gt_id,
                   CAST(floor((greatest(0, least(a.x1, b.x1)
                       - greatest(a.x0, b.x0))
                     * greatest(0, least(a.y1, b.y1)
                       - greatest(a.y0, b.y0)) * 1000000.0)
                     / ((a.x1 - a.x0) * (a.y1 - a.y0)
                        + (b.x1 - b.x0) * (b.y1 - b.y0)
                        - greatest(0, least(a.x1, b.x1)
                          - greatest(a.x0, b.x0))
                        * greatest(0, least(a.y1, b.y1)
                          - greatest(a.y0, b.y0)))) AS BIGINT) AS iou_micro
            FROM p a JOIN boxes b ON b.v = a.v AND b.f = a.f + 1
              AND ({gate})),
        {", ".join(stages)},
        m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2
              UNION ALL SELECT * FROM m3),
        edges AS (
            SELECT printf('v%06d#%d#%d', v, f, b) AS u,
                   printf('v%06d#%d#%d', v, f + 1, gt_id) AS w
            FROM m),
        adj AS (
            SELECT u AS src, w AS dst FROM edges
            UNION ALL SELECT w, u FROM edges
            UNION ALL SELECT node, node FROM boxes),
        l0 AS (SELECT node, node AS lbl FROM boxes),
        {", ".join(prop)}
        SELECT printf('v%06d', x.v) AS video, CAST(x.f AS BIGINT) AS frame,
               CAST(x.b AS BIGINT) AS box_id, l.lbl AS track_id
        FROM boxes x JOIN l5 l ON l.node = x.node
    """


def _q_letterbox(spark, sf_dir):
    """Letterbox-resize box remapping (multimodal/detections.
    letterbox_boxes): the 200-image closed-form boxes with varied
    per-image dims remap onto a centered 96×96 canvas with exact
    integral scale/pad arithmetic (Spark `div` ≡ DuckDB `//`) —
    pure codegen, zero exchanges."""
    from morituri_spark.multimodal.detections import letterbox_boxes

    boxes = _det_boxes(spark, sf_dir, 200, 3).selectExpr(
        "image_id", "box_id", "x0", "y0", "x1", "y1", "score",
        "64 + CAST(substr(image_id, 4) AS BIGINT) % 40 AS w",
        "64 + (3 * CAST(substr(image_id, 4) AS BIGINT)) % 50 AS h",
    )
    return letterbox_boxes(boxes, size=96)


def _letterbox_oracle_sql() -> str:
    b_sql = _DET_BOX_SQL.format(shift=0, per_img=3, n_rows=600)
    return f"""
        WITH b AS (
            SELECT q.*, 64 + i % 40 AS w, 64 + (3 * i) % 50 AS h,
                   greatest(64 + i % 40, 64 + (3 * i) % 50) AS m
            FROM ({b_sql}) q),
        pads AS (
            SELECT b.*,
                   (96 - w * 96 // m) // 2 AS pad_x,
                   (96 - h * 96 // m) // 2 AS pad_y
            FROM b)
        SELECT printf('img%08d', i) AS image_id,
               CAST(j AS BIGINT) AS box_id, CAST(s AS BIGINT) AS score,
               CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
               CAST(x0 * 96 // m + pad_x AS BIGINT) AS x0,
               CAST(y0 * 96 // m + pad_y AS BIGINT) AS y0,
               CAST(x1 * 96 // m + pad_x AS BIGINT) AS x1,
               CAST(y1 * 96 // m + pad_y AS BIGINT) AS y1,
               CAST(pad_x AS BIGINT) AS pad_x, CAST(pad_y AS BIGINT) AS pad_y,
               CAST(96 * 1000000 // m AS BIGINT) AS scale_micro
        FROM pads
    """


def _q_spearman(spark, sf_dir):
    """Spearman rank-correlation sufficient statistics (ml/rankstats.
    spearman_stats): 1000 closed-form (x, y) score pairs in 5 groups —
    ranks are row_number over (value, id) (deterministic tiebreak, not
    average ranks), output per group (n, sum_d2) exact integers;
    rho = 1 − 6·sum_d2/(n(n²−1)) is the caller's one division. The
    oracle replays the identical windows."""
    from morituri_spark.ml.rankstats import spearman_stats

    ev = _read(spark, sf_dir, "events").where("event_id < 1000")
    scored = ev.selectExpr(
        "event_id % 5 AS g",
        "event_id AS id",
        "(event_id * 7) % 1000 AS x",
        "(event_id * 13 + event_id % 11) % 1000 AS y",
    )
    return spearman_stats(scored, "g", "x", "y", "id")


def _spearman_oracle_sql() -> str:
    return """
        WITH s AS (
            SELECT event_id % 5 AS g, event_id AS id,
                   (event_id * 7) % 1000 AS x,
                   (event_id * 13 + event_id % 11) % 1000 AS y
            FROM events WHERE event_id < 1000),
        r AS (
            SELECT g,
                   row_number() OVER (PARTITION BY g ORDER BY x, id)
                   - row_number() OVER (PARTITION BY g ORDER BY y, id)
                     AS d
            FROM s)
        SELECT CAST(g AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d * d) AS BIGINT) AS sum_d2
        FROM r GROUP BY g
    """


def _q_kappa(spark, sf_dir):
    """Cohen's kappa sufficient statistics (ml/rankstats.
    cohen_kappa_stats): 1000 items double-annotated with 5 labels in 4
    dataset groups — annotator b disagrees on every 7th item — output
    per group (n, agree, pe_num) exact integers with
    kappa = (agree·n − pe_num)/(n² − pe_num). Marginal-product chance
    agreement replayed identically by the oracle."""
    from morituri_spark.ml.rankstats import cohen_kappa_stats

    ev = _read(spark, sf_dir, "events").where("event_id < 1000")
    labels = ev.selectExpr(
        "event_id % 4 AS g",
        "(event_id * 3) % 5 AS a",
        "CASE WHEN event_id % 7 = 0 THEN ((event_id * 3) + 1) % 5"
        " ELSE (event_id * 3) % 5 END AS b",
    )
    return cohen_kappa_stats(labels, "g", "a", "b")


def _kappa_oracle_sql() -> str:
    return """
        WITH l AS (
            SELECT event_id % 4 AS g, (event_id * 3) % 5 AS a,
                   CASE WHEN event_id % 7 = 0 THEN ((event_id * 3) + 1) % 5
                        ELSE (event_id * 3) % 5 END AS b
            FROM events WHERE event_id < 1000),
        t AS (
            SELECT g, count(*) AS n,
                   sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
            FROM l GROUP BY g),
        ma AS (SELECT g, a AS c, count(*) AS na FROM l GROUP BY 1, 2),
        mb AS (SELECT g, b AS c, count(*) AS nb FROM l GROUP BY 1, 2),
        pe AS (
            SELECT ma.g, sum(na * nb) AS pe_num
            FROM ma JOIN mb ON mb.g = ma.g AND mb.c = ma.c
            GROUP BY ma.g)
        SELECT CAST(t.g AS BIGINT) AS g, CAST(t.n AS BIGINT) AS n,
               CAST(t.agree AS BIGINT) AS agree,
               CAST(coalesce(pe.pe_num, 0) AS BIGINT) AS pe_num
        FROM t LEFT JOIN pe ON pe.g = t.g
    """


def _q_scene_cuts(spark, sf_dir):
    """Scene-cut segmentation (multimodal/video.scene_cuts): 50 videos
    × 20 frames × 8 dense histogram bins (closed-form counts that jump
    every 7 frames) — adjacent-frame L1 distance through ONE
    self-equi-join, cuts above 300, scene_id as the per-video
    cumulative cut count. The oracle replays the join and the window."""
    from morituri_spark.multimodal.video import scene_cuts

    base = _read(spark, sf_dir, "events").where("event_id < 50")
    hists = (
        base.selectExpr("event_id AS v")
        .selectExpr("v", "explode(sequence(0, 19)) AS frame")
        .selectExpr("v", "frame", "explode(sequence(0, 7)) AS bin")
        .selectExpr(
            "printf('vid%04d', v) AS video_id",
            "frame",
            "bin",
            "(v + bin * 3 + frame * 5"
            " + CAST(floor(frame / CAST(7 AS DOUBLE)) AS BIGINT) * 100)"
            " % 200 AS cnt",
        )
    )
    return scene_cuts(hists, cut_thr=300)


def _scene_cuts_oracle_sql() -> str:
    return """
        WITH h AS (
            SELECT v, f, b,
                   (v + b * 3 + f * 5 + (f // 7) * 100) % 200 AS cnt
            FROM (SELECT event_id AS v FROM events WHERE event_id < 50),
                 generate_series(0, 19) fs(f), generate_series(0, 7) bs(b)),
        d AS (
            SELECT a.v, a.f, sum(abs(a.cnt - p.cnt)) AS dist_prev
            FROM h a JOIN h p ON p.v = a.v AND p.b = a.b AND p.f = a.f - 1
            GROUP BY 1, 2),
        fl AS (
            SELECT h.v, h.f, d.dist_prev,
                   coalesce(d.dist_prev > 300, FALSE) AS is_cut
            FROM (SELECT DISTINCT v, f FROM h) h
            LEFT JOIN d ON d.v = h.v AND d.f = h.f)
        SELECT printf('vid%04d', v) AS video_id, CAST(f AS BIGINT) AS frame,
               CAST(dist_prev AS BIGINT) AS dist_prev, is_cut,
               CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END) OVER (
                   PARTITION BY v ORDER BY f
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
        FROM fl
    """


def _q_retrieval_ranks(spark, sf_dir):
    """Cross-modal retrieval evaluation (ml/rankstats.retrieval_ranks):
    40 queries × 20 scored candidates (closed-form scores, every 6th
    (q + c) pair relevant) rank per query by (score DESC, cand_id) and
    fold to exact integer recall@k / MRR sufficient statistics —
    (n_cands, n_rel, first_rel_rank, rel_in_top1/5/10). One window +
    one map-side-combinable aggregate; the oracle replays the identical
    windows."""
    from morituri_spark.ml.rankstats import retrieval_ranks

    ev = _read(spark, sf_dir, "events").where("event_id < 800")
    scored = ev.selectExpr(
        "event_id % 40 AS query_id",
        "CAST(floor(event_id / CAST(40 AS DOUBLE)) AS BIGINT) AS cand_id",
        "(event_id * 7) % 1000 AS score",
        "(event_id % 40 + CAST(floor(event_id / CAST(40 AS DOUBLE))"
        " AS BIGINT)) % 6 = 0 AS is_rel",
    )
    return retrieval_ranks(scored)


def _retrieval_ranks_oracle_sql() -> str:
    return """
        WITH s AS (
            SELECT event_id % 40 AS q, event_id // 40 AS c,
                   (event_id * 7) % 1000 AS sc,
                   (event_id % 40 + event_id // 40) % 6 = 0 AS rel
            FROM events WHERE event_id < 800),
        r AS (
            SELECT q, c, rel,
                   row_number() OVER (PARTITION BY q ORDER BY sc DESC, c)
                     AS k
            FROM s)
        SELECT CAST(q AS BIGINT) AS query_id,
               CAST(count(*) AS BIGINT) AS n_cands,
               CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
               CAST(min(CASE WHEN rel THEN k END) AS BIGINT)
                 AS first_rel_rank,
               CAST(max(CASE WHEN rel AND k <= 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS rel_in_top1,
               CAST(max(CASE WHEN rel AND k <= 5 THEN 1 ELSE 0 END)
                 AS BIGINT) AS rel_in_top5,
               CAST(max(CASE WHEN rel AND k <= 10 THEN 1 ELSE 0 END)
                 AS BIGINT) AS rel_in_top10
        FROM r GROUP BY q
    """


def _q_kfold(spark, sf_dir):
    """Stratified K-fold assignment (text/sampling.kfold_assign): 700
    items in 7 strata spread across 5 folds by the Knuth multiplicative
    shuffle key (id·2654435761 mod 2³²) — deterministic, rerun-stable,
    exactly balanced (±1 per stratum), and the identical integer
    expression in the oracle."""
    from morituri_spark.text.sampling import kfold_assign

    ev = _read(spark, sf_dir, "events").where("event_id < 700")
    items = ev.selectExpr("event_id % 7 AS stratum", "event_id AS id")
    return kfold_assign(items, 5)


def _kfold_oracle_sql() -> str:
    return """
        WITH i AS (
            SELECT event_id % 7 AS stratum, event_id AS id
            FROM events WHERE event_id < 700),
        r AS (
            SELECT stratum, id,
                   row_number() OVER (PARTITION BY stratum
                       ORDER BY (id * 2654435761) % 4294967296, id) AS rn
            FROM i)
        SELECT CAST(stratum AS BIGINT) AS stratum, CAST(id AS BIGINT) AS id,
               CAST((rn - 1) % 5 AS BIGINT) AS fold
        FROM r
    """


def _q_roc_auc(spark, sf_dir):
    """Exact rational ROC-AUC sufficient statistics (ml/rankstats.
    roc_auc_stats): 6000 scored items in 6 groups with closed-form
    labels (per-group prevalence varies) and scores quantized to ≤59
    levels with positives shifted up — AUC = auc_num2/(2·n_pos·n_neg)
    via the Mann–Whitney pair count folded through cumulative
    distinct-score counts (ties count ½, so 2·AUC·n⁺·n⁻ is an exact
    BIGINT). The oracle replays the identical cumulative window."""
    from morituri_spark.ml.rankstats import roc_auc_stats

    ev = _read(spark, sf_dir, "events").where("event_id < 6000")
    scored = ev.selectExpr(
        "event_id % 6 AS g",
        "event_id AS id",
        "CASE WHEN (event_id * 13) % 97 < 40 + (event_id % 6) * 5"
        " THEN 1 ELSE 0 END AS y",
    ).selectExpr("g", "CAST((id * 7) % 50 + y * 9 AS BIGINT) AS s", "y")
    return roc_auc_stats(scored, "g", "s", "y")


def _roc_auc_oracle_sql() -> str:
    return """
        WITH sc AS (
            SELECT event_id % 6 AS g,
                   CAST((event_id * 7) % 50
                        + (CASE WHEN (event_id * 13) % 97
                                     < 40 + (event_id % 6) * 5
                                THEN 1 ELSE 0 END) * 9 AS BIGINT) AS s,
                   CASE WHEN (event_id * 13) % 97 < 40 + (event_id % 6) * 5
                        THEN 1 ELSE 0 END AS y
            FROM events WHERE event_id < 6000),
        v AS (
            SELECT g, s, sum(y) AS np, sum(1 - y) AS nn
            FROM sc GROUP BY g, s),
        c AS (
            SELECT g, np, nn,
                   coalesce(sum(nn) OVER (PARTITION BY g ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS below
            FROM v)
        SELECT CAST(g AS BIGINT) AS g,
               CAST(sum(np) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg,
               CAST(sum(np * (2 * below + nn)) AS BIGINT) AS auc_num2
        FROM c GROUP BY g
    """


def _q_calibration(spark, sf_dir):
    """Exact calibration bins + ECE numerator (ml/rankstats.
    calibration_bins): 8000 predictions in 4 groups, per-mille
    confidences 0..1000 (the right edge folds into bin 9) with
    closed-form nearly-calibrated labels — per-(group, bin) rows carry
    gap_num = |1000·n_pos − sum_conf| so ECE = Σ gap_num/(1000·N) with
    zero float until the caller's division. ONE hash aggregate; the
    oracle replays the identical bin arithmetic (DIV ≡ // on
    non-negatives)."""
    from morituri_spark.ml.rankstats import calibration_bins

    ev = _read(spark, sf_dir, "events").where("event_id < 8000")
    preds = ev.selectExpr(
        "event_id % 4 AS g",
        "(event_id * 31) % 1001 AS c",
        "CASE WHEN (event_id * 17) % 1000 < (event_id * 31) % 1001"
        " THEN 1 ELSE 0 END AS y",
    )
    return calibration_bins(preds, "g", "c", "y", n_bins=10)


def _calibration_oracle_sql() -> str:
    return """
        WITH p AS (
            SELECT event_id % 4 AS g,
                   (event_id * 31) % 1001 AS c,
                   CASE WHEN (event_id * 17) % 1000
                             < (event_id * 31) % 1001
                        THEN 1 ELSE 0 END AS y
            FROM events WHERE event_id < 8000),
        b AS (
            SELECT g, least(c * 10 // 1000, 9) AS bin, c, y FROM p)
        SELECT CAST(g AS BIGINT) AS g, CAST(bin AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(c) AS BIGINT) AS sum_conf,
               CAST(abs(1000 * sum(y) - sum(c)) AS BIGINT) AS gap_num
        FROM b GROUP BY g, bin
    """


def _q_homography(spark, sf_dir):
    """Projective homography box remap (multimodal/detections.
    homography_boxes): the 200-image closed-form boxes carry integer
    3×3 homographies with perspective terms; corners map through
    (h0·p)/(h2·p) in exact shared arithmetic — numerators ≤ 2·10¹³
    stay below 2⁵³, so CAST(floor(num·10⁶/den) AS BIGINT) is
    bit-identical in both engines (rule 28) — the output box is the
    clipped axis-aligned hull in micro pixels, and corners on/behind
    the camera plane (den ≤ 0, present in the fixture) emit
    valid = 0 with NULL coordinates. Pure codegen, zero exchanges."""
    from pyspark.sql import functions as F

    from morituri_spark.multimodal.detections import homography_boxes

    boxes = _det_boxes(spark, sf_dir, 200, 3).selectExpr(
        "image_id", "box_id", "x0", "y0", "x1", "y1", "score",
        "CAST(substr(image_id, 4) AS BIGINT) AS _i",
    ).selectExpr(
        "image_id", "box_id", "x0", "y0", "x1", "y1", "score",
        "90 + _i % 20 AS h00", "(_i % 7) - 3 AS h01",
        "(_i * 11) % 50 AS h02",
        "(_i % 5) - 2 AS h10", "90 + (3 * _i) % 20 AS h11",
        "(_i * 13) % 50 AS h12",
        "(_i % 3) - 1 AS h20", "(_i % 5) - 2 AS h21",
        "30 + (_i * 7) % 600 AS h22",
    )
    out = homography_boxes(boxes, size=96)
    return out.withColumn("valid", F.col("valid").cast("long"))


def _homography_oracle_sql() -> str:
    b_sql = _DET_BOX_SQL.format(shift=0, per_img=3, n_rows=600)
    corners = {"a": ("x0", "y0"), "b": ("x1", "y0"),
               "c": ("x0", "y1"), "d": ("x1", "y1")}
    den_exprs = ",\n                   ".join(
        f"h20 * {cx} + h21 * {cy} + h22 AS den_{k}"
        for k, (cx, cy) in corners.items()
    )
    map_exprs = ",\n                   ".join(
        f"CAST(floor((h00 * {cx} + h01 * {cy} + h02) * 1000000.0"
        f" / (CASE WHEN den_{k} > 0 THEN den_{k} ELSE 1 END))"
        f" AS BIGINT) AS mx_{k},\n                   "
        f"CAST(floor((h10 * {cx} + h11 * {cy} + h12) * 1000000.0"
        f" / (CASE WHEN den_{k} > 0 THEN den_{k} ELSE 1 END))"
        f" AS BIGINT) AS my_{k}"
        for k, (cx, cy) in corners.items()
    )
    clip = (
        lambda e: "CAST(CASE WHEN valid THEN greatest(0, least(96000000,"
        f" {e})) END AS BIGINT)"
    )
    return f"""
        WITH b AS (
            SELECT q.*,
                   90 + i % 20 AS h00, (i % 7) - 3 AS h01,
                   (i * 11) % 50 AS h02,
                   (i % 5) - 2 AS h10, 90 + (3 * i) % 20 AS h11,
                   (i * 13) % 50 AS h12,
                   (i % 3) - 1 AS h20, (i % 5) - 2 AS h21,
                   30 + (i * 7) % 600 AS h22
            FROM ({b_sql}) q),
        d AS (
            SELECT b.*,
                   {den_exprs}
            FROM b),
        m AS (
            SELECT d.*,
                   (den_a > 0 AND den_b > 0 AND den_c > 0 AND den_d > 0)
                     AS valid,
                   {map_exprs}
            FROM d)
        SELECT printf('img%08d', i) AS image_id,
               CAST(j AS BIGINT) AS box_id, CAST(s AS BIGINT) AS score,
               CAST(h00 AS BIGINT) AS h00, CAST(h01 AS BIGINT) AS h01,
               CAST(h02 AS BIGINT) AS h02, CAST(h10 AS BIGINT) AS h10,
               CAST(h11 AS BIGINT) AS h11, CAST(h12 AS BIGINT) AS h12,
               CAST(h20 AS BIGINT) AS h20, CAST(h21 AS BIGINT) AS h21,
               CAST(h22 AS BIGINT) AS h22,
               CAST(valid AS BIGINT) AS valid,
               {clip('least(mx_a, mx_b, mx_c, mx_d)')} AS x0,
               {clip('least(my_a, my_b, my_c, my_d)')} AS y0,
               {clip('greatest(mx_a, mx_b, mx_c, mx_d)')} AS x1,
               {clip('greatest(my_a, my_b, my_c, my_d)')} AS y1
        FROM m
    """


def _q_chaikin(spark, sf_dir):
    """Chaikin corner-cutting smoothing (geo/simplify.chaikin_smooth):
    200 closed-form 8-vertex ways (signed coordinates) smoothed for 2
    iterations in EXACT quarter-unit integers — output coords are
    16× the input with zero rounding surface, endpoints preserved,
    sequence renumbered 0-based consecutive. The oracle unrolls both
    iterations as MATERIALIZED stages (rule 27: each stage is
    referenced by four union branches)."""
    from morituri_spark.geo.simplify import chaikin_smooth

    ev = _read(spark, sf_dir, "events").where("event_id < 1600")
    pts = ev.selectExpr(
        "event_id div 8 AS way_id",
        "event_id % 8 AS seq",
        "((event_id * 7) % 200) - 100 AS x",
        "((event_id * 13) % 180) - 90 AS y",
    )
    return chaikin_smooth(pts, iters=2)


def _chaikin_oracle_sql() -> str:
    it = """
        {out} AS (
            SELECT w, 0 AS s, 4 * x AS x, 4 * y AS y
            FROM {src} WHERE s = 0
            UNION ALL
            SELECT w, 2 * s + 1, 3 * x + nx, 3 * y + ny
            FROM {src} WHERE nx IS NOT NULL
            UNION ALL
            SELECT w, 2 * s + 2, x + 3 * nx, y + 3 * ny
            FROM {src} WHERE nx IS NOT NULL
            UNION ALL
            SELECT w, 2 * lst + 1, 4 * x, 4 * y
            FROM {src} WHERE s = lst AND lst > 0)"""
    lead = """
        {out} AS MATERIALIZED (
            SELECT w, s, x, y,
                   lead(x) OVER (PARTITION BY w ORDER BY s) AS nx,
                   lead(y) OVER (PARTITION BY w ORDER BY s) AS ny,
                   max(s) OVER (PARTITION BY w) AS lst
            FROM {src})"""
    return f"""
        WITH pts AS (
            SELECT event_id // 8 AS w, event_id % 8 AS s,
                   ((event_id * 7) % 200) - 100 AS x,
                   ((event_id * 13) % 180) - 90 AS y
            FROM events WHERE event_id < 1600),
        {lead.format(out='it1', src='pts')},
        {it.format(out='o1', src='it1')},
        {lead.format(out='it2', src='o1')},
        {it.format(out='o2', src='it2')}
        SELECT CAST(w AS BIGINT) AS way_id, CAST(s AS BIGINT) AS seq,
               CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
        FROM o2
    """


def _q_brier(spark, sf_dir):
    """Exact Brier-score sufficient statistics (ml/rankstats.
    brier_stats) on the SAME closed-form predictions as
    calibration_ece: brier_num = Σ(1000·y − c)² is one BIGINT per
    group (Brier = brier_num/(n·10⁶) is the caller's division) —
    ranking (AUC), reliability (ECE), and accuracy-of-probability
    (Brier) now triangulate the same scorer. ONE hash aggregate."""
    from morituri_spark.ml.rankstats import brier_stats

    ev = _read(spark, sf_dir, "events").where("event_id < 8000")
    preds = ev.selectExpr(
        "event_id % 4 AS g",
        "(event_id * 31) % 1001 AS c",
        "CASE WHEN (event_id * 17) % 1000 < (event_id * 31) % 1001"
        " THEN 1 ELSE 0 END AS y",
    )
    return brier_stats(preds, "g", "c", "y")


def _brier_oracle_sql() -> str:
    return """
        WITH p AS (
            SELECT event_id % 4 AS g,
                   (event_id * 31) % 1001 AS c,
                   CASE WHEN (event_id * 17) % 1000
                             < (event_id * 31) % 1001
                        THEN 1 ELSE 0 END AS y
            FROM events WHERE event_id < 8000)
        SELECT CAST(g AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum((1000 * y - c) * (1000 * y - c)) AS BIGINT)
                 AS brier_num
        FROM p GROUP BY g
    """


_DOMAIN_TEXT = (
    "concat('Visit HTTP://Site', CAST(event_id % 37 AS STRING),"
    " '.example.com/a then https://cdn',"
    " CAST(event_id % 11 AS STRING), '.net/x',"
    " CASE WHEN event_id % 3 = 0 THEN ' and plain text'"
    " ELSE concat(' https://site', CAST(event_id % 37 AS STRING),"
    "             '.example.com/b') END)"
)


def _q_domain_counts(spark, sf_dir):
    """URL-domain mining (text/patterns.url_domain_counts): 4000
    closed-form docs carrying 2-3 mixed-case URLs each — extraction is
    the shared single-char-class pattern over lower-cased text (Java
    and RE2 regex agree by construction), rollup is the two-level
    (domain, doc) → domain hash aggregate. Exercises case folding
    (HTTP://Site… folds into the same domain as https://site…) and
    multi-hit docs."""
    ev = _read(spark, sf_dir, "events").where("event_id < 4000")
    docs = ev.selectExpr("event_id AS doc_id", f"{_DOMAIN_TEXT} AS text")
    from morituri_spark.text.patterns import url_domain_counts

    return url_domain_counts(docs)


def _domain_counts_oracle_sql() -> str:
    return f"""
        WITH d AS (
            SELECT event_id AS doc_id, {_DOMAIN_TEXT} AS text
            FROM events WHERE event_id < 4000),
        h AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text),
                       'https?://([a-z0-9.-]+)', 1)) AS domain
            FROM d),
        pd AS (
            SELECT domain, doc_id, count(*) AS hh
            FROM h GROUP BY domain, doc_id)
        SELECT domain, CAST(sum(hh) AS BIGINT) AS n_hits,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM pd GROUP BY domain
    """


def _q_pr_curve(spark, sf_dir):
    """Exact PR-curve points (ml/rankstats.pr_curve_points) on the SAME
    closed-form scored items as roc_auc_groups: one row per distinct
    (group, score) with tp/fp counting items AT OR ABOVE the level —
    precision/recall/step-AP are caller folds over exact integers. The
    oracle replays the identical score-DESC cumulative window over the
    collapsed distinct-score relation."""
    from morituri_spark.ml.rankstats import pr_curve_points

    ev = _read(spark, sf_dir, "events").where("event_id < 6000")
    scored = ev.selectExpr(
        "event_id % 6 AS g",
        "event_id AS id",
        "CASE WHEN (event_id * 13) % 97 < 40 + (event_id % 6) * 5"
        " THEN 1 ELSE 0 END AS y",
    ).selectExpr("g", "CAST((id * 7) % 50 + y * 9 AS BIGINT) AS s", "y")
    return pr_curve_points(scored, "g", "s", "y")


def _pr_curve_oracle_sql() -> str:
    return """
        WITH sc AS (
            SELECT event_id % 6 AS g,
                   CAST((event_id * 7) % 50
                        + (CASE WHEN (event_id * 13) % 97
                                     < 40 + (event_id % 6) * 5
                                THEN 1 ELSE 0 END) * 9 AS BIGINT) AS s,
                   CASE WHEN (event_id * 13) % 97 < 40 + (event_id % 6) * 5
                        THEN 1 ELSE 0 END AS y
            FROM events WHERE event_id < 6000),
        v AS (
            SELECT g, s, sum(y) AS np, sum(1 - y) AS nn
            FROM sc GROUP BY g, s)
        SELECT CAST(g AS BIGINT) AS g, s,
               CAST(sum(np) OVER (PARTITION BY g ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS tp,
               CAST(sum(nn) OVER (PARTITION BY g ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS fp
        FROM v
    """


def _q_pyramid(spark, sf_dir):
    """Mipmap pyramid sums (geo/terrain.pyramid_sums) over the SAME 40
    closed-form 24×24 keyed rasters as box_filter_grid: levels 1..3
    carry exact 2^ℓ-block integer sums + support counts via the
    hierarchical rollup (each level aggregates the previous — work is
    a geometric series). The oracle replays every level INDEPENDENTLY
    from the base raster with direct `//`-block grouping, so a green
    row proves the hierarchy ≡ the direct rollup."""
    from morituri_spark.geo.terrain import pyramid_sums

    ev = _read(spark, sf_dir, "events").where("event_id < 23040")
    dem = ev.selectExpr(
        "event_id % 40 AS g",
        "CAST(floor(event_id / 40.0) AS BIGINT) % 24 AS ix",
        "CAST(floor(event_id / 960.0) AS BIGINT) AS iy",
    ).selectExpr(
        "g", "ix", "iy",
        "(7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z",
    )
    return pyramid_sums(dem, levels=3, keys=["g"])


def _pyramid_oracle_sql() -> str:
    lvl = """
            SELECT CAST(g AS BIGINT) AS g, CAST({l} AS BIGINT) AS level,
                   CAST(ix // {b} AS BIGINT) AS ix,
                   CAST(iy // {b} AS BIGINT) AS iy,
                   CAST(sum(z) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM dem GROUP BY g, ix // {b}, iy // {b}"""
    return f"""
        WITH base AS (
            SELECT event_id % 40 AS g,
                   CAST(floor(event_id / 40.0) AS BIGINT) % 24 AS ix,
                   CAST(floor(event_id / 960.0) AS BIGINT) AS iy
            FROM events WHERE event_id < 23040),
        dem AS (
            SELECT g, ix, iy,
                   (7 * g + 3 * iy + 5 * ix + (ix * iy) % 11) % 97 AS z
            FROM base)
        {lvl.format(l=1, b=2)}
        UNION ALL
        {lvl.format(l=2, b=4)}
        UNION ALL
        {lvl.format(l=3, b=8)}
    """


_BF_CUR = "(11 * g + 7 * ix + 13 * iy + (ix * iy) % 5) % 251"
_BF_NXT = (
    "(11 * g + 7 * (ix - (g % 5 - 2)) + 13 * (iy - (g % 3 - 1))"
    " + ((ix - (g % 5 - 2)) * (iy - (g % 3 - 1))) % 5) % 251"
    " + (ix + iy + g) % 3"
)


def _q_block_flow(spark, sf_dir):
    """Block-matching motion estimation (multimodal/video.block_flow):
    30 closed-form 16×16 frame pairs where frame t+1 is frame t
    shifted by (g%5−2, g%3−1) plus a small additive perturbation — the
    per-8×8-block argmin-SAD over the ±2 displacement grid recovers
    the shift. Winner selection is ONE map-side min() over the
    composite ordinal sad·25 + (dx+2)·5 + (dy+2) (unique per
    candidate, SAD-major, ties to smaller displacement) decoded
    algebraically — no argmax window anywhere. Only full-support
    (64-pixel) candidates compete; the oracle replays the identical
    fan-join-min pipeline."""
    from morituri_spark.multimodal.video import block_flow

    ev = _read(spark, sf_dir, "events").where("event_id < 7680")
    px = ev.selectExpr(
        "event_id % 30 AS g",
        "(event_id div 30) % 16 AS ix",
        "event_id div 480 AS iy",
    )
    cur = px.selectExpr("g", "ix", "iy", f"{_BF_CUR} AS v")
    nxt = px.selectExpr("g", "ix", "iy", f"{_BF_NXT} AS v")
    return block_flow(cur, nxt, keys=["g"], block=8, radius=2)


def _block_flow_oracle_sql() -> str:
    return f"""
        WITH px AS (
            SELECT event_id % 30 AS g,
                   (event_id // 30) % 16 AS ix,
                   event_id // 480 AS iy
            FROM events WHERE event_id < 7680),
        cur AS (SELECT g, ix, iy, {_BF_CUR} AS v FROM px),
        nxt AS (SELECT g, ix, iy, {_BF_NXT} AS w FROM px),
        d AS (SELECT t1.dx, t2.dy
              FROM generate_series(-2, 2) t1(dx),
                   generate_series(-2, 2) t2(dy)),
        cand AS (
            SELECT c.g, c.ix // 8 AS bx, c.iy // 8 AS by, d.dx, d.dy,
                   abs(c.v - n.w) AS ad
            FROM cur c, d, nxt n
            WHERE n.g = c.g AND n.ix = c.ix + d.dx
              AND n.iy = c.iy + d.dy),
        s AS (
            SELECT g, bx, by, dx, dy, sum(ad) AS sad
            FROM cand GROUP BY g, bx, by, dx, dy
            HAVING count(*) = 64),
        o AS (
            SELECT g, bx, by,
                   min(sad * 25 + (dx + 2) * 5 + (dy + 2)) AS m
            FROM s GROUP BY g, bx, by)
        SELECT CAST(g AS BIGINT) AS g, CAST(bx AS BIGINT) AS bx,
               CAST(by AS BIGINT) AS by,
               CAST(m // 25 AS BIGINT) AS sad,
               CAST((m % 25) // 5 - 2 AS BIGINT) AS dx,
               CAST(m % 5 - 2 AS BIGINT) AS dy
        FROM o
    """


def _q_clip_tile(spark, sf_dir):
    """Axis-aligned Sutherland–Hodgman ring clipping (geo/overlay.
    clip_rings_to_tile): 100 closed-form hexagons at varied centers
    clip to the [10, 90]² tile with integer-pixel snapping (the
    vector-tile-encoder quantization) — four unrolled half-plane
    stages, intersection coords exact-shared floor arithmetic, rings
    collapsing below 3 vertices drop. The fixture spans fully-inside,
    crossing, and fully-outside regimes; the oracle replays all four
    stages as MATERIALIZED CTEs (rule 27: each edge stage feeds two
    branches plus the renumber)."""
    from morituri_spark.geo.overlay import clip_rings_to_tile

    ev = _read(spark, sf_dir, "events").where("event_id < 600")
    rings = ev.selectExpr(
        "event_id div 6 AS ring_id",
        "event_id % 6 AS seq",
    ).selectExpr(
        "ring_id", "seq",
        "(ring_id * 37) % 120 - 10"
        " + CASE seq WHEN 0 THEN 14 WHEN 1 THEN 7 WHEN 2 THEN -7"
        " WHEN 3 THEN -14 WHEN 4 THEN -7 ELSE 7 END AS x",
        "(ring_id * 53) % 120 - 10"
        " + CASE seq WHEN 0 THEN 0 WHEN 1 THEN 12 WHEN 2 THEN 12"
        " WHEN 3 THEN 0 WHEN 4 THEN -12 ELSE -12 END AS y",
    )
    return clip_rings_to_tile(rings, 10, 10, 90, 90)


def _clip_tile_oracle_sql() -> str:
    def stage(src, out, axis, c, sign):
        other = "y" if axis == "x" else "x"
        ip = f"({sign} * ({axis} - {c}) >= 0)"
        il = f"({sign} * (n{axis} - {c}) >= 0)"
        if axis == "x":
            ix = f"CAST({c} AS BIGINT)"
            iy = (
                f"y + CAST(floor((ny - y) * ({c} - x) * 1.0"
                " / (nx - x)) AS BIGINT)"
            )
        else:
            iy = f"CAST({c} AS BIGINT)"
            ix = (
                f"x + CAST(floor((nx - x) * ({c} - y) * 1.0"
                " / (ny - y)) AS BIGINT)"
            )
        full = ("ROWS BETWEEN UNBOUNDED PRECEDING"
                " AND UNBOUNDED FOLLOWING")
        return f"""
        {out}_e AS MATERIALIZED (
            SELECT r, s, x, y,
                   coalesce(lead(x) OVER (PARTITION BY r ORDER BY s),
                            first_value(x) OVER (PARTITION BY r
                                ORDER BY s {full})) AS nx,
                   coalesce(lead(y) OVER (PARTITION BY r ORDER BY s),
                            first_value(y) OVER (PARTITION BY r
                                ORDER BY s {full})) AS ny
            FROM {src}),
        {out}_p AS MATERIALIZED (
            SELECT r, s, 0 AS pos, {ix} AS x, {iy} AS y
            FROM {out}_e WHERE {ip} != {il}
            UNION ALL
            SELECT r, s, 1 AS pos, nx AS x, ny AS y
            FROM {out}_e WHERE {il}),
        {out} AS (
            SELECT r,
                   row_number() OVER (PARTITION BY r
                       ORDER BY s, pos) - 1 AS s, x, y
            FROM {out}_p)"""

    stages = ",".join([
        stage("base", "o1", "x", 10, 1),
        stage("o1", "o2", "x", 90, -1),
        stage("o2", "o3", "y", 10, 1),
        stage("o3", "o4", "y", 90, -1),
    ])
    return f"""
        WITH ids AS (
            SELECT event_id // 6 AS r, event_id % 6 AS k
            FROM events WHERE event_id < 600),
        base AS (
            SELECT r, k AS s,
                   (r * 37) % 120 - 10
                   + CASE k WHEN 0 THEN 14 WHEN 1 THEN 7 WHEN 2 THEN -7
                     WHEN 3 THEN -14 WHEN 4 THEN -7 ELSE 7 END AS x,
                   (r * 53) % 120 - 10
                   + CASE k WHEN 0 THEN 0 WHEN 1 THEN 12 WHEN 2 THEN 12
                     WHEN 3 THEN 0 WHEN 4 THEN -12 ELSE -12 END AS y
            FROM ids),
        {stages}
        SELECT CAST(r AS BIGINT) AS ring_id, CAST(s AS BIGINT) AS seq,
               CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
        FROM (SELECT o4.*, count(*) OVER (PARTITION BY r) AS n FROM o4)
        WHERE n >= 3
    """


def _q_block_flow_dense(spark, sf_dir):
    """Dense-raster block-flow fast path (multimodal/video.
    block_flow_dense): SAME fixture and SAME independent join-based
    DuckDB oracle as block_flow_motion, but the Spark side reads every
    displaced pixel via 25 window lead/lags over one row-major sort
    (no 25x fan join) — a green row proves the two physical plans and
    the oracle agree bit-for-bit. Bench: 76.7s -> 8.4-14.2s at 8M px."""
    from morituri_spark.multimodal.video import block_flow_dense

    ev = _read(spark, sf_dir, "events").where("event_id < 7680")
    px = ev.selectExpr(
        "event_id % 30 AS g",
        "(event_id div 30) % 16 AS ix",
        "event_id div 480 AS iy",
    )
    cur = px.selectExpr("g", "ix", "iy", f"{_BF_CUR} AS v")
    nxt = px.selectExpr("g", "ix", "iy", f"{_BF_NXT} AS v")
    return block_flow_dense(
        cur, nxt, dims=(16, 16), keys=["g"], block=8, radius=2
    )


def _q_ndcg(spark, sf_dir):
    """Graded-relevance NDCG@10 sufficient statistics (ml/rankstats.
    ndcg_stats): 500 queries × 16 closed-form candidates with rel
    grades 0-3 — dcg/idcg micro-sums use a PYTHON-computed literal
    discount table floor(10⁶/log2(i+1)) embedded identically in both
    plans, so the one float surface (libm log2) is eliminated rather
    than epsilon-managed. Two rank windows + one aggregate."""
    from morituri_spark.ml.rankstats import ndcg_stats

    ev = _read(spark, sf_dir, "events").where("event_id < 8000")
    scored = ev.selectExpr(
        "event_id % 500 AS query_id",
        "event_id div 500 AS cand_id",
        "(event_id * 7) % 97 AS score",
        "CASE WHEN (event_id * 11) % 5 = 0 THEN (event_id * 3) % 4"
        " ELSE 0 END AS rel",
    )
    return ndcg_stats(scored, k=10)


def _ndcg_oracle_sql() -> str:
    from morituri_spark.ml.rankstats import _ndcg_discounts

    disc = _ndcg_discounts(10)
    dcase = (
        "CASE rk "
        + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(disc))
        + " ELSE 0 END"
    )
    icase = dcase.replace("CASE rk", "CASE irk")
    return f"""
        WITH sc AS (
            SELECT event_id % 500 AS query_id,
                   event_id // 500 AS cand_id,
                   (event_id * 7) % 97 AS score,
                   CASE WHEN (event_id * 11) % 5 = 0
                        THEN (event_id * 3) % 4 ELSE 0 END AS rel
            FROM events WHERE event_id < 8000),
        r AS (
            SELECT query_id, rel,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, cand_id) AS rk,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY rel DESC, cand_id) AS irk
            FROM sc)
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(count(*) AS BIGINT) AS n_cands,
               CAST(sum(rel * ({dcase})) AS BIGINT) AS dcg_micro,
               CAST(sum(rel * ({icase})) AS BIGINT) AS idcg_micro
        FROM r GROUP BY query_id
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver records CORRECTNESS rows for the FIRST
    # 50 entries only; _WINDOW (below) picks them explicitly. Ninth-session
    # (final) rotation: more never-driver-checked queries exist than window
    # slots, so triage is by CODE RISK and FAMILY REPRESENTATION — the 12
    # ninth-session operators (weighted SSSP, triangles, k-core, bigram LM,
    # Theil-Sen, interval union, TF-IDF keywords, silence segments, rolling
    # range frames, edit-1 fuzzy join, funnel, Horn slope/aspect) are the
    # freshest code and all enter, the three re-pointed ex-demos keep their
    # oracled-row slots (r4 verdict item #2), and the released entries are
    # each the best-covered member of their family: every one is EQUAL in
    # this session's full sf0.01 sweep (SURVEY §8), pytest-covered, in the
    # test_entry replica, and named with its in-window sibling at the
    # release comment below.
    base = {
        # --- r3-stale block: rotate back into the driver window ---
        "ring_areas_shoelace": _q_ring_areas,
        "streaming_first_seen": _q_streaming_first_seen,
        # golden-table oracles (Python kernel derives the expected VALUES;
        # the query runs the INDEPENDENT Catalyst implementation)
        "zsplit_golden_vectors": _q_zsplit_golden,
        "ring_chunking_golden": _q_ring_chunk,
        "pricing_summary": _q_pricing,
        "dim_chain_revenue": _q_dim_chain,
        "semi_join_open_orders": _q_semi,
        "anti_join_orderless": _q_anti,
        "min_pivot_restrictions": _q_min_pivot,
        "group_collect_ordered": _q_group_collect,
        # window_lead_delta (r3-green, frozen lead/lag surface; the window
        # machinery stays in-window via window_topk_per_key) yields its
        # slot to the never-checked quadkey_pyramid — registered below 50
        "window_topk_per_key": _q_window_topk,
        "dedup_quantized_loc": _q_dedup_quantized,
        "case_decision_tree": _q_case_tree,
        "units_format_6g": _q_units_format,
        "string_merge_lr": _q_string_merge,
        # hourly_rollup (r3-green, frozen date_trunc groupBy; the time-agg
        # surface stays in-window via sessionize_gap) yields its slot to
        # the never-checked crossmodal_dup_confirm — registered below 50
        "chunk_fixed_size": _q_chunk_groups,
        "sessionize_gap": _q_sessionize,
        "hll_distinct_gate": _q_hll_gate,
        "value_quantiles": _q_value_quantiles,
        # cube_rollup (r3-green, frozen GROUPING SETS surface, pytest-
        # covered) yields its window slot to the never-checked
        # admin_boundaries ex-demo — registered below position 50
        "dedup_exact_groups": _q_dedup_exact,
        "shingle_counts": _q_shingle_count,
        "token_counts": _q_token_counts,
        "quality_ratios": _q_quality,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        # --- new in the r5 continuation: never driver-checked before ---
        "decontaminate_benchmark": _q_decontaminate,
        "bm25_doc_retrieval": _q_bm25_topk,
        "duplicate_span_ratio": _q_duplicate_spans,
        "mixture_budget_sample": _q_mixture_budget,
        "segment_zone_lengths": _q_segment_zone_lengths,
        "chunk_text_windows": _q_chunk_text,
        "polygon_overlap_join": _q_polygon_overlap,
        "ann_pq_topk": _q_ann_pq,  # r5-new, moved inside the window
        # r5-continuation: trajectory + density family (never checked;
        # pip_zone_assign_salted / streaming_dedup_exact rotate out — both
        # r4-green and replica-covered)
        "trajectory_stay_points": _q_stay_points,
        "grid_cell_density": _q_cell_density,
        "phash_near_dup": _q_phash_near_dup,
        "snap_points_to_segments": _q_snap_segments,
        "grid_density_clusters": _q_grid_clusters,
        "grid_hotspot_cells": _q_hotspot_cells,
        "morans_i_autocorrelation": _q_morans_i,
        "local_morans_lisa": _q_local_morans,
        "gi_star_hotspots": _q_gi_star,
        "emerging_hotspots": _q_emerging_hotspots,
        "adaptive_quadtree_cells": _q_adaptive_cells,
        "adaptive_assign_rollup": _q_adaptive_assign,
        "colocation_quotients": _q_colocation,
        "emerging_gi_hotspots": _q_emerging_gi,
        "semdedup_keep_flags": _q_semdedup,
        "vit_patch_tokens": _q_extract_patches,
        "image_quality_gates": _q_image_quality,
        "idw_surface_cells": _q_idw_surface,
        "resample_tracks_daily": _q_resample_track,
        "quadkey_pyramid": _q_quadkey_pyramid,
        "crossmodal_dup_confirm": _q_crossmodal_dups,
        # --- new in r5 ---
        "render_density_tiles": _q_render_tiles,
        "dem_hillshade": _q_hillshade,
        "augment_checksums": _q_augment,
        "frequent_tokens": _q_frequent_tokens,
        "dtw_track_pairs": _q_dtw_pairs,
        "hmm_map_match": _q_hmm_match,
        "quantiles_nosort": _q_quantiles_nosort,
        "table_diff_audit": _q_diff_tables,
        "color_histogram_dups": _q_color_hist_dups,
        "knn_mega_cell_skew": _q_knn_mega_cell,
        "jpeg_progressive_roundtrip": _q_jpeg_progressive_roundtrip,
        "jpeg_constant_roundtrip": _q_jpeg_roundtrip,  # decoder refactored
        # --- eleventh session: freshest code, all enter the window ---
        "poly_dissolve_stats": _q_dissolve,
        "hough_line_votes": _q_hough,
        "image_equalize_otsu": _q_equalize_otsu,
        "bpe_train_merges": _q_bpe,
        "collocation_pmi": _q_collocations,
        "image_edge_hough": _q_edge_hough,
        "image_blob_stats": _q_blob_stats,
        # --- twelfth session: freshest code, enters the window ---
        "frechet_track_pairs": _q_frechet_pairs,
        "gwr_surface_betas": _q_gwr_surface,
        "image_morphology": _q_morphology,
        "harris_corners_topk": _q_harris_corners,
        "chamfer_distance_hist": _q_chamfer_hist,
        # --- thirteenth session: freshest code, enters the window ---
        "glcm_texture": _q_glcm_features,
        "lbp_histogram": _q_lbp_histogram,
        "run_length_texture": _q_run_lengths,
        "median_filter_stats": _q_median_filter,
        "template_match_sad": _q_template_match,
        "convoy_comovement": _q_convoy,
        "dag_critical_path": _q_dag_longest,
        "kn_bigram_lm": _q_kn_bigram,
        "image_moments": _q_image_moments,
        "box_filter_grid": _q_box_filter,
        "pattern_hit_counts": _q_pattern_hits,
        "zhang_suen_thinning": _q_thinning,
        "ridge_visibility": _q_ridge_visibility,
        "frequent_pairs_lift": _q_frequent_pairs,
        "orientation_histogram": _q_orientation_hist,
        "cusum_changepoints": _q_cusum,
        "acf_lags": _q_acf,
        "dominant_period": _q_dominant_period,
        # --- fifteenth session: pipeline plumbing ---
        "scd2_intervals": _q_scd2,
        "sorted_neighborhood_pairs": _q_snm_pairs,
        "cardinal_viewshed": _q_cardinal_viewshed,
        "streaming_sessionize": _q_streaming_sessionize,
        # --- sixteenth session ---
        "fast_corners": _q_fast_corners,
        "geofence_visits": _q_geofence,
        "merge_upsert": _q_merge_upsert,
        # --- seventeenth session ---
        "brief_descriptors": _q_brief_descriptors,
        "pitch_amdf": _q_pitch_amdf,
        "ring_self_intersections": _q_ring_self_intersections,
        # --- eighteenth session: detection post-processing + masks ---
        "nms_boxes": _q_nms,
        "detection_matches": _q_detection_matches,
        "mask_rle_runs": _q_mask_rle,
        # --- nineteenth session: training targets + evaluation ---
        "anchor_assign": _q_anchor_assign,
        "detection_ap": _q_detection_ap,
        "bleu_captions": _q_bleu_captions,
        # --- twentieth session: segmentation eval + augmentation ---
        "panoptic_quality": _q_panoptic,
        "confusion_matrix": _q_confusion,
        "mosaic_boxes": _q_mosaic,
        # --- twenty-first session: allocation + validity + ingest ---
        "apportion_budget": _q_apportion,
        "ring_nesting": _q_ring_nesting,
        "exif_boxes": _q_exif_boxes,
        # --- twenty-second session: video tracking + resize plan ---
        "iou_tracklets": _q_tracklets,
        "letterbox_boxes": _q_letterbox,
        # --- twenty-third session: evaluation + video structure ---
        "spearman_corr": _q_spearman,
        "cohen_kappa": _q_kappa,
        "scene_cuts": _q_scene_cuts,
        # --- twenty-fourth session: retrieval eval + CV splits ---
        "retrieval_ranks": _q_retrieval_ranks,
        "kfold_assign": _q_kfold,
        # --- twenty-fifth session: classifier eval + projective warp ---
        "roc_auc_groups": _q_roc_auc,
        "calibration_ece": _q_calibration,
        "homography_boxes": _q_homography,
        # --- twenty-sixth session: smoothing + eval + provenance ---
        "chaikin_smooth": _q_chaikin,
        "brier_scores": _q_brier,
        "domain_counts": _q_domain_counts,
        # --- twenty-seventh session: PR curves + raster mipmaps ---
        "pr_curve_points": _q_pr_curve,
        "pyramid_sums": _q_pyramid,
        # --- twenty-eighth session: motion estimation ---
        "block_flow_motion": _q_block_flow,
        # --- twenty-ninth session: tile clipping ---
        "clip_rings_tile": _q_clip_tile,
        "block_flow_dense": _q_block_flow_dense,
        # --- thirty-first session: graded retrieval eval ---
        "ndcg_graded": _q_ndcg,
        # ex-demos, now oracle-checked (r4 verdict item #2)
        "street_conversion": _q_street_conversion,
        "turn_restrictions": _q_turn_restrictions,
        "admin_boundaries": _q_admin_boundaries,
        # ---------------- position > 50: r4-green; each of these has an
        # in-window sibling exercising the same r5-touched code path
        # (street/restriction chains and the shared _derived_streets fixture
        # via the ex-demos above — house_number_ways itself is untouched
        # since its r4 green row and stays covered by test_entry's replica;
        # assign_zones_broadcast runs in-window through
        # segment_zone_lengths' midpoint assignment; ann_cosine_topk is the
        # untouched Catalyst F.round path while the r5-touched np kernels
        # run in-window through semdedup_keep_flags; ann_ivf_topk ≡
        # byte-identical to the indexed probe; ann_recall_gates gates the
        # same ANN paths; multipolygon PIP shares the ray-cast core with
        # broadcast/salted; haversine kNN and the tile rollup share
        # knn_ring/streaming_dedup machinery) ------------------------------
        "cube_rollup": _q_cube_rollup,
        "window_lead_delta": _q_window_lead,
        "hourly_rollup": _q_hourly_rollup,
        # geohash is quadkey's base32 twin (same floor+bit family, same
        # prefix=parent rollup); quadkey_pyramid holds the window slot for
        # the shared cell arithmetic while this entry stays replica-checked
        "geohash_pyramid": _q_geohash_pyramid,
        # hilbert layout keys: the write-path twin of spatial_layout_bbox
        # (in-window via the shared layout machinery); replica-checked
        "hilbert_keys": _q_hilbert_keys,
        # fixed-radius pair join: shares the cell-cover join machinery
        # in-window via knn_* / snap_points_to_segments; replica-checked
        "radius_pairs": _q_radius_pairs,
        # point-level DBSCAN: in-window siblings grid_density_clusters
        # (same CC machinery) + knn/snap (same cover join); replica-checked
        "dbscan_clusters": _q_dbscan_points,
        # Ripley's K/L curve: multi-scale point-pattern statistic over the
        # same radius_join machinery (one pair join at max radius)
        "ripley_k_curve": _q_ripley_k,
        # discrete-Hausdorff track-similarity join: anchor radius_join
        # candidates + tiled haversine-matrix refine kernel
        "hausdorff_track_pairs": _q_hausdorff_pairs,
        # space-time co-location: (cell, time-bucket) equi-join pairs
        "spacetime_pairs": _q_spacetime_pairs,
        # per-group convex hulls: two-stage monotone chain, closed-form
        # parabola oracle
        "zone_convex_hulls": _q_zone_hulls,
        # OD flow matrix: endpoint aggregate + one PIP pass + rollup
        "od_matrix_flows": _q_od_matrix,
        # marching-squares iso-contours over the density-grid family
        "contour_segments": _q_contour_segments,
        # tile mosaic: per-tile argmax image by real-decode luminance
        "tile_mosaic_best": _q_tile_mosaic,
        # spherical (true) polygon areas, the shoelace's geodesic twin
        "ring_areas_spherical": _q_ring_areas_spherical,
        # area-weighted polygon centroids, the label-point twin
        "ring_centroids": _q_ring_centroids,
        # per-track motion features: tortuosity + max segment speed
        "track_motion_features": _q_track_motion,
        # line-segment intersection join (street-graph overlay)
        "segment_intersections": _q_segment_intersections,
        # geo as-of: interpolated per-user position at fixed instants
        "position_at_instants": _q_position_at,
        "house_numbers_oracle": _q_house_numbers_oracle,
        "street_ways_oracle": _q_street_ways_oracle,
        "turn_restrictions_oracle": _q_turn_restrictions_oracle,
        "ann_cosine_topk": _q_ann_topk,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_indexed_topk": _q_ann_ivf_indexed,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        "pip_zone_assign_salted": _q_pip_zones_shuffle,
        "streaming_dedup_exact": _q_streaming_dedup,
        "pip_zone_assign_broadcast": _q_pip_zones,
        "knn_ring_expansion": _q_knn_ring,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_recall_gates": _q_ann_recall,
        "pip_multipolygon_islands": _q_pip_multipolygon,
        "knn_ring_haversine": _q_knn_ring_haversine,
        "streaming_tile_rollup": _q_streaming_rollup,
        "pip_zone_assign_codegen": _q_pip_zones_codegen,
        "geocell_counts": _q_cell_counts,
        "tile_zone_rollup": _q_tile_zone_rollup,
        "spatial_layout_bbox": _q_spatial_layout,
        "bucketed_join_rollup": _q_bucketed_join,
        "layout_polygon_read": _q_layout_polygon,
        "simplify_violations": _q_simplify_violations,
        "path_lengths_haversine": _q_path_lengths,
        "tile_pyramid_levels": _q_tile_pyramid,
        "admin_relations_oracle": _q_admin_relations_oracle,
        "minhash_near_dup": _q_minhash_neardup,
        "near_dup_clusters": _q_near_dup_clusters,
        "dedup_representatives": _q_dedup_representatives,
        "stratified_sample": _q_stratified_sample,
        "weighted_sample_quality": _q_weighted_sample,
        "weighted_topk_sample": _q_weighted_topk,
        "pagerank_doc_quality": _q_pagerank,
        "bfs_hop_distances": _q_bfs_distances,
        "sssp_weighted_costs": _q_sssp_costs,
        "triangle_counts": _q_triangle_counts,
        "lm_perplexity_scores": _q_lm_perplexity,
        "theil_sen_trends": _q_theil_sen,
        "interval_union_coverage": _q_interval_coverage,
        "tfidf_keywords": _q_tfidf_keywords,
        "k_core_membership": _q_k_core,
        "audio_silence_segments": _q_silence_segments,
        "rolling_window_rates": _q_rolling_counts,
        "edit1_fuzzy_pairs": _q_edit1_pairs,
        "funnel_conversion": _q_funnel_stages,
        "dem_slope_aspect": _q_slope_aspect,
        "d8_flow_directions": _q_d8_flow,
        "skyline_pareto_front": _q_skyline,
        "viterbi_path_decode": _q_viterbi,
        "embedding_second_moments": _q_embedding_moments,
        "pca_whitening_gates": _q_pca_gates,
        "flow_accumulation": _q_flow_accumulation,
        "watershed_labels": _q_watershed,
        "pack_sequences": _q_pack_sequences,
        "pii_redaction": _q_pii_redaction,
        "simhash_near_dup": _q_simhash_neardup,
        "langid_heuristic": _q_langid,
        "doc_fingerprint": _q_fingerprint,
        "shapefile_ingest": _q_shapefile_ingest,
        "payload_fidelity_violations": _q_payload_fidelity,
        "wkb_roundtrip_violations": _q_wkb_roundtrip,
        "audio_features": _q_audio_features,
        "audio_frames": _q_audio_frames,
        "zonal_image_stats": _q_zonal_stats,
        "flagship_images": _q_flagship_images,
        "repetition_ratios": _q_repetition_ratios,
        "asof_last_purchase": _q_asof_join,
        "range_join_bands": _q_range_join,
    }
    window = [n for n in _WINDOW if n in base]
    rest = [n for n in base if n not in set(window)]
    return {n: base[n] for n in [*window, *rest]}


#: the 50 names the driver's correctness window must cover this round —
#: see the ordering-contract note in queries().
_WINDOW = [
    # never driver-checked: sixth-session operators. Ninth-session
    # releases from this block (each EQUAL in the final full sweep,
    # pytest-covered, replica-checked): tile_mosaic_best (real-decode
    # machinery runs in-window via image_quality_gates; max_by argmax via
    # od_matrix_flows), ring_centroids (shoelace family in-window via
    # ring_areas_spherical), weighted_sample_quality (affine-coin sampler
    # family via weighted_topk_sample + mixture machinery),
    # pagerank_doc_quality (iterative _Round graph machinery via
    # bfs_hop_distances + sssp_weighted_costs + k_core_membership),
    # track_motion_features and resample_tracks_daily (trajectory family
    # via trajectory_stay_points + position_at_instants).
    # tenth-session rotation: the five operators built this session are
    # the freshest code in the repo and enter per the code-risk triage
    # rule (color_histogram_dups already swapped in above). Released to
    # make room — every one frozen, sweep-EQUAL, pytest-pinned, and
    # replica-checked, with in-window siblings on its machinery:
    # spacetime_pairs (cover join via hausdorff/dtw head candidates +
    # the r4-green range_join_bands band key), position_at_instants
    # (trajectory lerp twin of the resample fixtures; family in-window
    # via trajectory_stay_points), dbscan_clusters (radius_join + the CC
    # rounds that grid_density_clusters runs in-window), contour_segments
    # (density-grid relation family via grid_density_clusters +
    # idw_surface_cells), od_matrix_flows (its PIP pass runs in-window
    # via segment_zone_lengths; endpoint min_by/max_by is pytest-pinned).
    # (twelfth session: harris_corners_topk enters per the code-risk
    # rule, releasing render_density_tiles — its density-grid rollup
    # runs in-window via grid_density_clusters and its real-PNG encode
    # path runs in-window inside every _gradient_images fixture query;
    # pytest-pinned, sweep-EQUAL, replica-checked.)
    # (chamfer_distance_hist enters the same way, releasing dem_hillshade
    # — its Horn-stencil DEM gradient machinery runs in-window via
    # dem_slope_aspect, which computes the same staged gradients before
    # the shading step; pytest-pinned, sweep-EQUAL, replica-checked.)
    # thirteenth-session rotation: the nine operators built this session
    # (GLCM/LBP/run-length texture, median filter + SAD template match,
    # convoy detection, DAG critical path, Kneser-Ney LM, image moments)
    # are the freshest code in the repo and enter per the code-risk
    # triage rule. Released — every one frozen, sweep-EQUAL,
    # pytest-pinned, replica-checked, with in-window siblings:
    # augment_checksums (its real-PNG encode/decode machinery runs
    # in-window inside every _gradient_images fixture query — now ten of
    # them; the flip/rot pixel permutations are pytest-golden),
    # frequent_tokens (tokenizer family in-window via collocation_pmi;
    # the Misra-Gries + exact-pass aggregation is frozen pytest-pinned
    # code), dtw_track_pairs (the shared _warp_join anti-diagonal DP
    # runs in-window via frechet_track_pairs — same module, same
    # radius_join anchor candidates), hmm_map_match (its snap-candidate
    # cell-cover join runs in-window via segment_zone_lengths; the
    # viterbi trellis is pytest-pinned on frozen code),
    # lm_perplexity_scores (the entering kn_bigram_lm exercises the SAME
    # doc_bigrams machinery and micro-exact rounding contract from the
    # same module — the strongest sibling possible), image_blob_stats
    # (the g3>=384 mask family runs in-window via image_morphology plus
    # the entering run_length_texture and image_moments; CC labeling is
    # pytest-pinned vs the fixpoint oracle), vit_patch_tokens (real
    # decode in-window via every gradient fixture; patch indexing is
    # pytest-golden), quadkey_pyramid (packed-cell arithmetic in-window
    # via adaptive_quadtree_cells), crossmodal_dup_confirm (Hamming
    # bucket-join dup confirmation in-window via color_histogram_dups;
    # phash machinery pytest-pinned).
    # (box_filter_grid, pattern_hit_counts, and zhang_suen_thinning enter
    # under the same rule, releasing bm25_doc_retrieval — tokenization +
    # micro-exact scoring family in-window via kn_bigram_lm and
    # tfidf_keywords, frozen pytest-pinned code — image_quality_gates —
    # the real-decode + per-image-stats machinery now runs in-window
    # through SIX entering kernels (texture triple, median/SAD, moments,
    # thinning); gate arithmetic pytest-pinned — and rolling_window_rates
    # — its rangeBetween range-frame machinery is exactly what
    # box_filter_grid exercises in-window, twice.)
    # (ridge_visibility, frequent_pairs_lift, and orientation_histogram
    # enter under the same rule, releasing audio_silence_segments — WAV
    # decode + frame RMS are pytest-golden and its interval-islands stage
    # runs in-window via interval_union_coverage plus the entering
    # convoy_comovement's gaps-and-islands window; audio_features /
    # audio_frames hold r4-green rows — k_core_membership — the _Round
    # lineage-truncated iterative machinery runs in-window via
    # sssp_weighted_costs and the entering dag_critical_path, and its
    # MATERIALIZED-stage unrolled oracle is the same evidence class the
    # entering zhang_suen_thinning exercises — and bfs_hop_distances —
    # the greedy min-witness relaxation is sssp's lexicographic special
    # case and sssp_weighted_costs stays in-window.)
    # fourteenth-session rotation: the time-series trio (CUSUM
    # changepoints, exact ACF, folded period detection) is the freshest
    # code in the repo and enters per the code-risk triage rule.
    # Released — every one frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked, with in-window siblings: funnel_conversion (its
    # ordered-event windowed min-struct stage machinery runs in-window
    # via convoy_comovement's gaps-and-islands window and
    # interval_union_coverage's ordered sweep; stage arithmetic
    # pytest-pinned), tfidf_keywords (tokenizer + micro-exact scoring
    # family in-window via kn_bigram_lm and collocation_pmi — same
    # doc-token machinery and rounding contract; pytest-pinned), and
    # triangle_counts (an oriented two-hop self-join over the SAME edges
    # relation whose iterative siblings sssp_weighted_costs and
    # dag_critical_path stay in-window; pinned vs a closed-form oracle).
    "cusum_changepoints", "acf_lags",
    # fifteenth-session rotation: the pipeline-plumbing quartet (SCD2
    # intervals, sorted-neighborhood blocking, cardinal viewshed,
    # streaming sessionize) is the freshest code and enters per the
    # code-risk triage rule. Released — every one frozen, sweep-EQUAL,
    # pytest-pinned, replica-checked, with in-window siblings:
    # edit1_fuzzy_pairs (the ER candidate-generation family keeps an
    # in-window member via the entering sorted_neighborhood_pairs, and
    # its deletion-key bucket equi-join is the same banded-join shape
    # the r4-green minhash/simhash rows pin), ann_pq_topk (the
    # simsearch bucket-join + NumPy-refine machinery holds FIVE
    # r4-green driver rows — lsh/ivf/indexed/recall/cosine — and the
    # r5-touched np kernels run in-window via semdedup_keep_flags),
    # polygon_overlap_join (cell-cover join + ray-cast core pinned by
    # four r4-green pip_* rows, with segment_zone_lengths exercising
    # the cover assign in-window), and theil_sen_trends (its space-time
    # cube machinery runs in-window via quantiles_nosort's Mann-Kendall
    # stage; the pairwise-slope median is pytest-pinned frozen code).
    "scd2_intervals", "sorted_neighborhood_pairs", "cardinal_viewshed",
    "streaming_sessionize",
    # sixteenth-session rotation: FAST corners, geofence visits, and
    # merge upsert are the freshest code and enter per the code-risk
    # rule. Released — frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked, with in-window siblings: harris_corners_topk
    # (same module — the entering fast_corners runs the SAME Sobel-free
    # decode + scan-kernel + real-PNG machinery in-window; the Harris
    # response/top-k is pytest-pinned vs the loop reference),
    # trajectory_stay_points (its per-key gaps-and-islands run
    # machinery now runs in-window TWICE via the entering
    # geofence_visits and convoy_comovement; the dwell gates are
    # pytest-pinned), and interval_union_coverage (the ordered
    # interval-islands sweep stays in-window via convoy_comovement's
    # gaps-and-islands and the entering geofence_visits' run collapse;
    # pytest-pinned frozen code).
    "geofence_visits", "merge_upsert",
    # seventeenth-session rotation: BRIEF descriptors, AMDF pitch, and
    # the ring self-intersection audit are the freshest code and enter
    # per the code-risk rule. Released — frozen, sweep-EQUAL,
    # pytest-pinned, replica-checked, with in-window siblings:
    # lbp_histogram (glcm_texture + run_length_texture hold the same
    # integer-exact per-image texture-histogram machinery in-window —
    # same module, same scan-kernel discipline), median_filter_stats
    # (template_match_sad is the same nonlinear-filter module and
    # commit; box_filter_grid holds the 3×3-window family), and
    # image_equalize_otsu (per-image integer histogram machinery stays
    # in-window via color_histogram_dups' binned channel histograms and
    # orientation_histogram's per-pixel classing). The entering
    # brief_descriptors additionally re-runs the RELEASED
    # harris_corners_topk response kernel (Sobel + box3 + r20 top-k)
    # end-to-end in-window, and pitch_amdf re-runs the audio WAV codec
    # (audio_features/audio_frames family) in-window.
    "brief_descriptors", "pitch_amdf", "ring_self_intersections",
    # eighteenth-session rotation: greedy NMS, pred↔GT matching, and
    # mask RLE are the freshest code (new multimodal/detections.py and
    # masks.py modules) and enter per the code-risk rule. Released —
    # frozen, sweep-EQUAL, pytest-pinned, replica-checked, with
    # in-window siblings: glcm_texture (run_length_texture holds the
    # same integer texture-histogram scan-kernel machinery — same
    # module), convoy_comovement (geofence_visits runs the same
    # gaps-and-islands run collapse in-window; the (tick, cell)
    # candidate join machinery stays via knn_mega_cell_skew's cell
    # joins), and dag_critical_path (sssp_weighted_costs holds the
    # iterative _Round relaxation machinery in-window).
    "nms_boxes", "detection_matches",
    # nineteenth-session rotation: anchor assignment, per-class AP, and
    # BLEU clip counts are the freshest code and enter per the
    # code-risk rule (detection_ap additionally re-runs
    # match_detections' pack+join+greedy kernel end-to-end in-window).
    # Released — frozen, sweep-EQUAL, pytest-pinned, replica-checked,
    # with in-window siblings: kn_bigram_lm (the entering bleu_captions
    # is the same token-n-gram hash-aggregate machinery; the
    # continuation-count backoff is pytest-pinned), image_moments
    # (per-image integer-aggregate machinery stays in-window via
    # orientation_histogram, box_filter_grid, image_morphology, and the
    # detection kernels), and template_match_sad (box_filter_grid holds
    # the neighbor-window-sum machinery in-window; the SAD scan kernel
    # is pytest-pinned vs its loop reference).
    "detection_ap",
    # twentieth-session rotation: panoptic quality, the confusion
    # matrix, and mosaic box remapping are the freshest code and enter
    # per the code-risk rule (panoptic_quality drives the NEW
    # interval_overlap_join end-to-end; confusion_matrix re-runs
    # match_detections' greedy kernel a third time in-window).
    # Released — frozen, sweep-EQUAL, pytest-pinned, replica-checked,
    # with in-window siblings: zhang_suen_thinning (image_morphology
    # holds the per-image 3×3 neighborhood-pass machinery in-window),
    # ridge_visibility (cardinal_viewshed runs the same running-max
    # line-of-sight sweep family in-window), and frequent_pairs_lift
    # (collocation_pmi holds the pair-count lift machinery in-window
    # and the entering bleu_captions the n-gram count join).
    "confusion_matrix",
    # twenty-first-session rotation: Hamilton apportionment, ring
    # nesting, and EXIF box normalization are the freshest code and
    # enter per the code-risk rule. Released — frozen, sweep-EQUAL,
    # pytest-pinned, replica-checked, with in-window siblings:
    # orientation_histogram (the Sobel field machinery runs in-window
    # via brief_descriptors' structure tensor and image_edge_hough's
    # edge extraction; octant classing is pytest-pinned),
    # chamfer_distance_hist (image_morphology holds the per-image
    # lattice-pass machinery in-window; the 3-4 sweep is pytest-pinned
    # with a shortest-path CTE oracle), and pattern_hit_counts
    # (the literal-dictionary count machinery's n-gram counting family
    # runs in-window via bleu_captions and collocation_pmi).
    # twenty-second-session rotation: tracklet stitching and letterbox
    # remapping are the freshest code and enter per the code-risk rule
    # (iou_tracklets additionally runs match_detections AND the
    # connected-components rounds end-to-end in-window). Released —
    # frozen, sweep-EQUAL, pytest-pinned, replica-checked, with
    # in-window siblings: table_diff_audit (merge_upsert holds the
    # key-reconciliation max_by + outer-join machinery in-window) and
    # bpe_train_merges (the pair-count merge machinery's n-gram count
    # family runs in-window via bleu_captions + collocation_pmi; the
    # iterative merge loop is pytest-pinned frozen code).
    "iou_tracklets",
    # twenty-third-session rotation: Spearman stats, Cohen's kappa, and
    # scene-cut segmentation are the freshest code and enter per the
    # code-risk rule. Released — frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked, with in-window siblings: run_length_texture (the
    # integer scan-kernel discipline it shares with the texture family
    # runs in-window via brief_descriptors, fast_corners, and the
    # morphology/moments kernels; its goldens are pytest-pinned),
    # box_filter_grid (the range-frame window machinery runs in-window
    # via scd2_intervals, streaming_sessionize, and the entering
    # scene_cuts cumulative window), and collocation_pmi (bleu_captions
    # holds the n-gram count-join machinery in-window; the PMI lift
    # arithmetic is pytest-pinned frozen code).
    # (scene_cuts released in the twenty-sixth-session rotation — see
    # the entering-trio comment below.)
    # twenty-fourth-session rotation: retrieval-rank eval and K-fold
    # assignment are the freshest code and enter per the code-risk
    # rule. Released — frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked, with in-window siblings: grid_density_clusters
    # (the cell-lattice machinery keeps local_morans_lisa +
    # adaptive_quadtree_cells in-window) and poly_dissolve_stats (the
    # additive area rollup runs in-window via segment_zone_lengths;
    # the shoelace fold is pytest-golden-pinned).
    "retrieval_ranks", "kfold_assign",
    # twenty-fifth-session rotation: exact ROC-AUC + calibration-bin
    # stats and the projective homography box remap are the freshest
    # code and enter per the code-risk rule. Released — frozen,
    # sweep-EQUAL, pytest-pinned vs loop references, replica-checked,
    # with in-window siblings: spearman_corr + cohen_kappa (the exact
    # integer-sufficient-statistic evaluation family keeps
    # retrieval_ranks, kfold_assign, confusion_matrix, AND the two
    # entering rankstats members in-window — the entering pair lives in
    # the same module and evidence class) and letterbox_boxes (the
    # integral `div` box-warp arithmetic keeps mosaic_boxes +
    # exif_boxes in-window plus the entering homography_boxes, the
    # strictly richer projective superset of the warp family).
    "roc_auc_groups", "calibration_ece", "homography_boxes",
    # twenty-sixth-session rotation: Chaikin smoothing, Brier stats,
    # and URL-domain mining are the freshest code and enter per the
    # code-risk rule. Released — frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked, with in-window siblings: mosaic_boxes (the box
    # remap family keeps exif_boxes + the entering homography_boxes —
    # the projective superset — in-window; the quadrant layout is
    # pytest-pinned), scene_cuts (video family keeps iou_tracklets; the
    # self-join + cumulative-window machinery runs in-window via
    # scd2_intervals, streaming_sessionize, and cusum_changepoints),
    # and dominant_period (time-series family keeps acf_lags — the
    # same per-lag alignment machinery from the same module — and
    # cusum_changepoints in-window).
    "chaikin_smooth", "brier_scores", "domain_counts",
    # twenty-seventh-session rotation: PR-curve points and mipmap
    # pyramid sums are the freshest code and enter per the code-risk
    # rule. Released — frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked, with in-window siblings: bleu_captions (the
    # n-gram clip-join machinery is pytest-pinned frozen code; the
    # hash-aggregate count-join family stays in-window via
    # domain_counts' two-level rollup and detection_matches' pack+join)
    # and apportion_budget (the largest-remainder rank window runs
    # in-window via kfold_assign's per-stratum rank window; the div/%
    # quota arithmetic is pytest-pinned frozen code).
    "pr_curve_points", "pyramid_sums",
    # twenty-eighth-session rotation: block-matching motion estimation
    # is the freshest code and enters per the code-risk rule. Released:
    # panoptic_quality — frozen, sweep-EQUAL, pytest-pinned vs its
    # fixpoint loop reference, replica-checked; its run-overlap
    # matching machinery keeps mask_rle_runs + confusion_matrix (the
    # same integer contingency evidence class) in-window, and the
    # entering block_flow exercises the same keyed-raster join family
    # end to end.
    "block_flow_motion",
    # twenty-ninth-session rotation: Catalyst tile clipping is the
    # freshest code and enters per the code-risk rule. Released:
    # ring_nesting — frozen, sweep-EQUAL, pytest-pinned,
    # replica-checked; its per-group even-odd ray-cast machinery keeps
    # ring_self_intersections in-window (same module family) and the
    # entering clip stages exercise the ring-ordering window discipline
    # end to end.
    "clip_rings_tile",
    # (block_flow_dense enters with its sibling — the two physical
    # plans of the same operator deserve independent driver rows
    # against the same join-based oracle. Released: exif_boxes —
    # frozen literal corner remaps, pytest-pinned, replica-checked;
    # the box-warp family keeps mosaic_boxes' quadrant remap...
    # mosaic is out too — keeps homography_boxes (the projective
    # superset) and letterbox/mosaic/exif all pytest-pinned and
    # sweep-EQUAL on frozen code.)
    "block_flow_dense",
    # (bleu_captions and spearman_corr RE-ENTER: both changed this
    # session — bleu's gram stage moved from the interpreted HOF to
    # window leads (2.2x), spearman's ranks widened to BIGINT — and
    # changed code outranks frozen code for window slots. Released:
    # mask_rle_runs and fast_corners — frozen, sweep-EQUAL,
    # pytest-pinned integer scan kernels whose machinery stays
    # in-window via brief_descriptors, image_morphology, and
    # confusion_matrix's contingency counts.)
    "bleu_captions", "spearman_corr",
    # (ndcg_graded enters — freshest code. Released: anchor_assign —
    # frozen, sweep-EQUAL, pytest-pinned; its integer-IoU assignment
    # machinery keeps detection_matches + nms_boxes + detection_ap
    # in-window.)
    "ndcg_graded",
    
    # (hmm_map_match enters too — adaptive_assign_rollup released: its
    # oracle is the SAME SQL text as the in-window adaptive_quadtree_cells,
    # the strongest sibling possible. quantiles_nosort enters releasing
    # emerging_hotspots: its Mann-Kendall stage shares the space-time
    # cube with in-window theil_sen_trends, its Gi* stage runs in-window
    # via gi_star_hotspots + local_morans_lisa.)
    # (table_diff_audit enters releasing ripley_k_curve: the K-curve is
    # ONE radius_join — recall driver-proven in-window via the hausdorff/
    # dtw/snap candidate joins — plus frozen pytest-pinned aggregation.)
    "quantiles_nosort",
    # eleventh-session rotation: the four operators built this session
    # (poly_dissolve_stats, hough_line_votes, image_equalize_otsu,
    # bpe_train_merges) are the freshest code in the repo and enter per
    # the code-risk triage rule. Released — every one frozen, sweep-EQUAL,
    # pytest-pinned, replica-checked, with in-window siblings:
    # hausdorff_track_pairs (dtw_track_pairs runs the same radius_join
    # anchor candidates + tiled NumPy refine discipline in-window),
    # ring_areas_spherical (the shoelace fold gains a NEW in-window
    # member via poly_dissolve_stats' additive area rollup; the
    # spherical-excess kernel itself is pytest-golden-pinned),
    # segment_intersections (snap_points_to_segments shares the segment
    # cell-cover join machinery in-window; orientation tests pytest-
    # pinned), gi_star_hotspots (local_morans_lisa holds the same
    # neighbor-window lattice machinery in-window).
    # (twelfth session: image_morphology enters per the code-risk rule,
    # releasing hough_line_votes — its per-(rho,theta) vote accumulation
    # runs in-window END-TO-END inside image_edge_hough, which composes
    # Sobel edges into the same Hough vote code path; pytest-pinned,
    # sweep-EQUAL, replica-checked.)
    "image_morphology",
    # (collocation_pmi and image_edge_hough enter under the same rule,
    # releasing zone_convex_hulls — its oracle is a CLOSED-FORM vertex
    # list, the golden-pin evidence class that zsplit/ring-chunk releases
    # established, plus pytest + the sf0.001 replica — and
    # weighted_topk_sample, whose shared deterministic-coin machinery
    # carries the r3-green stratified_sample driver row and whose
    # Efraimidis-Spirakis ranking is pytest-pinned on frozen code.)
    "image_edge_hough",
    # (image_blob_stats enters under the same rule, releasing
    # colocation_quotients — frozen seventh-session code whose
    # cell-block lattice machinery keeps THREE in-window siblings:
    # local_morans_lisa + gi-composing emerging_hotspots' stages via
    # grid_density_clusters and adaptive_quadtree_cells' packed-cell
    # arithmetic; pytest-pinned, sweep-EQUAL, replica-checked.)
    # twelfth-session rotation: frechet_track_pairs is the freshest code
    # (the _warp_join refactor touched dtw_join's path too — both stay
    # in-window). Released: snap_points_to_segments — frozen
    # seventh-session code whose segment cell-cover join machinery runs
    # in-window TWICE (hmm_map_match composes the same snap candidates
    # with viterbi; segment_zone_lengths runs the midpoint cell assign);
    # pytest-pinned, sweep-EQUAL, replica-checked.
    "frechet_track_pairs",
    # never driver-checked: earlier r5 sessions. Ninth-session releases
    # (same evidence class as above): duplicate_span_ratio (decontam
    # family via decontaminate_benchmark; partitioned-window-count
    # machinery via interval/rolling entries), chunk_text_windows
    # (chunking family, pytest-golden), mixture_budget_sample (sampler
    # family via weighted_topk_sample), phash_near_dup (its Hamming
    # band join runs in-window inside crossmodal_dup_confirm),
    # morans_i_autocorrelation (the global scalar of the in-window
    # local_morans_lisa + gi_star_hotspots lattice machinery),
    # grid_cell_density (cell-grid rollup via grid_hotspot_cells /
    # grid_density_clusters / idw_surface_cells).
    "decontaminate_benchmark",
    "segment_zone_lengths",
    # (grid_hotspot_cells released in the tenth-session rotation for
    # color_histogram_dups — the freshest code in the repo, per the
    # code-risk triage rule; the cell-grid hotspot machinery keeps THREE
    # in-window lattice siblings: gi_star_hotspots + emerging_hotspots
    # compose the same neighbor-window Gi* grid, grid_density_clusters
    # the same cell-count rollup. grid_hotspot_cells stays sweep-EQUAL,
    # pytest-covered, and replica-checked.)
    "color_histogram_dups",
    "semdedup_keep_flags",
    # (gwr_surface_betas enters per the code-risk rule, releasing
    # idw_surface_cells: GWR is the same bin → 9-way neighbor explode →
    # DECIMAL(38,0) moment aggregate plumbing with a strictly deeper
    # solve on top — the strongest sibling possible; idw stays
    # pytest-pinned (test_interpolate), sweep-EQUAL, replica-checked.)
    "gwr_surface_betas", "knn_mega_cell_skew",
    "jpeg_progressive_roundtrip",
    # never driver-checked: seventh-session trio (displacing
    # sessionize_gap, r4-fresh; pricing_summary, code-frozen since r2; and
    # ring_areas_shoelace, whose shoelace machinery the in-window
    # ring_areas_spherical + ring_centroids exercise more deeply)
    # (units_format_6g released for this one: the formatter family stays
    # represented by string_merge_lr and both carry pytest goldens on
    # frozen code)
    "adaptive_quadtree_cells",
    # (ring_chunking_golden released for this one: the golden-pin family
    # stays represented by zsplit_golden_vectors and both carry pytest
    # goldens on frozen code)
    # (string_merge_lr released for this one: the formatter family is
    # pytest-golden-pinned on frozen code; units_format_6g left the same
    # way earlier this session. emerging_gi_hotspots itself released in
    # the ninth-session rotation: it composes gi_star_hotspots +
    # emerging_hotspots, both of which hold in-window slots.)
    # re-pointed ex-demos (r4 rows were rows-only; oracled since)
    "street_conversion", "turn_restrictions", "admin_boundaries",
    # never driver-checked: eighth-session additions (displacing the two
    # r3-stale-but-green rotations zsplit_golden_vectors +
    # streaming_first_seen — both frozen code with pytest goldens and r3
    # EQUAL rows — plus the four sibling-covered releases noted above)
    "local_morans_lisa",
    # never driver-checked: ninth-session operators — the freshest code
    # in the repo, all in-window
    "sssp_weighted_costs",
    "dem_slope_aspect",
]


def oracle_sql() -> dict[str, str]:
    d = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
                   round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "dim_chain_revenue": """
            SELECT r_name,
                   round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "semi_join_open_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        """,
        "anti_join_orderless": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "min_pivot_restrictions": """
            SELECT l_partkey,
                   round(CAST(min(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) AS DOUBLE), 2) AS min_r,
                   round(CAST(min(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS DOUBLE), 2) AS min_a,
                   round(CAST(min(CASE WHEN l_returnflag = 'N' THEN l_extendedprice END) AS DOUBLE), 2) AS min_n
            FROM lineitem GROUP BY l_partkey
        """,
        "group_collect_ordered": """
            SELECT l_orderkey,
                   string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_numbers,
                   count(*) AS n_lines
            FROM lineitem GROUP BY l_orderkey
        """,
        "window_lead_delta": """
            SELECT user_id, event_id,
                   round(CAST(lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS DOUBLE), 4) AS delta_next
            FROM events
        """,
        "window_topk_per_key": """
            SELECT o_custkey, o_orderkey, rk FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
                FROM orders) t
            WHERE rk <= 3
        """,
        "dedup_quantized_loc": """
            SELECT CAST(floor(value * 100) AS BIGINT) AS bucket,
                   min(event_id) AS canonical_event,
                   count(*) AS n_dups
            FROM events GROUP BY 1 HAVING count(*) > 1
        """,
        "case_decision_tree": """
            SELECT CASE
                     WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN
                       CASE WHEN o_totalprice >= 200000 THEN 'critical' ELSE 'elevated' END
                     WHEN o_orderstatus = 'F' THEN 'done'
                     ELSE 'routine'
                   END AS order_class,
                   count(*) AS n,
                   round(CAST(avg(o_totalprice) AS DOUBLE), 2) AS avg_price
            FROM orders GROUP BY 1
        """,
        "units_format_6g": """
            SELECT p_partkey,
                   printf('%.6g', (p_size * 317 + p_partkey) / 1000.0) AS as_tons,
                   printf('%.6g', (p_size * 317 + p_partkey) / 100.0) AS as_meters,
                   concat(CAST((p_size * 317 + p_partkey) // 12 AS VARCHAR), '''',
                          CAST((p_size * 317 + p_partkey) % 12 AS VARCHAR), '"') AS as_feet
            FROM part
        """,
        "string_merge_lr": """
            SELECT n_nationkey,
                   CASE WHEN n_name = r_name THEN n_name
                        ELSE concat(n_name, ';', r_name) END AS merged_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n,
                   round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "chunk_fixed_size": """
            SELECT l_orderkey, CAST(floor((l_linenumber - 1) / 3) AS BIGINT) AS chunk,
                   count(*) AS n_in_chunk
            FROM lineitem GROUP BY 1, 2
        """,
        "spatial_layout_bbox": f"""
            SELECT event_type, count(*) AS n,
                   round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
            FROM (SELECT event_type, value, {_GLON} AS lon, {_GLAT} AS lat FROM events)
            WHERE lon BETWEEN {_LAYOUT_BBOX[0]} AND {_LAYOUT_BBOX[2]}
              AND lat BETWEEN {_LAYOUT_BBOX[1]} AND {_LAYOUT_BBOX[3]}
            GROUP BY event_type
        """,
        "sessionize_gap": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, new_s DESC
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            )
            SELECT user_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
            FROM sess GROUP BY user_id, sid
        """,
        "asof_last_purchase": """
            WITH l AS (
                SELECT event_id, user_id, ts FROM events WHERE event_type <> 'purchase'
            ), r AS (
                SELECT user_id, ts, max(value) AS last_purchase_value
                FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
            )
            SELECT l.event_id, l.user_id, r.last_purchase_value
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join_bands": f"""
            SELECT band_id, count(*) AS n,
                   round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
            FROM events JOIN (VALUES {_BANDS_SQL}) AS b(band_id, lo, hi)
              ON value >= lo AND value < hi
            GROUP BY band_id
        """,
        "ann_pq_topk": _pq_oracle_sql(),
        "hll_distinct_gate": """
            SELECT event_type, CAST(NULL AS BIGINT) AS approx_users,
                   CAST(NULL AS BIGINT) AS exact_users
            FROM events WHERE FALSE
        """,
        "simplify_violations": """
            SELECT CAST(NULL AS BIGINT) AS geom_id, CAST(NULL AS DOUBLE) AS deviation
            FROM events WHERE FALSE
        """,
        "path_lengths_haversine": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events
            ), steps AS (
                SELECT user_id,
                       lag(lon) OVER w AS plon, lag(lat) OVER w AS plat, lon, lat
                FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, count(*) AS n_points,
                   round(sum(
                       2.0 * 6371.0088 * asin(sqrt(
                           sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
                           + cos(radians(plat)) * cos(radians(lat))
                             * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
                       ))
                   ), 4) AS path_km
            FROM steps GROUP BY user_id
        """,
        "value_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.25), 6) AS p25,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90
            FROM events GROUP BY event_type
        """,
        "cube_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(date_trunc('day', ts), TIMESTAMP '1970-01-01') AS day,
                   count(*) AS n,
                   round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
            FROM events GROUP BY CUBE (event_type, date_trunc('day', ts))
        """,
        "layout_polygon_read": f"""
            SELECT count(*) AS n,
                   round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
            FROM (SELECT value, {_GLON} AS lon, {_GLAT} AS lat FROM events)
            WHERE lon >= -20.0 AND lon < 45.0 AND lat >= -10.0 AND lat < 25.0
        """,
        "bucketed_join_rollup": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "pip_zone_assign_broadcast": f"""
            SELECT e.event_id AS point_id, z.zone_id
            FROM (SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events) e
            JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
              ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
        """,
        "pip_zone_assign_salted": f"""
            SELECT e.event_id AS point_id, z.zone_id
            FROM (SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events) e
            JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
              ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
        """,
        "pip_zone_assign_codegen": f"""
            SELECT e.event_id AS point_id, z.zone_id
            FROM (SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events) e
            JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
              ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
        """,
        "pip_multipolygon_islands": f"""
            SELECT e.event_id AS point_id, CAST(0 AS BIGINT) AS zone_id
            FROM (SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events) e
            WHERE ((e.lon >= 1.0 AND e.lon < 3.0 AND e.lat >= 41.0 AND e.lat < 43.0)
                   AND NOT (e.lon >= 1.5 AND e.lon < 2.5 AND e.lat >= 41.5 AND e.lat < 42.5))
               OR (e.lon >= 6.0 AND e.lon < 8.0 AND e.lat >= 44.0 AND e.lat < 46.0)
        """,
        "geocell_counts": f"""
            SELECT 7 * 288230376151711744 + CAST(floor((lon + 180) / 360 * 128) AS BIGINT) * 536870912
                     + CAST(floor((lat + 90) / 180 * 128) AS BIGINT) AS cell,
                   count(*) AS n_points
            FROM (SELECT {_LON} AS lon, {_LAT} AS lat FROM events) p
            GROUP BY 1
        """,
        "tile_zone_rollup": f"""
            SELECT 6 * 288230376151711744 + CAST(floor((e.lon + 180) / 360 * 64) AS BIGINT) * 536870912
                     + CAST(floor((e.lat + 90) / 180 * 64) AS BIGINT) AS tile,
                   z.zone_id,
                   count(*) AS n_points,
                   min(e.point_id) AS first_id
            FROM (SELECT event_id AS point_id, {_LON} AS lon, {_LAT} AS lat FROM events) e
            JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
              ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
            GROUP BY 1, 2
        """,
        "knn_ring_expansion": f"""
            WITH pts AS (SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events),
                 q AS (SELECT * FROM pts WHERE event_id < 20)
            SELECT query_id, cand_id, round(dist, 9) AS dist, CAST(rk - 1 AS INT) AS rank
            FROM (
                SELECT q.event_id AS query_id, c.event_id AS cand_id,
                       sqrt((q.lon - c.lon) * (q.lon - c.lon) + (q.lat - c.lat) * (q.lat - c.lat)) AS dist,
                       row_number() OVER (
                           PARTITION BY q.event_id
                           ORDER BY sqrt((q.lon - c.lon) * (q.lon - c.lon) + (q.lat - c.lat) * (q.lat - c.lat)),
                                    c.event_id) AS rk
                FROM q CROSS JOIN pts c) t
            WHERE rk <= 3
        """,
        "knn_mega_cell_skew": f"""
            WITH pts AS (SELECT event_id, {_SKEW_LON} AS lon, {_SKEW_LAT} AS lat FROM events),
                 q AS (SELECT * FROM pts WHERE event_id < 20)
            SELECT query_id, cand_id, round(dist, 9) AS dist, CAST(rk - 1 AS INT) AS rank
            FROM (
                SELECT q.event_id AS query_id, c.event_id AS cand_id,
                       sqrt((q.lon - c.lon) * (q.lon - c.lon) + (q.lat - c.lat) * (q.lat - c.lat)) AS dist,
                       row_number() OVER (
                           PARTITION BY q.event_id
                           ORDER BY sqrt((q.lon - c.lon) * (q.lon - c.lon) + (q.lat - c.lat) * (q.lat - c.lat)),
                                    c.event_id) AS rk
                FROM q CROSS JOIN pts c) t
            WHERE rk <= 3
        """,
        "knn_ring_haversine": f"""
            WITH pts AS (SELECT event_id, {_LON} AS lon, {_LAT} AS lat FROM events),
                 q AS (SELECT * FROM pts WHERE event_id < 20)
            SELECT query_id, cand_id, round(dist, 6) AS dist, CAST(rk - 1 AS INT) AS rank
            FROM (
                SELECT q.event_id AS query_id, c.event_id AS cand_id,
                       2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(c.lat - q.lat) / 2), 2)
                           + cos(radians(q.lat)) * cos(radians(c.lat))
                             * power(sin(radians(c.lon - q.lon) / 2), 2))) AS dist,
                       row_number() OVER (
                           PARTITION BY q.event_id
                           ORDER BY 2 * 6371.0088 * asin(sqrt(
                                        power(sin(radians(c.lat - q.lat) / 2), 2)
                                        + cos(radians(q.lat)) * cos(radians(c.lat))
                                          * power(sin(radians(c.lon - q.lon) / 2), 2))),
                                    c.event_id) AS rk
                FROM q CROSS JOIN pts c) t
            WHERE rk <= 3
        """,
        "streaming_tile_rollup": f"""
            SELECT date_trunc('hour', e.ts) AS window_start,
                   6 * 288230376151711744 + CAST(floor((e.lon + 180) / 360 * 64) AS BIGINT) * 536870912
                     + CAST(floor((e.lat + 90) / 180 * 64) AS BIGINT) AS tile,
                   z.zone_id,
                   count(*) AS n_images
            FROM (SELECT event_id, ts, {_LON} AS lon, {_LAT} AS lat
                  FROM events WHERE event_id % 5 = 0) e
            JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
              ON e.lon >= z.x0 AND e.lon < z.x1 AND e.lat >= z.y0 AND e.lat < z.y1
            GROUP BY 1, 2, 3
        """,
        "streaming_first_seen": """
            SELECT event_id % 500 AS key, min(ts) AS first_ts,
                   count(*) AS n_first
            FROM events GROUP BY 1
        """,
        "dedup_exact_groups": """
            SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
                   count(*) AS n_docs
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "shingle_counts": """
            SELECT doc_id, CAST(count(DISTINCT substr(text, CAST(i AS INT), 5)) AS INT) AS n_shingles
            FROM documents, LATERAL (
                SELECT unnest(range(1, greatest(length(text) - 3, 2))) AS i) t
            GROUP BY doc_id
        """,
        "frequent_tokens": """
            WITH t AS (
              SELECT list_filter(regexp_split_to_array(lower(text),
                  '[^a-zA-Zà-ÿÀ-ß'']+'), x -> x <> '') AS toks
              FROM documents),
            tok AS (SELECT unnest(toks) AS token FROM t),
            tot AS (SELECT count(*) AS n FROM tok)
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM tok, tot GROUP BY token, n
            HAVING count(*) * 30 >= n
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                   END AS n_tokens
            FROM documents
        """,
        "quality_ratios": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_q,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         / greatest(length(text), 1), 4) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         / greatest(length(text), 1), 4) AS punct_ratio
            FROM documents
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 6) >= 0.3
        """,
        "ngram_jaccard_pairs": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS s
                FROM documents, LATERAL (
                    SELECT unnest(range(1, greatest(length(text) - 3, 2))) AS i) t),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard
            FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
            WHERE round(i * 1.0 / (x.n + y.n - i), 6) >= 0.3
        """,
        "bm25_doc_retrieval": """
            WITH docs2 AS (
                SELECT doc_id,
                       text || ' m' || CAST(doc_id % 40 AS VARCHAR) AS text
                FROM documents),
            toks AS (
                SELECT doc_id, t.term
                FROM docs2, LATERAL unnest(
                    regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
                WHERE t.term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
            st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS stok FROM dl),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            q AS (
                SELECT DISTINCT d.doc_id AS query_id, t.term
                FROM docs2 d, LATERAL unnest(
                    regexp_split_to_array(lower(d.text), '[^a-z0-9]+')) AS t(term)
                WHERE d.doc_id % 100 = 7 AND t.term <> ''),
            m AS (
                SELECT q.query_id, tf.doc_id,
                       CAST(floor(
                           ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE)
                               + CAST(0.5 AS DOUBLE))
                              / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                              + CAST(1 AS DOUBLE))
                           * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)
                              / (CAST(tf AS DOUBLE)
                                 + CAST(1.2 AS DOUBLE)
                                   * (CAST(0.25 AS DOUBLE)
                                      + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
                                        / (CAST(stok AS DOUBLE) / CAST(n AS DOUBLE)))))
                           * 1e6 + 0.5 + 1e-8) AS BIGINT) AS micros
                FROM q JOIN tf USING (term) JOIN dl USING (doc_id)
                     JOIN dft USING (term), st
                WHERE df * 100 <= n * 70),
            s AS (SELECT query_id, doc_id, CAST(sum(micros) AS BIGINT) AS sm
                  FROM m GROUP BY 1, 2)
            SELECT query_id, doc_id, CAST(rk AS INT) AS rank,
                   CAST(sm AS DOUBLE) / 1e6 AS score
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id ORDER BY sm DESC, doc_id) AS rk
                  FROM s) t
            WHERE rk <= 5
        """,
        "tfidf_keywords": """
            WITH docs2 AS (
                SELECT doc_id,
                       text || ' m' || CAST(doc_id % 40 AS VARCHAR) AS text
                FROM documents),
            toks AS (
                SELECT doc_id, t.term
                FROM docs2, LATERAL unnest(
                    regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
                WHERE t.term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM docs2),
            scored AS (
                SELECT doc_id, term,
                       CAST(floor(
                           CAST(tf AS DOUBLE)
                           * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))
                           * 1e6 + 0.5 + 1e-8) AS BIGINT) AS micros
                FROM tf JOIN dft USING (term), n)
            SELECT doc_id, term, CAST(rk AS INT) AS rank,
                   CAST(micros AS DOUBLE) / 1e6 AS tfidf
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id ORDER BY micros DESC, term) AS rk
                  FROM scored) t
            WHERE rk <= 3
        """,
        "decontaminate_benchmark": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 13) AS g
                FROM documents, LATERAL (
                    SELECT unnest(range(1, greatest(length(text) - 11, 2))) AS i) t),
            bg AS (SELECT DISTINCT g FROM sh WHERE doc_id % 7 = 3),
            agg AS (
                SELECT s.doc_id, count(*) AS n_grams,
                       sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
                FROM sh s LEFT JOIN bg b ON s.g = b.g GROUP BY 1)
            SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                   CAST(n_hits AS BIGINT) AS n_hits,
                   round(n_hits * 1.0 / n_grams, 6) AS hit_ratio,
                   CAST(round(n_hits * 1.0 / n_grams, 6) > 0.25 AS INT) AS contaminated
            FROM agg
        """,
        "duplicate_span_ratio": """
            WITH pos AS (
                SELECT doc_id, substr(text, CAST(i AS INT), 12) AS g
                FROM documents, LATERAL (
                    SELECT unnest(range(1, greatest(length(text) - 10, 2))) AS i) t),
            dup AS (
                SELECT g FROM (SELECT DISTINCT doc_id, g FROM pos)
                GROUP BY g HAVING count(*) >= 2),
            dc AS (
                SELECT doc_id, count(*) AS n_dup
                FROM pos SEMI JOIN dup USING (g) GROUP BY 1),
            tot AS (
                SELECT doc_id, greatest(length(text) - 11, 1) AS n_windows
                FROM documents)
            SELECT t.doc_id, CAST(n_windows AS BIGINT) AS n_windows,
                   CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_windows,
                   round(coalesce(n_dup, 0) * 1.0 / n_windows, 6) AS dup_ratio
            FROM tot t LEFT JOIN dc USING (doc_id)
        """,
        "mixture_budget_sample": _mixture_budget_oracle_sql(),
        "trajectory_stay_points": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_TLON} AS lon, {_TLAT} AS lat
                FROM events),
            lagged AS (
                SELECT user_id, ts, event_id, lon, lat,
                       lag(lon) OVER w AS plon, lag(lat) OVER w AS plat,
                       lag(ts) OVER w AS prev_ts
                FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            flagged AS (
                SELECT user_id, ts, event_id, lon, lat,
                       CASE WHEN prev_ts IS NULL
                              OR 2.0 * 6371.0088 * asin(sqrt(
                                   sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
                                   + cos(radians(plat)) * cos(radians(lat))
                                     * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
                                 )) > 1.0
                              OR date_diff('second', prev_ts, ts) > 400000
                            THEN 1 ELSE 0 END AS brk
                FROM lagged),
            runs AS (
                SELECT user_id, ts, lon, lat,
                       CAST(sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS BIGINT) AS stay_id
                FROM flagged),
            agg AS (
                SELECT user_id, stay_id, count(*) AS n_points,
                       min(ts) AS start_ts, max(ts) AS end_ts,
                       floor(avg(lon) * 1000000 + 0.5 + 1e-8) / 1000000 AS c_lon,
                       floor(avg(lat) * 1000000 + 0.5 + 1e-8) / 1000000 AS c_lat
                FROM runs GROUP BY 1, 2)
            SELECT user_id, stay_id, CAST(n_points AS BIGINT) AS n_points,
                   start_ts, end_ts,
                   CAST(date_diff('second', start_ts, end_ts) AS BIGINT) AS duration_s,
                   c_lon, c_lat
            FROM agg
            WHERE n_points >= 2
              AND date_diff('second', start_ts, end_ts) >= 3600
        """,
        "grid_density_clusters": f"""
            WITH RECURSIVE pts AS (
                SELECT {_TLON} AS lon, {_TLAT} AS lat FROM events),
            b AS (
                SELECT CAST(floor(lon / 1.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 1.0) AS BIGINT) AS iy,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            k AS (
                SELECT ix, iy, n, ix * 1000000 + iy AS key
                FROM b WHERE n >= 100),
            e AS (
                SELECT a.key AS u, c.key AS v
                FROM k a JOIN k c
                  ON abs(a.ix - c.ix) <= 1 AND abs(a.iy - c.iy) <= 1
                 AND a.key <> c.key),
            reach(src, dst) AS (
                SELECT key, key FROM k
                UNION
                SELECT r.src, e2.v FROM reach r JOIN e e2 ON e2.u = r.dst),
            lbl AS (
                SELECT src AS key, min(dst) AS cluster_id
                FROM reach GROUP BY src)
            SELECT k.ix, k.iy, CAST(k.n AS BIGINT) AS n_points, l.cluster_id
            FROM k JOIN lbl l USING (key)
        """,
        "grid_hotspot_cells": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
            b AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            s AS (
                SELECT CAST(sum(n) AS BIGINT) AS s1,
                       CAST(sum(n * n) AS BIGINT) AS s2,
                       count(*) AS cnt
                FROM b),
            z AS (
                SELECT ix, iy, n,
                       floor((CAST(n AS DOUBLE)
                              - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
                             / sqrt((CAST(s2 AS DOUBLE)
                                     - CAST(s1 AS DOUBLE)
                                       * (CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)))
                                    / (CAST(cnt AS DOUBLE) - 1.0))
                             * 1e6 + 0.5 + 1e-8) / 1e6 AS z
                FROM b, s)
            SELECT ix, iy, CAST(n AS BIGINT) AS n_points, z
            FROM z WHERE z >= 1.0
        """,
        # colocation quotient: band self-join over (cell, category)
        # counts, full category grid keeps true zeros, exact-integer
        # self-pair corrections, one rounded double ratio
        "colocation_quotients": f"""
            WITH pts AS (
                SELECT event_type AS cat,
                       CASE WHEN event_type = 'purchase'
                            THEN ({_GLON}) / 100.0 ELSE {_GLON} END AS lon,
                       CASE WHEN event_type = 'purchase'
                            THEN ({_GLAT}) / 100.0 ELSE {_GLAT} END AS lat
                FROM events),
            cells AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       cat, count(*) AS n
                FROM pts GROUP BY 1, 2, 3),
            raw AS (
                SELECT a.cat AS cat_a, b.cat AS cat_b,
                       CAST(sum(a.n * b.n) AS BIGINT) AS raw
                FROM cells a JOIN cells b
                  ON b.ix BETWEEN a.ix - 1 AND a.ix + 1
                 AND b.iy BETWEEN a.iy - 1 AND a.iy + 1
                GROUP BY 1, 2),
            tot AS (
                SELECT cat, CAST(sum(n) AS BIGINT) AS ncat
                FROM cells GROUP BY 1),
            g AS (SELECT CAST(sum(ncat) AS BIGINT) AS n_all FROM tot),
            grid AS (
                SELECT ta.cat AS cat_a, ta.ncat AS na_tot,
                       tb.cat AS cat_b, tb.ncat AS nb_tot
                FROM tot ta CROSS JOIN tot tb),
            j AS (
                SELECT grid.cat_a, grid.cat_b,
                       coalesce(raw.raw, 0)
                       - CASE WHEN grid.cat_a = grid.cat_b
                              THEN grid.na_tot ELSE 0 END AS c_ab,
                       grid.nb_tot, g.n_all
                FROM grid
                LEFT JOIN raw ON raw.cat_a = grid.cat_a
                             AND raw.cat_b = grid.cat_b, g),
            t AS (SELECT cat_a, CAST(sum(c_ab) AS BIGINT) AS t_a
                  FROM j GROUP BY 1),
            s AS (
                SELECT j.cat_a, j.cat_b, j.c_ab, t.t_a,
                       j.nb_tot - CASE WHEN j.cat_a = j.cat_b
                                       THEN 1 ELSE 0 END AS nb_eff,
                       j.n_all
                FROM j JOIN t ON t.cat_a = j.cat_a
                WHERE t.t_a > 0
                  AND j.nb_tot - CASE WHEN j.cat_a = j.cat_b
                                      THEN 1 ELSE 0 END > 0
                  AND j.n_all > 1)
            SELECT cat_a, cat_b, c_ab, t_a,
                   floor((CAST(c_ab AS DOUBLE) / CAST(t_a AS DOUBLE))
                         / (CAST(nb_eff AS DOUBLE)
                            / (CAST(n_all AS DOUBLE) - 1.0))
                         * 1e6 + 0.5 + 1e-8) / 1e6 AS clq
            FROM s
        """,
        # adaptive quadtree: every DIV/shift on the packed cell id replayed
        # digit-for-digit; monotone counts make "coarsest qualifying
        # ancestor" (min CASE) ≡ the recursive split loop
        "adaptive_quadtree_cells": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events
                UNION ALL
                SELECT ({_GLON}) / 100.0, ({_GLAT}) / 100.0 FROM events
                WHERE event_id % 4 = 0),
            fin AS (
                SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0
                                                 * 256.0) AS BIGINT),
                                      0), 255) AS x,
                       least(greatest(CAST(floor((lat + 90.0) / 180.0
                                                 * 256.0) AS BIGINT),
                                      0), 255) AS y,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            lv AS (
                SELECT f.x, f.y, f.n, g.r,
                       f.x // CAST(pow(2.0, 8 - g.r) AS BIGINT) AS px,
                       f.y // CAST(pow(2.0, 8 - g.r) AS BIGINT) AS py
                FROM fin f CROSS JOIN generate_series(2, 8) AS g(r)),
            cnt AS (
                SELECT r, px, py, CAST(sum(n) AS BIGINT) AS c
                FROM lv GROUP BY 1, 2, 3),
            dec AS (
                SELECT l.x, l.y, min(l.n) AS n,
                       min(CASE WHEN c.c <= 500 THEN l.r END) AS minr
                FROM lv l JOIN cnt c
                  ON c.r = l.r AND c.px = l.px AND c.py = l.py
                GROUP BY 1, 2),
            leaf AS (
                SELECT coalesce(minr, 8) AS lr,
                       x // CAST(pow(2.0, 8 - coalesce(minr, 8)) AS BIGINT)
                           AS px,
                       y // CAST(pow(2.0, 8 - coalesce(minr, 8)) AS BIGINT)
                           AS py,
                       n
                FROM dec)
            SELECT CAST(lr AS BIGINT) * 288230376151711744
                   + px * 536870912 + py AS cell_id,
                   CAST(lr AS INT) AS res,
                   CAST(sum(n) AS BIGINT) AS n_points
            FROM leaf GROUP BY 1, 2
        """,
        # Gi*: same integer-sum discipline as grid_hotspot_cells, plus the
        # per-cell 3×3 sums via a band self-join and the EXACT-INTEGER
        # degenerate guards (cnt·s2 − s1² > 0, wi < cnt)
        "gi_star_hotspots": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
            b AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            s AS (
                SELECT CAST(sum(n) AS BIGINT) AS s1,
                       CAST(sum(n * n) AS BIGINT) AS s2,
                       count(*) AS cnt
                FROM b),
            loc AS (
                SELECT a.ix, a.iy, CAST(a.n AS BIGINT) AS n,
                       count(*) AS wi, CAST(sum(bb.n) AS BIGINT) AS si
                FROM b a JOIN b bb
                  ON bb.ix BETWEEN a.ix - 1 AND a.ix + 1
                 AND bb.iy BETWEEN a.iy - 1 AND a.iy + 1
                GROUP BY 1, 2, 3),
            z AS (
                SELECT ix, iy, n, wi, si,
                       floor((CAST(si AS DOUBLE)
                              - (CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
                                * CAST(wi AS DOUBLE))
                             / (sqrt(CAST(s2 AS DOUBLE) / CAST(cnt AS DOUBLE)
                                     - (CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
                                       * (CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE)))
                                * sqrt((CAST(cnt AS DOUBLE) * CAST(wi AS DOUBLE)
                                        - CAST(wi AS DOUBLE) * CAST(wi AS DOUBLE))
                                       / (CAST(cnt AS DOUBLE) - 1.0)))
                             * 1e6 + 0.5 + 1e-8) / 1e6 AS gi_z
                FROM loc, s
                WHERE cnt * s2 - s1 * s1 > 0 AND wi < cnt)
            SELECT ix, iy, n AS n_points, CAST(wi AS BIGINT) AS w_i,
                   si AS s_i, gi_z
            FROM z WHERE abs(gi_z) >= 1.0
        """,
        # emerging Gi*: per-bin Gi* (exact integer sums, shared double
        # tree, rounded z) feeding the MK stage over the z series;
        # 1176 = T(T−1)(2T+5) at T = 8
        "emerging_gi_hotspots": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat,
                       event_id % 8 AS t
                FROM events
                UNION ALL
                SELECT ({_GLON}) / 100.0, ({_GLAT}) / 100.0, event_id % 8
                FROM events
                WHERE event_id % 4 = 0
                  AND (event_id // 16) % 8 <= event_id % 8),
            cube AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       t, count(*) AS n
                FROM pts GROUP BY 1, 2, 3),
            occ AS (SELECT DISTINCT ix, iy FROM cube),
            dense AS (
                SELECT o.ix, o.iy, g.t,
                       CAST(coalesce(c.n, 0) AS BIGINT) AS x
                FROM occ o
                CROSS JOIN generate_series(0, 7) AS g(t)
                LEFT JOIN cube c
                  ON c.ix = o.ix AND c.iy = o.iy AND c.t = g.t),
            pairs AS (
                SELECT a.ix AS aix, a.iy AS aiy, b.ix AS bix, b.iy AS biy
                FROM occ a JOIN occ b
                  ON b.ix BETWEEN a.ix - 1 AND a.ix + 1
                 AND b.iy BETWEEN a.iy - 1 AND a.iy + 1),
            w AS (SELECT aix AS ix, aiy AS iy, count(*) AS w
                  FROM pairs GROUP BY 1, 2),
            loc AS (
                SELECT p.aix AS ix, p.aiy AS iy, d.t,
                       CAST(sum(d.x) AS BIGINT) AS si
                FROM pairs p JOIN dense d
                  ON d.ix = p.bix AND d.iy = p.biy
                GROUP BY 1, 2, 3),
            st AS (
                SELECT t, CAST(sum(x) AS BIGINT) AS s1,
                       CAST(sum(x * x) AS BIGINT) AS s2,
                       count(*) AS nc
                FROM dense GROUP BY 1),
            zd AS (
                SELECT l.ix, l.iy, l.t, CAST(w.w AS BIGINT) AS w,
                       CASE WHEN st.nc * st.s2 - st.s1 * st.s1 <= 0
                                 OR w.w >= st.nc OR st.nc <= 1 THEN 0.0
                            ELSE (CAST(l.si AS DOUBLE)
                                  - (CAST(st.s1 AS DOUBLE)
                                     / CAST(st.nc AS DOUBLE))
                                    * CAST(w.w AS DOUBLE))
                                 / (sqrt(CAST(st.s2 AS DOUBLE)
                                         / CAST(st.nc AS DOUBLE)
                                         - (CAST(st.s1 AS DOUBLE)
                                            / CAST(st.nc AS DOUBLE))
                                           * (CAST(st.s1 AS DOUBLE)
                                              / CAST(st.nc AS DOUBLE)))
                                    * sqrt((CAST(st.nc AS DOUBLE)
                                            * CAST(w.w AS DOUBLE)
                                            - CAST(w.w AS DOUBLE)
                                              * CAST(w.w AS DOUBLE))
                                           / (CAST(st.nc AS DOUBLE) - 1.0)))
                       END AS zr
                FROM loc l
                JOIN w ON w.ix = l.ix AND w.iy = l.iy
                JOIN st ON st.t = l.t),
            z6 AS (SELECT ix, iy, t, w,
                          floor(zr * 1e6 + 0.5 + 1e-8) / 1e6 AS z
                   FROM zd),
            sgn AS (
                SELECT a.ix, a.iy,
                       CAST(sum(CASE WHEN b.z > a.z THEN 1
                                     WHEN b.z < a.z THEN -1 ELSE 0 END)
                            AS BIGINT) AS s
                FROM z6 a JOIN z6 b
                  ON b.ix = a.ix AND b.iy = a.iy AND b.t > a.t
                GROUP BY 1, 2),
            ties AS (
                SELECT ix, iy,
                       sum(CAST(tg AS DOUBLE) * (CAST(tg AS DOUBLE) - 1.0)
                           * (2.0 * CAST(tg AS DOUBLE) + 5.0)) AS tie
                FROM (SELECT ix, iy, z, count(*) AS tg
                      FROM z6 GROUP BY 1, 2, 3)
                GROUP BY 1, 2),
            mk AS (
                SELECT s.ix, s.iy, s.s,
                       CASE WHEN s.s = 0
                                 OR (1176.0 - t.tie) / 18.0 <= 0.0 THEN 0.0
                            ELSE (CAST(s.s AS DOUBLE)
                                  - sign(CAST(s.s AS DOUBLE)))
                                 / sqrt((1176.0 - t.tie) / 18.0)
                       END AS zr
                FROM sgn s JOIN ties t ON t.ix = s.ix AND t.iy = s.iy),
            fin AS (
                SELECT m.ix, m.iy, CAST(w.w AS BIGINT) AS w_i,
                       m.s AS s_stat,
                       floor(m.zr * 1e6 + 0.5 + 1e-8) / 1e6 AS mk_z
                FROM mk m JOIN w ON w.ix = m.ix AND w.iy = m.iy)
            SELECT ix, iy, w_i, s_stat, mk_z,
                   CASE WHEN mk_z >= 1.0 THEN 'up'
                        WHEN mk_z <= -1.0 THEN 'down'
                        ELSE 'none' END AS trend
            FROM fin
        """,
        # Mann-Kendall: the cube densifies missing bins to ZERO per
        # occupied cell; S and the tie products are exact integers, the
        # trend classifies on the ROUNDED z (1176 = T(T−1)(2T+5), T=8)
        "emerging_hotspots": f"""
            WITH ev AS (
                SELECT event_id FROM events
                WHERE (event_id // 8) % 8 <= event_id % 8),
            pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat,
                       event_id % 8 AS t
                FROM ev),
            cube AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       t, count(*) AS n
                FROM pts GROUP BY 1, 2, 3),
            occ AS (
                SELECT ix, iy, CAST(sum(n) AS BIGINT) AS total
                FROM cube GROUP BY 1, 2),
            dense AS (
                SELECT o.ix, o.iy, o.total, g.t,
                       CAST(coalesce(c.n, 0) AS BIGINT) AS x
                FROM occ o
                CROSS JOIN generate_series(0, 7) AS g(t)
                LEFT JOIN cube c
                  ON c.ix = o.ix AND c.iy = o.iy AND c.t = g.t),
            sgn AS (
                SELECT a.ix, a.iy,
                       CAST(sum(CASE WHEN b.x > a.x THEN 1
                                     WHEN b.x < a.x THEN -1 ELSE 0 END)
                            AS BIGINT) AS s
                FROM dense a JOIN dense b
                  ON b.ix = a.ix AND b.iy = a.iy AND b.t > a.t
                GROUP BY 1, 2),
            ties AS (
                SELECT ix, iy,
                       sum(CAST(tg AS DOUBLE) * (CAST(tg AS DOUBLE) - 1.0)
                           * (2.0 * CAST(tg AS DOUBLE) + 5.0)) AS tie
                FROM (SELECT ix, iy, x, count(*) AS tg
                      FROM dense GROUP BY 1, 2, 3)
                GROUP BY 1, 2),
            z AS (
                SELECT o.ix, o.iy, o.total, sgn.s,
                       CASE WHEN sgn.s = 0
                                 OR (1176.0 - ties.tie) / 18.0 <= 0.0 THEN 0.0
                            ELSE (CAST(sgn.s AS DOUBLE)
                                  - sign(CAST(sgn.s AS DOUBLE)))
                                 / sqrt((1176.0 - ties.tie) / 18.0)
                       END AS zr
                FROM occ o
                JOIN sgn ON sgn.ix = o.ix AND sgn.iy = o.iy
                JOIN ties ON ties.ix = o.ix AND ties.iy = o.iy),
            z6 AS (
                SELECT ix, iy, total AS total_points, s AS s_stat,
                       floor(zr * 1e6 + 0.5 + 1e-8) / 1e6 AS mk_z
                FROM z)
            SELECT ix, iy, total_points, s_stat, mk_z,
                   CASE WHEN mk_z >= 1.0 THEN 'up'
                        WHEN mk_z <= -1.0 THEN 'down'
                        ELSE 'none' END AS trend
            FROM z6
        """,
        "dem_slope_aspect": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
            cube AS (
                SELECT CAST(floor(lon / 10.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 10.0) AS BIGINT) AS iy,
                       count(*) AS z
                FROM pts GROUP BY 1, 2),
            kernel(dx, dy, wx, wy) AS (VALUES
                (1, -1, 1, -1), (1, 0, 2, 0), (1, 1, 1, 1),
                (0, -1, 0, -2), (0, 0, 0, 0), (0, 1, 0, 2),
                (-1, -1, -1, -1), (-1, 0, -2, 0), (-1, 1, -1, 1)),
            sums AS (
                SELECT c.ix - k.dx AS ix, c.iy - k.dy AS iy,
                       CAST(sum(c.z * k.wx) AS BIGINT) AS gx_num,
                       CAST(sum(c.z * k.wy) AS BIGINT) AS gy_num,
                       count(*) AS n
                FROM cube c CROSS JOIN kernel k
                GROUP BY 1, 2),
            interior AS (SELECT * FROM sums WHERE n = 9),
            staged AS (
                SELECT ix, iy, gx_num, gy_num,
                       atan(sqrt((CAST(gx_num AS DOUBLE) / 80.0)
                                 * (CAST(gx_num AS DOUBLE) / 80.0)
                                 + (CAST(gy_num AS DOUBLE) / 80.0)
                                   * (CAST(gy_num AS DOUBLE) / 80.0)))
                       * (180.0 / pi()) AS sl,
                       CASE WHEN gx_num = 0 AND gy_num = 0 THEN NULL
                            ELSE atan2(CAST(gy_num AS DOUBLE) / 80.0,
                                       -(CAST(gx_num AS DOUBLE) / 80.0))
                                 * (180.0 / pi())
                       END AS asp
                FROM interior)
            SELECT ix, iy, gx_num, gy_num,
                   floor(sl * 1e6 + 0.5 + 1e-8) / 1e6 AS slope_deg,
                   floor(asp * 1e6 + 0.5 + 1e-8) / 1e6 AS aspect_deg
            FROM staged
        """,
        "dem_hillshade": _hillshade_oracle_sql(),
        "viterbi_path_decode": _viterbi_oracle_sql(),
        "embedding_second_moments": """
            WITH e AS MATERIALIZED (
                SELECT vec_id,
                       CAST(floor(CAST(x AS DOUBLE) * 1048576.0
                                  + 0.5 + 1e-8) AS BIGINT) AS xi,
                       CAST(i AS BIGINT) - 1 AS i
                FROM (SELECT vec_id, unnest(embedding) AS x,
                             generate_subscripts(embedding, 1) AS i
                      FROM embeddings))
            SELECT a.i AS i, b.i AS j, CAST(sum(a.xi * b.xi) AS BIGINT) AS v
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2
            UNION ALL
            SELECT i, CAST(-1 AS BIGINT) AS j, CAST(sum(xi) AS BIGINT) AS v
            FROM e GROUP BY 1
            UNION ALL
            SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
                   CAST(count(*) AS BIGINT)
            FROM embeddings
        """,
        "pca_whitening_gates": """
            SELECT CAST(NULL AS BIGINT) AS i, CAST(NULL AS BIGINT) AS j,
                   CAST(NULL AS BIGINT) AS dev_micro
            WHERE FALSE
        """,
        "skyline_pareto_front": """
            WITH pts AS MATERIALIZED (
                SELECT event_id, event_id % 997 AS x,
                       (event_id * 31) % 1009 AS y
                FROM events WHERE event_id % 5 = 0)
            SELECT event_id, x, y FROM pts p
            WHERE NOT EXISTS (
                SELECT 1 FROM pts q
                WHERE q.x <= p.x AND q.y >= p.y
                  AND (q.x < p.x OR q.y > p.y))
        """,
        "d8_flow_directions": _HYDRO_PREFIX + """
            SELECT ix, iy, CAST(z AS BIGINT) AS z,
                   CAST(dn_ix AS BIGINT) AS dn_ix,
                   CAST(dn_iy AS BIGINT) AS dn_iy,
                   CAST(drop_w AS BIGINT) AS drop_w, is_sink
            FROM d8
        """,
        "flow_accumulation": _HYDRO_PREFIX + """
            SELECT d.ix, d.iy, CAST(1 + count(p.ix) AS BIGINT) AS acc
            FROM dem d LEFT JOIN paths p ON p.cx = d.ix AND p.cy = d.iy
            GROUP BY 1, 2
        """,
        "watershed_labels": _HYDRO_PREFIX + """,
            sinkpaths AS (
                SELECT p.ix, p.iy, p.cx, p.cy
                FROM paths p
                JOIN d8 s ON s.ix = p.cx AND s.iy = p.cy AND s.is_sink)
            SELECT d.ix, d.iy,
                   CAST(coalesce(sp.cx, d.ix) AS BIGINT) AS sink_ix,
                   CAST(coalesce(sp.cy, d.iy) AS BIGINT) AS sink_iy
            FROM dem d LEFT JOIN sinkpaths sp
              ON sp.ix = d.ix AND sp.iy = d.iy
        """,
        "funnel_conversion": """
            WITH e AS (
                SELECT user_id, ts,
                       CASE event_id % 3 WHEN 0 THEN 'view'
                            WHEN 1 THEN 'cart' ELSE 'buy' END AS step
                FROM events),
            s1 AS (SELECT user_id AS key, min(ts) AS t_1
                   FROM e WHERE step = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id AS key, min(e.ts) AS t_2
                   FROM e JOIN s1 ON s1.key = e.user_id
                   WHERE e.step = 'cart' AND e.ts > s1.t_1 GROUP BY 1),
            s3 AS (SELECT e.user_id AS key, min(e.ts) AS t_3
                   FROM e JOIN s2 ON s2.key = e.user_id
                   WHERE e.step = 'buy' AND e.ts > s2.t_2 GROUP BY 1)
            SELECT s1.key, t_1, t_2, t_3,
                   CAST(CASE WHEN t_1 IS NULL THEN 0 ELSE 1 END
                        + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END
                        + CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END AS INT)
                   AS stage
            FROM s1 LEFT JOIN s2 USING (key) LEFT JOIN s3 USING (key)
        """,
        "edit1_fuzzy_pairs": """
            WITH ids AS (
                SELECT DISTINCT event_id % 300 AS id FROM events),
            strs AS (
                SELECT id, 'w' || CAST(id AS VARCHAR) AS s FROM ids)
            SELECT a.id AS id_a, b.id AS id_b, a.s AS s_a, b.s AS s_b,
                   CAST(levenshtein(a.s, b.s) AS INT) AS dist
            FROM strs a JOIN strs b ON a.id < b.id
            WHERE levenshtein(a.s, b.s) <= 1
        """,
        "rolling_window_rates": """
            WITH e AS (
                SELECT user_id, event_id,
                       date_diff('second', TIMESTAMP '2024-01-01 00:00:00',
                                 date_trunc('second', ts)) AS t_s,
                       event_id % 100 AS val
                FROM events)
            SELECT user_id, event_id, t_s,
                   count(*) OVER w AS rolling_n,
                   CAST(sum(val) OVER w AS BIGINT) AS rolling_sum
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY t_s
                         RANGE BETWEEN 21599 PRECEDING AND CURRENT ROW)
        """,
        "interval_union_coverage": """
            WITH iv AS (
                SELECT event_id % 50 AS key,
                       (event_id * 37) % 10000 AS s,
                       (event_id * 37) % 10000 + event_id % 97 + 1 AS e
                FROM events),
            staged AS (
                SELECT key, s, e,
                       max(e) OVER (PARTITION BY key ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pme
                FROM iv),
            flagged AS (
                SELECT key, s, e,
                       CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS brk
                FROM staged),
            islands AS (
                SELECT key, s, e,
                       sum(brk) OVER (PARTITION BY key ORDER BY s, e
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS island
                FROM flagged),
            merged AS (
                SELECT key, island, min(s) AS island_start,
                       max(e) AS island_end, count(*) AS n_intervals
                FROM islands GROUP BY 1, 2)
            SELECT key,
                   CAST(sum(island_end - island_start) AS BIGINT) AS covered,
                   count(*) AS n_islands,
                   CAST(sum(n_intervals) AS BIGINT) AS n_intervals
            FROM merged GROUP BY key
        """,
        "theil_sen_trends": f"""
            WITH ev AS (
                SELECT event_id FROM events
                WHERE (event_id // 8) % 8 <= event_id % 8),
            pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat,
                       event_id % 8 AS t
                FROM ev),
            cube AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       t, count(*) AS n
                FROM pts GROUP BY 1, 2, 3),
            occ AS (
                SELECT ix, iy, CAST(sum(n) AS BIGINT) AS total
                FROM cube GROUP BY 1, 2),
            dense AS (
                SELECT o.ix, o.iy, o.total, g.t,
                       CAST(coalesce(c.n, 0) AS BIGINT) AS x
                FROM occ o
                CROSS JOIN generate_series(0, 7) AS g(t)
                LEFT JOIN cube c
                  ON c.ix = o.ix AND c.iy = o.iy AND c.t = g.t),
            slopes AS (
                SELECT a.ix, a.iy, a.total,
                       CAST(floor(CAST(b.x - a.x AS DOUBLE) * 1e6
                                  / CAST(b.t - a.t AS DOUBLE)) AS BIGINT) AS sm,
                       row_number() OVER (
                           PARTITION BY a.ix, a.iy
                           ORDER BY floor(CAST(b.x - a.x AS DOUBLE) * 1e6
                                          / CAST(b.t - a.t AS DOUBLE)),
                                    a.t, b.t) AS rk
                FROM dense a JOIN dense b
                  ON b.ix = a.ix AND b.iy = a.iy AND b.t > a.t)
            SELECT ix, iy, total AS total_points, sm AS slope_micro,
                   CAST(sm AS DOUBLE) / 1e6 AS slope,
                   CASE WHEN sm >= 500000 THEN 'up'
                        WHEN sm <= -500000 THEN 'down'
                        ELSE 'none' END AS trend
            FROM slopes WHERE rk = 14
        """,
        # render_density_tiles: replay pixel binning (identical divide-
        # then-multiply floor order as cell_col, rule 5 casts via _GLON/
        # _GLAT), tile id = 3·2^58 + (x//16)·2^29 + (y//16), row-major
        # local index with south-origin y, cap 3, bit_xor checksum.
        # decode_ok is the engine-side byte-exact codec gate (oracle pins
        # TRUE); decoded_sum comes from the DECODED PNG in-engine but must
        # equal the oracle's pre-codec raster_sum expression.
        "render_density_tiles": f"""
            WITH xy AS (
              SELECT least(greatest(CAST(floor(((lon) + 180.0) / 360.0 * 128.0) AS BIGINT), 0), 127) AS x,
                     least(greatest(CAST(floor(((lat) + 90.0) / 180.0 * 128.0) AS BIGINT), 0), 127) AS y
              FROM (SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events)),
            px AS (SELECT x, y, count(*) AS cnt FROM xy GROUP BY x, y),
            staged AS (
              SELECT 3 * 288230376151711744 + (x // 16) * 536870912 + (y // 16) AS tile,
                     (y % 16) * 16 + (x % 16) AS li,
                     cnt, least(cnt, 3) AS v
              FROM px)
            SELECT tile,
                   CAST(sum(cnt) AS BIGINT) AS n_points,
                   CAST(count(*) AS INT) AS n_pixels,
                   CAST(bit_xor((li + 1) * 4294967296 + v) AS BIGINT) AS px_checksum,
                   CAST(sum(v) AS BIGINT) AS raster_sum,
                   CAST(sum(v) AS BIGINT) AS decoded_sum,
                   TRUE AS decode_ok
            FROM staged GROUP BY tile
        """,
        # augment_checksums: substitute source coordinates into the
        # gradient closed form per op; square 16x16 images so rotations
        # keep dims. Engine computes the checksum from the RE-DECODED
        # PNG, so equality also pins the codec round trip per variant.
        "augment_checksums": """
            WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 300),
            ops(op) AS (VALUES ('identity'), ('hflip'), ('vflip'),
                               ('rot180'), ('rot90'), ('rot270')),
            tgt AS (
              SELECT i, op, y, x,
                CASE op WHEN 'vflip' THEN 15 - y WHEN 'rot180' THEN 15 - y
                        WHEN 'rot90' THEN x WHEN 'rot270' THEN 15 - x
                        ELSE y END AS sy,
                CASE op WHEN 'hflip' THEN 15 - x WHEN 'rot180' THEN 15 - x
                        WHEN 'rot90' THEN 15 - y WHEN 'rot270' THEN y
                        ELSE x END AS sx
              FROM ids, ops,
                   generate_series(0, 15) ty(y),
                   generate_series(0, 15) tx(x)),
            vals AS (
              SELECT i, op,
                     (y * 16 + x + 1) *
                     ((i + 2 * sy + 3 * sx) % 256
                      + 2 * ((2 * i + sy + 5 * sx) % 256)
                      + 3 * ((3 * i + 4 * sy + sx) % 256)) AS term
              FROM tgt)
            SELECT printf('img%08d', i) AS image_id, op,
                   CAST(16 AS INT) AS out_w, CAST(16 AS INT) AS out_h,
                   CAST(sum(term) AS BIGINT) AS checksum
            FROM vals GROUP BY 1, 2
        """,
        # color_histogram_dups: replay pixels from the gradient closed
        # form, histogram into 4x4x4 bins, dominant bin via a single-key
        # arg_min ((-cnt)*64 + bin is lexicographic (-cnt, bin) since
        # bin < 64), bucket pairs, then the shared-bin L1 identity. String
        # ids are zero-padded so string order == numeric order.
        "color_histogram_dups": """
            WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 400),
            px AS (
              SELECT i, ((r // 64) * 4 + (g // 64)) * 4 + (b // 64) AS bin
              FROM (
                SELECT i,
                       (i + 2 * y + 3 * x) % 256 AS r,
                       (2 * i + y + 5 * x) % 256 AS g,
                       (3 * i + 4 * y + x) % 256 AS b
                FROM ids,
                     generate_series(0, 15) ty(y),
                     generate_series(0, 15) tx(x))),
            hist AS (SELECT i, bin, count(*) AS cnt FROM px GROUP BY i, bin),
            dom AS (
              SELECT i, arg_min(bin, (-cnt) * 64 + bin) AS d
              FROM hist GROUP BY i),
            pairs AS (
              SELECT a.i AS ia, b.i AS ib
              FROM dom a JOIN dom b ON a.d = b.d AND a.i < b.i),
            shared AS (
              SELECT p.ia, p.ib,
                     sum(abs(ha.cnt - hb.cnt)) AS sd,
                     sum(ha.cnt) AS sa, sum(hb.cnt) AS sb
              FROM pairs p
              JOIN hist ha ON ha.i = p.ia
              JOIN hist hb ON hb.i = p.ib AND hb.bin = ha.bin
              GROUP BY p.ia, p.ib)
            SELECT printf('img%08d', ia) AS id_a,
                   printf('img%08d', ib) AS id_b,
                   CAST(sd + (256 - sa) + (256 - sb) AS BIGINT) AS l1
            FROM shared
            WHERE sd + (256 - sa) + (256 - sb) <= 64
        """,
        "image_quality_gates": """
            WITH ids AS (
                SELECT event_id AS i FROM events WHERE event_id < 500),
            pix AS (
                SELECT i, y, x,
                       (i + 2 * y + 3 * x) % 256
                       + (2 * i + y + 5 * x) % 256
                       + (3 * i + 4 * y + x) % 256 AS g3
                FROM ids,
                     generate_series(0, 15) AS ys(y),
                     generate_series(0, 15) AS xs(x)),
            dx AS (
                SELECT p.i, CAST(sum(abs(q.g3 - p.g3)) AS BIGINT) AS sum3
                FROM pix p JOIN pix q
                  ON q.i = p.i AND q.y = p.y AND q.x = p.x + 1
                GROUP BY 1),
            t AS (
                SELECT i,
                       CAST(sum(CASE WHEN g3 <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
                       CAST(sum(CASE WHEN g3 >= 759 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
                FROM pix GROUP BY 1)
            SELECT printf('img%08d', d.i) AS image_id,
                   CAST(sum3 // 3 AS BIGINT) AS sum_absdx,
                   n_lo AS n_clip_lo, n_hi AS n_clip_hi,
                   floor(CAST(sum3 AS DOUBLE) / CAST(3 AS DOUBLE)
                         / CAST(240 AS DOUBLE) * 1e6 + 0.5 + 1e-8) / 1e6
                       AS sharpness,
                   floor(CAST(n_lo + n_hi AS DOUBLE) / CAST(256 AS DOUBLE)
                         * 1e6 + 0.5 + 1e-8) / 1e6 AS clip_frac,
                   CASE WHEN 1000 * sum3 < 3 * 5000 * 240 THEN 1 ELSE 0 END
                       AS is_blurry,
                   CASE WHEN 100 * (n_lo + n_hi) > 0 THEN 1 ELSE 0 END
                       AS is_clipped
            FROM dx d JOIN t ON t.i = d.i
        """,
        "vit_patch_tokens": """
            WITH ids AS (
                SELECT event_id AS i FROM events WHERE event_id < 500),
            pix AS (
                SELECT i, y, x,
                       (i + 2 * y + 3 * x) % 256 AS r,
                       (2 * i + y + 5 * x) % 256 AS g,
                       (3 * i + 4 * y + x) % 256 AS b
                FROM ids,
                     generate_series(0, 15) AS ys(y),
                     generate_series(0, 15) AS xs(x)),
            agg AS (
                SELECT i,
                       CAST(y // 8 AS INT) AS py,
                       CAST(x // 8 AS INT) AS px,
                       CAST(sum(r) AS BIGINT) AS sum_r,
                       CAST(sum(g) AS BIGINT) AS sum_g,
                       CAST(sum(b) AS BIGINT) AS sum_b,
                       CAST(sum(
                           (((y % 8) * 8 + (x % 8)) * 3 + 1) * r
                           + (((y % 8) * 8 + (x % 8)) * 3 + 2) * g
                           + (((y % 8) * 8 + (x % 8)) * 3 + 3) * b
                       ) AS BIGINT) AS checksum
                FROM pix GROUP BY 1, 2, 3)
            SELECT printf('img%08d', i) AS image_id, py, px,
                   sum_r, sum_g, sum_b, checksum,
                   CAST(sum_r + sum_g + sum_b AS DOUBLE) / 192.0 AS mean_gray
            FROM agg
        """,
        "semdedup_keep_flags": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            c AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
                FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
            sim AS (
                SELECT e.vec_id, c.cid,
                       round(CAST(list_cosine_similarity(e.v, c.cv) AS DOUBLE), 6) AS cos
                FROM e, c),
            asg AS (
                SELECT vec_id, CAST(cid AS INT) AS cluster_id
                FROM (SELECT vec_id, cid,
                             row_number() OVER (PARTITION BY vec_id
                                                ORDER BY cos DESC, cid) AS rn
                      FROM sim) t
                WHERE rn = 1),
            d AS (
                SELECT DISTINCT hi.vec_id
                FROM asg lo
                JOIN asg hi ON lo.cluster_id = hi.cluster_id AND lo.vec_id < hi.vec_id
                JOIN e el ON el.vec_id = lo.vec_id
                JOIN e eh ON eh.vec_id = hi.vec_id
                WHERE round(CAST(list_cosine_similarity(el.v, eh.v) AS DOUBLE), 6) >= 0.3)
            SELECT a.vec_id, a.cluster_id, (d.vec_id IS NULL) AS keep
            FROM asg a LEFT JOIN d ON d.vec_id = a.vec_id
        """,
        "quadkey_pyramid": _quadkey_oracle_sql(),
        "geohash_pyramid": _geohash_oracle_sql(),
        "hilbert_keys": _hilbert_oracle_sql(),
        "radius_pairs": f"""
            WITH pts AS (
                SELECT event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events)
            SELECT id_a, id_b, dist_km FROM (
                SELECT a.event_id AS id_a, b.event_id AS id_b,
                       round(2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(b.lat - a.lat) / 2), 2)
                           + cos(radians(a.lat)) * cos(radians(b.lat))
                             * power(sin(radians(b.lon - a.lon) / 2), 2))),
                             6) AS dist_km
                FROM pts a JOIN pts b
                  ON a.event_id < b.event_id
                 AND abs(a.lat - b.lat) <= 1.0) t
            WHERE dist_km <= 100.0
        """,
        "ripley_k_curve": f"""
            WITH pts AS (
                SELECT event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events),
            nn AS (SELECT count(*) AS n FROM pts),
            d AS (
                SELECT round(2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(b.lat - a.lat) / 2), 2)
                           + cos(radians(a.lat)) * cos(radians(b.lat))
                             * power(sin(radians(b.lon - a.lon) / 2), 2))),
                             6) AS dist
                FROM pts a JOIN pts b
                  ON a.event_id < b.event_id
                 AND abs(a.lat - b.lat) <= 1.0),
            r AS (SELECT CAST(v AS DOUBLE) AS r_km
                  FROM (VALUES (25.0), (50.0), (100.0)) t(v)),
            c AS (
                SELECT r.r_km, CAST(2 * count(d.dist) AS BIGINT) AS pair_count
                FROM r LEFT JOIN d ON d.dist <= r.r_km
                GROUP BY 1),
            k AS (
                SELECT r_km, pair_count,
                       CAST(510072000 AS DOUBLE) * CAST(pair_count AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE)))
                           AS k_raw
                FROM c, nn WHERE n >= 2)
            SELECT r_km, pair_count,
                   floor(k_raw * 1e6 + 0.5 + 1e-8) / 1e6 AS k_est,
                   floor(sqrt(k_raw / pi()) * 1e6 + 0.5 + 1e-8) / 1e6 AS l_est
            FROM k
        """,
        "dbscan_clusters": f"""
            WITH RECURSIVE pts AS (
                SELECT event_id AS id, {_GLON} AS lon, {_GLAT} AS lat
                FROM events),
            prs AS MATERIALIZED (
                -- MATERIALIZED: referenced by deg, e, and border — inlined,
                -- DuckDB re-runs the banded trig scan per reference (~6x)
                SELECT a.id AS ia, b.id AS ib
                FROM pts a JOIN pts b
                  ON abs(a.lat - b.lat) <= 1.0
                 AND round(2 * 6371.0088 * asin(sqrt(
                       power(sin(radians(b.lat - a.lat) / 2), 2)
                       + cos(radians(a.lat)) * cos(radians(b.lat))
                         * power(sin(radians(b.lon - a.lon) / 2), 2))),
                       6) <= 100.0),
            deg AS (SELECT ia, count(*) AS n FROM prs GROUP BY 1),
            core AS MATERIALIZED (SELECT ia AS id FROM deg WHERE n >= 3),
            e AS (
                SELECT p.ia AS a, p.ib AS b FROM prs p
                JOIN core c1 ON c1.id = p.ia
                JOIN core c2 ON c2.id = p.ib
                WHERE p.ia <> p.ib),
            und AS MATERIALIZED (
                SELECT a, b FROM e UNION SELECT b, a FROM e),
            reach(src, dst) AS (
                SELECT id, id FROM core
                UNION
                SELECT r.src, u.b FROM reach r JOIN und u ON u.a = r.dst),
            core_lbl AS (
                SELECT src AS id, min(dst) AS cluster_id
                FROM reach GROUP BY 1),
            border AS (
                SELECT p.ia AS id, min(cl.cluster_id) AS cluster_id
                FROM prs p JOIN core_lbl cl ON cl.id = p.ib
                WHERE p.ia NOT IN (SELECT id FROM core)
                GROUP BY 1)
            SELECT p.id,
                   (cl.id IS NOT NULL) AS is_core,
                   CAST(coalesce(cl.cluster_id, bo.cluster_id, -1)
                        AS BIGINT) AS cluster_id
            FROM pts p
            LEFT JOIN core_lbl cl ON cl.id = p.id
            LEFT JOIN border bo ON bo.id = p.id
        """,
        "dtw_track_pairs": _dtw_oracle_sql(),
        "frechet_track_pairs": _dtw_oracle_sql(
            frechet=True, out_col="frechet_km", thr=8.0
        ),
        "gwr_surface_betas": _gwr_oracle_sql(),
        "image_morphology": _morphology_oracle_sql(),
        "harris_corners_topk": _harris_oracle_sql(),
        "chamfer_distance_hist": _chamfer_oracle_sql(),
        "glcm_texture": _glcm_oracle_sql(),
        "lbp_histogram": _lbp_oracle_sql(),
        "run_length_texture": _run_lengths_oracle_sql(),
        "median_filter_stats": _median_filter_oracle_sql(),
        "template_match_sad": _template_match_oracle_sql(),
        "convoy_comovement": _convoy_oracle_sql(),
        "dag_critical_path": _dag_longest_oracle_sql(),
        "kn_bigram_lm": _kn_bigram_oracle_sql(),
        "image_moments": _image_moments_oracle_sql(),
        "box_filter_grid": _box_filter_oracle_sql(),
        "pattern_hit_counts": _pattern_hits_oracle_sql(),
        "zhang_suen_thinning": _thinning_oracle_sql(),
        "ridge_visibility": _ridge_visibility_oracle_sql(),
        "frequent_pairs_lift": _frequent_pairs_oracle_sql(),
        "orientation_histogram": _orientation_hist_oracle_sql(),
        "cusum_changepoints": _cusum_oracle_sql(),
        "acf_lags": _acf_oracle_sql(),
        "dominant_period": _dominant_period_oracle_sql(),
        "scd2_intervals": _scd2_oracle_sql(),
        "sorted_neighborhood_pairs": _snm_oracle_sql(),
        "cardinal_viewshed": _cardinal_viewshed_oracle_sql(),
        "streaming_sessionize": _streaming_sessionize_oracle_sql(),
        "fast_corners": _fast_oracle_sql(),
        "geofence_visits": _geofence_oracle_sql(),
        "merge_upsert": _merge_upsert_oracle_sql(),
        "brief_descriptors": _brief_oracle_sql(),
        "pitch_amdf": _pitch_amdf_oracle_sql(),
        "ring_self_intersections": _ring_self_intersections_oracle_sql(),
        "nms_boxes": _nms_oracle_sql(),
        "detection_matches": _detection_matches_oracle_sql(),
        "mask_rle_runs": _mask_rle_oracle_sql(),
        "anchor_assign": _anchor_assign_oracle_sql(),
        "detection_ap": _detection_ap_oracle_sql(),
        "bleu_captions": _bleu_captions_oracle_sql(),
        "panoptic_quality": _panoptic_oracle_sql(),
        "confusion_matrix": _confusion_oracle_sql(),
        "mosaic_boxes": _mosaic_oracle_sql(),
        "apportion_budget": _apportion_oracle_sql(),
        "ring_nesting": _ring_nesting_oracle_sql(),
        "exif_boxes": _exif_boxes_oracle_sql(),
        "iou_tracklets": _tracklets_oracle_sql(),
        "letterbox_boxes": _letterbox_oracle_sql(),
        "spearman_corr": _spearman_oracle_sql(),
        "cohen_kappa": _kappa_oracle_sql(),
        "scene_cuts": _scene_cuts_oracle_sql(),
        "retrieval_ranks": _retrieval_ranks_oracle_sql(),
        "kfold_assign": _kfold_oracle_sql(),
        "roc_auc_groups": _roc_auc_oracle_sql(),
        "calibration_ece": _calibration_oracle_sql(),
        "homography_boxes": _homography_oracle_sql(),
        "chaikin_smooth": _chaikin_oracle_sql(),
        "brier_scores": _brier_oracle_sql(),
        "domain_counts": _domain_counts_oracle_sql(),
        "pr_curve_points": _pr_curve_oracle_sql(),
        "pyramid_sums": _pyramid_oracle_sql(),
        "block_flow_motion": _block_flow_oracle_sql(),
        "clip_rings_tile": _clip_tile_oracle_sql(),
        "block_flow_dense": _block_flow_oracle_sql(),
        "ndcg_graded": _ndcg_oracle_sql(),
        "hausdorff_track_pairs": f"""
            WITH pts AS (
                SELECT {_HTID} AS tid, event_id AS ea,
                       {_HLON} AS lon, {_HLAT} AS lat
                FROM events WHERE {_HSEL}),
            pd AS (
                -- every directed point pair between distinct tracks;
                -- round BEFORE the reductions (shared rule-16 contract)
                SELECT a.tid AS ta, b.tid AS tb, a.ea,
                       round(2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(b.lat - a.lat) / 2), 2)
                           + cos(radians(a.lat)) * cos(radians(b.lat))
                             * power(sin(radians(b.lon - a.lon) / 2), 2))),
                             6) AS d
                FROM pts a JOIN pts b ON a.tid <> b.tid),
            mins AS (SELECT ta, tb, ea, min(d) AS md FROM pd GROUP BY 1, 2, 3),
            dirs AS (SELECT ta, tb, max(md) AS h FROM mins GROUP BY 1, 2),
            sym AS (
                SELECT least(ta, tb) AS id_a, greatest(ta, tb) AS id_b,
                       max(h) AS hausdorff_km
                FROM dirs GROUP BY 1, 2)
            SELECT id_a, id_b, hausdorff_km FROM sym
            WHERE hausdorff_km <= 10.0
        """,
        "spacetime_pairs": f"""
            WITH pts AS (
                SELECT event_id, ts, {_GLON} AS lon, {_GLAT} AS lat
                FROM events)
            SELECT id_a, id_b, dist_km, dt_s FROM (
                SELECT a.event_id AS id_a, b.event_id AS id_b,
                       round(2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(b.lat - a.lat) / 2), 2)
                           + cos(radians(a.lat)) * cos(radians(b.lat))
                             * power(sin(radians(b.lon - a.lon) / 2), 2))),
                             6) AS dist_km,
                       date_diff('second', date_trunc('second', a.ts),
                                 date_trunc('second', b.ts)) AS dt_s
                FROM pts a JOIN pts b
                  ON a.event_id < b.event_id
                 AND abs(a.lat - b.lat) <= 1.0) t
            WHERE dist_km <= 100.0 AND abs(dt_s) <= 259200
        """,
        "zone_convex_hulls": """
            -- closed form: the strictly-convex parabola points ARE the
            -- hull, in x order (lower chain; the upper chain adds no
            -- interior vertex), CCW from the lexicographic minimum
            WITH pts AS (
                SELECT DISTINCT event_id % 5 AS zone,
                       ((event_id // 5) % 50) AS j
                FROM events WHERE ((event_id // 5) % 50) < 25)
            SELECT zone,
                   CAST(row_number() OVER (PARTITION BY zone ORDER BY j)
                        - 1 AS INT) AS vertex_idx,
                   CAST(zone * 30 - 60 AS DOUBLE)
                     + CAST(j AS DOUBLE) / CAST(100 AS DOUBLE) AS lon,
                   CAST(zone * 10 - 20 AS DOUBLE)
                     + CAST(j * j AS DOUBLE) / CAST(1000 AS DOUBLE) AS lat
            FROM pts
        """,
        "od_matrix_flows": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id,
                       {_LON} AS lon, {_LAT} AS lat
                FROM events),
            r AS (
                SELECT user_id, lon, lat,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS cnt
                FROM pts),
            ends AS (
                SELECT user_id,
                       max(CASE WHEN rn = 1 THEN lon END) AS o_lon,
                       max(CASE WHEN rn = 1 THEN lat END) AS o_lat,
                       max(CASE WHEN rn = cnt THEN lon END) AS d_lon,
                       max(CASE WHEN rn = cnt THEN lat END) AS d_lat
                FROM r GROUP BY user_id),
            z AS (
                SELECT e.user_id,
                       coalesce(zo.zone_id, -1) AS zone_o,
                       coalesce(zd.zone_id, -1) AS zone_d
                FROM ends e
                LEFT JOIN (VALUES {_ZONES_SQL}) AS zo(zone_id, x0, y0, x1, y1)
                  ON e.o_lon >= zo.x0 AND e.o_lon < zo.x1
                 AND e.o_lat >= zo.y0 AND e.o_lat < zo.y1
                LEFT JOIN (VALUES {_ZONES_SQL}) AS zd(zone_id, x0, y0, x1, y1)
                  ON e.d_lon >= zd.x0 AND e.d_lon < zd.x1
                 AND e.d_lat >= zd.y0 AND e.d_lat < zd.y1)
            SELECT zone_o, zone_d, count(*) AS n_trips
            FROM z GROUP BY 1, 2
        """,
        "position_at_instants": f"""
            WITH pts AS (
                SELECT user_id, ts, {_GLON} AS lon, {_GLAT} AS lat FROM events),
            qs AS (
                SELECT DISTINCT user_id,
                       unnest([{", ".join("TIMESTAMP '" + s + "'" for s in _POS_AT_STAMPS)}]) AS ts
                FROM events),
            u AS (
                SELECT user_id AS k,
                       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
                       0 AS isq, lon, lat, ts
                FROM pts
                UNION ALL
                SELECT user_id,
                       CAST(epoch(date_trunc('second', ts)) AS BIGINT),
                       1, NULL, NULL, ts
                FROM qs),
            f AS (
                SELECT k, s, isq, ts,
                       last_value(CASE WHEN isq = 0 THEN
                           struct_pack(s := s, lon := lon, lat := lat) END
                           IGNORE NULLS)
                         OVER (PARTITION BY k ORDER BY s, isq
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS prev0,
                       last_value(CASE WHEN isq = 0 THEN
                           struct_pack(s := s, lon := lon, lat := lat) END
                           IGNORE NULLS)
                         OVER (PARTITION BY k ORDER BY s DESC, isq ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS next0
                FROM u),
            g AS (
                SELECT k, s, ts,
                       coalesce(prev0, next0) AS p,
                       coalesce(next0, prev0) AS n
                FROM f WHERE isq = 1),
            h AS (
                SELECT k, ts, p, n,
                       CASE WHEN n.s - p.s > 0 THEN
                           CAST(s - p.s AS DOUBLE) / CAST(n.s - p.s AS DOUBLE)
                       ELSE CAST(0 AS DOUBLE) END AS frac
                FROM g WHERE p IS NOT NULL)
            SELECT k AS user_id, ts,
                   floor((p.lon + (n.lon - p.lon) * frac) * 1e6 + 0.5 + 1e-8)
                     / 1e6 AS lon,
                   floor((p.lat + (n.lat - p.lat) * frac) * 1e6 + 0.5 + 1e-8)
                     / 1e6 AS lat
            FROM h
        """,
        "segment_intersections": f"""
            WITH a AS (
                SELECT DISTINCT event_id % 90 AS id_a,
                       {_SEGA_D["ax"]} AS ax, {_SEGA_D["ay"]} AS ay,
                       {_SEGA_D["ax"]} + CAST(12 AS DOUBLE) / CAST(10 AS DOUBLE) AS bx,
                       {_SEGA_D["ay"]} + CAST(8 AS DOUBLE) / CAST(10 AS DOUBLE) AS by
                FROM events),
            b AS (
                SELECT DISTINCT event_id % 70 AS id_b,
                       {_SEGB_D["ax"]} AS cx, {_SEGB_D["ay"]} AS cy,
                       {_SEGB_D["ax"]} + CAST(1 AS DOUBLE) AS dx,
                       {_SEGB_D["ay"]} - CAST(9 AS DOUBLE) / CAST(10 AS DOUBLE) AS dy
                FROM events),
            c AS (
                SELECT id_a, id_b, ax, ay, bx, by, cx, cy, dx, dy,
                       (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) AS d1,
                       (bx - ax) * (dy - ay) - (by - ay) * (dx - ax) AS d2,
                       (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx) AS d3,
                       (dx - cx) * (by - cy) - (dy - cy) * (bx - cx) AS d4
                FROM a, b),
            x AS (
                SELECT id_a, id_b, ax, ay, bx - ax AS dax, by - ay AS day,
                       ((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx))
                       / ((bx - ax) * (dy - cy) - (by - ay) * (dx - cx)) AS t
                FROM c WHERE d1 * d2 < 0 AND d3 * d4 < 0)
            SELECT id_a, id_b,
                   floor((ax + t * dax) * 1e6 + 0.5 + 1e-8) / 1e6 AS x,
                   floor((ay + t * day) * 1e6 + 0.5 + 1e-8) / 1e6 AS y
            FROM x
        """,
        "track_motion_features": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events
            ), staged AS (
                SELECT user_id,
                       2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(lat - lag(lat) OVER w) / 2), 2)
                           + cos(radians(lag(lat) OVER w)) * cos(radians(lat))
                             * power(sin(radians(lon - lag(lon) OVER w) / 2), 2)))
                         AS step,
                       date_diff('second', date_trunc('second', lag(ts) OVER w),
                                 date_trunc('second', ts)) AS dt,
                       first_value(lon) OVER wf AS fx, first_value(lat) OVER wf AS fy,
                       last_value(lon) OVER wf AS lx, last_value(lat) OVER wf AS ly
                FROM pts
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                       wf AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ), agg AS (
                SELECT user_id, count(*) AS n_points,
                       round(sum(step), 4) AS path_km,
                       round(2 * 6371.0088 * asin(sqrt(
                           power(sin(radians(any_value(ly) - any_value(fy)) / 2), 2)
                           + cos(radians(any_value(fy))) * cos(radians(any_value(ly)))
                             * power(sin(radians(any_value(lx) - any_value(fx)) / 2), 2))),
                           6) AS direct_km,
                       max(CASE WHEN dt > 0
                           THEN round(step / dt * 3600.0, 4) END) AS max_speed_kmh
                FROM staged GROUP BY user_id)
            SELECT user_id, n_points, path_km, direct_km,
                   CASE WHEN direct_km > 0
                        THEN round(path_km / direct_km, 4) END AS tortuosity,
                   max_speed_kmh
            FROM agg
        """,
        "ring_centroids": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events
            ), staged AS (
                SELECT user_id,
                       lon * lead(lat) OVER w - lead(lon) OVER w * lat AS cr,
                       (lon + lead(lon) OVER w)
                         * (lon * lead(lat) OVER w - lead(lon) OVER w * lat) AS cx,
                       (lat + lead(lat) OVER w)
                         * (lon * lead(lat) OVER w - lead(lon) OVER w * lat) AS cy,
                       first_value(lon) OVER wf AS fx, first_value(lat) OVER wf AS fy,
                       last_value(lon) OVER wf AS lx, last_value(lat) OVER wf AS ly
                FROM pts
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                       wf AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ), agg AS (
                SELECT user_id, count(*) AS n_points,
                       sum(cr) + (any_value(lx) * any_value(fy)
                                  - any_value(fx) * any_value(ly)) AS a2,
                       sum(cx) + (any_value(lx) + any_value(fx))
                           * (any_value(lx) * any_value(fy)
                              - any_value(fx) * any_value(ly)) AS sx,
                       sum(cy) + (any_value(ly) + any_value(fy))
                           * (any_value(lx) * any_value(fy)
                              - any_value(fx) * any_value(ly)) AS sy
                FROM staged GROUP BY user_id)
            SELECT user_id, n_points,
                   floor(sx / (3.0 * a2) * 1e6 + 0.5 + 1e-8) / 1e6 AS c_x,
                   floor(sy / (3.0 * a2) * 1e6 + 0.5 + 1e-8) / 1e6 AS c_y
            FROM agg WHERE a2 <> 0.0
        """,
        "ring_areas_spherical": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events
            ), staged AS (
                SELECT user_id,
                       (radians(lead(lon) OVER w) - radians(lon))
                         * (sin(radians(lat)) + sin(radians(lead(lat) OVER w)))
                         AS term,
                       first_value(lon) OVER wf AS flon, first_value(lat) OVER wf AS flat,
                       last_value(lon) OVER wf AS llon, last_value(lat) OVER wf AS llat
                FROM pts
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                       wf AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            )
            SELECT user_id, count(*) AS n_points,
                   round(abs(sum(term)
                             + (radians(any_value(flon)) - radians(any_value(llon)))
                               * (sin(radians(any_value(llat)))
                                  + sin(radians(any_value(flat)))))
                         * (6371.0088 * 6371.0088 / 2.0), 2) AS area_km2
            FROM staged GROUP BY user_id
        """,
        "tile_mosaic_best": f"""
            WITH img AS (
                SELECT event_id AS i, {_IMG_LON} AS lon, {_LAT} AS lat
                FROM events WHERE event_id < 500),
            ch AS (
                SELECT i, lon, lat, (i % 256) AS r, ((i * 3) % 256) AS g,
                       ((i * 7) % 256)
                         - ((i % 256 + (i * 3) % 256 + (i * 7) % 256) % 3)
                         AS b0
                FROM img),
            t AS (
                SELECT printf('img%08d', i) AS image_id,
                       7 * 288230376151711744
                         + CAST(floor((lon + 180) / 360 * 128) AS BIGINT)
                           * 536870912
                         + CAST(floor((lat + 90) / 180 * 128) AS BIGINT)
                           AS tile,
                       CAST(r + g + CASE WHEN b0 < 0 THEN b0 + 3 ELSE b0 END
                            AS DOUBLE) / CAST(3 AS DOUBLE) AS quality
                FROM ch),
            rk AS (
                SELECT tile, image_id, quality,
                       row_number() OVER (PARTITION BY tile
                           ORDER BY quality DESC, image_id DESC) AS rn
                FROM t)
            SELECT tile, image_id, quality FROM rk WHERE rn = 1
        """,
        "contour_segments": """
            WITH cells AS (
                SELECT event_id % 24 AS ix, (event_id // 24) % 16 AS iy,
                       max((event_id * 31) % 97) AS v
                FROM events GROUP BY 1, 2),
            corners AS (
                SELECT ix - d.dx AS bx, iy - d.dy AS by,
                       CASE WHEN v >= 60 THEN
                           CASE d.dx + 2 * d.dy
                               WHEN 0 THEN 1 WHEN 1 THEN 2
                               WHEN 2 THEN 4 ELSE 8 END
                       ELSE 0 END AS bit
                FROM cells, (VALUES (0, 0), (1, 0), (0, 1), (1, 1))
                     AS d(dx, dy)),
            blocks AS (
                SELECT bx, by, CAST(sum(bit) AS INT) AS case_idx
                FROM corners GROUP BY 1, 2
                HAVING sum(bit) > 0 AND sum(bit) < 15),
            -- independent copy of the public midpoint segment table
            -- (saddles 6/9 = disconnected default, the operator contract)
            lut(case_idx, seg_idx, ox1, oy1, ox2, oy2) AS (VALUES
                (1,  0, 0.0, 0.5, 0.5, 0.0),
                (2,  0, 0.5, 0.0, 1.0, 0.5),
                (3,  0, 0.0, 0.5, 1.0, 0.5),
                (4,  0, 0.0, 0.5, 0.5, 1.0),
                (5,  0, 0.5, 0.0, 0.5, 1.0),
                (6,  0, 0.0, 0.5, 0.5, 1.0),
                (6,  1, 0.5, 0.0, 1.0, 0.5),
                (7,  0, 1.0, 0.5, 0.5, 1.0),
                (8,  0, 1.0, 0.5, 0.5, 1.0),
                (9,  0, 0.0, 0.5, 0.5, 0.0),
                (9,  1, 1.0, 0.5, 0.5, 1.0),
                (10, 0, 0.5, 0.0, 0.5, 1.0),
                (11, 0, 0.0, 0.5, 0.5, 1.0),
                (12, 0, 0.0, 0.5, 1.0, 0.5),
                (13, 0, 0.5, 0.0, 1.0, 0.5),
                (14, 0, 0.0, 0.5, 0.5, 0.0))
            SELECT b.bx, b.by, b.case_idx, CAST(l.seg_idx AS INT) AS seg_idx,
                   CAST(b.bx AS DOUBLE) + CAST(l.ox1 AS DOUBLE) AS x1,
                   CAST(b.by AS DOUBLE) + CAST(l.oy1 AS DOUBLE) AS y1,
                   CAST(b.bx AS DOUBLE) + CAST(l.ox2 AS DOUBLE) AS x2,
                   CAST(b.by AS DOUBLE) + CAST(l.oy2 AS DOUBLE) AS y2
            FROM blocks b JOIN lut l USING (case_idx)
        """,
        "crossmodal_dup_confirm": f"""
            WITH h AS (
                SELECT event_id AS image_id,
                       {_phash_expr(lambda a, b: f"xor({a}, {b})")} AS phash,
                       printf('photo of scene %d', event_id // 4) AS caption
                FROM events)
            SELECT a.image_id AS id_a, b.image_id AS id_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
            FROM h a JOIN h b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 2
              AND a.caption = b.caption
        """,
        "resample_tracks_daily": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id,
                       {_GLON} AS lon, {_GLAT} AS lat
                FROM events),
            o AS (
                SELECT user_id, ts, event_id, lon, lat,
                       date_diff('second',
                                 min(ts) OVER (PARTITION BY user_id),
                                 ts) AS off,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM pts),
            seg AS (
                SELECT user_id, lon, lat, rn, off,
                       lead(off) OVER w AS noff,
                       lead(lon) OVER w AS nlon,
                       lead(lat) OVER w AS nlat
                FROM o
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            firsts AS (
                SELECT user_id, 0 AS k,
                       floor(lon * 1e6 + 0.5 + 1e-8) / 1e6 AS x,
                       floor(lat * 1e6 + 0.5 + 1e-8) / 1e6 AS y
                FROM seg WHERE rn = 1),
            ks AS (
                SELECT user_id, lon, lat, off, noff, nlon, nlat,
                       unnest(CASE WHEN noff // 86400 >= off // 86400 + 1
                                   THEN range(off // 86400 + 1, noff // 86400 + 1)
                                   ELSE [] END) AS k
                FROM seg WHERE noff IS NOT NULL AND noff > off),
            interp AS (
                SELECT user_id, k,
                       floor((lon + (nlon - lon)
                              * (CAST(k * 86400 - off AS DOUBLE)
                                 / CAST(noff - off AS DOUBLE)))
                             * 1e6 + 0.5 + 1e-8) / 1e6 AS x,
                       floor((lat + (nlat - lat)
                              * (CAST(k * 86400 - off AS DOUBLE)
                                 / CAST(noff - off AS DOUBLE)))
                             * 1e6 + 0.5 + 1e-8) / 1e6 AS y
                FROM ks)
            SELECT user_id, CAST(k AS INT) AS k, x, y FROM firsts
            UNION ALL
            SELECT user_id, CAST(k AS INT) AS k, x, y FROM interp
        """,
        "idw_surface_cells": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat, value FROM events),
            b AS (
                SELECT CAST(floor(lon / 5.0) AS BIGINT) AS px,
                       CAST(floor(lat / 5.0) AS BIGINT) AS py,
                       lon AS x, lat AS y,
                       CAST(floor(value * 1000.0) AS BIGINT) AS vq
                FROM pts),
            c AS (
                SELECT b.*, px + dx.d AS ix, py + dy.d AS iy
                FROM b,
                     (VALUES (-1), (0), (1)) AS dx(d),
                     (VALUES (-1), (0), (1)) AS dy(d)),
            s AS (
                SELECT ix, iy, vq,
                       CAST(floor(1e9 / (1e-3
                           + (x - (CAST(ix AS DOUBLE) + 0.5) * 5.0)
                             * (x - (CAST(ix AS DOUBLE) + 0.5) * 5.0)
                           + (y - (CAST(iy AS DOUBLE) + 0.5) * 5.0)
                             * (y - (CAST(iy AS DOUBLE) + 0.5) * 5.0)
                       )) AS BIGINT) AS wq
                FROM c),
            a AS (
                SELECT ix, iy, count(*) AS n_samples,
                       sum(CAST(wq AS DECIMAL(38,0))) AS sw,
                       sum(CAST(wq AS DECIMAL(19,0)) * CAST(vq AS DECIMAL(19,0))) AS swv
                FROM s GROUP BY 1, 2)
            SELECT ix, iy, n_samples,
                   floor(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 1000.0
                         * 1e6 + 0.5 + 1e-8) / 1e6 AS idw_value
            FROM a WHERE sw > 0
        """,
        "morans_i_autocorrelation": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
            b AS (
                SELECT CAST(floor(lon / 5.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 5.0) AS BIGINT) AS iy,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            pairs AS (
                SELECT CAST(sum(a.n * c.n) AS BIGINT) AS sxy,
                       CAST(sum(a.n + c.n) AS BIGINT) AS sxs,
                       count(*) AS w
                FROM b a JOIN b c
                  ON abs(a.ix - c.ix) <= 1 AND abs(a.iy - c.iy) <= 1
                 AND NOT (a.ix = c.ix AND a.iy = c.iy)),
            cells AS (
                SELECT CAST(sum(n) AS BIGINT) AS s1,
                       CAST(sum(n * n) AS BIGINT) AS s2,
                       count(*) AS n
                FROM b)
            SELECT n AS n_cells, w AS w_pairs,
                   floor(CAST(n AS DOUBLE)
                         * (CAST(sxy AS DOUBLE)
                            - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sxs AS DOUBLE)
                            + CAST(w AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                                * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                         / (CAST(w AS DOUBLE)
                            * (CAST(s2 AS DOUBLE)
                               - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                                                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
                         * 1e6 + 0.5 + 1e-8) / 1e6 AS morans_i
            FROM cells, pairs
            WHERE w > 0
        """,
        "local_morans_lisa": f"""
            WITH pts AS (
                SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
            b AS (
                SELECT CAST(floor(lon / 5.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 5.0) AS BIGINT) AS iy,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            loc AS (
                SELECT a.ix, a.iy, a.n,
                       CAST(sum(c.n) AS BIGINT) AS si,
                       count(*) AS wi
                FROM b a JOIN b c
                  ON abs(a.ix - c.ix) <= 1 AND abs(a.iy - c.iy) <= 1
                 AND NOT (a.ix = c.ix AND a.iy = c.iy)
                GROUP BY 1, 2, 3),
            g AS (
                SELECT CAST(sum(n) AS BIGINT) AS s1,
                       CAST(sum(n * n) AS BIGINT) AS s2,
                       count(*) AS ncells
                FROM b)
            SELECT ix, iy, n AS n_points, wi AS w_i, si AS s_i,
                   floor((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(ncells AS DOUBLE))
                         * (CAST(si AS DOUBLE)
                            - CAST(wi AS DOUBLE)
                              * (CAST(s1 AS DOUBLE) / CAST(ncells AS DOUBLE)))
                         / (CAST(s2 AS DOUBLE) / CAST(ncells AS DOUBLE)
                            - (CAST(s1 AS DOUBLE) / CAST(ncells AS DOUBLE))
                              * (CAST(s1 AS DOUBLE) / CAST(ncells AS DOUBLE)))
                         * 1e6 + 0.5 + 1e-8) / 1e6 AS lisa_i,
                   CASE WHEN ncells * n > s1 AND ncells * si > wi * s1 THEN 'HH'
                        WHEN NOT (ncells * n > s1) AND NOT (ncells * si > wi * s1) THEN 'LL'
                        WHEN ncells * n > s1 THEN 'HL'
                        ELSE 'LH' END AS quadrant
            FROM loc, g
            WHERE ncells * s2 - s1 * s1 > 0
        """,
        "hmm_map_match": _hmm_oracle_sql(),
        "table_diff_audit": """
            WITH a AS (SELECT event_id, value, event_type FROM events),
            b AS (
              SELECT event_id,
                     CASE WHEN event_id % 97 = 3 THEN value + 1.0
                          ELSE value END AS value,
                     event_type
              FROM events WHERE event_id % 131 <> 5
              UNION ALL
              SELECT event_id + 10000000, value, event_type
              FROM events WHERE event_id % 211 = 7),
            j AS (
              SELECT coalesce(a.event_id, b.event_id) AS event_id,
                     CASE WHEN a.event_id IS NULL THEN 'b_only'
                          WHEN b.event_id IS NULL THEN 'a_only'
                          WHEN (a.value IS DISTINCT FROM b.value)
                            OR (a.event_type IS DISTINCT FROM b.event_type)
                          THEN 'differs' END AS status
              FROM a FULL JOIN b ON a.event_id = b.event_id)
            SELECT event_id, status FROM j WHERE status IS NOT NULL
        """,
        # quantiles_nosort: independent full-sort rank oracle; the rank
        # expression ceil(q * n) is evaluated in IEEE double in BOTH
        # engines from the same literals (see the query docstring)
        "quantiles_nosort": """
            WITH v AS (
              SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT)
                     AS vm
              FROM events),
            tot AS (SELECT count(*) AS n FROM v),
            qs AS (
              SELECT CAST(unnest([0.01, 0.25, 0.5, 0.9, 0.99]) AS DOUBLE)
                     AS q),
            ranks AS (
              SELECT q, CAST(ceil(q * n) AS BIGINT) AS k FROM qs, tot),
            srt AS (
              SELECT vm, row_number() OVER (ORDER BY vm) AS rn FROM v)
            SELECT r.q AS q, s.vm AS value
            FROM ranks r JOIN srt s ON s.rn = r.k
        """,
        # replay of edge cancellation over the unit-square tessellation:
        # integer coordinates make every multiplicity key, unit length,
        # midpoint half, and unit shoelace area exact (bit-strict compare)
        "poly_dissolve_stats": """
            WITH cells AS (
                SELECT event_id % 24 AS ix, (event_id // 24) % 16 AS iy
                FROM events WHERE event_id < 385),
            e AS (
                SELECT (ix // 12) + 2 * (iy // 8) AS gid,
                       CASE k WHEN 0 THEN ix WHEN 1 THEN ix + 1
                              WHEN 2 THEN ix + 1 ELSE ix END AS ax,
                       CASE k WHEN 0 THEN iy WHEN 1 THEN iy
                              WHEN 2 THEN iy + 1 ELSE iy + 1 END AS ay,
                       CASE k WHEN 0 THEN ix + 1 WHEN 1 THEN ix + 1
                              WHEN 2 THEN ix ELSE ix END AS bx,
                       CASE k WHEN 0 THEN iy WHEN 1 THEN iy + 1
                              WHEN 2 THEN iy + 1 ELSE iy END AS by
                FROM cells, generate_series(0, 3) g(k)),
            norm AS (
                SELECT gid,
                       CASE WHEN ax < bx OR (ax = bx AND ay < by)
                            THEN ax ELSE bx END AS x1,
                       CASE WHEN ax < bx OR (ax = bx AND ay < by)
                            THEN ay ELSE by END AS y1,
                       CASE WHEN ax < bx OR (ax = bx AND ay < by)
                            THEN bx ELSE ax END AS x2,
                       CASE WHEN ax < bx OR (ax = bx AND ay < by)
                            THEN by ELSE ay END AS y2
                FROM e),
            mult AS (
                SELECT gid, x1, y1, x2, y2, count(*) AS m
                FROM norm GROUP BY ALL),
            eroll AS (
                SELECT gid,
                       CAST(sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_boundary_edges,
                       sum(CASE WHEN m = 1 THEN sqrt(CAST(
                           (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) AS DOUBLE))
                           ELSE 0.0 END) AS boundary_len,
                       sum(CASE WHEN m = 1 THEN CAST(x1 + x2 AS DOUBLE) / 2.0
                           ELSE 0.0 END) AS sum_mid_x,
                       sum(CASE WHEN m = 1 THEN CAST(y1 + y2 AS DOUBLE) / 2.0
                           ELSE 0.0 END) AS sum_mid_y,
                       CAST(sum(CASE WHEN m > 2 THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_nonmanifold
                FROM mult GROUP BY gid),
            aroll AS (
                SELECT (ix // 12) + 2 * (iy // 8) AS gid,
                       CAST(count(*) AS BIGINT) AS n_polys,
                       sum(1.0) AS dissolved_area
                FROM cells GROUP BY 1)
            SELECT CAST(a.gid AS BIGINT) AS gid, n_polys, dissolved_area,
                   n_boundary_edges, boundary_len, sum_mid_x, sum_mid_y,
                   n_nonmanifold
            FROM aroll a JOIN eroll e2 ON a.gid = e2.gid
        """,
        "hough_line_votes": _hough_oracle_sql(),
        "bpe_train_merges": _bpe_oracle_sql(),
        "image_edge_hough": _edge_hough_oracle_sql(),
        # independent fixpoint formulation of the SAME labeling contract:
        # recursive-CTE min-label propagation over the 4-neighbor mask
        # graph (the dbscan_points evidence class)
        "image_blob_stats": """
            WITH ids AS (SELECT event_id AS i FROM events WHERE event_id < 150),
            pix AS (
                SELECT i, y, x, y * 16 + x AS pid,
                       (i + 2 * y + 3 * x) % 256
                       + (2 * i + y + 5 * x) % 256
                       + (3 * i + 4 * y + x) % 256 AS g3
                FROM ids, generate_series(0, 15) ys(y),
                     generate_series(0, 15) xs(x)),
            mask AS (SELECT i, y, x, pid FROM pix WHERE g3 >= 384),
            adj AS (
                SELECT a.i, a.pid AS pa, b.pid AS pb
                FROM mask a JOIN mask b
                  ON a.i = b.i AND ((abs(a.x - b.x) = 1 AND a.y = b.y)
                                 OR (abs(a.y - b.y) = 1 AND a.x = b.x))),
            lab AS (
                WITH RECURSIVE r AS (
                    SELECT i, pid, pid AS lbl FROM mask
                    UNION
                    SELECT adj.i, adj.pa AS pid, r.lbl
                    FROM r JOIN adj ON adj.i = r.i AND adj.pb = r.pid
                    WHERE r.lbl < adj.pa)
                SELECT i, pid, min(lbl) AS lbl FROM r GROUP BY i, pid),
            stats AS (
                SELECT m.i, l.lbl AS label,
                       CAST(count(*) AS BIGINT) AS n_pixels,
                       CAST(min(m.x) AS BIGINT) AS min_x,
                       CAST(min(m.y) AS BIGINT) AS min_y,
                       CAST(max(m.x) AS BIGINT) AS max_x,
                       CAST(max(m.y) AS BIGINT) AS max_y,
                       CAST(sum(m.x) AS BIGINT) AS sum_x,
                       CAST(sum(m.y) AS BIGINT) AS sum_y
                FROM mask m JOIN lab l ON l.i = m.i AND l.pid = m.pid
                GROUP BY 1, 2)
            SELECT printf('img%08d', i) AS image_id, label, n_pixels,
                   min_x, min_y, max_x, max_y, sum_x, sum_y
            FROM stats
        """,
        # positional PMI: every marginal is a rollup of the one bigram
        # aggregate; ln ulp dust absorbed by the micro-unit epsilon
        "collocation_pmi": """
            WITH toks AS (
                SELECT doc_id, t.term, t.pos
                FROM documents,
                LATERAL (
                    SELECT unnest(regexp_split_to_array(lower(text),
                                  '[^a-z0-9]+')) AS term,
                           generate_subscripts(regexp_split_to_array(
                                  lower(text), '[^a-z0-9]+'), 1) AS pos
                ) t
                WHERE t.term <> ''),
            bg AS (
                SELECT doc_id, w1, w2 FROM (
                    SELECT doc_id, term AS w1,
                           lead(term) OVER (
                               PARTITION BY doc_id ORDER BY pos) AS w2
                    FROM toks)
                WHERE w2 IS NOT NULL),
            cab AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
            c1 AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n1
                   FROM cab GROUP BY 1),
            c2 AS (SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n2
                   FROM cab GROUP BY 1),
            nt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_total FROM cab)
            SELECT w1, w2, n_ab, n1, n2,
                   CAST(floor(ln(CAST(n_ab AS DOUBLE) * CAST(n_total AS DOUBLE)
                                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
                              * 1e6 + 0.5 + 1e-8) AS BIGINT) AS pmi_micro
            FROM cab JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nt
            WHERE n_ab >= 20
        """,
        # pixel re-derivation from the gradient closed form + the same
        # prefix-sum / argmax / remap pipeline in SQL windows; output is
        # all-integer (the score ships as its exact num²/den pair)
        "image_equalize_otsu": """
            WITH ids AS (
                SELECT event_id AS i FROM events WHERE event_id < 300),
            pix AS (
                SELECT i,
                       (i + 2 * y + 3 * x) % 256
                       + (2 * i + y + 5 * x) % 256
                       + (3 * i + 4 * y + x) % 256 AS v
                FROM ids, generate_series(0, 15) ys(y),
                     generate_series(0, 15) xs(x)),
            hist AS (SELECT i, v, count(*) AS cnt FROM pix GROUP BY ALL),
            h AS (
                SELECT i, v, cnt,
                       sum(cnt) OVER (PARTITION BY i ORDER BY v) AS c0,
                       sum(v * cnt) OVER (PARTITION BY i ORDER BY v) AS s0,
                       sum(cnt) OVER (PARTITION BY i) AS n,
                       sum(v * cnt) OVER (PARTITION BY i) AS s,
                       first_value(cnt) OVER (PARTITION BY i ORDER BY v)
                           AS cdf_min
                FROM hist),
            sg AS (
                SELECT *,
                       (s0 * (n - c0) - (s - s0) * c0)
                       * (s0 * (n - c0) - (s - s0) * c0) AS numsq,
                       c0 * (n - c0) AS den,
                       CASE WHEN c0 < n THEN
                         CAST((s0 * (n - c0) - (s - s0) * c0)
                              * (s0 * (n - c0) - (s - s0) * c0) AS DOUBLE)
                         / CAST(c0 * (n - c0) AS DOUBLE)
                       END AS sigma
                FROM h),
            smax AS (
                SELECT i, max(sigma) AS sigma_max FROM sg
                WHERE sigma IS NOT NULL GROUP BY i),
            tstar AS (
                SELECT sg.i, min(v) AS otsu_t,
                       CAST(min_by(numsq, v) AS BIGINT) AS sigma_num_sq,
                       CAST(min_by(den, v) AS BIGINT) AS sigma_den
                FROM sg JOIN smax
                  ON sg.i = smax.i AND sg.sigma = smax.sigma_max
                GROUP BY sg.i),
            eq AS (
                SELECT h.*, CAST(floor(CAST((c0 - cdf_min) * 765 AS DOUBLE)
                                 / CAST(n - cdf_min AS DOUBLE)) AS BIGINT)
                            AS eqv
                FROM h),
            stats AS (
                SELECT eq.i,
                       CAST(sum(CASE WHEN v > otsu_t THEN cnt ELSE 0 END)
                            AS BIGINT) AS fg_cnt,
                       CAST(sum(CASE WHEN v > otsu_t THEN v * cnt ELSE 0 END)
                            AS BIGINT) AS fg_sum,
                       CAST(sum(cnt * eqv) AS BIGINT) AS eq_checksum,
                       CAST(sum(cnt * v * eqv) AS BIGINT) AS eq_cross
                FROM eq JOIN tstar ON eq.i = tstar.i GROUP BY eq.i)
            SELECT printf('img%08d', t.i) AS image_id,
                   CAST(otsu_t AS BIGINT) AS otsu_t,
                   sigma_num_sq, sigma_den, fg_cnt, fg_sum,
                   eq_checksum, eq_cross
            FROM tstar t JOIN stats s ON t.i = s.i
        """,
        "snap_points_to_segments": f"""
            WITH p AS (
                SELECT event_id AS point_id, {_GLON} AS px, {_GLAT} AS py
                FROM events),
            s AS (
                SELECT event_id AS seg_id, {_SEG_AX} AS ax, {_SEG_AY} AS ay,
                       ({_SEG_AX}) + ({_SEG_DX}) AS bx,
                       ({_SEG_AY}) + ({_SEG_DY}) AS by
                FROM events WHERE event_id < 400),
            d AS (
                SELECT point_id, seg_id, px, py, ax, ay,
                       bx - ax AS dx, by - ay AS dy
                FROM p, s),
            l AS (
                SELECT *, dx * dx + dy * dy AS len2 FROM d),
            t AS (
                SELECT point_id, seg_id, px, py, ax, ay, dx, dy,
                       CASE WHEN len2 = 0.0 THEN 0.0
                            ELSE least(greatest(
                                ((px - ax) * dx + (py - ay) * dy) / len2,
                                0.0), 1.0) END AS tt
                FROM l),
            e AS (
                SELECT point_id, seg_id,
                       px - (ax + tt * dx) AS ex, py - (ay + tt * dy) AS ey
                FROM t),
            c AS (
                SELECT point_id, seg_id,
                       floor(sqrt(ex * ex + ey * ey) * 1e9 + 0.5 + 1e-8) / 1e9
                           AS dist
                FROM e),
            r AS (
                SELECT point_id, seg_id, dist,
                       row_number() OVER (
                           PARTITION BY point_id ORDER BY dist, seg_id
                       ) AS rn
                FROM c WHERE dist <= 0.25)
            SELECT point_id, seg_id, dist FROM r WHERE rn = 1
        """,
        "phash_near_dup": f"""
            WITH h AS (
                SELECT event_id AS image_id,
                       {_phash_expr(lambda a, b: f"xor({a}, {b})")} AS phash
                FROM events)
            SELECT a.image_id AS id_a, b.image_id AS id_b,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
            FROM h a JOIN h b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 2
        """,
        "grid_cell_density": f"""
            WITH pts AS (SELECT {_GLON} AS lon, {_GLAT} AS lat FROM events),
            b AS (
                SELECT CAST(floor(lon / 15.0) AS BIGINT) AS ix,
                       CAST(floor(lat / 15.0) AS BIGINT) AS iy,
                       count(*) AS n
                FROM pts GROUP BY 1, 2),
            k(dx, dy, w) AS (VALUES
                (-1,-1,1),(0,-1,2),(1,-1,1),
                (-1,0,2),(0,0,4),(1,0,2),
                (-1,1,1),(0,1,2),(1,1,1))
            SELECT b.ix + dx AS ix, b.iy + dy AS iy,
                   CAST(sum(CASE WHEN dx = 0 AND dy = 0 THEN n ELSE 0 END)
                        AS BIGINT) AS n_points,
                   round(CAST(sum(n * w) AS DOUBLE) / 16.0, 4) AS density
            FROM b, k GROUP BY 1, 2
        """,
        "polygon_overlap_join": f"""
            SELECT CAST(a.zone_id AS BIGINT) AS a_id,
                   CAST(b.zone_id AS BIGINT) AS b_id,
                   round(
                       (least(a.x1, b.x1) - greatest(a.x0, b.x0))
                       * (least(a.y1, b.y1) - greatest(a.y0, b.y0)), 6) AS overlap_area
            FROM (VALUES {_ZONES_SQL}) AS a(zone_id, x0, y0, x1, y1)
            CROSS JOIN (VALUES {_OVL_B_SQL}) AS b(zone_id, x0, y0, x1, y1)
            WHERE least(a.x1, b.x1) - greatest(a.x0, b.x0) > 0
              AND least(a.y1, b.y1) - greatest(a.y0, b.y0) > 0
        """,
        "chunk_text_windows": r"""
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                FROM documents),
            s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
            c AS (
                SELECT doc_id, toks, n,
                       CASE WHEN n <= 0 THEN 0
                            WHEN n <= 32 THEN 1
                            ELSE (n - 32 + 23) // 24 + 1 END AS nc
                FROM s),
            e AS (
                SELECT doc_id, toks, n, CAST(i AS INT) AS chunk_id
                FROM c, LATERAL (SELECT unnest(range(0, nc)) AS i) u)
            SELECT doc_id, chunk_id,
                   CAST(chunk_id * 24 AS INT) AS start_token,
                   CAST(least(32, n - chunk_id * 24) AS INT) AS n_chunk_tokens,
                   array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text
            FROM e
        """,
        "segment_zone_lengths": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events),
            seg AS (
                SELECT user_id,
                       lag(lon) OVER w AS plon, lag(lat) OVER w AS plat, lon, lat
                FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            mids AS (
                SELECT (plon + lon) / 2.0 AS mlon, (plat + lat) / 2.0 AS mlat,
                       2.0 * 6371.0088 * asin(sqrt(
                           sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
                           + cos(radians(plat)) * cos(radians(lat))
                             * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
                       )) AS seg_km
                FROM seg WHERE plon IS NOT NULL)
            SELECT z.zone_id, count(*) AS n_segments,
                   round(CAST(sum(seg_km) AS DOUBLE), 4) AS road_km
            FROM mids m JOIN (VALUES {_ZONES_SQL}) AS z(zone_id, x0, y0, x1, y1)
              ON m.mlon >= z.x0 AND m.mlon < z.x1 AND m.mlat >= z.y0 AND m.mlat < z.y1
            GROUP BY 1
        """,
        "ann_cosine_topk": """
            SELECT vec_id,
                   round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """,
        "zsplit_golden_vectors": _zsplit_oracle_sql(),
        "ring_chunking_golden": _ring_chunk_oracle_sql(),
        "langid_heuristic": _langid_oracle_sql(),
        "minhash_near_dup": _minhash_oracle_sql(),
        "near_dup_clusters": _near_dup_clusters_oracle_sql(),
        "stratified_sample": _stratified_sample_oracle_sql(),
        "weighted_sample_quality": _weighted_sample_oracle_sql(),
        "weighted_topk_sample": _weighted_topk_oracle_sql(),
        "pagerank_doc_quality": """
            WITH RECURSIVE ids AS (
                SELECT DISTINCT event_id % 400 AS i FROM events),
            edges AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT i AS src, (i * 7 + 1) % 400 AS dst FROM ids
                    UNION ALL SELECT i, (i * i + 3) % 400 FROM ids
                    UNION ALL SELECT i, (i + 1) % 400 FROM ids)),
            od AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
            pr(iter, node, rank) AS (
                SELECT 0, i, 2500000000 FROM ids
                UNION ALL
                SELECT s.iter, s.node,
                       (15 * 2500000000 + 85 * s.c) // 100
                FROM (
                    SELECT e.dst AS node, min(p.iter) + 1 AS iter,
                           sum(p.rank // od.deg) AS c
                    FROM pr p
                    JOIN od ON od.node = p.node
                    JOIN edges e ON e.src = p.node
                    WHERE p.iter < 8
                    GROUP BY e.dst) s)
            SELECT node, CAST(rank AS BIGINT) AS rank
            FROM pr WHERE iter = 8
        """,
        "bfs_hop_distances": """
            WITH RECURSIVE ids AS (
                SELECT DISTINCT event_id % 400 AS i FROM events),
            edges AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT i AS src, (i * 7 + 1) % 400 AS dst FROM ids
                    UNION ALL SELECT i, (i * i + 3) % 400 FROM ids
                    UNION ALL SELECT i, (i + 1) % 400 FROM ids)),
            bfs(node, dist, src) AS (
                SELECT i, 0, i FROM ids WHERE i % 100 = 0
                UNION
                SELECT e.dst, b.dist + 1, b.src
                FROM bfs b JOIN edges e ON e.src = b.node
                WHERE b.dist < 15),
            m AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY 1)
            SELECT b.node, CAST(m.dist AS INT) AS dist,
                   CAST(min(b.src) AS BIGINT) AS src
            FROM bfs b JOIN m ON b.node = m.node AND b.dist = m.dist
            GROUP BY 1, 2
        """,
        "sssp_weighted_costs": """
            WITH RECURSIVE ids AS (
                SELECT DISTINCT event_id % 400 AS i FROM events),
            edges AS (
                SELECT src, dst, (src * 3 + dst * 5) % 13 + 1 AS w FROM (
                    SELECT DISTINCT src, dst FROM (
                        SELECT i AS src, (i * 7 + 1) % 400 AS dst FROM ids
                        UNION ALL SELECT i, (i * i + 3) % 400 FROM ids
                        UNION ALL SELECT i, (i + 1) % 400 FROM ids))),
            -- measured bounds on this closed-form instance: optimal paths
            -- have <= 13 edges and cost <= 56; every prefix of an optimal
            -- path costs <= 56, so the pruned enumeration keeps them all
            paths(node, cost, src, hops) AS (
                SELECT i, 0, i, 0 FROM ids WHERE i % 100 = 0
                UNION
                SELECT e.dst, p.cost + e.w, p.src, p.hops + 1
                FROM paths p JOIN edges e ON e.src = p.node
                WHERE p.hops < 16 AND p.cost + e.w <= 56),
            m AS (SELECT node, min(cost) AS cost FROM paths GROUP BY 1)
            SELECT p.node, CAST(m.cost AS BIGINT) AS cost,
                   CAST(min(p.src) AS BIGINT) AS src
            FROM paths p JOIN m ON p.node = m.node AND p.cost = m.cost
            GROUP BY 1, 2
        """,
        "lm_perplexity_scores": """
            WITH toks AS (
                SELECT doc_id, t.term, t.pos
                FROM documents,
                LATERAL (
                    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term,
                           generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS pos
                ) t
                WHERE t.term <> ''),
            bg AS (
                SELECT doc_id, w1, w2 FROM (
                    SELECT doc_id, term AS w1,
                           lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
                    FROM toks)
                WHERE w2 IS NOT NULL),
            cbg AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
            cctx AS (SELECT w1, count(*) AS cctx FROM bg GROUP BY 1),
            v AS (SELECT count(DISTINCT t) AS v FROM (
                SELECT w1 AS t FROM bg UNION ALL SELECT w2 FROM bg)),
            stats AS (
                SELECT w1, w2,
                       CAST(floor(-ln((cbg + 1.0) / (cctx + CAST(v AS DOUBLE)))
                                  * 1e6 + 0.5 + 1e-8) AS BIGINT) AS nm
                FROM cbg JOIN cctx USING (w1) CROSS JOIN v),
            scored AS (
                SELECT doc_id, count(*) AS n_bigrams,
                       CAST(sum(nm) AS BIGINT) AS nll_micro
                FROM bg JOIN stats USING (w1, w2) GROUP BY 1)
            SELECT doc_id, n_bigrams, nll_micro,
                   round(CAST(nll_micro AS DOUBLE)
                         / (CAST(n_bigrams AS DOUBLE) * 1e6), 6) AS avg_nll,
                   nll_micro > 7000000 * n_bigrams AS high_perplexity
            FROM scored
        """,
        "k_core_membership": _kcore_oracle_sql(),
        "triangle_counts": """
            WITH ids AS (
                SELECT DISTINCT event_id % 400 AS i FROM events),
            und AS (
                SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM (
                    SELECT i AS src, (i * 7 + 1) % 400 AS dst FROM ids
                    UNION ALL SELECT i, (i * i + 3) % 400 FROM ids
                    UNION ALL SELECT i, (i + 1) % 400 FROM ids
                    UNION ALL SELECT i, (i + 2) % 400 FROM ids)
                WHERE src <> dst),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
            SELECT node, count(*) AS n_triangles FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
            GROUP BY node
        """,
        "tile_pyramid_levels": _tile_pyramid_oracle_sql(),
        "ring_areas_shoelace": f"""
            WITH pts AS (
                SELECT user_id, ts, event_id, {_GLON} AS lon, {_GLAT} AS lat FROM events
            ), staged AS (
                SELECT user_id,
                       lon * lead(lat) OVER w - lead(lon) OVER w * lat AS cr,
                       first_value(lon) OVER wf AS fx, first_value(lat) OVER wf AS fy,
                       last_value(lon) OVER wf AS lx, last_value(lat) OVER wf AS ly
                FROM pts
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                       wf AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            )
            SELECT user_id, count(*) AS n_points,
                   round(abs(sum(cr) + any_value(lx) * any_value(fy)
                             - any_value(fx) * any_value(ly)) / 2.0, 4) AS ring_area
            FROM staged GROUP BY user_id
        """,
        "pii_redaction": r"""
            WITH salted AS (
                SELECT doc_id,
                       substr(text, 1, 50) || ' contact user' ||
                       CAST(doc_id AS VARCHAR) || '@example.com or +1 (415) 555-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
                FROM documents
            )
            SELECT doc_id,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                       '\+?[0-9][0-9()\-\. ]{7,}[0-9]', '<PHONE>', 'g')
                   ) AS redacted_md5,
                   len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                   len(regexp_extract_all(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
                   len(regexp_extract_all(
                       regexp_replace(regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                       '\+?[0-9][0-9()\-\. ]{7,}[0-9]')) AS n_phone
            FROM salted
        """,
        "pack_sequences": """
            WITH RECURSIVE seq AS (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
                FROM documents
            ), packs AS (
                SELECT lang, rn, n_chars, n_chars AS fill, CAST(0 AS BIGINT) AS pack_id
                FROM seq WHERE rn = 1
                UNION ALL
                SELECT s.lang, s.rn, s.n_chars,
                       CASE WHEN p.fill + s.n_chars > 2000 THEN s.n_chars
                            ELSE p.fill + s.n_chars END,
                       CASE WHEN p.fill + s.n_chars > 2000 THEN p.pack_id + 1
                            ELSE p.pack_id END
                FROM packs p JOIN seq s ON s.lang = p.lang AND s.rn = p.rn + 1
            )
            SELECT lang, pack_id, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS pack_chars
            FROM packs GROUP BY lang, pack_id
        """,
        "dedup_representatives": f"""
            SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
            WHERE doc_id NOT IN (
                SELECT doc_id FROM ({_near_dup_clusters_oracle_sql()})
                WHERE doc_id <> cluster_id)
            GROUP BY lang
        """,
        "simhash_near_dup": _simhash_oracle_sql(),
        "doc_fingerprint": _fingerprint_oracle_sql(),
        "audio_features": _audio_oracle_sql(),
        "audio_frames": _audio_frames_oracle_sql(),
        "audio_silence_segments": _silence_oracle_sql(),
        "jpeg_constant_roundtrip": _jpeg_roundtrip_oracle_sql(),
        # the progressive stream decodes to the identical closed form —
        # shared oracle (like ann_ivf_indexed_topk shares ann_ivf_topk's)
        "jpeg_progressive_roundtrip": _jpeg_roundtrip_oracle_sql(),
        "streaming_dedup_exact": """
            WITH src AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id % 7 = 0
            )
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS doc_id,
                   count(*) - 1 AS n_dropped
            FROM src GROUP BY 1
        """,
        "repetition_ratios": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                 x -> x <> '') AS ws,
                     str_split(text, chr(10)) AS ls
              FROM documents
            ),
            lines AS (
              SELECT doc_id, len(ls) AS nl, len(list_distinct(ls)) AS dl FROM w
            ),
            g2 AS (
              SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t
              WHERE len(ws) >= 2
            ),
            g3 AS (
              SELECT doc_id,
                     ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]
                       || ' ' || ws[CAST(i AS INT) + 2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t
              WHERE len(ws) >= 3
            ),
            s2 AS (
              SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_2gram_frac
              FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
              GROUP BY doc_id
            ),
            s3 AS (
              SELECT doc_id,
                     CAST(1 AS DOUBLE) - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_3gram_frac
              FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
              GROUP BY doc_id
            )
            SELECT l.doc_id,
                   round(CAST(1 AS DOUBLE) - CAST(dl AS DOUBLE) / CAST(greatest(nl, 1) AS DOUBLE), 9) AS dup_line_frac,
                   round(coalesce(s3.dup_3gram_frac, 0.0), 9) AS dup_3gram_frac,
                   round(coalesce(s2.top_2gram_frac, 0.0), 9) AS top_2gram_frac
            FROM lines l
            LEFT JOIN s2 ON l.doc_id = s2.doc_id
            LEFT JOIN s3 ON l.doc_id = s3.doc_id
        """,
        "zonal_image_stats": _zonal_oracle_sql(),
        "flagship_images": _flagship_images_oracle_sql(),
        "ann_lsh_topk": _ann_lsh_oracle_sql(),
        "ann_ivf_topk": _ann_ivf_oracle_sql(),
        "ann_ivf_indexed_topk": _ann_ivf_oracle_sql(),
        "shapefile_ingest": _shapefile_oracle_sql(),
        "embedding_near_dup_lsh": _embedding_lsh_oracle_sql(),
        # invariant gates: the closed-form expected output is the EMPTY set
        # (codec PSNR/caption/phash invariants, WKB round-trip identity,
        # ANN recall floors) — the oracle states that expectation with the
        # matching schema
        "ann_recall_gates": """
            SELECT CAST(NULL AS VARCHAR) AS method,
                   CAST(NULL AS BIGINT) AS query_id,
                   CAST(NULL AS DOUBLE) AS recall
            WHERE FALSE
        """,
        "payload_fidelity_violations": """
            SELECT CAST(NULL AS VARCHAR) AS image_id,
                   CAST(NULL AS BOOLEAN) AS psnr_ok,
                   CAST(NULL AS BOOLEAN) AS caption_ok,
                   CAST(NULL AS BOOLEAN) AS phash_ok
            WHERE FALSE
        """,
        "wkb_roundtrip_violations": """
            SELECT CAST(NULL AS BIGINT) AS zone_id WHERE FALSE
        """,
        # Expected street_ways output in closed form: segments per z-shape
        # (hand-derived from navteq.hpp:347-469, cross-checked against the 44
        # golden vectors) + the tag decision trees (tag_parser:21-221).
        "street_ways_oracle": """
            WITH links AS (
              SELECT o_orderkey AS link_id,
                     o_orderkey % 4 AS shape,
                     CAST(o_orderkey % 5 + 1 AS INT) AS z,
                     (o_orderkey % 17 < 2) AS is_ferry,
                     concat('Road ', CAST(o_orderkey % 10 AS STRING)) AS name,
                     CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey % 6 + 1 END AS route,
                     o_orderkey % 5 + 1 AS func,
                     (o_orderkey % 2 = 0) AS urban,
                     CASE WHEN o_orderkey % 7 < 2 THEN 'F' WHEN o_orderkey % 7 < 4 THEN 'T' ELSE 'B' END AS dir,
                     CASE o_orderkey % 11 WHEN 0 THEN 0 WHEN 1 THEN 998 WHEN 2 THEN 999
                          WHEN 3 THEN 30 WHEN 4 THEN 50 WHEN 5 THEN 80 WHEN 6 THEN 100
                          WHEN 7 THEN 130 WHEN 8 THEN 50 WHEN 9 THEN 60 ELSE 70 END AS fr_i,
                     CASE WHEN o_orderkey % 13 = 0 THEN 0 WHEN o_orderkey % 13 = 1 THEN 998
                          WHEN o_orderkey % 13 = 2 THEN 999 WHEN o_orderkey % 13 = 3 THEN 30
                          WHEN o_orderkey % 13 = 4 THEN 50 WHEN o_orderkey % 13 = 5 THEN 100
                          ELSE (o_orderkey % 13) * 10 END AS to_i,
                     o_orderkey % 8 + 1 AS sc,
                     (o_orderkey % 2 = 1) AS paved,
                     (o_orderkey % 67 = 0) AS tollway
              FROM orders WHERE o_orderkey < 8000),
            segs AS (
              SELECT link_id, 0 AS seg_seq, 0 AS from_idx, 5 AS to_idx, CAST(NULL AS INT) AS zl
                FROM links WHERE is_ferry OR shape = 0
              UNION ALL SELECT link_id, 0, 0, 3, z FROM links WHERE NOT is_ferry AND shape = 1
              UNION ALL SELECT link_id, 1, 3, 5, 0 FROM links WHERE NOT is_ferry AND shape = 1
              UNION ALL SELECT link_id, 0, 0, 2, z FROM links WHERE NOT is_ferry AND shape = 2
              UNION ALL SELECT link_id, 1, 2, 3, 0 FROM links WHERE NOT is_ferry AND shape = 2
              UNION ALL SELECT link_id, 2, 3, 5, z FROM links WHERE NOT is_ferry AND shape = 2
              UNION ALL SELECT link_id, 0, 0, 1, 0 FROM links WHERE NOT is_ferry AND shape = 3
              UNION ALL SELECT link_id, 1, 1, 4, z FROM links WHERE NOT is_ferry AND shape = 3
              UNION ALL SELECT link_id, 2, 4, 5, 0 FROM links WHERE NOT is_ferry AND shape = 3)
            SELECT CAST(row_number() OVER (ORDER BY s.link_id, s.seg_seq) AS BIGINT) AS way_id,
                   s.link_id,
                   CAST(s.seg_seq AS INT) AS seg_seq,
                   CAST(s.from_idx AS INT) AS from_idx,
                   CAST(s.to_idx AS INT) AS to_idx,
                   CASE WHEN s.zl IS NOT NULL AND s.zl <> 0 THEN CAST(s.zl AS STRING) END AS layer,
                   l.name,
                   CASE WHEN l.is_ferry THEN NULL
                        WHEN l.route IS NULL THEN
                          CASE WHEN l.func >= 4 THEN (CASE WHEN l.urban THEN 'residential' ELSE 'tertiary' END)
                               WHEN l.func >= 2 THEN 'secondary'
                               WHEN l.func = 1 THEN 'primary' END
                        WHEN l.route IN (1, 2) THEN 'motorway'
                        WHEN l.route = 3 THEN 'primary'
                        WHEN l.route = 4 THEN 'secondary'
                        WHEN l.route = 5 THEN 'tertiary'
                        WHEN l.route = 6 THEN 'unclassified' END AS highway,
                   CASE WHEN l.is_ferry THEN NULL
                        WHEN l.dir = 'F' THEN 'yes' WHEN l.dir = 'T' THEN '-1' END AS oneway,
                   CASE WHEN l.is_ferry THEN NULL
                        WHEN l.fr_i = 998 OR l.to_i = 998 THEN NULL
                        WHEN l.fr_i <> 0 AND l.to_i <> 0 AND l.fr_i = l.to_i
                          THEN (CASE WHEN l.fr_i = 999 THEN 'none' ELSE CAST(l.fr_i AS STRING) END)
                        WHEN l.fr_i <> 0 AND l.to_i = 0
                          THEN (CASE WHEN l.fr_i = 999 THEN 'none' ELSE CAST(l.fr_i AS STRING) END)
                        WHEN l.fr_i = 0 AND l.to_i <> 0
                          THEN (CASE WHEN l.to_i = 999 THEN 'none' ELSE CAST(l.to_i AS STRING) END)
                        END AS maxspeed,
                   CASE l.sc WHEN 1 THEN '>130' WHEN 2 THEN '101-130' WHEN 3 THEN '91-100'
                        WHEN 4 THEN '71-90' WHEN 5 THEN '51-70' WHEN 6 THEN '31-50'
                        WHEN 7 THEN '11-30' ELSE '<11' END AS here_speed_cat,
                   CASE WHEN NOT l.is_ferry AND l.paved THEN 'paved' END AS surface,
                   CASE WHEN NOT l.is_ferry AND l.tollway THEN 'yes' END AS toll
            FROM segs s JOIN links l USING (link_id)
        """,
        # Surviving turn-restriction relations in closed form: 3-link conds
        # (lid%10=2, in-row, complete) minus the COND_TYPE≠7 skips
        # (lid%20=2); 2-link conds (lid%10=7) additionally carry the J9
        # shared-endpoint via NODE member.
        "turn_restrictions_oracle": f"""
            WITH links AS (
              SELECT row_number() OVER (ORDER BY o_orderkey) AS lid
              FROM orders WHERE {_LINKS_FILTER}),
            bound AS (SELECT count(*) AS n FROM links),
            cands AS (
              SELECT 5000 + lid AS cond_id, 3 AS n_members, FALSE AS has_via_node
              FROM links, bound
              WHERE lid % 10 = 2 AND lid % 50 <= 47 AND lid + 2 <= n
                AND lid % 20 <> 2
              UNION ALL
              SELECT 5000 + lid, 3, TRUE FROM links, bound
              WHERE lid % 10 = 7 AND lid % 50 <= 48 AND lid + 1 <= n)
            SELECT CAST(row_number() OVER (ORDER BY cond_id) AS BIGINT) AS relation_id,
                   CAST(cond_id AS BIGINT) AS cond_id,
                   CAST(n_members AS INT) AS n_members,
                   has_via_node,
                   'no_straight_on' AS restriction,
                   'restriction' AS type
            FROM cands
        """,
        # G8 gating + structure in closed form (geometry is a collinear
        # 6-vertex line, so the offset curve has exactly 6 nodes).
        "house_numbers_oracle": """
            WITH links AS (
              SELECT o_orderkey AS link_id FROM orders
              WHERE o_orderkey < 8000 AND o_orderkey % 3 = 0),
            sides AS (
              SELECT link_id, 'L' AS side,
                     CASE WHEN link_id % 4 = 0 THEN 'even' ELSE 'odd' END AS addr_interpolation,
                     CAST(2 + link_id % 7 AS STRING) AS ref_housenumber,
                     CAST(40 + link_id % 9 AS STRING) AS nref_housenumber
              FROM links
              WHERE link_id % 5 <> 0 AND link_id % 4 IN (0, 1)
              UNION ALL
              SELECT link_id, 'R',
                     CASE WHEN link_id % 5 = 0 THEN 'odd' ELSE 'even' END,
                     CAST(1 + link_id % 6 AS STRING),
                     CAST(41 + link_id % 8 AS STRING)
              FROM links
              WHERE link_id % 7 <> 0 AND link_id % 5 IN (0, 1))
            SELECT link_id, side, addr_interpolation, ref_housenumber,
                   nref_housenumber, CAST(6 AS INT) AS n_nodes
            FROM sides
        """,
        # street_conversion (r5): the street_ways_oracle segment/tag replay
        # PLUS the J2-J4 restriction chain — closed-form conds/mods, per-type
        # MIN over positive MOD_VALs, any-imperial-wins L/R areas (areas 1
        # and 4 map to GOVT 101 = UNTMEASURE 'E' in the literal MtdArea/
        # MtdCntryRef fixtures), and the two format families: %.6g metric
        # (× 1e-2 len / × 1e-3 kg→t / × 0.90718474/2000 lbs→t — the exact
        # multiplies the Arrow UDFs perform) and feet'inches".
        "street_conversion": """
            WITH links AS (
              SELECT o_orderkey AS link_id,
                     o_orderkey % 4 AS shape,
                     CAST(o_orderkey % 5 + 1 AS INT) AS z,
                     (o_orderkey % 17 < 2) AS is_ferry,
                     concat('Road ', CAST(o_orderkey % 10 AS STRING)) AS name,
                     CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderkey % 6 + 1 END AS route,
                     o_orderkey % 5 + 1 AS func,
                     (o_orderkey % 2 = 0) AS urban,
                     CASE WHEN o_orderkey % 7 < 2 THEN 'F' WHEN o_orderkey % 7 < 4 THEN 'T' ELSE 'B' END AS dir,
                     CASE o_orderkey % 11 WHEN 0 THEN 0 WHEN 1 THEN 998 WHEN 2 THEN 999
                          WHEN 3 THEN 30 WHEN 4 THEN 50 WHEN 5 THEN 80 WHEN 6 THEN 100
                          WHEN 7 THEN 130 WHEN 8 THEN 50 WHEN 9 THEN 60 ELSE 70 END AS fr_i,
                     CASE WHEN o_orderkey % 13 = 0 THEN 0 WHEN o_orderkey % 13 = 1 THEN 998
                          WHEN o_orderkey % 13 = 2 THEN 999 WHEN o_orderkey % 13 = 3 THEN 30
                          WHEN o_orderkey % 13 = 4 THEN 50 WHEN o_orderkey % 13 = 5 THEN 100
                          ELSE (o_orderkey % 13) * 10 END AS to_i
              FROM orders WHERE o_orderkey < 8000),
            segs AS (
              SELECT link_id, 0 AS seg_seq, 0 AS from_idx, 5 AS to_idx, CAST(NULL AS INT) AS zl
                FROM links WHERE is_ferry OR shape = 0
              UNION ALL SELECT link_id, 0, 0, 3, z FROM links WHERE NOT is_ferry AND shape = 1
              UNION ALL SELECT link_id, 1, 3, 5, 0 FROM links WHERE NOT is_ferry AND shape = 1
              UNION ALL SELECT link_id, 0, 0, 2, z FROM links WHERE NOT is_ferry AND shape = 2
              UNION ALL SELECT link_id, 1, 2, 3, 0 FROM links WHERE NOT is_ferry AND shape = 2
              UNION ALL SELECT link_id, 2, 3, 5, z FROM links WHERE NOT is_ferry AND shape = 2
              UNION ALL SELECT link_id, 0, 0, 1, 0 FROM links WHERE NOT is_ferry AND shape = 3
              UNION ALL SELECT link_id, 1, 1, 4, z FROM links WHERE NOT is_ferry AND shape = 3
              UNION ALL SELECT link_id, 2, 4, 5, 0 FROM links WHERE NOT is_ferry AND shape = 3),
            mods AS (
              SELECT link_id, 41 + link_id % 5 AS mt,
                     CASE WHEN link_id % 13 = 0 THEN 0 ELSE 100 + link_id % 4000 END AS mv
              FROM links WHERE link_id % 3 = 1 AND link_id % 11 <> 0
              UNION ALL
              SELECT link_id, 41 + link_id % 2, 50 + link_id % 3000
              FROM links WHERE link_id % 6 = 1),
            mins AS (
              SELECT link_id,
                     min(CASE WHEN mt = 41 AND mv > 0 THEN mv END) AS r41,
                     min(CASE WHEN mt = 42 AND mv > 0 THEN mv END) AS r42,
                     min(CASE WHEN mt = 43 AND mv > 0 THEN mv END) AS r43,
                     min(CASE WHEN mt = 44 AND mv > 0 THEN mv END) AS r44,
                     min(CASE WHEN mt = 45 AND mv > 0 THEN mv END) AS r45
              FROM mods GROUP BY link_id),
            imp AS (
              SELECT link_id,
                     ((link_id % 7) IN (1, 4) OR (link_id % 5 + 1) IN (1, 4)) AS imperial
              FROM links)
            SELECT CAST(row_number() OVER (ORDER BY s.link_id, s.seg_seq) AS BIGINT) AS way_id,
                   s.link_id,
                   CAST(s.seg_seq AS INT) AS seg_seq,
                   CASE WHEN s.zl IS NOT NULL AND s.zl <> 0 THEN CAST(s.zl AS STRING) END AS layer,
                   CASE WHEN l.is_ferry THEN NULL
                        WHEN l.route IS NULL THEN
                          CASE WHEN l.func >= 4 THEN (CASE WHEN l.urban THEN 'residential' ELSE 'tertiary' END)
                               WHEN l.func >= 2 THEN 'secondary'
                               WHEN l.func = 1 THEN 'primary' END
                        WHEN l.route IN (1, 2) THEN 'motorway'
                        WHEN l.route = 3 THEN 'primary'
                        WHEN l.route = 4 THEN 'secondary'
                        WHEN l.route = 5 THEN 'tertiary'
                        WHEN l.route = 6 THEN 'unclassified' END AS highway,
                   l.name,
                   CASE WHEN l.is_ferry THEN NULL
                        WHEN l.fr_i = 998 OR l.to_i = 998 THEN NULL
                        WHEN l.fr_i <> 0 AND l.to_i <> 0 AND l.fr_i = l.to_i
                          THEN (CASE WHEN l.fr_i = 999 THEN 'none' ELSE CAST(l.fr_i AS STRING) END)
                        WHEN l.fr_i <> 0 AND l.to_i = 0
                          THEN (CASE WHEN l.fr_i = 999 THEN 'none' ELSE CAST(l.fr_i AS STRING) END)
                        WHEN l.fr_i = 0 AND l.to_i <> 0
                          THEN (CASE WHEN l.to_i = 999 THEN 'none' ELSE CAST(l.to_i AS STRING) END)
                        END AS maxspeed,
                   CASE WHEN m.r41 IS NULL THEN NULL
                        WHEN i.imperial THEN concat(CAST(m.r41 // 12 AS VARCHAR), '''', CAST(m.r41 % 12 AS VARCHAR), '"')
                        ELSE printf('%.6g', CAST(m.r41 AS DOUBLE) * 1e-2) END AS maxheight,
                   CASE WHEN m.r45 IS NULL THEN NULL
                        WHEN i.imperial THEN concat(CAST(m.r45 // 12 AS VARCHAR), '''', CAST(m.r45 % 12 AS VARCHAR), '"')
                        ELSE printf('%.6g', CAST(m.r45 AS DOUBLE) * 1e-2) END AS maxwidth,
                   CASE WHEN m.r44 IS NULL THEN NULL
                        WHEN i.imperial THEN concat(CAST(m.r44 // 12 AS VARCHAR), '''', CAST(m.r44 % 12 AS VARCHAR), '"')
                        ELSE printf('%.6g', CAST(m.r44 AS DOUBLE) * 1e-2) END AS maxlength,
                   CASE WHEN m.r42 IS NULL THEN NULL
                        WHEN i.imperial THEN printf('%.6g', CAST(m.r42 AS DOUBLE) * (0.90718474 / 2000.0))
                        ELSE printf('%.6g', CAST(m.r42 AS DOUBLE) * 1e-3) END AS maxweight,
                   CASE WHEN m.r43 IS NULL THEN NULL
                        WHEN i.imperial THEN printf('%.6g', CAST(m.r43 AS DOUBLE) * (0.90718474 / 2000.0))
                        ELSE printf('%.6g', CAST(m.r43 AS DOUBLE) * 1e-3) END AS maxaxleload
            FROM segs s JOIN links l USING (link_id)
            LEFT JOIN mins m USING (link_id)
            LEFT JOIN imp i USING (link_id)
        """,
        # turn_restrictions (r5, nodes-free variant): same survivors as the
        # oracle twin, but the 2-link conds' via NODE is unresolvable →
        # ways-only members (n_members = 2).
        "turn_restrictions": f"""
            WITH links AS (
              SELECT row_number() OVER (ORDER BY o_orderkey) AS lid
              FROM orders WHERE {_LINKS_FILTER}),
            bound AS (SELECT count(*) AS n FROM links),
            cands AS (
              SELECT 5000 + lid AS cond_id, 3 AS n_members
              FROM links, bound
              WHERE lid % 10 = 2 AND lid % 50 <= 47 AND lid + 2 <= n
                AND lid % 20 <> 2
              UNION ALL
              SELECT 5000 + lid, 2 FROM links, bound
              WHERE lid % 10 = 7 AND lid % 50 <= 48 AND lid + 1 <= n)
            SELECT CAST(row_number() OVER (ORDER BY cond_id) AS BIGINT) AS relation_id,
                   CAST(cond_id AS BIGINT) AS cond_id,
                   CAST(n_members AS INT) AS n_members,
                   'no_straight_on' AS restriction,
                   'restriction' AS type
            FROM cands
        """,
        # admin_boundaries (r5): golden VALUES over the literal fixtures —
        # areas 1-5 with MtdArea levels (1,3,5,2,7) → admin_level 2×level;
        # every ring is < 1000 nodes → one chunk; only area 5's second rect
        # is containment-inside its first → the single inner ring.
        "admin_boundaries": """
            SELECT CAST(relation_id AS BIGINT) AS relation_id,
                   CAST(area_id AS BIGINT) AS area_id,
                   CAST(admin_level AS VARCHAR) AS admin_level,
                   CAST(n_outer AS INT) AS n_outer,
                   CAST(n_inner AS INT) AS n_inner
            FROM (VALUES (1, 1, '2', 1, 0), (2, 2, '6', 1, 0),
                         (3, 3, '10', 1, 0), (4, 4, '4', 1, 0),
                         (5, 5, '14', 1, 1))
              AS t(relation_id, area_id, admin_level, n_outer, n_inner)
        """,
        # Expected relations: chunk count = 1 + (n_nodes - 1) // 999
        # (navteq.hpp:675-692 do-while), admin_level = 2 × navteq level.
        "admin_relations_oracle": """
            SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS relation_id,
                   CAST(n_nationkey + 1 AS BIGINT) AS area_id,
                   CAST(2 * (n_nationkey % 7 + 1) AS STRING) AS admin_level,
                   CAST(1 + (CASE n_nationkey % 4 WHEN 0 THEN 5 WHEN 1 THEN 999
                             WHEN 2 THEN 1000 ELSE 1001 END - 1) // 999 AS INT) AS n_outer,
                   CAST(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END AS INT) AS n_inner
            FROM nation
        """,
    }
    # the assignment rollup must equal the leaf table LEAF-FOR-LEAF —
    # same oracle text proves join path ≡ aggregate path
    d["adaptive_assign_rollup"] = d["adaptive_quadtree_cells"]
    return d
