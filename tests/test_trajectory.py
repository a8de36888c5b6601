"""Stay-point detection (geo/trajectory.py) + grid density (geo/density.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from morituri_spark.geo.density import cell_density
from morituri_spark.geo.trajectory import stay_points


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _rows():
    # user 1: dwell A (3 pts, 10 min), jump, dwell B (2 pts, 6 min),
    # then a time-gap break inside a spatially tight pair
    return [
        (1, _t(0), 10.0, 50.0),
        (1, _t(5), 10.001, 50.001),
        (1, _t(10), 10.002, 50.0),
        (1, _t(15), 20.0, 10.0),       # spatial break, singleton
        (1, _t(20), 30.0, -20.0),      # spatial break
        (1, _t(26), 30.001, -20.001),  # dwell B closes (6 min)
        (1, _t(50), 30.002, -20.0),    # 24-min gap > max_gap -> break
        # user 2: tight pair but below min_duration
        (2, _t(0), 0.0, 0.0),
        (2, _t(1), 0.0005, 0.0005),
    ]


def test_stay_points_breaks_and_gates(spark):
    df = spark.createDataFrame(
        _rows(), "user_id int, ts timestamp, lon double, lat double"
    )
    got = stay_points(
        df, "user_id", "ts", ["ts"], radius_km=2.0,
        max_gap_s=20 * 60, min_duration_s=5 * 60, min_points=2,
    ).collect()
    by_key = {(r.user_id, r.stay_id): r for r in got}
    assert set(by_key) == {(1, 1), (1, 3)}
    a = by_key[(1, 1)]
    assert a.n_points == 3 and a.duration_s == 600
    assert a.c_lon == pytest.approx(10.001) and a.c_lat == pytest.approx(50.000333)
    b = by_key[(1, 3)]
    assert b.n_points == 2 and b.duration_s == 360


def test_stay_points_gap_boundary_is_strict(spark):
    # exactly-max_gap does NOT break (strict >)
    rows = [(1, _t(0), 5.0, 5.0), (1, _t(10), 5.0001, 5.0001)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, lon double, lat double"
    )
    keep = stay_points(
        df, "user_id", "ts", ["ts"], radius_km=1.0,
        max_gap_s=600, min_duration_s=0, min_points=2,
    ).collect()
    assert len(keep) == 1 and keep[0].n_points == 2
    brk = stay_points(
        df, "user_id", "ts", ["ts"], radius_km=1.0,
        max_gap_s=599, min_duration_s=0, min_points=2,
    ).collect()
    assert brk == []


def test_stay_points_single_exchange(spark):
    df = spark.createDataFrame(
        _rows(), "user_id int, ts timestamp, lon double, lat double"
    )
    plan = stay_points(df, "user_id", "ts", ["ts"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_cell_density_kernel_and_halo(spark):
    # 16 points in one cell: center density 16*4/16=4, edges 2, corners 1
    pts = spark.range(16).select(
        F.lit(10.5).alias("lon"), F.lit(20.5).alias("lat")
    )
    got = {(r.ix, r.iy): r for r in cell_density(pts, cell_deg=1.0).collect()}
    assert len(got) == 9
    assert got[(10, 20)].n_points == 16 and got[(10, 20)].density == 4.0
    assert got[(11, 20)].n_points == 0 and got[(11, 20)].density == 2.0
    assert got[(11, 21)].density == 1.0
    assert sum(r.density for r in got.values()) == pytest.approx(16.0)


def test_cell_density_boundary_and_unsmoothed(spark):
    # exact negative boundary: -15/15 = -1 -> ix=-1 (floor of exact int)
    pts = spark.createDataFrame(
        [(-15.0, 0.0), (-14.999, 0.5)], "lon double, lat double"
    )
    raw = {(r.ix, r.iy): r.n_points
           for r in cell_density(pts, cell_deg=15.0, smooth=False).collect()}
    assert raw == {(-1, 0): 2}


def test_resample_track_linear_interp(spark):
    from morituri_spark.geo.trajectory import resample_track

    # user 1: fixes at 0s (0,0), 1000s (10,20), 2500s (10,5); T=900
    rows = [
        (1, _t(0, 0), 0.0, 0.0),
        (1, dt.datetime(2024, 1, 1, 0, 16, 40), 10.0, 20.0),   # +1000s
        (1, dt.datetime(2024, 1, 1, 0, 41, 40), 10.0, 5.0),    # +2500s
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, lon double, lat double")
    got = {r["k"]: (r["x"], r["y"]) for r in
           resample_track(df, "user_id", "ts", ["ts"], interval_s=900).collect()}

    def r6(v):
        import math
        return math.floor(v * 1e6 + 0.5 + 1e-8) / 1e6

    # k=0 first fix; k=1 at 900s in seg (0,1000]; k=2 at 1800s in (1000,2500]
    f1 = 900.0 / 1000.0
    f2 = (1800.0 - 1000.0) / 1500.0
    assert got == {
        0: (0.0, 0.0),
        1: (r6(0.0 + 10.0 * f1), r6(0.0 + 20.0 * f1)),
        2: (r6(10.0), r6(20.0 + (5.0 - 20.0) * f2)),
    }


def test_resample_grid_point_on_fix_emitted_once(spark):
    from morituri_spark.geo.trajectory import resample_track

    # second fix exactly at T=900: belongs to segment (0, 900], f=1
    rows = [
        (1, _t(0, 0), 0.0, 0.0),
        (1, _t(15, 0), 3.0, 4.0),     # +900s
        (1, _t(30, 0), 6.0, 8.0),     # +1800s
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, lon double, lat double")
    out = resample_track(df, "user_id", "ts", ["ts"], interval_s=900).collect()
    ks = sorted(r["k"] for r in out)
    assert ks == [0, 1, 2]
    got = {r["k"]: (r["x"], r["y"]) for r in out}
    assert got[1] == (3.0, 4.0) and got[2] == (6.0, 8.0)


def test_resample_dense_trace_collapses(spark):
    from morituri_spark.geo.trajectory import resample_track

    # 1 Hz fixes for 30 min → exactly 3 output rows at T=900 (k=0,1,2)
    rows = [
        (7, dt.datetime(2024, 1, 1, 0, 0, s // 60, 0) if False else
            dt.datetime(2024, 1, 1, 0, s // 60, s % 60), float(s), float(-s))
        for s in range(0, 1801, 1)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, lon double, lat double")
    out = resample_track(df, "user_id", "ts", ["ts"], interval_s=900).collect()
    assert sorted(r["k"] for r in out) == [0, 1, 2]
    got = {r["k"]: (r["x"], r["y"]) for r in out}
    assert got[1] == (900.0, -900.0) and got[2] == (1800.0, -1800.0)


def test_resample_single_fix_and_plan(spark):
    from morituri_spark.geo.trajectory import resample_track

    # single-fix user still yields its k=0 anchor row
    rows = [(9, _t(0, 0), 2.5, -3.5)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, lon double, lat double")
    out = resample_track(df, "user_id", "ts", ["ts"], interval_s=900).collect()
    assert [(r["k"], r["x"], r["y"]) for r in out] == [(0, 2.5, -3.5)]

    # one-pass plan: exactly one Exchange (rule 21 — no union recompute)
    plan = resample_track(df, "user_id", "ts", ["ts"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_od_matrix_counts_and_unassigned(spark):
    from morituri_spark.geo.trajectory import od_matrix

    # zones: two unit squares side by side
    zones = spark.createDataFrame(
        [
            (0, [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]),
            (1, [[[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 0.0]]]),
        ],
        "zone_id long, rings array<array<array<double>>>",
    )
    rows = [
        # user 0: zone0 -> zone1 (order by seq, shuffled input order)
        (0, 2, 1.5, 0.5), (0, 0, 0.2, 0.2), (0, 1, 0.9, 0.9),
        # user 1: stays in zone0
        (1, 0, 0.1, 0.1), (1, 1, 0.3, 0.3),
        # user 2: zone0 -> zone1 (another one)
        (2, 0, 0.5, 0.5), (2, 1, 1.9, 0.1),
        # user 3: starts outside all zones -> zone1
        (3, 0, 5.0, 5.0), (3, 1, 1.1, 0.5),
        # user 4: single point in zone1 (o == d)
        (4, 0, 1.2, 0.8),
    ]
    df = spark.createDataFrame(rows, "uid long, seq long, lon double, lat double")
    got = {
        (r.zone_o, r.zone_d): r.n_trips
        for r in od_matrix(df, zones, "uid", ["seq"]).collect()
    }
    assert got == {(0, 1): 2, (0, 0): 1, (-1, 1): 1, (1, 1): 1}


def test_position_at_interpolation_clamp_and_ties(spark):
    import datetime as dt
    from morituri_spark.geo.trajectory import position_at

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    fixes = spark.createDataFrame(
        [
            (0, at(0), 10.0, 50.0),
            (0, at(100), 11.0, 51.0),
            (0, at(200), 13.0, 50.0),
            (1, at(0), -5.0, -5.0),  # single-fix trace
        ],
        "uid long, ts timestamp, lon double, lat double",
    )
    qs = spark.createDataFrame(
        [
            (0, at(50)),    # mid first segment
            (0, at(100)),   # exactly on a fix
            (0, at(150)),   # mid second segment
            (0, at(-10)),   # before span -> clamp to first
            (0, at(999)),   # after span -> clamp to last
            (1, at(42)),    # single fix -> clamp
            (2, at(1)),     # no fixes -> dropped
        ],
        "uid long, ts timestamp",
    )
    got = {(r.uid, r.ts): (r.lon, r.lat) for r in position_at(fixes, qs, "uid").collect()}
    assert got[(0, at(50))] == (10.5, 50.5)
    assert got[(0, at(100))] == (11.0, 51.0)
    assert got[(0, at(150))] == (12.0, 50.5)
    assert got[(0, at(-10))] == (10.0, 50.0)
    assert got[(0, at(999))] == (13.0, 50.0)
    assert got[(1, at(42))] == (-5.0, -5.0)
    assert (2, at(1)) not in got
    assert len(got) == 6


def test_track_motion_features(spark):
    import datetime as dt
    from morituri_spark.geo.trajectory import track_motion

    t0 = dt.datetime(2024, 6, 1, 8, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # track 0: out-and-back east 1km-ish then return -> direct small
        (0, at(0), 10.0, 50.0), (0, at(600), 10.014, 50.0), (0, at(1200), 10.0001, 50.0),
        # track 1: straight line, constant speed
        (1, at(0), 20.0, 10.0), (1, at(3600), 20.1, 10.0),
        # track 2: closed loop (direct = 0 -> tortuosity NULL)
        (2, at(0), 0.0, 0.0), (2, at(100), 0.01, 0.0), (2, at(200), 0.0, 0.0),
        # track 3: duplicate-second fix (zero-dt segment excluded from speed)
        (3, at(0), 5.0, 5.0), (3, at(0), 5.001, 5.0), (3, at(100), 5.002, 5.0),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, lon double, lat double")
    got = {r.uid: r for r in track_motion(df, "uid", "ts", ["ts", "lon"]).collect()}
    import math
    # track 1: 0.1 deg lon at lat 10 ~ 10.95 km in 1h
    assert abs(got[1].max_speed_kmh - got[1].path_km) < 0.01  # 1 hour => speed == path
    assert got[1].tortuosity == 1.0
    # track 0: tortuosity >> 1 (out and back)
    assert got[0].tortuosity > 50
    # track 2: closed loop -> NULL tortuosity, positive path
    assert got[2].tortuosity is None and got[2].path_km > 0
    # track 3: zero-dt segment doesn't blow up; speed from the 100s segment only
    assert got[3].max_speed_kmh is not None
    seg_km = got[3].path_km  # two short segments
    assert got[3].max_speed_kmh < seg_km * 3600 / 100 + 1


def _fence_rows():
    # two disjoint unit squares: zone 1 = [0,1]², zone 2 = [2,3]×[0,1]
    sq1 = [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]
    sq2 = [[(2.0, 0.0), (3.0, 0.0), (3.0, 1.0), (2.0, 1.0), (2.0, 0.0)]]
    return [(1, sq1), (2, sq2)]


def test_geofence_visits_runs_and_dwell(spark):
    from morituri_spark.geo.trajectory import geofence_visits

    # trace: inside z1 (t 0-2), outside (t 3), z2 (t 4-5), back to z1 (t 6)
    xs = [0.5, 0.6, 0.7, 1.5, 2.5, 2.6, 0.5]
    pts = spark.createDataFrame(
        [(7, t, x, 0.5) for t, x in enumerate(xs)],
        "key long, t long, lon double, lat double",
    )
    got = sorted(
        geofence_visits(pts, _fence_rows()).collect(),
        key=lambda r: r["visit"],
    )
    runs = [
        (r["visit"], r["zone_id"], r["enter_t"], r["exit_t"], r["n_points"],
         r["dwell"])
        for r in got
    ]
    assert runs == [
        (1, 1, 0, 3, 3, 3),
        (2, None, 3, 4, 1, 1),
        (3, 2, 4, 6, 2, 2),
        (4, 1, 6, None, 1, None),
    ]


def test_geofence_overlap_resolves_to_smallest_id(spark):
    from morituri_spark.geo.trajectory import geofence_visits

    # overlapping fences: zone 5 and zone 9 both contain the point
    sq = [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]
    pts = spark.createDataFrame(
        [(1, 0, 0.5, 0.5)], "key long, t long, lon double, lat double"
    )
    got = geofence_visits(pts, [(9, sq), (5, sq)]).collect()
    assert got[0]["zone_id"] == 5


def test_geofence_single_exchange_plan(spark):
    from morituri_spark.geo.trajectory import geofence_visits

    pts = spark.createDataFrame(
        [(1, 0, 0.5, 0.5), (1, 1, 2.5, 0.5)],
        "key long, t long, lon double, lat double",
    )
    plan = geofence_visits(pts, _fence_rows())._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1  # windows + groupBy + lead share it
