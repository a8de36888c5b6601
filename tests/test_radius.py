"""radius_join / radius_self_join (geo/knn.py): fixed-radius pair join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo.knn import radius_join, radius_self_join


def _clustered_points(n_per=50, seed=5):
    rng = np.random.default_rng(seed)
    base = [(179.8, 10.0), (-179.9, 10.1), (12.0, 47.0), (30.0, 80.0), (30.5, 80.05)]
    pts = []
    i = 0
    for bx, by in base:
        for _ in range(n_per):
            pts.append(
                (
                    i,
                    float((bx + rng.uniform(-0.6, 0.6) + 180) % 360 - 180),
                    float(np.clip(by + rng.uniform(-0.4, 0.4), -89, 89)),
                )
            )
            i += 1
    return pts


def _brute_pairs(pts, radius_km):
    arr = np.array([(p[1], p[2]) for p in pts])
    lon, lat = np.radians(arr[:, 0]), np.radians(arr[:, 1])
    exp = set()
    for a in range(len(pts)):
        dlat = lat - lat[a]
        dlon = lon - lon[a]
        h = np.sin(dlat / 2) ** 2 + np.cos(lat[a]) * np.cos(lat) * np.sin(dlon / 2) ** 2
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))
        for b in np.where(np.round(d, 6) <= radius_km)[0]:
            if a < b:
                exp.add((pts[a][0], pts[int(b)][0]))
    return exp


def test_radius_self_join_matches_bruteforce(spark):
    # antimeridian wrap + 80-degree-latitude lon widening both exercised
    pts = _clustered_points()
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {(r.id_a, r.id_b) for r in radius_self_join(df, 30.0).collect()}
    assert got == _brute_pairs(pts, 30.0)
    assert len(got) > 0
    assert all(a < b for a, b in got)


def test_radius_join_two_tables(spark):
    pts = _clustered_points(n_per=30, seed=9)
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    a = df.where("id % 2 = 0").select(F.col("id").alias("id_a"), "lon", "lat")
    b = df.where("id % 2 = 1").select(F.col("id").alias("id_b"), "lon", "lat")
    got = {(r.id_a, r.id_b) for r in radius_join(a, b, 25.0).collect()}
    want = {
        (x, y)
        for x, y in _brute_pairs(pts, 25.0) | {(y, x) for x, y in _brute_pairs(pts, 25.0)}
        if x % 2 == 0 and y % 2 == 1
    }
    assert got == want and len(got) > 0


def test_radius_join_res_guard(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id long, lon double, lat double")
    a = df.select(F.col("id").alias("id_a"), "lon", "lat")
    b = df.select(F.col("id").alias("id_b"), "lon", "lat")
    with pytest.raises(ValueError, match="too fine"):
        radius_join(a, b, 500.0, res=12)


def test_radius_join_plans_single_equi_join(spark):
    # the candidate generator must be ONE hash equi-join on cell id —
    # never a cartesian/broadcast-nested-loop over the corpus
    pts = _clustered_points(n_per=10)
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    plan = (
        radius_self_join(df, 30.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_radius_join_salt_path_identical_and_gated(spark):
    pts = _clustered_points()
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    plain = {
        (r.id_a, r.id_b, r.dist_km)
        for r in radius_self_join(df, 30.0, salt=None).collect()
    }
    # force the hot-cell split with a tiny threshold: every cell is "hot",
    # results must be IDENTICAL (salting repartitions work, never pairs)
    salted = {
        (r.id_a, r.id_b, r.dist_km)
        for r in radius_self_join(
            df, 30.0, salt=8, hot_cell_threshold=10
        ).collect()
    }
    assert salted == plain and len(plain) > 0
    # rule-20 gate: below the threshold the auto plan is the unsalted one
    auto_plan = (
        radius_self_join(df, 30.0)  # default auto, default huge threshold
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" not in auto_plan


def _timed_points(n_per=40, seed=9):
    import datetime as dt

    rng = np.random.default_rng(seed)
    base = [(179.85, 10.0), (12.0, 47.0), (30.0, 80.0)]
    t0 = dt.datetime(2024, 3, 1)
    pts = []
    i = 0
    for bx, by in base:
        for _ in range(n_per):
            pts.append(
                (
                    i,
                    float((bx + rng.uniform(-0.5, 0.5) + 180) % 360 - 180),
                    float(np.clip(by + rng.uniform(-0.3, 0.3), -89, 89)),
                    t0 + dt.timedelta(seconds=float(rng.uniform(0, 40000))),
                )
            )
            i += 1
    return pts


def _brute_spacetime(pts, radius_km, window_s):
    arr = np.array([(p[1], p[2]) for p in pts])
    secs = np.array([int(p[3].timestamp()) for p in pts])
    lon, lat = np.radians(arr[:, 0]), np.radians(arr[:, 1])
    exp = set()
    for a in range(len(pts)):
        dlat = lat - lat[a]
        dlon = lon - lon[a]
        h = np.sin(dlat / 2) ** 2 + np.cos(lat[a]) * np.cos(lat) * np.sin(dlon / 2) ** 2
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))
        ok = (np.round(d, 6) <= radius_km) & (np.abs(secs - secs[a]) <= window_s)
        for b in np.where(ok)[0]:
            if a < b:
                exp.add((pts[a][0], pts[int(b)][0]))
    return exp


def test_spacetime_self_join_matches_bruteforce(spark):
    from morituri_spark.geo.knn import spacetime_self_join

    pts = _timed_points()
    df = spark.createDataFrame(pts, "id long, lon double, lat double, ts timestamp")
    got = {
        (r.id_a, r.id_b): (r.dist_km, r.dt_s)
        for r in spacetime_self_join(df, 30.0, 3600, id_col="id").collect()
    }
    exp = _brute_spacetime(pts, 30.0, 3600)
    assert set(got) == exp
    assert 0 < len(got)
    # the time gate must actually bite: spatial-only is a strict superset
    spatial_only = {
        (r.id_a, r.id_b) for r in radius_self_join(df, 30.0).collect()
    }
    assert set(got) < spatial_only
    # dt_s is the signed truncated-second delta, bounded by the window
    assert all(abs(dt) <= 3600 for _, dt in got.values())


def test_spacetime_bucket_edge_pairs(spark):
    # deltas exactly AT the window and 1s past it, straddling a bucket edge
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 0, 0, 59)
    rows = [
        (0, 10.0, 10.0, t0),
        (1, 10.001, 10.0, t0 + dt.timedelta(seconds=60)),   # == window: in
        (2, 10.002, 10.0, t0 + dt.timedelta(seconds=61)),   # > window vs 0
        (3, 10.003, 10.0, t0 - dt.timedelta(seconds=60)),   # == window: in
    ]
    from morituri_spark.geo.knn import spacetime_self_join

    df = spark.createDataFrame(rows, "id long, lon double, lat double, ts timestamp")
    got = {(r.id_a, r.id_b) for r in spacetime_self_join(df, 5.0, 60, id_col="id").collect()}
    assert (0, 1) in got and (0, 3) in got
    assert (0, 2) not in got
    assert (1, 2) in got  # 1s apart
