"""idw_surface (geo/interpolate.py) vs a quantized in-process reference."""
import math
import random

from morituri_spark.geo.interpolate import EPS, V_SCALE, W_SCALE, idw_surface


def _ref(rows, cell):
    acc = {}
    for x, y, v in rows:
        px, py = math.floor(x / cell), math.floor(y / cell)
        vq = math.floor(v * V_SCALE)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ix, iy = px + dx, py + dy
                cx, cy = (ix + 0.5) * cell, (iy + 0.5) * cell
                d2 = (x - cx) * (x - cx) + (y - cy) * (y - cy)
                wq = math.floor(W_SCALE / (EPS + d2))
                n, sw, swv = acc.get((ix, iy), (0, 0, 0))
                acc[(ix, iy)] = (n + 1, sw + wq, swv + wq * vq)
    out = {}
    for k, (n, sw, swv) in acc.items():
        est = swv / sw / V_SCALE
        out[k] = (n, math.floor(est * 1e6 + 0.5 + 1e-8) / 1e6)
    return out


def test_idw_matches_reference(spark):
    rng = random.Random(5)
    rows = [
        (rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(0, 500))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, value double")
    got = {
        (r["ix"], r["iy"]): (r["n_samples"], r["idw_value"])
        for r in idw_surface(df, cell_deg=1.0).collect()
    }
    assert got == _ref(rows, 1.0)


def test_idw_partitioning_invariant(spark):
    # the determinism contract: identical output at any parallelism
    rng = random.Random(9)
    rows = [
        (rng.uniform(0, 4), rng.uniform(0, 4), rng.uniform(0, 100))
        for _ in range(500)
    ]
    df1 = spark.createDataFrame(rows, "lon double, lat double, value double").coalesce(1)
    df32 = spark.createDataFrame(rows, "lon double, lat double, value double").repartition(32)
    a = sorted(map(tuple, idw_surface(df1, cell_deg=2.0).collect()))
    b = sorted(map(tuple, idw_surface(df32, cell_deg=2.0).collect()))
    assert a == b


def test_idw_sample_on_center_dominates(spark):
    # a sample exactly on the cell center gets the capped max weight and
    # pulls the estimate to (near) its own value
    rows = [(0.5, 0.5, 100.0), (0.9, 0.9, 1.0)]
    df = spark.createDataFrame(rows, "lon double, lat double, value double")
    got = {(r["ix"], r["iy"]): r["idw_value"] for r in idw_surface(df, cell_deg=1.0).collect()}
    assert abs(got[(0, 0)] - 100.0) < 0.5


def test_idw_single_exchange_plan(spark):
    df = spark.createDataFrame([(0.5, 0.5, 1.0)], "lon double, lat double, value double")
    plan = idw_surface(df)._jdf.queryExecution().executedPlan().toString()
    # the contribution explode is narrow; only the target-cell aggregate
    # exchanges (AQE may wrap it, so count the shuffle origins)
    assert plan.count("Exchange") == 1, plan
