"""gwr_surface (geo/interpolate.py) vs a NumPy weighted-OLS reference."""

import math

import numpy as np
import pytest

from morituri_spark.geo.interpolate import gwr_surface


def _r6(x):
    return math.floor(x * 1e6 + 0.5 + 1e-8) / 1e6


def _ref_gwr(pts, cell):
    """Reference: replay the quantization + per-cell Cramer solve in
    plain Python/NumPy (float64 solve on the exact integer moments)."""
    by_cell = {}
    for x, y, v in pts:
        px, py = math.floor(x / cell), math.floor(y / cell)
        vq = math.floor(v * 1000.0)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                by_cell.setdefault((px + dx, py + dy), []).append((x, y, vq))
    out = {}
    for (ix, iy), rows in by_cell.items():
        m = [0] * 9  # exact Python-int moments, float64-cast ONCE like Spark
        n = len(rows)
        for x, y, vq in rows:
            xq = math.floor((x / cell - (ix + 0.5)) * 1e6)
            yq = math.floor((y / cell - (iy + 0.5)) * 1e6)
            wq = math.floor(1e21 / (1e9 + float(xq * xq + yq * yq)))
            for k, t in enumerate(
                [wq, wq * xq, wq * yq, wq * xq * xq, wq * xq * yq,
                 wq * yq * yq, wq * vq, wq * xq * vq, wq * yq * vq]
            ):
                m[k] += t
        s0, sx, sy, sxx, sxy, syy, sv, sxv, syv = (float(t) for t in m)
        det = s0 * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy) \
            + sy * (sx * sxy - sxx * sy)
        gate = 1e-9 * (abs(s0 * (sxx * syy - sxy * sxy))
                       + abs(sx * (sx * syy - sxy * sy))
                       + abs(sy * (sx * sxy - sxx * sy)))
        if n < 3 or abs(det) <= gate:
            continue
        n0 = sv * (sxx * syy - sxy * sxy) - sx * (sxv * syy - sxy * syv) \
            + sy * (sxv * sxy - sxx * syv)
        n1 = s0 * (sxv * syy - sxy * syv) - sv * (sx * syy - sxy * sy) \
            + sy * (sx * syv - sxv * sy)
        n2 = s0 * (sxx * syv - sxv * sxy) - sx * (sx * syv - sxv * sy) \
            + sv * (sx * sxy - sxx * sy)
        out[(ix, iy)] = (n, _r6(n0 / det / 1e3),
                         _r6(n1 / det * 1e3), _r6(n2 / det * 1e3))
    return out


def test_recovers_planar_trend(spark):
    """Samples drawn exactly from v = 5 + 2x + 3y (x,y in cell units)
    must return beta_x ~ 2/cell-unit... i.e. betas matching the plane."""
    rng = np.random.RandomState(42)
    cell = 1.0
    xs = rng.uniform(0.0, 4.0, 200)
    ys = rng.uniform(0.0, 4.0, 200)
    vs = 5.0 + 2.0 * xs + 3.0 * ys
    rows = [(float(x), float(y), float(v)) for x, y, v in zip(xs, ys, vs)]
    df = spark.createDataFrame(rows, "lon double, lat double, value double")
    got = {
        (r["ix"], r["iy"]): (r["beta_x"], r["beta_y"])
        for r in gwr_surface(df, cell_deg=cell).collect()
    }
    assert len(got) >= 16
    for (ix, iy), (bx, by) in got.items():
        # interior cells see the exact plane; quantization costs <= ~1e-2
        assert abs(bx - 2.0) < 0.02, (ix, iy, bx)
        assert abs(by - 3.0) < 0.02, (ix, iy, by)


def test_matches_python_replay_exactly(spark):
    rng = np.random.RandomState(7)
    pts = [
        (float(x), float(y), float(v))
        for x, y, v in zip(
            rng.uniform(-2, 2, 120), rng.uniform(-2, 2, 120),
            rng.uniform(0, 100, 120),
        )
    ]
    df = spark.createDataFrame(pts, "lon double, lat double, value double")
    got = {
        (r["ix"], r["iy"]): (r["n_samples"], r["beta0"], r["beta_x"], r["beta_y"])
        for r in gwr_surface(df, cell_deg=1.0).collect()
    }
    want = _ref_gwr(pts, 1.0)
    assert got == want


def test_collinear_cells_dropped(spark):
    # all samples on one vertical line: the x-column of the design is
    # constant within float dust -> conditioning gate drops the cells
    rows = [(0.5, float(y) / 10.0, float(y)) for y in range(20)]
    df = spark.createDataFrame(rows, "lon double, lat double, value double")
    out = gwr_surface(df, cell_deg=10.0).collect()
    assert out == []


def test_under_three_samples_dropped(spark):
    rows = [(0.2, 0.3, 1.0), (0.7, 0.6, 2.0)]
    df = spark.createDataFrame(rows, "lon double, lat double, value double")
    assert gwr_surface(df, cell_deg=1.0).collect() == []
