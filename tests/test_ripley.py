"""ripley_k (geo/ripley.py) vs a brute-force in-process reference."""

import math

import numpy as np
import pytest

from morituri_spark.geo.ripley import ripley_k


def _pts(seed=7, n=120):
    rng = np.random.default_rng(seed)
    rows = []
    # one tight cluster + a sparse background: K should exceed CSR at
    # small r and relax toward it at large r
    for i in range(n // 2):
        rows.append((i, float(10 + rng.uniform(-0.05, 0.05)),
                     float(45 + rng.uniform(-0.05, 0.05))))
    for i in range(n // 2, n):
        rows.append((i, float(rng.uniform(5, 15)), float(rng.uniform(40, 50))))
    return rows


def _brute_k(rows, radii, area):
    arr = np.array([(r[1], r[2]) for r in rows])
    lon, lat = np.radians(arr[:, 0]), np.radians(arr[:, 1])
    n = len(rows)
    out = {}
    d6 = []
    for a in range(n):
        dlat = lat - lat[a]
        dlon = lon - lon[a]
        h = np.sin(dlat / 2) ** 2 + np.cos(lat[a]) * np.cos(lat) * np.sin(dlon / 2) ** 2
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))
        d6.append(np.round(d, 6))
    d6 = np.array(d6)
    np.fill_diagonal(d6, np.inf)
    for r in radii:
        cnt = int((d6 <= r).sum())  # ordered pairs
        k_raw = area * cnt / (n * (n - 1))
        out[float(r)] = (
            cnt,
            math.floor(k_raw * 1e6 + 0.5 + 1e-8) / 1e6,
            math.floor(math.sqrt(k_raw / math.pi) * 1e6 + 0.5 + 1e-8) / 1e6,
        )
    return out


def test_ripley_matches_bruteforce(spark):
    rows = _pts()
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    radii = [5.0, 25.0, 100.0, 400.0]
    area = 861_000.0  # ~10°x10° window at 45°N
    got = {
        r["r_km"]: (r["pair_count"], r["k_est"], r["l_est"])
        for r in ripley_k(df, radii, area).collect()
    }
    assert got == _brute_k(rows, radii, area)
    # clustered pattern: L(r) >> r at the cluster scale
    assert got[5.0][2] > 5.0


def test_ripley_zero_pair_radius_kept(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 10.0, 0.0)], "id long, lon double, lat double"
    )
    got = {r["r_km"]: r["pair_count"] for r in ripley_k(df, [1.0, 2000.0], 1e6).collect()}
    assert got == {1.0: 0, 2000.0: 2}


def test_ripley_guards(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id long, lon double, lat double")
    with pytest.raises(ValueError):
        ripley_k(df, [0.0, 5.0], 1e6)
    with pytest.raises(ValueError):
        ripley_k(df, [], 1e6)
    # n < 2: K undefined, empty result
    assert ripley_k(df, [10.0], 1e6).count() == 0
