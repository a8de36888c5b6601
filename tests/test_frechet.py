"""frechet_join / _dtw_cost(frechet=True) vs a plain-loop reference DP."""

import math

import numpy as np
import pytest

from morituri_spark.geo.similarity import _dtw_cost, frechet_join


def _hav(lo1, la1, lo2, la2):
    r1, r2 = math.radians(la1), math.radians(la2)
    a = (
        math.sin(math.radians(la2 - la1) / 2) ** 2
        + math.cos(r1) * math.cos(r2) * math.sin(math.radians(lo2 - lo1) / 2) ** 2
    )
    return 2.0 * 6371.0088 * math.asin(math.sqrt(min(a, 1.0)))


def _r6(x):
    return math.floor(x * 1e6 + 0.5 + 1e-8) / 1e6


def _ref_frechet(a, b, band=None):
    """textbook Eiter–Mannila cell-by-cell recurrence."""
    n, m = len(a), len(b)
    INF = float("inf")
    cost = [[INF] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            d = _r6(_hav(a[i][0], a[i][1], b[j][0], b[j][1]))
            if band is not None and abs(i - j) > band:
                d = INF
            if i == 0 and j == 0:
                cost[i][j] = d
                continue
            best = INF
            if i > 0:
                best = min(best, cost[i - 1][j])
            if j > 0:
                best = min(best, cost[i][j - 1])
            if i > 0 and j > 0:
                best = min(best, cost[i - 1][j - 1])
            cost[i][j] = max(d, best)
    return cost[n - 1][m - 1]


def _track(seed, n, step=0.01):
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.uniform(-step, step, size=(n, 2)), axis=0) + [10.0, 45.0]


@pytest.mark.parametrize(
    "n,m,band",
    [(8, 8, None), (13, 7, None), (20, 20, 3), (9, 4, 2), (1, 1, None), (5, 1, None)],
)
def test_diagonal_kernel_bit_identical_to_loop(n, m, band):
    a, b = _track(1, n), _track(2, m)
    got = _dtw_cost(a[:, 0], a[:, 1], b[:, 0], b[:, 1], band=band, frechet=True)
    ref = _ref_frechet(a.tolist(), b.tolist(), band=band)
    assert got == ref  # exact float equality: max selects a rounded d


def test_frechet_at_least_hausdorff_and_at_most_dtw():
    a, b = _track(7, 11), _track(8, 9)
    fr = _dtw_cost(a[:, 0], a[:, 1], b[:, 0], b[:, 1], frechet=True)
    dtw = _dtw_cost(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
    # Fréchet is a max over one coupling; DTW sums over the best path of
    # the SAME step set, so DTW >= Fréchet always (n+m-1 >= 1 cells).
    assert fr <= dtw
    # and Fréchet >= the head-pair distance (the (0,0) cell is paid)
    assert fr >= _r6(_hav(a[0][0], a[0][1], b[0][0], b[0][1]))


def test_identical_tracks_distance_zero():
    a = _track(5, 12)
    assert _dtw_cost(a[:, 0], a[:, 1], a[:, 0], a[:, 1], frechet=True) == 0.0


def test_reversed_track_is_penalized():
    # Fréchet is order-sensitive: a route driven backwards couples head
    # to tail, so the distance approximates the track's own diameter.
    a = _track(9, 15, step=0.05)
    r = a[::-1]
    fwd = _dtw_cost(a[:, 0], a[:, 1], a[:, 0], a[:, 1], frechet=True)
    rev = _dtw_cost(a[:, 0], a[:, 1], r[:, 0], r[:, 1], frechet=True)
    assert fwd == 0.0 and rev > 1.0


def test_join_matches_bruteforce(spark):
    rows = []
    for t in range(12):
        c = t % 3
        base = _track(100 + c, 10, step=0.05)
        jit = base + (t // 3) * 0.001
        for s, (lon, lat) in enumerate(jit):
            rows.append((t, s, float(lon + c * 60.0), float(lat)))
    df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
    got = {
        (r["id_a"], r["id_b"]): r["frechet_km"]
        for r in frechet_join(df, 5.0, res=6).collect()
    }
    tracks = {}
    for t, s, lon, lat in rows:
        tracks.setdefault(t, []).append((lon, lat))
    want = {}
    for i in range(12):
        for j in range(i + 1, 12):
            c = _r6(_ref_frechet(tracks[i], tracks[j]))
            if c <= 5.0:
                want[(i, j)] = c
    assert got == want
    assert len(want) >= 9  # all in-cluster pairs qualify
    assert all((a % 3) == (b % 3) for a, b in want)
