"""dtw_join / _dtw_cost (geo/similarity.py) vs a plain-loop reference DP."""

import math

import numpy as np
import pytest

from morituri_spark.geo.similarity import _dtw_cost, _round6, dtw_join


def _hav(lo1, la1, lo2, la2):
    r1, r2 = math.radians(la1), math.radians(la2)
    a = (
        math.sin(math.radians(la2 - la1) / 2) ** 2
        + math.cos(r1) * math.cos(r2) * math.sin(math.radians(lo2 - lo1) / 2) ** 2
    )
    return 2.0 * 6371.0088 * math.asin(math.sqrt(min(a, 1.0)))


def _r6(x):
    return math.floor(x * 1e6 + 0.5 + 1e-8) / 1e6


def _ref_dtw(a, b, band=None):
    """textbook O(n·m) cell-by-cell recurrence."""
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
            cost[i][j] = d + best
    return cost[n - 1][m - 1]


def _track(seed, n, step=0.01):
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.uniform(-step, step, size=(n, 2)), axis=0) + [10.0, 45.0]


@pytest.mark.parametrize("n,m,band", [(8, 8, None), (13, 7, None), (20, 20, 3), (9, 4, 2), (1, 1, None), (5, 1, None)])
def test_diagonal_kernel_bit_identical_to_loop(n, m, band):
    a, b = _track(1, n), _track(2, m)
    got = _dtw_cost(a[:, 0], a[:, 1], b[:, 0], b[:, 1], band=band)
    ref = _ref_dtw(a.tolist(), b.tolist(), band=band)
    assert got == ref  # exact float equality: same per-cell op order


def test_band_narrower_than_length_gap_is_inf():
    a, b = _track(3, 10), _track(4, 4)
    assert math.isinf(_dtw_cost(a[:, 0], a[:, 1], b[:, 0], b[:, 1], band=2))


def test_identical_tracks_cost_zero():
    a = _track(5, 12)
    assert _dtw_cost(a[:, 0], a[:, 1], a[:, 0], a[:, 1]) == 0.0


def test_join_matches_bruteforce(spark):
    # 12 tracks in 3 well-separated clusters; in-cluster traces are small
    # jitters of a shared base path, so DTW separates them cleanly.
    rows = []
    for t in range(12):
        c = t % 3
        base = _track(100 + c, 10, step=0.05)
        jit = base + (t // 3) * 0.001
        for s, (lon, lat) in enumerate(jit):
            rows.append((t, s, float(lon + c * 60.0), float(lat)))
    df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
    got = {
        (r["id_a"], r["id_b"]): r["dtw_km"]
        for r in dtw_join(df, 25.0, res=6).collect()
    }
    tracks = {}
    for t, s, lon, lat in rows:
        tracks.setdefault(t, []).append((lon, lat))
    want = {}
    for i in range(12):
        for j in range(i + 1, 12):
            c = _r6(_ref_dtw(tracks[i], tracks[j]))
            if c <= 25.0:
                want[(i, j)] = c
    assert got == want
    assert len(want) >= 9  # all in-cluster pairs qualify
    assert all((a % 3) == (b % 3) for a, b in want)


def test_batch_kernel_bit_identical_to_scalar():
    # the pair-batched DP (r6 optimization) must be bit-equal to the
    # per-pair scalar DP for every (shape, band, frechet) combination
    from morituri_spark.geo.similarity import _dtw_cost_batch

    rng = np.random.RandomState(11)
    for n, m in [(1, 1), (5, 1), (8, 8), (13, 7), (24, 24)]:
        P = 5
        A = rng.uniform(-170, 170, (P, n))
        Aa = rng.uniform(-60, 60, (P, n))
        B = rng.uniform(-170, 170, (P, m))
        Ba = rng.uniform(-60, 60, (P, m))
        for frech in (False, True):
            for band in (None, max(1, abs(n - m) + 2)):
                got = _dtw_cost_batch(A, Aa, B, Ba, band=band, frechet=frech)
                for p in range(P):
                    exp = _dtw_cost(
                        A[p], Aa[p], B[p], Ba[p], band=band, frechet=frech
                    )
                    assert got[p] == exp or (
                        math.isinf(got[p]) and math.isinf(exp)
                    )
