"""grid_clusters / hotspot_cells (geo/clustering.py) vs in-process refs."""
import math
import random

import pytest

from morituri_spark.geo.clustering import grid_clusters, hotspot_cells


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lon double, lat double")


def test_two_clusters_and_noise(spark):
    rows = []
    # cluster A: cells (0,0) and (1,1) diagonal-adjacent, 3 points each
    rows += [(0.1, 0.1), (0.5, 0.5), (0.9, 0.9)]
    rows += [(1.1, 1.1), (1.5, 1.5), (1.9, 1.9)]
    # cluster B: isolated dense cell far away
    rows += [(10.2, 10.2), (10.4, 10.4), (10.6, 10.6)]
    # noise: single point (below min_pts)
    rows += [(20.5, 20.5)]
    got = {
        (r["ix"], r["iy"]): (r["cluster_id"], r["n_points"])
        for r in grid_clusters(_pts(spark, rows), cell_deg=1.0, min_pts=2).collect()
    }
    assert set(got) == {(0, 0), (1, 1), (10, 10)}
    assert got[(0, 0)][0] == got[(1, 1)][0] == 0            # min key of comp
    assert got[(10, 10)][0] == 10 * 1_000_000 + 10           # isolated core
    assert got[(0, 0)][1] == 3


def test_matches_bruteforce_components(spark):
    rng = random.Random(11)
    rows = [
        (rng.uniform(-5, 5), rng.uniform(-5, 5)) for _ in range(400)
    ]
    got = {
        (r["ix"], r["iy"]): r["cluster_id"]
        for r in grid_clusters(_pts(spark, rows), cell_deg=1.0, min_pts=3).collect()
    }
    # reference: python union-find over the same binning
    from collections import Counter

    counts = Counter(
        (math.floor(x / 1.0), math.floor(y / 1.0)) for x, y in rows
    )
    core = {c for c, n in counts.items() if n >= 3}
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (ix, iy) in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (ix + dx, iy + dy)
                if nb in core and nb != (ix, iy):
                    ra, rb = find((ix, iy)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb, key=lambda c: c[0] * 1_000_000 + c[1])] = min(
                            ra, rb, key=lambda c: c[0] * 1_000_000 + c[1]
                        )
    want = {
        c: (lambda r: r[0] * 1_000_000 + r[1])(find(c)) for c in core
    }
    assert got == {c: want[c] for c in got} and set(got) == set(want)


def test_negative_coordinates_pack_correctly(spark):
    rows = [(-0.5, -0.5), (-0.3, -0.2), (-1.5, -0.5), (-1.2, -0.9)]
    got = {
        (r["ix"], r["iy"]): r["cluster_id"]
        for r in grid_clusters(_pts(spark, rows), cell_deg=1.0, min_pts=2).collect()
    }
    # cells (-1,-1) and (-2,-1) are adjacent → one cluster, min key wins
    assert set(got) == {(-1, -1), (-2, -1)}
    assert got[(-1, -1)] == got[(-2, -1)] == -2 * 1_000_000 - 1


def test_key_injectivity_guard():
    with pytest.raises(ValueError, match="injective"):
        grid_clusters(None, cell_deg=1e-5)


def _morans_ref(counts):
    """counts: {(ix,iy): n} → (N, W, I) by the exact-sum formula."""
    cells = list(counts.items())
    n_vals = [n for _, n in cells]
    N, S1, S2 = len(cells), sum(n_vals), sum(n * n for n in n_vals)
    sxy = sxs = W = 0
    for (ix, iy), nu in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nv = counts.get((ix + dx, iy + dy))
                if nv is not None:
                    sxy += nu * nv
                    sxs += nu + nv
                    W += 1
    mu = S1 / N
    i_raw = N * (sxy - mu * sxs + W * mu * mu) / (W * (S2 - N * mu * mu))
    return N, W, math.floor(i_raw * 1e6 + 0.5 + 1e-8) / 1e6


def test_morans_i_clustered_vs_dispersed(spark):
    from morituri_spark.geo.clustering import morans_i

    # clustered: two adjacent heavy cells among light far cells → I > 0
    rows = [(0.5, 0.5)] * 10 + [(1.5, 0.5)] * 10 + [(0.5, 1.5)] * 9 + [(1.5, 1.5)] * 9
    rows += [(5.5, 5.5)] * 1 + [(6.5, 5.5)] * 1
    got = morans_i(_pts(spark, rows), cell_deg=1.0).collect()
    assert len(got) == 1
    counts = {(0, 0): 10, (1, 0): 10, (0, 1): 9, (1, 1): 9, (5, 5): 1, (6, 5): 1}
    N, W, I = _morans_ref(counts)
    assert (got[0]["n_cells"], got[0]["w_pairs"]) == (N, W)
    assert got[0]["morans_i"] == pytest.approx(I, abs=0)
    assert got[0]["morans_i"] > 0

    # checkerboard heavy/light → negative autocorrelation
    rows2 = []
    counts2 = {}
    for ix in range(4):
        for iy in range(4):
            n = 9 if (ix + iy) % 2 == 0 else 1
            counts2[(ix, iy)] = n
            rows2 += [(ix + 0.5, iy + 0.5)] * n
    got2 = morans_i(_pts(spark, rows2), cell_deg=1.0).collect()
    N2, W2, I2 = _morans_ref(counts2)
    assert (got2[0]["n_cells"], got2[0]["w_pairs"]) == (N2, W2)
    assert got2[0]["morans_i"] == pytest.approx(I2, abs=0)
    assert got2[0]["morans_i"] < 0


def test_morans_i_no_adjacent_cells_is_empty(spark):
    from morituri_spark.geo.clustering import morans_i

    rows = [(0.5, 0.5), (10.5, 10.5)]  # isolated cells → W = 0, undefined
    assert morans_i(_pts(spark, rows), cell_deg=1.0).count() == 0


def test_hotspot_zscores(spark):
    # 9 cells with count 1, one cell with count 20 → clear hotspot
    rows = [(float(i), 0.5) for i in range(9)]
    rows += [(50.5, 0.5)] * 20
    got = hotspot_cells(_pts(spark, rows), cell_deg=1.0, z_threshold=2.0).collect()
    assert len(got) == 1 and (got[0]["ix"], got[0]["iy"]) == (50, 0)
    n = [1.0] * 9 + [20.0]
    mu = sum(n) / len(n)
    var = sum(v * v for v in n) - sum(n) * mu
    var /= len(n) - 1
    zref = math.floor((20.0 - mu) / math.sqrt(var) * 1e6 + 0.5 + 1e-8) / 1e6
    assert got[0]["z"] == pytest.approx(zref, abs=0)
    assert got[0]["n_points"] == 20
