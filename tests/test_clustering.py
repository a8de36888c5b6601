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


def _gi_ref(counts: dict, z_threshold: float):
    """Pure-Python Gi* over a dict {(ix,iy): n} — the test oracle."""
    n_cells = len(counts)
    s1 = sum(counts.values())
    s2 = sum(v * v for v in counts.values())
    mu = s1 / n_cells
    sigma = math.sqrt(s2 / n_cells - mu * mu)
    out = {}
    for (ix, iy), n in counts.items():
        nbh = [
            counts[(ix + dx, iy + dy)]
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (ix + dx, iy + dy) in counts
        ]
        si, wi = sum(nbh), len(nbh)
        if n_cells * s2 - s1 * s1 <= 0 or wi >= n_cells:
            continue
        denom = sigma * math.sqrt((n_cells * wi - wi * wi) / (n_cells - 1))
        z = math.floor((si - mu * wi) / denom * 1e6 + 0.5 + 1e-8) / 1e6
        if abs(z) >= z_threshold:
            out[(ix, iy)] = (n, wi, si, z)
    return out


def test_gi_star_matches_reference(spark):
    from morituri_spark.geo.clustering import gi_star_cells

    # hot block around (0,0); lone mid cells; cold pair far away
    counts = {(0, 0): 10, (0, 1): 8, (1, 0): 9, (1, 1): 7,
              (5, 5): 3, (7, 2): 2, (9, 9): 1, (9, 8): 1, (3, 8): 2}
    rows = [(ix + 0.5, iy + 0.5)
            for (ix, iy), n in counts.items() for _ in range(n)]
    got = {
        (r["ix"], r["iy"]): (r["n_points"], r["w_i"], r["s_i"], r["gi_z"])
        for r in gi_star_cells(_pts(spark, rows), cell_deg=1.0,
                               z_threshold=0.5).collect()
    }
    ref = _gi_ref(counts, 0.5)
    assert got == ref
    # the hot block must flag positive, the isolated cold cells negative
    assert ref[(0, 0)][3] > 0 and any(z < 0 for (_, _, _, z) in ref.values())


def test_gi_star_uniform_counts_empty(spark):
    from morituri_spark.geo.clustering import gi_star_cells

    rows = [(float(i) + 0.5, 0.5) for i in range(6)]  # all cells count 1
    assert gi_star_cells(_pts(spark, rows), cell_deg=1.0,
                         z_threshold=0.0).count() == 0


def _mk_ref(series: list, z_threshold: float):
    """Pure-Python tie-corrected Mann-Kendall — the test oracle."""
    t = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(t) for j in range(i + 1, t)
    )
    groups = {}
    for v in series:
        groups[v] = groups.get(v, 0) + 1
    tie = sum(g * (g - 1) * (2 * g + 5) for g in groups.values())
    var = (t * (t - 1) * (2 * t + 5) - tie) / 18.0
    if s == 0 or var <= 0:
        z_raw = 0.0
    else:
        z_raw = (s - (1 if s > 0 else -1)) / math.sqrt(var)
    z = math.floor(z_raw * 1e6 + 0.5 + 1e-8) / 1e6
    trend = "up" if z >= z_threshold else ("down" if z <= -z_threshold else "none")
    return s, z, trend


def test_mann_kendall_trends(spark):
    from morituri_spark.geo.clustering import mann_kendall_cells

    t_bins = 5
    series = {
        (0, 0): [1, 2, 3, 4, 5],   # strict up
        (1, 5): [5, 4, 3, 2, 1],   # strict down
        (3, 3): [2, 2, 2, 2, 2],   # flat → all tied → z = 0
        (8, 8): [0, 0, 0, 0, 3],   # sparse: missing bins are ZERO
    }
    rows = [
        (ix + 0.5, iy + 0.5, t)
        for (ix, iy), xs in series.items()
        for t, n in enumerate(xs) for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, t_bin int")
    got = {
        (r["ix"], r["iy"]): (r["total_points"], r["s_stat"], r["mk_z"], r["trend"])
        for r in mann_kendall_cells(df, n_bins=t_bins, cell_deg=1.0,
                                    z_threshold=1.0).collect()
    }
    assert set(got) == set(series)
    for cell, xs in series.items():
        s, z, trend = _mk_ref(xs, 1.0)
        assert got[cell] == (sum(xs), s, z, trend), cell
    assert got[(0, 0)][3] == "up" and got[(1, 5)][3] == "down"
    assert got[(3, 3)] == (10, 0, 0.0, "none")


def test_mann_kendall_guards(spark):
    from morituri_spark.geo.clustering import mann_kendall_cells

    df = spark.createDataFrame([(0.5, 0.5, 0)], "lon double, lat double, t_bin int")
    with pytest.raises(ValueError, match="n_bins"):
        mann_kendall_cells(df, n_bins=1)
    with pytest.raises(ValueError, match="cell_deg"):
        mann_kendall_cells(df, n_bins=4, cell_deg=1e-5)


def _egs_ref(series: dict, t_bins: int, z_threshold: float):
    """Pure-Python emerging-Gi*: series = {(ix,iy): [count per bin]}."""
    cells = list(series)
    n = len(cells)
    w = {
        c: sum(
            1 for d in cells
            if abs(d[0] - c[0]) <= 1 and abs(d[1] - c[1]) <= 1
        )
        for c in cells
    }
    out = {}
    zs = {c: [] for c in cells}
    for t in range(t_bins):
        xs = {c: series[c][t] for c in cells}
        s1 = sum(xs.values())
        s2 = sum(v * v for v in xs.values())
        for c in cells:
            si = sum(
                xs[d] for d in cells
                if abs(d[0] - c[0]) <= 1 and abs(d[1] - c[1]) <= 1
            )
            if n * s2 - s1 * s1 <= 0 or w[c] >= n or n <= 1:
                z = 0.0
            else:
                mu = s1 / n
                sigma = math.sqrt(s2 / n - mu * mu)
                z = (si - mu * w[c]) / (
                    sigma * math.sqrt((n * w[c] - w[c] * w[c]) / (n - 1))
                )
            zs[c].append(math.floor(z * 1e6 + 0.5 + 1e-8) / 1e6)
    for c in cells:
        s, z, trend = _mk_ref(zs[c], z_threshold)
        out[c] = (w[c], s, z, trend)
    return out


def test_emerging_gi_star_matches_reference(spark):
    from morituri_spark.geo.clustering import emerging_gi_star

    t_bins = 5
    # knot (0,0)+(0,1) intensifies over time against a constant background
    # → its RELATIVE concentration (Gi* z) must trend up, the background's
    # down — even though every background count is constant
    series = {
        (0, 0): [2, 4, 8, 16, 32],
        (0, 1): [1, 2, 4, 8, 16],
        (5, 5): [6, 6, 6, 6, 6],
        (5, 6): [5, 5, 5, 5, 5],
        (9, 2): [4, 4, 4, 4, 4],
        (3, 8): [3, 0, 3, 0, 3],
    }
    rows = [
        (ix + 0.5, iy + 0.5, t)
        for (ix, iy), xs in series.items()
        for t, c in enumerate(xs) for _ in range(c)
    ]
    df = spark.createDataFrame(rows, "lon double, lat double, t_bin int")
    got = {
        (r["ix"], r["iy"]): (r["w_i"], r["s_stat"], r["mk_z"], r["trend"])
        for r in emerging_gi_star(df, n_bins=t_bins, cell_deg=1.0,
                                  z_threshold=1.0).collect()
    }
    ref = _egs_ref(series, t_bins, 1.0)
    assert got == ref
    assert got[(0, 0)][3] == "up" and got[(0, 1)][3] == "up"
    assert any(v[3] == "down" for v in got.values())


def _lisa_ref(counts):
    vals = list(counts.values())
    N, S1, S2 = len(vals), sum(vals), sum(v * v for v in vals)
    if N * S2 - S1 * S1 <= 0:
        return {}
    mu = S1 / N
    m2 = S2 / N - mu * mu
    out = {}
    for (ix, iy), x in counts.items():
        si = wi = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nv = counts.get((ix + dx, iy + dy))
                if nv is not None:
                    si += nv
                    wi += 1
        if wi == 0:
            continue
        i_raw = (x - mu) * (si - wi * mu) / m2
        own_hi = N * x > S1
        nbr_hi = N * si > wi * S1
        quad = ("HH" if nbr_hi else "HL") if own_hi else ("LL" if not nbr_hi else "LH")
        out[(ix, iy)] = (
            x, wi, si, math.floor(i_raw * 1e6 + 0.5 + 1e-8) / 1e6, quad,
        )
    return out


def test_local_morans_matches_reference(spark):
    from morituri_spark.geo.clustering import local_morans_cells

    # heavy block, light ring, an isolated far cell (dropped: no neighbor)
    counts = {(0, 0): 10, (1, 0): 9, (0, 1): 8, (1, 1): 12,
              (2, 0): 1, (2, 1): 1, (0, 2): 1, (1, 2): 2, (2, 2): 1,
              (9, 9): 3}
    rows = []
    for (ix, iy), n in counts.items():
        rows += [(ix + 0.5, iy + 0.5)] * n
    got = {
        (r["ix"], r["iy"]): (r["n_points"], r["w_i"], r["s_i"],
                             r["lisa_i"], r["quadrant"])
        for r in local_morans_cells(_pts(spark, rows), cell_deg=1.0).collect()
    }
    assert got == _lisa_ref(counts)
    # corner (0,0) sees only heavy neighbors → HH; (1,1) sees the light
    # ring too (nbr mean 33/8 < μ=4.8) → HL; light (2,2) beside heavy → LH
    assert got[(0, 0)][4] == "HH"
    assert got[(1, 1)][4] == "HL"
    assert got[(2, 2)][4] == "LH"


def test_local_morans_guards(spark):
    from morituri_spark.geo.clustering import local_morans_cells

    # uniform counts → zero variance → empty (exact integer guard)
    rows = [(x + 0.5, 0.5) for x in range(4)]
    assert local_morans_cells(_pts(spark, rows), cell_deg=1.0).count() == 0
    # injectivity guard
    with pytest.raises(ValueError):
        local_morans_cells(_pts(spark, [(0.0, 0.0)]), cell_deg=1e-5)


def test_theil_sen_matches_reference(spark):
    import math
    import random

    from morituri_spark.geo.clustering import theil_sen_cells

    rng = random.Random(19)
    t_bins = 6
    rows = []
    # cell (0,0): count grows ~2/bin; cell (5,5): shrinks; cell (9,0): flat
    for t in range(t_bins):
        rows += [(0.5, 0.5, t)] * (3 + 2 * t)
        rows += [(5.5, 5.5, t)] * (14 - 2 * t)
        rows += [(9.5, 0.5, t)] * 4
        # noise cell with random counts
        rows += [(2.5, 7.5, t)] * rng.randrange(0, 6)
    df = spark.createDataFrame(rows, "lon double, lat double, t_bin long")

    # in-process reference: lower median of floor(dx*1e6/dt)
    from collections import Counter

    counts = Counter((int(lon), int(lat), t) for lon, lat, t in rows)
    cells = {(x, y) for x, y, _ in counts}
    ref = {}
    for x, y in cells:
        xs = [counts.get((x, y, t), 0) for t in range(t_bins)]
        slopes = sorted(
            (
                math.floor((xs[j] - xs[i]) * 1e6 / (j - i)),
                )
            for i in range(t_bins)
            for j in range(i + 1, t_bins)
        )
        n = len(slopes)
        sm = slopes[(n + 1) // 2 - 1][0]
        trend = "up" if sm >= 500_000 else ("down" if sm <= -500_000 else "none")
        ref[(x, y)] = (sum(xs), sm, trend)

    got = {
        (r["ix"], r["iy"]): (r["total_points"], r["slope_micro"], r["trend"])
        for r in theil_sen_cells(df, n_bins=t_bins, cell_deg=1.0).collect()
    }
    assert got == ref
    assert got[(0, 0)][2] == "up"
    assert got[(5, 5)][2] == "down"
    assert got[(9, 0)][2] == "none"


def test_theil_sen_guards(spark):
    import pytest

    from morituri_spark.geo.clustering import theil_sen_cells

    df = spark.createDataFrame([(0.5, 0.5, 0)], "lon double, lat double, t_bin long")
    with pytest.raises(ValueError):
        theil_sen_cells(df, n_bins=1)
    with pytest.raises(ValueError):
        theil_sen_cells(df, n_bins=4, cell_deg=1e-5)
