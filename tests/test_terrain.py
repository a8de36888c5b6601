"""slope_aspect (geo/terrain.py) vs an in-process Horn reference."""

import math

import pytest

from morituri_spark.geo.terrain import slope_aspect


def _q(v):
    return None if v is None else math.floor(v * 1e6 + 0.5 + 1e-8) / 1e6


def _ref(cells, cell_size):
    z = dict(cells)
    out = {}
    for (x, y) in z:
        nb = {(dx, dy): z.get((x + dx, y + dy)) for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
        if any(v is None for v in nb.values()):
            continue
        gxn = (nb[(1, -1)] + 2 * nb[(1, 0)] + nb[(1, 1)]
               - nb[(-1, -1)] - 2 * nb[(-1, 0)] - nb[(-1, 1)])
        gyn = (nb[(-1, 1)] + 2 * nb[(0, 1)] + nb[(1, 1)]
               - nb[(-1, -1)] - 2 * nb[(0, -1)] - nb[(1, -1)])
        gx, gy = gxn / (8 * cell_size), gyn / (8 * cell_size)
        slope = math.degrees(math.atan(math.hypot(gx, gy)))
        aspect = None if gxn == 0 and gyn == 0 else math.degrees(math.atan2(gy, -gx))
        out[(x, y)] = (gxn, gyn, _q(slope), _q(aspect))
    return out


def _run(spark, cells, cell_size):
    df = spark.createDataFrame(
        [(x, y, z) for (x, y), z in cells], "ix long, iy long, z long"
    )
    return {
        (r["ix"], r["iy"]): (r["gx_num"], r["gy_num"], r["slope_deg"], r["aspect_deg"])
        for r in slope_aspect(df, cell_size).collect()
    }


def test_plane_gradient(spark):
    # z = 2x + 3y: constant gradient everywhere in the interior
    cells = [((x, y), 2 * x + 3 * y) for x in range(5) for y in range(5)]
    got = _run(spark, cells, cell_size=10.0)
    ref = _ref(cells, 10.0)
    assert got == ref
    assert set(got) == {(x, y) for x in range(1, 4) for y in range(1, 4)}
    gxn, gyn, slope, aspect = got[(2, 2)]
    assert (gxn, gyn) == (16, 24)
    assert slope == _q(math.degrees(math.atan(math.hypot(0.2, 0.3))))


def test_flat_has_null_aspect(spark):
    cells = [((x, y), 7) for x in range(3) for y in range(3)]
    got = _run(spark, cells, cell_size=1.0)
    assert got == {(1, 1): (0, 0, 0.0, None)}


def test_random_dem_matches(spark):
    cells = [((x, y), (x * 7 + y * 13) % 23) for x in range(8) for y in range(8)]
    assert _run(spark, cells, 30.0) == _ref(cells, 30.0)


def test_terrain_guard(spark):
    df = spark.createDataFrame([(0, 0, 1)], "ix long, iy long, z long")
    with pytest.raises(ValueError):
        slope_aspect(df, 0.0)


# --- D8 hydrology ------------------------------------------------------------

from morituri_spark.geo.terrain import (  # noqa: E402
    _D8,
    d8_flow_directions,
    flow_accumulation,
    watershed_labels,
)


def _d8_ref(cells):
    """Per-cell (z, downstream-or-None, weighted drop-or-None, is_sink)."""
    z = dict(cells)
    out = {}
    for (x, y), zv in z.items():
        cmin = min(
            ((z[(x + dx, y + dy)], k, dx, dy) for dx, dy, k, w in _D8
             if w == 10 and (x + dx, y + dy) in z),
            default=None,
        )
        dmin = min(
            ((z[(x + dx, y + dy)], k, dx, dy) for dx, dy, k, w in _D8
             if w == 7 and (x + dx, y + dy) in z),
            default=None,
        )
        gc = (zv - cmin[0]) * 10 if cmin else None
        gd = (zv - dmin[0]) * 7 if dmin else None
        pick_c = dmin is None or (cmin is not None and gc >= gd)
        g, b = (gc, cmin) if pick_c else (gd, dmin)
        sink = g is None or g <= 0
        out[(x, y)] = (
            zv,
            None if sink else (x + b[2], y + b[3]),
            None if sink else g,
            sink,
        )
    return out


def _flow_maps(ref):
    """downstream pointer map + per-cell reference acc + sink label."""
    down = {c: v[1] for c, v in ref.items() if v[1] is not None}
    acc = {c: 1 for c in ref}
    for c in ref:
        cur = down.get(c)
        while cur is not None:
            acc[cur] += 1
            cur = down.get(cur)
    sink = {}
    for c in ref:
        cur = c
        while cur in down:
            cur = down[cur]
        sink[c] = cur
    return acc, sink


def _dem_df(spark, cells):
    return spark.createDataFrame(
        [(x, y, z) for (x, y), z in cells], "ix long, iy long, z long"
    )


BOWL = [
    ((x, y), (x - 3) * (x - 3) + (y - 3) * (y - 3) + (x * 7 + y * 13) % 5)
    for x in range(7) for y in range(7)
]
RANDOMISH = [((x, y), (x * 11 + y * 17) % 29) for x in range(9) for y in range(9)]


@pytest.mark.parametrize("cells", [BOWL, RANDOMISH], ids=["bowl", "randomish"])
def test_d8_directions_match_reference(spark, cells):
    got = {
        (r["ix"], r["iy"]): (
            r["z"],
            None if r["dn_ix"] is None else (r["dn_ix"], r["dn_iy"]),
            r["drop_w"],
            r["is_sink"],
        )
        for r in d8_flow_directions(_dem_df(spark, cells)).collect()
    }
    assert got == _d8_ref(cells)


def test_d8_flow_strictly_descends(spark):
    z = dict(BOWL)
    for r in d8_flow_directions(_dem_df(spark, BOWL)).collect():
        if not r["is_sink"]:
            assert z[(r["dn_ix"], r["dn_iy"])] < r["z"]


@pytest.mark.parametrize("cells", [BOWL, RANDOMISH], ids=["bowl", "randomish"])
def test_flow_accumulation_matches_reference(spark, cells):
    flows = d8_flow_directions(_dem_df(spark, cells))
    ref_acc, _ = _flow_maps(_d8_ref(cells))
    got = {
        (r["ix"], r["iy"]): r["acc"]
        for r in flow_accumulation(flows).collect()
    }
    assert got == ref_acc
    # mass balance: every cell drains somewhere, each sink's acc counts
    # exactly its basin, and basins partition the grid
    sinks = {c for c, v in _d8_ref(cells).items() if v[3]}
    assert sum(got[s] for s in sinks) == len(cells)


@pytest.mark.parametrize("cells", [BOWL, RANDOMISH], ids=["bowl", "randomish"])
def test_watershed_labels_match_reference(spark, cells):
    flows = d8_flow_directions(_dem_df(spark, cells))
    _, ref_sink = _flow_maps(_d8_ref(cells))
    got = {
        (r["ix"], r["iy"]): (r["sink_ix"], r["sink_iy"])
        for r in watershed_labels(flows).collect()
    }
    assert got == ref_sink


def test_single_cell_grid_is_sink(spark):
    flows = d8_flow_directions(_dem_df(spark, [((0, 0), 5)]))
    [r] = flows.collect()
    assert (r["is_sink"], r["dn_ix"], r["drop_w"]) == (True, None, None)
    assert flow_accumulation(flows).collect()[0]["acc"] == 1
    [w] = watershed_labels(flows).collect()
    assert (w["sink_ix"], w["sink_iy"]) == (0, 0)


def test_hydrology_round_guards(spark):
    flows = d8_flow_directions(_dem_df(spark, [((0, 0), 5)]))
    with pytest.raises(ValueError):
        flow_accumulation(flows, max_rounds=-1)
    with pytest.raises(ValueError):
        watershed_labels(flows, max_rounds=-1)


# --- hillshade ---------------------------------------------------------------

from morituri_spark.geo.terrain import hillshade  # noqa: E402


def _hs_ref(cells, cell_size, az=315.0, alt=45.0):
    z = dict(cells)
    lx = math.cos(math.radians(alt)) * math.sin(math.radians(az))
    ly = math.cos(math.radians(alt)) * math.cos(math.radians(az))
    lz = math.sin(math.radians(alt))
    out = {}
    for (x, y) in z:
        nb = {(dx, dy): z.get((x + dx, y + dy)) for dx in (-1, 0, 1) for dy in (-1, 0, 1)}
        if any(v is None for v in nb.values()):
            continue
        gxn = (nb[(1, -1)] + 2 * nb[(1, 0)] + nb[(1, 1)]
               - nb[(-1, -1)] - 2 * nb[(-1, 0)] - nb[(-1, 1)])
        gyn = (nb[(-1, 1)] + 2 * nb[(0, 1)] + nb[(1, 1)]
               - nb[(-1, -1)] - 2 * nb[(0, -1)] - nb[(1, -1)])
        gx, gy = gxn / (8 * cell_size), gyn / (8 * cell_size)
        raw = (lz - lx * gx - ly * gy) / math.sqrt(1.0 + gx * gx + gy * gy)
        out[(x, y)] = (gxn, gyn, int(math.floor(255.0 * max(raw, 0.0) + 0.5 + 1e-8)))
    return out


def _hs_run(spark, cells, cell_size):
    df = spark.createDataFrame(
        [(x, y, z) for (x, y), z in cells], "ix long, iy long, z long"
    )
    return {
        (r["ix"], r["iy"]): (r["gx_num"], r["gy_num"], r["shade"])
        for r in hillshade(df, cell_size).collect()
    }


def test_hillshade_matches_reference(spark):
    cells = [((x, y), (x * 7 + y * 13) % 23) for x in range(8) for y in range(8)]
    assert _hs_run(spark, cells, 30.0) == _hs_ref(cells, 30.0)


def test_hillshade_flat_and_orientation(spark):
    # flat ground: shade = round(255*sin(45 deg)) = 180
    flat = [((x, y), 7) for x in range(3) for y in range(3)]
    assert _hs_run(spark, flat, 1.0) == {(1, 1): (0, 0, 180)}
    # NW-facing slope (downhill toward -x, +y) is brighter than flat;
    # SE-facing darker. z = x - y rises east, falls north -> faces NW.
    nw = [((x, y), x - y) for x in range(3) for y in range(3)]
    se = [((x, y), y - x) for x in range(3) for y in range(3)]
    assert _hs_run(spark, nw, 1.0)[(1, 1)][2] > 180 > _hs_run(spark, se, 1.0)[(1, 1)][2]


def test_hillshade_guard(spark):
    df = spark.createDataFrame([(0, 0, 1)], "ix long, iy long, z long")
    with pytest.raises(ValueError):
        hillshade(df, -1.0)


def test_box_filter_matches_loop(spark):
    import numpy as np

    from morituri_spark.geo.terrain import box_filter

    rng = np.random.RandomState(7)
    z = rng.randint(0, 100, size=(6, 9)).astype(np.int64)
    rows = [(int(x), int(y), int(z[y, x]))
            for y in range(6) for x in range(9)]
    dem = spark.createDataFrame(rows, "ix long, iy long, z long")
    got = {(r["ix"], r["iy"]): (r["box_sum"], r["box_n"])
           for r in box_filter(dem, radius=2).collect()}
    for y in range(6):
        for x in range(9):
            y0, y1 = max(0, y - 2), min(6, y + 3)
            x0, x1 = max(0, x - 2), min(9, x + 3)
            blk = z[y0:y1, x0:x1]
            assert got[(x, y)] == (int(blk.sum()), blk.size)


def test_box_filter_sparse_and_keys(spark):
    from morituri_spark.geo.terrain import box_filter

    # two keyed grids, one with a hole: absent cells don't contribute
    rows = [("a", 0, 0, 10), ("a", 1, 0, 20), ("a", 0, 1, 30),
            ("b", 0, 0, 5)]
    dem = spark.createDataFrame(rows, "g string, ix long, iy long, z long")
    got = {(r["g"], r["ix"], r["iy"]): (r["box_sum"], r["box_n"])
           for r in box_filter(dem, radius=1, keys=["g"]).collect()}
    assert got[("a", 0, 0)] == (60, 3)
    assert got[("b", 0, 0)] == (5, 1)
    import pytest

    with pytest.raises(ValueError):
        box_filter(dem, radius=-1, keys=["g"])


def _ref_visibility(z_row, eye):
    """z_row: list of ints; observer at x=0. Returns visible x set."""
    h = z_row[0] + eye
    vis = []
    best = None
    for x in range(1, len(z_row)):
        sq = ((z_row[x] - h) << 20) // x
        if best is None or sq > best:
            vis.append(x)
        if best is None or sq > best:
            best = sq
        # running max INCLUDES non-visible cells too
        best = max(best, sq)
    return vis


def test_ridge_visibility_matches_loop(spark):
    import numpy as np

    from morituri_spark.geo.terrain import ridge_visibility

    rng = np.random.RandomState(17)
    grid = rng.randint(0, 50, size=(5, 12)).astype(int)
    rows = [(int(y), int(x), int(grid[y, x]))
            for y in range(5) for x in range(12)]
    dem = spark.createDataFrame(rows, "iy long, ix long, z long")
    got = {r["iy"]: (r["n_visible"], r["chk_x"])
           for r in ridge_visibility(dem, eye_height=2).collect()}
    for y in range(5):
        vis = _ref_visibility(list(grid[y]), 2)
        assert got[y] == (len(vis), sum(vis)), f"row {y}"


def test_ridge_visibility_monotone_and_blocked(spark):
    from morituri_spark.geo.terrain import ridge_visibility

    # strictly rising terrain: every cell visible; then a wall hides all
    rising = [(0, x, 10 * x) for x in range(6)]
    wall = [(1, 0, 0), (1, 1, 100), (1, 2, 0), (1, 3, 0), (1, 4, 1)]
    dem = spark.createDataFrame(rising + wall, "iy long, ix long, z long")
    got = {r["iy"]: (r["n_visible"], r["chk_x"])
           for r in ridge_visibility(dem, eye_height=2).collect()}
    assert got[0] == (5, 1 + 2 + 3 + 4 + 5)
    assert got[1] == (1, 1)  # only the wall itself


def _ref_viewshed(grid, eye):
    """4-direction brute force under the quantized-slope contract.
    Returns {(y, x): dir_mask} with W=1, E=2, N=4, S=8."""
    H, W = len(grid), len(grid[0])

    def _sweep(series):
        # visible indices within a 1-D series, observer at index 0
        h = series[0] + eye
        vis, best = set(), None
        for d in range(1, len(series)):
            sq = ((series[d] - h) << 20) // d
            if best is None or sq > best:
                vis.add(d)
                best = sq if best is None else max(best, sq)
            else:
                best = max(best, sq)
        return vis

    mask = {(y, x): 0 for y in range(H) for x in range(W)}
    for y in range(H):
        row = [grid[y][x] for x in range(W)]
        for x in _sweep(row):
            mask[(y, x)] |= 1
        for d in _sweep(row[::-1]):
            mask[(y, W - 1 - d)] |= 2
    for x in range(W):
        col = [grid[y][x] for y in range(H)]
        for d in _sweep(col):
            mask[(d, x)] |= 4
        for d in _sweep(col[::-1]):
            mask[(H - 1 - d, x)] |= 8
    return mask


def test_cardinal_viewshed_matches_loop(spark):
    import numpy as np

    from morituri_spark.geo.terrain import cardinal_viewshed

    rng = np.random.RandomState(23)
    grid = rng.randint(0, 60, size=(7, 9)).astype(int)
    rows = [(int(y), int(x), int(grid[y, x]))
            for y in range(7) for x in range(9)]
    dem = spark.createDataFrame(rows, "iy long, ix long, z long")
    got = {(r["iy"], r["ix"]): (r["dir_mask"], r["n_dirs"])
           for r in cardinal_viewshed(dem, eye_height=2).collect()}
    want = _ref_viewshed(grid.tolist(), 2)
    assert len(got) == 63
    for (y, x), m in want.items():
        assert got[(y, x)] == (m, bin(m).count("1")), f"cell {(y, x)}"


def test_cardinal_viewshed_rising_ridge(spark):
    from morituri_spark.geo.terrain import cardinal_viewshed

    # one row linear west→east: the uphill slope (-2/d term rising) makes
    # every cell visible from W, and the downhill line of sight from E is
    # likewise progressively visible (slope −10 − 2/d increases with d)
    rows = [(0, x, 10 * x) for x in range(6)]
    dem = spark.createDataFrame(rows, "iy long, ix long, z long")
    got = {r["ix"]: r["dir_mask"] for r in
           cardinal_viewshed(dem, eye_height=2).collect()}
    for x in range(1, 6):
        assert got[x] & 1, f"x={x} should be W-visible"
    for x in range(5):
        assert got[x] & 2, f"x={x} should be E-visible"
    assert got[0] & 1 == 0 and got[5] & 2 == 0  # observer cells, d=0
    # 1-cell-tall columns: N/S sweeps have no d>0 cells anywhere
    assert not any(got[x] & 12 for x in range(6))
    # a wall hides the valley behind it from the W observer
    wall = [(1, 0, 0), (1, 1, 100), (1, 2, 0), (1, 3, 0), (1, 4, 1)]
    dem2 = spark.createDataFrame(wall, "iy long, ix long, z long")
    got2 = {r["ix"]: r["dir_mask"] for r in
            cardinal_viewshed(dem2, eye_height=2).collect()}
    assert got2[1] & 1 and not any(got2[x] & 1 for x in (2, 3, 4))
