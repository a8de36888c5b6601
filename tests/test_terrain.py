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
