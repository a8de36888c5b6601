"""render_density_tiles (geo/render.py) vs a NumPy brute-force raster."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo.render import render_density_tiles
from morituri_spark.sources import images as I


def _points(spark, n=5000):
    return spark.range(0, n).select(
        ((F.col("id") * 7919) % 360000 / 1000.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729) % 180000 / 1000.0 - 90.0).alias("lat"),
    )


def _brute(n, tile_res, px_bits, cap):
    """world raster + per-tile sparse dict, straight from the cell math."""
    ids = np.arange(n, dtype=np.int64)
    lon = (ids * 7919) % 360000 / 1000.0 - 180.0
    lat = (ids * 104729) % 180000 / 1000.0 - 90.0
    res = tile_res + px_bits
    g = 1 << res
    x = np.clip(np.floor((lon + 180.0) / 360.0 * g).astype(np.int64), 0, g - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * g).astype(np.int64), 0, g - 1)
    w = 1 << px_bits
    tiles = {}
    for xi, yi in zip(x, y):
        t = (tile_res << 58) + ((xi >> px_bits) << 29) + (yi >> px_bits)
        li = (yi & (w - 1)) * w + (xi & (w - 1))
        tiles.setdefault(t, {})[li] = tiles.setdefault(t, {}).get(li, 0) + 1
    return {
        t: {li: min(c, cap) for li, c in d.items()} for t, d in tiles.items()
    }, {t: sum(d.values()) for t, d in tiles.items()}


@pytest.mark.parametrize("cap", [255, 2])
def test_render_matches_bruteforce(spark, cap):
    got = render_density_tiles(
        _points(spark), tile_res=2, px_bits=3, value_cap=cap
    ).collect()
    want, want_npts = _brute(5000, 2, 3, cap)
    assert {r["tile"] for r in got} == set(want)
    w = 8
    for r in got:
        d = want[r["tile"]]
        assert r["n_points"] == want_npts[r["tile"]]
        assert r["n_pixels"] == len(d)
        assert r["raster_sum"] == sum(d.values()) == r["decoded_sum"]
        ck = 0
        for li, v in d.items():
            ck ^= (li + 1) * (1 << 32) + v
        assert r["px_checksum"] == ck
        assert r["decode_ok"]
        # the PNG payload itself re-decodes to the brute-force raster
        img = I.decode(bytes(r["png"]), "png")
        ref = np.zeros((w, w), dtype=np.uint8)
        for li, v in d.items():
            ref.flat[li] = v
        assert (img[:, :, 0] == ref).all() and (img[:, :, 1] == ref).all()


def test_render_guards(spark):
    with pytest.raises(ValueError):
        render_density_tiles(_points(spark, 10), tile_res=2, px_bits=9)
    with pytest.raises(ValueError):
        render_density_tiles(_points(spark, 10), tile_res=2, px_bits=4, value_cap=256)
    with pytest.raises(ValueError):
        render_density_tiles(_points(spark, 10), tile_res=28, px_bits=4)
