"""median filter + SAD template match (multimodal/filters.py) vs loops."""

import numpy as np

from morituri_spark.multimodal.filters import (
    _median3,
    _sad_best,
    default_template,
    median_filter_stats,
    template_match_sad,
)
from morituri_spark.sources import images as I


def _ref_median(g3):
    h, w = g3.shape
    out = np.zeros((h - 2, w - 2), dtype=np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            vals = sorted(
                int(g3[y + dy, x + dx])
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            )
            out[y - 1, x - 1] = vals[4]
    return out


def _ref_sad(g3, t):
    h, w = g3.shape
    th, tw = t.shape
    best = None
    for y0 in range(h - th + 1):
        for x0 in range(w - tw + 1):
            s = int(
                np.abs(g3[y0 : y0 + th, x0 : x0 + tw] - t).sum()
            )
            k = (s, y0, x0)
            if best is None or k < best:
                best = k
    return (best[1], best[2], best[0])


def test_median_kernel_matches_loop():
    rng = np.random.RandomState(3)
    g3 = rng.randint(0, 766, size=(9, 12)).astype(np.int64)
    assert np.array_equal(_median3(g3), _ref_median(g3))
    # constant field: median is the constant
    flat = np.full((5, 6), 123, dtype=np.int64)
    assert (_median3(flat) == 123).all()


def test_sad_kernel_matches_loop_and_finds_planted():
    rng = np.random.RandomState(5)
    t = default_template()
    g3 = rng.randint(0, 766, size=(11, 13)).astype(np.int64)
    assert _sad_best(g3, t) == _ref_sad(g3, t)
    # plant the template: SAD 0 at the planted offset wins
    g3[4 : 4 + 4, 6 : 6 + 4] = t
    assert _sad_best(g3, t) == (4, 6, 0)
    # too-big template
    assert _sad_best(np.zeros((3, 3), dtype=np.int64), t) is None


def test_spark_matches_reference(spark):
    rng = np.random.RandomState(31)
    rows, arrs = [], {}
    for i in range(4):
        arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 12, 10))
        arrs[f"im{i}"] = arr.astype(np.int64).sum(axis=2)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )

    for r in median_filter_stats(df).collect():
        g3 = arrs[r["image_id"]]
        med = _ref_median(g3)
        hh, ww = g3.shape
        ys, xs = np.mgrid[1 : hh - 1, 1 : ww - 1]
        pos = ys * ww + xs + 1
        assert r["n_interior"] == med.size
        assert r["sum_med"] == int(med.sum())
        assert r["chk_pos"] == int((pos * med).sum())
        assert (r["min_med"], r["max_med"]) == (int(med.min()), int(med.max()))

    t = default_template()
    got = {r["image_id"]: (r["y0"], r["x0"], r["sad"])
           for r in template_match_sad(df).collect()}
    for k, g3 in arrs.items():
        assert got[k] == _ref_sad(g3, t)
