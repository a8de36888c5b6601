"""texture descriptors (multimodal/texture.py) vs plain-loop references."""

import numpy as np

from morituri_spark.multimodal.texture import (
    LBP_RING,
    _glcm_one,
    _lbp_one,
    _runs_one,
    glcm_features,
    lbp_histogram,
    run_length_hist,
)
from morituri_spark.sources import images as I


def _ref_glcm(g3, levels, dy, dx):
    h, w = g3.shape
    lv = (g3 * levels) // 766
    c = {}
    for y in range(h):
        for x in range(w):
            yy, xx = y + dy, x + dx
            if 0 <= yy < h and 0 <= xx < w:
                key = (int(lv[y, x]), int(lv[yy, xx]))
                c[key] = c.get(key, 0) + 1
    n = sum(c.values())
    contrast = sum(v * (i - j) ** 2 for (i, j), v in c.items())
    energy = sum(v * v for v in c.values())
    homog = sum(v * (840 // (1 + abs(i - j))) for (i, j), v in c.items())
    return (n, contrast, energy, homog)


def _ref_lbp(g3):
    h, w = g3.shape
    hist = [0] * 256
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            code = 0
            for dy, dx, wgt in LBP_RING:
                if g3[y + dy, x + dx] >= g3[y, x]:
                    code += wgt
            hist[code] += 1
    return hist


def _ref_runs(mask):
    lens = []
    for row in mask:
        run = 0
        for v in list(row) + [False]:
            if v:
                run += 1
            elif run:
                lens.append(run)
                run = 0
    return lens


def test_glcm_kernel_matches_loop():
    rng = np.random.RandomState(7)
    g3 = rng.randint(0, 766, size=(9, 11)).astype(np.int64)
    rows = _glcm_one(g3, 8, [(0, 1), (1, 0), (1, 1)])
    for dy, dx, n, con, en, ho in rows:
        assert (n, con, en, ho) == _ref_glcm(g3, 8, dy, dx)
    # pair count sanity: (h)·(w-1) for the (0,1) offset
    assert rows[0][2] == 9 * 10


def test_glcm_constant_image_is_pure_diagonal():
    g3 = np.full((6, 6), 300, dtype=np.int64)
    (dy, dx, n, con, en, ho) = _glcm_one(g3, 8, [(0, 1)])[0]
    assert (con, en, ho) == (0, n * n, 840 * n)


def test_lbp_kernel_matches_loop():
    rng = np.random.RandomState(9)
    g3 = rng.randint(0, 766, size=(8, 10)).astype(np.int64)
    assert _lbp_one(g3).tolist() == _ref_lbp(g3)
    # flat image: every neighbor >= center, so every interior pixel is 255
    flat = np.full((5, 5), 42, dtype=np.int64)
    h = _lbp_one(flat)
    assert h[255] == 9 and h.sum() == 9


def test_runs_kernel_matches_loop():
    rng = np.random.RandomState(11)
    mask = rng.rand(7, 13) < 0.5
    got = np.concatenate([_runs_one(r) for r in mask]).tolist()
    assert sorted(got) == sorted(_ref_runs(mask))
    assert _runs_one(np.zeros(5, dtype=bool)).size == 0
    assert _runs_one(np.ones(5, dtype=bool)).tolist() == [5]


def test_spark_matches_reference(spark):
    rng = np.random.RandomState(23)
    rows = []
    arrs = {}
    for i in range(4):
        arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 12, 10))
        arrs[f"im{i}"] = arr.astype(np.int64).sum(axis=2)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )

    for r in glcm_features(df, levels=8).collect():
        exp = _ref_glcm(arrs[r["image_id"]], 8, r["dy"], r["dx"])
        assert (r["n_pairs"], r["contrast"], r["energy_sq"],
                r["homog840"]) == exp

    got_lbp = {}
    for r in lbp_histogram(df).collect():
        got_lbp.setdefault(r["image_id"], {})[r["code"]] = r["cnt"]
    for k, g3 in arrs.items():
        exp = {c: v for c, v in enumerate(_ref_lbp(g3)) if v}
        assert got_lbp[k] == exp

    got_rle = {}
    for r in run_length_hist(df, threshold=384).collect():
        got_rle.setdefault(r["image_id"], {})[r["run_len"]] = r["cnt"]
    for k, g3 in arrs.items():
        lens = _ref_runs(g3 >= 384)
        exp = {}
        for ln in lens:
            exp[ln] = exp.get(ln, 0) + 1
        assert got_rle.get(k, {}) == exp


def test_orientation_histogram_matches_loop(spark):
    from morituri_spark.multimodal.corners import _sobel
    from morituri_spark.multimodal.edges import orientation_histogram

    rng = np.random.RandomState(37)
    rows, arrs = [], {}
    for i in range(3):
        arr = (rng.rand(9, 11, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 11, 9))
        arrs[f"im{i}"] = arr.astype(np.int64).sum(axis=2)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {}
    for r in orientation_histogram(df).collect():
        got.setdefault(r["image_id"], {})[r["octant"]] = (
            r["n_pixels"], r["sum_mag"]
        )
    for k, g3 in arrs.items():
        gx, gy = _sobel(g3)
        exp = {}
        for y in range(gx.shape[0]):
            for x in range(gx.shape[1]):
                a, b = int(gx[y, x]), int(gy[y, x])
                if a == 0 and b == 0:
                    continue
                o = (a > 0) + 2 * (b > 0) + 4 * (abs(a) >= abs(b))
                n, s = exp.get(o, (0, 0))
                exp[o] = (n + 1, s + abs(a) + abs(b))
        assert got[k] == exp
