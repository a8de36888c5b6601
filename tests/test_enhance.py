"""equalize_otsu / gray_histograms (multimodal/enhance.py) vs a NumPy
full-threshold-sweep reference on real PNG payloads."""

import numpy as np
import pandas as pd

from morituri_spark.multimodal.enhance import equalize_otsu, gray_histograms
from morituri_spark.sources import images as I


def _images_df(spark, arrays):
    rows = [
        (f"img{i}", bytearray(I.encode(a, "png")), "png", a.shape[1], a.shape[0])
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )


def _ref_otsu(g3):
    """Exact integer Otsu over 3x-gray values; returns the full stat row."""
    v, cnt = np.unique(g3.ravel(), return_counts=True)
    v = v.astype(np.int64)
    cnt = cnt.astype(np.int64)
    n, s = int(cnt.sum()), int((v * cnt).sum())
    best = None
    for idx in range(len(v)):
        c0 = int(cnt[: idx + 1].sum())
        s0 = int((v[: idx + 1] * cnt[: idx + 1]).sum())
        if c0 >= n:
            continue
        num = s0 * (n - c0) - (s - s0) * c0
        sigma = float(num * num) / float(c0 * (n - c0))
        if best is None or sigma > best[0]:
            best = (sigma, int(v[idx]), num * num, c0 * (n - c0))
    _, t, numsq, den = best
    fg = v > t
    cdf = np.cumsum(cnt)
    cdf_min = int(cnt[0])
    eq = np.floor((cdf - cdf_min) * 765 / (n - cdf_min)).astype(np.int64)
    return {
        "otsu_t": t,
        "sigma_num_sq": numsq,
        "sigma_den": den,
        "fg_cnt": int(cnt[fg].sum()),
        "fg_sum": int((v[fg] * cnt[fg]).sum()),
        "eq_checksum": int((cnt * eq).sum()),
        "eq_cross": int((cnt * v * eq).sum()),
    }


def _grad(i, w=16, h=16):
    ys, xs = np.mgrid[0:h, 0:w]
    a = np.empty((h, w, 3), dtype=np.uint8)
    a[:, :, 0] = (i + 2 * ys + 3 * xs) % 256
    a[:, :, 1] = (2 * i + ys + 5 * xs) % 256
    a[:, :, 2] = (3 * i + 4 * ys + xs) % 256
    return a


def test_gray_histograms_exact(spark):
    arrays = [_grad(i) for i in range(4)]
    out = gray_histograms(_images_df(spark, arrays)).toPandas()
    for i, a in enumerate(arrays):
        g3 = a.astype(np.int64).sum(axis=2)
        v, c = np.unique(g3.ravel(), return_counts=True)
        sub = out[out.image_id == f"img{i}"].sort_values("v")
        assert list(sub.v) == list(v)
        assert list(sub.cnt) == list(c)
        assert sub.cnt.sum() == 256


def test_otsu_matches_full_sweep_reference(spark):
    arrays = [_grad(i) for i in range(8)]
    # add a bimodal image: two flat blocks -> textbook threshold between
    bi = np.zeros((16, 16, 3), dtype=np.uint8)
    bi[8:, :, :] = 200
    arrays.append(bi)
    got = equalize_otsu(_images_df(spark, arrays)).toPandas()
    got = got.set_index("image_id")
    for i, a in enumerate(arrays):
        ref = _ref_otsu(a.astype(np.int64).sum(axis=2))
        row = got.loc[f"img{i}"]
        for k, want in ref.items():
            assert row[k] == want, (i, k, row[k], want)


def test_bimodal_threshold_separates_blocks(spark):
    bi = np.zeros((16, 16, 3), dtype=np.uint8)
    bi[8:, :, :] = 200
    r = equalize_otsu(_images_df(spark, [bi])).collect()[0]
    assert r["otsu_t"] == 0  # foreground = v > 0, exactly the 200-block
    assert r["fg_cnt"] == 128
    assert r["fg_sum"] == 128 * 600


def test_equalization_spreads_to_full_range(spark):
    # two-level image: eq maps cdf to {0, 765} extremes
    bi = np.zeros((16, 16, 3), dtype=np.uint8)
    bi[8:, :, :] = 200
    r = equalize_otsu(_images_df(spark, [bi])).collect()[0]
    # eq(v=0) = 0, eq(v=600) = 765; checksum = 128*0 + 128*765
    assert r["eq_checksum"] == 128 * 765
    assert r["eq_cross"] == 128 * 600 * 765
