"""color_histograms / histogram_near_duplicates (multimodal/ops.py)."""

import numpy as np
import pytest

from morituri_spark.multimodal.ops import color_histograms, histogram_near_duplicates
from morituri_spark.sources import images as I


def _img(i, w=8, h=8):
    ys, xs = np.mgrid[0:h, 0:w]
    arr = np.empty((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = (i + 2 * ys + 3 * xs) % 256
    arr[:, :, 1] = (2 * i + ys + 5 * xs) % 256
    arr[:, :, 2] = (3 * i + 4 * ys + xs) % 256
    return arr


def _table(spark, arrays):
    rows = [
        (f"img{i:04d}", bytearray(I.encode(a, "png")), "png", a.shape[1], a.shape[0])
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )


def _ref_hist(arr, b=4):
    s = 256 // b
    q = (arr // s).astype(np.int64)
    code = (q[:, :, 0] * b + q[:, :, 1]) * b + q[:, :, 2]
    vals, counts = np.unique(code.ravel(), return_counts=True)
    return dict(zip(vals.tolist(), counts.tolist()))


def test_histograms_match_numpy(spark):
    arrays = [_img(i) for i in range(6)]
    got = {}
    for r in color_histograms(_table(spark, arrays)).collect():
        got.setdefault(r["image_id"], {})[r["bin"]] = r["cnt"]
    for i, a in enumerate(arrays):
        assert got[f"img{i:04d}"] == _ref_hist(a)
        assert sum(got[f"img{i:04d}"].values()) == 64


def test_histogram_near_duplicates_match_bruteforce(spark):
    # 0 and 6 share pixels mod 256 shifts; craft exact dup + near pairs
    arrays = [_img(i) for i in [0, 1, 2, 0, 50, 51]]
    hists = color_histograms(_table(spark, arrays))
    refs = [_ref_hist(a) for a in arrays]

    def dom(h):
        return min(((-c, b) for b, c in h.items()))[1]

    def l1(x, y):
        bins = set(x) | set(y)
        return sum(abs(x.get(t, 0) - y.get(t, 0)) for t in bins)

    thr = 40
    expected = sorted(
        (f"img{i:04d}", f"img{j:04d}", l1(refs[i], refs[j]))
        for i in range(len(refs))
        for j in range(i + 1, len(refs))
        if dom(refs[i]) == dom(refs[j]) and l1(refs[i], refs[j]) <= thr
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["l1"])
        for r in histogram_near_duplicates(hists, max_l1=thr, total=64).collect()
    )
    assert got == expected
    assert ("img0000", "img0003", 0) in got  # the planted exact duplicate


def test_histogram_bins_guard(spark):
    with pytest.raises(ValueError):
        color_histograms(_table(spark, [_img(0)]), bins_per_channel=3)
