"""extract_patches (multimodal/ops.py) vs NumPy slicing reference."""
import numpy as np

from morituri_spark.multimodal.ops import extract_patches
from morituri_spark.sources import images as I


def _img_df(spark, arrs):
    rows = [
        (f"img{i:04d}", I.encode(a, "png"), "png", a.shape[1], a.shape[0])
        for i, a in enumerate(arrs)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )


def test_patch_grid_and_payload(spark):
    rng = np.random.default_rng(7)
    arrs = [rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8) for _ in range(3)]
    got = extract_patches(_img_df(spark, arrs), patch=8).collect()
    # 16x24 at p=8 → 2×3 grid per image
    assert len(got) == 3 * 2 * 3
    p = 8
    wts = np.arange(1, p * p * 3 + 1, dtype=np.int64).reshape(p, p, 3)
    for r in got:
        a = arrs[int(r["image_id"][3:])]
        blk = a[r["py"] * p:(r["py"] + 1) * p, r["px"] * p:(r["px"] + 1) * p]
        assert bytes(r["patch_bytes"]) == blk.tobytes()
        b64 = blk.astype(np.int64)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(
            int(x) for x in b64.sum(axis=(0, 1))
        )
        assert r["checksum"] == int((b64 * wts).sum())
        assert r["mean_gray"] == int(b64.sum()) / float(3 * p * p)


def test_remainder_pixels_dropped(spark):
    a = np.arange(13 * 10 * 3, dtype=np.uint8).reshape(13, 10, 3)
    got = extract_patches(_img_df(spark, [a]), patch=8).collect()
    assert len(got) == 1 and (got[0]["py"], got[0]["px"]) == (0, 0)
    assert bytes(got[0]["patch_bytes"]) == a[:8, :8].tobytes()


def test_image_smaller_than_patch_yields_nothing(spark):
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    assert extract_patches(_img_df(spark, [a]), patch=8).count() == 0
