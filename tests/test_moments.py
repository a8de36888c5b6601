"""image_moments (multimodal/moments.py) vs a plain-loop reference."""

import numpy as np

from morituri_spark.multimodal.moments import _moments_one, image_moments
from morituri_spark.sources import images as I


def _ref(mask):
    m = {k: 0 for k in ("m00", "m10", "m01", "m20", "m02", "m11")}
    for y in range(mask.shape[0]):
        for x in range(mask.shape[1]):
            if mask[y, x]:
                m["m00"] += 1
                m["m10"] += x
                m["m01"] += y
                m["m20"] += x * x
                m["m02"] += y * y
                m["m11"] += x * y
    if m["m00"] == 0:
        return None
    return (
        m["m00"], m["m10"], m["m01"], m["m20"], m["m02"], m["m11"],
        m["m00"] * m["m20"] - m["m10"] ** 2,
        m["m00"] * m["m02"] - m["m01"] ** 2,
        m["m00"] * m["m11"] - m["m10"] * m["m01"],
    )


def test_kernel_matches_loop():
    rng = np.random.RandomState(19)
    mask = rng.rand(9, 13) < 0.4
    assert _moments_one(mask) == _ref(mask)
    assert _moments_one(np.zeros((4, 4), dtype=bool)) is None


def test_central_numerators_are_translation_covariant():
    # a single 2x3 block: central numerators must not depend on position
    def block_at(y0, x0):
        m = np.zeros((12, 12), dtype=bool)
        m[y0 : y0 + 2, x0 : x0 + 3] = True
        return _moments_one(m)[6:]

    assert block_at(1, 2) == block_at(7, 5)
    # and a symmetric blob has zero mixed central numerator
    sq = np.zeros((8, 8), dtype=bool)
    sq[2:5, 2:5] = True
    assert _moments_one(sq)[8] == 0


def test_spark_matches_reference(spark):
    rng = np.random.RandomState(29)
    rows, arrs = [], {}
    for i in range(4):
        arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 12, 10))
        arrs[f"im{i}"] = arr.astype(np.int64).sum(axis=2) >= 384
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {
        r["image_id"]: (
            r["m00"], r["m10"], r["m01"], r["m20"], r["m02"], r["m11"],
            r["mu20n"], r["mu02n"], r["mu11n"],
        )
        for r in image_moments(df, threshold=384).collect()
    }
    exp = {k: _ref(m) for k, m in arrs.items() if _ref(m) is not None}
    assert got == exp
