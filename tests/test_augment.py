"""augment_images (multimodal/ops.py) vs NumPy-transformed references."""

import numpy as np
import pytest

from morituri_spark.multimodal.ops import augment_images
from morituri_spark.sources import images as I


def _img(i, w=6, h=4):
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


_REF_OPS = {
    "identity": lambda a: a,
    "hflip": lambda a: a[:, ::-1],
    "vflip": lambda a: a[::-1, :],
    "rot180": lambda a: a[::-1, ::-1],
    "rot90": lambda a: np.rot90(a),
    "rot270": lambda a: np.rot90(a, 3),
}


def _checksum(t):
    t = t.astype(np.int64)
    th, tw = t.shape[:2]
    pos = np.arange(1, th * tw + 1, dtype=np.int64).reshape(th, tw)
    return int((pos * (t[:, :, 0] + 2 * t[:, :, 1] + 3 * t[:, :, 2])).sum())


def test_augment_matches_numpy_rectangular(spark):
    arrays = [_img(i) for i in range(4)]
    got = {
        (r["image_id"], r["op"]): r
        for r in augment_images(_table(spark, arrays)).collect()
    }
    assert len(got) == 4 * 6
    for i, a in enumerate(arrays):
        for op, fn in _REF_OPS.items():
            r = got[(f"img{i:04d}", op)]
            t = np.ascontiguousarray(fn(a))
            assert (r["out_h"], r["out_w"]) == t.shape[:2]
            assert r["checksum"] == _checksum(t)
            # the emitted PNG decodes to exactly the transformed pixels
            assert (I.decode(bytes(r["png"]), "png") == t).all()


def test_augment_subset_and_guard(spark):
    arrays = [_img(0)]
    rows = augment_images(_table(spark, arrays), ops=["hflip"]).collect()
    assert [r["op"] for r in rows] == ["hflip"]
    with pytest.raises(ValueError):
        augment_images(_table(spark, arrays), ops=["sepia"])
