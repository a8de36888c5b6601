"""blob_stats (multimodal/blobs.py) vs a scalar flood-fill reference and
planted component shapes."""

import numpy as np

from morituri_spark.multimodal.blobs import blob_stats, _label_components
from morituri_spark.sources import images as I


def _images_df(spark, arrays):
    rows = [
        (f"img{i}", bytearray(I.encode(a, "png")), "png", a.shape[1], a.shape[0])
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )


def _ref_components(mask):
    """Scalar BFS flood fill, 4-connectivity, label = min row-major id."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    comps = {}
    for y in range(h):
        for x in range(w):
            if not mask[y, x] or seen[y, x]:
                continue
            stack, px = [(y, x)], []
            seen[y, x] = True
            while stack:
                cy, cx = stack.pop()
                px.append((cy, cx))
                for ny, nx in ((cy-1, cx), (cy+1, cx), (cy, cx-1), (cy, cx+1)):
                    if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            lbl = min(cy * w + cx for cy, cx in px)
            xs = [c for _, c in px]
            ys = [r for r, _ in px]
            comps[lbl] = (
                len(px), min(xs), min(ys), max(xs), max(ys), sum(xs), sum(ys)
            )
    return comps


def _mask_to_rgb(mask, hi=200):
    a = np.zeros((*mask.shape, 3), dtype=np.uint8)
    a[mask] = hi  # g3 = 600 >= 384
    return a


def test_label_kernel_matches_floodfill_random(spark):
    rng_like = (np.arange(20 * 17) * 2654435761 % 97).reshape(20, 17)
    mask = rng_like < 40  # ~40% density, many components
    lbl = _label_components(mask)
    ref = _ref_components(mask)
    got = {}
    for y, x in zip(*np.nonzero(mask)):
        got.setdefault(int(lbl[y, x]), []).append((int(y), int(x)))
    assert set(got) == set(ref)
    for k, px in got.items():
        xs = [c for _, c in px]; ys = [r for r, _ in px]
        assert (len(px), min(xs), min(ys), max(xs), max(ys), sum(xs), sum(ys)) == ref[k]


def test_two_blocks_and_snake(spark):
    mask = np.zeros((16, 16), dtype=bool)
    mask[1:4, 1:4] = True          # 3x3 block, label 1*16+1 = 17
    mask[10:12, 10:13] = True      # 2x3 block, label 10*16+10 = 170
    # a snake: long geodesic path exercises propagation rounds
    mask[6, 1:15] = True
    mask[7, 14] = True
    mask[8, 1:15] = True
    r = {
        row["label"]: row
        for row in blob_stats(
            _images_df(spark, [_mask_to_rgb(mask)]), threshold=384
        ).collect()
    }
    assert set(r) == {17, 170, 6 * 16 + 1}
    assert r[17]["n_pixels"] == 9 and r[17]["max_x"] == 3
    assert r[170]["n_pixels"] == 6 and r[170]["min_y"] == 10
    assert r[6 * 16 + 1]["n_pixels"] == 14 + 1 + 14


def test_diagonal_touch_is_not_connected(spark):
    mask = np.zeros((8, 8), dtype=bool)
    mask[2, 2] = True
    mask[3, 3] = True  # diagonal only — 4-connectivity keeps them apart
    out = blob_stats(_images_df(spark, [_mask_to_rgb(mask)]), threshold=384)
    assert out.count() == 2


def test_empty_mask_emits_nothing(spark):
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert blob_stats(_images_df(spark, [a]), threshold=1).count() == 0


def test_full_mask_is_one_component(spark):
    a = np.full((8, 8, 3), 200, dtype=np.uint8)
    r = blob_stats(_images_df(spark, [a]), threshold=384).collect()
    assert len(r) == 1
    assert r[0]["label"] == 0 and r[0]["n_pixels"] == 64
    assert r[0]["sum_x"] == 64 * 3.5 and r[0]["sum_y"] == 64 * 3.5