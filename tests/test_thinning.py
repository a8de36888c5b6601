"""Zhang-Suen thinning (multimodal/thinning.py) vs a plain-loop
reference of the published algorithm."""

import numpy as np

from morituri_spark.multimodal.thinning import (
    RING,
    _chk,
    thinning_stats,
    zhang_suen_step,
)
from morituri_spark.sources import images as I


def _ref_step(m, phase):
    h, w = m.shape

    def at(y, x):
        return int(m[y, x]) if 0 <= y < h and 0 <= x < w else 0

    out = m.copy()
    for y in range(h):
        for x in range(w):
            if m[y, x] != 1:
                continue
            nb = [at(y + dy, x + dx) for dy, dx in RING]
            b = sum(nb)
            a = sum(
                1 for k in range(8) if nb[k] == 0 and nb[(k + 1) % 8] == 1
            )
            p2, p4, p6, p8 = nb[0], nb[2], nb[4], nb[6]
            if phase == 0:
                ok = p2 * p4 * p6 == 0 and p4 * p6 * p8 == 0
            else:
                ok = p2 * p4 * p8 == 0 and p2 * p6 * p8 == 0
            if 2 <= b <= 6 and a == 1 and ok:
                out[y, x] = 0
    return out


def test_step_matches_loop_both_phases():
    rng = np.random.RandomState(3)
    m = (rng.rand(10, 14) < 0.6).astype(np.int64)
    for phase in (0, 1):
        assert np.array_equal(zhang_suen_step(m, phase), _ref_step(m, phase))


def test_thick_bar_thins_to_thin_stroke():
    m = np.zeros((9, 12), dtype=np.int64)
    m[3:6, 1:11] = 1  # 3x10 bar
    for k in range(8):
        m = zhang_suen_step(m, k % 2)
    # converged: one more full iteration changes nothing
    assert np.array_equal(zhang_suen_step(zhang_suen_step(m, 0), 1), m)
    # skeleton is a thin stroke: every column of the original bar keeps
    # at most one pixel
    assert m.sum() > 0 and (m.sum(axis=0) <= 1).all()


def test_isolated_and_2x2_preserved():
    m = np.zeros((6, 6), dtype=np.int64)
    m[1, 1] = 1  # isolated: B=0 -> kept
    m[3:5, 3:5] = 1  # 2x2 square: A=1,B=3 but G-conditions... paper keeps
    out = zhang_suen_step(m, 0)
    assert out[1, 1] == 1


def test_spark_matches_reference(spark):
    rng = np.random.RandomState(41)
    rows, arrs = [], {}
    for i in range(4):
        arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 12, 10))
        arrs[f"im{i}"] = arr.astype(np.int64).sum(axis=2)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {
        r["image_id"]: (r["n_mask"], r["n_skel"], r["n_deleted"],
                        r["chk_skel"])
        for r in thinning_stats(df, threshold=384, n_steps=6).collect()
    }
    for k, g3 in arrs.items():
        m = (g3 >= 384).astype(np.int64)
        n_mask = int(m.sum())
        for s in range(6):
            m = _ref_step(m, s % 2)
        assert got[k] == (n_mask, int(m.sum()), n_mask - int(m.sum()),
                          _chk(m))
