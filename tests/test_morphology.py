"""morphology_stats (multimodal/morphology.py) vs a plain-loop reference."""

import numpy as np

from morituri_spark.multimodal.morphology import (
    _chk, _dilate3, _erode3, morphology_stats,
)
from morituri_spark.sources import images as I


def _ref_erode(m):
    h, w = m.shape
    out = np.zeros_like(m)
    for y in range(h):
        for x in range(w):
            v = True
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    nb = m[yy, xx] if 0 <= yy < h and 0 <= xx < w else False
                    v = v and nb
            out[y, x] = v
    return out


def _ref_dilate(m):
    h, w = m.shape
    out = np.zeros_like(m)
    for y in range(h):
        for x in range(w):
            v = False
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and m[yy, xx]:
                        v = True
            out[y, x] = v
    return out


def test_kernels_match_loop_reference():
    rng = np.random.RandomState(3)
    for _ in range(5):
        m = rng.rand(9, 13) < 0.4
        assert np.array_equal(_erode3(m), _ref_erode(m))
        assert np.array_equal(_dilate3(m), _ref_dilate(m))


def test_opening_removes_speckle_closing_fills_hole():
    m = np.zeros((8, 8), dtype=bool)
    m[2:6, 2:6] = True          # solid 4x4 block
    m[4, 4] = False             # one-pixel hole
    m[0, 7] = True              # isolated speckle
    op = _dilate3(_erode3(m))
    cl = _erode3(_dilate3(m))
    assert not op[0, 7]                      # speckle gone
    assert cl[4, 4]                          # hole closed
    # opening is anti-extensive everywhere; closing is extensive only in
    # the interior under the outside-is-0 border convention (the erosion
    # step clears border-adjacent pixels — documented in the module)
    assert (op <= m).all()
    assert (m[1:-1, 1:-1] <= cl[1:-1, 1:-1]).all()


def test_checksum_is_membership_sensitive():
    a = np.zeros((4, 4), dtype=bool)
    b = np.zeros((4, 4), dtype=bool)
    a[1, 1] = True
    b[1, 2] = True
    assert a.sum() == b.sum() and _chk(a) != _chk(b)


def test_stats_over_real_png(spark):
    rows = []
    rng = np.random.RandomState(11)
    for i in range(6):
        arr = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", I.encode(arr, "png"), "png", 12, 10, arr))
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1]), r[2], r[3], r[4]) for r in rows],
        "image_id string, bytes binary, fmt string, w int, h int",
    )
    got = {r["image_id"]: r.asDict() for r in morphology_stats(df, 384).collect()}
    for image_id, _, _, _, _, arr in rows:
        m = arr.astype(np.int64).sum(axis=2) >= 384
        er, di = _ref_erode(m), _ref_dilate(m)
        op, cl = _ref_dilate(er), _ref_erode(di)
        g = got[image_id]
        assert g["n_mask"] == int(m.sum())
        assert g["n_erode"] == int(er.sum())
        assert g["n_dilate"] == int(di.sum())
        assert g["n_open"] == int(op.sum())
        assert g["n_close"] == int(cl.sum())
        assert g["chk_mask"] == _chk(m)
        assert g["chk_open"] == _chk(op)
        assert g["chk_close"] == _chk(cl)
