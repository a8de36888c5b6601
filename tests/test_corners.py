"""harris_corners (multimodal/corners.py) vs a plain-loop reference."""

import numpy as np
from pyspark.sql import functions as F

from morituri_spark.multimodal.corners import _box3, _sobel, harris_corners
from morituri_spark.sources import images as I

SOB_X = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
SOB_Y = [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]


def _ref_corners(g3, k):
    h, w = g3.shape
    resp = {}
    gx = np.zeros((h, w), dtype=np.int64)
    gy = np.zeros((h, w), dtype=np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            gx[y, x] = sum(
                SOB_X[dy + 1][dx + 1] * g3[y + dy, x + dx]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            )
            gy[y, x] = sum(
                SOB_Y[dy + 1][dx + 1] * g3[y + dy, x + dx]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            )
    for y in range(2, h - 2):
        for x in range(2, w - 2):
            sxx = syy = sxy = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sxx += int(gx[y + dy, x + dx]) ** 2
                    syy += int(gy[y + dy, x + dx]) ** 2
                    sxy += int(gx[y + dy, x + dx]) * int(gy[y + dy, x + dx])
            r20 = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
            if r20 > 0:
                resp[(y, x)] = r20
    ranked = sorted(resp.items(), key=lambda t: (-t[1], t[0][0], t[0][1]))[:k]
    return [(r + 1, y, x, v) for r, ((y, x), v) in enumerate(ranked)]


def test_sobel_and_box_match_loop():
    rng = np.random.RandomState(5)
    g3 = rng.randint(0, 766, size=(9, 11)).astype(np.int64)
    gx, gy = _sobel(g3)
    for y in range(1, 8):
        for x in range(1, 10):
            wx = sum(SOB_X[dy + 1][dx + 1] * g3[y + dy, x + dx]
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            wy = sum(SOB_Y[dy + 1][dx + 1] * g3[y + dy, x + dx]
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1))
            assert gx[y - 1, x - 1] == wx and gy[y - 1, x - 1] == wy
    b = _box3(g3)
    assert b[0, 0] == g3[0:3, 0:3].sum()
    assert b[-1, -1] == g3[-3:, -3:].sum()


def test_checkerboard_corner_beats_flat():
    # a 2x2-block checkerboard has strong corners; a flat image has none
    g = np.zeros((12, 12), dtype=np.int64)
    g[:6, :6] = 765
    g[6:, 6:] = 765
    arr = np.repeat((g // 3).astype(np.uint8)[:, :, None], 3, axis=2)
    g3 = arr.astype(np.int64).sum(axis=2)
    got = _ref_corners(g3, 3)
    assert got, "corner expected"
    # the top corner should sit near the center crossing (5..6, 5..6)
    _, y, x, _ = got[0]
    assert 4 <= y <= 7 and 4 <= x <= 7
    flat = np.full((12, 12, 3), 100, dtype=np.uint8)
    assert _ref_corners(flat.astype(np.int64).sum(axis=2), 3) == []


def test_spark_matches_reference(spark):
    rng = np.random.RandomState(17)
    rows, expect = [], {}
    for i in range(5):
        arr = (rng.rand(12, 14, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 14, 12))
        g3 = arr.astype(np.int64).sum(axis=2)
        expect[f"im{i}"] = _ref_corners(g3, 5)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {}
    for r in harris_corners(df, k=5).collect():
        got.setdefault(r["image_id"], []).append(
            (r["rank"], r["y"], r["x"], r["r20"])
        )
    for k in got:
        got[k].sort()
    assert got == {k: v for k, v in expect.items() if v}


def _ref_fast(g3, t, arc):
    """Wraparound brute force — deliberately a DIFFERENT formulation than
    the kernel's bitmask-doubling trick."""
    from morituri_spark.multimodal.corners import FAST_CIRCLE

    h, w = g3.shape
    bright_set, dark_set = set(), set()
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            b = [g3[y + dy, x + dx] > g3[y, x] + t for dx, dy in FAST_CIRCLE]
            d = [g3[y + dy, x + dx] < g3[y, x] - t for dx, dy in FAST_CIRCLE]
            for flags, out in ((b, bright_set), (d, dark_set)):
                ext = flags + flags
                if any(all(ext[s : s + arc]) for s in range(16)):
                    out.add((y, x))
    return bright_set, dark_set


def test_fast_corners_match_bruteforce(spark):
    from morituri_spark.multimodal.corners import fast_corners

    rng = np.random.RandomState(31)
    rows, expect = [], {}
    for i in range(4):
        arr = (rng.rand(12, 14, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 14, 12))
        g3 = arr.astype(np.int64).sum(axis=2)
        b, d = _ref_fast(g3, 30, 9)
        corners = b | d
        expect[f"im{i}"] = (
            len(corners), len(b), len(d),
            sum(y * 14 + x for y, x in corners),
        )
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {
        r["image_id"]: (r["n_corners"], r["n_bright"], r["n_dark"], r["chk_yx"])
        for r in fast_corners(df, t=30, arc=9).collect()
    }
    assert got == expect
    assert any(v[0] > 0 for v in expect.values()), "fixture found no corners"


def test_fast_wraparound_arc_detected(spark):
    from morituri_spark.multimodal.corners import fast_corners

    # an arc that ONLY exists across the index-15 → index-0 wrap: circle
    # positions 12..15 and 0..4 bright (9 contiguous with wraparound)
    from morituri_spark.multimodal.corners import FAST_CIRCLE

    g = np.full((9, 9), 100, dtype=np.int64)
    for j in list(range(12, 16)) + list(range(0, 5)):
        dx, dy = FAST_CIRCLE[j]
        g[4 + dy, 4 + dx] = 250
    arr = np.repeat((g // 3).astype(np.uint8)[:, :, None], 3, axis=2)
    g3 = arr.astype(np.int64).sum(axis=2)
    b, _ = _ref_fast(g3, 30, 9)
    assert (4, 4) in b  # the reference agrees the wrap arc exists
    df = spark.createDataFrame(
        [("im0", bytearray(I.encode(arr, "png")), "png", 9, 9)],
        "image_id string, bytes binary, fmt string, w int, h int",
    )
    row = fast_corners(df, t=30, arc=9).collect()[0]
    assert row["n_bright"] >= 1 and row["n_corners"] >= 1


def test_fast_guards_and_small_image(spark):
    import pytest

    from morituri_spark.multimodal.corners import fast_corners

    arr = np.full((4, 4, 3), 50, dtype=np.uint8)
    df = spark.createDataFrame(
        [("tiny", bytearray(I.encode(arr, "png")), "png", 4, 4)],
        "image_id string, bytes binary, fmt string, w int, h int",
    )
    row = fast_corners(df).collect()[0]
    assert (row["n_corners"], row["chk_yx"]) == (0, 0)
    with pytest.raises(ValueError):
        fast_corners(df, arc=1)


def test_brief_descriptors_match_loop(spark):
    from morituri_spark.multimodal.corners import (
        _brief_pattern, brief_descriptors,
    )

    rng = np.random.RandomState(41)
    pat = _brief_pattern(56, 4)
    rows, expect = [], {}
    for i in range(4):
        arr = (rng.rand(14, 16, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 16, 14))
        g3 = arr.astype(np.int64).sum(axis=2)
        # loop reference: harris corners restricted to the patch interior
        cand = [
            (y, x, v) for (_, y, x, v) in
            [(r, y, x, v) for r, y, x, v in _ref_corners(g3, 10**9)]
            if 4 <= y <= 9 and 4 <= x <= 11
        ]
        cand.sort(key=lambda t: (-t[2], t[0], t[1]))
        for r, (y, x, _) in enumerate(cand[:5], start=1):
            desc = 0
            for bit, ((ay, ax), (by, bx)) in enumerate(pat):
                if g3[y + ay, x + ax] < g3[y + by, x + bx]:
                    desc |= 1 << bit
            expect[(f"im{i}", r)] = (y, x, desc)
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {
        (r["image_id"], r["rank"]): (r["y"], r["x"], r["desc"])
        for r in brief_descriptors(df, k=5).collect()
    }
    assert got == expect and len(got) > 0
    assert all(0 <= d < (1 << 56) for (_, _, d) in got.values())


def test_brief_matching_finds_duplicates(spark):
    from morituri_spark.ml.hamming import hamming_near_duplicates
    from morituri_spark.multimodal.corners import brief_descriptors

    rng = np.random.RandomState(43)
    arr = (rng.rand(14, 16, 3) * 255).astype(np.uint8)
    rows = [
        ("orig", bytearray(I.encode(arr, "png")), "png", 16, 14),
        ("copy", bytearray(I.encode(arr, "png")), "png", 16, 14),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    desc = brief_descriptors(df, k=3).select(
        F.concat("image_id", F.lit("#"), F.col("rank").cast("string")).alias("id"),
        "desc",
    )
    pairs = hamming_near_duplicates(desc, "desc", id_col="id", max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # identical images → identical descriptors per rank
    assert {("copy#1", "orig#1"), ("copy#2", "orig#2")} <= got


def test_brief_guard(spark):
    import pytest

    from morituri_spark.multimodal.corners import brief_descriptors

    df = spark.createDataFrame(
        [], "image_id string, bytes binary, fmt string, w int, h int"
    )
    with pytest.raises(ValueError):
        brief_descriptors(df, n_bits=57)
