"""contour_segments (geo/density.py): marching-squares iso-contours."""

import numpy as np
from collections import Counter

from morituri_spark.geo.density import contour_segments, MS_SEGMENTS


def _run(spark, cells, thr):
    df = spark.createDataFrame(cells, "ix long, iy long, n_points long")
    return contour_segments(df, thr).collect()


def test_single_cell_diamond(spark):
    rows = _run(spark, [(0, 0, 10)], 5.0)
    got = {
        (r.bx, r.by, r.case_idx): (r.x1, r.y1, r.x2, r.y2) for r in rows
    }
    assert got == {
        (0, 0, 1): (0.0, 0.5, 0.5, 0.0),       # L-B
        (-1, 0, 2): (-0.5, 0.0, 0.0, 0.5),     # B-R
        (0, -1, 4): (0.0, -0.5, 0.5, 0.0),     # L-T
        (-1, -1, 8): (0.0, -0.5, -0.5, 0.0),   # R-T
    }


def test_saddle_disconnected_default(spark):
    rows = _run(spark, [(0, 0, 9), (1, 1, 9), (1, 0, 1), (0, 1, 1)], 5.0)
    by_block = {}
    for r in rows:
        by_block.setdefault((r.bx, r.by), []).append(r)
    segs = by_block[(0, 0)]
    assert {r.case_idx for r in segs} == {9} and len(segs) == 2


def _brute(cells, thr):
    """NumPy replay of the same lookup over a dense grid."""
    vals = {(x, y): n for x, y, n in cells}
    xs = [x for x, _, _ in cells]
    ys = [y for _, y, _ in cells]
    segs = set()
    lut = {}
    for c, s, a, b, cc, d in MS_SEGMENTS:
        lut.setdefault(c, []).append((s, a, b, cc, d))
    for bx in range(min(xs) - 1, max(xs) + 1):
        for by in range(min(ys) - 1, max(ys) + 1):
            case = 0
            for k, (dx, dy) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
                if vals.get((bx + dx, by + dy), 0) >= thr:
                    case |= 1 << k
            for s, a, b, cc, d in lut.get(case, []):
                segs.add((bx, by, case, s, bx + a, by + b, bx + cc, by + d))
    return segs


def test_matches_bruteforce_and_loops_close(spark):
    rng = np.random.default_rng(21)
    cells = [
        (int(x), int(y), int(rng.integers(0, 10)))
        for x in range(12)
        for y in range(9)
        if rng.random() < 0.8  # holes: absent cells count as 0
    ]
    rows = _run(spark, cells, 5.0)
    got = {
        (r.bx, r.by, r.case_idx, r.seg_idx, r.x1, r.y1, r.x2, r.y2)
        for r in rows
    }
    assert got == _brute(cells, 5.0)
    assert len(got) > 20
    # closed loops: every crossing point is an endpoint of EXACTLY two
    # segments (finite support -> iso-lines cannot dangle)
    ends = Counter()
    for r in rows:
        ends[(r.x1, r.y1)] += 1
        ends[(r.x2, r.y2)] += 1
    assert all(v == 2 for v in ends.values())
