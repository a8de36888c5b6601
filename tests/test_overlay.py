"""Polygon-polygon overlap join: clip kernel geometry + distributed join."""

import numpy as np
import pytest

from morituri_spark.geo.overlay import (
    clip_convex_np,
    polygon_overlap_join,
    polygon_pair_overlap_area,
)


def _rect(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


def test_clip_rect_rect_known_area():
    s = np.asarray([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    c = np.asarray([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    out = clip_convex_np(s, c)
    # unit square [1,2]x[1,2]
    xs, ys = sorted(set(round(p, 9) for p in out[:, 0])), sorted(
        set(round(p, 9) for p in out[:, 1])
    )
    assert xs == [1.0, 2.0] and ys == [1.0, 2.0]


def test_pair_area_cases():
    # full containment
    a = [_rect(0, 0, 4, 4)]
    b = [_rect(1, 1, 2, 2)]
    assert polygon_pair_overlap_area(a, b) == pytest.approx(1.0)
    # disjoint
    assert polygon_pair_overlap_area([_rect(0, 0, 1, 1)], [_rect(5, 5, 6, 6)]) == 0.0
    # triangle x+y<=4 (x,y>=0) vs rect clips: [0,2]^2 lies entirely under
    # the hypotenuse (area 4); [2,4]^2 touches it only at the corner (2,2)
    tri = [[[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]]]
    assert polygon_pair_overlap_area(tri, [_rect(0, 0, 2, 2)]) == pytest.approx(4.0)
    assert polygon_pair_overlap_area(tri, [_rect(2, 2, 4, 4)]) == pytest.approx(0.0)
    # partial overlap: clip x in [1,3], y in [0,2]; width(y) = 2 for
    # y<=1 then 3-y -> area = 2 + 3.5 - 2 = 3.5
    assert polygon_pair_overlap_area(tri, [_rect(1, 0, 3, 2)]) == pytest.approx(3.5)


def test_pair_area_hole_subtracts():
    # A = square with a centered hole; B = left half-plane-ish rect
    a = [_rect(0, 0, 4, 4), _rect(1, 1, 3, 3)]
    b = [_rect(0, 0, 2, 4)]
    # left half of the annulus: 2*4 minus hole's left half 1*2 = 6
    assert polygon_pair_overlap_area(a, b) == pytest.approx(6.0)


def test_nonconvex_clip_raises():
    concave = [[[0.0, 0.0], [4.0, 0.0], [2.0, 1.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]]
    with pytest.raises(ValueError, match="not convex"):
        polygon_pair_overlap_area([_rect(0, 0, 1, 1)], concave)
    # same rings are fine on the SUBJECT side
    assert polygon_pair_overlap_area(concave, [_rect(0, 0, 4, 4)]) > 0


def test_distributed_join_matches_rect_algebra(spark):
    rows_a, rows_b = [], []
    for gy in range(3):
        for gx in range(3):
            rows_a.append((gy * 3 + gx, [_rect(gx * 2.0, gy * 2.0, gx * 2.0 + 2, gy * 2.0 + 2)]))
    for gy in range(2):
        for gx in range(2):
            rows_b.append(
                (gy * 2 + gx, [_rect(0.9 + gx * 2.4, 1.1 + gy * 2.4, 0.9 + gx * 2.4 + 2.4, 1.1 + gy * 2.4 + 2.4)])
            )
    za = spark.createDataFrame(rows_a, "zone_id long, rings array<array<array<double>>>")
    zb = spark.createDataFrame(rows_b, "zone_id long, rings array<array<array<double>>>")
    got = {
        (r.a_id, r.b_id): r.overlap_area
        for r in polygon_overlap_join(za, zb, res=6).collect()
    }
    exp = {}
    for aid, ra in rows_a:
        ax0, ay0 = ra[0][0]
        ax1, ay1 = ra[0][2]
        for bid, rb in rows_b:
            bx0, by0 = rb[0][0]
            bx1, by1 = rb[0][2]
            w = min(ax1, bx1) - max(ax0, bx0)
            h = min(ay1, by1) - max(ay0, by0)
            if w > 0 and h > 0:
                exp[(aid, bid)] = round(w * h, 6)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6), k


def test_rect_fast_path_matches_general(spark):
    # mixed batch: rects (fast path) + a triangle subject (general path)
    rows_a = [(0, [_rect(0.0, 0.0, 2.0, 2.0)]),
              (1, [[[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]]])]
    rows_b = [(0, [_rect(1.0, 1.0, 3.0, 3.0)]), (1, [_rect(0.0, 0.0, 2.0, 2.0)])]
    za = spark.createDataFrame(rows_a, "zone_id long, rings array<array<array<double>>>")
    zb = spark.createDataFrame(rows_b, "zone_id long, rings array<array<array<double>>>")
    fast = sorted(map(tuple, polygon_overlap_join(za, zb, res=5).collect()))
    slow = sorted(map(tuple, polygon_overlap_join(za, zb, res=5, rect_fast=False).collect()))
    assert fast == slow and len(fast) >= 3
    got = {(a, b): ar for a, b, ar in fast}
    assert got[(0, 0)] == pytest.approx(1.0)   # rect x rect via fast path
    assert got[(1, 1)] == pytest.approx(4.0)   # triangle via general path


def test_segment_intersections_bruteforce(spark):
    import numpy as np
    from morituri_spark.geo.overlay import segment_intersections

    rng = np.random.default_rng(31)
    a_rows, b_rows = [], []
    for i in range(80):
        x, y = rng.uniform(0, 10, 2)
        dx, dy = rng.uniform(-1.5, 1.5, 2)
        a_rows.append((i, float(x), float(y), float(x + dx), float(y + dy)))
    for j in range(60):
        x, y = rng.uniform(0, 10, 2)
        dx, dy = rng.uniform(-1.5, 1.5, 2)
        b_rows.append((j, float(x), float(y), float(x + dx), float(y + dy)))
    a = spark.createDataFrame(a_rows, "id_a long, ax double, ay double, bx double, by double")
    b = spark.createDataFrame(b_rows, "id_b long, ax double, ay double, bx double, by double")
    got = {(r.id_a, r.id_b): (r.x, r.y) for r in segment_intersections(a, b, 2.0).collect()}

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    exp = {}
    for i, ax, ay, bx, by in a_rows:
        for j, cx, cy, dx_, dy_ in b_rows:
            d1 = cross(ax, ay, bx, by, cx, cy)
            d2 = cross(ax, ay, bx, by, dx_, dy_)
            d3 = cross(cx, cy, dx_, dy_, ax, ay)
            d4 = cross(cx, cy, dx_, dy_, bx, by)
            if d1 * d2 < 0 and d3 * d4 < 0:
                den = (bx - ax) * (dy_ - cy) - (by - ay) * (dx_ - cx)
                num = (cx - ax) * (dy_ - cy) - (cy - ay) * (dx_ - cx)
                t = num / den
                exp[(i, j)] = (ax + t * (bx - ax), ay + t * (by - ay))
    assert set(got) == set(exp)
    assert len(got) > 10
    for k, (x, y) in got.items():
        ex, ey = exp[k]
        assert abs(x - ex) < 2e-6 and abs(y - ey) < 2e-6


def test_segment_intersections_excludes_touch_and_collinear(spark):
    from morituri_spark.geo.overlay import segment_intersections

    a = spark.createDataFrame(
        [(0, 0.0, 0.0, 2.0, 0.0), (1, 0.0, 2.0, 2.0, 2.0)],
        "id_a long, ax double, ay double, bx double, by double",
    )
    b = spark.createDataFrame(
        [
            (0, 1.0, 0.0, 1.0, 1.0),   # endpoint touches A0 at (1,0) -> excluded
            (1, 0.5, 0.0, 1.5, 0.0),   # collinear overlap with A0 -> excluded
            (2, 1.0, -1.0, 1.0, 3.0),  # proper crossing of both
        ],
        "id_b long, ax double, ay double, bx double, by double",
    )
    got = {(r.id_a, r.id_b): (r.x, r.y) for r in segment_intersections(a, b, 2.0).collect()}
    assert got == {(0, 2): (1.0, 0.0), (1, 2): (1.0, 2.0)}


def test_clip_rings_to_tile_loop_reference(spark):
    import math

    import numpy as np
    import pandas as pd

    from morituri_spark.geo.overlay import clip_rings_to_tile

    def clip_half(pts, axis, c, sign):
        out = []
        n = len(pts)
        for i in range(n):
            p, q = pts[i], pts[(i + 1) % n]
            ip = sign * (p[axis] - c) >= 0
            iq = sign * (q[axis] - c) >= 0
            if ip != iq:
                if axis == 0:
                    y = p[1] + math.floor((q[1] - p[1]) * (c - p[0]) / (q[0] - p[0]))
                    out.append((c, y))
                else:
                    x = p[0] + math.floor((q[0] - p[0]) * (c - p[1]) / (q[1] - p[1]))
                    out.append((x, c))
            if iq:
                out.append(q)
        return out

    def sh(pts):
        for axis, c, sign in [(0, 10, 1), (0, 90, -1), (1, 10, 1), (1, 90, -1)]:
            pts = clip_half(pts, axis, c, sign)
            if not pts:
                return []
        return pts if len(pts) >= 3 else []

    rng = np.random.default_rng(113)
    rows, rings = [], {}
    for r in range(60):
        cx, cy = int(rng.integers(-20, 120)), int(rng.integers(-20, 120))
        k = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=k))
        rad = rng.integers(5, 40, size=k)
        pts = [
            (cx + int(rad[i] * np.cos(ang[i])), cy + int(rad[i] * np.sin(ang[i])))
            for i in range(k)
        ]
        rings[r] = pts
        for s, (x, y) in enumerate(pts):
            rows.append((r, s, x, y))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ring_id", "seq", "x", "y"])
    )
    got = {}
    for row in clip_rings_to_tile(df, 10, 10, 90, 90).collect():
        got.setdefault(row.ring_id, []).append((row.seq, row.x, row.y))
    for r in got:
        got[r].sort()

    n_clipped = n_dropped = 0
    for r, pts in rings.items():
        want = sh(list(pts))
        if not want:
            n_dropped += 1
            assert r not in got, r
            continue
        if len(want) != len(pts):
            n_clipped += 1
        assert r in got, r
        assert [(x, y) for _, x, y in got[r]] == want, r
        assert [s for s, _, _ in got[r]] == list(range(len(want))), r
        # every output vertex lies in the inclusive tile
        assert all(10 <= x <= 90 and 10 <= y <= 90 for _, x, y in got[r]), r
    # fixture exercises all three regimes
    assert n_dropped > 0 and n_clipped > 0
    assert any(len(rings[r]) == len(got.get(r, [])) for r in rings)
