"""convex_hulls (geo/hull.py): per-group strict hulls, two-stage combine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo.hull import convex_hulls, hull_indices


def test_hull_indices_square_with_interior_and_collinear():
    pts = np.array(
        [
            [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0],  # corners
            [1.0, 0.0], [2.0, 1.0],  # collinear edge points -> dropped
            [1.0, 1.0], [0.5, 1.5],  # interior
            [0.0, 0.0],  # duplicate
        ]
    )
    h = hull_indices(pts)
    assert [list(v) for v in h] == [
        [0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]
    ]  # CCW from lex-min, strict


def test_hull_indices_degenerate():
    assert hull_indices(np.array([[1.0, 2.0]])).tolist() == [[1.0, 2.0]]
    assert hull_indices(np.array([[1.0, 2.0], [1.0, 2.0]])).tolist() == [[1.0, 2.0]]
    # all collinear -> the two extremes
    col = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    assert hull_indices(col).tolist() == [[0.0, 0.0], [3.0, 3.0]]


def _rand_groups(seed=13, n_groups=6, n_per=120):
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        cx, cy = rng.uniform(-50, 50, 2)
        for _ in range(n_per):
            rows.append((g, float(cx + rng.normal(0, 0.3)), float(cy + rng.normal(0, 0.2))))
    return rows


def _contains(hull, q, eps=1e-12):
    """q inside-or-on the CCW hull polygon."""
    n = len(hull)
    if n == 1:
        return abs(q[0] - hull[0][0]) < eps and abs(q[1] - hull[0][1]) < eps
    if n == 2:
        (x1, y1), (x2, y2) = hull
        cr = (x2 - x1) * (q[1] - y1) - (y2 - y1) * (q[0] - x1)
        if abs(cr) > 1e-9:
            return False
        return min(x1, x2) - eps <= q[0] <= max(x1, x2) + eps
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        if (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0]) < -1e-9:
            return False
    return True


def test_convex_hulls_properties_and_stage_equivalence(spark):
    rows = _rand_groups()
    df = spark.createDataFrame(rows, "key long, lon double, lat double").repartition(7)
    two = convex_hulls(df, "key").collect()
    one = convex_hulls(df, "key", two_stage=False).collect()
    assert sorted(map(tuple, two)) == sorted(map(tuple, one))

    hulls = {}
    for r in sorted(two, key=lambda r: (r.key, r.vertex_idx)):
        hulls.setdefault(r.key, []).append((r.lon, r.lat))
    pts_by_g = {}
    for g, x, y in rows:
        pts_by_g.setdefault(g, []).append((x, y))
    in_set = {g: set(p) for g, p in pts_by_g.items()}
    for g, hull in hulls.items():
        assert len(hull) >= 3
        # vertices are input points; every input point inside-or-on
        assert all(v in in_set[g] for v in hull)
        assert all(_contains(hull, q) for q in pts_by_g[g])
        # strict convexity: every turn strictly left
        n = len(hull)
        for i in range(n):
            o, a, b = hull[i], hull[(i + 1) % n], hull[(i + 2) % n]
            cr = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
            assert cr > 0
        # canonical start: lexicographic min vertex first
        assert hull[0] == min(hull)
