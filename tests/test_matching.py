"""snap_to_segments (geo/matching.py) vs a brute-force reference."""
import math
import random

import pytest
from pyspark.sql.utils import AnalysisException

from morituri_spark.geo.matching import snap_to_segments


def _round9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5 + 1e-8) / 1e9


def _dist(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = 0.0 if len2 == 0.0 else min(max(((px - ax) * dx + (py - ay) * dy) / len2, 0.0), 1.0)
    ex, ey = px - (ax + t * dx), py - (ay + t * dy)
    return _round9(math.sqrt(ex * ex + ey * ey))


def _brute(points, segments, radius):
    best = {}
    for pid, px, py in points:
        cands = [
            (_dist(px, py, ax, ay, bx, by), sid)
            for sid, ax, ay, bx, by in segments
        ]
        cands = [c for c in cands if c[0] <= radius]
        if cands:
            d, s = min(cands)
            best[pid] = (s, d)
    return best


def test_known_geometry_and_ties(spark):
    pts = spark.createDataFrame(
        [(0, 0.5, 0.3), (1, 5.0, 5.0), (2, 0.5, -0.3)],
        "point_id long, lon double, lat double",
    )
    segs = spark.createDataFrame(
        [(10, 0.0, 0.0, 1.0, 0.0),   # horizontal through origin
         (11, 0.0, 0.6, 1.0, 0.6),   # horizontal at y=0.6 (same dist to p0)
         (12, 2.0, 2.0, 2.0, 2.0)],  # degenerate: a point "segment"
        "seg_id long, ax double, ay double, bx double, by double",
    )
    got = {
        r["point_id"]: (r["seg_id"], r["dist"])
        for r in snap_to_segments(pts, segs, radius=1.0, cell_deg=1.0).collect()
    }
    assert got[0] == (10, 0.3)          # tie at 0.3/0.3 → smaller seg_id
    assert 1 not in got                  # nothing within radius... (4.2 away)
    assert got[2] == (10, 0.3)          # clamped projection to endpoint-free interior


def test_matches_brute_force_exactly(spark):
    rng = random.Random(7)
    points = [(i, rng.uniform(-3, 3), rng.uniform(-3, 3)) for i in range(300)]
    segments = [
        (i, x, y, x + rng.uniform(-0.8, 0.8), y + rng.uniform(-0.8, 0.8))
        for i, (x, y) in enumerate(
            (rng.uniform(-3, 3), rng.uniform(-3, 3)) for _ in range(60)
        )
    ]
    pdf = spark.createDataFrame(points, "point_id long, lon double, lat double")
    sdf = spark.createDataFrame(
        segments, "seg_id long, ax double, ay double, bx double, by double"
    )
    # cell 0.5° < segment extent: covers span several cells each
    got = {
        r["point_id"]: (r["seg_id"], r["dist"])
        for r in snap_to_segments(pdf, sdf, radius=0.4, cell_deg=0.5).collect()
    }
    assert got == _brute(points, segments, 0.4)


def test_degenerate_all_point_segments(spark):
    pts = spark.createDataFrame([(0, 1.0, 1.0)], "point_id long, lon double, lat double")
    segs = spark.createDataFrame(
        [(5, 1.1, 1.0, 1.1, 1.0)], "seg_id long, ax double, ay double, bx double, by double"
    )
    [row] = snap_to_segments(pts, segs, radius=0.5, cell_deg=1.0).collect()
    assert (row["seg_id"], row["dist"]) == (5, pytest.approx(0.1, abs=1e-9))


def test_fanout_guard_raises(spark):
    pts = spark.createDataFrame([(0, 0.0, 0.0)], "point_id long, lon double, lat double")
    segs = spark.createDataFrame(
        [(1, -50.0, -50.0, 50.0, 50.0)],
        "seg_id long, ax double, ay double, bx double, by double",
    )
    with pytest.raises(Exception, match="max_cells_per_segment"):
        snap_to_segments(pts, segs, radius=0.1, cell_deg=0.01).collect()


def test_cos_lat_scaling(spark):
    # at cos_lat=0.5, 0.2° of longitude is only 0.1 scaled — inside radius
    pts = spark.createDataFrame([(0, 0.2, 0.0)], "point_id long, lon double, lat double")
    segs = spark.createDataFrame(
        [(1, 0.0, -1.0, 0.0, 1.0)], "seg_id long, ax double, ay double, bx double, by double"
    )
    assert snap_to_segments(pts, segs, radius=0.15, cell_deg=1.0).count() == 0
    [row] = snap_to_segments(pts, segs, radius=0.15, cell_deg=1.0, cos_lat=0.5).collect()
    assert row["dist"] == pytest.approx(0.1, abs=1e-9)
