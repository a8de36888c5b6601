"""Largest-remainder apportionment, ring nesting depth, EXIF box
normalization — each vs an independent loop reference."""

import numpy as np
import pandas as pd

from morituri_spark.geo.overlay import ring_nesting_depth
from morituri_spark.multimodal.detections import exif_orient_boxes
from morituri_spark.text.sampling import apportion_budget


def _ref_apportion(counts, budget):
    total = sum(c for _, c in counts)
    base = {k: c * budget // total for k, c in counts}
    rem = {k: c * budget % total for k, c in counts}
    left = budget - sum(base.values())
    order = sorted(counts, key=lambda kc: (-rem[kc[0]], kc[0]))
    extra = {k: 0 for k, _ in counts}
    for k, _ in order[:left]:
        extra[k] = 1
    return {
        k: (c, base[k], extra[k], base[k] + extra[k]) for k, c in counts
    }


def test_apportion_loop_reference(spark):
    rng = np.random.default_rng(3)
    counts = [(k, int(rng.integers(1, 10_000))) for k in range(37)]
    df = spark.createDataFrame(pd.DataFrame(counts, columns=["stratum", "cnt"]))
    for budget in (0, 1, 100, 12_345):
        got = {
            r.stratum: (r.cnt, r.base, r.extra, r.alloc)
            for r in apportion_budget(df, budget).collect()
        }
        assert got == _ref_apportion(counts, budget), budget
        assert sum(v[3] for v in got.values()) == budget


def test_apportion_exact_split(spark):
    # counts proportional to the budget: zero leftover, zero extras
    counts = [(0, 10), (1, 20), (2, 30)]
    df = spark.createDataFrame(pd.DataFrame(counts, columns=["stratum", "cnt"]))
    got = {r.stratum: (r.base, r.extra) for r in apportion_budget(df, 6).collect()}
    assert got == {0: (1, 0), 1: (2, 0), 2: (3, 0)}


def _square(cx, cy, r):
    return [
        [cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r],
        [cx - r, cy + r], [cx - r, cy - r],
    ]


def test_ring_nesting_depth(spark):
    # polygon 0: shell(0) ⊃ hole(1) ⊃ island(2) ⊃ pond(3); plus a
    # separate shell(4). polygon 1: two disjoint shells.
    rows = [
        (0, 0, _square(0.0, 0.0, 40.0)),
        (0, 1, _square(1.0, 1.0, 30.0)),
        (0, 2, _square(2.0, 2.0, 20.0)),
        (0, 3, _square(3.0, 3.0, 10.0)),
        (0, 4, _square(100.0, 100.0, 5.0)),
        (1, 0, _square(0.0, 0.0, 3.0)),
        (1, 1, _square(50.0, 0.0, 3.0)),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["poly_id", "ring_id", "ring"]))
    got = {
        (r.poly_id, r.ring_id): (r.depth, r.role)
        for r in ring_nesting_depth(df).collect()
    }
    assert got == {
        (0, 0): (0, "exterior"), (0, 1): (1, "hole"),
        (0, 2): (2, "exterior"), (0, 3): (3, "hole"),
        (0, 4): (0, "exterior"),
        (1, 0): (0, "exterior"), (1, 1): (0, "exterior"),
    }


def _ref_exif(code, x0, y0, x1, y1, w, h):
    m = {
        1: (x0, y0, x1, y1, w, h),
        2: (w - x1, y0, w - x0, y1, w, h),
        3: (w - x1, h - y1, w - x0, h - y0, w, h),
        4: (x0, h - y1, x1, h - y0, w, h),
        5: (y0, x0, y1, x1, h, w),
        6: (h - y1, x0, h - y0, x1, h, w),
        7: (h - y1, w - x1, h - y0, w - x0, h, w),
        8: (y0, w - x1, y1, w - x0, h, w),
    }
    return m[code]


def test_exif_orient_boxes(spark):
    rng = np.random.default_rng(8)
    rows = []
    for i in range(160):
        w, h = int(rng.integers(20, 60)), int(rng.integers(20, 60))
        x0, y0 = int(rng.integers(0, w - 5)), int(rng.integers(0, h - 5))
        rows.append(
            (i, 1 + i % 8, x0, y0,
             x0 + int(rng.integers(1, w - x0)), y0 + int(rng.integers(1, h - y0)),
             w, h)
        )
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["bid", "orient", "x0", "y0", "x1", "y1", "w", "h"]))
    got = {
        r.bid: (r.x0, r.y0, r.x1, r.y1, r.out_w, r.out_h)
        for r in exif_orient_boxes(df).collect()
    }
    for bid, code, x0, y0, x1, y1, w, h in rows:
        assert got[bid] == _ref_exif(code, x0, y0, x1, y1, w, h), (bid, code)
        # remapped boxes stay inside the upright image and stay proper
        nx0, ny0, nx1, ny1, ow, oh = got[bid]
        assert 0 <= nx0 < nx1 <= ow and 0 <= ny0 < ny1 <= oh
