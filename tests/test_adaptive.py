"""adaptive_cells (geo/adaptive.py) vs a literal recursive quadtree."""
import math

import pytest

from morituri_spark.geo.adaptive import adaptive_cells
from morituri_spark.geo.cells import latlng_to_cell, cell_to_parent


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lon double, lat double")


def _quadtree_ref(rows, max_points, res_min, res_max):
    """Literal split-loop quadtree: {leaf_cell_id: n_points}."""
    import numpy as np

    lons = np.array([r[0] for r in rows])
    lats = np.array([r[1] for r in rows])
    cells = {r: latlng_to_cell(lons, lats, r) for r in range(res_min, res_max + 1)}

    def count_at(res):
        vals, cnts = np.unique(cells[res], return_counts=True)
        return dict(zip(vals.tolist(), cnts.tolist()))

    counts = {r: count_at(r) for r in range(res_min, res_max + 1)}
    leaves = {}
    frontier = list(counts[res_min].items())
    res = res_min
    while frontier:
        nxt = []
        for cell, n in frontier:
            if n <= max_points or res == res_max:
                leaves[cell] = n
            else:
                kids = {
                    c
                    for c, parent in zip(
                        cells[res + 1].tolist(),
                        cell_to_parent(cells[res + 1], res).tolist(),
                    )
                    if parent == cell
                }
                nxt.extend((k, counts[res + 1][k]) for k in sorted(kids))
        frontier = nxt
        res += 1
    return leaves


def test_adaptive_matches_recursive_quadtree(spark):
    # dense knot around (10.1, 10.1), medium patch at (-50, -50), sparse
    # background — forces splits to several different depths
    rows = [(10.1 + (i % 13) * 1e-3, 10.1 + (i % 7) * 1e-3) for i in range(400)]
    rows += [(-50.0 + (i % 5) * 0.2, -50.0 + (i % 3) * 0.2) for i in range(60)]
    rows += [(float((i * 37) % 340) - 170.0, float((i * 23) % 160) - 80.0)
             for i in range(40)]
    got = {
        r["cell_id"]: (r["res"], r["n_points"])
        for r in adaptive_cells(
            _pts(spark, rows), max_points=50, res_min=2, res_max=9
        ).collect()
    }
    ref = _quadtree_ref(rows, 50, 2, 9)
    assert {c: n for c, (_, n) in got.items()} == ref
    # invariants: total preserved; leaves ≤ max_points unless at res_max;
    # res field decodes the packed id
    assert sum(n for _, n in got.values()) == len(rows)
    for cell, (res, n) in got.items():
        assert res == (cell >> 58)
        assert n <= 50 or res == 9
    assert len({r for r, _ in got.values()}) > 1  # genuinely mixed depths


def test_adaptive_single_level_and_guards(spark):
    rows = [(0.5, 0.5)] * 3 + [(90.5, 45.5)]
    got = adaptive_cells(
        _pts(spark, rows), max_points=10, res_min=4, res_max=4
    ).collect()
    assert sum(r["n_points"] for r in got) == 4
    assert all(r["res"] == 4 for r in got)
    with pytest.raises(ValueError, match="max_points"):
        adaptive_cells(_pts(spark, rows), max_points=0)
    with pytest.raises(ValueError, match="res_min"):
        adaptive_cells(_pts(spark, rows), res_min=5, res_max=3)


def test_adaptive_hot_cell_stays_leaf_at_res_max(spark):
    rows = [(0.12345, 0.54321)] * 100  # identical point: hot at EVERY level
    got = adaptive_cells(
        _pts(spark, rows), max_points=10, res_min=2, res_max=6
    ).collect()
    assert len(got) == 1
    assert got[0]["res"] == 6 and got[0]["n_points"] == 100


def test_assign_adaptive_unique_and_consistent(spark):
    from morituri_spark.geo.adaptive import assign_adaptive
    from pyspark.sql import functions as F

    rows = [(10.1 + (i % 13) * 1e-3, 10.1 + (i % 7) * 1e-3) for i in range(400)]
    rows += [(float((i * 37) % 340) - 170.0, float((i * 23) % 160) - 80.0)
             for i in range(40)]
    df = _pts(spark, rows)
    leaves = adaptive_cells(df, max_points=50, res_min=2, res_max=9)
    got = assign_adaptive(df, leaves, res_min=2, res_max=9)
    # every point assigned exactly once (disjoint leaves, full cover)
    assert got.count() == len(rows)
    # per-leaf totals equal the leaf table exactly
    roll = {
        r["leaf_cell"]: r["n"]
        for r in got.groupBy("leaf_cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ref = {r["cell_id"]: r["n_points"] for r in leaves.collect()}
    assert roll == ref
