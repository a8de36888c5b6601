"""dissolve_stats / boundary_edges (geo/dissolve.py) vs brute-force
edge-count references on tessellations."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from morituri_spark.geo.dissolve import boundary_edges, dissolve_stats


def _square(ix, iy):
    x0, y0, x1, y1 = float(ix), float(iy), float(ix + 1), float(iy + 1)
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


def _zones_df(spark, cells):
    rows = [(g, i, [_square(ix, iy)]) for i, (g, ix, iy) in enumerate(cells)]
    return spark.createDataFrame(
        rows, "group_id long, zone_id long, rings array<array<array<double>>>"
    )


def _ref_edges(cells):
    mult = {}
    for g, ix, iy in cells:
        ring = _square(ix, iy)
        for a, b in zip(ring, ring[1:]):
            key = (g, *sorted([tuple(a), tuple(b)]))
            mult[key] = mult.get(key, 0) + 1
    return mult


@pytest.mark.parametrize(
    "shape",
    [
        [(0, x, y) for x in range(4) for y in range(3)],  # 4x3 block
        [(0, 0, 0), (0, 1, 0), (1, 2, 0), (1, 3, 0)],  # two groups
        [(0, x, 0) for x in range(5)],  # 1-wide strip
        [(0, 0, 0)],  # single cell
        # L-shape with a hole-free concavity
        [(0, 0, 0), (0, 1, 0), (0, 0, 1)],
    ],
)
def test_boundary_edges_match_bruteforce(spark, shape):
    got = {
        (r["group_id"], (r["x1"], r["y1"]), (r["x2"], r["y2"])): r["multiplicity"]
        for r in boundary_edges(
            _zones_df(spark, shape), group_col="group_id"
        ).collect()
    }
    assert got == _ref_edges(shape)


def test_dissolve_stats_block(spark):
    cells = [(0, x, y) for x in range(4) for y in range(3)]
    row = dissolve_stats(_zones_df(spark, cells), group_col="group_id").collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_polys"] == 12
    assert r["dissolved_area"] == 12.0
    # 4x3 block perimeter = 2*(4+3) = 14 unit edges
    assert r["n_boundary_edges"] == 14
    assert r["boundary_len"] == 14.0
    assert r["n_nonmanifold"] == 0
    # centroid of boundary midpoints: symmetric block -> (2, 1.5) * 14
    assert r["sum_mid_x"] == 2.0 * 14
    assert r["sum_mid_y"] == 1.5 * 14


def test_duplicate_cell_surfaces_nonmanifold(spark):
    # duplicated interior cell: its 4 edges reach multiplicity 3
    cells = [(0, x, y) for x in range(3) for y in range(3)] + [(0, 1, 1)]
    r = dissolve_stats(_zones_df(spark, cells), group_col="group_id").collect()[0]
    assert r["n_nonmanifold"] == 4
    assert r["n_polys"] == 10
    assert r["n_boundary_edges"] == 12  # outer ring untouched


def test_groups_do_not_cancel_across(spark):
    # same shared edge, different groups -> stays boundary in both
    cells = [(0, 0, 0), (1, 1, 0)]
    rows = dissolve_stats(_zones_df(spark, cells), group_col="group_id").collect()
    assert {r["group_id"]: r["n_boundary_edges"] for r in rows} == {0: 4, 1: 4}


def test_zero_length_edge_raises(spark):
    bad = spark.createDataFrame(
        [(0, 0, [[[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [0.0, 0.0]]])],
        "group_id long, zone_id long, rings array<array<array<double>>>",
    )
    with pytest.raises(Exception, match="zero-length"):
        boundary_edges(bad, group_col="group_id").collect()
