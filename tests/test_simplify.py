"""Douglas–Peucker: collapse, preservation, the eps guarantee, Spark kernel."""

import numpy as np

from morituri_spark.geo import simplify as S


def test_straight_line_collapses_to_endpoints():
    pts = np.array([[float(i), 0.0] for i in range(50)])
    out = S.simplify_np(pts, eps=0.01)
    assert out.tolist() == [[0.0, 0.0], [49.0, 0.0]]


def test_spike_preserved():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 5.0], [3.0, 0.0], [4.0, 0.0]])
    out = S.simplify_np(pts, eps=0.5)
    assert [2.0, 5.0] in out.tolist()
    assert out[0].tolist() == [0.0, 0.0] and out[-1].tolist() == [4.0, 0.0]


def test_deviation_guarantee_random_walks():
    rng = np.random.default_rng(13)
    for eps in (0.05, 0.3, 1.0):
        for _ in range(10):
            pts = np.cumsum(rng.normal(0, 0.5, (200, 2)), axis=0)
            simp = S.simplify_np(pts, eps)
            assert S.max_deviation(pts, simp) <= eps + 1e-9
            assert len(simp) <= len(pts)
            # idempotent: simplifying the simplified line changes nothing
            again = S.simplify_np(simp, eps)
            assert again.tolist() == simp.tolist()


def test_spark_kernel_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    want = {}
    for g in range(20):
        pts = np.cumsum(rng.normal(0, 1.0, (60, 2)), axis=0)
        rows.append((g, [[float(x), float(y)] for x, y in pts]))
        want[g] = S.simplify_np(pts, 0.4).tolist()
    df = spark.createDataFrame(rows, "geom_id long, line array<array<double>>")
    out = S.simplify_lines(df, eps=0.4)
    got = {r.geom_id: [list(p) for p in r.line] for r in out.collect()}
    assert got == want
