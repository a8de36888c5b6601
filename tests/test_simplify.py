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


def test_chaikin_loop_reference(spark):
    import numpy as np
    import pandas as pd

    from morituri_spark.geo.simplify import chaikin_smooth

    rng = np.random.default_rng(7)
    rows = []
    for w in range(12):
        n = int(rng.integers(1, 9))  # includes 1- and 2-point ways
        for s in range(n):
            rows.append((w, s, int(rng.integers(-50, 50)),
                         int(rng.integers(-50, 50))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["way_id", "seq", "x", "y"])
    )
    got = {}
    for r in chaikin_smooth(df, iters=2).collect():
        got.setdefault(r.way_id, []).append((r.seq, r.x, r.y))
    for w in got:
        got[w].sort()

    def one_iter(pts):
        if len(pts) == 1:
            return [(4 * pts[0][0], 4 * pts[0][1])]
        out = [(4 * pts[0][0], 4 * pts[0][1])]
        for (x, y), (nx, ny) in zip(pts, pts[1:]):
            out.append((3 * x + nx, 3 * y + ny))
            out.append((x + 3 * nx, y + 3 * ny))
        out.append((4 * pts[-1][0], 4 * pts[-1][1]))
        return out

    for w in range(12):
        pts = [(x, y) for ww, s, x, y in rows if ww == w]
        want = one_iter(one_iter(pts))
        assert [(x, y) for _, x, y in got[w]] == want, w
        assert [s for s, _, _ in got[w]] == list(range(len(want))), w


def test_chaikin_straight_line_stays_straight(spark):
    import pandas as pd

    from morituri_spark.geo.simplify import chaikin_smooth

    rows = [(0, s, 10 * s, 20 * s) for s in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["way_id", "seq", "x", "y"])
    )
    out = sorted((r.seq, r.x, r.y) for r in chaikin_smooth(df, iters=1).collect())
    # collinear input stays collinear: y == 2x in quarter units
    assert all(y == 2 * x for _, x, y in out)
    assert out[0] == (0, 0, 0) and out[-1] == (9, 160, 320)
