"""comovement_runs (geo/convoy.py) vs a brute-force reference."""

import numpy as np
import pytest

from morituri_spark.geo.convoy import comovement_runs


def _ref_runs(pts, radius, min_len):
    """pts: {(eid, t): (x, y)} → {(a, b): [(start, end, len)]}"""
    by_t = {}
    for (e, t), (x, y) in pts.items():
        by_t.setdefault(t, []).append((e, x, y))
    together = {}
    for t, rows in by_t.items():
        for i in range(len(rows)):
            for j in range(len(rows)):
                a, xa, ya = rows[i]
                b, xb, yb = rows[j]
                if a < b and max(abs(xa - xb), abs(ya - yb)) <= radius:
                    together.setdefault((a, b), set()).add(t)
    out = {}
    for pair, ts in together.items():
        ts = sorted(ts)
        runs = []
        s = p = ts[0]
        for t in ts[1:]:
            if t == p + 1:
                p = t
            else:
                runs.append((s, p, p - s + 1))
                s = p = t
        runs.append((s, p, p - s + 1))
        keep = [r for r in runs if r[2] >= min_len]
        if keep:
            out[pair] = sorted(keep)
    return out


def _df(spark, pts):
    rows = [(e, t, x, y) for (e, t), (x, y) in sorted(pts.items())]
    return spark.createDataFrame(
        rows, "entity_id long, tick long, x long, y long"
    )


def test_two_entities_one_broken_run(spark):
    pts = {}
    for t in range(10):
        pts[(1, t)] = (t * 3, 5)
        # entity 2 stays within chebyshev 2 except ticks 4 and 5
        off = 10 if t in (4, 5) else 1
        pts[(2, t)] = (t * 3 + off, 6)
    got = {
        (r["id_a"], r["id_b"]): (r["start_t"], r["end_t"], r["run_len"])
        for r in comovement_runs(_df(spark, pts), radius=2, min_len=3).collect()
    }
    # runs: ticks 0-3 (len 4) and 6-9 (len 4) — both >= 3, but the
    # operator emits one row per run; collect as sets instead
    rows = comovement_runs(_df(spark, pts), radius=2, min_len=3).collect()
    runs = sorted((r["start_t"], r["end_t"], r["run_len"]) for r in rows)
    assert runs == [(0, 3, 4), (6, 9, 4)]
    assert all((r["id_a"], r["id_b"]) == (1, 2) for r in rows)


def test_min_len_filters_short_runs(spark):
    pts = {(1, t): (0, 0) for t in range(5)}
    pts.update({(2, t): (1, 1) for t in (0, 1, 3, 4)})  # runs of 2 and 2
    assert comovement_runs(_df(spark, pts), radius=2, min_len=3).count() == 0
    assert comovement_runs(_df(spark, pts), radius=2, min_len=2).count() == 2


def test_negative_coords_and_cell_edges(spark):
    # straddle cell boundaries and zero: cells must still pair them
    pts = {}
    for t in range(4):
        pts[(7, t)] = (-1, -1)
        pts[(9, t)] = (1, 1)  # chebyshev 2 exactly
    rows = comovement_runs(_df(spark, pts), radius=2, min_len=4).collect()
    assert [(r["id_a"], r["id_b"], r["run_len"]) for r in rows] == [(7, 9, 4)]


def test_matches_bruteforce_random(spark):
    rng = np.random.RandomState(42)
    pts = {}
    for e in range(12):
        x, y = int(rng.randint(0, 30)), int(rng.randint(0, 30))
        for t in range(15):
            x += int(rng.randint(-2, 3))
            y += int(rng.randint(-2, 3))
            pts[(e, t)] = (x, y)
    exp = _ref_runs(pts, 3, 3)
    got = {}
    rows = comovement_runs(_df(spark, pts), radius=3, min_len=3).collect()
    for r in rows:
        got.setdefault((r["id_a"], r["id_b"]), []).append(
            (r["start_t"], r["end_t"], r["run_len"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got == exp


def test_radius_validation(spark):
    with pytest.raises(ValueError):
        comovement_runs(_df(spark, {(1, 0): (0, 0)}), radius=0)
