"""hausdorff_join (geo/similarity.py): discrete Hausdorff track pairs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo.similarity import hausdorff_join, track_arrays


def _tracks(seed=11, n_tracks=12, n_pts=18):
    """Clustered synthetic traces: 4 bases x 3 tracks each, one base
    straddling the antimeridian, one at 78 deg latitude."""
    rng = np.random.default_rng(seed)
    bases = [(179.9, 5.0), (-40.0, -20.0), (12.0, 47.0), (100.0, 78.0)]
    rows = []
    for t in range(n_tracks):
        bx, by = bases[t % len(bases)]
        jx, jy = rng.uniform(-0.05, 0.05, 2)
        for s in range(n_pts):
            dx, dy = rng.uniform(-0.03, 0.03, 2)
            rows.append(
                (
                    t,
                    s,
                    float((bx + jx + dx + 180) % 360 - 180),
                    float(np.clip(by + jy + dy, -89, 89)),
                )
            )
    return rows


def _round6(x):
    return np.floor(np.asarray(x) * 1e6 + 0.5 + 1e-8) / 1e6


def _brute_hausdorff(rows, d_km):
    """All-pairs NumPy oracle with the identical rounding contract."""
    by_t = {}
    for t, s, lon, lat in rows:
        by_t.setdefault(t, []).append((s, lon, lat))
    arrs = {}
    for t, pts in by_t.items():
        pts.sort()
        a = np.array([(p[1], p[2]) for p in pts])
        arrs[t] = (np.radians(a[:, 0]), np.radians(a[:, 1]), a)
    exp = {}
    ids = sorted(arrs)
    for i, ta in enumerate(ids):
        for tb in ids[i + 1 :]:
            lon1, lat1, _ = arrs[ta]
            lon2, lat2, _ = arrs[tb]
            dlat = lat2[None, :] - lat1[:, None]
            dlon = lon2[None, :] - lon1[:, None]
            h = (
                np.sin(dlat / 2) ** 2
                + np.cos(lat1)[:, None] * np.cos(lat2)[None, :] * np.sin(dlon / 2) ** 2
            )
            d = _round6(2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(h, 0, 1))))
            hd = max(d.min(axis=1).max(), d.min(axis=0).max())
            if hd <= d_km:
                exp[(ta, tb)] = hd
    return exp


def test_hausdorff_join_matches_bruteforce(spark):
    rows = _tracks()
    df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
    got = {
        (r.id_a, r.id_b): r.hausdorff_km
        for r in hausdorff_join(df, 25.0).collect()
    }
    exp = _brute_hausdorff(rows, 25.0)
    assert set(got) == set(exp)
    assert len(got) > 0
    for k in got:
        assert got[k] == pytest.approx(exp[k], abs=2e-6)
    assert all(a < b for a, b in got)
    # discrimination: some same-base pair below, every cross-base pair out
    assert len(got) < (len({r[0] for r in rows}) * (len({r[0] for r in rows}) - 1)) // 2


def test_hausdorff_tiling_identical(spark):
    rows = _tracks(seed=7)
    df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
    plain = {(r.id_a, r.id_b, r.hausdorff_km) for r in hausdorff_join(df, 25.0).collect()}
    tiled = {
        (r.id_a, r.id_b, r.hausdorff_km)
        for r in hausdorff_join(df, 25.0, tile=4).collect()
    }
    assert tiled == plain and len(plain) > 0


def test_track_arrays_seq_order(spark):
    # shuffled input rows must come back in seq order
    rows = [(0, 2, 3.0, 1.0), (0, 0, 1.0, 1.0), (0, 1, 2.0, 1.0)]
    df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
    r = track_arrays(df).collect()[0]
    assert list(r.lons) == [1.0, 2.0, 3.0]


def test_hausdorff_plans_no_cartesian(spark):
    rows = _tracks(seed=3, n_tracks=6, n_pts=5)
    df = spark.createDataFrame(rows, "track_id long, seq long, lon double, lat double")
    plan = (
        hausdorff_join(df, 25.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
