"""dbscan_points (geo/clustering.py): point-level DBSCAN via radius_join + CC."""

import numpy as np
from pyspark.sql import functions as F

from morituri_spark.geo.clustering import dbscan_points


def _hav_km(a, b):
    lon1, lat1, lon2, lat2 = map(np.radians, (a[0], a[1], b[0], b[1]))
    h = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * 6371.0088 * np.arcsin(np.sqrt(min(h, 1.0)))


def _reference_dbscan(pts, eps_km, min_pts):
    """Deterministic reference: component-minimum labels, min-label border
    assignment (the module's pinned rules)."""
    ids = [p[0] for p in pts]
    xy = {p[0]: (p[1], p[2]) for p in pts}
    nbrs = {
        i: [j for j in ids if round(_hav_km(xy[i], xy[j]), 6) <= eps_km]
        for i in ids
    }
    core = {i for i in ids if len(nbrs[i]) >= min_pts}
    # union-find over core-core edges
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp = {}
    for i in core:
        comp.setdefault(find(i), []).append(i)
    label = {}
    for root, members in comp.items():
        m = min(members)
        for i in members:
            label[i] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (True, label[i])
        else:
            cand = [label[j] for j in nbrs[i] if j in core]
            out[i] = (False, min(cand) if cand else -1)
    return out


def _fixture_points():
    """Geometry tuned for eps=35 km, min_pts=4 at lat 45 (1° lon ≈ 78.7 km):
    two blob+outlier clusters whose outlier cores both reach a single
    bridge point (~30/34 km) that itself has only 3 neighbors — a genuine
    border point adjacent to TWO clusters (min-label rule exercised);
    blobs sit 63+ km from the bridge so the clusters never merge. Plus an
    isolated pair (noise) and a 5-point polar cluster (cos-widened lon
    probe exercised)."""
    rng = np.random.default_rng(11)
    pts = []
    i = 0
    for bx, by, n, spread in [
        (9.70, 45.0, 12, 0.01),   # blob A
        (11.35, 45.0, 12, 0.01),  # blob B
        (-170.0, -20.0, 2, 0.01),  # noise pair
        (25.0, 78.0, 5, 0.02),    # polar cluster
    ]:
        for _ in range(n):
            pts.append(
                (i, float(bx + rng.uniform(-spread, spread)),
                 float(by + rng.uniform(-spread, spread)))
            )
            i += 1
    pts.append((i, 10.12, 45.0))  # outlier core of A
    pts.append((i + 1, 10.93, 45.0))  # outlier core of B
    pts.append((i + 2, 10.50, 45.0))  # the two-cluster border point
    return pts


def test_dbscan_matches_reference(spark):
    pts = _fixture_points()
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {
        r["id"]: (r["is_core"], r["cluster_id"])
        for r in dbscan_points(df, eps_km=35.0, min_pts=4).collect()
    }
    want = _reference_dbscan(pts, 35.0, 4)
    assert got == want
    # sanity on the fixture's intent: ≥2 clusters, some noise, some border
    labels = {v[1] for v in got.values() if v[1] != -1}
    assert len(labels) >= 2
    assert any(v[1] == -1 for v in got.values())
    assert any((not v[0]) and v[1] != -1 for v in got.values())


def test_dbscan_all_noise_and_all_one_cluster(spark):
    sparse = [(0, 0.0, 0.0), (1, 90.0, 40.0), (2, -120.0, -50.0)]
    df = spark.createDataFrame(sparse, "id long, lon double, lat double")
    got = dbscan_points(df, eps_km=10.0, min_pts=2).collect()
    assert all((not r["is_core"]) and r["cluster_id"] == -1 for r in got)

    dense = [(i, 5.0 + i * 1e-4, 5.0) for i in range(6)]
    df2 = spark.createDataFrame(dense, "id long, lon double, lat double")
    got2 = dbscan_points(df2, eps_km=5.0, min_pts=3).collect()
    assert all(r["is_core"] and r["cluster_id"] == 0 for r in got2)
