"""Hilbert-curve keys (io/hilbert.py): key math, layout integration,
locality advantage over the Morton z-order."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.io import hilbert as H
from morituri_spark.io import layout


def _xy2d_scalar(res, x, y):
    """Canonical per-bit walk (Wikipedia xy2d), scalar reference."""
    d = 0
    n1 = (1 << res) - 1
    for bit in range(res - 1, -1, -1):
        s = 1 << bit
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n1 - x, n1 - y
            x, y = y, x
    return d


def test_hilbert_matches_scalar_reference_and_is_bijective():
    res = 5
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    got = H.hilbert_xy(xs, ys, res)
    ref = np.array([_xy2d_scalar(res, int(a), int(b)) for a, b in zip(xs, ys)])
    assert np.array_equal(got, ref)
    assert got.min() == 0 and got.max() == n * n - 1
    assert len(np.unique(got)) == n * n


def test_hilbert_unit_step_adjacency():
    # the defining no-jump property the Z-curve lacks: consecutive keys
    # are always 4-neighbor cells
    res = 6
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    order = np.argsort(H.hilbert_xy(xs, ys, res))
    steps = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert np.all(steps == 1)


def test_catalyst_hilbert_matches_numpy(spark):
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.9, 179.9, 2000)
    lat = rng.uniform(-89.9, 89.9, 2000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    rows = H.with_hilbert(df, "lon", "lat", 14).collect()
    got = np.array([r["hkey"] for r in rows])
    want = H.hilbert_np(
        np.array([r["lon"] for r in rows]), np.array([r["lat"] for r in rows]), 14
    )
    assert np.array_equal(got, want)
    with pytest.raises(ValueError, match="hilbert res"):
        H.with_hilbert(df, "lon", "lat", 0)


def test_cell_h_interval_is_exact_descendant_set():
    from morituri_spark.geo import cells

    res_sort = 7
    n = 1 << res_sort
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    keys = H.hilbert_xy(xs, ys, res_sort)
    for (qx, qy, r) in [(0, 0, 2), (3, 1, 2), (5, 6, 3), (1, 0, 1)]:
        cell = int(cells.pack_cell(r, qx, qy))
        h0, h1 = H.cell_h_interval(cell, res_sort)
        s = res_sort - r
        inside = (xs >> s == qx) & (ys >> s == qy)
        assert np.array_equal(
            np.sort(keys[inside]), np.arange(h0, h1 + 1)
        )


def test_hilbert_ranges_cover_bbox_and_merge_tighter_than_morton():
    rng = np.random.default_rng(23)
    h_total = m_total = 0
    for _ in range(15):
        lon0, lat0 = rng.uniform(-170, 120), rng.uniform(-80, 40)
        lon1, lat1 = lon0 + rng.uniform(1, 40), lat0 + rng.uniform(1, 40)
        ranges = H.hilbert_ranges(lon0, lat0, lon1, lat1, 12, max_ranges=32)
        assert 1 <= len(ranges) <= 32
        lon = rng.uniform(lon0, lon1, 400)
        lat = rng.uniform(lat0, lat1, 400)
        hk = H.hilbert_np(lon, lat, 12)
        for k in hk:
            assert any(lo <= k <= hi for lo, hi in ranges)
        h_total += len(ranges)
        m_total += len(
            layout.morton_ranges(lon0, lat0, lon1, lat1, 12, max_ranges=32)
        )
    # the locality claim, measured: over the sample the no-jump curve
    # needs strictly fewer surviving intervals at the same quad budget
    assert h_total < m_total
    with pytest.raises(ValueError, match="antimeridian"):
        H.hilbert_ranges(170.0, 10.0, -170.0, 20.0, 12)


@pytest.fixture(scope="module")
def hilbert_layout(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hlayout") / "pts")
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179.9, 179.9, 30_000)
    lat = rng.uniform(-89.9, 89.9, 30_000)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "pid long, lon double, lat double",
    )
    layout.write_spatial(
        df, path, res_part=3, res_sort=14, curve="hilbert",
        parquet_options={"parquet.block.size": str(64 * 1024)},
    )
    return path, df


BBOX = (12.0, 40.0, 58.0, 71.0)


def test_hilbert_layout_bbox_read_exact(spark, hilbert_layout):
    path, df = hilbert_layout
    assert layout.read_layout_meta(spark, path).get("curve") == "hilbert"
    got = sorted(
        r.pid for r in layout.read_bbox(spark, path, *BBOX).select("pid").collect()
    )
    want = sorted(
        r.pid
        for r in df.where(
            F.col("lon").between(BBOX[0], BBOX[2])
            & F.col("lat").between(BBOX[1], BBOX[3])
        )
        .select("pid")
        .collect()
    )
    assert got == want and len(got) > 0


def test_hilbert_layout_read_cells_exact(spark, hilbert_layout):
    from morituri_spark.geo import cells

    path, df = hilbert_layout
    target = cells.latlng_to_cell(np.array([20.0]), np.array([50.0]), 6)
    disk = [int(c) for c in cells.grid_disk(int(target[0]), 1)]
    got = sorted(
        r.pid for r in layout.read_cells(spark, path, disk).select("pid").collect()
    )
    want = sorted(
        r.pid
        for r in df.where(
            cells.cell_col(F.col("lon"), F.col("lat"), 6).isin(disk)
        )
        .select("pid")
        .collect()
    )
    assert got == want and len(got) > 0


def test_hilbert_prunes_no_worse_than_morton_on_same_points(
    spark, hilbert_layout, tmp_path_factory
):
    """Row-group evidence for the locality claim: identical points,
    identical file/row-group sizing, same bbox — the Hilbert layout's
    surviving row groups carry no more dead rows than the Morton one."""
    hpath, df = hilbert_layout
    zpath = str(tmp_path_factory.mktemp("zlayout") / "pts")
    layout.write_spatial(
        df, zpath, res_part=3, res_sort=14,
        parquet_options={"parquet.block.size": str(64 * 1024)},
    )
    hstats = layout.prune_stats(hpath, H.hilbert_ranges(*BBOX, 14))
    zstats = layout.prune_stats(zpath, layout.morton_ranges(*BBOX, 14))
    assert (
        hstats["rows_in_overlapping_groups"]
        <= zstats["rows_in_overlapping_groups"]
    )
    assert (
        hstats["row_groups_overlapping"] <= zstats["row_groups_overlapping"]
    )
