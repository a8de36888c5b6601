"""Z-order spatial layout: key math, pruning layers, exactness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo import cells
from morituri_spark.io import layout


def _random_points(n, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-89.9, 89.9, n)
    return lon, lat


def test_spread_bits_known_values():
    assert layout.spread_bits(np.array([0b1011]))[0] == 0b1000101
    assert layout.spread_bits(np.array([0b11111]))[0] == 0b101010101
    # full-width 29-bit input stays within 58 bits
    v = layout.spread_bits(np.array([(1 << 29) - 1]))[0]
    assert v == int("01" * 29, 2)


def test_catalyst_zorder_matches_numpy(spark):
    lon, lat = _random_points(2000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    got = np.array(
        [r[0] for r in df.select(layout.zorder_col(F.col("lon"), F.col("lat"), 14)).collect()]
    )
    want = layout.zorder_np(lon, lat, 14)
    assert (got == want).all()


def test_morton_corner_bound_contains_bbox_cells():
    # every point inside the bbox codes between the two corner codes
    rng = np.random.default_rng(11)
    for _ in range(20):
        lon0, lat0 = rng.uniform(-170, 160), rng.uniform(-80, 70)
        lon1, lat1 = lon0 + rng.uniform(0.1, 9), lat0 + rng.uniform(0.1, 9)
        zmin, zmax = layout.morton_range(lon0, lat0, lon1, lat1, 12)
        lon = rng.uniform(lon0, lon1, 500)
        lat = rng.uniform(lat0, lat1, 500)
        z = layout.zorder_np(lon, lat, 12)
        assert z.min() >= zmin and z.max() <= zmax


def test_morton_ranges_cover_bbox_and_tighten():
    rng = np.random.default_rng(23)
    for _ in range(15):
        lon0, lat0 = rng.uniform(-170, 120), rng.uniform(-80, 40)
        lon1, lat1 = lon0 + rng.uniform(1, 40), lat0 + rng.uniform(1, 40)
        ranges = layout.morton_ranges(lon0, lat0, lon1, lat1, 12, max_ranges=32)
        assert 1 <= len(ranges) <= 32
        # superset property: every in-box point's code falls in some range
        lon = rng.uniform(lon0, lon1, 400)
        lat = rng.uniform(lat0, lat1, 400)
        for z in layout.zorder_np(lon, lat, 12):
            assert any(lo <= z <= hi for lo, hi in ranges)
        # tightening: total covered width never exceeds the corner bound
        zmin, zmax = layout.morton_range(lon0, lat0, lon1, lat1, 12)
        width = sum(hi - lo + 1 for lo, hi in ranges)
        assert width <= zmax - zmin + 1
        assert ranges[0][0] >= zmin and ranges[-1][1] <= zmax


def test_antimeridian_bbox_rejected():
    with pytest.raises(ValueError, match="antimeridian"):
        layout.morton_ranges(170.0, 10.0, -170.0, 20.0, 12)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "pts")
    lon, lat = _random_points(60_000, seed=3)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "pid long, lon double, lat double",
    )
    layout.write_spatial(
        df, path, res_part=3, res_sort=14,
        parquet_options={"parquet.block.size": str(64 * 1024)},
    )
    return path, df


BBOX = (12.0, 40.0, 58.0, 71.0)


def test_read_bbox_exact(spark, clustered):
    path, df = clustered
    got = sorted(
        r.pid for r in layout.read_bbox(spark, path, *BBOX).select("pid").collect()
    )
    want = sorted(
        r.pid
        for r in df.where(
            F.col("lon").between(BBOX[0], BBOX[2]) & F.col("lat").between(BBOX[1], BBOX[3])
        ).select("pid").collect()
    )
    assert got == want and len(want) > 100


def test_read_bbox_plan_has_both_pruning_layers(spark, clustered):
    import contextlib
    import io

    path, _ = clustered
    df = layout.read_bbox(spark, path, *BBOX)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cell_p" in plan
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(zorder" in plan and "LessThanOrEqual(zorder" in plan


def test_row_group_pruning_engages(clustered):
    path, _ = clustered
    single = layout.prune_stats(path, layout.morton_range(*BBOX, 14))
    multi = layout.prune_stats(path, layout.morton_ranges(*BBOX, 14))
    assert single["row_groups_total"] > 8, single
    # clustering means most row groups do NOT overlap a small bbox range
    assert single["row_groups_overlapping"] < single["row_groups_total"] * 0.6, single
    # quadtree-split ranges prune at least as hard as the corner bound
    assert multi["row_groups_overlapping"] <= single["row_groups_overlapping"], (multi, single)


def test_meta_roundtrip(spark, clustered):
    path, _ = clustered
    meta = layout.read_layout_meta(spark, path)
    assert int(meta["res_part"]) == 3 and int(meta["res_sort"]) == 14


def test_compact_preserves_content_and_bounds_files(spark, tmp_path):
    import glob

    lon, lat = _random_points(20_000, seed=17)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "pid long, lon double, lat double",
    )
    path = str(tmp_path / "frag")
    # fragment like incremental ingest does: four append batches → four
    # sorted files per coarse cell
    for b in range(4):
        layout.write_spatial(
            df.where(F.col("pid") % 4 == b), path, res_part=2, res_sort=12,
            mode="append" if b else "overwrite",
        )
    before = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    got_before = sorted(r.pid for r in layout.read_bbox(spark, path, *BBOX).select("pid").collect())
    layout.compact_spatial(spark, path, n_files=4)
    after = len(glob.glob(f"{path}/**/*.parquet", recursive=True))
    got_after = sorted(r.pid for r in layout.read_bbox(spark, path, *BBOX).select("pid").collect())
    assert after <= before / 4
    assert got_after == got_before and len(got_after) > 50
    meta = layout.read_layout_meta(spark, path)
    assert int(meta["res_part"]) == 2 and int(meta["res_sort"]) == 12


def _expected_in_cells(df, cell_ids, res_sort):
    import pandas as pd

    pdf = df.toPandas()
    fine = cells.latlng_to_cell(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), res_sort)
    keep = pd.Series(False, index=pdf.index)
    for c in cell_ids:
        r = int(cells.cell_res(c))
        keep |= pd.Series(
            np.asarray(cells.cell_to_parent(fine, r)) == c, index=pdf.index
        )
    return sorted(pdf.loc[keep, "pid"].tolist())


def test_read_cells_exact_ring(spark, clustered):
    # kNN-style neighborhood: a grid_disk at a res between part and sort
    path, df = clustered
    center = int(cells.latlng_to_cell(np.array([20.0]), np.array([50.0]), 8)[0])
    disk = [int(c) for c in cells.grid_disk(center, 2)]
    got = sorted(r.pid for r in layout.read_cells(spark, path, disk).select("pid").collect())
    assert got == _expected_in_cells(df, disk, 14) and len(got) > 10


def test_read_cells_coarser_than_partition_layer(spark, clustered):
    # a res-1 cell is coarser than res_part=3: must expand to descendants
    path, df = clustered
    coarse = int(cells.latlng_to_cell(np.array([-100.0]), np.array([-40.0]), 1)[0])
    got = sorted(
        r.pid for r in layout.read_cells(spark, path, [coarse]).select("pid").collect()
    )
    assert got == _expected_in_cells(df, [coarse], 14) and len(got) > 1000


def test_read_polygon_exact(spark, clustered):
    # layout-backed spatial join: pruned read + ray-cast refine == full-scan PIP
    from morituri_spark.geo import pip

    path, df = clustered
    ring = [[10.0, 45.0], [40.0, 42.0], [55.0, 60.0], [25.0, 68.0], [10.0, 45.0]]
    got = sorted(
        r.pid
        for r in layout.read_polygon(spark, path, [ring]).select("pid").collect()
    )
    zone = spark.createDataFrame(
        [(0, [ring])], "zone_id long, rings array<array<array<double>>>"
    )
    want = sorted(
        r.pid for r in pip.assign_zones_broadcast(df, zone).select("pid").collect()
    )
    assert got == want and len(want) > 100


def test_read_cells_at_sort_res_single_cell(spark, clustered):
    path, df = clustered
    target = int(cells.latlng_to_cell(np.array([20.0]), np.array([50.0]), 14)[0])
    got = sorted(
        r.pid for r in layout.read_cells(spark, path, [target]).select("pid").collect()
    )
    assert got == _expected_in_cells(df, [target], 14)
