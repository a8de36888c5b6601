import numpy as np

from morituri_spark.geo import cells as C


def test_encode_roundtrip_bounds():
    lon = np.array([-180.0, -0.001, 0.0, 9.999, 179.999])
    lat = np.array([-90.0, -0.001, 0.0, 45.5, 89.999])
    for res in (0, 5, 12, 29):
        cell = C.latlng_to_cell(lon, lat, res)
        assert np.all(C.cell_res(cell) == res)
        lon0, lat0, lon1, lat1 = C.cell_bounds(cell)
        assert np.all(lon0 <= lon) and np.all(lon < lon1 + 1e-9)
        assert np.all(lat0 <= lat) and np.all(lat < lat1 + 1e-9)


def test_edge_clamp():
    cell = C.latlng_to_cell([180.0], [90.0], 10)
    x, y = C.cell_xy(cell)
    assert x[0] == (1 << 10) - 1 and y[0] == (1 << 10) - 1


def test_parent_consistency():
    cell = C.latlng_to_cell([5.0], [45.0], 15)
    for pr in (15, 12, 7, 0):
        parent = C.cell_to_parent(cell, pr)
        direct = C.latlng_to_cell([5.0], [45.0], pr)
        assert parent[0] == direct[0]


def test_grid_ring_disk():
    cell = int(C.latlng_to_cell([5.0], [45.0], 10)[0])
    assert len(C.grid_ring(cell, 0)) == 1
    assert len(C.grid_ring(cell, 1)) == 8
    assert len(C.grid_ring(cell, 2)) == 16
    assert len(C.grid_disk(cell, 2)) == 25
    # every ring-1 member's parent-neighbors contain the center cell
    x, y = C.cell_xy(cell)
    for nb in C.grid_ring(cell, 1):
        nx, ny = C.cell_xy(nb)
        assert max(abs(int(nx) - int(x)), abs(int(ny) - int(y))) == 1


def test_grid_ring_wraps_antimeridian():
    cell = int(C.latlng_to_cell([-179.999], [0.0], 8)[0])
    ring = C.grid_ring(cell, 1)
    assert len(ring) == 8  # wrapped, not clipped


def test_grid_ring_clips_pole():
    cell = int(C.latlng_to_cell([0.0], [89.99], 8)[0])
    ring = C.grid_ring(cell, 1)
    assert len(ring) == 5  # top row clipped


def test_cover_bbox_superset():
    cover = C.cover_bbox(1.0, 41.0, 2.0, 42.0, 8)
    # every point in the bbox encodes to a cover member
    rng = np.random.default_rng(0)
    lon = rng.uniform(1.0, 2.0, 500)
    lat = rng.uniform(41.0, 42.0, 500)
    pts = C.latlng_to_cell(lon, lat, 8)
    assert np.all(np.isin(pts, cover))


def test_polygon_cover_superset_of_contained_points():
    from morituri_spark.geo.pip import points_in_polygon_np

    tri = [[[0.0, 40.0], [8.0, 41.0], [4.0, 49.0], [0.0, 40.0]]]
    cover = C.polygon_cover(tri, 9)
    rng = np.random.default_rng(1)
    lon = rng.uniform(0, 8, 2000)
    lat = rng.uniform(40, 49, 2000)
    inside = points_in_polygon_np(lon, lat, tri)
    pts = C.latlng_to_cell(lon[inside], lat[inside], 9)
    assert np.all(np.isin(pts, cover))
    # and the cover is meaningfully smaller than the bbox cover
    bbox_cover = C.cover_bbox(0.0, 40.0, 8.0, 49.0, 9)
    assert len(cover) < 0.75 * len(bbox_cover)


def test_parent_col_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    cell = C.latlng_to_cell(lon, lat, 15)
    df = spark.createDataFrame(pd.DataFrame({"cell": cell}))
    got = df.select(C.parent_col(F.col("cell"), 7, 15).alias("p")).toPandas()["p"].to_numpy()
    want = C.cell_to_parent(cell, 7)
    assert np.array_equal(np.sort(got), np.sort(want))


def test_cell_col_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    for res in (0, 7, 12, 29):
        got = (
            spark.createDataFrame(pdf)
            .select(C.cell_col(F.col("lon"), F.col("lat"), res).alias("c"))
            .toPandas()["c"].to_numpy()
        )
        want = C.latlng_to_cell(lon, lat, res)
        assert np.array_equal(got, want), f"res {res}"


def test_compact_cover_preserves_region_and_disjointness():
    """compact→expand round-trips to the original cell set; compacted
    cells are pairwise disjoint (no cell is an ancestor of another)."""
    import numpy as np

    from morituri_spark.geo import cells as C

    rng = np.random.default_rng(3)
    res = 10
    # a blobby region: all res-10 cells within a disc + noise cells
    cx, cy = C.cell_xy(C.latlng_to_cell(np.array([5.0]), np.array([45.0]), res))
    xs, ys = np.meshgrid(np.arange(-20, 21), np.arange(-20, 21))
    mask = xs**2 + ys**2 <= 400
    cells = C.pack_cell(res, int(cx[0]) + xs[mask], int(cy[0]) + ys[mask])
    extra = C.pack_cell(res, int(cx[0]) + rng.integers(30, 60, 25),
                        int(cy[0]) + rng.integers(30, 60, 25))
    cells = np.unique(np.concatenate([cells, extra]))

    comp = C.compact_cover(cells, res_min=4)
    assert len(comp) < len(cells)  # something merged
    back = C.expand_cover(comp, res)
    assert np.array_equal(back, np.sort(cells))
    # disjoint: no compacted cell is an ancestor of another
    comp_set = set(comp.tolist())
    for c in comp:
        r = int(C.cell_res([c])[0])
        for pr in range(4, r):
            assert int(C.cell_to_parent([c], pr)[0]) not in comp_set


def test_compact_cover_trivial_cases():
    import numpy as np

    from morituri_spark.geo import cells as C

    assert len(C.compact_cover(np.empty(0, dtype=np.int64))) == 0
    one = C.latlng_to_cell(np.array([1.0]), np.array([2.0]), 8)
    assert np.array_equal(C.compact_cover(one), one)
    # a full parent quad at res 8 compacts to exactly the res-7 parent
    x, y = C.cell_xy(one)
    quad = C.pack_cell(8, (int(x[0]) // 2 * 2) + np.array([0, 0, 1, 1]),
                       (int(y[0]) // 2 * 2) + np.array([0, 1, 0, 1]))
    comp = C.compact_cover(quad)
    assert len(comp) == 1 and int(C.cell_res(comp)[0]) == 7
