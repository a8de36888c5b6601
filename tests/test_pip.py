"""PIP join: Spark result vs driver-side brute-force oracle (same tie rule)."""

import numpy as np
import pytest

from morituri_spark.geo import pip
from morituri_spark.pipelines import flagship
from morituri_spark.sources import synth


def brute_force(images_pdf, zones_rows):
    out = set()
    px = images_pdf["lon"].to_numpy()
    py = images_pdf["lat"].to_numpy()
    ids = images_pdf["image_id"].to_numpy()
    for zid, rings in zones_rows:
        hit = pip.points_in_polygon_np(px, py, rings)
        for i in np.nonzero(hit)[0]:
            out.add((ids[i], zid))
    return out


@pytest.fixture(scope="module")
def data(spark):
    images = synth.images_table(spark, 3000, partitions=4, with_payload=False).cache()
    zones = synth.zones_table(spark).cache()
    images_pdf = images.select("image_id", "lon", "lat").toPandas()
    zones_rows = [(r["zone_id"], r["rings"]) for r in zones.select("zone_id", "rings").collect()]
    oracle = brute_force(images_pdf, zones_rows)
    return images, zones, oracle


def test_broadcast_matches_oracle(data):
    images, zones, oracle = data
    got = pip.assign_zones_broadcast(images.select("image_id", "lon", "lat"), zones)
    got_set = {(r["image_id"], r["zone_id"]) for r in got.collect()}
    assert got_set == oracle


def test_shuffle_salted_matches_oracle(data):
    images, zones, oracle = data
    got = pip.assign_zones_shuffle(
        # tiny work target forces salting to ENGAGE so correctness under
        # salt-split groups stays covered
        images.select("image_id", "lon", "lat"), zones, res=9, salt_target_work=1000.0
    )
    got_set = {(r["image_id"], r["zone_id"]) for r in got.collect()}
    assert got_set == oracle


def test_shuffle_auto_nosalt_matches_oracle(data):
    """Default work target on light polygons → planner decides NOT to salt;
    same oracle result through the degenerate (unsalted) plan."""
    images, zones, oracle = data
    got = pip.assign_zones_shuffle(images.select("image_id", "lon", "lat"), zones, res=9)
    got_set = {(r["image_id"], r["zone_id"]) for r in got.collect()}
    assert got_set == oracle


def test_hole_semantics(spark):
    """Annulus zone: points in the hole are NOT assigned."""
    zones = synth.zones_table(spark)
    annulus_id = zones.count() - 1  # last zone is the annulus
    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["in_ring", "in_hole", "outside"],
                "lon": [1.7, 2.5, 9.0],
                "lat": [41.7, 42.5, 49.0],
            }
        )
    )
    got = pip.assign_zones_broadcast(pts, zones.where(f"zone_id = {annulus_id}"))
    ids = {r["image_id"] for r in got.collect()}
    assert ids == {"in_ring"}


def test_flagship_rollup_counts(data):
    images, zones, oracle = data
    rolled = flagship.run_flagship(images, zones, res=9, tile_res=6)
    total = rolled.agg({"n_images": "sum"}).collect()[0][0]
    assert total == len(oracle)


def test_catalyst_pip_matches_oracle(data):
    images, zones, oracle = data
    got = pip.assign_zones_catalyst(images.select("image_id", "lon", "lat"), zones, res=9)
    got_set = {(r["image_id"], r["zone_id"]) for r in got.collect()}
    assert got_set == oracle


def _grid_zones(spark, n_side, x0=0.0, y0=40.0, w=10.0, h=10.0, zone_id="zone_id",
                extra_vertices=0):
    """n_side² rectangle zones tiling the bbox; rectangles have horizontal
    edges (static-prune path). ``extra_vertices`` adds collinear points per
    edge to inflate the edge count without changing geometry."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    dx, dy = w / n_side, h / n_side
    rows = []
    for gy in range(n_side):
        for gx in range(n_side):
            ax, ay = x0 + gx * dx, y0 + gy * dy
            bx, by = ax + dx, ay + dy
            corners = [(ax, ay), (bx, ay), (bx, by), (ax, by), (ax, ay)]
            ring = []
            for (cx, cy), (nx2, ny2) in zip(corners[:-1], corners[1:]):
                ring.append([cx, cy])
                for k in range(1, extra_vertices + 1):
                    t = k / (extra_vertices + 1)
                    ring.append([cx + t * (nx2 - cx), cy + t * (ny2 - cy)])
            ring.append([corners[-1][0], corners[-1][1]])
            rows.append((gy * n_side + gx, [ring]))
    schema = StructType([
        StructField(zone_id, LongType(), False),
        StructField("rings", ArrayType(ArrayType(ArrayType(DoubleType()))), False),
    ])
    return spark.createDataFrame(rows, schema)


def test_catalyst_many_zones_custom_zone_id(spark, data):
    """>64 zones under the edge budget → union path; custom zone-id column
    name (ADVICE: the old inlined-CASE branch hardcoded 'zone_id' and failed
    janino on ~100 zones)."""
    images, _, _ = data
    pts = images.select("image_id", "lon", "lat").limit(500).cache()
    zones = _grid_zones(spark, 10, zone_id="admin_id")  # 100 zones, 500 edges
    got = pip.assign_zones_catalyst(pts, zones, res=9, zone_id="admin_id")
    got_set = {(r["image_id"], r["admin_id"]) for r in got.collect()}
    zones_rows = [(r["admin_id"], r["rings"]) for r in zones.collect()]
    oracle = brute_force(pts.toPandas(), zones_rows)
    assert got_set == oracle
    assert len(got_set) >= 450  # every in-bbox point lands in ≥1 grid cell


def test_catalyst_hof_branch_over_edge_budget(spark, data):
    """>4096 total edges → covers-join + HOF pip_expr branch, horizontal
    edges included, custom zone-id name."""
    images, _, _ = data
    pts = images.select("image_id", "lon", "lat").limit(300).cache()
    # 16 zones × 4 edges × (79+1) vertices/edge ≈ 5184 edges > 4096
    zones = _grid_zones(spark, 4, zone_id="zid", extra_vertices=80)
    n_edges = sum(
        len(ring) - 1 for r in zones.collect() for ring in r["rings"]
    )
    assert n_edges > pip._UNION_EDGE_BUDGET
    got = pip.assign_zones_catalyst(pts, zones, res=6, zone_id="zid")
    got_set = {(r["image_id"], r["zid"]) for r in got.collect()}
    zones_rows = [(r["zid"], r["rings"]) for r in zones.collect()]
    oracle = brute_force(pts.toPandas(), zones_rows)
    assert got_set == oracle


def test_catalyst_pip_hole_semantics(spark):
    zones = synth.zones_table(spark)
    annulus_id = zones.count() - 1
    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["in_ring", "in_hole", "outside"],
             "lon": [1.7, 2.5, 9.0], "lat": [41.7, 42.5, 49.0]}
        )
    )
    got = pip.assign_zones_catalyst(pts, zones.where(f"zone_id = {annulus_id}"))
    assert {r["image_id"] for r in got.collect()} == {"in_ring"}


@pytest.mark.parametrize("strategy", ["broadcast", "catalyst", "shuffle"])
def test_multipolygon_islands(spark, strategy):
    """One zone, two disjoint exteriors + a hole in the first: every PIP
    strategy must hit BOTH islands (the old rings[0]-only bbox/cover pruned
    island B) and exclude the hole."""
    import pandas as pd

    zones = synth.zones_table(spark)
    island_id = zones.count() - 2  # inserted just before the annulus
    z = zones.where(f"zone_id = {island_id}")
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["in_a", "in_a_hole", "in_b", "between", "outside"],
             "lon": [7.1, 7.5, 8.7, 8.25, 9.5],
             "lat": [46.1, 46.5, 46.2, 46.2, 49.5]}
        )
    )
    if strategy == "broadcast":
        got = pip.assign_zones_broadcast(pts, z)
    elif strategy == "catalyst":
        got = pip.assign_zones_catalyst(pts, z, res=9)
    else:
        got = pip.assign_zones_shuffle(pts, z, res=9)
    assert {r["image_id"] for r in got.collect()} == {"in_a", "in_b"}


def test_catalyst_mid_regime_strategies_agree(spark, data):
    """>4096 edges, ≤4096 zones: the default Arrow-broadcast mid-regime
    plan and the HOF covers plan produce identical assignments (and both
    match brute force)."""
    images, _, _ = data
    pts = images.select("image_id", "lon", "lat").limit(300).cache()
    zones = _grid_zones(spark, 4, zone_id="zid", extra_vertices=80)
    arrow = pip.assign_zones_catalyst(pts, zones, res=6, zone_id="zid")
    hof = pip.assign_zones_catalyst(pts, zones, res=6, zone_id="zid", mid_strategy="hof")
    a = {(r["image_id"], r["zid"]) for r in arrow.collect()}
    h = {(r["image_id"], r["zid"]) for r in hof.collect()}
    assert a == h
    zones_rows = [(r["zid"], r["rings"]) for r in zones.collect()]
    assert a == brute_force(pts.toPandas(), zones_rows)


def test_catalyst_mid_regime_zone_budget_fallthrough(spark, data):
    """>4096 edges AND zone count above the kernel budget → the catalyst
    route falls through to the cogroup shuffle plan; results unchanged."""
    images, _, _ = data
    pts = images.select("image_id", "lon", "lat").limit(200).cache()
    zones = _grid_zones(spark, 4, zone_id="zid", extra_vertices=80)
    got = pip.assign_zones_catalyst(
        pts, zones, res=6, zone_id="zid", kernel_zone_budget=4
    )
    got_set = {(r["image_id"], r["zid"]) for r in got.collect()}
    zones_rows = [(r["zid"], r["rings"]) for r in zones.collect()]
    assert got_set == brute_force(pts.toPandas(), zones_rows)


def test_grid_indexed_polygons_match_flat(spark):
    """GridIndexedPolygons.assign ≡ FlatPolygons.assign (same candidate
    filtering + even-odd tests, just bucketed) — random zones incl. a
    holed MultiPolygon, random + boundary points."""
    import numpy as np

    from morituri_spark.geo.pip import FlatPolygons, GridIndexedPolygons

    rng = np.random.default_rng(11)
    zone_ids, ring_lists = [], []
    for z in range(150):
        cx, cy = rng.uniform(-10, 10), rng.uniform(35, 55)
        r = rng.uniform(0.1, 1.5)
        k = int(rng.integers(3, 9))
        ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
        ring = [[cx + r * np.cos(a), cy + r * np.sin(a)] for a in ang]
        ring.append(ring[0])
        rings = [ring]
        if z % 10 == 0:  # hole
            hr = r * 0.4
            hole = [[cx + hr * np.cos(a), cy + hr * np.sin(a)] for a in ang]
            hole.append(hole[0])
            rings.append(hole)
        if z % 17 == 0:  # second island exterior
            rings.append([[cx + 3, cy], [cx + 3.5, cy], [cx + 3.5, cy + 0.5],
                          [cx + 3, cy + 0.5], [cx + 3, cy]])
        zone_ids.append(z)
        ring_lists.append(rings)

    px = rng.uniform(-12, 12, 5000)
    py = rng.uniform(33, 57, 5000)
    flat = FlatPolygons(zone_ids, ring_lists)
    grid = GridIndexedPolygons(zone_ids, ring_lists)
    fi, fz = flat.assign(px, py)
    gi, gz = grid.assign(px, py)
    assert sorted(zip(fi.tolist(), fz.tolist())) == sorted(zip(gi.tolist(), gz.tolist()))
    assert len(fi) > 0


def test_collect_polygons_grid_index_opt_in(spark):
    import numpy as np

    from morituri_spark.geo import pip as P

    rows = []
    for z in range(100):
        x = float(z % 10), float(z // 10)
        rows.append((z, [[[x[0], x[1]], [x[0] + 0.9, x[1]], [x[0] + 0.9, x[1] + 0.9],
                          [x[0], x[1] + 0.9], [x[0], x[1]]]]))
    zones = spark.createDataFrame(rows, "zone_id long, rings array<array<array<double>>>")
    # default stays PLAIN (grid index measured slower — negative result
    # documented on GridIndexedPolygons); 'always' opts in
    assert not isinstance(P._collect_polygons(zones), P.GridIndexedPolygons)
    assert isinstance(
        P._collect_polygons(zones, grid_index="always"), P.GridIndexedPolygons
    )


def test_shuffle_compact_cover_matches_broadcast(spark):
    """Compacted mixed-res covers: identical assignments to the broadcast
    strategy (point probes one ancestor per level; cover cells disjoint)."""
    from morituri_spark.geo import pip as P
    from morituri_spark.sources import synth

    pts = synth.images_table(spark, 4000, partitions=4, with_payload=False).select(
        "image_id", "lon", "lat"
    )
    zones = synth.zones_table(spark).select("zone_id", "rings")
    want = sorted(
        (r["image_id"], r["zone_id"])
        for r in P.assign_zones_broadcast(pts, zones).collect()
    )
    got = sorted(
        (r["image_id"], r["zone_id"])
        for r in P.assign_zones_shuffle(pts, zones, res=10, compact_res_min=5).collect()
    )
    assert got == want and len(got) > 0


def test_compact_cover_shrinks_big_zone():
    """A big polygon's res-12 cover compacts by an order of magnitude."""
    import numpy as np

    from morituri_spark.geo import cells as C
    from morituri_spark.sources.synth import _regular_polygon

    ring = _regular_polygon(5.0, 45.0, 3.0, 64)
    cover = C.polygon_cover([ring], 12)
    comp = C.compact_cover(cover, res_min=5)
    assert len(cover) / len(comp) > 5, (len(cover), len(comp))
    assert np.array_equal(C.expand_cover(comp, 12), np.sort(cover))


def test_auto_compact_routing_decision():
    """r5 verdict #6: the auto route engages compaction at the measured
    crossover (cover rows rival point rows) and NOT below it, with depth
    following log4(cover/points)."""
    from morituri_spark.geo.pip import _auto_compact_res_min

    # far below crossover: many points, few cover rows → fixed-res cover
    assert _auto_compact_res_min(1_000_000, 1_000, 13) is None
    # just below: cover = points - 1 → still off
    assert _auto_compact_res_min(1_000, 999, 13) is None
    # at/above: engages with bounded depth
    assert _auto_compact_res_min(1_000, 1_000, 13) == 12  # minimum 2 levels
    assert _auto_compact_res_min(1_000, 1_000_000, 13) == 8  # log4(1000)≈5 → 6 levels
    assert _auto_compact_res_min(1, 10**12, 13) == 7  # clamped at 7 levels
    assert _auto_compact_res_min(1, 10**12, 3) == 0  # res floor


def test_estimate_cover_rows_bbox_bound(spark):
    """Estimator: bbox cell-rectangle per zone, an upper bound on the real
    polygon cover, exact for axis-aligned rects."""
    from morituri_spark.geo import cells as C
    from morituri_spark.geo.pip import estimate_cover_rows
    from morituri_spark.sources.synth import _rect, _regular_polygon

    rect = _rect(0.0, 0.0, 45.0, 45.0)  # 45° square from the equator
    zones = spark.createDataFrame(
        [(0, [rect])], "zone_id long, rings array<array<array<double>>>"
    )
    est = estimate_cover_rows(zones, 6)
    real = len(C.polygon_cover([rect], 6))
    assert est >= real
    # 45° = 8 cells of 5.625° (x) / 16 of 2.8125° (y) + boundary cell
    assert est <= (8 + 1) * (16 + 1)

    hexa = _regular_polygon(5.0, 45.0, 3.0, 6)
    zh = spark.createDataFrame(
        [(0, [hexa])], "zone_id long, rings array<array<array<double>>>"
    )
    assert estimate_cover_rows(zh, 12) >= len(C.polygon_cover([hexa], 12))


def test_auto_compact_end_to_end_matches_forced_off(spark):
    """At an engaging shape (one 6°-wide zone at res 12 vs 500 points →
    cover ≫ points) the default auto route must return exactly the
    forced-off result — compaction is a physical-plan change only."""
    from pyspark.sql import functions as F

    from morituri_spark.geo import pip as P
    from morituri_spark.geo.pip import _auto_compact_res_min, estimate_cover_rows
    from morituri_spark.sources.synth import _regular_polygon

    zones = spark.createDataFrame(
        [(0, [_regular_polygon(5.0, 45.0, 3.0, 32)])],
        "zone_id long, rings array<array<array<double>>>",
    )
    pts = spark.range(500).select(
        F.col("id").alias("pid"),
        (2.0 + (F.col("id") % 100).cast("double") * 0.06).alias("lon"),
        (42.0 + (F.col("id") % 90).cast("double") * 0.07).alias("lat"),
    )
    # the routing decision at this shape is "engage"
    assert _auto_compact_res_min(
        pts.count(), estimate_cover_rows(zones, 12), 12
    ) is not None
    auto = sorted(
        (r["pid"], r["zone_id"])
        for r in P.assign_zones_shuffle(pts, zones, res=12).collect()
    )
    off = sorted(
        (r["pid"], r["zone_id"])
        for r in P.assign_zones_shuffle(pts, zones, res=12, compact_res_min=None).collect()
    )
    assert auto == off and len(auto) > 0
