"""Haversine measures: known distances, degenerate paths, per-key lengths."""

from pyspark.sql import functions as F

from morituri_spark.geo.measures import haversine_km, path_lengths


def test_known_distances(spark):
    rows = [
        # equator degree ≈ 111.195 km at IUGG radius
        (0.0, 0.0, 1.0, 0.0, 111.195),
        # same point
        (13.4, 52.5, 13.4, 52.5, 0.0),
        # Berlin -> Paris ≈ 878 km
        (13.405, 52.52, 2.3522, 48.8566, 877.46),
    ]
    df = spark.createDataFrame(rows, "lon1 double, lat1 double, lon2 double, lat2 double, want double")
    got = df.select(
        "want",
        haversine_km(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d"),
    ).collect()
    for r in got:
        assert abs(r.d - r.want) < 1.0, (r.want, r.d)


def test_path_lengths_per_key(spark):
    rows = [
        (1, 1, 0.0, 0.0), (1, 2, 1.0, 0.0), (1, 3, 2.0, 0.0),  # 2 equator degrees
        (2, 1, 10.0, 10.0),                                      # single point: 0 km
    ]
    df = spark.createDataFrame(rows, "k long, seq long, lon double, lat double")
    got = {r.k: (r.n_points, r.path_km) for r in path_lengths(df, "k", ["seq"]).collect()}
    assert got[2] == (1, None) or got[2] == (1, 0.0)  # no steps -> sum of empty
    n, km = got[1]
    assert n == 3 and abs(km - 2 * 111.195) < 0.5


def test_ring_areas_known_shapes(spark):
    from morituri_spark.geo.measures import ring_areas

    rows = (
        # unit square, ordered CCW
        [(1, i, x, y) for i, (x, y) in enumerate([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])]
        # 2x3 rectangle, CW order (abs value)
        + [(2, i, x, y) for i, (x, y) in enumerate([(0.0, 0.0), (0.0, 3.0), (2.0, 3.0), (2.0, 0.0)])]
        # triangle base 4 height 2
        + [(3, i, x, y) for i, (x, y) in enumerate([(0.0, 0.0), (4.0, 0.0), (2.0, 2.0)])]
    )
    df = spark.createDataFrame(rows, "k long, seq long, lon double, lat double")
    got = {r.k: r.ring_area for r in ring_areas(df, "k", ["seq"]).collect()}
    assert got == {1: 1.0, 2: 6.0, 3: 4.0}


def test_segment_zone_lengths_midpoint_attribution(spark):
    """Each segment accrues to the zone holding its midpoint; zone totals
    are the per-zone haversine sums; out-of-zone midpoints drop."""
    from morituri_spark.geo.measures import haversine_km, segment_zone_lengths
    from pyspark.sql import functions as F

    # one path crossing two adjacent unit zones, one segment fully outside
    pts = spark.createDataFrame(
        [
            (1, 0, 0.2, 0.5),   # seg A mid (0.35, 0.5)  -> zone 0
            (1, 1, 0.5, 0.5),   # seg B mid (0.75, 0.5)  -> zone 0
            (1, 2, 1.0, 0.5),   # seg C mid (1.25, 0.5)  -> zone 1
            (1, 3, 1.5, 0.5),   # seg D mid (5.0, 0.5)   -> no zone
            (1, 4, 8.5, 0.5),
        ],
        "k long, seq long, lon double, lat double",
    )
    zones = spark.createDataFrame(
        [
            (0, [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]),
            (1, [[[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 0.0]]]),
        ],
        "zone_id long, rings array<array<array<double>>>",
    )
    got = {
        r.zone_id: (r.n_segments, r.road_km)
        for r in segment_zone_lengths(pts, zones, "k", ["seq"]).collect()
    }
    assert set(got) == {0, 1}
    assert got[0][0] == 2 and got[1][0] == 1

    def km(lon1, lat1, lon2, lat2):
        return (
            spark.range(1)
            .select(
                haversine_km(F.lit(lon1), F.lit(lat1), F.lit(lon2), F.lit(lat2)).alias("d")
            )
            .first()
            .d
        )

    assert abs(got[0][1] - round(km(0.2, 0.5, 0.5, 0.5) + km(0.5, 0.5, 1.0, 0.5), 4)) < 1e-9
    assert abs(got[1][1] - round(km(1.0, 0.5, 1.5, 0.5), 4)) < 1e-9


def test_segment_zone_lengths_strategies_agree(spark):
    from morituri_spark.geo.measures import segment_zone_lengths
    import random

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [
            (u, s, rng.uniform(-1.0, 3.0), rng.uniform(-1.0, 2.0))
            for u in range(20)
            for s in range(10)
        ],
        "k long, seq long, lon double, lat double",
    )
    zones = spark.createDataFrame(
        [
            (0, [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]),
            (1, [[[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 0.0]]]),
        ],
        "zone_id long, rings array<array<array<double>>>",
    )
    a = sorted(
        map(tuple, segment_zone_lengths(pts, zones, "k", ["seq"]).collect())
    )
    b = sorted(
        map(
            tuple,
            segment_zone_lengths(
                pts, zones, "k", ["seq"], strategy="shuffle", res=6
            ).collect(),
        )
    )
    assert a == b and len(a) == 2


def test_ring_areas_spherical_rectangle_closed_form(spark):
    """Exact spherical rectangle area: A = R^2 * dlam * |sin(p2)-sin(p1)|."""
    import math
    from morituri_spark.geo.measures import ring_areas_spherical

    R = 6371.0088
    cases = [(0, 10.0, 20.0, 0.0, 1.0), (1, -5.0, 5.0, 40.0, 55.0)]
    rows = []
    for k, l1, l2, p1, p2 in cases:
        for i, (x, y) in enumerate([(l1, p1), (l2, p1), (l2, p2), (l1, p2)]):
            rows.append((k, i, float(x), float(y)))
    df = spark.createDataFrame(rows, "key long, seq long, lon double, lat double")
    got = {r.key: r.area_km2 for r in ring_areas_spherical(df, "key", ["seq"]).collect()}
    for k, l1, l2, p1, p2 in cases:
        exp = R * R * math.radians(l2 - l1) * abs(
            math.sin(math.radians(p2)) - math.sin(math.radians(p1))
        )
        assert abs(got[k] - exp) < 0.02, (k, got[k], exp)
    # sanity vs planar: a 1-deg-tall band at 55N is much smaller than at 0N
    small = ring_areas_spherical(
        spark.createDataFrame(
            [(0, i, float(x), float(y)) for i, (x, y) in
             enumerate([(0.0, 55.0), (1.0, 55.0), (1.0, 56.0), (0.0, 56.0)])],
            "key long, seq long, lon double, lat double",
        ), "key", ["seq"]).collect()[0].area_km2
    eq = got[0] / 10.0  # case 0 is 10 deg wide at the equator
    assert small < 0.62 * eq


def test_ring_centroids_known_shapes(spark):
    from morituri_spark.geo.measures import ring_centroids

    rows = []
    # key 0: unit square (centroid 0.5, 0.5), CCW
    for i, (x, y) in enumerate([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]):
        rows.append((0, i, x, y))
    # key 1: same square CW (signed area negative; centroid identical)
    for i, (x, y) in enumerate([(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]):
        rows.append((1, i, x, y))
    # key 2: L-shape — centroid NOT the vertex mean
    for i, (x, y) in enumerate(
        [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0), (1.0, 2.0), (0.0, 2.0)]
    ):
        rows.append((2, i, x, y))
    # key 3: degenerate (all collinear) -> dropped
    for i, (x, y) in enumerate([(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]):
        rows.append((3, i, x, y))
    df = spark.createDataFrame(rows, "key long, seq long, lon double, lat double")
    got = {r.key: (r.c_x, r.c_y) for r in ring_centroids(df, "key", ["seq"]).collect()}
    assert got[0] == (0.5, 0.5)
    assert got[1] == (0.5, 0.5)
    # L-shape (area 3): big square (c=1, w=4) minus unit square
    # (c=1.5, w=1) -> (4*1 - 1*1.5)/3 = 5/6 -> rounded 0.833333
    assert got[2] == (0.833333, 0.833333)
    assert 3 not in got


def test_ring_self_intersections_bowtie(spark):
    from morituri_spark.geo.overlay import ring_self_intersections

    bowtie = [[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]]
    square = [[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 7.0], [5.0, 5.0]]
    df = spark.createDataFrame(
        [(1, bowtie), (2, square)],
        "ring_id long, ring array<array<double>>",
    )
    got = ring_self_intersections(df).collect()
    assert len(got) == 1
    r = got[0]
    # edges 0 ((0,0)-(2,2)) and 2 ((2,0)-(0,2)) cross at (1,1)
    assert (r["ring_id"], r["i"], r["j"], r["x"], r["y"]) == (1, 0, 2, 1.0, 1.0)


def test_ring_self_intersections_adjacent_excluded(spark):
    from morituri_spark.geo.overlay import ring_self_intersections

    # a concave-but-simple arrow: adjacent edges share endpoints but never
    # properly cross; the wrap pair (first, last) shares the start vertex
    arrow = [[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [2.0, 1.0], [0.0, 3.0],
             [0.0, 0.0]]
    df = spark.createDataFrame(
        [(9, arrow)], "ring_id long, ring array<array<double>>"
    )
    assert ring_self_intersections(df).count() == 0
