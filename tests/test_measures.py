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
