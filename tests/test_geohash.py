"""geohash_col / geohash_decode_bbox (geo/cells.py).

External-interop pins: the classic public geohash.org vectors
(ezs42 ≙ 42.6°N 5.6°W from the original spec; u4pruydqqvj ≙ Jutland
57.64911°N 10.40744°E) must come out of the Catalyst encoder verbatim,
proving the keys round-trip through any third-party geohash library.
"""
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo import cells as C


def _encode_one(spark, lon, lat, length):
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    return df.select(
        C.geohash_col(F.col("lon"), F.col("lat"), length).alias("g")
    ).first()["g"]


def test_geohash_public_vectors(spark):
    assert _encode_one(spark, -5.6, 42.6, 5) == "ezs42"
    assert _encode_one(spark, 10.40744, 57.64911, 11) == "u4pruydqqvj"


def test_geohash_decode_roundtrip(spark):
    df = spark.range(200).select(
        (F.col("id") * 1.7 % 360 - 180).alias("lon"),
        (F.col("id") * 0.83 % 180 - 90).alias("lat"),
    )
    rows = df.select(
        "lon", "lat",
        C.geohash_col(F.col("lon"), F.col("lat"), 7).alias("g"),
    ).collect()
    for r in rows:
        lon_lo, lon_hi, lat_lo, lat_hi = C.geohash_decode_bbox(r["g"])
        assert lon_lo <= r["lon"] < lon_hi or r["lon"] == 180.0
        assert lat_lo <= r["lat"] < lat_hi or r["lat"] == 90.0


def test_geohash_prefix_is_parent(spark):
    df = spark.range(300).select(
        (F.col("id") * 2.31 % 360 - 180).alias("lon"),
        (F.col("id") * 1.13 % 180 - 90).alias("lat"),
    )
    # prefix=parent holds only at bit counts where the shorter hash's
    # lon/lat splits are a prefix of the longer's — true for every
    # (r, r') pair because both interleave from the same first bit.
    bad = df.select(
        C.geohash_col(F.col("lon"), F.col("lat"), 9).alias("g9"),
        C.geohash_col(F.col("lon"), F.col("lat"), 4).alias("g4"),
    ).where(F.substring("g9", 1, 4) != F.col("g4"))
    assert bad.count() == 0


def test_geohash_codegen_and_guard(spark):
    df = spark.range(4).select(
        (F.col("id") * 10.0 - 20.0).alias("lon"), F.lit(1.5).alias("lat")
    )
    plan = df.select(
        C.geohash_col(F.col("lon"), F.col("lat"), 6).alias("g")
    )._jdf.queryExecution().executedPlan().toString()
    # `*(n)` marks a WholeStageCodegen stage in executedPlan.toString()
    assert plan.lstrip().startswith("*(")
    with pytest.raises(ValueError, match="geohash length"):
        C.geohash_col(F.col("lon"), F.col("lat"), 0)
    with pytest.raises(ValueError, match="geohash length"):
        C.geohash_col(F.col("lon"), F.col("lat"), 13)
