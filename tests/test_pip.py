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
        images.select("image_id", "lon", "lat"), zones, res=9, salt_target_rows=200
    )
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
