"""Multimodal plumbing: real PNG/FJPG decode path, stub fallback, resize,
frame sampling fan-out."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from morituri_spark.multimodal import ops as M
from morituri_spark.sources import images as I
from morituri_spark.sources import synth


@pytest.fixture(scope="module")
def images(spark):
    return synth.images_table(spark, 20, partitions=2, px=8).cache()


def test_image_features_real_codecs(spark, images):
    feats = {r["image_id"]: r for r in M.image_features(images).collect()}
    assert len(feats) == 20
    r = images.where("fmt = 'png'").first()
    arr = I.png_decode(bytes(r["bytes"]))
    f = feats[r["image_id"]]
    assert abs(f["mean_r"] - arr[:, :, 0].mean()) < 1e-9
    assert f["phash"] == r["phash"]  # png is lossless → same phash


def test_unknown_codec_raises_without_fake(spark):
    # webp is the remaining honest stub (jpeg became a real codec in r4)
    pdf = pd.DataFrame(
        {"image_id": ["x"], "bytes": [b"RIFFjunk"], "fmt": ["webp"], "w": [4], "h": [4]}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="libwebp|NotImplemented"):
        M.image_features(df).collect()
    # with the deterministic fake, plumbing works and is stable
    f1 = M.image_features(df, deterministic_fake=True).collect()[0]
    f2 = M.image_features(df, deterministic_fake=True).collect()[0]
    assert f1["phash"] == f2["phash"]


def test_resize(spark, images):
    out = M.resize_images(images, 4, 4).collect()
    assert len(out) == 20
    for r in out:
        assert r["w"] == 4 and r["h"] == 4 and r["fmt"] == "png"
        arr = I.png_decode(bytes(r["bytes"]))
        assert arr.shape == (4, 4, 3)


def test_frame_sampling_fanout(spark):
    pdf = pd.DataFrame(
        {
            "video_id": ["v1", "v2"],
            "bytes": [b"fakevideo1", b"fakevideo2"],
            "duration_ms": [3500, 900],
            "w": [4, 4],
            "h": [4, 4],
        }
    )
    frames = M.sample_frames(spark.createDataFrame(pdf), every_ms=1000).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r)
    assert len(by_vid["v1"]) == 3  # 3500ms → frames at 0,1000,2000
    assert len(by_vid["v2"]) == 1  # short clip → at least one frame
    ts = sorted(r["ts_ms"] for r in by_vid["v1"])
    assert ts == [0, 1000, 2000]
    arr = I.png_decode(bytes(by_vid["v1"][0]["frame_bytes"]))
    assert arr.shape == (4, 4, 3)


def test_zonal_image_stats(spark):
    from morituri_spark.pipelines.zonal_stats import zonal_image_stats

    images = synth.images_table(spark, 400, partitions=4, px=8)
    zones = synth.zones_table(spark)
    out = zonal_image_stats(images, zones, res=9).collect()
    assert len(out) > 0
    total = sum(r["n_images"] for r in out)
    # total assignments equals the count-only flagship path on the same data
    from morituri_spark.geo import pip as P

    want = P.assign_zones(
        images.select("image_id", "lon", "lat"), zones.select("zone_id", "rings"), res=9
    ).count()
    assert total == want
    for r in out:
        assert 0 <= r["avg_r"] <= 255 and 0 <= r["avg_texture"] <= 128
        assert 0 <= r["avg_phash_bits"] <= 64


def test_mosaic_best_per_tile_deterministic(spark):
    """best_per_tile: argmax by (quality, image_id) over real PNG decode."""
    import numpy as np
    from morituri_spark.pipelines.mosaic import best_per_tile
    from morituri_spark.sources import images as I

    rows = []
    # two tiles; in tile A plant a quality tie broken by id
    for i, (lon, lat, val) in enumerate(
        [(1.0, 41.0, 50), (1.2, 41.2, 200), (1.1, 41.1, 200),
         (7.0, 47.0, 10), (7.2, 47.2, 90)]
    ):
        arr = np.full((4, 4, 3), val, dtype=np.uint8)
        rows.append((f"im{i}", I.encode(arr, "png"), "png", 4, 4, float(lon), float(lat)))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int, lon double, lat double"
    )
    got = {r.tile: (r.image_id, r.quality) for r in best_per_tile(df, res=5).collect()}
    assert len(got) == 2
    winners = dict(got.values())
    assert winners == {"im2": 200.0, "im4": 90.0}
