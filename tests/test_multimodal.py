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


def _quality_ref(arr, blur_thr_milli=1500, max_clip_pct=20):
    import math

    h, w = arr.shape[0], arr.shape[1]
    g3 = arr.astype(np.int64).sum(axis=2)
    sum3 = int(np.abs(np.diff(g3, axis=1)).sum()) if w > 1 else 0
    n_lo = int((g3 <= 6).sum())
    n_hi = int((g3 >= 759).sum())
    n_dx, px = h * (w - 1), w * h
    sharp = (sum3 / 3.0) / n_dx if n_dx else 0.0
    return (
        sum3 // 3, n_lo, n_hi,
        math.floor(sharp * 1e6 + 0.5 + 1e-8) / 1e6,
        math.floor((n_lo + n_hi) / px * 1e6 + 0.5 + 1e-8) / 1e6,
        int(1000 * sum3 < 3 * blur_thr_milli * n_dx),
        int(100 * (n_lo + n_hi) > max_clip_pct * px),
    )


def test_image_quality_gates(spark):
    # three hand-built 8x6 images: a flat gray (blurry), a steep ramp
    # (sharp), and a saturated one (clipped)
    flat = np.full((6, 8, 3), 100, dtype=np.uint8)
    ramp = np.zeros((6, 8, 3), dtype=np.uint8)
    for x in range(8):
        ramp[:, x, :] = 30 * x  # 0..210 step 30
    sat = np.full((6, 8, 3), 255, dtype=np.uint8)
    sat[:, :2, :] = 0  # 2 of 8 columns black, rest blown out
    rows = [
        ("flat", I.encode(flat, "png"), "png", 8, 6),
        ("ramp", I.encode(ramp, "png"), "png", 8, 6),
        ("sat", I.encode(sat, "png"), "png", 8, 6),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, w int, h int")
    got = {
        r["image_id"]: (
            r["sum_absdx"], r["n_clip_lo"], r["n_clip_hi"], r["sharpness"],
            r["clip_frac"], r["is_blurry"], r["is_clipped"],
        )
        for r in M.image_quality(df).collect()
    }
    assert got["flat"] == _quality_ref(flat)
    assert got["ramp"] == _quality_ref(ramp)
    assert got["sat"] == _quality_ref(sat)
    assert got["flat"][5] == 1 and got["ramp"][5] == 0   # blur gate
    assert got["sat"][6] == 1 and got["flat"][6] == 0    # clip gate
    assert got["ramp"][3] == 30.0                        # exact ramp slope


def test_image_quality_nonintegral_gray_exact(spark):
    # r≠g≠b: gray is thirds — the 3x fixed-point path must still match
    # the reference exactly (no float drift in the integer sums)
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("x", I.encode(arr, "png"), "png", 7, 5)],
        "image_id string, bytes binary, fmt string, w int, h int",
    )
    r = M.image_quality(df).collect()[0]
    ref = _quality_ref(arr)
    assert (r["sum_absdx"], r["n_clip_lo"], r["n_clip_hi"], r["sharpness"],
            r["clip_frac"], r["is_blurry"], r["is_clipped"]) == ref


def test_image_quality_guards(spark):
    df = spark.createDataFrame(
        [("x", b"", "png", 1, 1)], "image_id string, bytes binary, fmt string, w int, h int"
    )
    with pytest.raises(ValueError):
        M.image_quality(df, blur_thr_milli=0)
    with pytest.raises(ValueError):
        M.image_quality(df, max_clip_pct=101)
