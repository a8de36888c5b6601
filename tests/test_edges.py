"""edge_points (multimodal/edges.py) vs NumPy Sobel reference, plus the
keyed-Hough composition."""

import numpy as np

from morituri_spark.geo.hough import hough_votes
from morituri_spark.multimodal.edges import edge_points
from morituri_spark.sources import images as I


def _images_df(spark, arrays):
    rows = [
        (f"img{i}", bytearray(I.encode(a, "png")), "png", a.shape[1], a.shape[0])
        for i, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )


def _ref_edges(arr, thr):
    g = arr.astype(np.int64).sum(axis=2)
    out = {}
    for y in range(1, g.shape[0] - 1):
        for x in range(1, g.shape[1] - 1):
            gx = (
                g[y - 1, x + 1] + 2 * g[y, x + 1] + g[y + 1, x + 1]
                - g[y - 1, x - 1] - 2 * g[y, x - 1] - g[y + 1, x - 1]
            )
            gy = (
                g[y + 1, x - 1] + 2 * g[y + 1, x] + g[y + 1, x + 1]
                - g[y - 1, x - 1] - 2 * g[y - 1, x] - g[y - 1, x + 1]
            )
            mag = abs(int(gx)) + abs(int(gy))
            if mag >= thr:
                out[(x, y)] = mag
    return out


def test_matches_scalar_reference(spark):
    rng_free = []
    for i in range(3):
        ys, xs = np.mgrid[0:12, 0:10]
        a = np.empty((12, 10, 3), dtype=np.uint8)
        a[:, :, 0] = (i + 7 * ys + 11 * xs) % 256
        a[:, :, 1] = (3 * i + 2 * ys + 5 * xs) % 256
        a[:, :, 2] = (i * i + ys + 13 * xs) % 256
        rng_free.append(a)
    got = edge_points(_images_df(spark, rng_free), threshold=300).collect()
    by_img = {}
    for r in got:
        by_img.setdefault(r["image_id"], {})[(r["x"], r["y"])] = r["mag"]
    for i, a in enumerate(rng_free):
        assert by_img.get(f"img{i}", {}) == _ref_edges(a, 300)


def test_vertical_step_edge_is_a_line(spark):
    # hard vertical step at x=8: edge pixels form the column pair 7/8
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    a[:, 8:, :] = 200
    pts = edge_points(_images_df(spark, [a]), threshold=600).collect()
    assert pts, "step edge not detected"
    assert {r["x"] for r in pts} <= {7, 8}
    assert {r["y"] for r in pts} == set(range(1, 15))


def test_flat_image_has_no_edges(spark):
    a = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert edge_points(_images_df(spark, [a]), threshold=1).count() == 0


def test_hough_on_step_edge_votes_vertical(spark):
    # the x=7/8 vertical lines -> theta_k=0 (cos=1): rho = x
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    a[:, 8:, :] = 200
    ep = edge_points(_images_df(spark, [a]), threshold=600)
    from pyspark.sql import functions as F

    hv = hough_votes(
        ep.select(
            "image_id",
            F.col("x").cast("double").alias("x"),
            F.col("y").cast("double").alias("y"),
        ),
        n_theta=8,
        rho_step=1.0,
        keys=["image_id"],
    )
    top = hv.orderBy(F.desc("votes")).first()
    assert top["theta_k"] == 0
    assert top["rho_bin"] in (7, 8)
    assert top["votes"] == 14  # full interior column


def test_small_image_skipped(spark):
    a = np.zeros((2, 2, 3), dtype=np.uint8)
    assert edge_points(_images_df(spark, [a]), threshold=0).count() == 0
