"""Detection post-processing: greedy NMS, pred↔GT matching, mask RLE —
each cross-checked against an independent pure-Python loop reference on
deterministic pseudo-random boxes/masks."""

import numpy as np
import pandas as pd
import pytest

from morituri_spark.multimodal.detections import match_detections, nms_boxes
from morituri_spark.multimodal.masks import mask_rle_runs, pack_mask


def _boxes(seed: int, n_img: int, per_img: int, span=40, wmax=12):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_img):
        for j in range(per_img):
            x0 = int(rng.integers(0, span))
            y0 = int(rng.integers(0, span))
            w = int(rng.integers(1, wmax))
            h = int(rng.integers(1, wmax))
            rows.append(
                (f"img{i:04d}", j, x0, y0, x0 + w, y0 + h, int(rng.integers(0, 100)))
            )
    return rows


def _iou_parts(a, b):
    iw = max(0, min(a[4], b[4]) - max(a[2], b[2]))
    ih = max(0, min(a[5], b[5]) - max(a[3], b[3]))
    inter = iw * ih
    area = lambda r: (r[4] - r[2]) * (r[5] - r[3])
    return inter, area(a) + area(b) - inter


def _ref_nms(rows, thr):
    by_img = {}
    for r in rows:
        by_img.setdefault(r[0], []).append(r)
    out = []
    for img, boxes in by_img.items():
        kept = []
        for b in sorted(boxes, key=lambda r: (-r[6], r[1])):
            if all(
                inter * 1000 <= thr * union
                for inter, union in (_iou_parts(k, b) for k in kept)
            ):
                kept.append(b)
                out.append((img, len(kept), b[1], b[6]))
    return sorted(out)


def _ref_match(preds, gts, thr):
    gt_by_img = {}
    for g in gts:
        gt_by_img.setdefault(g[0], []).append(g)
    out = []
    taken = set()
    for p in sorted(preds, key=lambda r: (r[0], -r[6], r[1])):
        best = None
        for g in gt_by_img.get(p[0], []):
            if (p[0], g[1]) in taken:
                continue
            inter, union = _iou_parts(g_row(g), p)
            if inter * 1000 > thr * union:
                iou_micro = inter * 1_000_000 // union
                key = (-iou_micro, g[1])
                if best is None or key < best[0]:
                    best = (key, g[1], iou_micro)
        if best is not None:
            taken.add((p[0], best[1]))
            out.append((p[0], p[1], p[6], best[1], best[2]))
        else:
            out.append((p[0], p[1], p[6], None, None))
    return sorted(out, key=repr)


def g_row(g):
    # gt rows are (image_id, gt_id, x0, y0, x1, y1) — pad a fake score so
    # _iou_parts' column layout matches pred rows
    return (g[0], g[1], g[2], g[3], g[4], g[5], 0)


PRED_COLS = ["image_id", "box_id", "x0", "y0", "x1", "y1", "score"]


def test_nms_matches_loop_reference(spark):
    rows = _boxes(7, 40, 8)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=PRED_COLS))
    got = sorted(
        (r.image_id, r.keep_rank, r.box_id, r.score)
        for r in nms_boxes(df, iou_thr_milli=300).collect()
    )
    assert got == _ref_nms(rows, 300)


def test_nms_thresholds(spark):
    rows = _boxes(11, 25, 6)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=PRED_COLS))
    n0 = nms_boxes(df, iou_thr_milli=0).count()       # any overlap suppresses
    n999 = nms_boxes(df, iou_thr_milli=999).count()   # near-identical only
    assert n0 == len(_ref_nms(rows, 0))
    assert n999 == len(_ref_nms(rows, 999))
    assert n0 <= n999 <= len(rows)


def test_nms_boundary_iou_survives(spark):
    # two 10x10 boxes overlapping exactly 50/150 = 1/3: thr=333 suppresses
    # (1000*50 > 333*150) but thr 334 keeps (1000*50 <= 334*150 ⇒ survive)
    rows = [("i", 0, 0, 0, 10, 10, 9), ("i", 1, 5, 0, 15, 10, 5)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=PRED_COLS))
    assert nms_boxes(df, iou_thr_milli=333).count() == 1
    assert nms_boxes(df, iou_thr_milli=334).count() == 2


def test_match_detections_loop_reference(spark):
    preds = _boxes(3, 30, 5)
    gts = [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in _boxes(4, 30, 4)]
    pdf = spark.createDataFrame(pd.DataFrame(preds, columns=PRED_COLS))
    gdf = spark.createDataFrame(
        pd.DataFrame(gts, columns=["image_id", "gt_id", "x0", "y0", "x1", "y1"])
    )
    got = sorted(
        (
            (r.image_id, r.box_id, r.score, r.matched_gt, r.iou_micro)
            for r in match_detections(pdf, gdf, iou_thr_milli=200).collect()
        ),
        key=repr,
    )
    assert got == _ref_match(preds, gts, 200)


def test_match_gt_matched_at_most_once(spark):
    # three identical predictions over one GT: only the best-ordered pred
    # matches, the rest are FPs
    preds = [("i", j, 0, 0, 10, 10, 50 - j) for j in range(3)]
    gts = [("i", 0, 1, 1, 11, 11)]
    pdf = spark.createDataFrame(pd.DataFrame(preds, columns=PRED_COLS))
    gdf = spark.createDataFrame(
        pd.DataFrame(gts, columns=["image_id", "gt_id", "x0", "y0", "x1", "y1"])
    )
    rows = {r.box_id: r for r in match_detections(pdf, gdf, 300).collect()}
    assert rows[0].matched_gt == 0 and rows[1].matched_gt is None
    assert rows[2].matched_gt is None


def test_mask_rle_roundtrip(spark):
    rng = np.random.default_rng(5)
    rows, want = [], []
    for i in range(30):
        w, h = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        mask = rng.integers(0, 2, size=(h, w)).astype(np.uint8)
        rows.append((f"m{i:03d}", pack_mask(mask), w, h))
        flat = mask.T.ravel()
        k, pos = 0, 0
        while pos < len(flat):
            if flat[pos]:
                s = pos
                while pos < len(flat) and flat[pos]:
                    pos += 1
                k += 1
                want.append((f"m{i:03d}", k, s, pos - s))
            else:
                pos += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "mask", "w", "h"])
    )
    got = sorted(
        (r.image_id, r.run_idx, r.start, r.length)
        for r in mask_rle_runs(df).collect()
    )
    assert got == sorted(want)


def test_mask_rle_all_zero_and_all_one(spark):
    rows = [
        ("z", pack_mask(np.zeros((4, 4), dtype=np.uint8)), 4, 4),
        ("o", pack_mask(np.ones((3, 5), dtype=np.uint8)), 5, 3),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "mask", "w", "h"])
    )
    got = {(r.image_id, r.run_idx, r.start, r.length) for r in mask_rle_runs(df).collect()}
    assert got == {("o", 1, 0, 15)}


def test_homography_boxes_loop_reference(spark):
    import math

    from morituri_spark.multimodal.detections import homography_boxes

    rng = np.random.default_rng(41)
    rows = []
    for i in range(80):
        x0, y0 = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        rows.append((
            f"b{i:03d}", x0, y0,
            x0 + 4 + int(rng.integers(0, 12)),
            y0 + 4 + int(rng.integers(0, 10)),
            90 + i % 20, (i % 7) - 3, (i * 11) % 50,
            (i % 5) - 2, 90 + (3 * i) % 20, (i * 13) % 50,
            (i % 3) - 1, (i % 5) - 2, 30 + (i * 7) % 600,
        ))
    cols = ["box_id", "x0", "y0", "x1", "y1",
            "h00", "h01", "h02", "h10", "h11", "h12", "h20", "h21", "h22"]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    got = {r.box_id: (r.valid, r.x0, r.y0, r.x1, r.y1)
           for r in homography_boxes(df, size=96).collect()}
    assert len(got) == 80
    n_invalid = 0
    for row in rows:
        bid, x0, y0, x1, y1 = row[:5]
        h = row[5:]
        corners = [(x0, y0), (x1, y0), (x0, y1), (x1, y1)]
        dens = [h[6] * cx + h[7] * cy + h[8] for cx, cy in corners]
        if min(dens) <= 0:
            n_invalid += 1
            assert got[bid] == (False, None, None, None, None), bid
            continue
        xs = [math.floor((h[0] * cx + h[1] * cy + h[2]) * 1000000.0 / d)
              for (cx, cy), d in zip(corners, dens)]
        ys = [math.floor((h[3] * cx + h[4] * cy + h[5]) * 1000000.0 / d)
              for (cx, cy), d in zip(corners, dens)]
        clip = lambda v: max(0, min(96 * 1000000, v))
        assert got[bid] == (
            True, clip(min(xs)), clip(min(ys)),
            clip(max(xs)), clip(max(ys)),
        ), bid
    # the fixture must actually exercise the behind-camera path
    assert n_invalid > 0


def test_homography_identity_is_micro_scale(spark):
    from morituri_spark.multimodal.detections import homography_boxes

    rows = [("a", 3, 5, 10, 12, 1, 0, 0, 0, 1, 0, 0, 0, 1)]
    cols = ["box_id", "x0", "y0", "x1", "y1",
            "h00", "h01", "h02", "h10", "h11", "h12", "h20", "h21", "h22"]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    r = homography_boxes(df, size=640).collect()[0]
    assert (r.valid, r.x0, r.y0, r.x1, r.y1) == (
        True, 3_000_000, 5_000_000, 10_000_000, 12_000_000
    )


def test_nms_groups_span_arrow_batches(spark):
    # force 13-row Arrow batches so images straddle batch boundaries and
    # the kernel's carry path runs (r6 streamed rewrite, rule 26)
    rows = _boxes(3, 60, 7)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=PRED_COLS))
    s2 = df.sparkSession
    old = s2.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    s2.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        got = sorted(
            (r.image_id, r.keep_rank, r.box_id, r.score)
            for r in nms_boxes(df, iou_thr_milli=300).collect()
        )
    finally:
        s2.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == _ref_nms(rows, 300)


def test_nms_big_group_fallback_path(spark):
    # one image past the 256-box cap routes through _nms_one while its
    # small siblings stay on the vectorized grid — same answers
    rows = [
        ("big" + r[0],) + r[1:] for r in _boxes(5, 4, 300, span=60)
    ] + _boxes(6, 30, 5)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=PRED_COLS))
    got = sorted(
        (r.image_id, r.keep_rank, r.box_id, r.score)
        for r in nms_boxes(df, iou_thr_milli=300).collect()
    )
    assert got == _ref_nms(rows, 300)


def test_match_groups_span_arrow_batches(spark):
    preds = _boxes(21, 50, 6)
    gts = [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in _boxes(22, 40, 5)]
    pdf = spark.createDataFrame(pd.DataFrame(preds, columns=PRED_COLS))
    gdf = spark.createDataFrame(
        pd.DataFrame(gts, columns=["image_id", "gt_id", "x0", "y0", "x1", "y1"])
    )
    s2 = pdf.sparkSession
    old = s2.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    s2.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "13")
    try:
        got = sorted(
            (
                (r.image_id, r.box_id, r.score, r.matched_gt, r.iou_micro)
                for r in match_detections(pdf, gdf, iou_thr_milli=200).collect()
            ),
            key=repr,
        )
    finally:
        s2.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == _ref_match(preds, gts, 200)


def test_match_big_group_fallback_path(spark):
    preds = [
        ("big" + r[0],) + r[1:] for r in _boxes(23, 3, 300, span=60)
    ] + _boxes(24, 25, 6)
    gts = [
        ("big" + r[0], r[1], r[2], r[3], r[4], r[5])
        for r in _boxes(25, 3, 280, span=60)
    ] + [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in _boxes(26, 25, 4)]
    pdf = spark.createDataFrame(pd.DataFrame(preds, columns=PRED_COLS))
    gdf = spark.createDataFrame(
        pd.DataFrame(gts, columns=["image_id", "gt_id", "x0", "y0", "x1", "y1"])
    )
    got = sorted(
        (
            (r.image_id, r.box_id, r.score, r.matched_gt, r.iou_micro)
            for r in match_detections(pdf, gdf, iou_thr_milli=200).collect()
        ),
        key=repr,
    )
    assert got == _ref_match(preds, gts, 200)
