"""Interval overlap join, panoptic quality over RLE runs, confusion
matrix, mosaic box remapping — each vs an independent loop reference."""

import numpy as np
import pandas as pd

from morituri_spark.multimodal.detections import (
    detection_confusion,
    match_detections,
    mosaic_boxes,
)
from morituri_spark.multimodal.masks import panoptic_matches, panoptic_quality
from morituri_spark.operators.rangejoin import interval_overlap_join


def _runs(seed, n_img, n_seg, n_run, span=400, lmax=30):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_img):
        for s in range(n_seg):
            starts = np.sort(
                rng.choice(span, size=n_run, replace=False)
            )
            for k, st in enumerate(starts):
                # disjoint within a segment: cap length by the gap
                nxt = starts[k + 1] if k + 1 < len(starts) else span + lmax
                ln = int(min(1 + rng.integers(0, lmax), nxt - st))
                rows.append((f"img{i:03d}", s, int(st), ln))
    return rows


def test_interval_overlap_join_exact_once(spark):
    a_rows = _runs(1, 10, 2, 4)
    b_rows = _runs(2, 10, 2, 4)
    adf = spark.createDataFrame(
        pd.DataFrame(a_rows, columns=["image_id", "seg", "start", "length"])
    ).selectExpr("image_id", "seg AS a_seg", "start AS a_lo",
                 "start + length AS a_hi")
    bdf = spark.createDataFrame(
        pd.DataFrame(b_rows, columns=["image_id", "seg", "start", "length"])
    ).selectExpr("image_id", "seg AS b_seg", "start AS b_lo",
                 "start + length AS b_hi")
    for w in (8.0, 64.0, 1000.0):
        got = sorted(
            (r.image_id, r.a_seg, r.a_lo, r.b_seg, r.b_lo)
            for r in interval_overlap_join(
                adf, bdf, ["image_id"], bin_width=w
            ).collect()
        )
        want = sorted(
            (ai, asg, alo, bsg, blo)
            for ai, asg, alo, ah in (
                (r[0], r[1], r[2], r[2] + r[3]) for r in a_rows
            )
            for bi, bsg, blo, bh in (
                (r[0], r[1], r[2], r[2] + r[3]) for r in b_rows
            )
            if ai == bi and alo < bh and blo < ah
        )
        assert got == want, f"bin_width={w}"


def _ref_panoptic(pred, gt, thr):
    cells = {}
    for img in {r[0] for r in pred} | {r[0] for r in gt}:
        pr = [r for r in pred if r[0] == img]
        gr = [r for r in gt if r[0] == img]
        psegs = sorted({r[1] for r in pr})
        gsegs = sorted({r[1] for r in gr})
        matched = []
        for ps in psegs:
            pa = {x for r in pr if r[1] == ps for x in range(r[2], r[2] + r[3])}
            for gs in gsegs:
                ga = {x for r in gr if r[1] == gs for x in range(r[2], r[2] + r[3])}
                inter = len(pa & ga)
                union = len(pa) + len(ga) - inter
                if inter * 1000 > thr * union:
                    matched.append(
                        (img, ps, gs, inter, union, inter * 1_000_000 // union)
                    )
        cells[img] = (
            len(psegs), len(gsegs), len(matched),
            sum(m[5] for m in matched), sorted(matched),
        )
    return cells


def test_panoptic_matches_loop_reference(spark):
    pred = _runs(5, 12, 3, 3)
    gt = _runs(6, 12, 3, 3)
    pdf = spark.createDataFrame(
        pd.DataFrame(pred, columns=["image_id", "seg_id", "start", "length"])
    )
    gdf = spark.createDataFrame(
        pd.DataFrame(gt, columns=["image_id", "seg_id", "start", "length"])
    )
    ref = _ref_panoptic(pred, gt, 300)
    got = sorted(
        (r.image_id, r.pred_seg, r.gt_seg, r.inter, r.un, r.iou_micro)
        for r in panoptic_matches(pdf, gdf, iou_thr_milli=300, bin_width=16.0).collect()
    )
    want = sorted(m for img in ref for m in ref[img][4])
    assert got == want
    pq = {
        r.image_id: (r.n_pred, r.n_gt, r.n_matched, r.sum_iou_micro)
        for r in panoptic_quality(pdf, gdf, iou_thr_milli=300, bin_width=16.0).collect()
    }
    assert pq == {img: ref[img][:4] for img in ref}


def test_panoptic_uniqueness_at_half(spark):
    # identical masks at thr 0.5: every segment matches exactly its twin
    runs = _runs(3, 5, 3, 3)
    df = spark.createDataFrame(
        pd.DataFrame(runs, columns=["image_id", "seg_id", "start", "length"])
    )
    m = panoptic_matches(df, df, iou_thr_milli=500, bin_width=16.0).collect()
    assert all(r.pred_seg == r.gt_seg and r.iou_micro == 1_000_000 for r in m)
    assert len(m) == 15


def test_detection_confusion(spark):
    rng = np.random.default_rng(17)
    preds, gts, pcls, gcls = [], [], [], []
    for i in range(20):
        img = f"img{i:03d}"
        for j in range(4):
            x0, y0 = int(rng.integers(0, 30)), int(rng.integers(0, 30))
            preds.append((img, j, x0, y0, x0 + int(rng.integers(2, 12)),
                          y0 + int(rng.integers(2, 12)), int(rng.integers(0, 99))))
            pcls.append((img, j, int(rng.integers(0, 3))))
        for g in range(3):
            x0, y0 = int(rng.integers(0, 30)), int(rng.integers(0, 30))
            gts.append((img, g, x0, y0, x0 + int(rng.integers(2, 12)),
                        y0 + int(rng.integers(2, 12))))
            gcls.append((img, g, int(rng.integers(0, 3))))
    pdf = spark.createDataFrame(pd.DataFrame(
        preds, columns=["image_id", "box_id", "x0", "y0", "x1", "y1", "score"]))
    gdf = spark.createDataFrame(pd.DataFrame(
        gts, columns=["image_id", "gt_id", "x0", "y0", "x1", "y1"]))
    pcdf = spark.createDataFrame(pd.DataFrame(pcls, columns=["image_id", "box_id", "cls"]))
    gcdf = spark.createDataFrame(pd.DataFrame(gcls, columns=["image_id", "gt_id", "cls"]))
    m = match_detections(pdf, gdf, iou_thr_milli=200)
    got = {
        (r.pred_cls, r.gt_cls): r.n
        for r in detection_confusion(m, pcdf, gcdf).collect()
    }
    # invariants: totals balance
    assert sum(n for (p, g), n in got.items() if p is not None) == len(preds)
    assert sum(n for (p, g), n in got.items() if g is not None and p is None) == (
        len(gts) - sum(n for (p, g), n in got.items() if p is not None and g is not None)
    )
    # spot-check against the match rows directly
    mm = m.collect()
    pmap = {(r[0], r[1]): r[2] for r in pcls}
    gmap = {(r[0], r[1]): r[2] for r in gcls}
    want = {}
    matched_g = set()
    for r in mm:
        pc = pmap[(r.image_id, r.box_id)]
        gc = gmap[(r.image_id, r.matched_gt)] if r.matched_gt is not None else None
        if r.matched_gt is not None:
            matched_g.add((r.image_id, r.matched_gt))
        want[(pc, gc)] = want.get((pc, gc), 0) + 1
    for (img, g), c in ((k, gmap[k]) for k in gmap if k not in matched_g):
        want[(None, c)] = want.get((None, c), 0) + 1
    assert got == want


def test_mosaic_boxes(spark):
    rng = np.random.default_rng(23)
    rows = []
    for i in range(40):
        for j in range(3):
            x0, y0 = int(rng.integers(0, 50)), int(rng.integers(0, 50))
            rows.append((i, j, x0, y0, x0 + int(rng.integers(1, 20)),
                         y0 + int(rng.integers(1, 20)), int(rng.integers(0, 99))))
    crops = [(m, int(rng.integers(0, 64)), int(rng.integers(0, 64))) for m in range(10)]
    bdf = spark.createDataFrame(pd.DataFrame(
        rows, columns=["img_idx", "box_id", "x0", "y0", "x1", "y1", "score"]))
    cdf = spark.createDataFrame(pd.DataFrame(crops, columns=["mosaic_id", "cx", "cy"]))
    got = sorted(
        (r.mosaic_id, r.img_idx, r.box_id, r.x0, r.y0, r.x1, r.y1)
        for r in mosaic_boxes(bdf, cdf, size=64, min_area=4).collect()
    )
    want = []
    cmap = dict(((m, (cx, cy)) for m, cx, cy in crops))
    for i, j, x0, y0, x1, y1, sc in rows:
        m, q = i // 4, i % 4
        ox, oy = (64 if q in (1, 3) else 0), (64 if q in (2, 3) else 0)
        cx, cy = cmap[m]
        nx0, ny0 = max(x0 + ox - cx, 0), max(y0 + oy - cy, 0)
        nx1, ny1 = min(x1 + ox - cx, 64), min(y1 + oy - cy, 64)
        if nx1 > nx0 and ny1 > ny0 and (nx1 - nx0) * (ny1 - ny0) >= 4:
            want.append((m, i, j, nx0, ny0, nx1, ny1))
    assert got == sorted(want)
    assert len(got) > 0
