"""Anchor assignment, average precision, and BLEU clip counts — each
cross-checked against an independent pure-Python reference."""

from collections import Counter

import numpy as np
import pandas as pd

from morituri_spark.multimodal.detections import (
    assign_anchors,
    average_precision,
)
from morituri_spark.text.metrics import bleu_clip_counts

GT_COLS = ["image_id", "gt_id", "x0", "y0", "x1", "y1"]


def _gts(seed, n_img, per_img, span=40, wmax=14):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_img):
        for g in range(per_img):
            x0 = int(rng.integers(0, span))
            y0 = int(rng.integers(0, span))
            rows.append(
                (
                    f"img{i:04d}", g, x0, y0,
                    x0 + int(rng.integers(1, wmax)),
                    y0 + int(rng.integers(1, wmax)),
                )
            )
    return rows


def _ref_anchors(gts, grid_w, grid_h, cell, sizes, thr):
    by_img = {}
    for r in gts:
        by_img.setdefault(r[0], []).append(r)
    out = []
    for img, boxes in by_img.items():
        for gy in range(grid_h):
            for gx in range(grid_w):
                for s, (sw, sh) in enumerate(sizes):
                    ax0 = gx * cell + (cell - sw) // 2
                    ay0 = gy * cell + (cell - sh) // 2
                    ax1, ay1 = ax0 + sw, ay0 + sh
                    best = None
                    for _, gid, x0, y0, x1, y1 in boxes:
                        iw = max(0, min(ax1, x1) - max(ax0, x0))
                        ih = max(0, min(ay1, y1) - max(ay0, y0))
                        inter = iw * ih
                        union = (
                            (ax1 - ax0) * (ay1 - ay0)
                            + (x1 - x0) * (y1 - y0)
                            - inter
                        )
                        if inter * 1000 > thr * union:
                            iou = inter * 1_000_000 // union
                            key = (-iou, gid)
                            if best is None or key < best[0]:
                                best = (key, gid, iou)
                    if best is not None:
                        out.append(
                            (
                                img,
                                (gy * grid_w + gx) * len(sizes) + s,
                                gx, gy, s, best[1], best[2],
                            )
                        )
    return sorted(out)


def test_assign_anchors_loop_reference(spark):
    gts = _gts(13, 25, 5)
    sizes = ((8, 8), (12, 16), (16, 10))
    gdf = spark.createDataFrame(pd.DataFrame(gts, columns=GT_COLS))
    got = sorted(
        (r.image_id, r.anchor_id, r.gx, r.gy, r.size_idx, r.matched_gt, r.iou_micro)
        for r in assign_anchors(
            gdf, grid_w=4, grid_h=4, cell=12, sizes=sizes, pos_thr_milli=250
        ).collect()
    )
    assert got == _ref_anchors(gts, 4, 4, 12, sizes, 250)
    assert len(got) > 0


def test_assign_anchors_is_catalyst_only(spark):
    gts = _gts(1, 3, 2)
    gdf = spark.createDataFrame(pd.DataFrame(gts, columns=GT_COLS))
    plan = assign_anchors(gdf)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


def _ref_ap(rows, n_gt_by_cls):
    # rows: (cls, score, is_tp, image_id, box_id)
    out = {}
    by_cls = {}
    for r in rows:
        by_cls.setdefault(r[0], []).append(r)
    for cls, rs in by_cls.items():
        rs = sorted(rs, key=lambda r: (-r[1], r[3], r[4]))
        tp_cum, precs = 0, []
        for k, r in enumerate(rs, start=1):
            tp_cum += int(r[2])
            precs.append(tp_cum * 1_000_000 // k)
        interp = list(precs)
        for k in range(len(interp) - 2, -1, -1):
            interp[k] = max(interp[k], interp[k + 1])
        ap_num = sum(ip for ip, r in zip(interp, rs) if r[2])
        out[cls] = (
            n_gt_by_cls[cls],
            len(rs),
            sum(int(r[2]) for r in rs),
            ap_num,
        )
    return out


def test_average_precision_loop_reference(spark):
    rng = np.random.default_rng(9)
    rows = [
        (
            int(rng.integers(0, 3)),
            int(rng.integers(0, 50)),
            bool(rng.integers(0, 2)),
            f"img{int(rng.integers(0, 20)):04d}",
            int(rng.integers(0, 8)),
        )
        for _ in range(300)
    ]
    n_gt = {0: 40, 1: 55, 2: 31}
    mdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cls", "score", "is_tp", "image_id", "box_id"])
    )
    gdf = spark.createDataFrame(
        pd.DataFrame(sorted(n_gt.items()), columns=["cls", "n_gt"])
    )
    got = {
        r.cls: (r.n_gt, r.n_pred, r.n_tp, r.ap_num_micro)
        for r in average_precision(mdf, gdf).collect()
    }
    assert got == _ref_ap(rows, n_gt)


def test_average_precision_perfect_detector(spark):
    # all TPs, scores strictly ordered → precision 1.0 at every rank
    rows = [(0, 100 - k, True, f"i{k}", 0) for k in range(10)]
    mdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cls", "score", "is_tp", "image_id", "box_id"])
    )
    gdf = spark.createDataFrame(pd.DataFrame([(0, 10)], columns=["cls", "n_gt"]))
    r = average_precision(mdf, gdf).collect()[0]
    assert (r.n_tp, r.ap_num_micro) == (10, 10 * 1_000_000)


def _ref_bleu(pairs, n_max):
    out = []
    for pid, cand, ref in pairs:
        ct = [t for t in cand.split(" ") if t]
        rt = [t for t in ref.split(" ") if t]
        for n in range(1, n_max + 1):
            if len(ct) < n:
                continue
            cg = Counter(
                " ".join(ct[k : k + n]) for k in range(len(ct) - n + 1)
            )
            rg = Counter(
                " ".join(rt[k : k + n]) for k in range(len(rt) - n + 1)
            )
            clipped = sum(min(c, rg[g]) for g, c in cg.items())
            out.append((pid, n, clipped, sum(cg.values())))
    return sorted(out)


def test_bleu_clip_counts_loop_reference(spark):
    rng = np.random.default_rng(21)
    vocab = [f"w{v}" for v in range(12)]
    pairs = []
    for p in range(40):
        cand = " ".join(vocab[int(v)] for v in rng.integers(0, 12, rng.integers(0, 25)))
        ref = " ".join(vocab[int(v)] for v in rng.integers(0, 12, rng.integers(1, 25)))
        pairs.append((p, cand + " ", ref))  # trailing space → empty-token filter
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["pair_id", "cand", "ref"]))
    got = sorted(
        (r.pair_id, r.n, r.clipped, r.total)
        for r in bleu_clip_counts(df, n_max=4).collect()
    )
    assert got == _ref_bleu(pairs, 4)


def test_bleu_identical_and_disjoint(spark):
    pairs = [(0, "a b c d", "a b c d"), (1, "a b c", "x y z")]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["pair_id", "cand", "ref"]))
    got = {(r.pair_id, r.n): (r.clipped, r.total) for r in bleu_clip_counts(df).collect()}
    assert got[(0, 4)] == (1, 1) and got[(0, 1)] == (4, 4)
    assert got[(1, 1)] == (0, 3) and got[(1, 3)] == (0, 1)
