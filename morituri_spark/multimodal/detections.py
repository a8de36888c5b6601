"""Detection post-processing: greedy NMS and prediction↔ground-truth
matching with ALL-INTEGER IoU arithmetic.

Boxes are half-open integer pixel rectangles [x0, x1) × [y0, y1) — the
natural output of a detector head quantized to the pixel grid. Every
comparison the greedy algorithms make is exact integer arithmetic:

- the suppression / match gate ``IoU > thr`` is evaluated as
  ``inter * 1000 > iou_thr_milli * union`` (cross-multiplied rational
  compare, no division);
- the match *ranking* uses ``iou_micro = inter * 10^6 DIV union``
  (floor integer division) — IoU quantized to micro-units gives a total
  deterministic order both engines replay bit-for-bit (rule 28 spells
  the shared DIV as ``CAST(floor(a / b) AS BIGINT)``), with ties broken
  by the smallest gt_id.

So the SQL oracles replay the greedy loops literally (unrolled
materialized stages) with zero rounding surface — the same evidence
class as the DP oracles (dtw/viterbi) and the integer image kernels.

Scale shape: boxes pack per image through ONE hash exchange
(groupBy + collect_list — detector output is ≤ tens of boxes per
image, so the packed row is tiny), then the greedy loop runs inside a
scan-shaped kernel batching many images per Arrow batch. 10¹² images
partition freely; there is no cross-image state anywhere.

Reference parity: the reference converter has no detector stage — this
family extends the engine for training-data pipelines (the brief's
image+caption table), composing with multimodal/corners.py keypoints
and ml/hamming.py capture-dedup.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "nms_boxes",
    "match_detections",
    "assign_anchors",
    "average_precision",
    "detection_confusion",
    "mosaic_boxes",
    "exif_orient_boxes",
    "iou_tracklets",
    "letterbox_boxes",
    "homography_boxes",
]

_BOX_COLS = ("box_id", "x0", "y0", "x1", "y1", "score")


def _pack(df: DataFrame, id_col: str, cols: tuple, name: str) -> DataFrame:
    """One row per image: boxes packed into an array through one hash
    exchange. collect_list order is nondeterministic — the kernels
    re-sort, so the pack is order-insensitive."""
    return df.groupBy(id_col).agg(
        F.collect_list(F.struct(*[F.col(c).cast("long").alias(c) for c in cols])).alias(name)
    )


def _boxes_np(boxes: list) -> np.ndarray:
    """list-of-struct-dicts → (n, len(cols)) int64 array."""
    return np.array(
        [[b[c] for c in _BOX_COLS] for b in boxes], dtype=np.int64
    )


def _inter_union(kept: np.ndarray, box: np.ndarray):
    """Vectorized integer intersection/union of `box` (one row) against
    every row of `kept`; both are (*, 6) arrays laid out as _BOX_COLS."""
    iw = np.minimum(kept[:, 3], box[3]) - np.maximum(kept[:, 1], box[1])
    ih = np.minimum(kept[:, 4], box[4]) - np.maximum(kept[:, 2], box[2])
    inter = np.maximum(iw, 0) * np.maximum(ih, 0)
    area_k = (kept[:, 3] - kept[:, 1]) * (kept[:, 4] - kept[:, 2])
    area_b = (box[3] - box[1]) * (box[4] - box[2])
    return inter, area_k + area_b - inter


def _group_stream(id_col: str, flush):
    """mapInPandas wrapper streaming WHOLE groups of a pre-sorted
    partition into ``flush``: a group's rows may span Arrow batches
    (rule 26), so the trailing group is held back until its id changes
    or the stream ends."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: list[pd.DataFrame] = []
        last_id = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col]
            if carry and ids.iloc[0] != last_id:
                yield flush(carry)
                carry = []
            cut = np.flatnonzero((ids != ids.iloc[-1]).to_numpy())
            split = int(cut[-1]) + 1 if len(cut) else 0
            head, tail = pdf.iloc[:split], pdf.iloc[split:]
            if len(head):
                yield flush(carry + [head])
                carry = []
            carry.append(tail)
            last_id = ids.iloc[-1]
        if carry and sum(len(c) for c in carry):
            yield flush(carry)

    return run


def _nms_one(pdf: pd.DataFrame, id_col: str, thr: int) -> pd.DataFrame:
    """Greedy NMS for ONE pre-sorted image slice (the past-the-cap path
    of nms_boxes): per-box loop, O(kept) vectorized IoU per step."""
    x0 = pdf["x0"].to_numpy(np.int64)
    y0 = pdf["y0"].to_numpy(np.int64)
    x1 = pdf["x1"].to_numpy(np.int64)
    y1 = pdf["y1"].to_numpy(np.int64)
    area = (x1 - x0) * (y1 - y0)
    kept: list[int] = []
    for i in range(len(pdf)):
        if kept:
            k = np.asarray(kept)
            iw = np.minimum(x1[k], x1[i]) - np.maximum(x0[k], x0[i])
            ih = np.minimum(y1[k], y1[i]) - np.maximum(y0[k], y0[i])
            inter = np.maximum(iw, 0) * np.maximum(ih, 0)
            union = area[k] + area[i] - inter
            if np.any(inter * 1000 > thr * union):
                continue
        kept.append(i)
    ks = np.asarray(kept, dtype=np.int64)
    return pd.DataFrame(
        {
            id_col: pd.array(
                pdf[id_col].to_numpy(dtype=object)[ks], dtype="string"
            ),
            "keep_rank": np.arange(1, len(ks) + 1, dtype=np.int64),
            "box_id": pdf["box_id"].to_numpy(np.int64)[ks],
            "score": pdf["score"].to_numpy(np.int64)[ks],
        }
    )


def nms_boxes(
    dets: DataFrame,
    iou_thr_milli: int = 500,
    id_col: str = "image_id",
) -> DataFrame:
    """Greedy non-maximum suppression per image.

    Boxes are visited in (score DESC, box_id ASC) order; a box is KEPT
    iff for every already-kept box ``inter * 1000 <= iou_thr_milli *
    union`` (i.e. suppression requires IoU strictly above the
    threshold). → (image_id, keep_rank, box_id, score) — suppressed
    boxes are dropped, keep_rank is 1-based in visit order.

    Input: (image_id, box_id, x0, y0, x1, y1, score) integer columns;
    degenerate boxes (x1 <= x0 or y1 <= y0) are filtered out up front.
    """
    thr = int(iou_thr_milli)
    src = dets.where((F.col("x1") > F.col("x0")) & (F.col("y1") > F.col("y0")))
    # r6: stream flat pre-sorted rows instead of a collect_list pack —
    # the packed struct column reached the kernel as list-of-dicts
    # (per-box Python conversion), and the greedy ran a per-BOX Python
    # loop per image. One hash exchange + in-partition sort (the same
    # physical shape as the pack's exchange) feeds plain numpy columns;
    # the greedy then iterates over RANK POSITION, vectorized across
    # every image of the batch (visit order is the sort order:
    # score DESC, box_id ASC — the old lexsort exactly).
    ordered = src.select(
        id_col, "box_id", "x0", "y0", "x1", "y1", "score"
    ).repartition(id_col).sortWithinPartitions(
        id_col, F.col("score").desc(), F.col("box_id").asc()
    )

    def _flush(parts: list[pd.DataFrame]) -> pd.DataFrame:
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
        ids = pdf[id_col].to_numpy(dtype=object)
        n = len(ids)
        cols = {
            c: pdf[c].to_numpy(dtype=np.int64)
            for c in ("box_id", "x0", "y0", "x1", "y1", "score")
        }
        # group boundaries over the (already grouped) sorted stream
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = ids[1:] != ids[:-1]
        gidx = np.cumsum(new_grp) - 1          # per-row group ordinal
        starts = np.flatnonzero(new_grp)
        lens = np.diff(np.append(starts, n))
        # pathological-image gate (rule 20): a dense image would pad the
        # whole batch grid to ITS width — route groups past the cap
        # through the per-image loop instead, vectorize the rest
        cap = 256
        if int(lens.max()) > cap:
            big_rows = lens[gidx] > cap
            outs = []
            if np.any(~big_rows):
                outs.append(_flush([pdf.iloc[np.flatnonzero(~big_rows)]]))
            bstarts = np.flatnonzero(new_grp & big_rows)
            for s in bstarts:
                ln = int(lens[gidx[s]])
                outs.append(_nms_one(pdf.iloc[s : s + ln], id_col, thr))
            return pd.concat(outs) if len(outs) > 1 else outs[0]
        p, maxn = len(starts), int(lens.max())
        pos = np.arange(n) - starts[gidx]      # rank position within image
        flat = gidx * maxn + pos
        valid = np.zeros(p * maxn, dtype=bool)
        valid[flat] = True
        valid = valid.reshape(p, maxn)
        grid = {}
        for c in ("box_id", "x0", "y0", "x1", "y1", "score"):
            g = np.zeros(p * maxn, dtype=np.int64)
            g[flat] = cols[c]
            grid[c] = g.reshape(p, maxn)
        keep = np.zeros((p, maxn), dtype=bool)
        keep[:, 0] = valid[:, 0]
        area = (grid["x1"] - grid["x0"]) * (grid["y1"] - grid["y0"])
        for k in range(1, maxn):
            iw = (
                np.minimum(grid["x1"][:, :k], grid["x1"][:, k : k + 1])
                - np.maximum(grid["x0"][:, :k], grid["x0"][:, k : k + 1])
            )
            ih = (
                np.minimum(grid["y1"][:, :k], grid["y1"][:, k : k + 1])
                - np.maximum(grid["y0"][:, :k], grid["y0"][:, k : k + 1])
            )
            inter = np.maximum(iw, 0) * np.maximum(ih, 0)
            union = area[:, :k] + area[:, k : k + 1] - inter
            sup = np.any(
                keep[:, :k] & (inter * 1000 > thr * union), axis=1
            )
            keep[:, k] = valid[:, k] & ~sup
        rank = np.cumsum(keep, axis=1)
        kept_flat = keep.reshape(-1)[flat]     # per input row, in order
        return pd.DataFrame(
            {
                id_col: pd.array(ids[kept_flat], dtype="string"),
                "keep_rank": rank.reshape(-1)[flat][kept_flat],
                "box_id": cols["box_id"][kept_flat],
                "score": cols["score"][kept_flat],
            }
        )

    return ordered.mapInPandas(
        _group_stream(id_col, _flush),
        f"{id_col} string, keep_rank long, box_id long, score long",
    )


def match_detections(
    preds: DataFrame,
    truths: DataFrame,
    iou_thr_milli: int = 500,
    id_col: str = "image_id",
) -> DataFrame:
    """Greedy prediction↔ground-truth matching per image (the COCO/VOC
    evaluation step): predictions are visited in (score DESC, box_id
    ASC) order; each matches the still-unmatched ground-truth box with
    the highest ``iou_micro = inter * 10^6 DIV union`` among those
    passing the gate ``inter * 1000 > iou_thr_milli * union``, ties to
    the smallest gt_id. → one row per prediction:
    (image_id, box_id, score, matched_gt, iou_micro) with matched_gt /
    iou_micro NULL for unmatched (false-positive) predictions.

    truths: (image_id, gt_id, x0, y0, x1, y1). TP/FP/FN rates are one
    aggregation over the output (matched_gt IS NULL = FP; ground truths
    absent from matched_gt = FN).
    """
    thr = int(iou_thr_milli)
    # r6: one union-tag stream instead of two collect_list packs + a
    # left join — preds and gts of an image travel as FLAT rows through
    # one hash exchange and an in-partition sort (preds first, in exact
    # visit order), so the kernel reads plain numpy columns (the packed
    # struct column arrived as list-of-dicts, converted per box in
    # Python) and the greedy runs per RANK POSITION vectorized across
    # every image of the batch, with the taken mask carried step to step.
    pz = preds.where(
        (F.col("x1") > F.col("x0")) & (F.col("y1") > F.col("y0"))
    ).select(
        F.col(id_col).alias("_img"),
        F.lit(0).alias("_tag"),
        F.col("box_id").cast("long").alias("_id"),
        F.col("x0").cast("long").alias("_x0"),
        F.col("y0").cast("long").alias("_y0"),
        F.col("x1").cast("long").alias("_x1"),
        F.col("y1").cast("long").alias("_y1"),
        F.col("score").cast("long").alias("_score"),
    )
    gz = truths.select(
        F.col(id_col).alias("_img"),
        F.lit(1).alias("_tag"),
        F.col("gt_id").cast("long").alias("_id"),
        F.col("x0").cast("long").alias("_x0"),
        F.col("y0").cast("long").alias("_y0"),
        F.col("x1").cast("long").alias("_x1"),
        F.col("y1").cast("long").alias("_y1"),
        F.lit(0).cast("long").alias("_score"),
    )
    ordered = pz.unionAll(gz).repartition("_img").sortWithinPartitions(
        "_img",
        F.col("_tag").asc(),
        F.col("_score").desc(),
        F.col("_id").asc(),
    )

    def _flush(parts: list[pd.DataFrame]) -> pd.DataFrame:
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
        imgs = pdf["_img"].to_numpy(dtype=object)
        n = len(imgs)
        tag = pdf["_tag"].to_numpy(dtype=np.int64)
        cols = {
            c: pdf[c].to_numpy(dtype=np.int64)
            for c in ("_id", "_x0", "_y0", "_x1", "_y1", "_score")
        }
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = imgs[1:] != imgs[:-1]
        gidx = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        lens = np.diff(np.append(starts, n))
        p_cnt = len(starts)
        is_pred = tag == 0
        np_pred = np.bincount(gidx[is_pred], minlength=p_cnt)
        n_gt = lens - np_pred
        maxp, maxg = int(np_pred.max()), int(n_gt.max())
        cap = 256
        if maxp > cap or maxg > cap:
            big = (np_pred > cap) | (n_gt > cap)
            big_rows = big[gidx]
            outs = []
            if np.any(~big_rows):
                outs.append(_flush([pdf.iloc[np.flatnonzero(~big_rows)]]))
            for gi in np.flatnonzero(big):
                s0 = starts[gi]
                outs.append(
                    _match_one(
                        pdf.iloc[s0 : s0 + int(lens[gi])], id_col, thr
                    )
                )
            return pd.concat(outs) if len(outs) > 1 else outs[0]
        if maxp == 0:
            return pd.DataFrame(
                {
                    id_col: pd.array([], dtype="string"),
                    "box_id": np.asarray([], dtype=np.int64),
                    "score": np.asarray([], dtype=np.int64),
                    "matched_gt": pd.array([], dtype="Int64"),
                    "iou_micro": pd.array([], dtype="Int64"),
                }
            )
        pos = np.arange(n) - starts[gidx]
        pflat = (gidx * maxp + pos)[is_pred]
        gflat = (gidx * maxg + (pos - np_pred[gidx]))[~is_pred]

        def _grid(vals: np.ndarray, width: int, sel: np.ndarray,
                  flat: np.ndarray) -> np.ndarray:
            g = np.zeros(p_cnt * width, dtype=np.int64)
            g[flat] = vals[sel]
            return g.reshape(p_cnt, width)

        pv = np.zeros(p_cnt * maxp, dtype=bool)
        pv[pflat] = True
        pv = pv.reshape(p_cnt, maxp)
        gv = np.zeros(p_cnt * max(maxg, 1), dtype=bool)
        if maxg:
            gv[gflat] = True
        gv = gv.reshape(p_cnt, max(maxg, 1))
        P = {
            c: _grid(cols[c], maxp, is_pred, pflat)
            for c in ("_id", "_x0", "_y0", "_x1", "_y1", "_score")
        }
        if maxg:
            G = {
                c: _grid(cols[c], maxg, ~is_pred, gflat)
                for c in ("_id", "_x0", "_y0", "_x1", "_y1")
            }
            g_area = (G["_x1"] - G["_x0"]) * (G["_y1"] - G["_y0"])
        p_area = (P["_x1"] - P["_x0"]) * (P["_y1"] - P["_y0"])
        got = np.zeros((p_cnt, maxp), dtype=bool)
        m_gt = np.zeros((p_cnt, maxp), dtype=np.int64)
        m_iou = np.zeros((p_cnt, maxp), dtype=np.int64)
        if maxg:
            taken = np.zeros((p_cnt, maxg), dtype=bool)
            for k in range(maxp):
                iw = np.minimum(G["_x1"], P["_x1"][:, k : k + 1]) - np.maximum(
                    G["_x0"], P["_x0"][:, k : k + 1]
                )
                ih = np.minimum(G["_y1"], P["_y1"][:, k : k + 1]) - np.maximum(
                    G["_y0"], P["_y0"][:, k : k + 1]
                )
                inter = np.maximum(iw, 0) * np.maximum(ih, 0)
                union = g_area + p_area[:, k : k + 1] - inter
                ok = (
                    gv
                    & ~taken
                    & (inter * 1000 > thr * union)
                    & pv[:, k : k + 1]
                )
                iou = np.zeros_like(inter)
                np.floor_divide(
                    inter * 1_000_000, union, out=iou, where=ok
                )
                iou_m = np.where(ok, iou, -1)
                best = iou_m.max(axis=1)
                has = best >= 0
                tie = ok & (iou_m == best[:, None])
                gid_m = np.where(tie, G["_id"], np.iinfo(np.int64).max)
                j = np.argmin(gid_m, axis=1)
                rows = np.flatnonzero(has)
                taken[rows, j[rows]] = True
                got[rows, k] = True
                m_gt[rows, k] = G["_id"][rows, j[rows]]
                m_iou[rows, k] = iou[rows, j[rows]]
        got_f = got.reshape(-1)[pflat]
        return pd.DataFrame(
            {
                id_col: pd.array(imgs[is_pred], dtype="string"),
                "box_id": cols["_id"][is_pred],
                "score": cols["_score"][is_pred],
                "matched_gt": pd.arrays.IntegerArray(
                    m_gt.reshape(-1)[pflat], mask=~got_f
                ),
                "iou_micro": pd.arrays.IntegerArray(
                    m_iou.reshape(-1)[pflat], mask=~got_f
                ),
            }
        )

    return ordered.mapInPandas(
        _group_stream("_img", _flush),
        f"{id_col} string, box_id long, score long, matched_gt long,"
        " iou_micro long",
    )


def _match_one(pdf: pd.DataFrame, id_col: str, thr: int) -> pd.DataFrame:
    """Greedy matching for ONE pre-sorted image slice (the past-the-cap
    path of match_detections): per-pred loop, vectorized over that
    image's ground truths — the original kernel's inner step."""
    tag = pdf["_tag"].to_numpy(np.int64)
    is_pred = tag == 0
    ids_ = pdf["_id"].to_numpy(np.int64)
    x0 = pdf["_x0"].to_numpy(np.int64)
    y0 = pdf["_y0"].to_numpy(np.int64)
    x1 = pdf["_x1"].to_numpy(np.int64)
    y1 = pdf["_y1"].to_numpy(np.int64)
    sc = pdf["_score"].to_numpy(np.int64)
    gsel = np.flatnonzero(~is_pred)
    gb_id, gx0, gy0, gx1, gy1 = (
        a[gsel] for a in (ids_, x0, y0, x1, y1)
    )
    g_area = (gx1 - gx0) * (gy1 - gy0)
    taken = np.zeros(len(gsel), dtype=bool)
    out_gt, out_iou, out_got = [], [], []
    for i in np.flatnonzero(is_pred):
        matched_gt, best_iou = 0, 0
        got = False
        if len(gsel):
            iw = np.minimum(gx1, x1[i]) - np.maximum(gx0, x0[i])
            ih = np.minimum(gy1, y1[i]) - np.maximum(gy0, y0[i])
            inter = np.maximum(iw, 0) * np.maximum(ih, 0)
            area_b = (x1[i] - x0[i]) * (y1[i] - y0[i])
            union = g_area + area_b - inter
            ok = (~taken) & (inter * 1000 > thr * union)
            if np.any(ok):
                iou_micro = inter[ok] * 1_000_000 // union[ok]
                ids = gb_id[ok]
                j = np.lexsort((ids, -iou_micro))[0]
                matched_gt = int(ids[j])
                best_iou = int(iou_micro[j])
                taken[np.flatnonzero(ok)[j]] = True
                got = True
        out_gt.append(matched_gt)
        out_iou.append(best_iou)
        out_got.append(got)
    got_a = np.asarray(out_got, dtype=bool)
    return pd.DataFrame(
        {
            id_col: pd.array(
                pdf["_img"].to_numpy(dtype=object)[is_pred], dtype="string"
            ),
            "box_id": ids_[is_pred],
            "score": sc[is_pred],
            "matched_gt": pd.arrays.IntegerArray(
                np.asarray(out_gt, dtype=np.int64), mask=~got_a
            ),
            "iou_micro": pd.arrays.IntegerArray(
                np.asarray(out_iou, dtype=np.int64), mask=~got_a
            ),
        }
    )


def assign_anchors(
    gts: DataFrame,
    grid_w: int = 4,
    grid_h: int = 4,
    cell: int = 12,
    sizes: tuple = ((8, 8), (12, 16)),
    pos_thr_milli: int = 300,
    id_col: str = "image_id",
) -> DataFrame:
    """Anchor-assignment training targets (the label-generation step of a
    one-stage detector): a fixed grid_w × grid_h grid of anchor boxes
    per image — len(sizes) shapes centered in each cell — and each
    anchor takes the ground-truth box maximizing
    ``iou_micro = inter·10⁶ DIV union`` among those passing
    ``inter·1000 > pos_thr_milli·union`` (ties to the smallest gt_id).
    → one row per POSITIVE anchor: (image_id, anchor_id, gx, gy,
    size_idx, matched_gt, iou_micro).

    Pure Catalyst, whole-stage-codegen end to end: the anchor grid is a
    chain of sequence-explodes with per-size LITERAL corner offsets (no
    division in the plan), IoU is exact integer arithmetic, and the
    per-anchor argmax is ONE map-side-combinable max_by over the
    ordering struct (iou_micro, −gt_id) — rule 25: no ranking window,
    no per-group sort. Scale: the explode fan-out is a constant
    grid_w·grid_h·len(sizes) per image and the join with the ≤ tens of
    GT boxes fans out before the partial aggregate collapses it, so
    10¹² images stream through one exchange.
    """
    thr = int(pos_thr_milli)
    n_s = len(sizes)
    # literal per-size offsets (centering divisions resolved in Python)
    off = [
        (int((cell - sw) // 2), int((cell - sh) // 2), int(sw), int(sh))
        for sw, sh in sizes
    ]
    sw_case = "".join(
        f"WHEN {s} THEN {o[2]} " for s, o in enumerate(off)
    )
    sh_case = "".join(
        f"WHEN {s} THEN {o[3]} " for s, o in enumerate(off)
    )
    ox_case = "".join(
        f"WHEN {s} THEN {o[0]} " for s, o in enumerate(off)
    )
    oy_case = "".join(
        f"WHEN {s} THEN {o[1]} " for s, o in enumerate(off)
    )
    anchors = (
        gts.select(id_col)
        .distinct()
        .selectExpr(
            id_col, f"explode(sequence(0, {grid_h - 1})) AS gy"
        )
        .selectExpr(
            id_col, "gy", f"explode(sequence(0, {grid_w - 1})) AS gx"
        )
        .selectExpr(
            id_col, "gy", "gx", f"explode(sequence(0, {n_s - 1})) AS s"
        )
        .selectExpr(
            id_col,
            "gx", "gy", "s",
            f"(gy * {grid_w} + gx) * {n_s} + s AS anchor_id",
            f"gx * {cell} + CASE s {ox_case}END AS ax0",
            f"gy * {cell} + CASE s {oy_case}END AS ay0",
            f"gx * {cell} + CASE s {ox_case}END + CASE s {sw_case}END AS ax1",
            f"gy * {cell} + CASE s {oy_case}END + CASE s {sh_case}END AS ay1",
        )
    )
    j = anchors.join(gts, id_col)
    inter = (
        "greatest(0, least(ax1, x1) - greatest(ax0, x0))"
        " * greatest(0, least(ay1, y1) - greatest(ay0, y0))"
    )
    union = (
        f"(ax1 - ax0) * (ay1 - ay0) + (x1 - x0) * (y1 - y0) - {inter}"
    )
    # staged projection (rule 9): _inter/_union computed once, referenced
    # by both the gate and the quantized ranking score
    scored = (
        j.selectExpr(
            id_col, "anchor_id", "gx", "gy", "s", "gt_id",
            f"{inter} AS _inter", f"{union} AS _union",
        )
        .where(f"_inter * 1000 > {thr} * _union")
        .selectExpr(
            id_col, "anchor_id", "gx", "gy", "s", "gt_id",
            "CAST(floor(_inter * CAST(1000000 AS DOUBLE) / _union)"
            " AS BIGINT) AS iou_micro",
        )
    )
    return (
        scored.groupBy(id_col, "anchor_id", "gx", "gy", "s")
        .agg(
            F.expr(
                "max_by(struct(gt_id AS matched_gt, iou_micro AS iou_micro),"
                " struct(iou_micro, -gt_id))"
            ).alias("_m")
        )
        .selectExpr(
            id_col, "anchor_id", "gx", "gy", "s AS size_idx",
            "_m.matched_gt AS matched_gt", "_m.iou_micro AS iou_micro",
        )
    )


def average_precision(
    matches: DataFrame,
    gt_counts: DataFrame,
    class_col: str = "cls",
    score_col: str = "score",
    tp_col: str = "is_tp",
    order_cols: tuple = ("image_id", "box_id"),
) -> DataFrame:
    """VOC-style interpolated average precision per class from matched
    detections (the composition target of :func:`match_detections`).

    Predictions rank per class by (score DESC, *order_cols ASC) — a
    TOTAL deterministic order. With tp_k the running TP count at rank k,
    ``prec_micro(k) = tp_k·10⁶ DIV k`` and the interpolated precision at
    k is ``max_{j ≥ k} prec_micro(j)`` (the suffix running max). AP sums
    the interpolated precision at each TP rank, once per ground truth:
    → (cls, n_gt, n_pred, n_tp, ap_num_micro) with
    AP = ap_num_micro / (n_gt · 10⁶) — kept as exact integers so the
    oracle replays bit-for-bit; the caller divides.

    gt_counts: (cls, n_gt). Pure Catalyst: two windows over ONE
    per-class sort (rank/cumsum share the frame; the suffix max reuses
    the same ordering reversed) + one aggregate + one broadcast-sized
    join. Classes partition the sort; 10⁹ predictions per class flow
    through a single exchange.
    """
    from pyspark.sql import Window

    order = [F.col(score_col).desc()] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(class_col).orderBy(*order)
    # suffix max via the EXACT-REVERSE sort with a running frame:
    # Spark executes (currentRow, unboundedFollowing) frames
    # QUADRATICALLY per partition (UnboundedFollowingWindowFunctionFrame
    # recomputes the aggregate for every row — a 250k-row class cost
    # ~3·10¹⁰ ops and hung the 4M-pred bench entry for 40+ min), while
    # (unboundedPreceding, currentRow) updates incrementally in O(n).
    # The frame SET is identical: rows at-or-after i under (score DESC,
    # ties ASC) == rows at-or-before i under (score ASC, ties DESC).
    wrev = Window.partitionBy(class_col).orderBy(
        F.col(score_col).asc(), *[F.col(c).desc() for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = matches.withColumn("_k", F.row_number().over(w)).withColumn(
        "_tp_cum",
        F.sum(F.col(tp_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    prec = ranked.withColumn(
        "_prec_micro",
        F.expr(
            "CAST(floor(_tp_cum * CAST(1000000 AS DOUBLE) / _k) AS BIGINT)"
        ),
    ).withColumn("_interp", F.max("_prec_micro").over(wrev))
    agg = prec.groupBy(class_col).agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum(F.col(tp_col).cast("long")).alias("n_tp"),
        F.sum(
            F.when(F.col(tp_col).cast("boolean"), F.col("_interp")).otherwise(
                F.lit(0)
            )
        ).alias("ap_num_micro"),
    )
    return agg.join(F.broadcast(gt_counts), class_col).select(
        class_col, "n_gt", "n_pred", "n_tp", "ap_num_micro"
    )


def detection_confusion(
    matches: DataFrame,
    pred_classes: DataFrame,
    gt_classes: DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """Detection confusion matrix from class-AGNOSTIC greedy matching
    (:func:`match_detections` output): → (pred_cls, gt_cls, n) where a
    matched pair counts under (its prediction's class, its GT's class),
    an unmatched prediction under (pred_cls, NULL), and an unmatched
    ground truth under (NULL, gt_cls). Off-diagonal mass localizes
    label confusion; the NULL row/column are the FP/FN budgets.

    pred_classes: (image_id, box_id, cls); gt_classes:
    (image_id, gt_id, cls). Pure Catalyst: two equi-joins onto the
    match rows (both sides unique on their key — no fan-out), one
    anti-join for the unmatched GTs, one hash aggregate. 10¹² matches
    partition on image_id; the output is |classes|² + 2·|classes| rows.
    """
    pc = pred_classes.select(
        id_col, "box_id", F.col("cls").alias("pred_cls")
    )
    gc = gt_classes.select(
        id_col, F.col("gt_id").alias("matched_gt"), F.col("cls").alias("gt_cls")
    )
    pred_rows = (
        matches.join(pc, [id_col, "box_id"])
        .join(gc, [id_col, "matched_gt"], "left")
        .select("pred_cls", "gt_cls")
    )
    matched_gts = matches.where(F.col("matched_gt").isNotNull()).select(
        id_col, "matched_gt"
    )
    fn_rows = (
        gt_classes.join(
            matched_gts.withColumnRenamed("matched_gt", "gt_id"),
            [id_col, "gt_id"],
            "left_anti",
        )
        .select(F.lit(None).cast("long").alias("pred_cls"), F.col("cls").alias("gt_cls"))
    )
    return (
        pred_rows.unionByName(fn_rows)
        .groupBy("pred_cls", "gt_cls")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def mosaic_boxes(
    boxes: DataFrame,
    crops: DataFrame,
    size: int = 64,
    min_area: int = 4,
    img_col: str = "img_idx",
) -> DataFrame:
    """Mosaic-augmentation box remapping (the YOLO mosaic layout):
    image ``img_idx`` lands in mosaic ``img_idx DIV 4`` at quadrant
    ``img_idx % 4`` of a 2·size × 2·size canvas (quadrant corner
    offsets (0,0), (size,0), (0,size), (size,size)); the mosaic is then
    cropped back to a size × size window at (cx, cy) from ``crops``
    (mosaic_id, cx, cy). Boxes translate, clip to the crop, and drop
    when degenerate or smaller than ``min_area``:
    → (mosaic_id, img_idx, box_id, x0, y0, x1, y1, score) in crop
    coordinates. All integer arithmetic — the oracle replays it as
    literal expressions.

    Pure Catalyst: one projection chain + ONE equi-join on mosaic_id.
    crops is one row per FOUR images — proportional to the corpus, so
    the op does NOT force a broadcast: AQE broadcasts small crop sets
    and hash-joins at scale (both sides key on mosaic_id, the
    co-bucketed zero-Exchange shape at warehouse scale, io/bucketed.py).
    """
    s = int(size)
    q = boxes.selectExpr(
        "*",
        f"CAST(floor({img_col} / CAST(4 AS DOUBLE)) AS BIGINT) AS mosaic_id",
        f"{img_col} % 4 AS _q",
    ).selectExpr(
        "*",
        f"CASE WHEN _q IN (1, 3) THEN {s} ELSE 0 END AS _ox",
        f"CASE WHEN _q IN (2, 3) THEN {s} ELSE 0 END AS _oy",
    )
    j = q.join(crops, "mosaic_id")
    clipped = j.selectExpr(
        "mosaic_id", img_col, "box_id", "score",
        f"greatest(x0 + _ox - cx, 0) AS nx0",
        f"greatest(y0 + _oy - cy, 0) AS ny0",
        f"least(x1 + _ox - cx, {s}) AS nx1",
        f"least(y1 + _oy - cy, {s}) AS ny1",
    )
    return clipped.where(
        (F.col("nx1") > F.col("nx0"))
        & (F.col("ny1") > F.col("ny0"))
        & (
            (F.col("nx1") - F.col("nx0")) * (F.col("ny1") - F.col("ny0"))
            >= int(min_area)
        )
    ).selectExpr(
        "mosaic_id", img_col, "box_id",
        "nx0 AS x0", "ny0 AS y0", "nx1 AS x1", "ny1 AS y1", "score",
    )


#: EXIF orientation → (x0', y0', x1', y1', w', h') corner remaps; codes
#: 5-8 transpose, so output dims swap. Half-open boxes stay half-open
#: under every remap (w − x1 < w − x0 etc.).
_EXIF_REMAP = {
    1: ("x0", "y0", "x1", "y1", False),
    2: ("{W} - x1", "y0", "{W} - x0", "y1", False),
    3: ("{W} - x1", "{H} - y1", "{W} - x0", "{H} - y0", False),
    4: ("x0", "{H} - y1", "x1", "{H} - y0", False),
    5: ("y0", "x0", "y1", "x1", True),
    6: ("{H} - y1", "x0", "{H} - y0", "x1", True),
    7: ("{H} - y1", "{W} - x1", "{H} - y0", "{W} - x0", True),
    8: ("y0", "{W} - x1", "y1", "{W} - x0", True),
}


def exif_orient_boxes(
    boxes: DataFrame,
    orient_col: str = "orient",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """EXIF-orientation normalization of detection boxes — the ingest
    step that rewrites boxes annotated on the STORED pixel grid into
    upright display coordinates (orientation codes 1–8; 5–8 transpose,
    swapping the output dimensions). Pure Catalyst CASE over literal
    corner remaps, all integer; unknown codes pass through as code 1.
    → input columns with (x0, y0, x1, y1, out_w, out_h) rewritten.
    """
    w, h = w_col, h_col

    def case(idx: int) -> str:
        parts = [
            f"WHEN {code} THEN "
            + _EXIF_REMAP[code][idx].format(W=w, H=h)
            for code in range(2, 9)
        ]
        default = ("x0", "y0", "x1", "y1")[idx]
        return (
            f"CASE {orient_col} " + " ".join(parts) + f" ELSE {default} END"
        )

    swap = f"{orient_col} IN (5, 6, 7, 8)"
    keep = [
        c
        for c in boxes.columns
        if c not in ("x0", "y0", "x1", "y1")
    ]
    return boxes.selectExpr(
        *keep,
        f"{case(0)} AS x0",
        f"{case(1)} AS y0",
        f"{case(2)} AS x1",
        f"{case(3)} AS y1",
        f"CASE WHEN {swap} THEN {h} ELSE {w} END AS out_w",
        f"CASE WHEN {swap} THEN {w} ELSE {h} END AS out_h",
    )


def iou_tracklets(
    dets: DataFrame,
    iou_thr_milli: int = 300,
    video_col: str = "video",
    frame_col: str = "frame",
    max_rounds: int = 30,
) -> DataFrame:
    """Tracking-by-detection tracklet stitching: detections of adjacent
    frames greedily match by IoU (:func:`match_detections`, class-
    agnostic, per (video, frame) key) and the match edges link into
    tracks via connected components (text/components — large-star/
    small-star with lineage truncation). → one row per detection:
    (video, frame, box_id, track_id) where track_id is the component's
    lexicographic-minimum node label ``video#frame#box_id`` (an opaque
    canonical id); unmatched detections form singleton tracks.

    video ids must not contain ``#`` (the node-label separator).

    Scale shape: the frame-pair matching inherits match_detections'
    pack+join+kernel shape keyed on (video, frame) — 10⁹ videos × long
    sequences partition freely; the component graph has ≤ one edge per
    detection (each detection matches ≤ 1 successor and ≤ 1
    predecessor), so CC's log-depth rounds run on an edge set linear in
    detections, and a month-long track costs O(log frames) rounds, not
    a per-frame sequential pass.
    """
    from morituri_spark.text.components import connected_components

    node = (
        f"concat({video_col}, '#', CAST({frame_col} AS STRING), '#',"
        " CAST(box_id AS STRING))"
    )
    preds = dets.selectExpr(
        f"concat({video_col}, '#', CAST({frame_col} AS STRING)) AS _key",
        "box_id", "x0", "y0", "x1", "y1", "score",
    )
    gts = dets.selectExpr(
        f"concat({video_col}, '#', CAST({frame_col} - 1 AS STRING)) AS _key",
        "box_id AS gt_id", "x0", "y0", "x1", "y1",
    )
    m = match_detections(preds, gts, iou_thr_milli, id_col="_key")
    edges = m.where(F.col("matched_gt").isNotNull()).selectExpr(
        "concat(_key, '#', CAST(box_id AS STRING)) AS u",
        # the partner lives one frame later: rebuild its label from the
        # key's video prefix + (frame + 1)
        "concat(substring_index(_key, '#', 1), '#',"
        " CAST(CAST(substring_index(_key, '#', -1) AS BIGINT) + 1"
        " AS STRING), '#', CAST(matched_gt AS STRING)) AS v",
    )
    cc = connected_components(edges, "u", "v", max_rounds=max_rounds)
    nodes = dets.selectExpr(
        video_col, frame_col, "box_id", f"{node} AS _node"
    )
    return (
        nodes.join(cc, nodes["_node"] == cc["node"], "left")
        .selectExpr(
            video_col,
            frame_col,
            "box_id",
            "coalesce(cluster_id, _node) AS track_id",
        )
    )


def letterbox_boxes(
    boxes: DataFrame,
    size: int = 640,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Letterbox-resize box remapping (the aspect-preserving square
    resize every detector ingest uses): the image scales by
    size/max(w, h) and centers on a size × size canvas; boxes remap as
    ``x' = x·size DIV m + pad_x`` with ``pad_x = (size − w·size DIV m)
    DIV 2`` — exact integral arithmetic (Spark `div` ≡ oracle `//`),
    no float scale anywhere. → input columns with (x0, y0, x1, y1)
    rewritten plus (pad_x, pad_y, scale_micro = size·10⁶ DIV m).
    Pure codegen projection; zero exchanges."""
    s = int(size)
    keep = [c for c in boxes.columns if c not in ("x0", "y0", "x1", "y1")]
    staged = boxes.selectExpr(
        *boxes.columns,
        f"greatest({w_col}, {h_col}) AS _m",
    ).selectExpr(
        *boxes.columns,
        "_m",
        f"(CAST({s} AS BIGINT) - {w_col} * CAST({s} AS BIGINT) div _m)"
        " div 2 AS pad_x",
        f"(CAST({s} AS BIGINT) - {h_col} * CAST({s} AS BIGINT) div _m)"
        " div 2 AS pad_y",
    )
    return staged.selectExpr(
        *keep,
        f"x0 * CAST({s} AS BIGINT) div _m + pad_x AS x0",
        f"y0 * CAST({s} AS BIGINT) div _m + pad_y AS y0",
        f"x1 * CAST({s} AS BIGINT) div _m + pad_x AS x1",
        f"y1 * CAST({s} AS BIGINT) div _m + pad_y AS y1",
        "pad_x", "pad_y",
        f"CAST({s} AS BIGINT) * 1000000 div _m AS scale_micro",
    ).drop("_m")


def homography_boxes(
    boxes: DataFrame,
    size: int = 640,
    h_prefix: str = "h",
) -> DataFrame:
    """Projective (homography) box remapping — the last warp class after
    the affine family (letterbox/mosaic/EXIF): each row carries an
    integer 3×3 homography ``h00..h22`` (row-major, ``h{r}{c}``); the
    four box corners map through
    ``x' = (h00·x + h01·y + h02) / (h20·x + h21·y + h22)`` and the
    output box is the axis-aligned hull of the mapped corners in MICRO
    pixels, clipped to the ``size``-square canvas.

    Determinism contract: numerators stay ≤ ~2·10¹³ (integer H entries ×
    integer corners × 10⁶), far below 2⁵³, so the shared expression
    ``CAST(floor(num · 1000000.0 / den) AS BIGINT)`` (rule 28) is
    bit-identical in Spark and DuckDB — one exact IEEE division + floor
    per corner coordinate, no other rounding surface. A corner whose
    denominator is ≤ 0 lies on or behind the camera plane: the row
    emits ``valid = false`` with NULL coordinates (audit-friendly; the
    caller filters) — clipping a half-projected box would fabricate
    geometry.

    → input columns with (x0, y0, x1, y1) rewritten to clipped micro
    coordinates plus ``valid``. Pure codegen projection staged per rule
    9 (denominators → mapped corners → hull/clip as separate projected
    columns); zero exchanges, 10¹² boxes partition freely."""
    s_micro = int(size) * 1000000
    p = h_prefix
    keep = [c for c in boxes.columns if c not in ("x0", "y0", "x1", "y1")]
    corners = {"a": ("x0", "y0"), "b": ("x1", "y0"),
               "c": ("x0", "y1"), "d": ("x1", "y1")}
    dens = boxes.selectExpr(
        *boxes.columns,
        # the division below uses the GUARDED denominator (≤ 0 → 1) so a
        # corner exactly on the camera plane (den = 0) can't trip ANSI
        # divide-by-zero — the garbage quotient of an invalid corner is
        # masked to NULL by the `valid` CASE, never observable
        *[
            f"CAST({p}20 * {cx} + {p}21 * {cy} + {p}22 AS BIGINT) AS _den_{k}"
            for k, (cx, cy) in corners.items()
        ],
    ).selectExpr(
        "*",
        *[
            f"CASE WHEN _den_{k} > 0 THEN _den_{k} ELSE 1 END AS _sden_{k}"
            for k in corners
        ],
    )
    mapped = dens.selectExpr(
        *boxes.columns,
        "(_den_a > 0 AND _den_b > 0 AND _den_c > 0 AND _den_d > 0)"
        " AS valid",
        *[
            f"CAST(floor(CAST({p}00 * {cx} + {p}01 * {cy} + {p}02"
            f" AS BIGINT) * 1000000.0 / _sden_{k}) AS BIGINT) AS _mx_{k}"
            for k, (cx, cy) in corners.items()
        ],
        *[
            f"CAST(floor(CAST({p}10 * {cx} + {p}11 * {cy} + {p}12"
            f" AS BIGINT) * 1000000.0 / _sden_{k}) AS BIGINT) AS _my_{k}"
            for k, (cx, cy) in corners.items()
        ],
    )
    clip = (
        lambda e: f"greatest(CAST(0 AS BIGINT), least(CAST({s_micro} AS"
        f" BIGINT), {e}))"
    )
    return mapped.selectExpr(
        *keep,
        "valid",
        f"CASE WHEN valid THEN {clip('least(_mx_a, _mx_b, _mx_c, _mx_d)')}"
        " END AS x0",
        f"CASE WHEN valid THEN {clip('least(_my_a, _my_b, _my_c, _my_d)')}"
        " END AS y0",
        f"CASE WHEN valid THEN {clip('greatest(_mx_a, _mx_b, _mx_c, _mx_d)')}"
        " END AS x1",
        f"CASE WHEN valid THEN {clip('greatest(_my_a, _my_b, _my_c, _my_d)')}"
        " END AS y1",
    )
