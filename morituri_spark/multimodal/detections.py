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

__all__ = ["nms_boxes", "match_detections"]

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
    packed = _pack(src, id_col, _BOX_COLS, "_boxes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("image_id", "keep_rank", "box_id", "score")}
            for image_id, boxes in zip(pdf[id_col], pdf["_boxes"]):
                a = _boxes_np(boxes)
                order = np.lexsort((a[:, 0], -a[:, 5]))
                kept_rows = []
                for idx in order:
                    box = a[idx]
                    if kept_rows:
                        inter, union = _inter_union(np.array(kept_rows), box)
                        if np.any(inter * 1000 > thr * union):
                            continue
                    kept_rows.append(box)
                    out["image_id"].append(image_id)
                    out["keep_rank"].append(len(kept_rows))
                    out["box_id"].append(int(box[0]))
                    out["score"].append(int(box[5]))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("keep_rank", "box_id", "score")
                    },
                }
            )

    return packed.mapInPandas(
        run, f"{id_col} string, keep_rank long, box_id long, score long"
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
    gt_cols = ("gt_id", "x0", "y0", "x1", "y1")
    p = _pack(
        preds.where((F.col("x1") > F.col("x0")) & (F.col("y1") > F.col("y0"))),
        id_col, _BOX_COLS, "_preds",
    )
    g = _pack(truths, id_col, gt_cols, "_gts")
    both = p.join(g, id_col, "left")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                c: []
                for c in ("image_id", "box_id", "score", "matched_gt", "iou_micro")
            }
            for image_id, pboxes, gboxes in zip(
                pdf[id_col], pdf["_preds"], pdf["_gts"]
            ):
                a = _boxes_np(pboxes)
                gb = (
                    np.array(
                        [[t[c] for c in gt_cols] for t in gboxes], dtype=np.int64
                    )
                    if gboxes is not None and len(gboxes)
                    else np.empty((0, 5), dtype=np.int64)
                )
                g_area = (gb[:, 3] - gb[:, 1]) * (gb[:, 4] - gb[:, 2])
                taken = np.zeros(len(gb), dtype=bool)
                for idx in np.lexsort((a[:, 0], -a[:, 5])):
                    box = a[idx]
                    matched_gt, best_iou = None, None
                    if len(gb):
                        iw = np.minimum(gb[:, 3], box[3]) - np.maximum(gb[:, 1], box[1])
                        ih = np.minimum(gb[:, 4], box[4]) - np.maximum(gb[:, 2], box[2])
                        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
                        area_b = (box[3] - box[1]) * (box[4] - box[2])
                        union = g_area + area_b - inter
                        ok = (~taken) & (inter * 1000 > thr * union)
                        if np.any(ok):
                            iou_micro = inter[ok] * 1_000_000 // union[ok]
                            ids = gb[ok, 0]
                            j = np.lexsort((ids, -iou_micro))[0]
                            matched_gt = int(ids[j])
                            best_iou = int(iou_micro[j])
                            taken[np.flatnonzero(ok)[j]] = True
                    out["image_id"].append(image_id)
                    out["box_id"].append(int(box[0]))
                    out["score"].append(int(box[5]))
                    out["matched_gt"].append(matched_gt)
                    out["iou_micro"].append(best_iou)
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    "box_id": np.asarray(out["box_id"], dtype=np.int64),
                    "score": np.asarray(out["score"], dtype=np.int64),
                    "matched_gt": pd.array(out["matched_gt"], dtype="Int64"),
                    "iou_micro": pd.array(out["iou_micro"], dtype="Int64"),
                }
            )

    return both.mapInPandas(
        run,
        f"{id_col} string, box_id long, score long, matched_gt long,"
        " iou_micro long",
    )
