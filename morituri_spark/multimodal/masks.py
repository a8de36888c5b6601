"""Segmentation-mask plumbing: COCO-style run-length encoding of packed
binary masks.

A segmentation dataset at 10¹²-image scale ships masks as packed bits
(1 bit/pixel), not PNGs; COCO's RLE flattens the mask in COLUMN-major
order and stores alternating 0/1 run lengths. ``mask_rle_runs`` decodes
the packed payload and emits the 1-runs — every value is an exact
integer (byte unpack + index arithmetic), so the SQL oracle replays the
encoding from a closed-form pixel relation with the classic
gaps-and-islands idiom (pos − row_number()).

Scale shape: one scan-shaped Arrow kernel, no exchange at all — each
mask row is independent and the run count is bounded by w·h/2. Giant
masks stream as tiles with their own ids; RLE is per-row local.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "mask_rle_runs",
    "pack_mask",
    "panoptic_matches",
    "panoptic_quality",
]


def pack_mask(mask: np.ndarray) -> bytes:
    """Pack a 2-D boolean/0-1 mask row-major into bytes (np.packbits
    big-bit-endian), the storage format mask_rle_runs expects."""
    return bytes(np.packbits(mask.astype(np.uint8).ravel()))


def mask_rle_runs(
    masks: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "mask",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """COCO-order RLE of packed binary masks: → (image_id, run_idx,
    start, length) — the maximal runs of 1-pixels in COLUMN-major
    flatten order (pos = x·h + y), run_idx 1-based by start. All-zero
    masks emit no rows. The full COCO counts vector (alternating 0/1
    runs starting with zeros) is a deterministic function of these
    rows plus w·h.
    """
    src = masks.select(id_col, bytes_col, w_col, h_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # batch assembly is fully vectorized: per mask one numpy
            # diff finds the runs, then ids via np.repeat / run_idx via
            # np.arange / one concatenate per column — the per-run
            # Python append loop this replaces cost ~rows-out iterations
            ids, counts = [], []
            st_parts, ln_parts, ix_parts = [], [], []
            for image_id, buf, w, h in zip(
                pdf[id_col], pdf[bytes_col], pdf[w_col], pdf[h_col]
            ):
                w, h = int(w), int(h)
                bits = np.unpackbits(
                    np.frombuffer(bytes(buf), dtype=np.uint8), count=w * h
                )
                # row-major storage → column-major scan order
                flat = bits.reshape(h, w).T.ravel()
                padded = np.concatenate(([0], flat, [0]))
                d = np.diff(padded.astype(np.int8))
                starts = np.flatnonzero(d == 1)
                n = len(starts)
                if n == 0:
                    continue
                ends = np.flatnonzero(d == -1)
                ids.append(image_id)
                counts.append(n)
                st_parts.append(starts.astype(np.int64))
                ln_parts.append((ends - starts).astype(np.int64))
                ix_parts.append(np.arange(1, n + 1, dtype=np.int64))
            if not ids:
                yield pd.DataFrame(
                    {
                        "image_id": pd.array([], dtype="string"),
                        "run_idx": np.asarray([], dtype=np.int64),
                        "start": np.asarray([], dtype=np.int64),
                        "length": np.asarray([], dtype=np.int64),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "image_id": pd.array(
                        np.repeat(
                            np.asarray(ids, dtype=object),
                            np.asarray(counts, dtype=np.int64),
                        ),
                        dtype="string",
                    ),
                    "run_idx": np.concatenate(ix_parts),
                    "start": np.concatenate(st_parts),
                    "length": np.concatenate(ln_parts),
                }
            )

    return src.mapInPandas(
        run, f"{id_col} string, run_idx long, start long, length long"
    )


def panoptic_matches(
    pred_runs: DataFrame,
    gt_runs: DataFrame,
    id_col: str = "image_id",
    seg_col: str = "seg_id",
    iou_thr_milli: int = 500,
    bin_width: float = 64.0,
) -> DataFrame:
    """Panoptic-quality segment matching (Kirillov et al. 2019) over
    RLE-encoded segments: inputs are per-segment 1-runs
    (image_id, seg_id, start, length) — :func:`mask_rle_runs` output
    plus a segment id — and a pred/GT segment pair MATCHES iff
    ``IoU > iou_thr_milli/1000`` computed from exact integer run
    overlaps. At the PQ threshold 0.5 each segment matches at most one
    partner (the PQ uniqueness theorem), so the output is the TP set:
    → (image_id, pred_seg, gt_seg, inter, un, iou_micro).

    Scale shape: run overlaps come from
    :func:`morituri_spark.operators.rangejoin.interval_overlap_join` —
    a binned equi-join, never |runs|² — then ONE hash aggregate per
    (image, pred_seg, gt_seg) and broadcast-free joins against the
    per-segment totals (pre-aggregated, so both join sides are one row
    per segment). All arithmetic integer; iou_micro is the shared
    DIV-quantization (rule 28).
    """
    from morituri_spark.operators.rangejoin import interval_overlap_join

    thr = int(iou_thr_milli)
    a = pred_runs.select(
        F.col(id_col),
        F.col(seg_col).alias("pred_seg"),
        F.col("start").alias("_as"),
        (F.col("start") + F.col("length")).alias("_ae"),
    )
    b = gt_runs.select(
        F.col(id_col),
        F.col(seg_col).alias("gt_seg"),
        F.col("start").alias("_bs"),
        (F.col("start") + F.col("length")).alias("_be"),
    )
    pairs = interval_overlap_join(
        a, b, [id_col], "_as", "_ae", "_bs", "_be", bin_width=bin_width
    )
    inter = pairs.select(
        id_col, "pred_seg", "gt_seg",
        (
            F.least("_ae", "_be") - F.greatest("_as", "_bs")
        ).alias("_ov"),
    ).groupBy(id_col, "pred_seg", "gt_seg").agg(F.sum("_ov").alias("inter"))
    ta = pred_runs.groupBy(id_col, F.col(seg_col).alias("pred_seg")).agg(
        F.sum("length").alias("_ta")
    )
    tb = gt_runs.groupBy(id_col, F.col(seg_col).alias("gt_seg")).agg(
        F.sum("length").alias("_tb")
    )
    return (
        inter.join(ta, [id_col, "pred_seg"])
        .join(tb, [id_col, "gt_seg"])
        .withColumn("un", F.col("_ta") + F.col("_tb") - F.col("inter"))
        .where(F.col("inter") * 1000 > thr * F.col("un"))
        .selectExpr(
            id_col, "pred_seg", "gt_seg",
            "CAST(inter AS BIGINT) AS inter",
            "CAST(un AS BIGINT) AS un",
            "CAST(floor(inter * CAST(1000000 AS DOUBLE) / un) AS BIGINT)"
            " AS iou_micro",
        )
    )


def panoptic_quality(
    pred_runs: DataFrame,
    gt_runs: DataFrame,
    id_col: str = "image_id",
    seg_col: str = "seg_id",
    iou_thr_milli: int = 500,
    bin_width: float = 64.0,
) -> DataFrame:
    """Per-image panoptic-quality sufficient statistics:
    → (image_id, n_pred, n_gt, n_matched, sum_iou_micro) — PQ is
    ``(sum_iou_micro/10⁶) / (TP + FP/2 + FN/2)`` with TP = n_matched,
    FP = n_pred − TP, FN = n_gt − TP; kept integer so the oracle replay
    is exact. One aggregate over :func:`panoptic_matches` plus the two
    per-image segment counts (full-outer joined — an image may have
    segments on only one side)."""
    m = panoptic_matches(
        pred_runs, gt_runs, id_col, seg_col, iou_thr_milli, bin_width
    )
    mm = m.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("iou_micro").alias("sum_iou_micro"),
    )
    np_ = (
        pred_runs.select(id_col, seg_col).distinct()
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_pred"))
    )
    ng = (
        gt_runs.select(id_col, seg_col).distinct()
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_gt"))
    )
    return (
        np_.join(ng, id_col, "full")
        .join(mm, id_col, "left")
        .selectExpr(
            id_col,
            "CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred",
            "CAST(coalesce(n_gt, 0) AS BIGINT) AS n_gt",
            "CAST(coalesce(n_matched, 0) AS BIGINT) AS n_matched",
            "CAST(coalesce(sum_iou_micro, 0) AS BIGINT) AS sum_iou_micro",
        )
    )
