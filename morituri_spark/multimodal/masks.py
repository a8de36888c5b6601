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
from pyspark.sql import DataFrame

__all__ = ["mask_rle_runs", "pack_mask"]


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
            out = {c: [] for c in ("image_id", "run_idx", "start", "length")}
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
                ends = np.flatnonzero(d == -1)
                for k, (s, e) in enumerate(zip(starts, ends), start=1):
                    out["image_id"].append(image_id)
                    out["run_idx"].append(k)
                    out["start"].append(int(s))
                    out["length"].append(int(e - s))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("run_idx", "start", "length")
                    },
                }
            )

    return src.mapInPandas(
        run, f"{id_col} string, run_idx long, start long, length long"
    )
