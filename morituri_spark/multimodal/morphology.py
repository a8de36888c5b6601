"""Binary morphology — per-image 3×3 erode / dilate / opening / closing
over a thresholded mask, with exact pixel-membership checksums (the
speckle-removal / gap-closing primitives every vision-data-cleaning
pipeline runs before object counting).

Semantics contract (engine-stable, SQL-replayable):

- mask = pixels with 3×-gray ``g3 = r+g+b >= threshold`` (the exact
  integer gate shared with blobs.py/edges.py/enhance.py);
- structuring element: the full 3×3 box, 8-connectivity;
- BORDER CONVENTION: outside the image is 0 (background). Erosion
  therefore clears every border pixel; dilation takes the max over the
  in-bounds neighbors only (max with absent zeros is a no-op). The same
  convention applies inside compositions, so
  ``opening = dilate(erode(mask))`` and ``closing = erode(dilate(mask))``
  are fully pinned.
- per image the output is exact integers: the five mask populations and
  three position-weighted checksums ``Σ (y·W + x + 1)`` over the set
  pixels of mask / opening / closing — membership-sensitive (a single
  shifted pixel flips them), so the oracle checks WHICH pixels survive,
  not just how many.

Scale shape: one scan-shaped Arrow kernel (mapInPandas); pixels never
leave the task and the output is one row per image. For rasters larger
than a task, the module contract is the engine's standard one: TILE
FIRST with a 1-pixel halo exchange (erode/dilate are 1-local, so a
3×3 op on a haloed tile is exact), then the per-tile outputs sum.

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), sibling of blobs.py (region analysis) and
edges.py (boundary analysis).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode


def _erode3(m: np.ndarray) -> np.ndarray:
    """3×3 box erosion, outside-is-0: border rows/cols always clear."""
    h, w = m.shape
    p = np.zeros((h + 2, w + 2), dtype=bool)
    p[1:-1, 1:-1] = m
    out = np.ones((h, w), dtype=bool)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out &= p[dy : dy + h, dx : dx + w]
    return out


def _dilate3(m: np.ndarray) -> np.ndarray:
    """3×3 box dilation, outside-is-0: max over in-bounds neighbors."""
    h, w = m.shape
    p = np.zeros((h + 2, w + 2), dtype=bool)
    p[1:-1, 1:-1] = m
    out = np.zeros((h, w), dtype=bool)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out |= p[dy : dy + h, dx : dx + w]
    return out


def _chk(m: np.ndarray) -> int:
    """Position-weighted membership checksum Σ (y·W + x + 1)."""
    h, w = m.shape
    idx = np.arange(h * w, dtype=np.int64) + 1
    return int(idx[m.ravel()].sum())


def morphology_stats(
    images: DataFrame,
    threshold: int = 384,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, n_mask, n_erode, n_dilate, n_open, n_close,
    chk_mask, chk_open, chk_close): exact integer populations of the
    g3-threshold mask and its 3×3 erosion / dilation / opening / closing,
    plus membership checksums for mask, opening, and closing."""
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "image_id", "n_mask", "n_erode", "n_dilate", "n_open",
                    "n_close", "chk_mask", "chk_open", "chk_close",
                )
            }
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                mask = arr.astype(np.int64).sum(axis=2) >= thr
                er = _erode3(mask)
                di = _dilate3(mask)
                op = _dilate3(er)
                cl = _erode3(di)
                out["image_id"].append(image_id)
                out["n_mask"].append(int(mask.sum()))
                out["n_erode"].append(int(er.sum()))
                out["n_dilate"].append(int(di.sum()))
                out["n_open"].append(int(op.sum()))
                out["n_close"].append(int(cl.sum()))
                out["chk_mask"].append(_chk(mask))
                out["chk_open"].append(_chk(op))
                out["chk_close"].append(_chk(cl))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        k: np.asarray(out[k], dtype=np.int64)
                        for k in (
                            "n_mask", "n_erode", "n_dilate", "n_open",
                            "n_close", "chk_mask", "chk_open", "chk_close",
                        )
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run,
        "image_id string, n_mask long, n_erode long, n_dilate long,"
        " n_open long, n_close long, chk_mask long, chk_open long,"
        " chk_close long",
    )
