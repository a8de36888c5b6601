"""Texture descriptors — per-image ALL-INTEGER gray-level co-occurrence
(GLCM), local-binary-pattern (LBP) histograms, and binary run-length
histograms (the classic texture triple used to cluster / dedup scanned
and rendered imagery by surface statistics rather than content hashes).

ALL-INTEGER contract (engine-stable, SQL-replayable):

- gray is ``g3 = r+g+b`` (0..765), the exact convention of edges.py /
  corners.py;
- GLCM quantizes to ``levels`` gray levels as ``lv = g3*levels // 766``
  (exact integer floor; for the default 8 levels the products stay tiny)
  and counts ordered co-occurring pairs at each integer offset
  ``(dy, dx)``; the emitted features are integer NUMERATORS over the raw
  pair counts c(i,j):

  * ``n_pairs``  = Σ c            (the normalizer, so p = c/n_pairs)
  * ``contrast`` = Σ c·(i−j)²     (contrast numerator)
  * ``energy_sq``= Σ c²           (angular-second-moment numerator, /n²)
  * ``homog840`` = Σ c·840/(1+|i−j|)  — 840 = lcm(1..8), so the
    homogeneity weight is integral for every |i−j| ≤ 7 (levels ≤ 8)

- LBP codes the 8-neighborhood of every interior pixel with the fixed
  weight ring E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128 and the
  ``neighbor ≥ center`` convention, then emits the per-image histogram
  ``(code, cnt)`` over codes that occur;
- run-lengths binarize at ``g3 ≥ threshold`` and emit the per-image
  histogram of HORIZONTAL run lengths of the mask (Galloway's
  run-length statistic for the binary case).

No float appears anywhere, so a SQL replay (offset self-joins for GLCM,
a weighted 8-neighbor join for LBP, gaps-and-islands for runs) matches
bit-exactly.

Scale shape: one scan-shaped Arrow kernel each — pixels never leave the
task, and outputs are O(levels²), O(256), and O(max_run) rows per image.
Giant rasters follow the module's standard tiling contract (GLCM/LBP are
1-local — a 1-pixel halo suffices; run-lengths tile by full rows).

Reference scope: no counterpart in morituri; multimodal extension family
(SURVEY.md §2), sibling of corners.py / distance.py.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode

#: LBP neighbor ring: (dy, dx, weight), E→SE→S→SW→W→NW→N→NE.
LBP_RING: tuple[tuple[int, int, int], ...] = (
    (0, 1, 1),
    (1, 1, 2),
    (1, 0, 4),
    (1, -1, 8),
    (0, -1, 16),
    (-1, -1, 32),
    (-1, 0, 64),
    (-1, 1, 128),
)


def _g3(arr: np.ndarray) -> np.ndarray:
    return arr.astype(np.int64).sum(axis=2)


def _glcm_one(
    g3: np.ndarray, levels: int, offsets: Sequence[tuple[int, int]]
) -> list[tuple[int, int, int, int, int, int]]:
    """[(dy, dx, n_pairs, contrast, energy_sq, homog840)] for one image."""
    lv = (g3 * levels) // 766
    out = []
    h, w = lv.shape
    d = np.arange(levels, dtype=np.int64)
    dif = np.abs(d[:, None] - d[None, :]).ravel()  # |i-j| per flat code
    contrast_w = dif * dif
    homog_w = 840 // (1 + dif)
    for dy, dx in offsets:
        if abs(dy) >= h or abs(dx) >= w:
            continue
        # ordered pairs p=(y,x) → q=(y+dy, x+dx), both in bounds
        y0, y1 = max(0, -dy), min(h, h - dy)
        x0, x1 = max(0, -dx), min(w, w - dx)
        a = lv[y0:y1, x0:x1]
        b = lv[y0 + dy : y1 + dy, x0 + dx : x1 + dx]
        c = np.bincount(
            (a * levels + b).ravel(), minlength=levels * levels
        ).astype(np.int64)
        out.append(
            (
                dy,
                dx,
                int(c.sum()),
                int((c * contrast_w).sum()),
                int((c * c).sum()),
                int((c * homog_w).sum()),
            )
        )
    return out


def glcm_features(
    images: DataFrame,
    levels: int = 8,
    offsets: Sequence[tuple[int, int]] = ((0, 1), (1, 0)),
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, dy, dx, n_pairs, contrast, energy_sq, homog840):
    integer GLCM feature numerators per image and offset (see module
    docstring for the exact definitions)."""
    if levels < 2 or levels > 8:
        raise ValueError("levels must be in [2, 8] (840 = lcm(1..8))")
    lv = int(levels)
    offs = [(int(dy), int(dx)) for dy, dx in offsets]
    cols = ("image_id", "dy", "dx", "n_pairs", "contrast", "energy_sq",
            "homog840")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in cols}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                for row in _glcm_one(_g3(arr), lv, offs):
                    out["image_id"].append(image_id)
                    for c, v in zip(cols[1:], row):
                        out[c].append(v)
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in cols[1:]
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run,
        "image_id string, dy long, dx long, n_pairs long, contrast long,"
        " energy_sq long, homog840 long",
    )


def _lbp_one(g3: np.ndarray) -> np.ndarray:
    """256-bin LBP histogram of the interior pixels of one image."""
    c = g3[1:-1, 1:-1]
    code = np.zeros_like(c)
    for dy, dx, wgt in LBP_RING:
        nb = g3[1 + dy : g3.shape[0] - 1 + dy, 1 + dx : g3.shape[1] - 1 + dx]
        code += wgt * (nb >= c)
    return np.bincount(code.ravel(), minlength=256).astype(np.int64)


def lbp_histogram(
    images: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """→ (image_id, code, cnt): per-image histogram of 8-bit LBP codes
    over interior pixels (codes with cnt = 0 are omitted)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "code": [], "cnt": []}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = _g3(arr)
                if g3.shape[0] < 3 or g3.shape[1] < 3:
                    continue
                hist = _lbp_one(g3)
                nz = np.flatnonzero(hist)
                out["image_id"].extend([image_id] * len(nz))
                out["code"].extend(nz.tolist())
                out["cnt"].extend(hist[nz].tolist())
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    "code": np.asarray(out["code"], dtype=np.int64),
                    "cnt": np.asarray(out["cnt"], dtype=np.int64),
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, code long, cnt long"
    )


def _runs_one(mask_row: np.ndarray) -> np.ndarray:
    """Run lengths of True in one 1-D boolean row."""
    padded = np.zeros(mask_row.size + 2, dtype=np.int8)
    padded[1:-1] = mask_row
    d = np.diff(padded)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return ends - starts


def run_length_hist(
    images: DataFrame,
    threshold: int = 384,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, run_len, cnt): per-image histogram of horizontal run
    lengths of the binary mask ``g3 ≥ threshold`` (row-wise runs)."""
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "run_len": [], "cnt": []}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                mask = _g3(arr) >= thr
                lens = np.concatenate([_runs_one(r) for r in mask])
                if lens.size == 0:
                    continue
                hist = np.bincount(lens)
                nz = np.flatnonzero(hist)
                out["image_id"].extend([image_id] * len(nz))
                out["run_len"].extend(nz.tolist())
                out["cnt"].extend(hist[nz].tolist())
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    "run_len": np.asarray(out["run_len"], dtype=np.int64),
                    "cnt": np.asarray(out["cnt"], dtype=np.int64),
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, run_len long, cnt long"
    )
