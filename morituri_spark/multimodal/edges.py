"""Sobel edge-point extraction — the image-side feeder of the Hough
line detector (geo/hough.py): decode → integer gradient → thresholded
edge pixels as a (image_id, x, y) point table.

ALL-INTEGER contract: gradients run on 3×-fixed-point gray
``g3 = r+g+b`` (int64 — thirds never round, the image_quality
convention) with the classic Sobel stencils

    Gx = [[-1,0,1],[-2,0,2],[-1,0,1]]     Gy = Gxᵀ

and the L1 magnitude |Gx|+|Gy| (no sqrt), so edge membership is an
exact integer comparison a SQL oracle replays from the pixel closed
form — no float anywhere. Interior pixels only (the 3×3 stencil is
undefined on the 1-pixel border; emitting a padded convention would
just bake in an arbitrary choice both engines must then share).

Scale shape: one scan-shaped Arrow kernel (decode + two slicing
convolutions per image — embarrassingly parallel, pixels never leave
the task); the output is the SPARSE edge set, typically a few % of
pixels, which then feeds hough_votes' accumulator-bounded groupBy.
Composed end-to-end this is decode → edges → lines with exactly ONE
data-sized exchange (the vote combine), the raster sibling of the
engine's points→cells→rollup pipelines.

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), the structural sibling of enhance.py's
histogram kernels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode


def edge_points(
    images: DataFrame,
    threshold: int = 400,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, x, y, mag): interior pixels whose integer Sobel L1
    magnitude ``|Gx|+|Gy|`` on 3×-gray is ≥ ``threshold``. ``x`` is the
    column index, ``y`` the row index — the coordinate frame hough_votes
    consumes directly."""
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, xs, ys, mags = [], [], [], []
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g = arr.astype(np.int64).sum(axis=2)
                if g.shape[0] < 3 or g.shape[1] < 3:
                    continue
                # slicing convolution: exact int64, no wrap possible
                # (|Gx| <= 4*765*2)
                gx = (
                    (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
                )
                gy = (
                    (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
                )
                mag = np.abs(gx) + np.abs(gy)
                yy, xx = np.nonzero(mag >= thr)
                n = len(yy)
                if n:
                    ids.extend([image_id] * n)
                    xs.extend((xx + 1).tolist())  # interior offset
                    ys.extend((yy + 1).tolist())
                    mags.extend(mag[yy, xx].tolist())
            yield pd.DataFrame(
                {
                    "image_id": pd.array(ids, dtype="string"),
                    "x": np.asarray(xs, dtype=np.int64),
                    "y": np.asarray(ys, dtype=np.int64),
                    "mag": np.asarray(mags, dtype=np.int64),
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, x long, y long, mag long"
    )


def orientation_histogram(
    images: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """Gradient-orientation histogram (sign-magnitude octant variant) —
    the HOG-style texture/shape descriptor, kept ALL-INTEGER.

    Per interior pixel the Sobel gradient (corners.py's stencil on
    3×-gray) is classed into one of 8 orientation codes by the PINNED
    integer contract ``oct = (gx>0) + 2·(gy>0) + 4·(|gx|≥|gy|)`` — a
    sign-magnitude octant code, not the Dalal-Triggs angular bin (that
    needs atan2; this variant is engine-exact and angle-consistent
    within each half-quadrant). Zero-gradient pixels (gx=gy=0) are
    excluded. → (image_id, octant, n_pixels, sum_mag) with
    mag = |gx|+|gy| — both exact integers, so the oracle's weighted
    3×3-join replay matches bit-for-bit.

    Scale shape: one scan-shaped Arrow kernel; output ≤ 8 rows per
    image. Giant rasters tile with a 1-pixel halo and the per-tile
    histograms SUM (map-side combinable).
    """
    from .corners import _sobel

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "octant": [], "n_pixels": [],
                   "sum_mag": []}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                if g3.shape[0] < 3 or g3.shape[1] < 3:
                    continue
                gx, gy = _sobel(g3)
                nz = (gx != 0) | (gy != 0)
                oct_ = (
                    (gx > 0).astype(np.int64)
                    + 2 * (gy > 0).astype(np.int64)
                    + 4 * (np.abs(gx) >= np.abs(gy)).astype(np.int64)
                )
                mag = np.abs(gx) + np.abs(gy)
                n = np.bincount(oct_[nz], minlength=8)
                s = np.bincount(oct_[nz], weights=mag[nz].astype(np.float64),
                                minlength=8).astype(np.int64)
                for o in np.flatnonzero(n):
                    out["image_id"].append(image_id)
                    out["octant"].append(int(o))
                    out["n_pixels"].append(int(n[o]))
                    out["sum_mag"].append(int(s[o]))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("octant", "n_pixels", "sum_mag")
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, octant long, n_pixels long, sum_mag long"
    )
