"""Image moments — per-image ALL-INTEGER raw and central moment
numerators of the thresholded mask (the shape-descriptor primitive
under orientation estimation, eccentricity gates, and registration
pre-checks; central moments feed Hu invariants downstream).

ALL-INTEGER contract (engine-stable, SQL-replayable):

- mask = pixels with ``g3 = r+g+b ≥ threshold`` (the family gate);
- raw moments over mask pixels (x right, y down, pixel units):
  m00 = Σ1, m10 = Σx, m01 = Σy, m20 = Σx², m02 = Σy², m11 = Σxy;
- central moments are RATIONAL (they subtract the centroid), so the
  emitted values are the exact integer NUMERATORS over denominator
  m00:  mu20n = m00·m20 − m10²,  mu02n = m00·m02 − m01²,
  mu11n = m00·m11 − m10·m01  (i.e. mu_ab = mu_abn / m00) — no float
  ever appears, and the orientation sign class sign(mu11n) is exact;
- images whose mask is empty are absent.

Scale shape: one scan-shaped Arrow kernel; pixels never leave the task
and the output is one row per image. Tiling contract for giant rasters:
moments are ADDITIVE over pixel partitions — per-tile raw moments sum
(with x/y kept global), so the cross-tile reduce is one map-side
combinable aggregate; the central numerators are then derived from the
reduced raw sums (never from per-tile centrals).

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), sibling of blobs.py (per-component stats — this
module is the whole-mask summary).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode

_COLS = (
    "image_id", "m00", "m10", "m01", "m20", "m02", "m11",
    "mu20n", "mu02n", "mu11n",
)


def _moments_one(mask: np.ndarray) -> tuple[int, ...] | None:
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return None
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    m00 = int(ys.size)
    m10 = int(xs.sum())
    m01 = int(ys.sum())
    m20 = int((xs * xs).sum())
    m02 = int((ys * ys).sum())
    m11 = int((xs * ys).sum())
    return (
        m00, m10, m01, m20, m02, m11,
        m00 * m20 - m10 * m10,
        m00 * m02 - m01 * m01,
        m00 * m11 - m10 * m01,
    )


def image_moments(
    images: DataFrame,
    threshold: int = 384,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, m00, m10, m01, m20, m02, m11, mu20n, mu02n, mu11n):
    exact integer raw moments and central-moment numerators (×m00) of
    the ``g3 ≥ threshold`` mask, one row per image with a non-empty
    mask."""
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _COLS}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                mom = _moments_one(arr.astype(np.int64).sum(axis=2) >= thr)
                if mom is None:
                    continue
                out["image_id"].append(image_id)
                for c, v in zip(_COLS[1:], mom):
                    out[c].append(v)
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in _COLS[1:]
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run,
        "image_id string, " + ", ".join(f"{c} long" for c in _COLS[1:]),
    )
