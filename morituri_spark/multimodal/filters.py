"""Nonlinear filters — per-image 3×3 MEDIAN filtering with exact
position-weighted output stats, and integer SAD template matching (the
denoise-then-locate primitives of scan cleanup and patch-dedup
pipelines: median kills salt-and-pepper noise exactly, SAD finds where
a known patch sits).

ALL-INTEGER contract (engine-stable, SQL-replayable):

- gray is ``g3 = r+g+b`` (0..765), the family convention;
- the median filter runs on the VALID interior domain
  (y, x ∈ [1, h−2]×[1, w−2], where all nine neighbors exist) and takes
  the 5th-smallest of the nine integer g3 values — a pure order
  statistic, so duplicates cannot make it engine-dependent. Output is
  one exact row per image: interior population, Σ median, the
  position-weighted checksum Σ (y·W + x + 1)·median (a single changed
  pixel flips it), and min/max of the filtered field;
- template matching slides an integer template t(u, v) over every
  fully-in-bounds offset and scores SAD = Σ |g3(y0+u, x0+v) − t(u, v)|;
  the match is the argmin under the TOTAL order (sad ASC, y0 ASC,
  x0 ASC) — deterministic, one row per image. The default template is
  the closed form ``t(u, v) = ((7u + 11v + 13) · 17) % 766`` so a SQL
  oracle can regenerate it with generate_series.

Scale shape: one scan-shaped Arrow kernel each; pixels never leave the
task, outputs are one row per image. Giant rasters follow the module's
standard tiling contract: median is 1-local (1-pixel halo); template
matching is (th−1, tw−1)-local (halo = template extent), with the
per-tile argmins reduced by the same total order — ``min_by(struct(sad,
y0, x0))`` is map-side combinable, so the cross-tile reduce is one
partial aggregate, not a sort.

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), sibling of morphology.py (rank filters: erode /
median / dilate are ranks 0 / 4 / 8 of the same 3×3 window) and
corners.py (keypoint location under a pinned total order).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode


def default_template(th: int = 4, tw: int = 4) -> np.ndarray:
    """The SQL-replayable closed-form template in the g3 domain."""
    us, vs = np.mgrid[0:th, 0:tw]
    return (((7 * us + 11 * vs + 13) * 17) % 766).astype(np.int64)


def _median3(g3: np.ndarray) -> np.ndarray:
    """3×3 median on the valid interior (shrinks each axis by 2)."""
    h, w = g3.shape
    stack = np.stack(
        [
            g3[dy : dy + h - 2, dx : dx + w - 2]
            for dy in (0, 1, 2)
            for dx in (0, 1, 2)
        ]
    )
    # 5th smallest of 9 = index 4 after a partial sort along axis 0
    return np.partition(stack, 4, axis=0)[4]


def _sad_best(g3: np.ndarray, t: np.ndarray) -> tuple[int, int, int] | None:
    """(y0, x0, sad) minimizing SAD under (sad, y0, x0) — None if the
    template does not fit."""
    h, w = g3.shape
    th, tw = t.shape
    if th > h or tw > w:
        return None
    best = None
    # vectorized over offsets: build the (h-th+1, w-tw+1) SAD field
    sad = np.zeros((h - th + 1, w - tw + 1), dtype=np.int64)
    for u in range(th):
        for v in range(tw):
            sad += np.abs(g3[u : u + h - th + 1, v : v + w - tw + 1] - t[u, v])
    j = int(np.argmin(sad))  # row-major argmin = (sad, y0, x0) total order
    y0, x0 = divmod(j, sad.shape[1])
    best = (int(y0), int(x0), int(sad[y0, x0]))
    return best


def median_filter_stats(
    images: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """→ (image_id, n_interior, sum_med, chk_pos, min_med, max_med):
    exact integer stats of the 3×3-median-filtered g3 field over the
    valid interior of each image."""

    cols = ("image_id", "n_interior", "sum_med", "chk_pos", "min_med",
            "max_med")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in cols}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                hh, ww = g3.shape
                if hh < 3 or ww < 3:
                    continue
                med = _median3(g3)
                ys, xs = np.mgrid[1 : hh - 1, 1 : ww - 1]
                pos = ys * ww + xs + 1
                out["image_id"].append(image_id)
                out["n_interior"].append(med.size)
                out["sum_med"].append(int(med.sum()))
                out["chk_pos"].append(int((pos * med).sum()))
                out["min_med"].append(int(med.min()))
                out["max_med"].append(int(med.max()))
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
        "image_id string, n_interior long, sum_med long, chk_pos long,"
        " min_med long, max_med long",
    )


def template_match_sad(
    images: DataFrame,
    template: np.ndarray | None = None,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, y0, x0, sad): the best (lowest-SAD) placement of the
    integer template per image under the total order (sad, y0, x0)."""
    t = default_template() if template is None else np.asarray(
        template, dtype=np.int64
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "y0": [], "x0": [], "sad": []}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                best = _sad_best(g3, t)
                if best is None:
                    continue
                out["image_id"].append(image_id)
                out["y0"].append(best[0])
                out["x0"].append(best[1])
                out["sad"].append(best[2])
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("y0", "x0", "sad")
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, y0 long, x0 long, sad long"
    )
