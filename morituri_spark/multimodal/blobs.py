"""Blob analysis — per-image connected-component labeling of a
thresholded mask, emitting exact integer component statistics (object
counting / size-filter gates for vision data pipelines).

Semantics contract (engine-stable, SQL-replayable):

- mask = pixels with 3×-gray ``g3 = r+g+b >= threshold`` (the exact
  integer gate shared with enhance.py/edges.py);
- 4-connectivity;
- a component's LABEL is the smallest row-major pixel index
  ``y·W + x`` it contains — a total deterministic naming that needs no
  tie rule and that a min-label-propagation oracle (recursive CTE, the
  dbscan_points evidence class) reproduces exactly.

The kernel labels by vectorized min-label propagation (shift-min over
the four neighbors until fixpoint): iterations are bounded by the
longest geodesic path inside a component — fine for tile-sized images,
and the module contract for giant rasters is the engine's standard one:
TILE FIRST (enhance.py's tiling note), then merge cross-tile components
through the distributed large-star/small-star CC machinery on the
(tile-border pixel, label) edge relation — labels are row-major pixel
ids, so cross-tile minimums compose.

Scale shape: one scan-shaped Arrow kernel, pixels never leave the task;
the output is components (≪ pixels), all-integer.

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), the region sibling of edges.py's boundary
kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode

_BIG = np.int64(1) << 40


def _label_components(mask: np.ndarray) -> np.ndarray:
    """4-connected min-label propagation; labels are row-major pixel
    indices, non-mask pixels get -1."""
    h, w = mask.shape
    lbl = np.where(mask, np.arange(h * w, dtype=np.int64).reshape(h, w), _BIG)
    while True:
        nxt = lbl.copy()
        nxt[1:, :] = np.minimum(nxt[1:, :], lbl[:-1, :])
        nxt[:-1, :] = np.minimum(nxt[:-1, :], lbl[1:, :])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], lbl[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], lbl[:, 1:])
        nxt = np.where(mask, nxt, _BIG)
        if np.array_equal(nxt, lbl):
            break
        lbl = nxt
    return np.where(mask, lbl, np.int64(-1))


def blob_stats(
    images: DataFrame,
    threshold: int = 384,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, label, n_pixels, min_x, min_y, max_x, max_y, sum_x,
    sum_y): one row per 4-connected component of the ``g3 >= threshold``
    mask; ``label`` is the component's smallest row-major pixel index.
    All columns are exact integers."""
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "image_id", "label", "n_pixels", "min_x", "min_y",
                    "max_x", "max_y", "sum_x", "sum_y",
                )
            }
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                lbl = _label_components(g3 >= thr)
                flat = lbl.ravel()
                sel = flat >= 0
                if not sel.any():
                    continue
                hh, ww = g3.shape
                ys, xs = np.divmod(np.arange(hh * ww, dtype=np.int64), ww)
                labs = flat[sel]
                xs, ys = xs[sel], ys[sel]
                order = np.argsort(labs, kind="stable")
                labs, xs, ys = labs[order], xs[order], ys[order]
                uniq, starts = np.unique(labs, return_index=True)
                ends = np.append(starts[1:], len(labs))
                for u, s, e in zip(uniq, starts, ends):
                    out["image_id"].append(image_id)
                    out["label"].append(int(u))
                    out["n_pixels"].append(int(e - s))
                    out["min_x"].append(int(xs[s:e].min()))
                    out["min_y"].append(int(ys[s:e].min()))
                    out["max_x"].append(int(xs[s:e].max()))
                    out["max_y"].append(int(ys[s:e].max()))
                    out["sum_x"].append(int(xs[s:e].sum()))
                    out["sum_y"].append(int(ys[s:e].sum()))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        k: np.asarray(out[k], dtype=np.int64)
                        for k in (
                            "label", "n_pixels", "min_x", "min_y",
                            "max_x", "max_y", "sum_x", "sum_y",
                        )
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run,
        "image_id string, label long, n_pixels long, min_x long, min_y long,"
        " max_x long, max_y long, sum_x long, sum_y long",
    )
