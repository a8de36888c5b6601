"""Chamfer distance transform — per-image integer distance-to-mask with
the classic 3-4 chamfer metric (Borgefors 1986), emitted as an exact
per-distance histogram with membership checksums (the proximity-field
primitive behind mask dilation costs, seam carving guards, and
nearest-object features in vision pipelines).

ALL-INTEGER contract (engine-stable, SQL-replayable):

- mask = pixels with ``g3 = r+g+b >= threshold`` (the module-family
  gate shared with blobs/morphology/edges);
- distance = minimum over 8-connected paths from any mask pixel of
  3·(#orthogonal steps) + 4·(#diagonal steps) — chamfer 3-4, the best
  small-integer approximation of 3×Euclidean;
- output per (image, distance) level: the pixel count and the
  position-weighted membership checksum Σ (y·W + x + 1) — a single
  shifted pixel flips it;
- images with an empty mask emit nothing (every distance is infinite).

The kernel computes the transform by vectorized min-plus relaxation
(shift-min over the 8 neighbors with +3/+4 edge costs until fixpoint) —
iterations bounded by the grid diameter; the SQL oracle re-derives the
same field as shortest paths via a recursive CTE over the weighted
neighbor graph (capped at the grid's diameter bound), an INDEPENDENT
formulation of the same metric.

Scale shape: one scan-shaped Arrow kernel; pixels never leave the task
and the output is ≤ diameter rows per image. Giant rasters follow the
engine's tiling contract: chamfer relaxation composes across tiles by
exchanging 1-pixel halos until cross-tile fixpoint (same discipline as
blobs.py's border-merge note).

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), the proximity sibling of morphology.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode

_INF = np.int64(1) << 40


def _chamfer34(mask: np.ndarray) -> np.ndarray:
    """Exact chamfer 3-4 field by min-plus relaxation to fixpoint;
    unreachable pixels (empty mask) stay at the _INF sentinel."""
    d = np.where(mask, np.int64(0), _INF)
    h, w = d.shape
    while True:
        nd = d.copy()
        # orthogonal (+3)
        nd[1:, :] = np.minimum(nd[1:, :], d[:-1, :] + 3)
        nd[:-1, :] = np.minimum(nd[:-1, :], d[1:, :] + 3)
        nd[:, 1:] = np.minimum(nd[:, 1:], d[:, :-1] + 3)
        nd[:, :-1] = np.minimum(nd[:, :-1], d[:, 1:] + 3)
        # diagonal (+4)
        nd[1:, 1:] = np.minimum(nd[1:, 1:], d[:-1, :-1] + 4)
        nd[1:, :-1] = np.minimum(nd[1:, :-1], d[:-1, 1:] + 4)
        nd[:-1, 1:] = np.minimum(nd[:-1, 1:], d[1:, :-1] + 4)
        nd[:-1, :-1] = np.minimum(nd[:-1, :-1], d[1:, 1:] + 4)
        if np.array_equal(nd, d):
            return d
        d = nd


def chamfer_histogram(
    images: DataFrame,
    threshold: int = 384,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, dist, n_pixels, chk_pos): per image and chamfer-3-4
    distance level, the exact pixel population and membership checksum
    Σ (y·W + x + 1). ``dist = 0`` rows are the mask itself."""
    thr = int(threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("image_id", "dist", "n_pixels", "chk_pos")}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                mask = arr.astype(np.int64).sum(axis=2) >= thr
                if not mask.any():
                    continue
                d = _chamfer34(mask).ravel()
                pid1 = np.arange(d.size, dtype=np.int64) + 1
                order = np.argsort(d, kind="stable")
                ds, ps = d[order], pid1[order]
                uniq, starts = np.unique(ds, return_index=True)
                ends = np.append(starts[1:], len(ds))
                for u, s, e in zip(uniq, starts, ends):
                    out["image_id"].append(image_id)
                    out["dist"].append(int(u))
                    out["n_pixels"].append(int(e - s))
                    out["chk_pos"].append(int(ps[s:e].sum()))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("dist", "n_pixels", "chk_pos")
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, dist long, n_pixels long, chk_pos long"
    )
