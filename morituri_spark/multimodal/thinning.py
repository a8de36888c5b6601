"""Zhang-Suen thinning — per-image morphological skeletonization of the
thresholded mask (the stroke-extraction primitive under OCR cleanup,
road-raster vectorization, and fingerprint/shape matching).

Semantics contract (engine-stable, SQL-replayable):

- mask = pixels with ``g3 = r+g+b ≥ threshold`` (the family gate),
  outside-is-0 border convention (shared with morphology.py);
- the operator applies EXACTLY ``n_steps`` SUB-ITERATIONS of the
  published Zhang-Suen (1984) algorithm, alternating phase 1 / phase 2
  starting with phase 1. A pixel p=1 is deleted in a sub-iteration iff
  (all evaluated on the state at the START of that sub-iteration —
  deletions within a sub-iteration are simultaneous):

  * 2 ≤ B(p) ≤ 6, where B = Σ of the 8 neighbors,
  * A(p) = 1, where A counts 0→1 transitions in the circular neighbor
    ring P2,P3,…,P9,P2 (P2=N, P3=NE, P4=E, P5=SE, P6=S, P7=SW, P8=W,
    P9=NW — the paper's ordering),
  * phase 1: P2·P4·P6 = 0 and P4·P6·P8 = 0;
    phase 2: P2·P4·P8 = 0 and P2·P6·P8 = 0;

- a FIXED step budget (instead of run-to-convergence) keeps the output
  a pure function of the input in both engines — the oracle unrolls the
  same ``n_steps`` stages as MATERIALIZED CTEs (CLAUDE.md rule 27: each
  stage self-joins its predecessor twice, so inlining would re-read the
  base exponentially). For 16×16 fixtures 8 sub-iterations is past the
  fixpoint; callers with larger strokes raise ``n_steps``;
- output per image: populations before/after, total deleted, and the
  position-weighted membership checksum Σ (y·W + x + 1) over the
  skeleton — a single shifted pixel flips it.

Scale shape: one scan-shaped Arrow kernel; pixels never leave the task
and the output is one row per image. Giant rasters follow the module
tiling contract with an ``n_steps``-pixel halo (each sub-iteration is
1-local, so n sub-iterations are n-local) — the halo is re-exchanged
per tile pass, the price of an inherently iterative stencil.

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), sibling of morphology.py (this is the iterated,
condition-gated erosion).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode

#: (dy, dx) of P2..P9 in the paper's circular order N, NE, E, SE, S, SW,
#: W, NW — shared by the kernel, the tests, and the oracle generator.
RING: tuple[tuple[int, int], ...] = (
    (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1),
)


def zhang_suen_step(m: np.ndarray, phase: int) -> np.ndarray:
    """One sub-iteration (phase 0 = the paper's phase 1) on a 0/1 int
    array, outside-is-0; returns the new array."""
    h, w = m.shape
    p = np.zeros((h + 2, w + 2), dtype=np.int64)
    p[1:-1, 1:-1] = m
    nb = [p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] for dy, dx in RING]
    b = sum(nb)
    a = sum(
        ((nb[k] == 0) & (nb[(k + 1) % 8] == 1)).astype(np.int64)
        for k in range(8)
    )
    p2, p4, p6, p8 = nb[0], nb[2], nb[4], nb[6]
    if phase == 0:
        g1 = (p2 * p4 * p6) == 0
        g2 = (p4 * p6 * p8) == 0
    else:
        g1 = (p2 * p4 * p8) == 0
        g2 = (p2 * p6 * p8) == 0
    kill = (m == 1) & (b >= 2) & (b <= 6) & (a == 1) & g1 & g2
    out = m.copy()
    out[kill] = 0
    return out


def _chk(m: np.ndarray) -> int:
    ys, xs = np.nonzero(m)
    return int((ys * m.shape[1] + xs + 1).sum())


def thinning_stats(
    images: DataFrame,
    threshold: int = 384,
    n_steps: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, n_mask, n_skel, n_deleted, chk_skel): exact stats of
    the mask after exactly ``n_steps`` Zhang-Suen sub-iterations."""
    thr = int(threshold)
    steps = int(n_steps)
    if steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {steps}")
    cols = ("image_id", "n_mask", "n_skel", "n_deleted", "chk_skel")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in cols}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                m = (arr.astype(np.int64).sum(axis=2) >= thr).astype(np.int64)
                n_mask = int(m.sum())
                for k in range(steps):
                    m = zhang_suen_step(m, k % 2)
                n_skel = int(m.sum())
                out["image_id"].append(image_id)
                out["n_mask"].append(n_mask)
                out["n_skel"].append(n_skel)
                out["n_deleted"].append(n_mask - n_skel)
                out["chk_skel"].append(_chk(m))
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
        "image_id string, n_mask long, n_skel long, n_deleted long,"
        " chk_skel long",
    )
