"""Harris corner detection — per-image ALL-INTEGER corner response and
top-k corner extraction (the keypoint primitive for image registration /
capture-dedup pipelines: corners are what you match before estimating a
homography).

ALL-INTEGER contract (engine-stable, SQL-replayable):

- gradients Ix, Iy are the classic Sobel stencils on 3×-gray
  ``g3 = r+g+b`` (the exact convention of edges.py — same stencil, same
  interior-only domain);
- the structure tensor window sums Sxx = Σ Ix², Syy = Σ Iy²,
  Sxy = Σ IxIy run over the full 3×3 box, defined where all nine
  gradient neighbors exist (y, x ∈ [2, h-3]);
- the response is Harris' R = det(M) − k·trace(M)² with k = 1/20,
  kept integer as  ``r20 = 20·(Sxx·Syy − Sxy²) − (Sxx + Syy)²``
  (magnitudes stay < 2⁶³ for any 8-bit image: |I| ≤ 4·765, so
  S ≤ 9·(4·765)² < 2²⁷ and r20 < 20·2⁵⁴ⁱˢʰ… bounded at ≈1.4e17);
- corners are the top ``k`` pixels per image by the TOTAL deterministic
  order (r20 DESC, y ASC, x ASC) with r20 > 0 — no float, no tie
  ambiguity, so a SQL row_number() replay selects identical pixels.

Scale shape: one scan-shaped Arrow kernel; pixels never leave the task
and the output is k rows per image. Giant rasters follow the module's
standard tiling contract (2-pixel halo — Sobel+window is 2-local).

Reference scope: no counterpart in morituri; multimodal extension
family (SURVEY.md §2), sibling of edges.py (this module keeps the
gradient, edges.py keeps only its magnitude).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .ops import _decode


def _sobel(g3: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(Ix, Iy) on interior pixels (h-2, w-2), edges.py's stencil."""
    gx = (
        -g3[:-2, :-2] + g3[:-2, 2:]
        - 2 * g3[1:-1, :-2] + 2 * g3[1:-1, 2:]
        - g3[2:, :-2] + g3[2:, 2:]
    )
    gy = (
        -g3[:-2, :-2] - 2 * g3[:-2, 1:-1] - g3[:-2, 2:]
        + g3[2:, :-2] + 2 * g3[2:, 1:-1] + g3[2:, 2:]
    )
    return gx, gy


def _box3(a: np.ndarray) -> np.ndarray:
    """3×3 box sum, valid-only (shrinks each axis by 2)."""
    out = np.zeros((a.shape[0] - 2, a.shape[1] - 2), dtype=a.dtype)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out += a[dy : dy + out.shape[0], dx : dx + out.shape[1]]
    return out


def harris_corners(
    images: DataFrame,
    k: int = 5,
    deterministic_fake: bool = False,
) -> DataFrame:
    """→ (image_id, rank, y, x, r20): the top-``k`` Harris corners per
    image by integer response ``r20 = 20·det(M) − trace(M)²`` (k=1/20),
    ranked by (r20 DESC, y ASC, x ASC), positive responses only."""
    kk = int(k)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("image_id", "rank", "y", "x", "r20")}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                if g3.shape[0] < 5 or g3.shape[1] < 5:
                    continue
                ix, iy = _sobel(g3)
                sxx = _box3(ix * ix)
                syy = _box3(iy * iy)
                sxy = _box3(ix * iy)
                r20 = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
                hh, ww = r20.shape
                ys, xs = np.divmod(np.arange(hh * ww, dtype=np.int64), ww)
                flat = r20.ravel()
                pos = flat > 0
                if not pos.any():
                    continue
                ys, xs, flat = ys[pos] + 2, xs[pos] + 2, flat[pos]
                # total order (r20 DESC, y ASC, x ASC): lexsort keys are
                # last-key-primary, and (y, x) ascending is the ravel
                # order, preserved by a stable sort on -r20
                order = np.argsort(-flat, kind="stable")[:kk]
                for r, j in enumerate(order, start=1):
                    out["image_id"].append(image_id)
                    out["rank"].append(r)
                    out["y"].append(int(ys[j]))
                    out["x"].append(int(xs[j]))
                    out["r20"].append(int(flat[j]))
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("rank", "y", "x", "r20")
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, rank long, y long, x long, r20 long"
    )


#: FAST radius-3 Bresenham circle, clockwise from 12 o'clock — the
#: published segment-test order (Rosten & Drummond 2006): (dx, dy).
FAST_CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
    (-1, -3),
]


def fast_corners(
    images: DataFrame,
    t: int = 30,
    arc: int = 9,
    deterministic_fake: bool = False,
) -> DataFrame:
    """FAST-``arc`` segment-test corners (Rosten & Drummond 2006) on 3×-gray
    ``g3 = r+g+b`` — per image, how many interior pixels have ≥ ``arc``
    CONTIGUOUS radius-3 circle pixels all brighter than ``g3+t`` (or all
    darker than ``g3−t``), plus membership checksums.

    ALL-INTEGER arc test, shared bit-for-bit with the SQL oracle: the 16
    circle comparisons pack into a bitmask ``m``; doubling it as
    ``m · 65537 = m | (m << 16)`` makes every CIRCULAR window a plain
    shift, so a contiguous arc exists iff
    ``((m·65537) >> s) & (2^arc − 1) = 2^arc − 1`` for some s ∈ 0..15 —
    a 16-term OR both engines evaluate identically, no wraparound
    branch anywhere.

    → (image_id, n_corners, n_bright, n_dark, chk_yx) with
    ``chk_yx = Σ (y·w + x)`` over corner pixels (membership-sensitive);
    images too small for the radius-3 interior emit a zero row.

    Scale shape: one scan-shaped Arrow kernel, one aggregate row per
    image; giant rasters follow the module's tiling contract with a
    3-pixel halo (the segment test is 3-local).
    """
    tt, aa = int(t), int(arc)
    if not 2 <= aa <= 16:
        raise ValueError(f"arc must be in [2, 16], got {aa}")
    mask_val = (1 << aa) - 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                c: []
                for c in ("image_id", "n_corners", "n_bright", "n_dark",
                          "chk_yx")
            }
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                hh, ww = g3.shape[0] - 6, g3.shape[1] - 6
                if hh <= 0 or ww <= 0:
                    out["image_id"].append(image_id)
                    for c in ("n_corners", "n_bright", "n_dark", "chk_yx"):
                        out[c].append(0)
                    continue
                center = g3[3 : 3 + hh, 3 : 3 + ww]
                bmask = np.zeros((hh, ww), dtype=np.int64)
                dmask = np.zeros((hh, ww), dtype=np.int64)
                for j, (dx, dy) in enumerate(FAST_CIRCLE):
                    ring = g3[3 + dy : 3 + dy + hh, 3 + dx : 3 + dx + ww]
                    bmask |= (ring > center + tt).astype(np.int64) << j
                    dmask |= (ring < center - tt).astype(np.int64) << j
                be, de = bmask * 65537, dmask * 65537
                bright = np.zeros((hh, ww), dtype=bool)
                dark = np.zeros((hh, ww), dtype=bool)
                for s in range(16):
                    bright |= (be >> s) & mask_val == mask_val
                    dark |= (de >> s) & mask_val == mask_val
                corner = bright | dark
                ys, xs = np.nonzero(corner)
                out["image_id"].append(image_id)
                out["n_corners"].append(int(corner.sum()))
                out["n_bright"].append(int(bright.sum()))
                out["n_dark"].append(int(dark.sum()))
                out["chk_yx"].append(
                    int(((ys + 3) * g3.shape[1] + (xs + 3)).sum())
                )
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("n_corners", "n_bright", "n_dark", "chk_yx")
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run,
        "image_id string, n_corners long, n_bright long, n_dark long,"
        " chk_yx long",
    )


def _brief_pattern(n_bits: int, patch: int) -> list:
    """Deterministic BRIEF sampling pairs ((ay, ax), (by, bx)) inside the
    ``patch``-radius square — closed-form modular offsets (both engines
    carry them as literals), degenerate equal pairs nudged."""
    span = 2 * patch + 1
    pat = []
    for j in range(n_bits):
        a = ((j * 5) % span - patch, (j * 7 + 3) % span - patch)
        b = ((j * 11 + 1) % span - patch, (j * 13 + 5) % span - patch)
        while a == b:
            b = (b[0], (b[1] + 1 + patch) % span - patch)
        pat.append((a, b))
    return pat


def brief_descriptors(
    images: DataFrame,
    k: int = 5,
    n_bits: int = 56,
    patch: int = 4,
    deterministic_fake: bool = False,
) -> DataFrame:
    """BRIEF binary descriptors (Calonder et al. 2010) at the top-``k``
    Harris corners per image: bit j = 1 iff ``g3[p+a_j] < g3[p+b_j]``
    for the pinned deterministic sampling pattern
    (:func:`_brief_pattern`) — packed into ONE int64 (``n_bits ≤ 56``
    keeps every value positive in both engines; SQL has no unsigned
    shift on the build side).

    Corners are Harris' total order (r20 DESC, y, x) restricted to the
    patch-interior domain (y, x ∈ [max(2, patch), dim−1−max(2, patch)])
    so every sample lands in-image. → (image_id, rank, y, x, desc).

    The keypoint → descriptor → Hamming-match pipeline composes this
    with ml/hamming.hamming_near_duplicates — the registration
    candidate generator for capture-dedup.

    Scale shape: one scan-shaped Arrow kernel, ≤ k rows per image;
    matching inherits the Hamming block join's pigeonhole bounds.
    """
    kk, nb, pp = int(k), int(n_bits), int(patch)
    if not 1 <= nb <= 56:
        raise ValueError(f"n_bits must be in [1, 56], got {nb}")
    pat = _brief_pattern(nb, pp)
    lo = max(2, pp)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("image_id", "rank", "y", "x", "desc")}
            for image_id, payload, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr = _decode(
                    bytes(payload), fmt, int(w), int(h), deterministic_fake
                )
                g3 = arr.astype(np.int64).sum(axis=2)
                H, W = g3.shape
                if H < 2 * lo + 1 or W < 2 * lo + 1:
                    continue
                ix, iy = _sobel(g3)
                sxx = _box3(ix * ix)
                syy = _box3(iy * iy)
                sxy = _box3(ix * iy)
                r20 = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
                hh, ww = r20.shape
                ys, xs = np.divmod(np.arange(hh * ww, dtype=np.int64), ww)
                ys, xs = ys + 2, xs + 2
                flat = r20.ravel()
                keep = (
                    (flat > 0)
                    & (ys >= lo) & (ys <= H - 1 - lo)
                    & (xs >= lo) & (xs <= W - 1 - lo)
                )
                ys, xs, flat = ys[keep], xs[keep], flat[keep]
                if not len(flat):
                    continue
                order = np.argsort(-flat, kind="stable")[:kk]
                for r, j in enumerate(order, start=1):
                    y, x = int(ys[j]), int(xs[j])
                    desc = 0
                    for bit, ((ay, ax), (by, bx)) in enumerate(pat):
                        if g3[y + ay, x + ax] < g3[y + by, x + bx]:
                            desc |= 1 << bit
                    out["image_id"].append(image_id)
                    out["rank"].append(r)
                    out["y"].append(y)
                    out["x"].append(x)
                    out["desc"].append(desc)
            yield pd.DataFrame(
                {
                    "image_id": pd.array(out["image_id"], dtype="string"),
                    **{
                        c: np.asarray(out[c], dtype=np.int64)
                        for c in ("rank", "y", "x", "desc")
                    },
                }
            )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, "image_id string, rank long, y long, x long, desc long"
    )
