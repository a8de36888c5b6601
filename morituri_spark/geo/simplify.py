"""Douglas–Peucker polyline simplification — zoom-dependent geometry thinning.

A tiling engine renders the same geometry at many zoom levels; shipping
full-resolution vertices to low zooms wastes tile bytes and rasterizer
time. Douglas–Peucker keeps the minimal vertex subset whose polyline stays
within ``eps`` of the original (public algorithm, Douglas & Peucker 1973).

Spark shape: per-geometry imperative recursion → Arrow kernel
(`mapInPandas`), one pass over each batch; no shuffle. The guarantee is
checked independently by :func:`max_deviation` (every dropped vertex lies
within eps of the simplified line), which backs the driver-contract
violations gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def dp_mask(pts: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask for an (n, 2) vertex array (endpoints always kept).
    Iterative stack — no Python recursion limits on long polylines."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        mid = pts[i + 1 : j] - pts[i]
        L2 = float(seg @ seg)
        if L2 == 0.0:
            d = np.sqrt((mid * mid).sum(axis=1))
        else:
            # perpendicular distance to the (possibly extended) chord,
            # clamped to the segment
            t = np.clip((mid @ seg) / L2, 0.0, 1.0)
            proj = np.outer(t, seg)
            d = np.sqrt(((mid - proj) ** 2).sum(axis=1))
        k = int(np.argmax(d))
        if d[k] > eps:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_np(pts: np.ndarray, eps: float) -> np.ndarray:
    return pts[dp_mask(pts, eps)]


def max_deviation(original: np.ndarray, simplified: np.ndarray) -> float:
    """Max distance from any original vertex to the simplified polyline —
    the INDEPENDENT check of the DP guarantee (≤ eps)."""
    worst = 0.0
    for p in original:
        best = np.inf
        for a, b in zip(simplified[:-1], simplified[1:]):
            seg = b - a
            L2 = float(seg @ seg)
            t = 0.0 if L2 == 0.0 else float(np.clip((p - a) @ seg / L2, 0.0, 1.0))
            d = float(np.sqrt(((p - (a + t * seg)) ** 2).sum()))
            best = min(best, d)
        worst = max(worst, best)
    return worst


def simplify_lines(
    df: DataFrame,
    eps: float,
    geom_col: str = "line",
    id_col: str = "geom_id",
) -> DataFrame:
    """(id, line array<array<double>>) → (id, simplified line). Arrow
    kernel, one pass per batch, no shuffle."""
    schema = StructType(
        [
            df.schema[id_col],
            StructField(geom_col, ArrayType(ArrayType(DoubleType())), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for line in pdf[geom_col]:
                pts = np.asarray([[float(x), float(y)] for x, y in line])
                if len(pts) < 3:
                    out.append([[float(x), float(y)] for x, y in pts])
                    continue
                simp = simplify_np(pts, eps)
                out.append([[float(x), float(y)] for x, y in simp])
            yield pd.DataFrame({id_col: pdf[id_col], geom_col: out})

    return df.select(id_col, geom_col).mapInPandas(run, schema)
