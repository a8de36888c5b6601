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


def chaikin_smooth(
    df: DataFrame,
    way_col: str = "way_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    iters: int = 2,
) -> DataFrame:
    """Chaikin corner-cutting polyline smoothing (public algorithm,
    Chaikin 1974) — the generalization COMPLEMENT of Douglas–Peucker:
    DP thins vertices for low zooms, Chaikin rounds corners for
    high-zoom rendering. Open-curve variant with endpoint
    preservation: each edge (P, P') yields Q = ¾P + ¼P' and
    R = ¼P + ¾P', endpoints survive unchanged.

    EXACT integer arithmetic: every iteration works in quarter units —
    Q = 3P + P', R = P + 3P', endpoints scale by 4 — so after
    ``iters`` rounds the output coordinates are the input times
    ``4^iters`` with ZERO rounding surface (the SQL oracle replays the
    iterations literally). Output sequence numbers renumber
    deterministically: P₀ → 0, edge i → (2i+1, 2i+2), P_last →
    2·last+1; a single-vertex way passes through unchanged. Input
    ``seq`` must be 0-based consecutive per way — exactly what each
    iteration emits, so the invariant is self-preserving (head 0,
    edges 1..2n−2, tail 2n−1).

    Shape: pure Catalyst — per iteration ONE per-way sort feeds both
    the lead() edge window and the max(seq) tail marker, then a
    conditional array build + explode doubles the vertex count.
    10¹² vertices partition by way; iterations are unrolled at plan
    time (iters is a literal), so lineage stays linear — no self-joins,
    no driver loop."""
    from pyspark.sql import Window, functions as F

    out = df.select(
        F.col(way_col).alias("_w"),
        F.col(seq_col).cast("long").alias("_s"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    for _ in range(int(iters)):
        w = Window.partitionBy("_w").orderBy("_s")
        wall = Window.partitionBy("_w")
        staged = out.select(
            "_w", "_s", "_x", "_y",
            F.lead("_x").over(w).alias("_nx"),
            F.lead("_y").over(w).alias("_ny"),
            F.max("_s").over(wall).alias("_last"),
        )
        pts = staged.select(
            "_w",
            F.concat(
                F.when(
                    F.col("_s") == 0,
                    F.array(
                        F.struct(
                            F.lit(0).cast("long").alias("s"),
                            (4 * F.col("_x")).alias("x"),
                            (4 * F.col("_y")).alias("y"),
                        )
                    ),
                ).otherwise(F.expr("array()").cast(
                    "array<struct<s:bigint,x:bigint,y:bigint>>")),
                F.when(
                    F.col("_nx").isNotNull(),
                    F.array(
                        F.struct(
                            (2 * F.col("_s") + 1).alias("s"),
                            (3 * F.col("_x") + F.col("_nx")).alias("x"),
                            (3 * F.col("_y") + F.col("_ny")).alias("y"),
                        ),
                        F.struct(
                            (2 * F.col("_s") + 2).alias("s"),
                            (F.col("_x") + 3 * F.col("_nx")).alias("x"),
                            (F.col("_y") + 3 * F.col("_ny")).alias("y"),
                        ),
                    ),
                ).otherwise(F.expr("array()").cast(
                    "array<struct<s:bigint,x:bigint,y:bigint>>")),
                F.when(
                    (F.col("_s") == F.col("_last")) & (F.col("_last") > 0),
                    F.array(
                        F.struct(
                            (2 * F.col("_last") + 1).alias("s"),
                            (4 * F.col("_x")).alias("x"),
                            (4 * F.col("_y")).alias("y"),
                        )
                    ),
                ).otherwise(F.expr("array()").cast(
                    "array<struct<s:bigint,x:bigint,y:bigint>>")),
            ).alias("_pts"),
        )
        out = pts.select(
            "_w", F.explode("_pts").alias("_p")
        ).select(
            "_w",
            F.col("_p.s").alias("_s"),
            F.col("_p.x").alias("_x"),
            F.col("_p.y").alias("_y"),
        )
    return out.select(
        F.col("_w").alias(way_col),
        F.col("_s").alias(seq_col),
        F.col("_x").alias(x_col),
        F.col("_y").alias(y_col),
    )
