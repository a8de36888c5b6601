"""Per-group convex hulls — footprint polygons for point sets.

The standard "activity area" / capture-footprint summarizer: the convex
hull of each group's points (a user's image capture locations, a zone's
detections). Output is the STRICT hull — extreme points only, collinear
boundary points dropped — in a canonical order: counterclockwise starting
at the lexicographically smallest (lon, lat) vertex (Andrew's monotone
chain, public algorithm).

Spark shape — hulls COMBINE (hull(A ∪ B) = hull(hull(A) ∪ hull(B))), so
the operator is a two-stage aggregate, the same algebra as a map-side
combine:

1. stage 1 (``mapInPandas`` over the input's existing partitioning, no
   shuffle): each task reduces its batch-local slice of every group to
   that slice's partial hull — output is O(hull size) per (group, task),
   so the one exchange that follows carries hull candidates, never the
   raw points;
2. stage 2: groupBy(key) + collect over the partial-hull points, exact
   monotone chain per group, posexplode to (key, vertex_idx, lon, lat).

A group with 10^9 points in one cell still works: stage 1 bounds what
crosses the wire (hulls of real point clouds are tiny — O(log n) expected
vertices for most distributions), and stage 2's per-group input is the
union of per-task hulls, not the corpus. Coordinates pass through
untouched (the kernel selects input points, never recomputes them), so
closed-form synthetic inputs stay bit-identical across engines.

Geometry note: the hull is computed in PLANAR (lon, lat) space — correct
for the regional footprints this engine targets; antimeridian-straddling
or polar groups need a local projection upstream (same caveat as the
reference's planar ring operators, plugins/navteq/navteq.hpp:675-692).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def hull_indices(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain strict hull of an (n, 2) array → indices into the
    LEX-SORTED UNIQUE points, CCW from the lexicographically smallest.
    Degenerate inputs: 1 point → itself; all-collinear → the two extreme
    endpoints (a 2-vertex "hull"), matching the strict-hull rule."""
    p = np.unique(pts, axis=0)  # unique rows, already lex-sorted
    n = len(p)
    if n == 1:
        return p
    lower: list[int] = []
    for i in range(n):
        while len(lower) >= 2 and _cross(p[lower[-2]], p[lower[-1]], p[i]) <= 0:
            lower.pop()
        lower.append(i)
    upper: list[int] = []
    for i in range(n - 1, -1, -1):
        while len(upper) >= 2 and _cross(p[upper[-2]], p[upper[-1]], p[i]) <= 0:
            upper.pop()
        upper.append(i)
    if len(lower) == 2 and len(upper) == 2 and n == 2:
        return p  # two points: single segment
    idx = lower[:-1] + upper[:-1]
    if len(idx) < 2:  # all points identical after unique (n==1 handled)
        idx = lower
    return p[idx]


def _hull_of(lons, lats) -> np.ndarray:
    pts = np.column_stack(
        [np.asarray(lons, dtype=np.float64), np.asarray(lats, dtype=np.float64)]
    )
    return hull_indices(pts)


_PARTIAL_SCHEMA_FIELDS = [
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
]


def _partial_kernel(key_field: StructField):
    schema = StructType([key_field, *_PARTIAL_SCHEMA_FIELDS])
    key = key_field.name

    def _k(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # reduce across the WHOLE task, not per Arrow batch: fold each
        # batch into a per-key running hull (hull(A ∪ B) = hull(hull(A)
        # ∪ B)), emit once — per-key state is O(hull size), and the
        # exchange sees one partial hull per (key, task)
        acc: dict = {}
        for pdf in batches:
            for g, grp in pdf.groupby(key, sort=False):
                pts = np.column_stack(
                    [grp["lon"].to_numpy(np.float64), grp["lat"].to_numpy(np.float64)]
                )
                prev = acc.get(g)
                if prev is not None:
                    pts = np.vstack([prev, pts])
                acc[g] = hull_indices(pts)
        outs = [
            pd.DataFrame({key: g, "lon": h[:, 0], "lat": h[:, 1]})
            for g, h in acc.items()
        ]
        yield pd.concat(outs) if outs else pd.DataFrame(
            {key: pd.Series(dtype=object), "lon": [], "lat": []}
        )

    return _k, schema


def convex_hulls(
    pts: DataFrame,
    key_col: str = "key",
    two_stage: bool = True,
) -> DataFrame:
    """(key, vertex_idx, lon, lat) hull vertices per group, CCW from the
    lexicographically smallest vertex. ``two_stage=False`` skips the
    map-side partial hulls (oracle/debug path — one shuffle of raw
    points); results are identical (tested), only the wire volume
    differs."""
    key_field = pts.schema[key_col]
    src = pts.select(key_col, "lon", "lat")
    if two_stage:
        kernel, schema = _partial_kernel(key_field)
        src = src.mapInPandas(kernel, schema)

    agg = src.groupBy(key_col).agg(
        F.collect_list(F.struct("lon", "lat")).alias("_p")
    )

    out_fields = StructType(
        [
            key_field,
            StructField("verts", ArrayType(ArrayType(DoubleType()))),
        ]
    )

    def _final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks, vs = [], []
            for k, plist in zip(pdf[key_col], pdf["_p"]):
                lons = [p["lon"] for p in plist]
                lats = [p["lat"] for p in plist]
                h = _hull_of(lons, lats)
                ks.append(k)
                vs.append([[float(x), float(y)] for x, y in h])
            yield pd.DataFrame({key_col: ks, "verts": vs})

    return (
        agg.mapInPandas(_final, out_fields)
        .select(key_col, F.posexplode("verts").alias("vertex_idx", "_v"))
        .select(
            key_col,
            "vertex_idx",
            F.col("_v").getItem(0).alias("lon"),
            F.col("_v").getItem(1).alias("lat"),
        )
    )
