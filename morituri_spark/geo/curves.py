"""Polyline curve operators G2-G8 (SURVEY.md §2.7) — NumPy kernels.

Ports /root/reference/plugins/ogr_util.hpp:82-163 (move_point, cut_front,
cut_back, cut_caps, create_offset_curve) and the house-number interpolation
builder (navteq.hpp:536-579). GEOS isn't in this container, so the
single-sided offset is re-implemented directly: per-segment perpendicular
offset + miter joins (capped, beveled when near-parallel) — coordinates
differ from GEOS's arc joins at convex corners by < the offset magnitude
(5e-5°), which is inside the reference's own tolerance for these
synthesized address lines. Everything runs inside Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

CUT_RATIO = 0.1          # ogr_util.hpp:129
MAX_CUT = 0.00025        # ogr_util.hpp:130
HOUSE_OFFSET = 0.00005   # navteq.hpp:546


def move_point(moving, reference, move_distance: float):
    """Intercept theorem (ogr_util.hpp:82-94): slide ``moving`` toward
    ``reference`` by ``move_distance`` (must be < segment length)."""
    moving = np.asarray(moving, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)
    distance = float(np.hypot(*(reference - moving)))
    assert move_distance < distance, "move_distance must be < segment length"
    ratio = move_distance / distance
    return moving + ratio * (reference - moving)


def _seg_lengths(coords: np.ndarray) -> np.ndarray:
    d = np.diff(coords, axis=0)
    return np.hypot(d[:, 0], d[:, 1])


def cut_front(cut: float, coords: np.ndarray) -> np.ndarray:
    """Trim ``cut`` arc-length off the front (ogr_util.hpp:97-107): drop
    whole vertices, then interpolate the partial remainder."""
    coords = np.asarray(coords, dtype=np.float64).copy()
    node_distance = float(np.hypot(*(coords[1] - coords[0])))
    while cut >= node_distance:
        coords = coords[1:]
        cut -= node_distance
        node_distance = float(np.hypot(*(coords[1] - coords[0])))
    if cut > 0:
        coords[0] = move_point(coords[0], coords[1], cut)
    return coords


def cut_back(cut: float, coords: np.ndarray) -> np.ndarray:
    """Mirror of cut_front at the tail (ogr_util.hpp:109-123)."""
    coords = np.asarray(coords, dtype=np.float64).copy()
    node_distance = float(np.hypot(*(coords[-1] - coords[-2])))
    while cut >= node_distance:
        coords = coords[:-1]
        cut -= node_distance
        node_distance = float(np.hypot(*(coords[-1] - coords[-2])))
    if cut > 0:
        coords[-1] = move_point(coords[-1], coords[-2], cut)
    return coords


def cut_caps(coords: np.ndarray) -> np.ndarray:
    """Trim both ends by min(0.00025°, 10% of length) (ogr_util.hpp:126-139)."""
    coords = np.asarray(coords, dtype=np.float64)
    length = float(_seg_lengths(coords).sum())
    cut = min(MAX_CUT, length * CUT_RATIO)
    assert cut < length / 2, "cut must leave a positive-length line"
    return cut_back(cut, cut_front(cut, coords))


def offset_curve(coords: np.ndarray, offset: float, left: bool) -> np.ndarray:
    """One-sided parallel offset (ogr_util.hpp:141-163 semantics): offset
    each segment by ``offset`` perpendicular to its direction (left of
    travel when ``left``), join consecutive segments with a capped miter
    (bevel at near-reversals), then cut_caps. The LEFT offset runs in the
    original direction; GEOS returns the RIGHT-side curve reversed — we
    keep input order for both and flag the reference's reversal at the
    house-number layer where node tagging needs it."""
    coords = np.asarray(coords, dtype=np.float64)
    d = np.diff(coords, axis=0)
    seg_len = np.hypot(d[:, 0], d[:, 1])
    ok = seg_len > 0
    d, seg_len = d[ok], seg_len[ok]
    keep = np.concatenate([[True], ok])
    coords = coords[np.nonzero(keep)[0]] if not ok.all() else coords
    # unit normals: left of travel = (-dy, dx)/len ; right = (dy, -dx)/len
    n = np.stack([-d[:, 1], d[:, 0]], axis=1) / seg_len[:, None]
    if not left:
        n = -n
    starts = coords[:-1] + offset * n
    ends = coords[1:] + offset * n
    out = [starts[0]]
    for i in range(len(starts) - 1):
        p, r = starts[i], d[i]
        q, s = starts[i + 1], d[i + 1]
        rxs = r[0] * s[1] - r[1] * s[0]
        if abs(rxs) < 1e-18:
            out.append(ends[i])  # parallel: bevel
            continue
        t = ((q - p)[0] * s[1] - (q - p)[1] * s[0]) / rxs
        joint = p + t * r
        # cap the miter at 2×offset from the original vertex (GEOS-like)
        v = joint - coords[i + 1]
        dist = float(np.hypot(*v))
        if dist > 2 * abs(offset):
            out.append(ends[i])
            out.append(starts[i + 1])
        else:
            out.append(joint)
    out.append(ends[-1])
    return cut_caps(np.asarray(out))


# ---------------------------------------------------------------------------
# G8: house-number interpolation ways (navteq.hpp:536-579)
# ---------------------------------------------------------------------------

HOUSE_NODE_SCHEMA = StructType(
    [
        StructField("link_id", LongType(), False),
        StructField("side", StringType(), False),
        StructField("node_seq", IntegerType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField("housenumber", StringType(), True),
        StructField("interpolation", StringType(), False),
    ]
)


def house_number_nodes(streets: DataFrame) -> DataFrame:
    """One row per interpolation-way node: offset curve left (L_*) and right
    (R_*), first node housenumber=REFADDR, last=NREFADDR, way tag
    addr:interpolation=even|odd (P9 gating: ADDR_TYPE=='B', non-empty
    ref/nref/schema, schema != 'M' — navteq.hpp:536-544, 631-633)."""
    src = streets.select(
        "LINK_ID", "geometry", "ADDR_TYPE",
        "L_REFADDR", "L_NREFADDR", "L_ADDRSCH",
        "R_REFADDR", "R_NREFADDR", "R_ADDRSCH",
    ).where(F.col("ADDR_TYPE") == "B")

    cols = ["LINK_ID", "geometry",
            "L_REFADDR", "L_NREFADDR", "L_ADDRSCH",
            "R_REFADDR", "R_NREFADDR", "R_ADDRSCH"]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in HOUSE_NODE_SCHEMA.fields}
            # zip of column arrays, not iterrows (no per-row Series build)
            for link_id, geometry, lref, lnref, lsch, rref, rnref, rsch in zip(
                *(pdf[c] for c in cols)
            ):
                r = {"LINK_ID": link_id,
                     "L_REFADDR": lref, "L_NREFADDR": lnref, "L_ADDRSCH": lsch,
                     "R_REFADDR": rref, "R_NREFADDR": rnref, "R_ADDRSCH": rsch}
                geom = np.asarray([list(p) for p in geometry], dtype=np.float64)
                for side, left in (("L", True), ("R", False)):
                    ref = r[f"{side}_REFADDR"]
                    nref = r[f"{side}_NREFADDR"]
                    schema = r[f"{side}_ADDRSCH"]
                    if not ref or not nref or not schema or schema == "M":
                        continue
                    interp = {"E": "even", "O": "odd"}.get(schema, "")
                    try:
                        off = offset_curve(geom, HOUSE_OFFSET, left)
                    except AssertionError:
                        continue  # degenerate line — reference would abort too
                    for i, (x, y) in enumerate(off):
                        rows["link_id"].append(r["LINK_ID"])
                        rows["side"].append(side)
                        rows["node_seq"].append(i)
                        rows["lon"].append(x)
                        rows["lat"].append(y)
                        rows["housenumber"].append(
                            ref if i == 0 else (nref if i == len(off) - 1 else None)
                        )
                        rows["interpolation"].append(interp)
            yield pd.DataFrame(rows)

    return src.mapInPandas(build, HOUSE_NODE_SCHEMA)


def house_number_ways(streets: DataFrame) -> DataFrame:
    """Collapse the node rows into one way row per (link, side)."""
    nodes = house_number_nodes(streets)
    return (
        nodes.groupBy("link_id", "side")
        .agg(
            F.first("interpolation").alias("addr_interpolation"),
            F.min(F.when(F.col("node_seq") == 0, F.col("housenumber"))).alias("ref_housenumber"),
            F.max(F.when(F.col("housenumber").isNotNull() & (F.col("node_seq") > 0), F.col("housenumber"))).alias("nref_housenumber"),
            F.count(F.lit(1)).alias("n_nodes"),
            F.sort_array(F.collect_list(F.struct("node_seq", "lon", "lat"))).alias("way_nodes"),
        )
    )
