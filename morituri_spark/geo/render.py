"""Density-tile rendering — rasterize points into real PNG map tiles.

The serving end of the tiling engine: turn 10^12 point rows into a
pyramid-ready set of W×W grayscale density tiles (the raster side of the
raster↔vector join family — reference scope: morituri stops at vector
tile *assignment*; this closes the loop to rendered rasters).

Scale shape (the whole point):

1. points → occupied PIXELS in ONE map-side-combinable aggregate
   (``cell_col`` at ``tile_res + px_bits`` is pure floor/bit math inside
   whole-stage codegen). Cardinality collapses from data-bounded to
   grid-bounded at the FIRST exchange — at 10^12 points on a res-10
   pyramid the shuffle carries ≤ 2^20·W² pixel rows, not points.
2. pixels → tiles in ONE second aggregate: ``collect_list`` of at most
   W² (li, v) structs per tile plus exact integer audit sums, so
   per-group state is bounded by the tile raster (W=256 ⇒ ≤ 65536
   structs ≈ 1 MB), never by input volume.
3. the Arrow render kernel runs per TILE ROW (grid-bounded): scatter the
   sparse pixels into the W×W array, encode through the REAL PNG codec
   (sources/images.py), decode back, and emit the round-trip proof
   columns. Python touches tiles, never points (rule 1).

Audit / oracle contract: every emitted number is exact-integer SQL
algebra — ``px_checksum`` is a bit_xor over ``(li+1)·2^32 + v`` (ANSI-safe,
rule 14), ``raster_sum`` is computed by Catalyst BEFORE the codec and
``decoded_sum`` from the decoded PNG AFTER it, so a value-equal compare of
both against one SQL expression pins the codec round trip numerically
while ``decode_ok`` pins it byte-for-byte in-engine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import cells as C

_X_SHIFT = 29
_XY_MASK = (1 << 29) - 1

#: output schema of :func:`render_density_tiles`
RENDER_SCHEMA = (
    "tile long, n_points long, n_pixels int, px_checksum long, "
    "raster_sum long, decoded_sum long, decode_ok boolean, png binary"
)


def render_density_tiles(
    points: DataFrame,
    tile_res: int,
    px_bits: int = 8,
    lon: str = "lon",
    lat: str = "lat",
    value_cap: int = 255,
) -> DataFrame:
    """→ one row per NON-EMPTY tile: ``(tile, n_points, n_pixels,
    px_checksum, raster_sum, decoded_sum, decode_ok, png)``.

    ``tile`` is the resolution-``tile_res`` cell id; each tile renders as
    a W×W (W = 2^``px_bits``) grayscale PNG whose pixel (yl, xl) holds
    ``min(point_count, value_cap)`` for the sub-cell at resolution
    ``tile_res + px_bits``. Row-major local index ``li = yl·W + xl`` with
    yl = 0 at the SOUTH edge (grid y ascends north, matching cell_xy).

    ``decode_ok`` is the in-engine byte-exact round-trip check
    (decode(encode(raster)) == raster); ``raster_sum`` / ``decoded_sum``
    are the same total measured before/after the codec.
    """
    if not 0 < px_bits <= 8:
        raise ValueError(f"px_bits must be in [1, 8], got {px_bits}")
    if not 0 <= value_cap <= 255:
        raise ValueError(f"value_cap must fit uint8, got {value_cap}")
    px_res = tile_res + px_bits
    if px_res > C.MAX_RES:
        raise ValueError(
            f"tile_res {tile_res} + px_bits {px_bits} exceeds MAX_RES {C.MAX_RES}"
        )
    w = 1 << px_bits

    # stage 1: points -> occupied pixels (map-side combinable; the only
    # data-bounded exchange in the job)
    binned = (
        points.select(
            C.cell_col(F.col(lon), F.col(lat), px_res).alias("px")
        )
        .groupBy("px")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    # stage 2 (grid-bounded from here on): tile id + row-major local
    # pixel index, staged as real columns (rule 9), then ONE aggregate
    # carrying the render payload and the exact-integer audit columns.
    x = F.shiftrightunsigned("px", _X_SHIFT).bitwiseAND(F.lit(_XY_MASK))
    y = F.col("px").bitwiseAND(F.lit(_XY_MASK))
    staged = binned.select(
        (
            F.lit(tile_res << 58)
            + F.shiftrightunsigned(x, px_bits) * F.lit(1 << _X_SHIFT)
            + F.shiftrightunsigned(y, px_bits)
        ).alias("tile"),
        (
            y.bitwiseAND(F.lit(w - 1)) * F.lit(w) + x.bitwiseAND(F.lit(w - 1))
        ).alias("li"),
        "cnt",
        F.least(F.col("cnt"), F.lit(value_cap)).alias("v"),
    )
    tiles = staged.groupBy("tile").agg(
        F.sum("cnt").alias("n_points"),
        F.count(F.lit(1)).cast("int").alias("n_pixels"),
        F.bit_xor((F.col("li") + 1) * F.lit(1 << 32) + F.col("v")).alias(
            "px_checksum"
        ),
        F.sum("v").alias("raster_sum"),
        F.collect_list(F.struct("li", "v")).alias("_pxs"),
    )

    from ..sources import images as I

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "tile": [], "n_points": [], "n_pixels": [],
                "px_checksum": [], "raster_sum": [], "decoded_sum": [],
                "decode_ok": [], "png": [],
            }
            for tile, n_pt, n_px, ck, rs, pxs in zip(
                pdf["tile"], pdf["n_points"], pdf["n_pixels"],
                pdf["px_checksum"], pdf["raster_sum"], pdf["_pxs"],
            ):
                img = np.zeros((w, w), dtype=np.uint8)
                li = np.fromiter((p["li"] for p in pxs), dtype=np.int64)
                vv = np.fromiter((p["v"] for p in pxs), dtype=np.int64)
                img.flat[li] = vv.astype(np.uint8)
                rgb = np.repeat(img[:, :, None], 3, axis=2)
                png = I.encode(rgb, "png")
                dec = I.decode(png, "png")
                out["tile"].append(int(tile))
                out["n_points"].append(int(n_pt))
                out["n_pixels"].append(int(n_px))
                out["px_checksum"].append(int(ck))
                out["raster_sum"].append(int(rs))
                out["decoded_sum"].append(int(dec[:, :, 0].astype(np.int64).sum()))
                out["decode_ok"].append(bool((dec == rgb).all()))
                out["png"].append(png)
            yield pd.DataFrame(out)

    return tiles.mapInPandas(run, RENDER_SCHEMA)
