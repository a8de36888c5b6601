"""Deterministic synthetic table generators (seed=42 throughout).

FIXTURES.md §1 (images fact table with Zipf-skewed geo clustering, per
BASELINE.json input_hint) and §§2-9 (NAVSTREETS-shaped dimension/fixture
tables mirroring the reference's own fixture generators,
/root/reference/tests/navteq/create_street_geojson.py and
create_zlvl_geojson.py). Generation is distributed: an id-range DataFrame
(``spark.range``) fans rows out across partitions and a ``mapInPandas``
kernel synthesizes each batch — no driver-side loops, so the same generator
scales to bench sizes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import images as I

SEED = 42

# Test region: a 10°×10° bbox; ~30% of images cluster in one "urban disk"
# mega-cell to exercise skew salting (FIXTURES.md §1).
BBOX = (0.0, 40.0, 10.0, 50.0)
URBAN_CENTER = (5.0, 45.0)
URBAN_RADIUS = 0.05
URBAN_FRAC = 0.3

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
    ]
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — full-avalanche integer hash (public domain
    algorithm, Steele et al.), vectorized on uint64."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _unit_hash(ids: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uniform [0,1) per (id, stream)."""
    h = _splitmix64(ids.astype(np.uint64) * np.uint64(1315423911) + np.uint64(stream * 2654435761 + SEED))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _lonlat_for_ids(ids: np.ndarray):
    """Deterministic per-id position: urban-disk cluster or uniform bbox."""
    rng_u = _unit_hash(ids, 1)
    rng_v = _unit_hash(ids, 2)
    rng_w = _unit_hash(ids, 3)
    urban = rng_u < URBAN_FRAC
    theta = 2 * np.pi * rng_v
    r = URBAN_RADIUS * np.sqrt(rng_w)
    lon = np.where(
        urban,
        URBAN_CENTER[0] + r * np.cos(theta),
        BBOX[0] + rng_v * (BBOX[2] - BBOX[0]),
    )
    lat = np.where(
        urban,
        URBAN_CENTER[1] + r * np.sin(theta),
        BBOX[1] + rng_w * (BBOX[3] - BBOX[1]),
    )
    return lon, lat


def images_table(
    spark: SparkSession,
    n: int,
    partitions: int = 32,
    px: int = 8,
    with_payload: bool = True,
) -> DataFrame:
    """The primary fact table (image_id, bytes, w, h, fmt, caption, phash,
    lon, lat). ``px`` controls payload size (px × px RGB). ``with_payload=
    False`` emits 0-byte payloads for geometry-only benchmarks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lon, lat = _lonlat_for_ids(ids)
            fmts = np.where(ids % 2 == 0, "png", "fjpg")
            payloads, hashes = [], []
            for i, fmt in zip(ids, fmts):
                if with_payload:
                    rng = np.random.default_rng(SEED + int(i))
                    arr = rng.integers(0, 256, size=(px, px, 3), dtype=np.uint8)
                    payloads.append(I.encode(arr, str(fmt)))
                    hashes.append(I.phash(arr))
                else:
                    payloads.append(b"")
                    hashes.append(int(i))
            yield pd.DataFrame(
                {
                    "image_id": [f"img{i:012d}" for i in ids],
                    "bytes": payloads,
                    "w": np.full(len(ids), px, dtype=np.int32),
                    "h": np.full(len(ids), px, dtype=np.int32),
                    "fmt": fmts,
                    "caption": [f"photo {i} near ({lo:.3f},{la:.3f})" for i, lo, la in zip(ids, lon, lat)],
                    "phash": np.asarray(hashes, dtype=np.int64),
                    "lon": lon,
                    "lat": lat,
                }
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, IMAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Zones (admin polygons) — FIXTURES.md §9
# ---------------------------------------------------------------------------

RINGS_TYPE = ArrayType(ArrayType(ArrayType(DoubleType())))

ZONES_SCHEMA = StructType(
    [
        StructField("zone_id", LongType(), False),
        StructField("area_id", LongType(), False),
        StructField("admin_lvl", IntegerType(), False),
        StructField("rings", RINGS_TYPE, False),
    ]
)


def _rect(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


def _regular_polygon(cx, cy, r, n, phase=0.0):
    ang = phase + 2 * np.pi * np.arange(n + 1) / n
    return [[float(cx + r * np.cos(a)), float(cy + r * np.sin(a))] for a in ang]


def zones_table(spark: SparkSession, grid: int = 4) -> DataFrame:
    """Deterministic zone set over BBOX: a grid×grid rectangle tiling
    (admin_lvl 3), a handful of hexagon 'cities' (lvl 5), and one annulus —
    square with a square hole — to pin hole semantics (lvl 4)."""
    rows = []
    zid = 0
    dx = (BBOX[2] - BBOX[0]) / grid
    dy = (BBOX[3] - BBOX[1]) / grid
    for gy in range(grid):
        for gx in range(grid):
            rows.append(
                (zid, 1000 + zid, 3,
                 [_rect(BBOX[0] + gx * dx, BBOX[1] + gy * dy,
                        BBOX[0] + (gx + 1) * dx, BBOX[1] + (gy + 1) * dy)])
            )
            zid += 1
    rng = np.random.default_rng(SEED)
    for _ in range(6):
        cx = BBOX[0] + rng.uniform(0.15, 0.85) * (BBOX[2] - BBOX[0])
        cy = BBOX[1] + rng.uniform(0.15, 0.85) * (BBOX[3] - BBOX[1])
        rows.append((zid, 1000 + zid, 5, [_regular_polygon(cx, cy, rng.uniform(0.3, 1.0), 6)]))
        zid += 1
    # urban hexagon right on the mega-cell so the skewed cluster hits one zone
    rows.append((zid, 1000 + zid, 5, [_regular_polygon(*URBAN_CENTER, 0.2, 6)]))
    zid += 1
    # MultiPolygon: two disjoint islands in ONE zone row, the first with a
    # hole — pins multi-exterior semantics (navteq.hpp:787-797) across every
    # PIP strategy (lvl 6)
    rows.append(
        (zid, 1000 + zid, 6,
         [_rect(7.0, 46.0, 8.0, 47.0), _rect(7.25, 46.25, 7.75, 46.75),
          _rect(8.5, 46.0, 9.0, 46.5)])
    )
    zid += 1
    # annulus: outer 2×2 square with 1×1 hole, centered at (2.5, 42.5)
    rows.append(
        (zid, 1000 + zid, 4, [_rect(1.5, 41.5, 3.5, 43.5), _rect(2.0, 42.0, 3.0, 43.0)])
    )
    return spark.createDataFrame(rows, ZONES_SCHEMA)


# ---------------------------------------------------------------------------
# NAVSTREETS-shaped fixture tables — FIXTURES.md §§2-8
# ---------------------------------------------------------------------------

def streets_table(spark: SparkSession, n: int = 200, n_vertices: int = 5) -> DataFrame:
    """Street links shaped like the reference's fixture generator
    (create_street_geojson.py:16-126): vertices start at a per-link origin
    and step +0.001°/vertex; the full attribute set drives the tag layer."""
    rng = np.random.default_rng(SEED)
    step = 0.001
    i = np.arange(n)
    # links in the same 50-wide row chain end-to-end (link i's last vertex ==
    # link i+1's first) so turn-restriction topologies resolve
    x0 = 10.0 + (i % 50) * step * (n_vertices - 1)
    y0 = 10.0 + (i // 50) * 0.01

    def yn(p):
        return np.where(rng.uniform(size=n) < p, "Y", "N")

    def pick(choices, size=None):
        return rng.choice(np.asarray(choices, dtype=object), size=size or n)

    pdf = pd.DataFrame(
        {
            "LINK_ID": 10_000 + i,
            # float() coercion matters: np.float64 inside an object-dtype
            # list cell survives to_records().tolist() and fails the
            # non-Arrow createDataFrame row verifier (driver harness runs
            # without Arrow; CORRECTNESS_r01 street_conversion ERR).
            "geometry": [
                [[float(round(x + j * step, 9)), float(y)] for j in range(n_vertices)]
                for x, y in zip(x0, y0)
            ],
            "ST_NAME": pick(["E20 ", "main STREET", "ELM st", ""]),
            "FUNC_CLASS": rng.integers(1, 6, n).astype(str),
            "ROUTE_TYPE": np.where(
                rng.uniform(size=n) < 0.5, rng.integers(1, 7, n).astype(str), ""
            ),
            "SPEED_CAT": rng.integers(1, 9, n).astype(str),
            "FR_SPD_LIM": pick(["0", "30", "50", "100", "130", "998", "999"]),
            "TO_SPD_LIM": pick(["0", "30", "50", "100", "130", "998", "999"]),
            "DIR_TRAVEL": pick(["F", "T", "B"]),
            "AR_AUTO": yn(0.9), "AR_BUS": yn(0.8), "AR_TAXIS": yn(0.8),
            "AR_CARPOOL": yn(0.8), "AR_PEDEST": yn(0.7), "AR_TRUCKS": yn(0.7),
            "AR_TRAFF": yn(0.9), "AR_EMERVEH": yn(0.95), "AR_MOTOR": yn(0.9),
            "PAVED": yn(0.8), "PRIVATE": yn(0.1), "BRIDGE": yn(0.1),
            "TUNNEL": yn(0.05), "TOLLWAY": yn(0.1), "ROUNDABOUT": yn(0.05),
            "FOURWHLDR": yn(0.05), "URBAN": yn(0.5), "PUB_ACCESS": yn(0.9),
            "FERRY_TYPE": pick(["H"] * 18 + ["B", "R"]),
            "PHYS_LANES": rng.integers(0, 5, n).astype(str),
            "L_AREA_ID": rng.integers(1, 6, n),
            "R_AREA_ID": rng.integers(1, 6, n),
            "L_POSTCODE": pick(["5500", "5501", ""]),
            "R_POSTCODE": pick(["5500", "5501", ""]),
            "ADDR_TYPE": pick(["B", "", ""]),
            "L_REFADDR": "2", "L_NREFADDR": "40", "L_ADDRSCH": "E",
            "R_REFADDR": "1", "R_NREFADDR": "41", "R_ADDRSCH": "O",
        }
    )
    schema = StructType(
        [StructField("LINK_ID", LongType(), False),
         StructField("geometry", ArrayType(ArrayType(DoubleType())), False)]
        + [StructField(c, StringType(), False) for c in pdf.columns if c not in ("LINK_ID", "geometry", "L_AREA_ID", "R_AREA_ID")]
        + [StructField("L_AREA_ID", LongType(), False), StructField("R_AREA_ID", LongType(), False)]
    )
    cols = [f.name for f in schema.fields]
    return spark.createDataFrame(pdf[cols], schema)


STREET_ATTR_DEFAULTS = {
    "ST_NAME": "Test Street", "FUNC_CLASS": "3", "ROUTE_TYPE": "",
    "SPEED_CAT": "5", "FR_SPD_LIM": "50", "TO_SPD_LIM": "50",
    "DIR_TRAVEL": "B",
    "AR_AUTO": "Y", "AR_BUS": "Y", "AR_TAXIS": "Y", "AR_CARPOOL": "Y",
    "AR_PEDEST": "Y", "AR_TRUCKS": "Y", "AR_TRAFF": "Y", "AR_EMERVEH": "Y",
    "AR_MOTOR": "Y",
    "PAVED": "Y", "PRIVATE": "N", "BRIDGE": "N", "TUNNEL": "N",
    "TOLLWAY": "N", "ROUNDABOUT": "N", "FOURWHLDR": "N", "URBAN": "N",
    "PUB_ACCESS": "Y", "FERRY_TYPE": "H", "PHYS_LANES": "0",
    "L_POSTCODE": "", "R_POSTCODE": "", "ADDR_TYPE": "",
    "L_REFADDR": "", "L_NREFADDR": "", "L_ADDRSCH": "",
    "R_REFADDR": "", "R_NREFADDR": "", "R_ADDRSCH": "",
}


def streets_from_geometries(spark: SparkSession, links: dict[int, list]) -> DataFrame:
    """Minimal streets table for topology tests: {link_id: vertex list},
    every attribute at its default."""
    rows = []
    for link_id, geom in links.items():
        r = {"LINK_ID": int(link_id),
             "geometry": [[float(v[0]), float(v[1])] for v in geom],
             "L_AREA_ID": 2, "R_AREA_ID": 2}
        r.update(STREET_ATTR_DEFAULTS)
        rows.append(r)
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf)


def zlevels_table(spark: SparkSession, vectors: list[tuple[int, list[int]]]) -> DataFrame:
    """(LINK_ID, POINT_NUM 1-based, Z_LEVEL) rows from per-link z sequences —
    the shape of Zlevels.dbf (FIXTURES.md §3). Zero rows are kept here; the
    loader drops them (mirroring navteq.hpp:1036)."""
    rows = [
        (link_id, j + 1, int(z))
        for link_id, seq in vectors
        for j, z in enumerate(seq)
    ]
    schema = StructType(
        [StructField("LINK_ID", LongType(), False),
         StructField("POINT_NUM", IntegerType(), False),
         StructField("Z_LEVEL", IntegerType(), False)]
    )
    return spark.createDataFrame(rows, schema)


def cdms_table(spark: SparkSession, n_links: int = 200) -> DataFrame:
    rng = np.random.default_rng(SEED + 1)
    rows = []
    cond_id = 1
    for i in range(n_links):
        link_id = 10_000 + i
        for _ in range(int(rng.integers(0, 3))):
            rows.append((link_id, cond_id, int(rng.choice([3, 7, 7, 9]))))
            cond_id += 1
    return spark.createDataFrame(
        rows, "LINK_ID long, COND_ID long, COND_TYPE int"
    )


def cnd_mod_table(spark: SparkSession, cdms: DataFrame) -> DataFrame:
    rng = np.random.default_rng(SEED + 2)
    rows = []
    for r in cdms.select("COND_ID").collect():
        if rng.uniform() < 0.7:
            rows.append((r[0], int(rng.choice([41, 42, 43, 44, 45])), int(rng.integers(100, 5000))))
    return spark.createDataFrame(rows, "COND_ID long, MOD_TYPE int, MOD_VAL long")


def mtd_area_table(spark: SparkSession) -> DataFrame:
    rows = [
        (1, 1, "ENG", "united kingdom", 101),
        (1, 1, "FRE", "royaume-uni", 101),
        (2, 3, "GER", "bayern", 102),
        (3, 5, "GER", "muenchen stadt", 102),
        (4, 2, "ENG", "scotland", 101),
        (5, 7, "DAN", "koebenhavn K", 103),
    ]
    return spark.createDataFrame(
        rows, "AREA_ID long, ADMIN_LVL int, LANG_CODE string, AREA_NAME string, GOVT_CODE long"
    )


def mtd_cntry_ref_table(spark: SparkSession) -> DataFrame:
    rows = [
        (101, "E", "MPH", "GBR"),  # imperial
        (102, "M", "KPH", "DEU"),
        (103, "M", "KPH", "DNK"),
    ]
    return spark.createDataFrame(
        rows, "GOVT_CODE long, UNTMEASURE string, SPDLIMUNIT string, ISO_CODE string"
    )


def adminbndy_table(spark: SparkSession) -> DataFrame:
    """Admin polygons for AREA_IDs 1..5 (FK → mtd_area): rectangles and one
    polygon with a hole; level = source file index 1..5."""
    rows = [
        (1, 1, [_rect(0.0, 40.0, 10.0, 50.0)]),
        (2, 2, [_rect(0.0, 40.0, 5.0, 50.0)]),
        (3, 3, [_regular_polygon(5.0, 45.0, 1.0, 6)]),
        (4, 2, [_rect(5.0, 40.0, 10.0, 50.0)]),
        (5, 4, [_rect(6.0, 41.0, 9.0, 44.0), _rect(7.0, 42.0, 8.0, 43.0)]),
    ]
    schema = StructType(
        [
            StructField("AREA_ID", LongType(), False),
            StructField("level", IntegerType(), False),
            StructField("rings", RINGS_TYPE, False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def rdms_table(spark: SparkSession, n_restrictions: int = 30) -> DataFrame:
    """Turn-restriction sequences: rows with equal COND_ID are consecutive;
    SEQ is explicit (FIXTURES.md §6)."""
    rng = np.random.default_rng(SEED + 3)
    rows = []
    for c in range(n_restrictions):
        cond_id = 5000 + c
        # pick a run of adjacent links within one 50-wide row so the
        # via-sequence is topologically connected (streets_table chains
        # row-wise)
        length = int(rng.integers(2, 5))
        row = int(rng.integers(0, 4))
        col = int(rng.integers(0, 50 - length))
        links = [10_000 + row * 50 + col + k for k in range(length)]
        from_link = links[0]
        # row j's MAN_LINKID is link j+1 — the loader prepends LINK_ID
        # (collect_via_manoeuvre_link_ids, navteq.hpp:845-862)
        for seq, man in enumerate(links[1:]):
            rows.append((from_link, cond_id, man, seq))
    return spark.createDataFrame(rows, "LINK_ID long, COND_ID long, MAN_LINKID long, SEQ int")
