"""G1 WKB bridge: reference golden hex, round-trips, Spark surface,
parquet interop."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo import wkb as W
from morituri_spark.sources import synth

# The reference's golden (tests/unit_test_util.cpp:154-176):
# LINESTRING (30 10, 10 30, 40 40) exported with wkbNDR. PostGIS-verified
# per the reference's own comment.
GOLDEN_HEX = (
    "010200000003000000"
    "0000000000003e400000000000002440"
    "00000000000024400000000000003e40"
    "00000000000044400000000000004440"
)


def test_linestring_golden_hex():
    buf = W.encode_linestring([[30.0, 10.0], [10.0, 30.0], [40.0, 40.0]])
    assert buf.hex() == GOLDEN_HEX
    t, coords = W.decode(buf)
    assert t == W.T_LINESTRING
    assert coords == [[30.0, 10.0], [10.0, 30.0], [40.0, 40.0]]


def test_polygon_roundtrip():
    rings = [synth._rect(0.0, 0.0, 2.0, 2.0), synth._rect(0.5, 0.5, 1.5, 1.5)]
    buf = W.encode_polygon(rings)
    t, out = W.decode(buf)
    assert t == W.T_POLYGON and out == rings
    assert W.wkb_to_rings(buf) == rings


def test_multipolygon_roundtrip_flattens():
    pa = [synth._rect(0.0, 0.0, 2.0, 2.0), synth._rect(0.5, 0.5, 1.5, 1.5)]
    pb = [synth._rect(5.0, 0.0, 6.0, 1.0)]
    buf = W.encode_multipolygon([pa, pb])
    t, polys = W.decode(buf)
    assert t == W.T_MULTIPOLYGON and polys == [pa, pb]
    assert W.wkb_to_rings(buf) == pa + pb


def test_point_and_big_endian_read():
    buf = W.encode_point([12.5, -3.25])
    t, xy = W.decode(buf)
    assert (t, xy) == (W.T_POINT, [12.5, -3.25])
    # XDR (big-endian) accepted on read
    import struct

    xdr = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 12.5, -3.25)
    assert W.decode(xdr) == (W.T_POINT, [12.5, -3.25])


def test_invalid_wkb_raises():
    with pytest.raises(ValueError):
        W.decode(b"\x02\x01\x00\x00\x00")
    with pytest.raises(ValueError):
        W.wkb_to_rings(W.encode_point([0.0, 0.0]))


def test_spark_roundtrip_and_parquet_interop(spark, tmp_path):
    """zones → MultiPolygon WKB column → parquet → read → decode → equal
    (the GeoParquet/Iceberg interop shape)."""
    zones = synth.zones_table(spark)
    with_wkb = zones.select("zone_id", "rings", W.multipolygon_to_wkb_udf("rings").alias("wkb"))
    path = str(tmp_path / "zones_wkb.parquet")
    with_wkb.select("zone_id", "wkb").write.mode("overwrite").parquet(path)
    back = (
        spark.read.parquet(path)
        .select("zone_id", W.wkb_to_rings_udf("wkb").alias("rings2"))
        .join(zones, "zone_id")
    )
    rows = back.collect()
    assert len(rows) == zones.count()
    for r in rows:
        # flat rings survive the multipolygon grouping round-trip as a set
        got = {tuple(map(tuple, ring)) for ring in r["rings2"]}
        want = {tuple(map(tuple, ring)) for ring in r["rings"]}
        assert got == want, r["zone_id"]


def test_spark_linestring_udfs(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"geometry": [[[30.0, 10.0], [10.0, 30.0], [40.0, 40.0]]]})
    )
    out = df.select(
        W.wkb_to_linestring_udf(W.linestring_to_wkb_udf("geometry")).alias("g2"), "geometry"
    ).first()
    assert out["g2"] == out["geometry"]


def test_multipolygon_nested_hole_attaches_to_deepest_exterior():
    """Island-in-lake-in-country nesting: the lake's island ring contains a
    pond (hole). The pond's vertex is inside BOTH the island exterior and
    the country exterior; it must attach to the island (deepest), not the
    country (ADVICE r2)."""
    country = synth._rect(0.0, 0.0, 10.0, 10.0)
    lake = synth._rect(2.0, 2.0, 8.0, 8.0)          # hole in country
    island = synth._rect(3.0, 3.0, 7.0, 7.0)        # exterior inside lake
    pond = synth._rect(4.0, 4.0, 6.0, 6.0)          # hole in island
    rl = [country, lake, island, pond]
    import pandas as pd

    buf = W.multipolygon_to_wkb_udf.func(pd.Series([rl])).iloc[0]
    t, polys = W.decode(buf)
    assert t == W.T_MULTIPOLYGON
    by_first = {tuple(p[0][0]): p for p in polys}
    assert len(polys) == 2
    country_poly = by_first[(0.0, 0.0)]
    island_poly = by_first[(3.0, 3.0)]
    assert lake in country_poly and pond not in country_poly
    assert pond in island_poly
