"""S1/S2 real .shp/.dbf ingest: golden checks against the reference's own
faroe-islands fixture (the files unit_test_util.cpp:6-24 points at), plus
writer round-trips and the distributed Spark readers."""

import os

import pytest
from pyspark.sql import functions as F

from morituri_spark.io import shapefile as S

FAROE = "/root/reference/tests/testdata/faroe-islands-latest/roads"

needs_faroe = pytest.mark.skipif(
    not os.path.exists(FAROE + ".shp"), reason="reference testdata not present"
)


@needs_faroe
def test_faroe_shp_golden():
    recs = list(S.iter_shp_records(FAROE + ".shp"))
    assert len(recs) == 3508
    recno, shape_type, parts = recs[0]
    assert (recno, shape_type) == (1, S.SHAPE_POLYLINE)
    assert len(parts) == 1 and len(parts[0]) == 5
    # Faroe Islands coordinates: lon ≈ -7..-6, lat ≈ 61..62.5
    assert parts[0][0] == [-6.7721263, 62.0112074]
    for _r, _t, ps in recs:
        for part in ps:
            for x, y in part:
                assert -8.0 < x < -6.0 and 61.0 < y < 63.0


@needs_faroe
def test_faroe_dbf_golden():
    hdr = S.read_dbf_header(FAROE + ".dbf")
    assert hdr.n_records == 3508
    assert hdr.encoding == "UTF-8"  # from the sibling .cpg
    assert [(n, t) for n, t, _l in hdr.fields] == [
        ("osm_id", "C"), ("name", "C"), ("ref", "C"), ("type", "C"),
        ("oneway", "N"), ("bridge", "N"), ("tunnel", "N"), ("maxspeed", "N"),
    ]
    rows = list(S.iter_dbf_records(FAROE + ".dbf"))
    assert len(rows) == 3508
    # UTF-8 street name decodes correctly (ø)
    assert rows[0] == ["4965566", "Sverrisgøta", "", "unclassified", "1", "0", "0", ""]


@needs_faroe
def test_faroe_spark_join(spark):
    df = S.shapefile_table(spark, FAROE)
    assert df.count() == 3508
    first = df.orderBy("fid").first()
    assert first["name"] == "Sverrisgøta" and first["shape_type"] == 3
    # .shx offsets agree with sequential parsing
    offs = S.read_shx_offsets(FAROE + ".shx")
    assert len(offs) == 3508 and offs[0][0] == 100


def test_writer_reader_roundtrip(spark, tmp_path):
    shapes = [
        (1, [[[0.0, 0.0], [1.0, 1.5], [2.0, 0.5]]]),
        (2, [[[5.0, 5.0], [6.0, 5.0]], [[7.0, 7.0], [8.0, 8.0], [9.0, 7.5]]]),
    ]
    base = str(tmp_path / "t")
    S.write_shp(base + ".shp", shapes, S.SHAPE_POLYLINE)
    S.write_dbf(base + ".dbf", [("NAME", "C", 12), ("SPEED", "N", 3)],
                [["road a", "50"], ["road ø", ""]])
    hdr = S.read_shp_header(open(base + ".shp", "rb").read(100))
    assert hdr["shape_type"] == S.SHAPE_POLYLINE
    assert hdr["bbox"] == [0.0, 0.0, 9.0, 8.0]
    got = {r: (t, p) for r, t, p in S.iter_shp_records(base + ".shp")}
    assert got[1] == (S.SHAPE_POLYLINE, shapes[0][1])
    assert got[2] == (S.SHAPE_POLYLINE, shapes[1][1])
    df = S.shapefile_table(spark, base).orderBy("fid").collect()
    assert df[0]["NAME"] == "road a" and df[0]["SPEED"] == "50"
    assert df[1]["NAME"] == "road ø"  # latin-1 default decode
    assert df[1]["parts"] == shapes[1][1]


def test_point_and_polygon_shapes(spark, tmp_path):
    base = str(tmp_path / "pt")
    S.write_shp(base + ".shp", [(1, [[[3.25, -4.5]]])], S.SHAPE_POINT)
    recs = list(S.iter_shp_records(base + ".shp"))
    assert recs == [(1, S.SHAPE_POINT, [[[3.25, -4.5]]])]
    ring = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    hole = [[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]]
    base2 = str(tmp_path / "pg")
    S.write_shp(base2 + ".shp", [(1, [ring, hole])], S.SHAPE_POLYGON)
    _r, t, parts = next(S.iter_shp_records(base2 + ".shp"))
    assert t == S.SHAPE_POLYGON and parts == [ring, hole]


def test_dbf_deleted_records_skipped(tmp_path):
    base = str(tmp_path / "d")
    S.write_dbf(base + ".dbf", [("A", "C", 4)], [["one"], ["two"], ["thr"]])
    # flag the middle record deleted
    hdr = S.read_dbf_header(base + ".dbf")
    with open(base + ".dbf", "r+b") as f:
        f.seek(hdr.header_size + hdr.record_size)
        f.write(b"*")
    assert [r[0] for r in S.iter_dbf_records(base + ".dbf")] == ["one", "thr"]


@needs_faroe
def test_streets_schema_from_real_shapefile(spark):
    """A NAVSTREETS-shaped projection built from the real shapefile: the
    engine geometry column (first part) + attribute columns — proving a
    user can feed actual .shp data into the streets pipeline surface."""
    df = S.shapefile_table(spark, FAROE)
    streets = df.select(
        F.col("fid").alias("LINK_ID"),
        F.element_at("parts", 1).alias("geometry"),
        F.col("name").alias("ST_NAME"),
        F.when(F.col("oneway") == "1", "F").otherwise("B").alias("DIR_TRAVEL"),
    )
    out = streets.where(F.size("geometry") >= 2)
    assert out.count() == 3508
    row = out.where("LINK_ID = 1").first()
    assert row["ST_NAME"] == "Sverrisgøta" and row["DIR_TRAVEL"] == "F"
