"""G3-G8 curve operators vs hand-computed geometry."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from morituri_spark.geo import curves as CV
from morituri_spark.sources import synth


def test_move_point():
    p = CV.move_point([0.0, 0.0], [10.0, 0.0], 4.0)
    assert np.allclose(p, [4.0, 0.0])
    p = CV.move_point([0.0, 0.0], [3.0, 4.0], 2.5)  # along a 3-4-5 triangle
    assert np.allclose(p, [1.5, 2.0])


def test_cut_front_back():
    line = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    out = CV.cut_front(1.5, line)
    assert np.allclose(out[0], [1.5, 0.0]) and len(out) == 3
    out = CV.cut_back(0.5, line)
    assert np.allclose(out[-1], [2.5, 0.0]) and len(out) == 4
    # cutting exactly one segment length drops the vertex, no interpolation
    out = CV.cut_front(1.0, line)
    assert np.allclose(out[0], [1.0, 0.0]) and len(out) == 3


def test_cut_caps():
    line = np.array([[0.0, 0.0], [1.0, 0.0]])
    out = CV.cut_caps(line)
    # cut = min(0.00025, 0.1) = 0.00025 per end
    assert np.allclose(out[0], [0.00025, 0.0])
    assert np.allclose(out[-1], [1 - 0.00025, 0.0])
    short = np.array([[0.0, 0.0], [0.001, 0.0]])
    out = CV.cut_caps(short)  # 10% rule kicks in: cut = 0.0001
    assert np.allclose(out[0], [0.0001, 0.0])


def test_offset_curve_straight():
    line = np.array([[0.0, 0.0], [1.0, 0.0]])
    left = CV.offset_curve(line, 0.00005, left=True)
    right = CV.offset_curve(line, 0.00005, left=False)
    assert np.allclose(left[:, 1], 0.00005)   # left of +x travel is +y
    assert np.allclose(right[:, 1], -0.00005)
    # caps trimmed from both ends
    assert left[0, 0] > 0 and left[-1, 0] < 1


def test_offset_curve_corner_miter():
    line = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])  # right-angle turn
    left = CV.offset_curve(line, 0.1, left=True)
    # left offset of the corner is the miter point (0.9, 0.1)
    assert any(np.allclose(p, [0.9, 0.1]) for p in left)


def _with_addresses(df):
    return (
        df.withColumn("ADDR_TYPE", F.lit("B"))
        .withColumn("L_REFADDR", F.lit("2")).withColumn("L_NREFADDR", F.lit("40"))
        .withColumn("L_ADDRSCH", F.lit("E"))
        .withColumn("R_REFADDR", F.lit("1")).withColumn("R_NREFADDR", F.lit("41"))
        .withColumn("R_ADDRSCH", F.lit("O"))
    )


def test_house_number_nodes(spark):
    streets = _with_addresses(
        synth.streets_from_geometries(spark, {1: [[0.0, 0.0], [0.01, 0.0]]})
    )
    nodes = CV.house_number_nodes(streets).collect()
    sides = {r["side"] for r in nodes}
    assert sides == {"L", "R"}
    left = sorted([r for r in nodes if r["side"] == "L"], key=lambda r: r["node_seq"])
    assert left[0]["housenumber"] == "2" and left[-1]["housenumber"] == "40"
    assert all(r["interpolation"] == "even" for r in left)
    right = [r for r in nodes if r["side"] == "R"]
    assert right[0]["interpolation"] == "odd"
    # left of +x travel is +y, right is -y
    assert all(r["lat"] > 0 for r in left)
    assert all(r["lat"] < 0 for r in right)


def test_house_number_gating(spark):
    # ADDR_TYPE != 'B' → nothing; schema M → side skipped (P9)
    base = synth.streets_from_geometries(spark, {1: [[0.0, 0.0], [0.01, 0.0]]})
    assert CV.house_number_nodes(base).count() == 0  # default ADDR_TYPE ""
    m_schema = _with_addresses(base).withColumn("L_ADDRSCH", F.lit("M"))
    nodes = CV.house_number_nodes(m_schema).collect()
    assert {r["side"] for r in nodes} == {"R"}


def test_house_number_ways(spark):
    streets = _with_addresses(
        synth.streets_from_geometries(
            spark, {1: [[0.0, 0.0], [0.01, 0.0]], 2: [[1.0, 1.0], [1.01, 1.0]]}
        )
    )
    ways = CV.house_number_ways(streets).collect()
    assert len(ways) == 4  # 2 links × 2 sides
    w = [r for r in ways if r["link_id"] == 1 and r["side"] == "L"][0]
    assert w["ref_housenumber"] == "2" and w["nref_housenumber"] == "40"
    assert w["addr_interpolation"] == "even"
    assert w["n_nodes"] == len(w["way_nodes"])
