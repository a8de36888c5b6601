"""W4 ring chunking — 9 golden sizes from the reference
(/root/reference/tests/navteq/unit_test_navteq2osm.cpp:9-40)."""

import math

import pytest
from pyspark.sql import functions as F

from morituri_spark.operators import rings as R

# ring_size = distinct points; the test ring closes with a repeat of point 0
# → getNumPoints = ring_size + 1 = node-list length.
GOLDEN_SIZES = [2, 5, 10, 100, 999, 1000, 1001, 1002, 10000]


@pytest.mark.parametrize("ring_size", GOLDEN_SIZES)
def test_chunk_counts_python(ring_size):
    n_nodes = ring_size + 1
    want = math.floor(n_nodes / R.OSM_MAX_WAY_NODES) + 1
    bounds = R.chunk_bounds(n_nodes)
    assert len(bounds) == want
    # each way ≤ 1000 nodes; consecutive ways share the boundary node
    for s, e in bounds:
        assert 1 <= e - s <= R.OSM_MAX_WAY_NODES
    for (_, e0), (s1, _) in zip(bounds, bounds[1:]):
        assert s1 == e0 - 1
    assert bounds[0][0] == 0 and bounds[-1][1] == n_nodes


def test_chunk_rings_spark(spark):
    rows = []
    for zi, ring_size in enumerate(GOLDEN_SIZES):
        ring = [[0.0, 0.0]] + [[float(i), float(i)] for i in range(1, ring_size)] + [[0.0, 0.0]]
        rows.append((zi, 0, ring))
    df = spark.createDataFrame(
        rows, "zone_id long, ring_idx int, ring array<array<double>>"
    )
    got = (
        R.chunk_rings(df)
        .groupBy("zone_id")
        .agg(
            F.count("way_seq").alias("n_ways"),
            F.sum(F.size("way_nodes")).alias("tot"),
            F.max(F.size("way_nodes")).alias("maxlen"),
        )
        .collect()
    )
    by_zone = {r["zone_id"]: r for r in got}
    for zi, ring_size in enumerate(GOLDEN_SIZES):
        n_nodes = ring_size + 1
        bounds = R.chunk_bounds(n_nodes)
        r = by_zone[zi]
        assert r["n_ways"] == len(bounds), f"ring_size={ring_size}"
        assert r["maxlen"] <= R.OSM_MAX_WAY_NODES
        assert r["tot"] == sum(e - s for s, e in bounds)


def test_chunk_rings_node_order_and_sharing(spark):
    ring = [[0.0, 0.0]] + [[float(i), float(i)] for i in range(1, 1500)] + [[0.0, 0.0]]
    df = spark.createDataFrame([(7, 0, ring)], "zone_id long, ring_idx int, ring array<array<double>>")
    ways = {r["way_seq"]: r["way_nodes"] for r in R.chunk_rings(df).collect()}
    assert len(ways) == 2
    w0, w1 = ways[0], ways[1]
    assert len(w0) == 1000 and len(w1) == 1501 - 999
    assert w0[-1] == w1[0]  # shared boundary node
    assert w0[0] == [0.0, 0.0] and w1[-1] == [0.0, 0.0]  # closes on first node
    assert w0[5] == [5.0, 5.0] and w1[1] == [1000.0, 1000.0]


def test_invalid_ring_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])],
        "zone_id long, ring_idx int, ring array<array<double>>",
    )
    with pytest.raises(Exception, match="ring is invalid"):
        R.chunk_rings(df).collect()
