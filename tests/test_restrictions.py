"""Entry point 2: turn restrictions — W5 chain walk, P7/P8 filters, J9 via
node, against hand-built topologies."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from morituri_spark.operators import restrictions as R
from morituri_spark.operators import streets as ST
from morituri_spark.sources import synth


def _ways_df(spark, links):
    """links: {link_id: [geometry]} — one way per link, no z."""
    streets = synth.streets_from_geometries(spark, links)
    zlevels = synth.zlevels_table(spark, [])
    return ST.street_ways(streets, zlevels)


def _rdms(spark, rows):
    return spark.createDataFrame(rows, "LINK_ID long, COND_ID long, MAN_LINKID long, SEQ int")


def _cdms(spark, rows):
    return spark.createDataFrame(rows, "LINK_ID long, COND_ID long, COND_TYPE int")


def test_resolve_chain_reversal():
    # link A: a->b, link B: c->b (to-link stored backwards) — walk must
    # handle orientation via endpoint matching
    a, b, c = (0, 0), (10, 0), (20, 0)
    entries = [
        [(1, a, b)],        # from way: a->b
        [(2, c, b)],        # next link stored c->b; shares b
    ]
    assert R.resolve_chain(entries) == [1, 2]


def test_resolve_chain_multiway_reverse():
    # second link has two ways laid right-to-left relative to travel
    a, b, c, d = (0, 0), (10, 0), (20, 0), (30, 0)
    entries = [
        [(1, a, b)],
        [(2, d, c), (3, c, b)],  # chain front=d, back=b; travel is b->d → reversed
    ]
    assert R.resolve_chain(entries) == [1, 3, 2]


def test_resolve_chain_first_link_correction():
    # first link stored to->from; correction happens at ctr==1 retroactively
    a, b, c = (0, 0), (10, 0), (20, 0)
    entries = [
        [(1, b, a)],        # stored backwards: front=b shares with next link
        [(2, b, c)],
    ]
    assert R.resolve_chain(entries) == [1, 2]


def test_resolve_chain_disconnected_returns_none():
    entries = [
        [(1, (0, 0), (1, 0))],
        [(2, (5, 5), (6, 6))],
    ]
    assert R.resolve_chain(entries) is None


@pytest.fixture()
def topo(spark):
    # three links forming a path: L1 (0,0)->(1,0); L2 (1,0)->(2,0); L3 (2,0)->(3,0)
    links = {
        1: [[0.0, 0.0], [1.0, 0.0]],
        2: [[1.0, 0.0], [2.0, 0.0]],
        3: [[2.0, 0.0], [3.0, 0.0]],
    }
    return _ways_df(spark, links)


def test_full_restriction_members(spark, topo):
    rdms = _rdms(spark, [(1, 100, 2, 0), (1, 100, 3, 1)])
    cdms = _cdms(spark, [(1, 100, 7)])
    rel = R.build_turn_restrictions(rdms, cdms, topo).collect()
    assert len(rel) == 1
    m = rel[0]["members"]
    roles = [(x["role"], x["mtype"]) for x in m]
    assert roles == [("from", "way"), ("via", "way"), ("to", "way")]
    assert rel[0]["restriction"] == "no_straight_on"
    assert rel[0]["type"] == "restriction"


def test_cond_type_filter(spark, topo):
    rdms = _rdms(spark, [(1, 100, 2, 0), (1, 101, 2, 0)])
    # cond 100 has type 3 (→ dropped); cond 101 missing from cdms (→ KEPT,
    # mirroring the found-and-different-only skip at navteq.hpp:949-950)
    cdms = _cdms(spark, [(1, 100, 3)])
    rel = R.build_turn_restrictions(rdms, cdms, topo).collect()
    assert [r["cond_id"] for r in rel] == [101]


def test_incomplete_group_dropped(spark, topo):
    rdms = _rdms(spark, [(1, 100, 2, 0), (1, 100, 99, 1)])  # link 99 has no ways
    cdms = _cdms(spark, [(1, 100, 7)])
    assert R.build_turn_restrictions(rdms, cdms, topo).count() == 0


def test_two_way_via_node(spark, topo):
    import pandas as pd

    streets = synth.streets_from_geometries(
        spark, {1: [[0.0, 0.0], [1.0, 0.0]], 2: [[1.0, 0.0], [2.0, 0.0]]}
    )
    zlevels = synth.zlevels_table(spark, [])
    ways = ST.street_ways(streets, zlevels)
    nodes = ST.street_nodes(streets, zlevels)
    rdms = _rdms(spark, [(1, 100, 2, 0)])
    cdms = _cdms(spark, [(1, 100, 7)])
    rel = R.build_turn_restrictions(rdms, cdms, ways, nodes).collect()
    assert len(rel) == 1
    m = rel[0]["members"]
    roles = [(x["role"], x["mtype"]) for x in m]
    assert roles == [("from", "way"), ("via", "node"), ("to", "way")]
    # the via node is the shared endpoint (1.0, 0.0) → quantized (1e7, 0)
    via_ref = m[1]["ref"]
    node = [r for r in nodes.collect() if r["node_id"] == via_ref][0]
    assert node["lon_i"] == 10_000_000 and node["lat_i"] == 0


def test_z_split_links_resolve_through_chains(spark):
    """A link split into multiple sub-ways still resolves as one chain."""
    streets = synth.streets_from_geometries(
        spark,
        {1: [[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]], 2: [[3.0, 0.0], [4.0, 0.0]]},
    )
    zlevels = synth.zlevels_table(spark, [(1, [0, 1, 0, 0])])  # splits link 1
    ways = ST.street_ways(streets, zlevels)
    assert ways.where("link_id = 1").count() > 1
    rdms = _rdms(spark, [(1, 100, 2, 0)])
    cdms = _cdms(spark, [(1, 100, 7)])
    rel = R.build_turn_restrictions(rdms, cdms, ways).collect()
    assert len(rel) == 1
    roles = [x["role"] for x in rel[0]["members"]]
    assert roles[0] == "from" and roles[-1] == "to" and "via" in roles[1:-1]
