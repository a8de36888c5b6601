"""Entry point 3: admin boundaries — A4 meta groups, W4 ways, J6 relations."""

import pytest
from pyspark.sql import functions as F

from morituri_spark.operators import admin as A
from morituri_spark.sources import synth


@pytest.fixture(scope="module")
def out(spark):
    adminbndy = synth.adminbndy_table(spark)
    mtd = synth.mtd_area_table(spark)
    return A.convert_admin_boundaries(adminbndy, mtd)


def test_relations(spark, out):
    rels = {r["area_id"]: r for r in out["relations"].collect()}
    assert len(rels) == 5
    # F3: admin_level = 2 × navteq level; area 1 has lvl 1
    assert rels[1]["admin_level"] == "2"
    assert rels[3]["admin_level"] == "10"
    assert rels[1]["type"] == "multipolygon" and rels[1]["boundary"] == "administrative"
    # A4/F1/F4: localized names camel-cased with iso-639-1 langs
    names = {x["lang"]: x["name"] for x in rels[1]["localized_names"]}
    assert names == {"en": "United Kingdom", "fr": "Royaume-Uni"}
    # annulus: area 5 → 1 outer + 1 inner way
    assert len(rels[5]["outer_way_ids"]) == 1
    assert len(rels[5]["inner_way_ids"]) == 1
    # rect areas: single outer ring, no inner
    assert rels[2]["inner_way_ids"] == []
    # relation ids dense
    rel_ids = sorted(r["relation_id"] for r in rels.values())
    assert rel_ids == [1, 2, 3, 4, 5]


def test_ways_and_nodes(spark, out):
    ways = out["ways"].collect()
    # small rings → one way per ring; 5 areas, area 5 has 2 rings → 6 ways
    assert len(ways) == 6
    assert sorted(r["way_id"] for r in ways) == list(range(1, 7))
    # each way closes on its ring's first node
    for w in ways:
        assert w["way_nodes"][0] == w["way_nodes"][-1]
    nodes = out["nodes"].collect()
    # fresh nodes per ring: sum over rings of ring point count (closing
    # node shares the first node's id, so distinct pos = n-1... but the
    # node LIST includes the repeated first at a distinct pos) — node
    # universe here is distinct (ring, pos): ring of n points → n
    per_ring = {}
    for r in synth.adminbndy_table(spark).collect():
        for i, ring in enumerate(r["rings"]):
            per_ring[(r["AREA_ID"], i)] = len(ring)
    # distinct positions per ring = len(way list) = ring size (n-1 points + closing ref)
    assert len(nodes) == sum(per_ring.values())


def test_no_cross_boundary_dedup(spark, out):
    """Areas 2 and 4 share the border lon=5 — nodes must NOT be shared."""
    nodes = out["nodes"]
    dupes = (
        nodes.groupBy(F.col("pt")[0].alias("x"), F.col("pt")[1].alias("y"))
        .count()
        .where("count > 1")
        .count()
    )
    assert dupes > 0  # shared corners exist as separate nodes


def test_multipolygon_ring_roles(spark):
    """A boundary with two disjoint exteriors + one hole: roles come from
    containment-depth parity, not ring position (navteq.hpp:787-797)."""
    roles = A.ring_roles(
        [
            synth._rect(0.0, 0.0, 2.0, 2.0),      # island A
            synth._rect(0.5, 0.5, 1.5, 1.5),      # hole in A
            synth._rect(3.0, 0.0, 4.0, 1.0),      # island B (not rings[0]!)
        ]
    )
    assert roles == [True, False, True]

    bndy = spark.createDataFrame(
        [(9, 1, [synth._rect(0.0, 0.0, 2.0, 2.0),
                 synth._rect(0.5, 0.5, 1.5, 1.5),
                 synth._rect(3.0, 0.0, 4.0, 1.0)])],
        synth.adminbndy_table(spark).schema,
    )
    out = A.convert_admin_boundaries(bndy, synth.mtd_area_table(spark))
    rel = out["relations"].collect()[0]
    assert len(rel["outer_way_ids"]) == 2
    assert len(rel["inner_way_ids"]) == 1


def test_admin_meta_groups(spark):
    meta = {r["AREA_ID"]: r for r in A.admin_meta_groups(synth.mtd_area_table(spark)).collect()}
    assert meta[1]["ADMIN_LVL"] == 1 and not meta[1]["admin_lvl_conflict"]
    assert meta[5]["localized_names"][0]["name"] == "Koebenhavn K"
