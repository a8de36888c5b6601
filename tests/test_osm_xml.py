"""S7 OSM-XML export: well-formedness + entity/tag fidelity."""

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from morituri_spark.io.osm_xml import write_osm_xml
from morituri_spark.operators import restrictions as R
from morituri_spark.operators import streets as ST
from morituri_spark.sources import synth


def test_export_roundtrip(spark, tmp_path):
    streets = synth.streets_from_geometries(
        spark,
        {1: [[0.0, 0.0], [1.0, 0.0]], 2: [[1.0, 0.0], [2.0, 0.0]]},
    )
    zlevels = synth.zlevels_table(spark, [])
    ways = ST.street_ways(streets, zlevels)
    nodes = ST.street_nodes(streets, zlevels)
    rdms = spark.createDataFrame([(1, 100, 2, 0)], "LINK_ID long, COND_ID long, MAN_LINKID long, SEQ int")
    cdms = spark.createDataFrame([(1, 100, 7)], "LINK_ID long, COND_ID long, COND_TYPE int")
    rels = R.build_turn_restrictions(rdms, cdms, ways, nodes)

    # shape the ways frame for export: node_refs from quantized endpoints
    from morituri_spark.operators.nodes import quantize

    way_export = ways.select(
        "way_id",
        F.array(
            quantize(F.element_at("way_geometry", 1)[0]),
            quantize(F.element_at("way_geometry", -1)[0]),
        ).alias("node_refs"),
        "highway", "name", "oneway",
    )
    out = str(tmp_path / "export.osm")
    counts = write_osm_xml(
        out,
        nodes=nodes.select("node_id", "lon_i", "lat_i"),
        ways=way_export,
        relations=rels.select("relation_id", "members", "restriction", "type"),
    )
    assert counts == {"nodes": 3, "ways": 2, "relations": 1}

    tree = ET.parse(out)  # well-formed XML
    root = tree.getroot()
    assert root.tag == "osm" and root.get("upload") == "false"
    assert len(root.findall("node")) == 3
    assert len(root.findall("way")) == 2
    rel = root.findall("relation")[0]
    roles = [m.get("role") for m in rel.findall("member")]
    assert roles == ["from", "via", "to"]
    tags = {t.get("k"): t.get("v") for t in rel.findall("tag")}
    assert tags == {"restriction": "no_straight_on", "type": "restriction"}
    # entity order: all nodes before ways before relations
    kinds = [c.tag for c in root]
    assert kinds == sorted(kinds, key=["node", "way", "relation"].index)


def test_export_escapes_special_chars(spark, tmp_path):
    nodes = spark.createDataFrame(
        [(1, 10_000_000, 20_000_000, 'Quote " & <tag>')],
        "node_id long, lon_i long, lat_i long, name string",
    )
    out = str(tmp_path / "esc.osm")
    write_osm_xml(out, nodes=nodes)
    root = ET.parse(out).getroot()
    assert root.find("node/tag").get("v") == 'Quote " & <tag>'
