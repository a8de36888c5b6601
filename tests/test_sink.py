"""S7 sink formats (PBF/OPL/gz/bz2 + autodetect) and the §2.9 plugin
registry."""

import bz2
import gzip
import os
import xml.etree.ElementTree as ET

import pytest

from morituri_spark import plugins as P
from morituri_spark.io.osm_pbf import read_osm_pbf, write_osm_pbf
from morituri_spark.io.sink import write_osm
from morituri_spark.sources import synth


@pytest.fixture(scope="module")
def entities(spark):
    nodes = spark.createDataFrame(
        [(1, 10_000_000, 20_000_000, "First & Main"), (2, 10_500_000, 20_500_000, None)],
        "node_id long, lon_i long, lat_i long, name string",
    )
    ways = spark.createDataFrame(
        [(10, [1, 2], "residential", "Elm St")],
        "way_id long, node_refs array<long>, highway string, name string",
    )
    relations = spark.createDataFrame(
        [(100, [{"mtype": "way", "ref": 10, "role": "from"},
                {"mtype": "node", "ref": 2, "role": "via"}], "restriction")],
        "relation_id long, members array<struct<mtype string, ref long, role string>>, type string",
    )
    return nodes, ways, relations


def test_pbf_roundtrip(spark, tmp_path, entities):
    nodes, ways, relations = entities
    out = str(tmp_path / "export.osm.pbf")
    counts = write_osm_pbf(out, nodes=nodes, ways=ways, relations=relations)
    assert counts == {"nodes": 2, "ways": 1, "relations": 1}
    back = read_osm_pbf(out)
    assert back["nodes"][0] == (1, 20_000_000, 10_000_000, {"name": "First & Main"})
    assert back["nodes"][1][3] == {}  # null tag omitted
    wid, refs, wtags = back["ways"][0]
    assert (wid, refs) == (10, [1, 2])
    assert wtags == {"highway": "residential", "name": "Elm St"}
    rid, members, rtags = back["relations"][0]
    assert rid == 100 and rtags == {"type": "restriction"}
    assert members == [("way", 10, "from"), ("node", 2, "via")]


def test_pbf_many_groups(spark, tmp_path):
    n = 20_000  # > GROUP_SIZE → multiple PrimitiveBlocks
    nodes = spark.range(n).selectExpr(
        "id AS node_id", "CAST(id * 10 AS LONG) AS lon_i", "CAST(id * 7 AS LONG) AS lat_i"
    )
    out = str(tmp_path / "big.osm.pbf")
    counts = write_osm_pbf(out, nodes=nodes)
    assert counts["nodes"] == n
    back = read_osm_pbf(out)
    assert len(back["nodes"]) == n
    assert back["nodes"][12345][:3] == (12345, 12345 * 7, 12345 * 10)


def test_opl_format(spark, tmp_path, entities):
    nodes, ways, relations = entities
    out = str(tmp_path / "export.opl")
    counts = write_osm(out, nodes=nodes, ways=ways, relations=relations)
    assert counts == {"nodes": 2, "ways": 1, "relations": 1}
    lines = open(out).read().splitlines()
    assert lines[0].startswith("n1 ") and " x1.0000000 y2.0000000" in lines[0]
    # OPL %hex% escaping: spaces escaped, '&' is not a reserved char
    assert "Tname=First%20%&%20%Main" in lines[0]
    assert lines[2].startswith("w10 ") and lines[2].endswith(" Nn1,n2")
    assert lines[3].startswith("r100 ") and lines[3].endswith(" Mw10@from,n2@via")


def test_sink_autodetect_and_compression(spark, tmp_path, entities):
    nodes, _, _ = entities
    for suffix, opener in (("osm.gz", gzip.open), ("osm.bz2", bz2.open), ("opl.gz", gzip.open)):
        out = str(tmp_path / f"export.{suffix}")
        write_osm(out, nodes=nodes)
        with opener(out, "rt", encoding="utf-8") as f:
            content = f.read()
        assert "n1" in content or "<node" in content
    # plain xml still works through the dispatcher
    out = str(tmp_path / "plain.osm")
    write_osm(out, nodes=nodes)
    assert ET.parse(out).getroot().tag == "osm"
    with pytest.raises(ValueError):
        write_osm(str(tmp_path / "x.pbf.gz"), nodes=nodes)
    with pytest.raises(ValueError):
        write_osm(str(tmp_path / "x.csv"), nodes=nodes)


def test_plugin_registry_dispatch(spark, tmp_path):
    """comm2osm.cpp:72-81: dummy registered first but never accepts; navteq
    accepts a directory with the required tables, converts, writes the
    suffix-dispatched sink."""
    d = str(tmp_path / "input")
    os.makedirs(d)
    streets = synth.streets_table(spark, n=30, n_vertices=4)
    streets.write.parquet(f"{d}/streets.parquet")
    synth.zlevels_table(spark, [(10_000 + i, [0, 1, 1, 0]) for i in range(0, 30, 3)]).write.parquet(f"{d}/zlevels.parquet")
    cdms = synth.cdms_table(spark, 30)
    cdms.write.parquet(f"{d}/cdms.parquet")
    synth.cnd_mod_table(spark, cdms).write.parquet(f"{d}/cnd_mod.parquet")
    synth.mtd_area_table(spark).write.parquet(f"{d}/mtd_area.parquet")
    synth.mtd_cntry_ref_table(spark).write.parquet(f"{d}/mtd_cntry_ref.parquet")

    P.default_registry()
    out = str(tmp_path / "out.osm.pbf")
    res = P.run_plugins(spark, d, out)
    assert res["plugin"] == "navteq"
    assert res["result"]["ways"] > 0 and res["result"]["nodes"] > 0
    assert res["result"]["sink"]["ways"] == res["result"]["ways"]
    back = read_osm_pbf(out)
    assert len(back["ways"]) == res["result"]["ways"]

    with pytest.raises(ValueError):
        P.run_plugins(spark, str(tmp_path))  # no plugin accepts a random dir


def test_pbf_reader_decodes_dense_nodes():
    """DenseNodes (PrimitiveGroup field 2 — what real-world PBFs use):
    delta-coded ids/lats/lons, interleaved keys_vals, granularity scaling.
    Hand-built wire bytes; ADVICE r2 flagged the silent zero-node return,
    round 3 implements the decode."""
    import struct
    import tempfile

    from morituri_spark.io import osm_pbf as P

    # two nodes: ids 10, 12; lat/lon raw units at granularity 1000
    # (i.e. 1e-6°): node A (57.1, -2.5), node B (57.2, -2.4); A tagged
    # highway=bus_stop, B untagged
    strings = (
        P._len_field(1, b"") + P._len_field(1, b"highway") + P._len_field(1, b"bus_stop")
    )
    ids = [10, 2]                      # delta: 10, 12
    lats = [57_100_000, 100_000]       # delta sums: 57.1e6, 57.2e6 (1e-6°)
    lons = [-2_500_000, 100_000]
    kv = [1, 2, 0, 0]                  # node A: highway=bus_stop; node B: none
    dense = (
        P._packed_zz(1, ids)
        + P._packed_zz(8, lats)
        + P._packed_zz(9, lons)
        + P._packed(10, kv)
    )
    group = P._len_field(2, dense)
    block = (
        P._len_field(1, strings) + P._len_field(2, group)
        + P._varint_field(17, 1000)   # granularity: 1e-6°
    )
    blob = P._len_field(1, block)
    header = P._len_field(1, b"OSMData") + P._varint_field(3, len(blob))
    hdr_block = P._len_field(1, P._len_field(1, b"OsmSchema-V0.6"))
    hdr_blob = P._len_field(1, hdr_block)
    hdr_header = P._len_field(1, b"OSMHeader") + P._varint_field(3, len(hdr_blob))
    with tempfile.NamedTemporaryFile(suffix=".pbf", delete=False) as f:
        f.write(struct.pack(">I", len(hdr_header)) + hdr_header + hdr_blob)
        f.write(struct.pack(">I", len(header)) + header + blob)
        path = f.name
    out = P.read_osm_pbf(path)
    # normalized to the engine's 1e-7° fixed point
    assert out["nodes"] == [
        (10, 571_000_000, -25_000_000, {"highway": "bus_stop"}),
        (12, 572_000_000, -24_000_000, {}),
    ]


def test_varint_negative_id_two_complement():
    """Negative int64 ids encode as 64-bit two's complement (10-byte
    varint) instead of hanging the writer."""
    from morituri_spark.io.osm_pbf import _varint

    buf = _varint(-1)
    assert len(buf) == 10
    # decode back
    val, shift = 0, 0
    for b in buf:
        val |= (b & 0x7F) << shift
        shift += 7
    assert val & 0xFFFFFFFFFFFFFFFF == 0xFFFFFFFFFFFFFFFF


def test_cli_module_entry(spark, tmp_path):
    """`python -m morituri_spark INFILE OUTFILE` — the comm2osm command
    surface (in-process via main(); the session is reused)."""
    from morituri_spark.__main__ import main

    d = str(tmp_path / "cli_input")
    os.makedirs(d)
    streets = synth.streets_table(spark, n=20, n_vertices=4)
    streets.write.parquet(f"{d}/streets.parquet")
    synth.zlevels_table(spark, []).write.parquet(f"{d}/zlevels.parquet")
    cdms = synth.cdms_table(spark, 20)
    cdms.write.parquet(f"{d}/cdms.parquet")
    synth.cnd_mod_table(spark, cdms).write.parquet(f"{d}/cnd_mod.parquet")
    synth.mtd_area_table(spark).write.parquet(f"{d}/mtd_area.parquet")

    out = str(tmp_path / "cli_out.osm")
    assert main([d, out]) == 0
    root = ET.parse(out).getroot()
    assert root.tag == "osm" and len(root.findall("way")) > 0


def test_pbf_sharded_roundtrip(spark, tmp_path, entities):
    from morituri_spark.io.osm_pbf import read_osm_pbf_dir, write_osm_pbf_sharded

    nodes, ways, relations = entities
    out = str(tmp_path / "sharded")
    manifest = write_osm_pbf_sharded(
        out, nodes=nodes, ways=ways, relations=relations, shards=2
    )
    assert sum(m["n"] for m in manifest) == 4
    back = read_osm_pbf_dir(out)
    assert [n[0] for n in back["nodes"]] == [1, 2]
    assert back["nodes"][0] == (1, 20_000_000, 10_000_000, {"name": "First & Main"})
    assert back["ways"][0][:2] == (10, [1, 2])
    assert back["relations"][0][1] == [("way", 10, "from"), ("node", 2, "via")]


def test_pbf_sharded_parallel_matches_single_writer(spark, tmp_path):
    from morituri_spark.io.osm_pbf import (
        read_osm_pbf, read_osm_pbf_dir, write_osm_pbf, write_osm_pbf_sharded,
    )

    n = 25_000  # > GROUP_SIZE, split over several shards
    nodes = spark.range(n).selectExpr(
        "id AS node_id", "CAST(id * 10 AS LONG) AS lon_i", "CAST(id * 7 AS LONG) AS lat_i",
        "CASE WHEN id % 3 = 0 THEN concat('poi', id) END AS name",
    )
    single = str(tmp_path / "single.osm.pbf")
    write_osm_pbf(single, nodes=nodes)
    out = str(tmp_path / "sharded_big")
    manifest = write_osm_pbf_sharded(out, nodes=nodes, shards=4)
    assert len(manifest) == 4 and sum(m["n"] for m in manifest) == n
    # shard name order == id order, content identical to the driver writer
    assert read_osm_pbf_dir(out)["nodes"] == read_osm_pbf(single)["nodes"]


def test_sink_autodetect_sharded_dir(spark, tmp_path, entities):
    from morituri_spark.io.osm_pbf import read_osm_pbf_dir

    nodes, ways, relations = entities
    out = str(tmp_path / "export.osm.pbf.d")
    result = write_osm(out, nodes=nodes, ways=ways, relations=relations)
    assert result["objects"] == 4 and result["shards"] >= 3
    back = read_osm_pbf_dir(out)
    assert len(back["nodes"]) == 2 and len(back["ways"]) == 1 and len(back["relations"]) == 1
