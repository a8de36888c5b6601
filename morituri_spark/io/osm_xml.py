"""S7: OSM-XML export formatter (driver-side).

The reference writes nodes/ways/relations buffers as OSM XML/PBF/OPL
(plugins/navteq/navteq_plugin.cpp:100-111, header generator string, JOSM
upload disabled). In the Spark engine the OUTPUT OF RECORD is the table
store (parquet/Iceberg); this formatter exists for parity/interop — it
streams sorted partitions through the driver and never materializes the
dataset, so it works for the export sizes OSM XML is realistically used at.

Attribute conventions mirror the reference's dummy OSM metadata
(set_dummy_osm_object_attributes: version=1, changeset=1, a fixed
timestamp — navteq_mappings.hpp:143, navteq.hpp:83-88).
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

GENERATOR = "morituri_spark"
DUMMY_TS = "2000-01-01T00:00:00Z"  # fixed dummy timestamp, as the reference
FIXED_POINT = 10_000_000


def _attrs(osm_id: int) -> str:
    return (
        f'id="{osm_id}" version="1" changeset="1" '
        f'timestamp="{DUMMY_TS}" uid="1" user="morituri_spark"'
    )


def _tag_xml(k: str, v) -> str:
    if v is None:
        return ""
    return f"    <tag k={quoteattr(str(k))} v={quoteattr(str(v))}/>\n"


def write_osm_xml(
    out_path,
    nodes: DataFrame | None = None,
    ways: DataFrame | None = None,
    relations: DataFrame | None = None,
) -> dict:
    """Stream the three entity classes to one .osm file (``out_path``: path
    or an open text file object, e.g. a gzip wrapper from io.sink).

    Expected shapes (all optional columns may be missing):
      nodes:     node_id, lon_i, lat_i (fixed-point 1e-7°) + tag columns
      ways:      way_id, node_refs array<long> + tag columns
      relations: relation_id, members array<struct<mtype,ref,role>> + tags
    Entity-class order (nodes, ways, relations) matches the reference's
    buffer write order.
    """
    counts = {"nodes": 0, "ways": 0, "relations": 0}
    own = isinstance(out_path, (str, bytes))
    f = open(out_path, "w", encoding="utf-8") if own else out_path
    try:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(f'<osm version="0.6" upload="false" generator={quoteattr(GENERATOR)}>\n')

        if nodes is not None:
            tag_cols = [c for c in nodes.columns if c not in ("node_id", "lon_i", "lat_i")]
            for r in nodes.orderBy("node_id").toLocalIterator():
                lon = r["lon_i"] / FIXED_POINT
                lat = r["lat_i"] / FIXED_POINT
                tags = "".join(_tag_xml(c, r[c]) for c in tag_cols)
                if tags:
                    f.write(f'  <node {_attrs(r["node_id"])} lat="{lat:.7f}" lon="{lon:.7f}">\n{tags}  </node>\n')
                else:
                    f.write(f'  <node {_attrs(r["node_id"])} lat="{lat:.7f}" lon="{lon:.7f}"/>\n')
                counts["nodes"] += 1

        if ways is not None:
            tag_cols = [c for c in ways.columns if c not in ("way_id", "node_refs")]
            for r in ways.orderBy("way_id").toLocalIterator():
                f.write(f'  <way {_attrs(r["way_id"])}>\n')
                for ref in r["node_refs"]:
                    f.write(f'    <nd ref="{ref}"/>\n')
                f.write("".join(_tag_xml(c, r[c]) for c in tag_cols))
                f.write("  </way>\n")
                counts["ways"] += 1

        if relations is not None:
            tag_cols = [c for c in relations.columns if c not in ("relation_id", "members")]
            for r in relations.orderBy("relation_id").toLocalIterator():
                f.write(f'  <relation {_attrs(r["relation_id"])}>\n')
                for m in r["members"]:
                    f.write(
                        f'    <member type={quoteattr(m["mtype"])} ref="{m["ref"]}" '
                        f'role={quoteattr(m["role"])}/>\n'
                    )
                f.write("".join(_tag_xml(c, r[c]) for c in tag_cols))
                f.write("  </relation>\n")
                counts["relations"] += 1

        f.write("</osm>\n")
    finally:
        if own:
            f.close()
    return counts
