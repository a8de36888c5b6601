"""S7: OSM sink with suffix autodetection — XML / PBF / OPL, plus gzip/bz2.

Mirrors the reference's output contract (plugins/base_plugin.hpp:66-76):
``.osm`` → XML, ``.pbf`` → PBF, ``.opl`` → OPL; a trailing ``.gz`` or
``.bz2`` wraps the text formats in compression (PBF is already
block-compressed, so the reference — via libosmium — and we reject
compressing it again).

OPL ("object per line") is libosmium's line format: one row per object,
space-separated fields — ``n<id> v1 dV c1 t<ts> i1 u<user> T<k=v,..>
x<lon> y<lat>``, ways add ``N n<ref>,n<ref>``, relations
``M <t><ref>@<role>,..`` — with %-hex escaping of reserved chars.
"""

from __future__ import annotations

import bz2
import gzip

from pyspark.sql import DataFrame

from .osm_pbf import write_osm_pbf
from .osm_xml import DUMMY_TS, FIXED_POINT, write_osm_xml

_OPL_RESERVED = set(" \n,=@%")


def _opl_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in _OPL_RESERVED or ord(ch) < 0x21:
            out.append(f"%{ord(ch):x}%")
        else:
            out.append(ch)
    return "".join(out)


def _opl_tags(row, tag_cols) -> str:
    parts = [
        f"{_opl_escape(c)}={_opl_escape(str(row[c]))}" for c in tag_cols if row[c] is not None
    ]
    return ",".join(parts)


def _opl_meta(osm_id: int) -> str:
    return f"v1 dV c1 t{DUMMY_TS} i1 u{_opl_escape('morituri_spark')}"


def write_osm_opl(
    out, nodes: DataFrame | None = None, ways: DataFrame | None = None,
    relations: DataFrame | None = None,
) -> dict:
    """``out``: path or open text file object. Same DataFrame contract as
    write_osm_xml; returns per-class counts."""
    counts = {"nodes": 0, "ways": 0, "relations": 0}
    own = isinstance(out, (str, bytes))
    f = open(out, "w", encoding="utf-8") if own else out
    try:
        if nodes is not None:
            tag_cols = [c for c in nodes.columns if c not in ("node_id", "lon_i", "lat_i")]
            for r in nodes.orderBy("node_id").toLocalIterator():
                lon = r["lon_i"] / FIXED_POINT
                lat = r["lat_i"] / FIXED_POINT
                f.write(
                    f'n{r["node_id"]} {_opl_meta(r["node_id"])} T{_opl_tags(r, tag_cols)}'
                    f" x{lon:.7f} y{lat:.7f}\n"
                )
                counts["nodes"] += 1
        if ways is not None:
            tag_cols = [c for c in ways.columns if c not in ("way_id", "node_refs")]
            for r in ways.orderBy("way_id").toLocalIterator():
                refs = ",".join(f"n{x}" for x in r["node_refs"])
                f.write(
                    f'w{r["way_id"]} {_opl_meta(r["way_id"])} T{_opl_tags(r, tag_cols)} N{refs}\n'
                )
                counts["ways"] += 1
        if relations is not None:
            tag_cols = [c for c in relations.columns if c not in ("relation_id", "members")]
            for r in relations.orderBy("relation_id").toLocalIterator():
                ms = ",".join(
                    f'{m["mtype"][0]}{m["ref"]}@{_opl_escape(m["role"])}' for m in r["members"]
                )
                f.write(
                    f'r{r["relation_id"]} {_opl_meta(r["relation_id"])} '
                    f"T{_opl_tags(r, tag_cols)} M{ms}\n"
                )
                counts["relations"] += 1
    finally:
        if own:
            f.close()
    return counts


def write_osm(
    out_path: str,
    nodes: DataFrame | None = None,
    ways: DataFrame | None = None,
    relations: DataFrame | None = None,
) -> dict:
    """Suffix-dispatched sink (base_plugin.hpp:66-76): .osm/.pbf/.opl with
    optional .gz/.bz2 on the text formats; a ``.pbf.d`` directory suffix
    selects the executor-parallel sharded PBF sink."""
    path = out_path
    if path.rstrip("/").endswith(".pbf.d"):
        # directory convention → executor-parallel sharded PBF sink
        from .osm_pbf import write_osm_pbf_sharded

        manifest = write_osm_pbf_sharded(path.rstrip("/"), nodes, ways, relations)
        return {"shards": len(manifest), "objects": sum(m["n"] for m in manifest)}
    opener = open
    if path.endswith(".gz"):
        opener, path = gzip.open, path[: -len(".gz")]
    elif path.endswith(".bz2"):
        opener, path = bz2.open, path[: -len(".bz2")]

    if path.endswith(".pbf"):
        if opener is not open:
            raise ValueError("PBF is block-compressed; .pbf.gz/.bz2 is not supported")
        return write_osm_pbf(out_path, nodes, ways, relations)
    if path.endswith(".opl"):
        if opener is open:
            return write_osm_opl(out_path, nodes, ways, relations)
        with opener(out_path, "wt", encoding="utf-8") as f:
            return write_osm_opl(f, nodes, ways, relations)
    if path.endswith(".osm"):
        if opener is open:
            return write_osm_xml(out_path, nodes, ways, relations)
        # stream the XML writer through the compressor via a temp wrapper
        with opener(out_path, "wt", encoding="utf-8") as f:
            return write_osm_xml(f, nodes, ways, relations)
    raise ValueError(
        f"unsupported output format {out_path!r}: expected .osm/.pbf/.opl (+.gz/.bz2)"
    )
