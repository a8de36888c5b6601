"""S7: OSM PBF sink (and a validating reader) — pure Python, no protobuf lib.

The reference delegates format handling to libosmium (`.pbf` suffix,
plugins/base_plugin.hpp:66-76); this module implements the public OSM PBF
wire format (https://wiki.openstreetmap.org/wiki/PBF_Format) directly:

  * fileformat: 4-byte big-endian BlobHeader length → BlobHeader
    (type="OSMHeader"/"OSMData", datasize) → Blob (zlib_data + raw_size).
  * osmformat: HeaderBlock (required_features "OsmSchema-V0.6"), then
    PrimitiveBlocks with a per-block string table, granularity 100
    (nanodegrees — our 1e-7° fixed-point ints store verbatim), plain Node
    groups plus delta-coded packed Way refs / Relation memids per spec.

Writer streams sorted partitions through the driver like the XML sink —
the output of record at scale is the table store; this is the interop
surface. The bundled reader exists to validate framing/encoding in tests
(osmium is not installed in this container) and for small-input ingest.
"""

from __future__ import annotations

import struct
import zlib

# --- protobuf primitives ----------------------------------------------------


def _varint(n: int) -> bytes:
    # protobuf int64 semantics: negatives encode as 64-bit two's complement
    # (10-byte varint). Without the mask Python's arithmetic right shift
    # never reaches 0 and a negative id would hang the writer.
    if n < 0:
        n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, n: int) -> bytes:
    return _key(field, 0) + _varint(n)


def _packed(field: int, values) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _len_field(field, body)


def _packed_zz(field: int, values) -> bytes:
    return _packed(field, (_zigzag(v) for v in values))


def _delta(values):
    prev = 0
    for v in values:
        yield v - prev
        prev = v


# --- string table -----------------------------------------------------------


class _StringTable:
    """Per-block string table; index 0 is the required empty string."""

    def __init__(self):
        self.idx = {"": 0}
        self.strings = [""]

    def get(self, s: str) -> int:
        i = self.idx.get(s)
        if i is None:
            i = len(self.strings)
            self.idx[s] = i
            self.strings.append(s)
        return i

    def encode(self) -> bytes:
        return b"".join(_len_field(1, s.encode("utf-8")) for s in self.strings)


# --- message encoders (osmformat.proto field numbers) ------------------------


def _encode_node(st: _StringTable, node_id: int, lat_i: int, lon_i: int, tags) -> bytes:
    body = _key(1, 0) + _varint(_zigzag(node_id))  # sint64 id
    if tags:
        body += _packed(2, (st.get(k) for k, _ in tags))
        body += _packed(3, (st.get(v) for _, v in tags))
    body += _key(8, 0) + _varint(_zigzag(lat_i))  # sint64 lat (granularity 100)
    body += _key(9, 0) + _varint(_zigzag(lon_i))
    return body


def _encode_way(st: _StringTable, way_id: int, refs, tags) -> bytes:
    body = _varint_field(1, way_id)  # int64 id
    if tags:
        body += _packed(2, (st.get(k) for k, _ in tags))
        body += _packed(3, (st.get(v) for _, v in tags))
    body += _packed_zz(8, _delta(refs))  # repeated sint64 refs, delta coded
    return body


_MEMBER_TYPE = {"node": 0, "way": 1, "relation": 2}
_MEMBER_NAME = {v: k for k, v in _MEMBER_TYPE.items()}


def _encode_relation(st: _StringTable, rel_id: int, members, tags) -> bytes:
    body = _varint_field(1, rel_id)
    if tags:
        body += _packed(2, (st.get(k) for k, _ in tags))
        body += _packed(3, (st.get(v) for _, v in tags))
    if members:
        body += _packed(8, (st.get(m[2]) for m in members))        # roles_sid
        body += _packed_zz(9, _delta(m[1] for m in members))       # memids
        body += _packed(10, (_MEMBER_TYPE[m[0]] for m in members))  # types
    return body


def _blob(block_type: str, payload: bytes) -> bytes:
    blob = _varint_field(2, len(payload)) + _len_field(3, zlib.compress(payload))
    header = _len_field(1, block_type.encode()) + _varint_field(3, len(blob))
    return struct.pack(">I", len(header)) + header + blob


def _header_block(generator: str) -> bytes:
    return (
        _len_field(4, b"OsmSchema-V0.6")
        + _len_field(16, generator.encode())
    )


def _primitive_block(st: _StringTable, groups: list[bytes]) -> bytes:
    body = _len_field(1, st.encode())
    for g in groups:
        body += _len_field(2, g)
    body += _varint_field(17, 100)  # granularity: 100 nanodeg = 1e-7°
    return body


# --- public writer ----------------------------------------------------------

GROUP_SIZE = 8000


def write_osm_pbf(out_path, nodes=None, ways=None, relations=None,
                  generator: str = "morituri_spark") -> dict:
    """Same DataFrame contract as io.osm_xml.write_osm_xml; returns counts.
    ``out_path`` may be a path or an open binary file object."""
    counts = {"nodes": 0, "ways": 0, "relations": 0}
    own = isinstance(out_path, (str, bytes))
    f = open(out_path, "wb") if own else out_path
    try:
        f.write(_blob("OSMHeader", _header_block(generator)))

        def flush(encoder, field, rows_iter, count_key):
            batch = []
            st = _StringTable()
            for row in rows_iter:
                batch.append(encoder(st, row))
                counts[count_key] += 1
                if len(batch) >= GROUP_SIZE:
                    group = b"".join(_len_field(field, b) for b in batch)
                    f.write(_blob("OSMData", _primitive_block(st, [group])))
                    batch, st = [], _StringTable()
            if batch:
                group = b"".join(_len_field(field, b) for b in batch)
                f.write(_blob("OSMData", _primitive_block(st, [group])))

        if nodes is not None:
            tag_cols = [c for c in nodes.columns if c not in ("node_id", "lon_i", "lat_i")]

            def enc_node(st, r):
                tags = [(c, str(r[c])) for c in tag_cols if r[c] is not None]
                return _encode_node(st, r["node_id"], r["lat_i"], r["lon_i"], tags)

            flush(enc_node, 1, nodes.orderBy("node_id").toLocalIterator(), "nodes")
        if ways is not None:
            tag_cols = [c for c in ways.columns if c not in ("way_id", "node_refs")]

            def enc_way(st, r):
                tags = [(c, str(r[c])) for c in tag_cols if r[c] is not None]
                return _encode_way(st, r["way_id"], list(r["node_refs"]), tags)

            flush(enc_way, 3, ways.orderBy("way_id").toLocalIterator(), "ways")
        if relations is not None:
            tag_cols = [c for c in relations.columns if c not in ("relation_id", "members")]

            def enc_rel(st, r):
                tags = [(c, str(r[c])) for c in tag_cols if r[c] is not None]
                members = [(m["mtype"], m["ref"], m["role"]) for m in r["members"]]
                return _encode_relation(st, r["relation_id"], members, tags)

            flush(enc_rel, 4, relations.orderBy("relation_id").toLocalIterator(), "relations")
    finally:
        if own:
            f.close()
    return counts


# --- sharded (executor-parallel) writer --------------------------------------

def _is_set(v) -> bool:
    return v is not None and v == v  # NaN-safe (pandas numeric nulls)


def write_osm_pbf_sharded(
    out_dir: str,
    nodes=None,
    ways=None,
    relations=None,
    shards: int = 8,
    generator: str = "morituri_spark",
) -> list[dict]:
    """Distributed PBF sink: the directory is the dataset (parquet part-file
    convention), each task writes one standalone shard — own OSMHeader +
    blocks — so the write parallelizes across executors instead of
    funnelling through the driver (the single-writer funnel the one-file
    ``write_osm_pbf`` interop sink has; r2 review item).

    Each object class range-partitions on its id and sorts within shards,
    and shard files are named by their first id, so lexicographic shard
    order == global id order (``<kind>-<first_id>.osm.pbf``). Executors
    must see a shared filesystem at ``out_dir`` (object store / NFS in
    production, trivially true in local mode).

    Returns the collected manifest: one ``{"shard", "n"}`` per file.
    """
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    manifest: list[dict] = []

    def run(df, kind, id_col, field, excl, enc):
        tag_cols = [c for c in df.columns if c not in excl]

        def write_parts(batches):
            # Task-commit protocol: write to a per-attempt temp name and
            # os.replace() (atomic on POSIX) to the final shard path only
            # after the file is complete. A speculative duplicate or a
            # retried task then can never interleave bytes with another
            # attempt — last complete attempt wins, both attempts are
            # whole files (r3 ADVICE item).
            from pyspark import TaskContext

            tc = TaskContext.get()
            attempt = tc.taskAttemptId() if tc is not None else 0
            f = None
            st = _StringTable()
            batch: list[bytes] = []
            n = 0
            path = None
            tmp_path = None

            def flush():
                group = b"".join(_len_field(field, b) for b in batch)
                f.write(_blob("OSMData", _primitive_block(st, [group])))

            for pdf in batches:
                for r in pdf.to_dict("records"):
                    if f is None:
                        path = os.path.join(
                            out_dir, f"{kind}-{int(r[id_col]):015d}.osm.pbf"
                        )
                        tmp_path = f"{path}.attempt-{attempt}.tmp"
                        f = open(tmp_path, "wb")
                        f.write(_blob("OSMHeader", _header_block(generator)))
                    tags = [(c, str(r[c])) for c in tag_cols if _is_set(r[c])]
                    batch.append(enc(st, r, tags))
                    n += 1
                    if len(batch) >= GROUP_SIZE:
                        flush()
                        batch, st = [], _StringTable()
            if f is not None:
                if batch:
                    flush()
                f.close()
                os.replace(tmp_path, path)
                yield pd.DataFrame({"shard": [os.path.basename(path)], "n": [n]})

        part = df.repartitionByRange(shards, id_col).sortWithinPartitions(id_col)
        rows = part.mapInPandas(write_parts, schema="shard string, n long").collect()
        manifest.extend({"shard": r["shard"], "n": r["n"]} for r in rows)

    if nodes is not None:
        run(
            nodes, "nodes", "node_id", 1, ("node_id", "lon_i", "lat_i"),
            lambda st, r, tags: _encode_node(st, int(r["node_id"]), int(r["lat_i"]), int(r["lon_i"]), tags),
        )
    if ways is not None:
        run(
            ways, "ways", "way_id", 3, ("way_id", "node_refs"),
            lambda st, r, tags: _encode_way(st, int(r["way_id"]), [int(x) for x in r["node_refs"]], tags),
        )
    if relations is not None:
        run(
            relations, "relations", "relation_id", 4, ("relation_id", "members"),
            lambda st, r, tags: _encode_relation(
                st, int(r["relation_id"]),
                [(m["mtype"], int(m["ref"]), m["role"]) for m in r["members"]], tags,
            ),
        )
    return sorted(manifest, key=lambda m: m["shard"])


def read_osm_pbf_dir(path: str) -> dict:
    """Merge-read a sharded PBF directory (shard name order == id order)."""
    import glob
    import os

    out = {"nodes": [], "ways": [], "relations": []}
    for shard in sorted(glob.glob(os.path.join(path, "*.osm.pbf"))):
        part = read_osm_pbf(shard)
        for k in out:
            out[k].extend(part[k])
    return out


# --- validating reader --------------------------------------------------------


class _Msg:
    """Minimal protobuf walker: {field: [values]} with wire-type awareness."""

    def __init__(self, buf: bytes):
        self.fields: dict[int, list] = {}
        pos = 0
        while pos < len(buf):
            tag, pos = _read_varint(buf, pos)
            field, wire = tag >> 3, tag & 7
            if wire == 0:
                v, pos = _read_varint(buf, pos)
            elif wire == 2:
                ln, pos = _read_varint(buf, pos)
                v = buf[pos : pos + ln]
                pos += ln
            elif wire == 5:
                v = buf[pos : pos + 4]
                pos += 4
            elif wire == 1:
                v = buf[pos : pos + 8]
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")
            self.fields.setdefault(field, []).append(v)

    def one(self, field, default=None):
        return self.fields.get(field, [default])[0]

    def all(self, field):
        return self.fields.get(field, [])


def _read_varint(buf: bytes, pos: int):
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _unpack(buf: bytes):
    pos, out = 0, []
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def read_osm_pbf(path: str) -> dict:
    """→ {'nodes': [(id, lat_i, lon_i, tags)], 'ways': [(id, refs, tags)],
    'relations': [(id, members, tags)]} — enough to validate round-trips
    and ingest small files."""
    out = {"nodes": [], "ways": [], "relations": []}
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if not raw:
                break
            (hlen,) = struct.unpack(">I", raw)
            header = _Msg(f.read(hlen))
            btype = header.one(1).decode()
            blob = _Msg(f.read(_unpack_one(header.one(3))))
            payload = blob.one(1)
            if payload is None:
                payload = zlib.decompress(blob.one(3))
            if btype == "OSMHeader":
                continue
            block = _Msg(payload)
            strings = [s.decode("utf-8") for s in _Msg(block.one(1)).all(1)]
            # granularity/offset (fields 17/19/20, defaults 100/0/0): values
            # normalize to the engine's 1e-7° fixed point (nanodeg / 100)
            gran = _unpack_one(block.one(17)) if block.one(17) is not None else 100
            lat_off = _unpack_one(block.one(19)) if block.one(19) is not None else 0
            lon_off = _unpack_one(block.one(20)) if block.one(20) is not None else 0

            def to_fixed(raw, off):
                return (off + gran * raw) // 100

            for graw in block.all(2):
                g = _Msg(graw)
                dense = g.one(2)
                if dense is not None:
                    # DenseNodes: delta-coded packed sint64 ids/lats/lons +
                    # interleaved keys_vals (0 terminates a node's tags) —
                    # what virtually every real-world PBF uses
                    d = _Msg(dense)
                    ids = _undelta(_unzigzag(v) for v in _unpack(d.one(1, b"")))
                    lats = _undelta(_unzigzag(v) for v in _unpack(d.one(8, b"")))
                    lons = _undelta(_unzigzag(v) for v in _unpack(d.one(9, b"")))
                    kv = _unpack(d.one(10, b""))
                    tag_iter = iter(kv)
                    for nid, la, lo in zip(ids, lats, lons):
                        tags = {}
                        for k in tag_iter:
                            if k == 0:
                                break
                            v = next(tag_iter)
                            tags[strings[k]] = strings[v]
                        out["nodes"].append(
                            (nid, to_fixed(la, lat_off), to_fixed(lo, lon_off), tags)
                        )
                for nraw in g.all(1):
                    n = _Msg(nraw)
                    tags = _tags(strings, n)
                    out["nodes"].append(
                        (
                            _unzigzag(n.one(1)),
                            to_fixed(_unzigzag(n.one(8)), lat_off),
                            to_fixed(_unzigzag(n.one(9)), lon_off),
                            tags,
                        )
                    )
                for wraw in g.all(3):
                    w = _Msg(wraw)
                    refs = _undelta(_unzigzag(v) for v in _unpack(w.one(8, b"")))
                    out["ways"].append((w.one(1), refs, _tags(strings, w)))
                for rraw in g.all(4):
                    r = _Msg(rraw)
                    roles = [strings[i] for i in _unpack(r.one(8, b""))]
                    memids = _undelta(_unzigzag(v) for v in _unpack(r.one(9, b"")))
                    types = [_MEMBER_NAME[t] for t in _unpack(r.one(10, b""))]
                    members = list(zip(types, memids, roles))
                    out["relations"].append((r.one(1), members, _tags(strings, r)))
    return out


def _unpack_one(v):
    return v if isinstance(v, int) else _read_varint(v, 0)[0]


def _undelta(vals):
    out, acc = [], 0
    for v in vals:
        acc += v
        out.append(acc)
    return out


def _tags(strings, msg: _Msg) -> dict:
    keys = _unpack(msg.one(2, b""))
    vals = _unpack(msg.one(3, b""))
    return {strings[k]: strings[v] for k, v in zip(keys, vals)}
