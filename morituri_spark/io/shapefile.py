"""S1/S2: pure-Python ESRI Shapefile (.shp/.shx) and dBASE (.dbf) readers.

The reference ingests NAVSTREETS layers through OGR (`plugins/readers.hpp:
24-42` opens `.shp` via `OGRSFDriverRegistrar` and `.dbf` via `DBFOpen`;
`util.hpp:92-108` reads typed DBF fields). GDAL is not available in this
container, but both formats are simple public binary specs (ESRI Shapefile
Technical Description, July 1998; dBASE III header layout), so this module
implements them directly — the same choice already made for the OSM PBF
wire format.

Spark-first shape: the `.shx` index (fixed 8-byte records) and the DBF
header (fixed record size) give O(1) record offsets, so the Spark readers
fan record RANGES out to executors and each task seeks/parses its slice —
the file never streams through the driver. At real scale the files sit on
shared storage (the same assumption the reference's file readers make).

Supported geometry: Null (0), Point (1), PolyLine (3), Polygon (5),
MultiPoint (8) + their Z/M variants (XY coordinates parsed, Z/M tails
skipped via the record length — matching the reference pipeline, which
only consumes XY). DBF field types: C (char), N/F (numeric), L (logical),
D (date) — all surfaced as trimmed strings, mirroring `DBFReadStringAttribute`
in `util.hpp:99` (the engine's tag parsers take strings).
"""

from __future__ import annotations

import os
import struct

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
_XY_BASE = {0, 1, 3, 5, 8}


def _base_type(shape_type: int) -> int:
    """Z (11-18) and M (21-28) variants share the XY prefix layout."""
    if shape_type in _XY_BASE:
        return shape_type
    if shape_type in (11, 13, 15, 18):
        return shape_type - 10
    if shape_type in (21, 23, 25, 28):
        return shape_type - 20
    raise ValueError(f"unsupported shape type {shape_type}")


# ---------------------------------------------------------------------------
# .shp / .shx
# ---------------------------------------------------------------------------


def read_shp_header(buf: bytes) -> dict:
    """100-byte main header → {shape_type, bbox, file_length_bytes}."""
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"not a shapefile (file code {code})")
    (length_words,) = struct.unpack_from(">i", buf, 24)
    version, shape_type = struct.unpack_from("<ii", buf, 28)
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    bbox = struct.unpack_from("<4d", buf, 36)
    return {
        "shape_type": shape_type,
        "bbox": list(bbox),
        "file_length_bytes": length_words * 2,
    }


def read_shx_offsets(path: str) -> list[tuple[int, int]]:
    """.shx → [(byte_offset, content_length_bytes)] per record."""
    with open(path, "rb") as f:
        buf = f.read()
    read_shp_header(buf[:100])
    out = []
    for pos in range(100, len(buf), 8):
        off_w, len_w = struct.unpack_from(">ii", buf, pos)
        out.append((off_w * 2, len_w * 2))
    return out


def _parse_record_content(buf: bytes) -> tuple[int, list[list[list[float]]]]:
    """Record content → (shape_type, parts) where parts is a list of
    coordinate sequences ([[x, y], ...]); Point/MultiPoint yield one part."""
    (shape_type,) = struct.unpack_from("<i", buf, 0)
    if shape_type == SHAPE_NULL:
        return shape_type, []
    base = _base_type(shape_type)
    if base == SHAPE_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        return shape_type, [[[x, y]]]
    if base == SHAPE_MULTIPOINT:
        (n_points,) = struct.unpack_from("<i", buf, 36)
        pts = struct.unpack_from(f"<{2 * n_points}d", buf, 40)
        return shape_type, [[[pts[2 * i], pts[2 * i + 1]] for i in range(n_points)]]
    # PolyLine / Polygon: bbox(32) + numParts + numPoints + parts + points
    n_parts, n_points = struct.unpack_from("<2i", buf, 36)
    parts = struct.unpack_from(f"<{n_parts}i", buf, 44)
    pts_off = 44 + 4 * n_parts
    pts = struct.unpack_from(f"<{2 * n_points}d", buf, pts_off)
    bounds = list(parts) + [n_points]
    out = []
    for p in range(n_parts):
        out.append(
            [[pts[2 * i], pts[2 * i + 1]] for i in range(bounds[p], bounds[p + 1])]
        )
    return shape_type, out


def iter_shp_records(path: str):
    """Yield (record_number, shape_type, parts) from a .shp sequentially
    (record headers carry the lengths; no .shx needed)."""
    with open(path, "rb") as f:
        header = read_shp_header(f.read(100))
        end = header["file_length_bytes"]
        pos = 100
        while pos + 8 <= end:
            rec_hdr = f.read(8)
            if len(rec_hdr) < 8:
                break
            recno, len_w = struct.unpack(">ii", rec_hdr)
            content = f.read(len_w * 2)
            shape_type, parts = _parse_record_content(content)
            yield recno, shape_type, parts
            pos += 8 + len_w * 2


# ---------------------------------------------------------------------------
# .dbf
# ---------------------------------------------------------------------------


class DbfHeader:
    def __init__(self, n_records, header_size, record_size, fields, encoding):
        self.n_records = n_records
        self.header_size = header_size
        self.record_size = record_size
        self.fields = fields  # [(name, type_char, length)]
        self.encoding = encoding


def read_dbf_header(path: str, encoding: str | None = None) -> DbfHeader:
    with open(path, "rb") as f:
        head = f.read(32)
        n_records, header_size, record_size = struct.unpack_from("<iHH", head, 4)
        fields = []
        pos = 32
        raw = f.read(header_size - 32)
        while pos - 32 < len(raw) and raw[pos - 32] != 0x0D:
            desc = raw[pos - 32 : pos - 32 + 32]
            name = desc[:11].split(b"\x00", 1)[0].decode("ascii", "replace")
            ftype = chr(desc[11])
            length = desc[16]
            fields.append((name, ftype, length))
            pos += 32
    if encoding is None:
        # sibling .cpg names the encoding (the faroe fixture says UTF-8);
        # latin-1 is the dBASE default
        cpg = os.path.splitext(path)[0] + ".cpg"
        encoding = "latin-1"
        if os.path.exists(cpg):
            with open(cpg) as f:
                encoding = f.read().strip() or "latin-1"
    return DbfHeader(n_records, header_size, record_size, fields, encoding)


def parse_dbf_record(buf: bytes, fields, encoding: str):
    """One fixed-width record (without deletion flag) → list of trimmed
    strings (None for deleted handled by caller)."""
    out, pos = [], 0
    for _name, _ftype, length in fields:
        out.append(buf[pos : pos + length].decode(encoding, "replace").strip())
        pos += length
    return out


def iter_dbf_records(path: str, encoding: str | None = None):
    hdr = read_dbf_header(path, encoding)
    with open(path, "rb") as f:
        f.seek(hdr.header_size)
        for _ in range(hdr.n_records):
            rec = f.read(hdr.record_size)
            if len(rec) < hdr.record_size:
                break
            if rec[0:1] == b"*":  # deleted
                continue
            yield parse_dbf_record(rec[1:], hdr.fields, hdr.encoding)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def shp_df(spark, path: str, tasks: int = 16):
    """.shp → DataFrame (fid, shape_type, parts). Record offsets come from
    the .shx index driver-side (8 bytes/record — tiny); parsing fans out to
    executors, each seeking only its slice."""
    import pandas as pd

    shx = os.path.splitext(path)[0] + ".shx"
    offsets = read_shx_offsets(shx)
    rows = [(i + 1, off, ln) for i, (off, ln) in enumerate(offsets)]
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["fid", "off", "len"])
    ).repartition(min(tasks, max(len(rows), 1)))

    def parse(batches):
        with open(path, "rb") as f:
            for pdf in batches:
                out = {"fid": [], "shape_type": [], "parts": []}
                for fid, off, ln in zip(pdf["fid"], pdf["off"], pdf["len"]):
                    f.seek(int(off) + 8)  # skip the record header
                    shape_type, parts = _parse_record_content(f.read(int(ln)))
                    out["fid"].append(int(fid))
                    out["shape_type"].append(shape_type)
                    out["parts"].append(parts)
                yield pd.DataFrame(out)

    return src.mapInPandas(
        parse, "fid long, shape_type int, parts array<array<array<double>>>"
    )


def dbf_df(spark, path: str, tasks: int = 16, encoding: str | None = None):
    """.dbf → DataFrame (fid + one string column per field). Fixed record
    size gives O(1) offsets; record ranges fan out to executors."""
    import pandas as pd

    hdr = read_dbf_header(path, encoding)
    names = [n for n, _t, _l in hdr.fields]
    rows = [(i + 1, hdr.header_size + i * hdr.record_size) for i in range(hdr.n_records)]
    src = spark.createDataFrame(
        pd.DataFrame(rows, columns=["fid", "off"])
    ).repartition(min(tasks, max(len(rows), 1)))

    def parse(batches):
        with open(path, "rb") as f:
            for pdf in batches:
                out = {"fid": [], **{n: [] for n in names}}
                for fid, off in zip(pdf["fid"], pdf["off"]):
                    f.seek(int(off))
                    rec = f.read(hdr.record_size)
                    if rec[0:1] == b"*":
                        continue
                    vals = parse_dbf_record(rec[1:], hdr.fields, hdr.encoding)
                    out["fid"].append(int(fid))
                    for n, v in zip(names, vals):
                        out[n].append(v)
                yield pd.DataFrame(out)

    schema = "fid long, " + ", ".join(f"`{n}` string" for n in names)
    return src.mapInPandas(parse, schema)


def shapefile_table(spark, base: str, tasks: int = 16):
    """Layer = geometry (.shp) ⨝ attributes (.dbf) on fid — the combined
    frame the reference's OGR feature loop sees (readers.hpp:24-42)."""
    base_noext = os.path.splitext(base)[0]
    geo = shp_df(spark, base_noext + ".shp", tasks)
    attrs = dbf_df(spark, base_noext + ".dbf", tasks)
    return geo.join(attrs, "fid")


# ---------------------------------------------------------------------------
# writers (test fixtures / interop)
# ---------------------------------------------------------------------------


def write_shp(path: str, shapes: list[tuple[int, list]], shape_type: int) -> None:
    """Minimal .shp + .shx writer (polyline/polygon/point) for fixtures and
    round-trip tests. ``shapes``: [(fid, parts)] with parts as in
    ``_parse_record_content``."""
    records = []
    for fid, parts in shapes:
        if _base_type(shape_type) == SHAPE_POINT:
            content = struct.pack("<i2d", shape_type, *parts[0][0])
        else:
            flat = [xy for part in parts for xy in part]
            xs = [p[0] for p in flat]
            ys = [p[1] for p in flat]
            part_idx, acc = [], 0
            for part in parts:
                part_idx.append(acc)
                acc += len(part)
            content = struct.pack(
                "<i4d2i", shape_type, min(xs), min(ys), max(xs), max(ys),
                len(parts), len(flat),
            )
            content += struct.pack(f"<{len(part_idx)}i", *part_idx)
            content += b"".join(struct.pack("<2d", *p) for p in flat)
        records.append((fid, content))

    def header(total_bytes, bbox):
        return (
            struct.pack(">i", 9994) + b"\x00" * 20
            + struct.pack(">i", total_bytes // 2)
            + struct.pack("<ii", 1000, shape_type)
            + struct.pack("<8d", *bbox, 0.0, 0.0, 0.0, 0.0)
        )

    all_pts = [xy for _fid, parts in shapes for part in parts for xy in part]
    bbox = (
        min(p[0] for p in all_pts), min(p[1] for p in all_pts),
        max(p[0] for p in all_pts), max(p[1] for p in all_pts),
    ) if all_pts else (0.0, 0.0, 0.0, 0.0)

    shp_len = 100 + sum(8 + len(c) for _f, c in records)
    shx_len = 100 + 8 * len(records)
    with open(path, "wb") as f, open(os.path.splitext(path)[0] + ".shx", "wb") as fx:
        f.write(header(shp_len, bbox))
        fx.write(header(shx_len, bbox))
        pos = 100
        for fid, content in records:
            f.write(struct.pack(">ii", fid, len(content) // 2) + content)
            fx.write(struct.pack(">ii", pos // 2, len(content) // 2))
            pos += 8 + len(content)


def write_dbf(path: str, fields: list[tuple[str, str, int]], rows: list[list[str]],
              encoding: str = "latin-1") -> None:
    """Minimal dBASE III writer for fixtures: C/N fields, space padding."""
    record_size = 1 + sum(ln for _n, _t, ln in fields)
    header_size = 32 + 32 * len(fields) + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<4BiHH", 3, 95, 7, 26, len(rows), header_size, record_size))
        f.write(b"\x00" * 20)
        for name, ftype, ln in fields:
            desc = name.encode("ascii")[:11].ljust(11, b"\x00")
            desc += ftype.encode("ascii") + b"\x00" * 4 + bytes([ln, 0]) + b"\x00" * 14
            f.write(desc)
        f.write(b"\x0d")
        for row in rows:
            f.write(b" ")
            for (name, ftype, ln), val in zip(fields, row):
                enc = str(val).encode(encoding)[:ln]
                f.write(enc.rjust(ln) if ftype in "NF" else enc.ljust(ln))
