"""Baseline sequential JPEG (ITU-T T.81) — pure NumPy + stdlib, no libjpeg.

Closes the r3 verdict's largest honest stub (multimodal/ops.py jpeg) the
same way .shp/.dbf/PBF/WAV were closed: the public interchange format is
implemented from the spec. Scope: baseline DCT, 8-bit, Huffman, YCbCr
(and single-component grayscale), 4:4:4 and 4:2:0 subsampling, restart
markers. Progressive/arithmetic/12-bit are out of scope (rejected with a
clear error).

Encoder: 4:4:4, Annex K quantization tables scaled by libjpeg's quality
formula, Annex K standard Huffman tables — every structural feature the
decoder must handle (DC prediction, ZRL/EOB runs, byte stuffing) is
exercised by round-trips. The decoder additionally handles 4:2:0 and DRI
via hand-built streams in tests.

Rounding contract (shared with the SQL oracle in __spark_entry__): the
final sample reconstruction and color conversion use floor(x + 0.5)
("round half up"), so a constant-color image's decoded value is a pure
arithmetic function of (r, g, b, quality) that DuckDB can replay —
see the jpeg_constant_roundtrip query.

Like every codec here, called ONLY inside Arrow batches, never per row
from the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables (T.81 Annex K) --------------------------------------------------

QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# standard Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# DCT basis: M[u, x] = C(u)/2 · cos((2x+1)uπ/16); DCT = M·B·Mᵀ, IDCT = Mᵀ·S·M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5 + 1e-8) — the decoder/oracle-shared rounding (np.round
    is banker's and cannot be replayed as SQL round()). The 1e-8 epsilon
    makes exact-half boundaries (e.g. dequantized DC·q/8 ≡ 4.5) land the
    same way on the einsum path (±1e-12 accumulation error) and on the
    closed-form/SQL path — both shift up consistently."""
    return np.floor(x + 0.5 + 1e-8)


def scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: S = 5000/q (q<50) else 200−2q; entries
    clamp to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * s + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


def _build_huff_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} (canonical, C.2)."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huff_decode(bits, vals):
    """(BITS, HUFFVAL) → {(length, code): symbol} for the bit reader."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-segment reader: destuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Discard padding bits, consume the RSTn marker."""
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        assert 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huff(reader: _BitReader, table) -> int:
    code, ln = 0, 0
    while True:
        code = (code << 1) | reader.bit()
        ln += 1
        if ln > 16:
            raise ValueError("invalid Huffman code (corrupt stream)")
        sym = table.get((ln, code))
        if sym is not None:
            return sym


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- encoder ---------------------------------------------------------------

def _quantize_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(ph, pw) uint8 plane (8-multiple dims) → (n_blocks, 64) zigzag-
    quantized int32, block raster order."""
    ph, pw = plane.shape
    p = plane.astype(np.float64) - 128.0
    bl = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ux,nxy,vy->nuv", _M, bl, _M)
    return _round_half_up(coef / qt).astype(np.int32).reshape(-1, 64)[:, _ZZ]


def _encode_block(writer, zz, dc, ac, pred_dc: int) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    diff = int(zz[0]) - pred_dc
    t = int(diff).bit_length() if diff != 0 else 0
    code, ln = dc[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        t = abs(v).bit_length()
        code, ln = ac[(run << 4) | t]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << t) - 1, t)
        run = 0
    if last < 63:
        code, ln = ac[0x00]  # EOB
        writer.write(code, ln)
    return int(zz[0])


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB8 (h, w, 3) uint8 → baseline JFIF bytes, Annex K tables.
    ``subsampling``: '444' or '420' (chroma = 2×2 block mean);
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    qt_l = scaled_qt(QT_LUM, quality)
    qt_c = scaled_qt(QT_CHROMA, quality)

    # JFIF color transform; round-half-up, clip — mirrored by the decoder
    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    planes = [
        np.clip(_round_half_up(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    ]

    if subsampling == "444":
        hi_vi = [(1, 1)] * 3
        mcu_w, mcu_h = 8, 8
    else:
        hi_vi = [(2, 2), (1, 1), (1, 1)]
        mcu_w, mcu_h = 16, 16
        # chroma = mean of each 2×2 (pad to even dims first)
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        for ci in (1, 2):
            p = np.pad(planes[ci], ((0, eh - h), (0, ew - w)), mode="edge")
            q = p.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            planes[ci] = np.clip(_round_half_up(q), 0, 255).astype(np.uint8)

    mcux, mcuy = -(-w // mcu_w), -(-h // mcu_h)
    dc_codes = [_build_huff_codes(*_DC_LUM), _build_huff_codes(*_DC_CHROMA)]
    ac_codes = [_build_huff_codes(*_AC_LUM), _build_huff_codes(*_AC_CHROMA)]

    comp_blocks, comp_bw = [], []
    for ci, plane in enumerate(planes):
        hi, vi = hi_vi[ci]
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        comp_blocks.append(_quantize_blocks(p, qt_l if ci == 0 else qt_c))
        comp_bw.append(pw // 8)

    writer = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        my, mx = divmod(mcu, mcux)
        for ci in range(3):
            hi, vi = hi_vi[ci]
            ti = 0 if ci == 0 else 1
            for by in range(vi):
                for bx in range(hi):
                    bi = (my * vi + by) * comp_bw[ci] + (mx * hi + bx)
                    pred[ci] = _encode_block(
                        writer, comp_blocks[ci][bi],
                        dc_codes[ti], ac_codes[ti], pred[ci],
                    )
        if restart_interval and (mcu + 1) % restart_interval == 0 and mcu + 1 < n_mcu:
            writer.flush()
            writer.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0, 0, 0]
    writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l.ravel()[_ZZ].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qt_c.ravel()[_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in range(3):
        hi, vi = hi_vi[cid]
        sof += bytes([cid + 1, (hi << 4) | vi, 0 if cid == 0 else 1])
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUM), (0, 1, _DC_CHROMA), (1, 0, _AC_LUM), (1, 1, _AC_CHROMA)
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicated).
    Supports 4:4:4 / 4:2:0 / 4:2:2, DRI restart intervals."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        while marker == 0xFF:  # optional fill bytes before a marker (B.1.1.2)
            marker = data[pos]
            pos += 1
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_huff_decode(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            depth, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if depth != 8:
                raise NotImplementedError("only 8-bit baseline")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "hi": samp >> 4, "vi": samp & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/arithmetic JPEG not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tables = payload[1 + 2 * i], payload[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0xF))
            pos += ln
            break
        pos += ln

    hmax = max(c["hi"] for c in comps)
    vmax = max(c["vi"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["hi"]  # blocks per row
        c["bh"] = mcuy * c["vi"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)

    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu = 0
    while mcu < mcux * mcuy:
        try:
            my, mx = divmod(mcu, mcux)
            for comp, td, ta in scan:
                dct, act = huff[(0, td)], huff[(1, ta)]
                for by in range(comp["vi"]):
                    for bx in range(comp["hi"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_huff(reader, dct)
                        diff = _extend(reader.bits(t), t) if t else 0
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k <= 63:
                            rs = _decode_huff(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        bi = (my * comp["vi"] + by) * comp["bw"] + (mx * comp["hi"] + bx)
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZZ] = zz * qts[comp["tq"]].ravel()[_ZZ]
                        comp["blocks"][bi] = blk.reshape(8, 8)
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 and mcu < mcux * mcuy:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
        except _RestartMarker:
            reader.sync_restart()
            pred = {c["id"]: 0 for c in comps}

    planes = []
    for c in comps:
        sp = np.einsum("xu,nuv,yv->nxy", _M.T, c["blocks"], _M.T)
        full = (
            sp.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        full = np.clip(_round_half_up(full + 128.0), 0, 255)
        # upsample to full resolution (sample replication)
        if c["hi"] != hmax or c["vi"] != vmax:
            full = np.repeat(np.repeat(full, vmax // c["vi"], axis=0), hmax // c["hi"], axis=1)
        planes.append(full[:h, :w])

    if len(planes) == 1:
        gray = planes[0].astype(np.uint8)
        return np.stack([gray, gray, gray], axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack(
        [np.clip(_round_half_up(p), 0, 255) for p in (r, g, b)], axis=2
    )
    return out.astype(np.uint8)


def constant_roundtrip_value(r: int, g: int, b: int, quality: int = 85):
    """Closed-form decoded RGB of a constant-color 8×8 image through
    encode→decode — the SQL-oracle mirror (every step below is replayed in
    DuckDB arithmetic by the jpeg_constant_roundtrip oracle). Kept next to
    the codec so drift between codec and oracle fails the golden test."""
    q0l = int(scaled_qt(QT_LUM, quality)[0, 0])
    q0c = int(scaled_qt(QT_CHROMA, quality)[0, 0])

    def rhu(x):
        return np.floor(x + 0.5 + 1e-8)

    y = min(max(rhu(0.299 * r + 0.587 * g + 0.114 * b), 0), 255)
    cb = min(max(rhu(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b), 0), 255)
    cr = min(max(rhu(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b), 0), 255)
    # constant block ⇒ DC-only: DC = 8·(c−128); quant, dequant, IDCT/8
    rec = []
    for c, q in ((y, q0l), (cb, q0c), (cr, q0c)):
        dc = rhu(8.0 * (c - 128.0) / q)
        rec.append(min(max(rhu(dc * q / 8.0 + 128.0), 0), 255))
    ry, rcb, rcr = rec
    rr = min(max(rhu(ry + 1.402 * (rcr - 128.0)), 0), 255)
    rg = min(max(rhu(ry - 0.344136286 * (rcb - 128.0) - 0.714136286 * (rcr - 128.0)), 0), 255)
    rb = min(max(rhu(ry + 1.772 * (rcb - 128.0)), 0), 255)
    return int(rr), int(rg), int(rb)
