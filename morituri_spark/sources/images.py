"""Image payload codecs — pure NumPy + stdlib zlib (no PIL in container).

BASELINE.json input_hint: the fact table carries ``bytes: binary`` image
payloads with per-row invariants *decoded-pixel allclose* (PSNR≥40 dB for
lossy) and *caption byte-equality*. This module provides:

  * a real PNG encoder/decoder (RGB8, all five scanline filters on decode,
    filter-0 on encode) — lossless path, byte-exact round-trip;
  * ``FJPG``, a deterministic lossy codec (6-bit uniform quantization +
    zlib): reconstruction error ∈ [-2, 1] per channel → MSE = 1.5 → PSNR
    ≈ 46.4 dB. (5-bit gave ≈40.7 ± 0.3 dB — per-image sampling noise on
    8×8 payloads dips below the 40 dB gate; the gate query caught exactly
    that.) A real deploy swaps in libjpeg via the same codec interface
    (see multimodal/ for the stub contract);
  * average-hash ``phash`` (8×8 grayscale mean threshold → int64).

Everything here is called ONLY from inside Arrow pandas UDF batches
(``mapInPandas``), never per-row from the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) uint8 → PNG bytes (filter 0, color type 2)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = a.astype(np.int16) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports 8-bit RGB, filters 0-4."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w = 8, [], None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and ctype == 2 and interlace == 0, "unsupported PNG flavor"
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * 3
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f, cur = filters[y], lines[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prev
        else:  # Sub / Average / Paeth need a left-to-right scan
            row = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = out[y - 1][x - bpp] if (y and x >= bpp) else 0
                if f == 1:
                    row[x] = (int(cur[x]) + int(a)) % 256
                elif f == 3:
                    row[x] = (int(cur[x]) + ((int(a) + int(b)) >> 1)) % 256
                elif f == 4:
                    row[x] = (
                        int(cur[x]) + int(_paeth(np.uint8(a), np.uint8(b), np.uint8(c)))
                    ) % 256
            out[y] = row
    return out.reshape(h, w, 3)


# --- FJPG: deterministic lossy codec ---------------------------------------

_FJPG_MAGIC = b"FJPG"


def fjpg_encode(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    q = (arr >> 2).astype(np.uint8)  # 6-bit quantization
    return _FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def fjpg_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _FJPG_MAGIC, "not FJPG"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "fjpg":
        return fjpg_decode(data)
    if fmt == "jpeg":
        from . import jpeg as J  # pure-NumPy baseline T.81 (r4)

        return J.jpeg_decode(data)
    raise NotImplementedError(
        f"codec {fmt!r}: webp/progressive-jpeg decode needs libwebp/libjpeg "
        "(absent in this container); plug in via this dispatch point"
    )


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "fjpg":
        return fjpg_encode(arr)
    if fmt == "jpeg":
        from . import jpeg as J

        return J.jpeg_encode(arr)
    raise NotImplementedError(f"codec {fmt!r}")


def phash(arr: np.ndarray) -> int:
    """Average hash: grayscale → 8×8 block means → mean threshold → 64 bits
    (bit 63 first, returned as SIGNED int64 for Spark LongType)."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
