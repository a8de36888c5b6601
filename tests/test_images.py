import numpy as np

from morituri_spark.sources import images as I
from morituri_spark.sources import synth


def test_png_roundtrip_exact():
    rng = np.random.default_rng(0)
    for shape in [(8, 8, 3), (16, 32, 3), (1, 1, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(I.png_decode(I.png_encode(arr)), arr)


def test_png_decode_all_filters():
    # zlib stream with hand-filtered rows exercising filters 1-4
    import struct, zlib

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    rows = arr.reshape(5, 12).astype(np.int16)
    enc = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y].copy()
        prev = rows[y - 1] if y else np.zeros(12, dtype=np.int16)
        out = np.zeros(12, dtype=np.int16)
        for x in range(12):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 0:
                out[x] = cur[x]
            elif f == 1:
                out[x] = cur[x] - a
            elif f == 2:
                out[x] = cur[x] - b
            elif f == 3:
                out[x] = cur[x] - ((int(a) + int(b)) >> 1)
            else:
                p = int(a) + int(b) - int(c)
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = cur[x] - pred
        enc.append(bytes([f]) + (out % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + I._chunk(b"IHDR", ihdr)
        + I._chunk(b"IDAT", zlib.compress(b"".join(enc)))
        + I._chunk(b"IEND", b"")
    )
    assert np.array_equal(I.png_decode(png), arr)


def test_fjpg_psnr_above_40():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dec = I.fjpg_decode(I.fjpg_encode(arr))
    assert I.psnr(arr, dec) >= 40.0


def test_phash_deterministic_and_robust():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    h1 = I.phash(arr)
    h2 = I.phash(I.fjpg_decode(I.fjpg_encode(arr)))
    assert h1 == I.phash(arr.copy())
    # lossy re-encode flips at most a few bits
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 6


def test_images_table_payload_invariants(spark):
    """Per-row invariant vs source (BASELINE.json): decoded pixels allclose
    (PSNR>=40dB for lossy), caption byte-equal, phash matches pixels."""
    df = synth.images_table(spark, 50, partitions=2, px=8)
    rows = df.collect()
    assert len(rows) == 50
    for r in rows:
        i = int(r["image_id"][3:])
        rng = np.random.default_rng(synth.SEED + i)
        src = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        dec = I.decode(bytes(r["bytes"]), r["fmt"])
        if r["fmt"] == "png":
            assert np.array_equal(dec, src)
        else:
            assert I.psnr(src, dec) >= 40.0
        assert r["caption"] == f"photo {i} near ({r['lon']:.3f},{r['lat']:.3f})"
        assert r["phash"] == I.phash(src)
