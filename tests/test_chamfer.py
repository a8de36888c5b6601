"""chamfer_histogram (multimodal/distance.py) vs Dijkstra reference."""

import heapq

import numpy as np

from morituri_spark.multimodal.distance import _chamfer34, chamfer_histogram
from morituri_spark.sources import images as I


def _ref_chamfer(mask):
    """Dijkstra from all mask pixels over the 3/4-weighted 8-graph."""
    h, w = mask.shape
    INF = 1 << 40
    d = [[INF] * w for _ in range(h)]
    pq = []
    for y in range(h):
        for x in range(w):
            if mask[y, x]:
                d[y][x] = 0
                heapq.heappush(pq, (0, y, x))
    while pq:
        du, y, x = heapq.heappop(pq)
        if du > d[y][x]:
            continue
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w:
                    wgt = 4 if dy != 0 and dx != 0 else 3
                    if du + wgt < d[yy][xx]:
                        d[yy][xx] = du + wgt
                        heapq.heappush(pq, (du + wgt, yy, xx))
    return np.array(d, dtype=np.int64)


def test_field_matches_dijkstra():
    rng = np.random.RandomState(9)
    for _ in range(4):
        mask = rng.rand(10, 13) < 0.08
        if not mask.any():
            mask[0, 0] = True
        assert np.array_equal(_chamfer34(mask), _ref_chamfer(mask))


def test_single_seed_known_values():
    mask = np.zeros((5, 5), dtype=bool)
    mask[2, 2] = True
    d = _chamfer34(mask)
    assert d[2, 2] == 0
    assert d[2, 3] == 3 and d[1, 2] == 3      # orthogonal
    assert d[1, 1] == 4 and d[3, 3] == 4      # diagonal
    assert d[2, 4] == 6                        # two orthogonal
    assert d[0, 3] == 7                        # one diagonal + one orthogonal
    assert d[0, 0] == 8 and d[0, 4] == 8       # two diagonals


def test_spark_histogram_matches_reference(spark):
    rng = np.random.RandomState(23)
    rows, expect = [], {}
    for i in range(4):
        arr = (rng.rand(8, 9, 3) * 255).astype(np.uint8)
        rows.append((f"im{i}", bytearray(I.encode(arr, "png")), "png", 9, 8))
        mask = arr.astype(np.int64).sum(axis=2) >= 384
        if not mask.any():
            continue
        d = _ref_chamfer(mask).ravel()
        hist = {}
        for pid, dist in enumerate(d, start=1):
            n, c = hist.get(int(dist), (0, 0))
            hist[int(dist)] = (n + 1, c + pid)
        expect[f"im{i}"] = sorted(
            (dist, n, c) for dist, (n, c) in hist.items()
        )
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, w int, h int"
    )
    got = {}
    for r in chamfer_histogram(df, 384).collect():
        got.setdefault(r["image_id"], []).append(
            (r["dist"], r["n_pixels"], r["chk_pos"])
        )
    for k in got:
        got[k].sort()
    assert got == expect
