"""Hypothesis property tests for the round-3 key math (pure NumPy/driver
logic — no Spark session, so the whole file runs in seconds)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from morituri_spark.geo import cells
from morituri_spark.io import layout
from morituri_spark.text.sampling import sample_threshold

lons = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lats = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)


@given(lons, lats, st.integers(min_value=1, max_value=20))
@settings(max_examples=200, deadline=None)
def test_zorder_preserves_cell_identity(lon, lat, res):
    # same cell <-> same Morton code (the interleave is a bijection on (x, y))
    c = int(cells.latlng_to_cell(np.array([lon]), np.array([lat]), res)[0])
    z = int(layout.zorder_np(np.array([lon]), np.array([lat]), res)[0])
    x = (c >> 29) & ((1 << 29) - 1)
    y = c & ((1 << 29) - 1)
    # de-interleave and compare
    def unspread(v):
        out = 0
        for i in range(29):
            out |= ((v >> (2 * i)) & 1) << i
        return out
    assert unspread(z) == x and unspread(z >> 1) == y


@given(
    st.floats(min_value=-170, max_value=150, allow_nan=False),
    st.floats(min_value=-80, max_value=60, allow_nan=False),
    st.floats(min_value=0.01, max_value=25),
    st.floats(min_value=0.01, max_value=25),
    st.integers(min_value=4, max_value=14),
)
@settings(max_examples=60, deadline=None)
def test_morton_ranges_always_cover_corner_cells(lon0, lat0, dw, dh, res):
    lon1, lat1 = lon0 + dw, lat0 + dh
    ranges = layout.morton_ranges(lon0, lat0, lon1, lat1, res)
    # both corners and the bbox centre always land inside some range
    for px, py in ((lon0, lat0), (lon1, lat1), ((lon0 + lon1) / 2, (lat0 + lat1) / 2)):
        z = int(layout.zorder_np(np.array([px]), np.array([py]), res)[0])
        assert any(lo <= z <= hi for lo, hi in ranges), (px, py, res)
    # ranges are disjoint and sorted
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 < l2


@given(st.floats(min_value=0, max_value=1), st.floats(min_value=0, max_value=1))
@settings(max_examples=100, deadline=None)
def test_sample_thresholds_monotone(r1, r2):
    t1, t2 = sample_threshold(r1), sample_threshold(r2)
    if r1 <= r2:
        assert t1 <= t2  # smaller rate => subset at the same seed


@given(st.lists(st.integers(min_value=0, max_value=(1 << 29) - 1), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_spread_bits_monotone_and_invertible(xs):
    arr = np.array(sorted(set(xs)), dtype=np.int64)
    sp = layout.spread_bits(arr)
    # strictly increasing (bit-order preserved) — the property the Morton
    # corner bound rests on
    assert (np.diff(sp) > 0).all() if len(sp) > 1 else True


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([50, 75, 85, 95]),
    st.sampled_from(["444", "420"]),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_never_crashes_and_bounds_error(h, w, seed, quality, sub):
    """Any RGB8 image of any small size encodes to a decodable stream whose
    dimensions are preserved; error is bounded by the quantization scale."""
    from morituri_spark.sources import jpeg as J

    rng = np.random.default_rng(seed)
    # piecewise-smooth content (random DC per 8x8-ish region + mild noise)
    base = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3))
    img = np.clip(
        np.kron(base, np.ones((8, 8, 1)))[:h, :w]
        + rng.integers(-6, 7, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(img, quality, subsampling=sub))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(np.int32) - img.astype(np.int32))
    # luma quant step at q50 is <=~56 for the highest AC; constants chosen
    # from the worst measured + margin — this guards regressions, not rate
    assert float(err.mean()) < 40.0


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
    st.sampled_from([50, 75, 85, 95]),
)
@settings(max_examples=80, deadline=None)
def test_jpeg_constant_closed_form_property(r, g, b, quality):
    from morituri_spark.sources import jpeg as J

    arr = np.empty((8, 8, 3), dtype=np.uint8)
    arr[:, :, 0], arr[:, :, 1], arr[:, :, 2] = r, g, b
    dec = J.jpeg_decode(J.jpeg_encode(arr, quality))
    flat = dec.reshape(-1, 3)
    assert (flat == flat[0]).all()
    assert tuple(int(v) for v in flat[0]) == J.constant_roundtrip_value(r, g, b, quality)
