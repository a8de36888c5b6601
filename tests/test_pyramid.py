"""Mipmap pyramid sums — vs loop reference."""

import numpy as np
import pandas as pd

from morituri_spark.geo.terrain import pyramid_sums


def test_pyramid_sums_loop_reference(spark):
    rng = np.random.default_rng(83)
    rows = []
    for g in range(5):
        for iy in range(13):     # odd dims exercise ragged blocks
            for ix in range(11):
                rows.append((g, ix, iy, int(rng.integers(0, 256))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "ix", "iy", "z"]))
    got = {}
    for r in pyramid_sums(df, levels=3, keys=["g"]).collect():
        got[(r.g, r.level, r.ix, r.iy)] = (r.s, r.n)
    want = {}
    for g, ix, iy, z in rows:
        for lvl in (1, 2, 3):
            k = (g, lvl, ix >> lvl, iy >> lvl)
            s, n = want.get(k, (0, 0))
            want[k] = (s + z, n + 1)
    assert got == want
    # level-2 cells cover at most 16 base pixels, ragged edges fewer
    assert max(n for (g, l, x, y), (s, n) in got.items() if l == 2) == 16
