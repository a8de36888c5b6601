"""colocation_quotient (geo/colocation.py) vs a literal per-point ref."""
import math

import pytest

from morituri_spark.geo.colocation import colocation_quotient


def _clq_ref(rows, cell_deg=1.0):
    """Literal per-point CLQ: rows = [(cat, lon, lat)]."""
    pts = [
        (c, math.floor(x / cell_deg), math.floor(y / cell_deg))
        for c, x, y in rows
    ]
    n_all = len(pts)
    n_cat = {}
    for c, _, _ in pts:
        n_cat[c] = n_cat.get(c, 0) + 1
    c_ab, t_a = {}, {}
    for i, (a, ix, iy) in enumerate(pts):
        for k, (b, jx, jy) in enumerate(pts):
            if k == i or abs(jx - ix) > 1 or abs(jy - iy) > 1:
                continue
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
            t_a[a] = t_a.get(a, 0) + 1
    out = {}
    for (a, b), c in c_ab.items():
        nb_eff = n_cat[b] - (1 if a == b else 0)
        if t_a.get(a, 0) <= 0 or nb_eff <= 0 or n_all <= 1:
            continue
        clq = (c / t_a[a]) / (nb_eff / (n_all - 1))
        out[(a, b)] = (c, t_a[a], math.floor(clq * 1e6 + 0.5 + 1e-8) / 1e6)
    return out


def test_clq_matches_per_point_reference(spark):
    # cafes cluster with bars; banks sit alone far away
    rows = []
    rows += [("cafe", 0.1 + i * 0.2, 0.1) for i in range(5)]
    rows += [("bar", 0.15 + i * 0.2, 0.15) for i in range(5)]
    rows += [("bank", 50.5 + i * 10.0, 50.5) for i in range(4)]
    rows += [("cafe", 30.5, 30.5)]  # isolated cafe
    df = spark.createDataFrame(rows, "cat string, lon double, lat double")
    got = {
        (r["cat_a"], r["cat_b"]): (r["c_ab"], r["t_a"], r["clq"])
        for r in colocation_quotient(df, "cat").collect()
    }
    ref = _clq_ref(rows)
    # the kernel also emits true-zero pairs (e.g. cafe→bank); the literal
    # ref only sees observed pairs — compare on observed, check zeros
    for key, val in ref.items():
        assert got[key] == val, key
    assert got[("cafe", "bar")][2] > 1.0   # co-located
    assert ("cafe", "bank") not in ref and got[("cafe", "bank")][0] == 0
    assert got[("cafe", "bank")][2] == 0.0  # true-zero segregation


def test_clq_guards(spark):
    df = spark.createDataFrame(
        [("a", 0.5, 0.5)], "cat string, lon double, lat double"
    )
    # single point: no neighbors → empty output, no division blowup
    assert colocation_quotient(df, "cat").count() == 0
    with pytest.raises(ValueError, match="cell_deg"):
        colocation_quotient(df, "cat", cell_deg=1e-5)
