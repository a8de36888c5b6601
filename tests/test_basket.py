"""frequent_pairs (text/basket.py) vs a brute-force reference."""

import math

import pytest

from morituri_spark.text.basket import frequent_pairs


def _ref(baskets, min_support):
    sets = {}
    for b, i in baskets:
        sets.setdefault(b, set()).add(i)
    n = len(sets)
    supp = {}
    for s in sets.values():
        for i in s:
            supp[i] = supp.get(i, 0) + 1
    pair = {}
    for s in sets.values():
        items = sorted(x for x in s if supp[x] >= min_support)
        for a in range(len(items)):
            for b in range(a + 1, len(items)):
                k = (items[a], items[b])
                pair[k] = pair.get(k, 0) + 1
    out = {}
    for (a, b), sab in pair.items():
        if sab >= min_support:
            lift = (float(n) * float(sab)) / (float(supp[a]) * float(supp[b]))
            out[(a, b)] = (sab, int(math.floor(lift * 1e6 + 0.5 + 1e-8)))
    return out


def _run(spark, baskets, min_support=2):
    df = spark.createDataFrame(baskets, "basket_id long, item string")
    return {
        (r["item_a"], r["item_b"]): (r["supp_ab"], r["lift_micro"])
        for r in frequent_pairs(df, min_support=min_support).collect()
    }


def test_simple_pairs_and_lift(spark):
    baskets = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "d"),
    ]
    got = _run(spark, baskets, min_support=2)
    assert got == _ref(baskets, 2)
    # (a, b): supp 2, supp_a 3, supp_b 2, n 4 → lift 4*2/(3*2) = 1.333333
    assert got[("a", "b")] == (2, 1333333)


def test_duplicates_in_basket_count_once(spark):
    baskets = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    got = _run(spark, baskets, min_support=2)
    assert got[("x", "y")][0] == 2


def test_apriori_prune_drops_rare_items(spark):
    baskets = [(1, "a"), (1, "rare"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
    got = _run(spark, baskets, min_support=2)
    assert all("rare" not in k for k in got)
    assert got == _ref(baskets, 2)


def test_random_matches_reference(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    baskets = [
        (int(rng.randint(0, 30)), f"i{rng.randint(0, 15)}")
        for _ in range(400)
    ]
    assert _run(spark, baskets, 3) == _ref(baskets, 3)


def test_min_support_validation(spark):
    with pytest.raises(ValueError):
        _run(spark, [(1, "a")], min_support=0)
