"""k_core (graph/kcore.py) vs an in-process peeling reference."""

import pytest

from morituri_spark.graph.kcore import k_core


def _ref_kcore(edges, k):
    und = {tuple(sorted((s, d))) for s, d in edges if s != d}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        new = {(a, b) for a, b in und if a in keep and b in keep}
        if new == und:
            break
        und = new
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def _run(spark, edges, k):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["core_degree"] for r in k_core(e, k).collect()}


def test_kcore_triangle_plus_tail(spark):
    # triangle {0,1,2} is the 2-core; the tail 2-3-4 peels away
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    assert _run(spark, edges, 2) == {0: 2, 1: 2, 2: 2}
    assert _run(spark, edges, 3) == {}


def test_kcore_cascading_peel(spark):
    # chain hung off a clique: peeling must cascade through the chain
    from itertools import combinations

    clique = list(combinations(range(5), 2))          # K5: 4-core
    chain = [(4, 10), (10, 11), (11, 12)]
    got = _run(spark, clique + chain, 2)
    assert set(got) == {0, 1, 2, 3, 4}
    assert _run(spark, clique + chain, 4) == {i: 4 for i in range(5)}


def test_kcore_random_matches(spark):
    import random

    rng = random.Random(11)
    n = 80
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(400)})
    for k in (2, 4, 6):
        assert _run(spark, edges, k) == _ref_kcore(edges, k)


def test_kcore_guards(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        k_core(e, 0)
    with pytest.raises(ValueError):
        k_core(e, 2, max_rounds=0)
