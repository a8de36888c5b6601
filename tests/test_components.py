"""Connected components: chains, stars, isolated pairs, random graphs."""

import random

from morituri_spark.text.components import connected_components


def _cc_bruteforce(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_chain_and_star(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == _cc_bruteforce(pairs)
    assert got[4] == 1 and got[13] == 10 and got[21] == 20


def test_random_graphs_match_union_find(spark):
    rng = random.Random(31)
    for trial in range(3):
        pairs = [(rng.randrange(120), rng.randrange(120)) for _ in range(140)]
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs, "a long, b long")
        got = {r.node: r.cluster_id for r in connected_components(df).collect()}
        assert got == _cc_bruteforce(pairs), trial


def test_long_path_converges_fast(spark):
    # a 64-node path needs O(log^2 n) rounds, not O(n)
    pairs = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r.node: r.cluster_id for r in connected_components(df, max_rounds=12).collect()}
    assert set(got.values()) == {0} and len(got) == 65
