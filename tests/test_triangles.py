"""triangle_counts (graph/triangles.py) vs an in-process reference."""

from itertools import combinations

from morituri_spark.graph.triangles import triangle_counts, undirect


def _ref_triangles(edges):
    und = {tuple(sorted((s, d))) for s, d in edges if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c counts each triangle once
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def _run(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()
    }


def test_triangles_basic(spark):
    # K4 on {0,1,2,3}: every node is in C(3,2)=3 triangles
    edges = list(combinations(range(4), 2))
    got = _run(spark, edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_direction_dups_loops_ignored(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2), (3, 4)]
    got = _run(spark, edges)
    assert got == {0: 1, 1: 1, 2: 1}  # 3-4 edge is triangle-free


def test_triangles_random_graph_matches(spark):
    import random

    rng = random.Random(7)
    n = 60
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(500)})
    assert _run(spark, edges) == _ref_triangles(edges)


def test_undirect_canonicalizes(spark):
    e = spark.createDataFrame([(2, 1), (1, 2), (3, 3)], "src long, dst long")
    assert [tuple(r) for r in undirect(e).collect()] == [(1, 2)]
