"""multi_source_bfs (graph/bfs.py) vs an in-process BFS reference."""

from collections import deque

import pytest

from morituri_spark.graph.bfs import multi_source_bfs


def _ref_bfs(edges, sources, max_hops):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    best = {s: (0, s) for s in sources}
    q = deque((s, 0) for s in sorted(sources))
    while q:
        node, dist = q.popleft()
        if dist >= max_hops:
            continue
        if best[node][0] != dist:
            continue
        for nb in adj.get(node, []):
            cand_src = best[node][1]
            if nb not in best:
                best[nb] = (dist + 1, cand_src)
                q.append((nb, dist + 1))
            elif best[nb][0] == dist + 1 and cand_src < best[nb][1]:
                best[nb] = (dist + 1, cand_src)
                q.append((nb, dist + 1))
    return {n: v for n, v in best.items()}


def _run(spark, edges, sources, max_hops=20):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r["node"]: (r["dist"], r["src"])
        for r in multi_source_bfs(e, s, max_hops=max_hops).collect()
    }


def test_bfs_matches_reference(spark):
    # two chains meeting, a cycle, a detached island
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4),          # chain from 0
        (10, 3), (10, 11), (11, 12),             # source 10 reaches 3 in 1 hop
        (4, 0),                                  # cycle back
        (50, 51), (51, 50),                      # unreachable island
    ]
    sources = [0, 10]
    got = _run(spark, edges, sources)
    assert got == _ref_bfs(edges, sources, 20)
    assert got[3] == (1, 10)          # nearer via source 10
    assert got[0] == (0, 0)
    assert 50 not in got              # island absent


def test_bfs_min_src_witness_on_tie(spark):
    # node 2 reachable at dist 1 from BOTH sources → min source id wins
    edges = [(0, 2), (1, 2)]
    got = _run(spark, edges, [0, 1])
    assert got[2] == (1, 0)


def test_bfs_max_hops_truncates(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, [0], max_hops=2)
    assert got == {0: (0, 0), 1: (1, 0), 2: (2, 0)}
    # max_hops=0: only the sources
    assert _run(spark, edges, [0], max_hops=0) == {0: (0, 0)}


def test_bfs_random_graph_matches(spark):
    import random

    rng = random.Random(23)
    n = 120
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(300)})
    sources = [0, 7, 63]
    got = _run(spark, edges, sources, max_hops=30)
    assert got == _ref_bfs(edges, sources, 30)


def test_bfs_guards(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError):
        multi_source_bfs(e, s, max_hops=-1)
