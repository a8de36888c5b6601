"""shortest_paths (graph/sssp.py) vs an in-process Dijkstra reference."""

import heapq

import pytest

from morituri_spark.graph.sssp import shortest_paths


def _ref_sssp(edges, sources):
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    # Dijkstra over the (cost, src) lexicographic semiring
    best = {s: (0, s) for s in sources}
    heap = [(0, s, s) for s in sorted(sources)]
    heapq.heapify(heap)
    while heap:
        cost, src, node = heapq.heappop(heap)
        if best.get(node, (1 << 60, None)) < (cost, src):
            continue
        for nb, w in adj.get(node, []):
            cand = (cost + w, src)
            if nb not in best or cand < best[nb]:
                best[nb] = cand
                heapq.heappush(heap, (cost + w, src, nb))
    return best


def _run(spark, edges, sources, max_rounds=30):
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r["node"]: (r["cost"], r["src"])
        for r in shortest_paths(e, s, max_rounds=max_rounds).collect()
    }


def test_sssp_matches_reference(spark):
    # weighted shortcut beats fewer hops: 0→1→2 costs 2, 0→2 direct costs 9
    edges = [
        (0, 1, 1), (1, 2, 1), (0, 2, 9),
        (2, 3, 5), (10, 3, 2),            # source 10 reaches 3 cheaper
        (3, 0, 1),                        # cycle back
        (50, 51, 1), (51, 50, 1),         # unreachable island
    ]
    sources = [0, 10]
    got = _run(spark, edges, sources)
    assert got == _ref_sssp(edges, sources)
    assert got[2] == (2, 0)
    assert got[3] == (2, 10)
    assert 50 not in got


def test_sssp_min_src_witness_on_cost_tie(spark):
    # node 2 costs 3 from BOTH sources → min source id wins
    edges = [(0, 2, 3), (1, 2, 3)]
    got = _run(spark, edges, [0, 1])
    assert got[2] == (3, 0)


def test_sssp_zero_weight_edges(spark):
    edges = [(0, 1, 0), (1, 2, 0), (2, 3, 4)]
    got = _run(spark, edges, [0])
    assert got == {0: (0, 0), 1: (0, 0), 2: (0, 0), 3: (4, 0)}


def test_sssp_max_rounds_truncates(spark):
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1)]
    got = _run(spark, edges, [0], max_rounds=2)
    assert got == {0: (0, 0), 1: (1, 0), 2: (2, 0)}
    assert _run(spark, edges, [0], max_rounds=0) == {0: (0, 0)}


def test_sssp_random_graph_matches(spark):
    import random

    rng = random.Random(41)
    n = 100
    edges = list(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(260)
        }
    )
    edges = [(s, d, (s * 3 + d * 5) % 17 + 1) for s, d in edges]
    sources = [0, 13, 77]
    got = _run(spark, edges, sources, max_rounds=60)
    assert got == _ref_sssp(edges, sources)


def test_sssp_guards(spark):
    e = spark.createDataFrame([(0, 1, 1)], "src long, dst long, w long")
    s = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError):
        shortest_paths(e, s, max_rounds=-1)
