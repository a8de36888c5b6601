"""longest_paths (graph/dag.py) vs a topological-order reference."""

import numpy as np
import pytest

from morituri_spark.graph.dag import longest_paths


def _ref_longest(edges):
    """edges: [(u, v, w)] with u < v (already topological)."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    has_in = {v for _, v, _ in edges}
    dist = {n: (0 if n not in has_in else None) for n in nodes}
    for u, v, w in sorted(edges, key=lambda t: t[0]):
        if dist[u] is None:
            continue
        cand = dist[u] + w
        if dist[v] is None or cand > dist[v]:
            dist[v] = cand
    return {n: d for n, d in dist.items() if d is not None}


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long, w long")


def test_chain_and_diamond(spark):
    # diamond: 0→1→3 (2+5) vs 0→2→3 (1+10): longest to 3 is 11
    edges = [(0, 1, 2), (0, 2, 1), (1, 3, 5), (2, 3, 10)]
    got = {r["node"]: r["dist"] for r in longest_paths(_df(spark, edges)).collect()}
    assert got == {0: 0, 1: 2, 2: 1, 3: 11}


def test_multi_edge_and_multiple_sources(spark):
    edges = [(0, 2, 1), (0, 2, 7), (1, 2, 3), (2, 3, 2)]
    got = {r["node"]: r["dist"] for r in longest_paths(_df(spark, edges)).collect()}
    assert got == {0: 0, 1: 0, 2: 7, 3: 9}


def test_matches_reference_random_dag(spark):
    rng = np.random.RandomState(13)
    edges = []
    for _ in range(120):
        u = int(rng.randint(0, 40))
        v = u + 1 + int(rng.randint(0, 6))
        if v < 42:
            edges.append((u, v, int(rng.randint(0, 9)) + 1))
    exp = _ref_longest(edges)
    got = {r["node"]: r["dist"] for r in longest_paths(_df(spark, edges)).collect()}
    assert got == exp


def test_known_depth_matches_and_bad_bound_raises(spark):
    edges = [(0, 1, 2), (0, 2, 1), (1, 3, 5), (2, 3, 10), (3, 4, 1)]
    got = {
        r["node"]: r["dist"]
        for r in longest_paths(_df(spark, edges), known_depth=3).collect()
    }
    assert got == {0: 0, 1: 2, 2: 1, 3: 11, 4: 12}
    with pytest.raises(RuntimeError, match="known_depth"):
        longest_paths(_df(spark, edges), known_depth=1)
    with pytest.raises(ValueError):
        longest_paths(_df(spark, edges), max_rounds=2, known_depth=5)


def test_pure_cycle_raises(spark):
    edges = [(0, 1, 1), (1, 2, 1), (2, 0, 1)]
    with pytest.raises(RuntimeError, match="cyclic"):
        longest_paths(_df(spark, edges), max_rounds=5)


def test_reachable_cycle_diverges_and_raises(spark):
    edges = [(0, 1, 1), (1, 2, 1), (2, 1, 1)]
    with pytest.raises(RuntimeError, match="converge"):
        longest_paths(_df(spark, edges), max_rounds=6)
