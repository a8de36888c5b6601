"""Multi-source BFS — hop distances to the nearest of a source set.

The frontier-expansion member of the graph family (alongside
components.py's connected components and pagerank.py's centrality):
given directed edges and a set of source nodes, label every reachable
node with its hop distance to the NEAREST source and a deterministic
``src`` witness — the minimum source id among all shortest paths (the
greedy per-round min propagates exactly that: every shortest path to a
node runs through a predecessor first reached one round earlier, so
min-over-predecessors of min-origins IS min-over-all-shortest-origins).

Training-data/geo uses: reachability audits over street graphs
(service-area = nodes within k hops of depot sources), link-distance-
from-seed-set as a crawl-frontier feature, contamination blast radius
over citation/link graphs.

Scale shape: each round is ONE equi-join of the frontier against the
edge list (shuffle keyed by src), an anti-join against the visited set,
and a min-aggregate for the witness — all map-side combinable; rounds =
graph diameter (bounded by ``max_hops``). Frontier and visited states
are localCheckpointed per round (CLAUDE.md rule 14: the self-referencing
union would otherwise compound the logical plan), with superseded
frontier blocks released once the next round is materialized (rule 10).
The edge list's lineage is truncated once up front — it is re-joined
every round.

Reference scope: no counterpart in morituri; extends the graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.knn import _Round


def multi_source_bfs(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    source_id: str = "node",
) -> DataFrame:
    """→ (node, dist, src): hop distance to the nearest source and the
    minimum source id among shortest paths. Sources themselves appear
    with dist 0 and src = their own id. Edges are DIRECTED — union the
    reversed edge list upstream for undirected semantics. Unreachable
    nodes are absent. Stops early when the frontier drains.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    # pre-partitioned on the per-round join key + persist (r6, same as
    # dag/pagerank)
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).repartition("_s").persist()
    state = _Round.materialize(
        sources.select(
            F.col(source_id).alias("node"),
            F.lit(0).cast("int").alias("dist"),
            F.col(source_id).alias("src"),
        ).distinct(),
        truncate=True,
    )
    frontier = state
    for hop in range(1, int(max_hops) + 1):
        nxt = _Round.materialize(
            frontier.df.join(e, frontier.df["node"] == e["_s"])
            .join(state.df.select(F.col("node").alias("_d")), "_d", "left_anti")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.min("src").alias("src"))
            .select("node", F.lit(hop).cast("int").alias("dist"), "src"),
            truncate=True,
        )
        if nxt.df.isEmpty():
            nxt.release()
            break
        new_state = _Round.materialize(state.df.unionAll(nxt.df), truncate=True)
        # rule 10: the new state is materialized above BEFORE its parents
        # are released, so no round recomputes the chain
        if frontier is not state:
            frontier.release()
        state.release()
        state, frontier = new_state, nxt
    if frontier is not state:
        frontier.release()
    e.unpersist()
    return state.df
