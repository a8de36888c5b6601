"""k-core decomposition — iterative degree peeling.

The densest-substructure member of the graph family: the k-core is the
maximal subgraph in which every node has degree ≥ k (undirected).
Standard batch algorithm: repeatedly drop nodes with degree < k until a
fixed point — what survives is exactly the k-core regardless of removal
order (peeling is confluent). Training-data uses: community-core
extraction from link graphs, spam-farm detection (low-core link rings
peel away), dense-cluster seeds for crawl prioritization.

Scale shape: each round is one map-side-combinable degree aggregate
plus two semi-joins of the edge list against the surviving-node set —
all equi-joins keyed by node id. The edge set is localCheckpointed per
round (rule 14: the filtered set references itself) with the parent
released after the child materializes (rule 10). Convergence = exact
edge-count fixed point (one count action per round; the count is
already computed by the materialization). Rounds are instance-bounded
(the peel depth), not scale-bounded.

Reference scope: no counterpart in morituri; extends the graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.knn import _Round
from .triangles import undirect


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """→ (node, core_degree): the nodes of the k-core of the underlying
    simple undirected graph (direction, duplicate edges and self-loops
    ignored) with their degree INSIDE the core (always ≥ k). Empty when
    no k-core exists. ``max_rounds`` caps peeling (a safety bound — the
    fixed point is normally reached far earlier).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")

    def _degrees(und: DataFrame) -> DataFrame:
        return (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )

    state = _Round.materialize(undirect(edges, src_col, dst_col), truncate=True)
    n_edges = state.df.count()
    for _ in range(int(max_rounds)):
        if n_edges == 0:
            break
        keep = _degrees(state.df).where(F.col("_deg") >= F.lit(int(k)))
        ks = keep.select("node")
        new_state = _Round.materialize(
            state.df.join(ks.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(ks.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b"),
            truncate=True,
        )
        new_n = new_state.df.count()
        state.release()
        state = new_state
        if new_n == n_edges:
            break
        n_edges = new_n
    return _degrees(state.df).where(F.col("_deg") >= F.lit(int(k))).select(
        "node", F.col("_deg").alias("core_degree")
    )
