"""Weighted multi-source shortest paths — Bellman-Ford by rounds.

The weighted member of the graph family (bfs.py counts hops; this
minimizes an integer edge-cost sum): given directed edges with
non-negative INTEGER weights and a set of source nodes, label every
reachable node with the minimum total cost to the nearest source and a
deterministic ``src`` witness — the minimum source id among all
minimum-cost paths.

The relaxation runs over the lexicographic (cost, src) semiring:
``best(v) = min over edges (u,v) of (best(u).cost + w, best(u).src)``
with struct-min as the aggregate. Min-lex is associative/commutative
and monotone under adding a non-negative edge cost to the first
component, so per-round struct-min relaxation converges to exactly
(min cost, min origin among min-cost paths) — the weighted analogue of
bfs.py's greedy min-witness proof.

Training-data/geo uses: travel-cost service areas over street graphs
(cost = length in meters), weighted contamination radius, cheapest-
path feature generation for link graphs.

Scale shape: each round is ONE equi-join of the current state against
the edge list (shuffle keyed by edge src) plus a struct-min aggregate
keyed by node — both map-side combinable; rounds ≤ the hop length of
the longest optimal path (bounded by ``max_rounds``). Integer costs
keep the result engine-exact (no float accumulation order). States are
localCheckpointed per round (CLAUDE.md rule 14) and superseded rounds
released once the next is materialized (rule 10); the edge list's
lineage is truncated once up front. Convergence is detected by an
exact bit_xor signature over (node, cost, src) — one count-free
aggregate action per round (ANSI-safe per rule 14's bit_xor note).

Reference scope: no counterpart in morituri; extends the graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.knn import _Round


def _signature(df: DataFrame) -> int:
    row = df.agg(
        F.bit_xor(
            F.xxhash64(F.col("node"), F.col("cost"), F.col("src"))
        ).alias("sig"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return hash((row["sig"], row["n"]))


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 30,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    source_id: str = "node",
) -> DataFrame:
    """→ (node, cost, src): minimum total edge cost to the nearest source
    and the minimum source id among minimum-cost paths. Sources appear
    with cost 0 and src = their own id. Edges are DIRECTED with
    non-negative integer weights (raise upstream if floats are needed —
    quantize to integer micro-units instead, per the repo's exactness
    rules). Unreachable nodes are absent. Stops early once a round
    changes nothing.
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0, got {max_rounds}")
    # pre-partitioned on the per-round join key + persist (r6, same as
    # dag/pagerank: checkpoint drops partitioning, so rounds re-exchanged
    # the edge list; persist keeps the Repartition visible)
    e = edges.select(
        F.col(src_col).alias("_s"),
        F.col(dst_col).alias("_d"),
        F.col(weight_col).cast("long").alias("_w"),
    ).repartition("_s").persist()

    def _minlex(df: DataFrame) -> DataFrame:
        best = F.min(F.struct(F.col("cost"), F.col("src"))).alias("_b")
        return (
            df.groupBy("node")
            .agg(best)
            .select("node", F.col("_b.cost").alias("cost"), F.col("_b.src").alias("src"))
        )

    state = _Round.materialize(
        _minlex(
            sources.select(
                F.col(source_id).alias("node"),
                F.lit(0).cast("long").alias("cost"),
                F.col(source_id).alias("src"),
            )
        ),
        truncate=True,
    )
    sig = _signature(state.df)
    for _ in range(int(max_rounds)):
        relaxed = (
            state.df.join(e, state.df["node"] == e["_s"])
            .select(
                F.col("_d").alias("node"),
                (F.col("cost") + F.col("_w")).alias("cost"),
                F.col("src"),
            )
            .unionAll(state.df)
        )
        new_state = _Round.materialize(_minlex(relaxed), truncate=True)
        new_sig = _signature(new_state.df)
        # rule 10: new state materialized above before the parent releases
        state.release()
        state = new_state
        if new_sig == sig:
            break
        sig = new_sig
    e.unpersist()
    return state.df
