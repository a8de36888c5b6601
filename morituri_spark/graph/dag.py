"""DAG longest paths (critical path) — max-plus relaxation by rounds.

The scheduling member of the graph family (sssp.py minimizes cost to a
source; this MAXIMIZES it, which is only well-defined on acyclic
graphs): given directed edges with non-negative INTEGER weights on a
DAG, label every node with the length of the longest weighted path from
any source (in-degree-0 node) to it. The global critical-path length is
the max label; per-node labels are the earliest-start times of classic
CPM scheduling (data-pipeline stage planning, build graphs, lineage
depth audits).

Correctness: max-plus is a semiring — ``best(v) = max over (u,v) of
best(u) + w`` — and on a DAG the relaxation reaches fixpoint in at most
(longest path hop count) rounds. On a cyclic input the value diverges;
this operator RAISES if the state still changes at ``max_rounds``, so a
cycle is detected rather than silently mislabeled (the cap doubles as a
cycle gate, like the reference's via-chain walk bounds).

Scale shape: each round is ONE equi-join of the state against the edge
list (shuffle keyed by edge src) plus a max aggregate keyed by node —
both map-side combinable; multi-edges need no dedup (max absorbs them).
States are localCheckpointed per round (CLAUDE.md rule 14), superseded
rounds released after the next materializes (rule 10), convergence is
an exact bit_xor signature (ANSI-safe).

Reference scope: no counterpart in morituri; extends the graph family
(bfs/sssp/kcore/pagerank/triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geo.knn import _Round


def _signature(df: DataFrame) -> int:
    row = df.agg(
        F.bit_xor(F.xxhash64(F.col("node"), F.col("dist"))).alias("sig"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return hash((row["sig"], row["n"]))


def longest_paths(
    edges: DataFrame,
    max_rounds: int = 60,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    known_depth: int | None = None,
) -> DataFrame:
    """→ (node, dist): longest weighted path length from any in-degree-0
    node, for every node of the DAG (sources appear with dist 0).
    Weights are non-negative integers. Raises RuntimeError if the
    relaxation has not converged after ``max_rounds`` (cycle, or a
    longer-than-budget chain).

    ``known_depth``: when the caller can bound the longest path's HOP
    count (a layered schedule, a min edge span), pass it to skip the
    per-round convergence signature — rounds become one Spark job each
    instead of two, and ONE verification round at the end still raises
    if the bound was wrong (the cycle gate is kept, just amortized)."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if known_depth is not None and not 0 < known_depth <= max_rounds:
        raise ValueError("known_depth must be in [1, max_rounds]")
    # pre-partitioned on the per-round join key + persist (r6): a
    # localCheckpoint here truncated lineage but dropped partitioning, so
    # every _relax round re-exchanged the whole edge list; persist keeps
    # the Repartition visible and the per-round join exchange-free on
    # this side
    e = edges.select(
        F.col(src_col).cast("long").alias("_s"),
        F.col(dst_col).cast("long").alias("_d"),
        F.col(weight_col).cast("long").alias("_w"),
    ).repartition("_s").persist()

    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionAll(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    srcs = nodes.join(
        e.select(F.col("_d").alias("node")).distinct(), "node", "left_anti"
    )
    # a DAG always has an in-degree-0 node; none means every node sits on
    # or behind a cycle — fail loudly instead of returning nothing.
    # (A cycle that IS reachable from a source diverges and is caught by
    # the max_rounds gate below; cycle components unreachable from every
    # source are simply absent, like sssp's unreachable nodes.)
    if srcs.isEmpty() and not e.isEmpty():
        raise RuntimeError(
            "longest_paths: no in-degree-0 node — input is cyclic"
        )

    def _maxagg(df: DataFrame) -> DataFrame:
        return df.groupBy("node").agg(F.max("dist").alias("dist"))

    def _relax(df: DataFrame) -> DataFrame:
        relaxed = (
            df.join(e, df["node"] == e["_s"])
            .select(
                F.col("_d").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
            .unionAll(df)
        )
        return _maxagg(relaxed)

    state = _Round.materialize(
        srcs.select("node", F.lit(0).cast("long").alias("dist")),
        truncate=True,
    )
    if known_depth is not None:
        for _ in range(int(known_depth)):
            new_state = _Round.materialize(_relax(state.df), truncate=True)
            # rule 10: child materialized before the parent releases
            state.release()
            state = new_state
        sig = _signature(state.df)
        check = _Round.materialize(_relax(state.df), truncate=True)
        changed = _signature(check.df) != sig
        check.release()
        if changed:
            raise RuntimeError(
                f"longest_paths: state still changing after known_depth="
                f"{known_depth} rounds — bound too small or cyclic input"
            )
        e.unpersist()
        return state.df
    sig = _signature(state.df)
    for _ in range(int(max_rounds)):
        new_state = _Round.materialize(_relax(state.df), truncate=True)
        new_sig = _signature(new_state.df)
        # rule 10: the child is materialized before the parent releases
        state.release()
        state = new_state
        if new_sig == sig:
            e.unpersist()
            return state.df
        sig = new_sig
    raise RuntimeError(
        f"longest_paths did not converge in {max_rounds} rounds — "
        "cyclic input or raise max_rounds"
    )
