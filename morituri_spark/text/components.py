"""Connected components over a pair graph — large-star / small-star.

Near-dup detection (MinHash/SimHash/embedding) emits PAIRS; dedup needs
CLUSTERS (one representative per component to keep). This is distributed
connected components via alternating large-star/small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public literature, no code ported):

  large-star: every node connects its strictly-larger neighbors to the
              minimum of its neighborhood (incl. itself);
  small-star: every node connects its strictly-smaller neighbors — and
              itself — to the minimum of those neighbors.

Each round is ``small_star(large_star(edges))`` — plain groupBy + join
DataFrame stages; the edge set converges to a star forest (every node →
its component minimum) in O(log²) rounds. Iteration state follows the
engine's kNN discipline (CLAUDE.md #10): materialize the new round BEFORE
unpersisting the parent, or every round recomputes the chain.

Scale shape: each star is one groupBy(min) + one equi-join — shuffles on
node id; a mega-component concentrates on its minimum only in the final
rounds, after the edge count has already collapsed toward one edge per
node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sym(e: DataFrame) -> DataFrame:
    """Symmetrized simple adjacency: both orientations, no self-loops."""
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    adj = _sym(e)
    mins = adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        adj.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    adj = _sym(e)
    smaller = adj.where(F.col("v") < F.col("u"))
    mins = smaller.groupBy("u").agg(F.min("v").alias("m"))
    return (
        smaller.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 30,
) -> DataFrame:
    """(a, b) undirected pairs → (node, cluster_id = component minimum)."""
    def _signature(e: DataFrame):
        """One-job set signature for the convergence test: count + hash
        sums. exceptAll would re-evaluate both rounds' DAGs; every star
        references its input twice, so unpersisted re-evaluation compounds
        exponentially (measured: a 7-edge graph did not finish)."""
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent, overflow-free (ANSI mode forbids
            # a sum of hashes), and a sound SET signature since edges are
            # distinct
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).head()
        return (r["n"], r["h"])

    # localCheckpoint every round (knn's _Round machinery): persist alone
    # leaves the LOGICAL plan growing — each star references its input
    # twice, so by round 2 Catalyst analysis of the nested
    # union/join/distinct tree stalls outright (measured: a 7-edge graph
    # hung). Truncating lineage keeps every round's plan constant-size.
    from morituri_spark.geo.knn import _Round

    edges_r = _Round.materialize(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct(),
        truncate=True,
    )
    sig = _signature(edges_r.df)

    for _ in range(max_rounds):
        ls_r = _Round.materialize(_large_star(edges_r.df), truncate=True)
        new_r = _Round.materialize(_small_star(ls_r.df), truncate=True)
        new_sig = _signature(new_r.df)
        ls_r.release()
        converged = False
        if new_sig == sig:
            # signatures can collide; confirm set equality while BOTH
            # rounds are materialized (two cheap in-memory jobs)
            converged = (
                new_r.df.exceptAll(edges_r.df).limit(1).count() == 0
                and edges_r.df.exceptAll(new_r.df).limit(1).count() == 0
            )
        edges_r.release()
        edges_r = new_r
        sig = new_sig
        if converged:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # converged star forest: every edge is (node, component minimum); the
    # minima themselves label as their own cluster
    labels = edges_r.df.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = (
        labels.select(F.col("cluster_id").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
    )
    out = labels.union(roots).groupBy("node").agg(F.min("cluster_id").alias("cluster_id"))
    out_r = _Round.materialize(out, truncate=True)
    edges_r.release()
    return out_r.df
