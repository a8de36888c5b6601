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
    """Symmetrized adjacency: both orientations, no self-loops.

    NO distinct: every consumer below is duplicate-insensitive (min
    aggregates; joins against one-row-per-key minima; a final distinct
    closes each round), the input rounds are distinct sets, and the old
    distinct here was a full extra exchange per star (guide §2.4)."""
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    # ONE exchange per star: repartition on u, then both the min
    # aggregate and the u-keyed join reuse that partitioning. The join is
    # hinted shuffled-HASH (r6): co-partitioned SMJ paid two in-partition
    # SORTS of the full adjacency every round; the hash build side is
    # ``mins`` — exactly one row per node in the partition, so the build
    # stays bounded by distinct keys even under a mega-component (the hot
    # node inflates only the streamed side). Measured ~35%/round off the
    # 1M-edge fixture.
    adj = _sym(e).repartition("u")
    mins = adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        adj.where(F.col("v") > F.col("u"))
        .join(mins.hint("shuffle_hash"), "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    adj = _sym(e).repartition("u")
    smaller = adj.where(F.col("v") < F.col("u"))
    mins = smaller.groupBy("u").agg(F.min("v").alias("m"))
    return (
        smaller.join(mins.hint("shuffle_hash"), "u")
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
    def _is_star_forest(e: DataFrame) -> bool:
        """Structural convergence test (r6): small_star output always
        orients big → small, and such a set is a FIXPOINT of both stars
        iff (1) every source u carries exactly ONE edge and (2) no node
        is both a source and a target — i.e. the edges form a star
        forest whose centers are their components' minima. Detecting
        this on the round that PRODUCES the final set replaces the old
        consecutive-equal signature + exceptAll confirm, which always
        paid one extra full round just to observe the set repeating.
        (A node with two targets, or a chain, is provably unstable —
        the next small_star rewrites it — so this stops at exactly the
        same fixpoint set the repeat test stopped at.)"""
        viol = (
            e.select("u", F.lit(0).alias("_t"))
            .unionByName(e.select(F.col("v").alias("u"), F.lit(1).alias("_t")))
            .groupBy("u")
            .agg(
                F.sum(F.when(F.col("_t") == 0, 1).otherwise(0)).alias("_s"),
                F.min("_t").alias("_mn"),
                F.max("_t").alias("_mx"),
            )
            .where(
                (F.col("_s") > 1)
                | ((F.col("_s") >= 1) & (F.col("_mn") == 0) & (F.col("_mx") == 1))
            )
            .limit(1)
            .count()
        )
        return viol == 0

    # localCheckpoint every round (knn's _Round machinery): persist alone
    # leaves the LOGICAL plan growing — each star references its input
    # twice, so by round 2 Catalyst analysis of the nested
    # union/join/distinct tree stalls outright (measured: a 7-edge graph
    # hung). Truncating lineage keeps every round's plan constant-size.
    from morituri_spark.geo.knn import _Round

    edges_r = _Round.materialize(
        # canonical (big → small) orientation — the same orientation every
        # small_star round emits, so (a,b)/(b,a) dup inputs merge here and
        # an already-converged star forest converges on the first compare
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct(),
        truncate=True,
    )
    prev_n = -1
    for _ in range(max_rounds):
        ls_r = _Round.materialize(_large_star(edges_r.df), truncate=True)
        new_r = _Round.materialize(_small_star(ls_r.df), truncate=True)
        ls_r.release()
        edges_r.release()
        edges_r = new_r
        # gate the structural test on the cheap count signal (rule 20:
        # probes only when the signal says "maybe"): a fixpoint implies
        # the count repeats, so a changed count can skip the test
        n = edges_r.df.count()
        if n == prev_n and _is_star_forest(edges_r.df):
            break
        prev_n = n
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
