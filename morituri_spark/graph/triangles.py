"""Triangle counting — degree-ordered wedge closure (compact-forward).

The clustering member of the graph family: counts, per node, the
undirected triangles it participates in (the local clustering
coefficient's numerator, a standard link-spam / community-density
feature for crawl-graph curation).

Algorithm (Latapy's compact-forward, a public classic): canonicalize
to unordered distinct edges, orient every edge from the endpoint with
the smaller (degree, id) to the larger, build wedges by self-joining
the oriented list on the spoke node, and close each wedge with one
more equi-join. Orientation by degree bounds every node's oriented
out-degree by O(sqrt(m)) on any graph (arboricity bound), so the wedge
fan-out — the only super-linear term — is capped even on hub-heavy
degree distributions; a plain src-join would square the hubs.

Scale shape: two shuffles (wedge join keyed by spoke, closure join
keyed by the (lo, hi) edge pair) plus map-side-combinable count
aggregates. No iteration, no driver-side state.

Reference scope: no counterpart in morituri; extends the graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirect(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """→ (a, b) with a < b: distinct unordered edges, self-loops dropped."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.where(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """→ (node, n_triangles): per-node undirected triangle counts over
    the DIRECTED input edge list (direction, duplicates and self-loops
    are ignored — the triangle relation is over the underlying simple
    undirected graph). Nodes in no triangle are absent.
    """
    und = undirect(edges, src_col, dst_col)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    # orient each edge toward the larger (degree, id) endpoint
    da = deg.select(F.col("node").alias("a"), F.col("_deg").alias("_dega"))
    db = deg.select(F.col("node").alias("b"), F.col("_deg").alias("_degb"))
    fwd_ab = (F.col("_dega") < F.col("_degb")) | (
        (F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd_ab, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd_ab, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    left = oriented.select(F.col("u").alias("_spoke"), F.col("v").alias("_x"))
    right = oriented.select(F.col("u").alias("_spoke"), F.col("v").alias("_y"))
    wedges = (
        left.join(right, "_spoke")
        .where(F.col("_x") < F.col("_y"))
        .select(
            "_spoke",
            F.least("_x", "_y").alias("a"),
            F.greatest("_x", "_y").alias("b"),
        )
    )
    tris = wedges.join(und, ["a", "b"]).select(
        F.col("_spoke").alias("x"), F.col("a").alias("y"), F.col("b").alias("z")
    )
    verts = (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
    )
    return verts.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
