"""W4: admin-boundary ring → chunked ways of ≤ OSM_MAX_WAY_NODES nodes.

Ports build_admin_boundary_ways (/root/reference/plugins/navteq/
navteq.hpp:654-692): a closed ring of n points (first == last, validated —
G7) becomes a node list of length n (indices 0..n-2 plus the first node
repeated), chunked into ways of at most 1000 nodes where consecutive chunks
SHARE their boundary node (the do-while advances by 999). Golden sizes
{2,5,10,100,999,1000,1001,1002,10000} from
/root/reference/tests/navteq/unit_test_navteq2osm.cpp:9-40.

The chunking itself is closed-form, so the Spark operator is pure Catalyst:
posexplode + integer chunk keys + groupBy-collect — no Python at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OSM_MAX_WAY_NODES = 1000  # navteq_mappings.hpp:131


def ring_node_count(n_ring_points: int) -> int:
    """Ring of n points (closed: last == first) → n node refs
    (0..n-2 plus the repeated first)."""
    return n_ring_points


def chunk_bounds(n_nodes: int) -> list[tuple[int, int]]:
    """[(start, end)] node-index ranges per way, end exclusive; consecutive
    ways share the boundary node — exact port of the do-while at
    navteq.hpp:675-692."""
    out = []
    i = 0
    while True:
        out.append((i, min(i + OSM_MAX_WAY_NODES, n_nodes)))
        i += OSM_MAX_WAY_NODES - 1
        if i >= n_nodes:
            break
    return out


def n_chunks(n_nodes: int) -> int:
    return len(chunk_bounds(n_nodes))


def chunk_rings(rings: DataFrame, ring_col: str = "ring", id_cols=("zone_id", "ring_idx")) -> DataFrame:
    """DataFrame operator: each input row carries a closed ring
    (array of [lon,lat]); output one row per chunked way with its node
    coordinate slice and ``way_seq`` order.

    Plan: validate closure (G7, raise_error) → build the node list (drop the
    closing point, append the first) → posexplode → chunk keys → groupBy
    (zone, ring, chunk) collect ordered — all Catalyst built-ins.
    """
    id_list = list(id_cols)
    n = F.size(F.col(ring_col))
    first_pt = F.element_at(F.col(ring_col), 1)
    last_pt = F.element_at(F.col(ring_col), -1)
    # node list = ring[0 .. n-2] ++ [ring[0]]  (length n); the G7 closure
    # check is folded into the expression so column pruning can't drop it.
    closed = (first_pt[0] == last_pt[0]) & (first_pt[1] == last_pt[1])
    nodes = rings.select(
        *id_list,
        F.when(closed, F.concat(F.slice(F.col(ring_col), 1, n - 1), F.array(first_pt)))
        .otherwise(
            F.raise_error(
                F.lit("admin boundary ring is invalid. First and last node don't match")
            )
        )
        .alias("_nodes"),
    )
    exploded = nodes.select(*id_list, F.posexplode("_nodes").alias("pos", "pt"))
    # chunk key: node pos p belongs to way floor(p / 999); boundary nodes
    # (p % 999 == 0, p > 0) belong to BOTH way k-1 and way k → duplicate via
    # an extra row. A final node exactly on a boundary opens a trailing
    # 1-node way — the reference's do-while does too (golden: n_nodes=1000
    # → 2 ways, the second holding only node 999).
    stride = OSM_MAX_WAY_NODES - 1
    base = exploded.withColumn("way_seq", (F.col("pos") / stride).cast("int"))
    dup = base.where((F.col("pos") % stride == 0) & (F.col("pos") > 0)).withColumn(
        "way_seq", F.col("way_seq") - 1
    )
    all_nodes = base.unionByName(dup)
    return (
        all_nodes.groupBy(*id_list, "way_seq")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "pt"))).alias("_ordered"),
        )
        .select(
            *id_list,
            "way_seq",
            F.transform(F.col("_ordered"), lambda s: s["pt"]).alias("way_nodes"),
        )
    )
