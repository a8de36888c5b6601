"""Entry point 3 — administrative boundaries (SURVEY.md §3.3).

Reference flow: process_meta_areas (A4 group-collect of localized names per
AREA_ID, navteq.hpp:813-843) → per polygon feature: rings → fresh nodes (no
cross-boundary dedup, navteq.hpp:654-669) → ≤1000-node way chunks (W4) →
relation with admin tags (J6 broadcast join to the A4 groups; admin_level =
2×navteq level — F3; name:<iso-639-1> from camel-cased AREA_NAME — F1/F4)
and outer/inner members (navteq.hpp:697-776).

Spark shape: explode rings → chunk_rings (pure Catalyst) → dense way ids;
relations = boundary rows ⟕ broadcast(mtd groups) + collected member lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.strings import admin_lvl_col, camel_case_udf, lang_code_expr
from .nodes import zip_with_index
from .rings import chunk_rings


def ring_roles(rings) -> list[bool]:
    """Outer/inner role per ring by containment-depth parity: a ring whose
    first vertex sits inside an EVEN number of the boundary's other rings is
    an exterior. Handles MultiPolygon boundaries (several islands, each with
    optional holes — navteq.hpp:787-797 dispatches wkbMultiPolygon) where
    the old ``ring_idx == 0`` rule mislabels every second exterior."""
    from ..geo.pip import points_in_ring_np, ring_np

    rs = [ring_np(r) for r in rings]
    roles = []
    for i, r in enumerate(rs):
        px = np.asarray([r[0, 0]])
        py = np.asarray([r[0, 1]])
        depth = sum(
            bool(points_in_ring_np(px, py, other)[0])
            for j, other in enumerate(rs)
            if j != i
        )
        roles.append(depth % 2 == 0)
    return roles


from pyspark.sql.types import ArrayType, BooleanType  # noqa: E402


@F.pandas_udf(ArrayType(BooleanType()))  # DataType object: no session needed at import
def _ring_roles_udf(rings: pd.Series) -> pd.Series:
    return rings.map(ring_roles)


def admin_meta_groups(mtd_area: DataFrame) -> DataFrame:
    """A4 (navteq.hpp:813-843): per AREA_ID — admin level + localized names.
    The reference warns on conflicting ADMIN_LVL per area and keeps the
    first; we keep the min (deterministic) and expose the conflict count."""
    names = mtd_area.select(
        "AREA_ID",
        lang_code_expr(F.col("LANG_CODE")).alias("lang"),
        camel_case_udf(F.col("AREA_NAME")).alias("name"),
        F.col("ADMIN_LVL"),
    )
    return names.groupBy("AREA_ID").agg(
        F.min("ADMIN_LVL").alias("ADMIN_LVL"),
        (F.count_distinct("ADMIN_LVL") > 1).alias("admin_lvl_conflict"),
        F.sort_array(F.collect_list(F.struct("lang", "name"))).alias("localized_names"),
    )


def admin_ways(adminbndy: DataFrame) -> DataFrame:
    """Rings → chunked ways with dense ids. Input: (AREA_ID, level, rings)
    where rings[0] is the exterior. Output rows: (way_id, area_id, level,
    ring_idx, is_outer, way_seq, way_nodes)."""
    zipped = F.arrays_zip(
        F.col("rings").alias("ring"), _ring_roles_udf(F.col("rings")).alias("outer")
    )
    rings = adminbndy.select(
        F.col("AREA_ID").alias("area_id"),
        "level",
        F.posexplode(zipped).alias("ring_idx", "_rr"),
    ).select(
        "area_id", "level", "ring_idx",
        F.col("_rr.ring").alias("ring"),
        F.col("_rr.outer").alias("is_outer"),
    )
    chunked = chunk_rings(rings, ring_col="ring", id_cols=("area_id", "level", "ring_idx", "is_outer"))
    return zip_with_index(
        chunked,
        order_cols=["area_id", "level", "ring_idx", "way_seq"],
        id_col="way_id",
    )


def admin_relations(adminbndy: DataFrame, mtd_area: DataFrame, ways: DataFrame) -> DataFrame:
    """One relation per boundary feature: J6 meta join + ordered outer/inner
    member way lists + tag columns."""
    meta = admin_meta_groups(mtd_area)
    members = (
        ways.groupBy("area_id", "level")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ring_idx", "way_seq", "way_id", "is_outer"))
            ).alias("_m")
        )
        .select(
            "area_id",
            "level",
            F.transform(
                F.filter(F.col("_m"), lambda m: m["is_outer"]), lambda m: m["way_id"]
            ).alias("outer_way_ids"),
            F.transform(
                F.filter(F.col("_m"), lambda m: ~m["is_outer"]), lambda m: m["way_id"]
            ).alias("inner_way_ids"),
        )
    )
    rel = (
        adminbndy.select(F.col("AREA_ID").alias("area_id"), "level")
        .join(members, ["area_id", "level"])
        .join(F.broadcast(meta.withColumnRenamed("AREA_ID", "area_id")), "area_id", "left")
        .select(
            "area_id",
            "level",
            F.lit("multipolygon").alias("type"),
            F.lit("administrative").alias("boundary"),
            F.col("ADMIN_LVL").cast("string").alias("navteq_admin_level"),
            F.when(
                F.col("ADMIN_LVL").isNotNull(), admin_lvl_col(F.col("ADMIN_LVL"))
            ).alias("admin_level"),
            F.col("localized_names"),
            "outer_way_ids",
            "inner_way_ids",
        )
    )
    return zip_with_index(rel, order_cols=["area_id", "level"], id_col="relation_id")


def admin_nodes(ways: DataFrame) -> DataFrame:
    """Fresh nodes per ring — the reference does NOT dedup admin nodes across
    boundaries (navteq.hpp:654-669); shared chunk-boundary nodes within a
    ring ARE the same node (same position in the ring's node list), so the
    node universe is exactly the distinct (area, level, ring, pos) set."""
    per_ring = ways.select(
        "area_id", "level", "ring_idx", "way_seq", F.posexplode("way_nodes").alias("i", "pt")
    ).withColumn(
        # global position in the ring node list: way k starts at k*999
        "pos", F.col("way_seq") * (1000 - 1) + F.col("i")
    ).select("area_id", "level", "ring_idx", "pos", "pt").distinct()
    return zip_with_index(
        per_ring, order_cols=["area_id", "level", "ring_idx", "pos"], id_col="node_id"
    )


def convert_admin_boundaries(adminbndy: DataFrame, mtd_area: DataFrame) -> dict[str, DataFrame]:
    ways = admin_ways(adminbndy)
    return {
        "ways": ways,
        "nodes": admin_nodes(ways),
        "relations": admin_relations(adminbndy, mtd_area, ways),
    }
