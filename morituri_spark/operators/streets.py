"""Entry point 1 — street conversion (SURVEY.md §3.1) as one Spark DAG.

Reference flow: add_street_shapes (navteq.hpp:1113-1132) = dimension loads
(J2-J4 hash maps) → two passes over Streets (endpoint nodes, then ways with
z-splitting + tags). Here it is one declarative plan:

    streets ⟕ zlevels-groups (J1)  → split_ways (W1/W2)
            ⟕ restrictions (A1 over J2×J3, units via J4 imperial flag)
            → tag projection (P1-P6)
    nodes   = endpoint dedup (J7) ∪ z-endpoint dedup (J8) ∪ private middles (W3)

Join strategy: Cdms/CndMod/MtdArea/MtdCntryRef are dimension-sized →
``broadcast()`` (the reference's hand-built hash maps, navteq.hpp:966-1009);
zlevels-groups can be fact-sized → left to AQE/sort-merge on link_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import units as U
from ..functions.tags import street_tag_columns
from . import zsplit
from .nodes import quantize, zip_with_index

MOD_TAGS = {
    # MOD_TYPE → output column, is_weight (navteq_mappings.hpp:107-111)
    41: ("maxheight", False),
    42: ("maxweight", True),
    43: ("maxaxleload", True),
    44: ("maxlength", False),
    45: ("maxwidth", False),
}


def area_imperial_flags(mtd_area: DataFrame, cntry_ref: DataFrame) -> DataFrame:
    """J4 chain: AREA_ID → GOVT_CODE → UNTMEASURE == 'E'. MtdArea has one
    row per language; the reference's std::map keeps the first GOVT_CODE per
    area — they're constant per area, so ``min`` is equivalent and
    deterministic."""
    area_govt = mtd_area.groupBy("AREA_ID").agg(F.min("GOVT_CODE").alias("GOVT_CODE"))
    if cntry_ref is None:
        # no MtdCntryRef layer → metric everywhere (imperial only on an
        # explicit UNTMEASURE == 'E', tag_parser:230-258)
        return area_govt.select("AREA_ID", F.lit(False).alias("imperial"))
    return (
        area_govt.join(F.broadcast(cntry_ref.select("GOVT_CODE", "UNTMEASURE")), "GOVT_CODE", "left")
        .select("AREA_ID", (F.col("UNTMEASURE") == "E").alias("imperial"))
    )


def link_restrictions(
    streets: DataFrame,
    cdms: DataFrame,
    cnd_mod: DataFrame,
    mtd_area: DataFrame,
    cntry_ref: DataFrame,
) -> DataFrame:
    """A1 (tag_parser:274-307): per link, MIN nonzero MOD_VAL per restriction
    type over the link's conditions; formatted imperial or metric per the
    L/R-area any-imperial-wins disjunction (J4, tag_parser:230-258).

    Output: (LINK_ID, maxheight, maxwidth, maxlength, maxweight,
    maxaxleload) — strings, NULL when absent.
    """
    # the reference's cnd_mod map keeps the FIRST row per cond_id
    # (std::map::insert, navteq.hpp:966-976); first-by-file-order is not
    # reconstructible from an unordered table, so we pin min(struct) —
    # deterministic and equal when conds carry a single modifier (the data
    # contract in the fixtures).
    one_mod = (
        cnd_mod.groupBy("COND_ID")
        .agg(F.min(F.struct("MOD_TYPE", "MOD_VAL")).alias("m"))
        .select("COND_ID", F.col("m.MOD_TYPE").alias("MOD_TYPE"), F.col("m.MOD_VAL").alias("MOD_VAL"))
    )
    mods = cdms.join(F.broadcast(one_mod), "COND_ID")  # J2 ∘ J3
    aggs = [
        F.min(F.when((F.col("MOD_TYPE") == mt) & (F.col("MOD_VAL") > 0), F.col("MOD_VAL"))).alias(
            f"_raw_{mt}"
        )
        for mt in MOD_TAGS
    ]
    mins = mods.groupBy("LINK_ID").agg(*aggs)

    imp = area_imperial_flags(mtd_area, cntry_ref)
    links = (
        streets.select("LINK_ID", "L_AREA_ID", "R_AREA_ID")
        .join(F.broadcast(imp.withColumnRenamed("AREA_ID", "L_AREA_ID").withColumnRenamed("imperial", "_l_imp")), "L_AREA_ID", "left")
        .join(F.broadcast(imp.withColumnRenamed("AREA_ID", "R_AREA_ID").withColumnRenamed("imperial", "_r_imp")), "R_AREA_ID", "left")
        .select(
            "LINK_ID",
            (F.coalesce(F.col("_l_imp"), F.lit(False)) | F.coalesce(F.col("_r_imp"), F.lit(False))).alias("imperial"),
        )
    )
    joined = mins.join(links, "LINK_ID", "left").fillna({"imperial": False})
    cols = [F.col("LINK_ID")]
    for mt, (name, is_weight) in MOD_TAGS.items():
        raw = F.col(f"_raw_{mt}")
        if is_weight:
            metric, imperial = U.kg_to_t_udf(raw), U.lbs_to_metric_ton_udf(raw)
        else:
            metric, imperial = U.cm_to_m_udf(raw), U.inch_to_feet_col(raw)
        cols.append(
            F.when(raw.isNull(), None)
            .otherwise(F.when(F.col("imperial"), imperial).otherwise(metric))
            .alias(name)
        )
    return joined.select(*cols)


def street_ways(
    streets: DataFrame,
    zlevels: DataFrame,
    cdms: DataFrame | None = None,
    cnd_mod: DataFrame | None = None,
    mtd_area: DataFrame | None = None,
    cntry_ref: DataFrame | None = None,
) -> DataFrame:
    """The way-producing half of the pipeline: one output row per (sub-)way
    with its vertex slice, z_lvl, and full tag set. Way ids are dense,
    ordered by (link_id, seg_seq) — consecutive-from-1 like the reference's
    id counter; the ORDER differs from C++ file order but is total and
    deterministic, which is what the fixture row-count/assignment checks
    need."""
    z_groups = zsplit.prepare_z_groups(zlevels)
    base = streets.withColumn("n_points", F.size("geometry")).withColumn(
        "is_ferry", F.col("FERRY_TYPE").isin("B", "R")
    )
    with_z = base.select(
        F.col("LINK_ID").alias("link_id"), "n_points", "is_ferry"
    ).join(z_groups, "link_id", "inner")

    # Arrow kernel, deliberately: a Catalyst aggregate() fold with identical
    # semantics exists (zsplit.split_ways_catalyst) but measured 14× SLOWER
    # (5.9s vs 0.42s on 20k links) — higher-order functions evaluate
    # interpreted, outside whole-stage codegen, while the kernel is one
    # Arrow batch of vectorizable per-link loops. Python is fine here:
    # input is one row per LINK (not per vertex), far below the
    # worker-transfer ceiling.
    segments = zsplit.split_ways(with_z)  # (link_id, seg_seq, from_idx, to_idx, z_lvl)
    # links without z entries: one whole-way segment at the sentinel z=-5 →
    # no layer tag (navteq.hpp:587-597 build_way default)
    no_z = (
        base.select(F.col("LINK_ID").alias("link_id"), "n_points")
        .join(z_groups.select("link_id"), "link_id", "left_anti")
        .select(
            "link_id",
            F.lit(0).alias("seg_seq"),
            F.lit(0).alias("from_idx"),
            (F.col("n_points") - 1).cast("int").alias("to_idx"),
            F.lit(None).cast("int").alias("z_lvl"),
        )
    )
    # The segment relation feeds BOTH the tagged-way join and the dense-id
    # derivation (whose counts+numbering is itself two passes): without a
    # materialization the split kernel subtree recomputes per consumer —
    # the physical plan held FOUR MapInPandas copies of it (r6, guide
    # §2.4). One localCheckpoint (knn _Round) computes it once; blocks
    # are reclaimed by the ContextCleaner when the plan is dropped.
    from ..geo.knn import _Round

    all_segs = _Round.materialize(
        segments.unionByName(no_z), truncate=True
    ).df

    tag_cols = street_tag_columns()
    tagged = streets.select(*[v.alias(k) for k, v in tag_cols.items()], "geometry")
    if cdms is not None and cnd_mod is not None:
        restr = link_restrictions(streets, cdms, cnd_mod, mtd_area, cntry_ref)
        tagged = tagged.join(
            F.broadcast(restr.withColumnRenamed("LINK_ID", "link_id")), "link_id", "left"
        )

    ways = all_segs.join(tagged, "link_id").withColumn(
        # G2 sublinestring slice [from,to] inclusive (navteq.hpp:308-314)
        "way_geometry",
        F.slice(F.col("geometry"), F.col("from_idx") + 1, F.col("to_idx") - F.col("from_idx") + 1),
    ).drop("geometry")
    ways = ways.withColumn(
        "layer", F.when(F.col("z_lvl").isNotNull() & (F.col("z_lvl") != 0), F.col("z_lvl").cast("string"))
    )
    # dense ids over the NARROW key frame only (zip_with_index persists its
    # input between the counts and numbering passes — keep geometry and the
    # 30 tag columns out of that cache), then join ids back
    ids = zip_with_index(
        all_segs.select("link_id", "seg_seq"),
        order_cols=["link_id", "seg_seq"],
        id_col="way_id",
    )
    return ways.join(ids, ["link_id", "seg_seq"])


def street_nodes(streets: DataFrame, zlevels: DataFrame) -> DataFrame:
    """The node-producing half: J7 endpoint dedup across links, J8 (loc,z)
    dedup for z-endpoints, W3 private middle nodes per link. Output:
    (node_id, lon_i, lat_i, z_lvl NULL for plain, link_id NULL for shared).

    Disjoint dense id ranges per class (S8): shared endpoints first, then
    z-nodes, then middles — counts+offsets, no global window.
    """
    verts = streets.select(
        F.col("LINK_ID").alias("link_id"),
        F.posexplode("geometry").alias("pos", "pt"),
        F.size("geometry").alias("n"),
    ).select(
        "link_id", "pos", "n",
        quantize(F.col("pt")[0]).alias("lon_i"),
        quantize(F.col("pt")[1]).alias("lat_i"),
    )
    is_end = (F.col("pos") == 0) | (F.col("pos") == F.col("n") - 1)

    z = zlevels.where(F.col("Z_LEVEL") != 0).select(
        F.col("LINK_ID").alias("link_id"),
        (F.col("POINT_NUM") - 1).cast("int").alias("pos"),
        F.col("Z_LEVEL").cast("int").alias("z_lvl"),
    )
    ends = verts.where(is_end).join(z, ["link_id", "pos"], "left")

    plain_ends = (
        ends.where(F.col("z_lvl").isNull()).select("lon_i", "lat_i").distinct()
    )
    z_ends = (
        ends.where(F.col("z_lvl").isNotNull()).select("lon_i", "lat_i", "z_lvl").distinct()
    )
    middles = verts.where(~is_end).select("link_id", "lon_i", "lat_i").distinct()

    n_plain = plain_ends.count()
    n_z = z_ends.count()
    plain_ids = zip_with_index(plain_ends, ["lon_i", "lat_i"], start=1, id_col="node_id").select(
        "node_id", "lon_i", "lat_i", F.lit(None).cast("int").alias("z_lvl"),
        F.lit(None).cast("long").alias("link_id"),
    )
    z_ids = zip_with_index(
        z_ends, ["lon_i", "lat_i", "z_lvl"], start=1 + n_plain, id_col="node_id"
    ).select("node_id", "lon_i", "lat_i", "z_lvl", F.lit(None).cast("long").alias("link_id"))
    mid_ids = zip_with_index(
        middles, ["link_id", "lon_i", "lat_i"], start=1 + n_plain + n_z, id_col="node_id"
    ).select("node_id", "lon_i", "lat_i", F.lit(None).cast("int").alias("z_lvl"), "link_id")
    return plain_ids.unionByName(z_ids).unionByName(mid_ids)


def resolve_way_node_refs(ways: DataFrame, nodes: DataFrame, zlevels: DataFrame) -> DataFrame:
    """Attach ordered node-id lists to ways (the reference's WayNodeList,
    navteq.hpp:262-299): each vertex resolves to — in priority order — the
    (loc, z) shared node (J8), the link's private middle node (W3), then
    the plain shared endpoint (J7). Returns ways + ``node_refs``.

    Plan: posexplode vertices → three left joins against the node classes →
    coalesce → groupBy way collect ordered. All equi-joins on quantized
    int64 keys; the node side is output-sized, joined on its natural key.
    """
    verts = ways.select(
        "way_id", "link_id", "from_idx",
        F.posexplode("way_geometry").alias("i", "pt"),
    ).select(
        "way_id", "link_id",
        (F.col("from_idx") + F.col("i")).alias("pos"),
        F.col("i").alias("seq_in_way"),
        quantize(F.col("pt")[0]).alias("lon_i"),
        quantize(F.col("pt")[1]).alias("lat_i"),
    )
    z = zlevels.where(F.col("Z_LEVEL") != 0).select(
        F.col("LINK_ID").alias("link_id"),
        (F.col("POINT_NUM") - 1).cast("int").alias("pos"),
        F.col("Z_LEVEL").cast("int").alias("z_lvl"),
    )
    verts = verts.join(z, ["link_id", "pos"], "left")

    znodes = nodes.where(F.col("z_lvl").isNotNull()).select(
        "lon_i", "lat_i", "z_lvl", F.col("node_id").alias("_zn")
    )
    midnodes = nodes.where(F.col("link_id").isNotNull()).select(
        "lon_i", "lat_i", "link_id", F.col("node_id").alias("_mn")
    )
    endnodes = nodes.where(
        F.col("link_id").isNull() & F.col("z_lvl").isNull()
    ).select("lon_i", "lat_i", F.col("node_id").alias("_en"))

    resolved = (
        verts.join(znodes, ["lon_i", "lat_i", "z_lvl"], "left")
        .join(midnodes, ["lon_i", "lat_i", "link_id"], "left")
        .join(endnodes, ["lon_i", "lat_i"], "left")
        .withColumn("node_id", F.coalesce("_zn", "_mn", "_en"))
    )
    refs = resolved.groupBy("way_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("seq_in_way", "node_id"))),
            lambda s: s["node_id"],
        ).alias("node_refs")
    )
    return ways.join(refs, "way_id")


def convert_streets(
    streets: DataFrame,
    zlevels: DataFrame,
    cdms: DataFrame | None = None,
    cnd_mod: DataFrame | None = None,
    mtd_area: DataFrame | None = None,
    cntry_ref: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The full entry point: {'ways': ..., 'nodes': ...} — ways carry
    resolved ``node_refs`` (the reference's WayNodeList)."""
    ways = street_ways(streets, zlevels, cdms, cnd_mod, mtd_area, cntry_ref)
    nodes = street_nodes(streets, zlevels)
    return {
        "ways": resolve_way_node_refs(ways, nodes, zlevels),
        "nodes": nodes,
    }
