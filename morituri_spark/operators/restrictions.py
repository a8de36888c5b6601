"""Entry point 2 — turn restrictions (SURVEY.md §3.2).

Reference flow (navteq.hpp:936-964): scan Rdms; per COND_ID run → via-link
sequence = [first row's LINK_ID] + every row's MAN_LINKID (A3,
navteq.hpp:845-862); skip when the Cdms lookup finds the cond with
COND_TYPE ≠ 7 (found-and-different — an unmatched cond id passes!,
navteq.hpp:949-950); resolve each link's ordered way chain with orientation
fixing (W5, navteq.hpp:864-921); abort the whole group on any missing link
(P8); emit a relation with from/via…/to way members, a via NODE for the
2-way case (J9, navteq.hpp:97-134), and tags restriction=no_straight_on,
type=restriction.

Spark shape: A3 groupBy → anti-filter (J2 lookup) → explode sequence → join
per-link way chains → completeness check → W5 as ``applyInPandas`` per
cond_id (groups are a handful of ways — genuinely sequential logic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

from .nodes import FIXED_POINT, zip_with_index

RESTRICTED_DRIVING_MANOEUVRE = 7  # navteq_mappings.hpp:117


def via_sequences(rdms: DataFrame, cdms: DataFrame) -> DataFrame:
    """A3 + the cond-type filter: (COND_ID, link_seq array<long>)."""
    seqs = (
        rdms.groupBy("COND_ID")
        .agg(
            F.min_by("LINK_ID", "SEQ").alias("from_link"),
            F.sort_array(F.collect_list(F.struct("SEQ", "MAN_LINKID"))).alias("_m"),
        )
        .select(
            "COND_ID",
            F.concat(
                F.array("from_link"), F.transform("_m", lambda m: m["MAN_LINKID"])
            ).alias("link_seq"),
        )
    )
    # keep iff cond_id missing from cdms OR cond_type == 7 (navteq.hpp:949-950)
    bad = cdms.where(F.col("COND_TYPE") != RESTRICTED_DRIVING_MANOEUVRE).select("COND_ID")
    return seqs.join(F.broadcast(bad), "COND_ID", "left_anti")


def link_way_chains(ways: DataFrame) -> DataFrame:
    """Per link: the ordered (by seg_seq) way chain with quantized endpoint
    locations — the g_link_id_map + way-endpoint view the W5 walk needs."""
    w = ways.select(
        "link_id",
        "seg_seq",
        "way_id",
        F.round(F.element_at("way_geometry", 1)[0] * FIXED_POINT).cast("long").alias("fx"),
        F.round(F.element_at("way_geometry", 1)[1] * FIXED_POINT).cast("long").alias("fy"),
        F.round(F.element_at("way_geometry", -1)[0] * FIXED_POINT).cast("long").alias("lx"),
        F.round(F.element_at("way_geometry", -1)[1] * FIXED_POINT).cast("long").alias("ly"),
    )
    return w.groupBy("link_id").agg(
        F.sort_array(F.collect_list(F.struct("seg_seq", "way_id", "fx", "fy", "lx", "ly"))).alias(
            "way_chain"
        )
    )


def resolve_chain(entries):
    """W5 (navteq.hpp:864-921): orientation-resolving walk. ``entries`` is
    the per-link list of way chains, each way (way_id, front, back) with
    front/back = (x, y) ints. Returns ordered way ids or None on topology
    mismatch (the reference would assert)."""
    out: list[int] = []
    epf = epb = None
    for ctr, ways in enumerate(entries):
        first_front = ways[0][1]
        last_back = ways[-1][2]
        if ctr == 0:
            epf, epb = first_front, last_back
        else:
            if ctr == 1 and (epf == first_front or epf == last_back):
                out.reverse()
                epf, epb = epb, epf
            if epb == last_back:
                epb = first_front
            elif epb == first_front:
                epb = last_back
            else:
                return None
        reverse = False
        if len(ways) > 1:
            if epb == first_front:
                reverse = True
            elif epb != last_back:
                return None
        seq = reversed(ways) if reverse else ways
        out.extend(w[0] for w in seq)
    return out


MEMBER_TYPE = ArrayType(
    StructType(
        [
            StructField("mtype", StringType(), False),
            StructField("ref", LongType(), False),
            StructField("role", StringType(), False),
        ]
    )
)

_RESOLVED_SCHEMA = StructType(
    [
        StructField("COND_ID", LongType(), False),
        StructField("way_ids", ArrayType(LongType()), False),
        StructField("via_x", LongType(), True),
        StructField("via_y", LongType(), True),
    ]
)


def resolve_restrictions(seqs: DataFrame, chains: DataFrame) -> DataFrame:
    """Explode link sequences, join way chains, W5-walk per cond_id.
    Incomplete groups (any link without ways) are dropped (P8)."""
    exploded = seqs.select("COND_ID", F.posexplode("link_seq").alias("pos", "link_id"))
    joined = exploded.join(chains, "link_id", "left")
    complete = (
        joined.groupBy("COND_ID")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("way_chain").alias("n_found"),
        )
        .where(F.col("n") == F.col("n_found"))
        .select("COND_ID")
    )
    ready = joined.join(complete, "COND_ID", "left_semi")

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        entries = []
        for chain in pdf["way_chain"]:
            entries.append(
                [
                    (int(w["way_id"]), (int(w["fx"]), int(w["fy"])), (int(w["lx"]), int(w["ly"])))
                    for w in chain
                ]
            )
        way_ids = resolve_chain(entries)
        if way_ids is None:
            return pd.DataFrame(columns=["COND_ID", "way_ids", "via_x", "via_y"])
        via_x = via_y = None
        if len(way_ids) == 2:
            # J9: shared endpoint of the two ways (navteq.hpp:97-134)
            flat = {w[0]: w for e in entries for w in e}
            ff, fb = flat[way_ids[0]][1], flat[way_ids[0]][2]
            tf, tb = flat[way_ids[1]][1], flat[way_ids[1]][2]
            if ff == tf or ff == tb:
                via_x, via_y = ff
            else:
                via_x, via_y = fb
        return pd.DataFrame(
            {
                "COND_ID": [pdf["COND_ID"].iloc[0]],
                "way_ids": [np.asarray(way_ids, dtype=np.int64)],
                "via_x": [via_x],
                "via_y": [via_y],
            }
        )

    return ready.groupBy("COND_ID").applyInPandas(walk, _RESOLVED_SCHEMA)


def build_turn_restrictions(
    rdms: DataFrame,
    cdms: DataFrame,
    ways: DataFrame,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Full pipeline → relations (relation_id, cond_id, members, tags).
    Members: from / via… / to ways; 2-way case adds the shared endpoint as a
    via NODE when it exists in the shared-endpoint node set (else skipped,
    matching the reference's warning path)."""
    resolved = resolve_restrictions(via_sequences(rdms, cdms), link_way_chains(ways))
    if nodes is not None:
        end_nodes = nodes.where(F.col("link_id").isNull()).select(
            F.col("lon_i").alias("via_x"), F.col("lat_i").alias("via_y"),
            F.col("node_id").alias("via_node_id"),
        )
        resolved = resolved.join(F.broadcast(end_nodes), ["via_x", "via_y"], "left")
    else:
        resolved = resolved.withColumn("via_node_id", F.lit(None).cast("long"))

    n = F.size("way_ids")
    members = F.concat(
        F.array(F.struct(F.lit("way").alias("mtype"), F.element_at("way_ids", 1).alias("ref"), F.lit("from").alias("role"))),
        F.transform(
            F.slice("way_ids", 2, F.greatest(n - 2, F.lit(0))),
            lambda w: F.struct(F.lit("way").alias("mtype"), w.alias("ref"), F.lit("via").alias("role")),
        ),
        F.when(
            (n == 2) & F.col("via_node_id").isNotNull(),
            F.array(F.struct(F.lit("node").alias("mtype"), F.col("via_node_id").alias("ref"), F.lit("via").alias("role"))),
        ).otherwise(F.array()),
        F.array(F.struct(F.lit("way").alias("mtype"), F.element_at("way_ids", -1).alias("ref"), F.lit("to").alias("role"))),
    )
    rel = resolved.select(
        F.col("COND_ID").alias("cond_id"),
        members.alias("members"),
        F.lit("no_straight_on").alias("restriction"),
        F.lit("restriction").alias("type"),
    )
    return zip_with_index(rel, order_cols=["cond_id"], id_col="relation_id")
