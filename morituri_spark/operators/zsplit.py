"""W1/W2: z-level way splitting — the reference's flagship operator.

Ports the exact semantics of ``split_way_by_z_level`` +
``create_continuing_sub_ways`` (/root/reference/plugins/navteq/
navteq.hpp:347-469) and the ferry endpoint normalization
``set_ferry_z_lvls_to_zero`` (navteq.hpp:525-534), pinned by the reference's
44 golden vectors (/root/reference/tests/navteq/test_navteq2osm.cpp:47-101).

Semantics recap (all indices 0-based vertex positions in the link's
linestring; the z-pair list holds only NONZERO z entries, ordered by index —
zero rows are dropped at load, navteq.hpp:1036):

  * a leading z=0 head segment is emitted if the first nonzero-z vertex sits
    at index ≥ 2 (start_index = first_pair_index - 1);
  * runs of equal z become one segment reaching one vertex PAST the run's
    end iff the next z is strictly |.|-inferior (``is_superior``), else
    stopping at the run end;
  * index gaps > 1 between consecutive pairs emit z=0 gap segments;
  * single-vertex spikes are absorbed when the vertex two ahead is at
    index+2 with |.|-superior-or-equal z equal to the current z;
  * a trailing z=0 tail segment covers the rest of the way.

Spark shape: per-street logic is row-local after the J1 zlevels group-join,
so the operator is a ``mapInPandas`` over (link_id, n_points, z_pairs) rows
— one Arrow batch in, one exploded segment table out; no per-link shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StructField, StructType,
)

Z_LVL_MIN, Z_LVL_MAX = -4, 5  # navteq_types.hpp:88, navteq.hpp:248-252

# The reference's 44 golden vectors (tests/navteq/test_navteq2osm.cpp:47-101):
# (node z-level sequence, expected way z-level sequence in emission order).
GOLDEN_VECTORS: list[tuple[str, list[int]]] = [
    ("0 1", [1]), ("1 0", [1]), ("1 1", [1]),
    ("0 0 1", [0, 1]), ("0 1 0", [1]), ("0 1 1", [1]), ("1 0 0", [1, 0]),
    ("1 0 1", [1]), ("1 1 0", [1]), ("1 1 1", [1]),
    ("-1 0 -1", [-1]), ("-1 1 -1", [-1]), ("1 -1 1", [1]), ("0 -1 0", [-1]),
    ("2 1 2", [2]), ("-2 -1 -2", [-2]), ("-2 -1 -3", [-2, -3]),
    ("0 0 0 1", [0, 1]), ("0 0 1 0", [0, 1]), ("0 0 1 1", [0, 1]),
    ("0 1 0 0", [1, 0]), ("0 1 0 1", [1]), ("0 1 1 0", [1]), ("0 1 1 1", [1]),
    ("1 0 0 0", [1, 0]), ("1 0 0 1", [1, 0, 1]), ("1 0 1 0", [1]),
    ("1 0 1 1", [1]), ("1 1 0 0", [1, 0]), ("1 1 0 1", [1]), ("1 1 1 0", [1]),
    ("1 1 1 1", [1]),
    ("1 2 2 1", [2]), ("2 1 1 2", [2, 1, 2]),
    ("1 0 0 0 1", [1, 0, 1]), ("2 1 0 1 2", [2, 1, 2]),
    ("2 1 0 0 1 2", [2, 1, 0, 1, 2]),
    ("0 1 1 0 1 1 0", [1]),
    ("0 1 0 1 0 1 0 1", [1]), ("0 1 1 0 0 1 0 0", [1, 0, 1, 0]),
    ("1 0 1 0 1 0 1 0", [1]),
    ("0 1 0 1 0 0 1 0 1", [1, 0, 1]),
    ("0 1 1 0 1 1 0 1 1 0", [1]), ("0 4 4 0 0 0 5 5 0 0", [4, 0, 5, 0]),
]


def check_z_lvl_range(z: int) -> None:
    if not Z_LVL_MIN <= z <= Z_LVL_MAX:
        raise ValueError(f"z_lvl {z} is not valid")


def set_ferry_z_lvls_to_zero(pairs: list[tuple[int, int]], n_points: int):
    """W2 (navteq.hpp:525-534): ferries keep only endpoint z-levels."""
    pairs = list(pairs)
    if len(pairs) > 2:
        pairs = [pairs[0], pairs[-1]]
    if pairs and pairs[0][0] != 0:
        pairs = pairs[1:]
    if pairs and pairs[-1][0] != n_points - 1:
        pairs = pairs[:-1]
    return pairs


def _is_superior(a: int, b: int) -> bool:
    return abs(a) > abs(b)


def _is_superior_or_equal(a: int, b: int) -> bool:
    return abs(a) >= abs(b)


def split_way_by_z_level(n_points: int, pairs: list[tuple[int, int]]):
    """→ ordered [(from_idx, to_idx, z)] sub-way segments, [from,to] vertex-
    inclusive. Exact port of navteq.hpp:347-469 control flow."""
    if not pairs:
        return [(0, n_points - 1, 0)]
    first_index, last_index = 0, n_points - 1
    start_index = pairs[0][0]
    if start_index > 0:
        start_index -= 1
    assert first_index <= start_index < last_index, "start/last index invariant"

    segments: list[tuple[int, int, int]] = []
    if first_index != start_index:
        segments.append((first_index, start_index, 0))

    # create_continuing_sub_ways (navteq.hpp:373-439)
    i, n = 0, len(pairs)
    while i < n:
        index, z_lvl = pairs[i]
        check_z_lvl_range(z_lvl)
        last_element = i == n - 1
        if not last_element:
            next_index, next_z = pairs[i + 1]
            check_z_lvl_range(next_z)
            if index + 2 == next_index and z_lvl == next_z:
                i += 1
                continue
            if i + 2 < n:
                second_next_index, second_next_z = pairs[i + 2]
                check_z_lvl_range(second_next_z)
                if (
                    index + 2 == second_next_index
                    and _is_superior_or_equal(second_next_z, next_z)
                    and z_lvl == second_next_z
                ):
                    i += 2  # C++ ++it inside loop + loop ++it
                    continue
        if last_element or index + 1 < next_index or z_lvl != next_z:
            frm = start_index
            if last_element or index + 1 < next_index or _is_superior(z_lvl, next_z):
                to = min(index + 1, last_index)
            else:
                to = index
            if frm < to:
                segments.append((frm, to, z_lvl))
                start_index = to
            if not last_element and to < next_index - 1:
                segments.append((to, next_index - 1, 0))
                start_index = next_index - 1
        i += 1

    if start_index < last_index:
        segments.append((start_index, last_index, 0))
    return segments


def split_link(n_points: int, pairs, is_ferry: bool = False):
    """W2 (if ferry) then W1; mirrors process_way's z-path
    (navteq.hpp:598-629). ``pairs`` must hold only nonzero z."""
    pairs = sorted((int(a), int(b)) for a, b in pairs)
    if is_ferry:
        pairs = set_ferry_z_lvls_to_zero(pairs, n_points)
    if not pairs:
        # all z suppressed → single whole-way segment at z=0
        return [(0, n_points - 1, 0)]
    return split_way_by_z_level(n_points, pairs)


SEGMENTS_SCHEMA = StructType(
    [
        StructField("link_id", LongType(), False),
        StructField("seg_seq", IntegerType(), False),
        StructField("from_idx", IntegerType(), False),
        StructField("to_idx", IntegerType(), False),
        StructField("z_lvl", IntegerType(), False),
    ]
)


def prepare_z_groups(zlevels: DataFrame) -> DataFrame:
    """A2 (navteq.hpp:1020-1041): drop z==0 at scan (Catalyst pushes this
    into the parquet read), group per link, explicit order by POINT_NUM
    (the reference relies on file order; we sort explicitly). POINT_NUM is
    1-based on disk → 0-based index here (reader subtracts 1)."""
    return (
        zlevels.where(F.col("Z_LEVEL") != 0)
        .select(
            F.col("LINK_ID").alias("link_id"),
            (F.col("POINT_NUM") - 1).cast("int").alias("idx"),
            F.col("Z_LEVEL").cast("int").alias("z"),
        )
        .groupBy("link_id")
        .agg(F.sort_array(F.collect_list(F.struct("idx", "z"))).alias("z_pairs"))
    )


_SEG_ARR = "array<struct<from_idx:int,to_idx:int,z_lvl:int>>"


def _seg(frm, to, z):
    return F.struct(
        frm.cast("int").alias("from_idx"),
        to.cast("int").alias("to_idx"),
        z.cast("int").alias("z_lvl"),
    )


def _fold_step(last_idx, empty):
    """The per-pair fold body (closure over the link's last vertex index)."""

    def step(acc, t):
        cur, nxt, snd = t["cur"], t["nxt"], t["snd"]
        last = nxt.isNull()
        processing = acc["skip"] == 0
        # single-vertex spike absorption (navteq.hpp:373-439's ++it jumps)
        sp1 = processing & ~last & (cur["idx"] + 2 == nxt["idx"]) & (cur["z"] == nxt["z"])
        sp2 = (
            processing & ~sp1 & ~last & snd.isNotNull()
            & (cur["idx"] + 2 == snd["idx"])
            & (F.abs(snd["z"]) >= F.abs(nxt["z"]))
            & (cur["z"] == snd["z"])
        )
        breakp = processing & ~sp1 & ~sp2 & (
            last | (cur["idx"] + 1 < nxt["idx"]) | (cur["z"] != nxt["z"])
        )
        reach = last | (cur["idx"] + 1 < nxt["idx"]) | (F.abs(cur["z"]) > F.abs(nxt["z"]))
        to = F.when(reach, F.least(cur["idx"] + 1, last_idx)).otherwise(cur["idx"])
        emit1 = breakp & (acc["start"] < to)
        gapc = breakp & ~last & (to < nxt["idx"] - 1)
        # iterator jumps: spike-1 is `++i; continue` (no emission, nothing
        # skipped); spike-2 is `i += 2; continue` (the NEXT element skipped)
        new_skip = (
            F.when(~processing, acc["skip"] - 1)
            .when(sp1, F.lit(0))
            .when(sp2, F.lit(1))
            .otherwise(F.lit(0))
        )
        new_start = (
            F.when(gapc, nxt["idx"] - 1).when(emit1, to).otherwise(acc["start"])
        )
        new_segs = F.concat(
            acc["segs"],
            F.when(emit1, F.array(_seg(acc["start"], to, cur["z"]))).otherwise(empty),
            F.when(gapc, F.array(_seg(to, nxt["idx"] - 1, F.lit(0)))).otherwise(empty),
        )
        return F.struct(
            new_skip.cast("int").alias("skip"),
            new_start.cast("int").alias("start"),
            new_segs.alias("segs"),
        )

    return step


def split_ways_catalyst(streets_with_z: DataFrame) -> DataFrame:
    """split_link as a Catalyst fold (F.aggregate over (cur, next,
    second-next) triples, the C++ iterator's skip-ahead carried in the
    accumulator): no Python, no Arrow. Same input/output contract as
    split_ways; pinned to the same 44 goldens + a 300-vector random
    equivalence test.

    MEASURED OUTCOME — the Arrow kernel wins and stays the default:
    0.42 s (kernel) vs 5.9 s (this fold) on the 20k-link bench. Catalyst
    higher-order functions evaluate interpreted (no whole-stage codegen),
    ~60 µs per fold step, while the kernel's input is one row per LINK —
    nowhere near the Python-worker transfer ceiling. Kept as the
    zero-Python alternative and as executable documentation of the
    trade-off.

    STAGING MATTERS: every intermediate (normalized pairs, triples, fold
    result) is its own projected column, referenced — not inlined — by the
    next stage. Building this as one nested expression re-evaluates the
    fold and the pair chain several times per row (expressions are inlined
    per reference, no CSE in interpreted HOF eval): measured 245 s vs 4 s
    on the 20k-link bench for the identical logic.
    """
    last_idx = F.col("n_points") - 1
    empty = F.array().cast(_SEG_ARR)

    df = streets_with_z.select("link_id", "n_points", "is_ferry", "z_pairs")
    # --- W2 set_ferry_z_lvls_to_zero (navteq.hpp:525-534), one step/column ---
    df = df.withColumn(
        "_pa",
        F.when(
            F.col("is_ferry") & (F.size("z_pairs") > 2),
            F.array(F.element_at("z_pairs", 1), F.element_at("z_pairs", -1)),
        ).otherwise(F.col("z_pairs")),
    )
    df = df.withColumn(
        "_pb",
        F.when(
            F.col("is_ferry") & (F.size("_pa") > 0) & (F.get("_pa", 0)["idx"] != 0),
            F.slice("_pa", 2, F.greatest(F.size("_pa") - 1, F.lit(0))),
        ).otherwise(F.col("_pa")),
    )
    df = df.withColumn(
        "_p",
        F.when(
            F.col("is_ferry") & (F.size("_pb") > 0)
            & (F.element_at("_pb", -1)["idx"] != last_idx),
            F.slice("_pb", 1, F.size("_pb") - 1),
        ).otherwise(F.col("_pb")),
    )
    # --- z-range guard (check_z_lvl_range → raise_error) ---
    bad = F.exists("_p", lambda s: (s["z"] < Z_LVL_MIN) | (s["z"] > Z_LVL_MAX))
    guard = F.when(
        bad, F.raise_error(F.lit("z_lvl is not valid")).cast("int")
    ).otherwise(F.lit(0))
    df = df.withColumn(
        "_start0",
        (F.greatest(F.get("_p", 0)["idx"] - 1, F.lit(0)) + guard).cast("int"),
    )
    df = df.withColumn(
        "_triples",
        F.transform(
            F.sequence(F.lit(0), F.size("_p") - 1),
            lambda i: F.struct(
                F.get("_p", i).alias("cur"),
                F.get("_p", i + 1).alias("nxt"),
                F.get("_p", i + 2).alias("snd"),
            ),
        ),
    )
    head = F.when(
        F.col("_start0") > 0, F.array(_seg(F.lit(0), F.col("_start0"), F.lit(0)))
    ).otherwise(empty)
    init = F.struct(
        F.lit(0).alias("skip"), F.col("_start0").alias("start"), head.alias("segs")
    )
    df = df.withColumn(
        "_acc", F.aggregate("_triples", init, _fold_step(last_idx, empty))
    )
    with_tail = F.concat(
        F.col("_acc")["segs"],
        F.when(
            F.col("_acc")["start"] < last_idx,
            F.array(_seg(F.col("_acc")["start"], last_idx, F.lit(0))),
        ).otherwise(empty),
    )
    whole = F.array(_seg(F.lit(0), last_idx, F.lit(0)))
    df = df.withColumn(
        "_segs", F.when(F.size("_p") == 0, whole).otherwise(with_tail)
    )
    return (
        df.select("link_id", F.posexplode("_segs").alias("seg_seq", "_s"))
        .select(
            "link_id",
            F.col("seg_seq").cast("int").alias("seg_seq"),
            F.col("_s.from_idx").alias("from_idx"),
            F.col("_s.to_idx").alias("to_idx"),
            F.col("_s.z_lvl").alias("z_lvl"),
        )
    )


def split_ways(streets_with_z: DataFrame) -> DataFrame:
    """Input: (link_id, n_points, z_pairs, is_ferry). Output: one row per
    sub-way segment in the reference's emission order (``seg_seq``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            link_ids, seqs, froms, tos, zs = [], [], [], [], []
            for link_id, n_points, z_pairs, is_ferry in zip(
                pdf["link_id"], pdf["n_points"], pdf["z_pairs"], pdf["is_ferry"]
            ):
                pairs = [(p["idx"], p["z"]) for p in z_pairs]
                segs = split_link(int(n_points), pairs, bool(is_ferry))
                for s, (f, t, z) in enumerate(segs):
                    link_ids.append(link_id)
                    seqs.append(s)
                    froms.append(f)
                    tos.append(t)
                    zs.append(z)
            yield pd.DataFrame(
                {
                    "link_id": np.asarray(link_ids, dtype=np.int64),
                    "seg_seq": np.asarray(seqs, dtype=np.int32),
                    "from_idx": np.asarray(froms, dtype=np.int32),
                    "to_idx": np.asarray(tos, dtype=np.int32),
                    "z_lvl": np.asarray(zs, dtype=np.int32),
                }
            )

    return streets_with_z.mapInPandas(run, SEGMENTS_SCHEMA)
