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
