"""Sorted-neighborhood blocking — the classic entity-resolution
candidate generator (Hernandez & Stolfo 1995).

Near-duplicate and record-linkage pipelines need candidate PAIRS
without the O(n²) cross product. MinHash/SimHash (text/dedup.py) block
by content hashes; the sorted-neighborhood method instead sorts records
by a domain sort key (normalized name, address, title prefix) and emits
every pair within a sliding window of ``w`` consecutive records — an
O(n·w) candidate budget that is EXACT by construction (no probabilistic
misses within the window) and whose recall the caller tunes by running
multiple passes with different sort keys.

Spark-first shape: ONE ordered window per block carrying ``w − 1``
``lead()`` columns, then a stack — no self-join, no explode-side
fan-out. Total candidate output is ≤ n·(w−1) REGARDLESS of block-size
skew (a mega block costs its sort, the same bound as any ordered
window, but never a quadratic pair blowup — the window is the skew
defense, unlike a naive per-block cross join). The only exchange is
the per-block hash partition; with ``block_col=None`` the whole input
is one ordered partition — correct, but single-task: at scale always
block (the method's own prescription — the sort key's prefix is the
usual block).

Reference scope: no counterpart in morituri; LLM-pipeline dedup family
(SURVEY.md §2 extension), sibling of text/dedup.py (MinHash/SimHash
blocking) and text/fuzzy.py (edit-distance-1 neighborhoods).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str = "id",
    sort_col: str = "sk",
    block_col: str | None = None,
    window: int = 3,
) -> DataFrame:
    """→ (block?, id_a, id_b, sk_a, sk_b, rank_dist): all pairs of
    records at sort-rank distance 1 ≤ d ≤ window − 1 within a block,
    ordered by (sort key, id) — the id tie-break makes the rank total,
    so the pair set is deterministic under duplicate sort keys.
    ``id_a`` is always the earlier record in sort order.
    """
    w = int(window)
    if w < 2:
        raise ValueError(f"window must be >= 2, got {w}")
    bs = [block_col] if block_col else []
    ordw = Window.partitionBy(*bs).orderBy("_sk", "_id")
    staged = df.select(
        *bs,
        F.col(id_col).alias("_id"),
        F.col(sort_col).alias("_sk"),
    ).select(
        *bs,
        "_id",
        "_sk",
        *[F.lead("_id", d).over(ordw).alias(f"_id{d}") for d in range(1, w)],
        *[F.lead("_sk", d).over(ordw).alias(f"_sk{d}") for d in range(1, w)],
    )
    pairs = staged.select(
        *bs,
        F.col("_id").alias("id_a"),
        F.col("_sk").alias("sk_a"),
        F.expr(
            "stack("
            + str(w - 1)
            + ", "
            + ", ".join(f"{d}, _id{d}, _sk{d}" for d in range(1, w))
            + ") AS (rank_dist, id_b, sk_b)"
        ),
    )
    return pairs.where(F.col("id_b").isNotNull()).select(
        *bs,
        "id_a",
        "id_b",
        "sk_a",
        "sk_b",
        F.col("rank_dist").cast("long").alias("rank_dist"),
    )
