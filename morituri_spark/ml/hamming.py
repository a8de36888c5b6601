"""Generic 64-bit Hamming near-duplicate join (pigeonhole banding).

The scale shape shared by SimHash text dedup (text/dedup.py) and image
perceptual-hash dedup (the input table's ``phash:int64`` column): any two
hashes within Hamming distance ``d`` agree exactly on at least one of
``d+1`` disjoint bit blocks (pigeonhole), so candidate generation is a
bucket **equi-join** on (block index, block value) — never all-pairs —
followed by an exact ``bit_count(xor)`` verify. Everything is pure
Catalyst (rule 1: no Python in the hot path); recall is exactly 1 by
construction (driver-checked against a brute-force all-pairs DuckDB
oracle, not a replay of the same banding algebra).

At 10^12 rows the only hazard is a degenerate bucket (a block value
shared by millions of rows — e.g. the all-zero block of blank images):
``max_bucket`` caps per-(block, value) membership before the self-join
with explicit drop accounting via ``cap_stats`` — never a silent cap.

Reference parity: morituri deduplicates exact node locations
(plugins/navteq/navteq.hpp:480-500); near-duplicate *perceptual* joins
are target-spec extensions (BASELINE.json input_hint phash:int64).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def block_layout(n_blocks: int) -> list[tuple[int, int]]:
    """(bit offset, width) per block, covering all 64 bits. 64 need not
    divide evenly: the remainder widens the leading blocks by one bit
    (n_blocks=3 → 22/21/21)."""
    base, rem = divmod(64, n_blocks)
    widths = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    out, off = [], 0
    for w in widths:
        out.append((off, w))
        off += w
    return out


def _block_values(hash_col: str, n_blocks: int):
    """Array of per-block unsigned values. shiftrightunsigned keeps the
    sign bit's block correct for negative hashes (SimHash signs bit 63)."""
    vals = []
    for off, w in block_layout(n_blocks):
        col = F.shiftrightunsigned(F.col(hash_col), off)
        if w < 64:
            # a full-width block (n_blocks=1, max_hamming=0) needs no
            # mask — and its 2⁶⁴−1 literal would overflow py4j's long
            col = col.bitwiseAND(F.lit((1 << w) - 1))
        vals.append(col)
    return F.array(*vals)


def hamming_near_duplicates(
    df: DataFrame,
    hash_col: str,
    id_col: str = "id",
    max_hamming: int = 3,
    n_blocks: int | None = None,
    max_bucket: int | None = 10_000,
    cap_stats: dict | None = None,
) -> DataFrame:
    """All (id_a < id_b, hamming) pairs with ``bit_count(a xor b) <=
    max_hamming`` over an int64 hash column.

    ``n_blocks`` defaults to ``max_hamming + 1`` (the minimum with exact
    recall); more blocks trade a wider explode for smaller buckets on
    corpora dense in one hash region. ``max_bucket``/``cap_stats``: see
    module docstring — pass ``cap_stats={}`` to receive
    ``{"capped_buckets": n, "dropped_members": m}`` and a UserWarning
    when the cap engages.
    """
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if n_blocks < max_hamming + 1:
        raise ValueError(
            f"pigeonhole needs n_blocks >= max_hamming+1 "
            f"({n_blocks} < {max_hamming + 1}); recall would be < 1"
        )
    if n_blocks > 64:
        raise ValueError("n_blocks > 64: blocks would be empty")

    arr = _block_values(hash_col, n_blocks)
    if max_bucket is not None and cap_stats is not None:
        row = (
            df.select(F.posexplode(arr).alias("block", "block_val"))
            .groupBy("block", "block_val")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("capped_buckets"),
                F.coalesce(F.sum("_n"), F.lit(0)).alias("dropped_members"),
            )
            .first()
        )
        cap_stats.update(
            {"capped_buckets": row[0], "dropped_members": int(row[1])}
        )
        if cap_stats["capped_buckets"]:
            import warnings

            warnings.warn(
                f"Hamming block cap engaged: {cap_stats['capped_buckets']} "
                f"block-bucket(s) over max_bucket={max_bucket}, "
                f"{cap_stats['dropped_members']} memberships dropped",
                stacklevel=2,
            )

    blocks = df.select(
        id_col, hash_col, F.posexplode(arr).alias("block", "block_val")
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("block", "block_val")
        blocks = (
            blocks.withColumn("_n", F.count(F.lit(1)).over(w))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = blocks.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("_h_a"),
        "block", "block_val",
    )
    b = blocks.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("_h_b"),
        "block", "block_val",
    )
    return (
        a.join(b, ["block", "block_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("_h_a").bitwiseXOR(F.col("_h_b"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
