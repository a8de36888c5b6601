"""Distributed table reconciliation — Merkle-style bucket diff.

The audit sibling of io/lineage.py: after a resume, a backfill, or a
replicated write, "are these two 10¹²-row tables identical — and if not,
WHICH rows differ?" A full-table join answers it by shuffling both
tables; this answers it by shuffling O(diff + buckets):

1. each side folds into per-bucket fingerprints with ONE map-side-
   combinable aggregate — count, bit_xor of the row signature, and a
   masked 31-bit signature SUM (bit_xor alone cancels on paired
   duplicates: {x,x} and {y,y} both xor to 0 — the sum breaks the tie,
   and staying 31-bit keeps ANSI addition safe to 2³² rows per bucket);
2. fingerprints join bucket-to-bucket (two tiny relations); equal
   buckets — at 10¹² rows, almost all of them — are PROVEN equal up to
   64+31-bit multiset collision and never touch the row stage;
3. only rows hashing into differing buckets re-scan (a pushdown bucket
   filter on each side), and the row-level anti-joins + key
   classification run on that sliver.

Same family as the engine's other candidates-then-exact shapes (LSH
banding, heavy-hitter summaries): a bounded sketch routes work, an exact
pass states the answer. The oracle is an INDEPENDENT full outer join
with IS DISTINCT FROM — a green row proves the bucket routing lost
nothing.

Keys must be unique per side (the lineage/primary-key contract);
signature equality is 95-bit-collision-exact, documented like the
content-hash dedup family.

Bucket sizing: every differing row dirties its bucket and dirty buckets
rescan, so ``n_buckets`` must comfortably exceed the EXPECTED diff count
(~30× keeps the rescan to a few %) while staying well under the row
count (or the summaries degenerate into the full join they replace).
The 4096 default fits the audit case — "probably identical, a handful
of diffs"; raise it toward rows/20 when large diffs are plausible. Like
every routing sketch in the engine (rule 20), it has a regime: below
~table-scale memory the plain full join WINS locally (measured 3.7s vs
9.1s at 2M rows) — the sketch buys its keep when the join's shuffle is
the bottleneck, i.e. at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def diff_tables(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    n_buckets: int = 4096,
) -> DataFrame:
    """→ (key_cols..., status): exactly the rows where the tables
    disagree — ``a_only`` (key missing from b), ``b_only`` (key missing
    from a), ``differs`` (key in both, any column differs). Both inputs
    must share a schema; column order follows ``a``."""
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"schemas differ: {sorted(a.columns)} vs {sorted(b.columns)}"
        )
    missing = [k for k in key_cols if k not in a.columns]
    if missing:
        raise ValueError(f"key columns {missing} not in table")
    cols = a.columns
    val_cols = [c for c in cols if c not in key_cols]

    def fingered(df: DataFrame) -> DataFrame:
        return df.select(
            *cols,
            F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).alias("_bkt"),
            F.xxhash64(*cols).alias("_sig"),
        )

    fa, fb = fingered(a), fingered(b)

    def summary(df: DataFrame) -> DataFrame:
        return df.groupBy("_bkt").agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.bit_xor("_sig").alias("_xor"),
            F.sum(F.col("_sig").bitwiseAND(F.lit(0x7FFFFFFF))).alias("_msum"),
        )

    sa = summary(fa).select(
        F.col("_bkt"), F.col("_cnt").alias("_ca"),
        F.col("_xor").alias("_xa"), F.col("_msum").alias("_ma"),
    )
    sb = summary(fb).select(
        F.col("_bkt"), F.col("_cnt").alias("_cb"),
        F.col("_xor").alias("_xb"), F.col("_msum").alias("_mb"),
    )
    bad = (
        sa.join(sb, "_bkt", "full")
        .where(
            ~(
                F.col("_ca").eqNullSafe(F.col("_cb"))
                & F.col("_xa").eqNullSafe(F.col("_xb"))
                & F.col("_ma").eqNullSafe(F.col("_mb"))
            )
        )
        .select("_bkt")
    )

    ra = fa.join(F.broadcast(bad), "_bkt")
    rb = fb.join(F.broadcast(bad), "_bkt")

    sig_keys = [*key_cols, "_sig"]
    only_a = ra.join(rb.select(*sig_keys), sig_keys, "left_anti").select(
        *key_cols, F.lit(1).alias("_ina")
    )
    only_b = rb.join(ra.select(*sig_keys), sig_keys, "left_anti").select(
        *key_cols, F.lit(1).alias("_inb")
    )
    return (
        only_a.join(only_b, key_cols, "full")
        .select(
            *key_cols,
            F.when(F.col("_ina").isNull(), F.lit("b_only"))
            .when(F.col("_inb").isNull(), F.lit("a_only"))
            .otherwise(F.lit("differs"))
            .alias("status"),
        )
    )
