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
        # project to exactly (keys, bucket, signature) BEFORE anything
        # shuffles — the value columns only exist inside xxhash64
        return df.select(
            *key_cols,
            F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).alias("_bkt"),
            F.xxhash64(*cols).alias("_sig"),
        )

    fa, fb = fingered(a), fingered(b)

    # ONE union summary pass instead of two per-side aggregates + a
    # summary full join: per bucket, conditional aggregates produce both
    # sides' fingerprints in a single row. A bucket missing from a side
    # shows up as a 0-vs-n count mismatch — same dirty set as the old
    # null-safe full-join compare (a bucket with rows on neither side
    # simply doesn't exist).
    tagged = fa.select(
        "_bkt", "_sig", F.lit(0).alias("_side")
    ).unionByName(fb.select("_bkt", "_sig", F.lit(1).alias("_side")))
    sa_ = F.col("_side") == 0
    summ = tagged.groupBy("_bkt").agg(
        F.count(F.when(sa_, F.lit(1))).alias("_ca"),
        F.count(F.when(~sa_, F.lit(1))).alias("_cb"),
        F.bit_xor(F.when(sa_, F.col("_sig"))).alias("_xa"),
        F.bit_xor(F.when(~sa_, F.col("_sig"))).alias("_xb"),
        F.sum(
            F.when(sa_, F.col("_sig").bitwiseAND(F.lit(0x7FFFFFFF)))
        ).alias("_ma"),
        F.sum(
            F.when(~sa_, F.col("_sig").bitwiseAND(F.lit(0x7FFFFFFF)))
        ).alias("_mb"),
    )
    bad = summ.where(
        ~(
            F.col("_ca").eqNullSafe(F.col("_cb"))
            & F.col("_xa").eqNullSafe(F.col("_xb"))
            & F.col("_ma").eqNullSafe(F.col("_mb"))
        )
    ).select("_bkt")
    # the dirty-bucket list is tiny by the sizing contract but its
    # derivation aggregates both full tables — materialize ONCE (rule
    # 10/22: the subtree contains a shuffle, and it is referenced by
    # both rescans; without this every broadcast recomputes it)
    bad = bad.localCheckpoint()

    # row-level classification on the dirty sliver: one union + one
    # aggregate replaces two anti-joins + a full join (keys are unique
    # per side, so per-key conditional min/count recover each side's
    # signature exactly)
    rows = (
        fa.join(F.broadcast(bad), "_bkt")
        .select(*key_cols, "_sig", F.lit(0).alias("_side"))
        .unionByName(
            fb.join(F.broadcast(bad), "_bkt")
            .select(*key_cols, "_sig", F.lit(1).alias("_side"))
        )
    )
    per_key = rows.groupBy(*key_cols).agg(
        F.count(F.when(sa_, F.lit(1))).alias("_na"),
        F.count(F.when(~sa_, F.lit(1))).alias("_nb"),
        F.min(F.when(sa_, F.col("_sig"))).alias("_siga"),
        F.min(F.when(~sa_, F.col("_sig"))).alias("_sigb"),
    )
    return per_key.where(
        ~(
            (F.col("_na") > 0)
            & (F.col("_nb") > 0)
            & F.col("_siga").eqNullSafe(F.col("_sigb"))
        )
    ).select(
        *key_cols,
        F.when(F.col("_na") == 0, F.lit("b_only"))
        .when(F.col("_nb") == 0, F.lit("a_only"))
        .otherwise(F.lit("differs"))
        .alias("status"),
    )
