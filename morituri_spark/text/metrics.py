"""Caption/translation quality metrics: BLEU clipped n-gram counts.

For an image+caption corpus, BLEU-style modified n-gram precision
against a reference caption is the standard quality gate (Papineni et
al. 2002). ``bleu_clip_counts`` produces the EXACT integer sufficient
statistics per (pair, n): the clipped match count
``Σ_gram min(count_cand(gram), count_ref(gram))`` and the candidate
gram total — BLEU-N itself is a deterministic float fold over these
(geometric mean + brevity penalty) the caller applies; keeping the
engine output integer gives the SQL oracle a zero-rounding replay.

Scale shape: tokens are staged as ONE projected array column (rule 9 —
the split never re-runs per n), n-grams come from two chained
sequence-explodes (codegen Generate operators; the per-position
concat_ws runs on ≤ a-few-hundred-token captions, small arrays off the
hot path per rule 8), and the clip is a (pair, n, gram) hash-aggregate
join — rule 21's shape: dedup/clip through the exchange, never in-row.
10¹² pairs partition freely on pair_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bleu_clip_counts"]


def bleu_clip_counts(
    pairs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    n_max: int = 4,
    pair_col: str = "pair_id",
) -> DataFrame:
    """→ (pair_id, n, clipped, total) for n in 1..n_max: ``total`` is the
    candidate's n-gram count (len − n + 1) and ``clipped`` the modified
    match count against the reference. Rows appear only for n ≤
    candidate token length; tokens are whitespace-split with empties
    dropped. Grams are space-joined token runs — exact string equality,
    no hashing, so collisions are impossible and the oracle replays
    byte-for-byte."""
    nm = int(n_max)
    if nm < 1:
        raise ValueError(f"n_max must be >= 1, got {nm}")

    def grams(col: str, side: str) -> DataFrame:
        toks = pairs.select(
            pair_col,
            F.expr(
                f"filter(split({col}, ' '), t -> t <> '')"
            ).alias("_toks"),
        )
        return (
            toks.select(
                pair_col,
                "_toks",
                F.explode(F.expr(f"sequence(1, {nm})")).alias("n"),
            )
            .where(F.expr("size(_toks) >= n"))
            .select(
                pair_col,
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(_toks) - n + 1),"
                        " k -> concat_ws(' ', slice(_toks, k, n)))"
                    )
                ).alias("gram"),
            )
            .groupBy(pair_col, "n", "gram")
            .agg(F.count(F.lit(1)).alias(f"_c_{side}"))
        )

    cg = grams(cand_col, "cand")
    rg = grams(ref_col, "ref")
    totals = cg.groupBy(pair_col, "n").agg(F.sum("_c_cand").alias("total"))
    clip = (
        cg.join(rg, [pair_col, "n", "gram"])
        .groupBy(pair_col, "n")
        .agg(F.sum(F.least("_c_cand", "_c_ref")).alias("clipped"))
    )
    return (
        totals.join(clip, [pair_col, "n"], "left")
        .select(
            pair_col,
            F.col("n").cast("long").alias("n"),
            F.coalesce("clipped", F.lit(0)).cast("long").alias("clipped"),
            F.col("total").cast("long").alias("total"),
        )
    )
