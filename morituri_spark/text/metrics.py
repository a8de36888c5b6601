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
        # grams via lead() offsets over ONE per-pair token sort — the
        # transform(sequence, slice)+concat_ws HOF form this replaces
        # runs interpreted per element (rule 8) and measured 65.3s vs
        # 28-31s at 500k 20-token pairs; gram strings stay EXACT (no
        # hashing, collisions impossible, oracle replays byte-for-byte)
        from pyspark.sql import Window

        toks = pairs.select(
            pair_col,
            F.expr(
                f"filter(split({col}, ' '), t -> t <> '')"
            ).alias("_toks"),
        )
        pos = toks.select(
            pair_col, F.posexplode("_toks").alias("_p", "_t0")
        )
        w = Window.partitionBy(pair_col).orderBy("_p")
        lead_cols = [
            F.lead("_t0", k).over(w).alias(f"_t{k}") for k in range(1, nm)
        ]
        g = pos.select(pair_col, "_t0", *lead_cols)
        branches = ["array(struct(1 AS n, _t0 AS gram))"]
        for n in range(2, nm + 1):
            concat = (
                "concat(" + ", ' ', ".join(f"_t{k}" for k in range(n)) + ")"
            )
            branches.append(
                f"CASE WHEN _t{n - 1} IS NOT NULL THEN"
                f" array(struct({n} AS n, {concat} AS gram))"
                " ELSE CAST(array() AS array<struct<n:int,gram:string>>)"
                " END"
            )
        stacked = g.select(
            pair_col,
            F.expr("explode(concat(" + ", ".join(branches) + "))").alias(
                "_g"
            ),
        )
        return (
            stacked.select(
                pair_col,
                F.col("_g.n").alias("n"),
                F.col("_g.gram").alias("gram"),
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
