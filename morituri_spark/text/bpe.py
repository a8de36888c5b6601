"""Distributed BPE merge training — the byte-pair-encoding vocabulary
build step of an LLM data pipeline, as R declarative rounds of
count → argmax → merge over a token-sequence corpus.

Round semantics (the classic greedy trainer):

1. **pair counts** — explode adjacent token pairs and
   ``groupBy(pair).count()`` (map-side-combinable: the one data-sized
   exchange per round moves partial pair accumulators, not tokens);
2. **best pair** — max count, ties to the lexicographically smallest
   pair (deterministic, engine-stable). This is a global top-1:
   ``orderBy(desc, asc).limit(1)`` compiles to TakeOrderedAndProject —
   per-partition top-1 + a driver merge of n_tasks rows, never a full
   sort;
3. **merge** — every non-overlapping left-to-right occurrence of the
   pair fuses into one token. On the space-joined string form this is
   EXACTLY ``replace(' '||text||' ', ' u v ', ' uv ')`` — Spark and
   DuckDB ``replace`` share the left-to-right non-overlap contract, so
   an oracle can replay the merge verbatim (' a a a ' merges the FIRST
   pair only, matching greedy BPE).

The merged corpus feeds the next round through ``crossJoin(broadcast(
best))`` — fully declarative, no driver round-trip for the corpus.
Each round references the previous corpus twice (count + merge), so
lineage is localCheckpoint-truncated per round (working-note rule 14)
— without it the plan doubles per round.

Scale: tokens only ever move in the initial scan; every exchange after
partial aggregation is vocabulary-sized. R is small (the expensive
real-world regime is large corpora × tens of rounds, and each round is
one linear pass — the same shape GPT-2's original trainer takes, just
distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pair_counts(docs: DataFrame, text_col: str) -> DataFrame:
    toks = docs.select(F.split(F.col(text_col), " ").alias("_t"))
    # sequence(0, n) DESCENDS for n < 0 — a 1-token doc must not explode
    toks = toks.where(F.size("_t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(_t) - 2), "
                "j -> concat(_t[j], ' ', _t[j+1]))"
            )
        ).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """→ (round, pair, cnt, total_tokens_after), one row per merge
    round (1-based): the chosen pair (as "u v"), its pre-merge corpus
    count, and the corpus token total after applying the merge —
    together these pin the whole greedy trajectory.

    ``docs[text_col]`` holds space-joined token sequences (tokens must
    not contain spaces; any upstream tokenizer emitting the engine's
    token arrays concat_ws's into this form)."""
    spark = docs.sparkSession
    cur = docs.select(F.col(text_col).alias("text"))
    out_rows = None
    for r in range(1, rounds + 1):
        if checkpoint:
            cur = cur.localCheckpoint(eager=True)
        counts = _pair_counts(cur, "text")
        best = (
            counts.orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .select("pair", "cnt")
        )
        merged = cur.crossJoin(F.broadcast(best)).select(
            F.expr(
                "trim(replace(concat(' ', text, ' '), "
                "concat(' ', pair, ' '), "
                "concat(' ', replace(pair, ' ', ''), ' ')))"
            ).alias("text")
        )
        if checkpoint:
            merged = merged.localCheckpoint(eager=True)
        total = merged.agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("total_tokens_after")
        )
        row = best.crossJoin(total).select(
            F.lit(r).cast("long").alias("round"),
            "pair",
            "cnt",
            "total_tokens_after",
        )
        out_rows = row if out_rows is None else out_rows.unionByName(row)
        cur = merged
    return out_rows
