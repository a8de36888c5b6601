"""Provably-exact distributed heavy hitters — Misra–Gries candidates,
exact second pass.

The classic two-round frequent-items pattern for 10^12-row columns where
a plain groupBy would shuffle every distinct key: pass A runs a
Misra–Gries summary per TASK in bounded memory (``capacity`` counters)
and emits only candidate items; pass B broadcast-semi-joins the tiny
candidate set back and counts exactly. The output is EXACT, not
approximate — the sketch only bounds where candidates can come from:

* pigeonhole: an item with global count ≥ (p/q)·n has local count
  ≥ (p/q)·n_t in at least one task t;
* Misra–Gries (merged batch-wise via the mergeable-summaries purge of
  Agarwal–Cormode–Huang–Phillips–Wei–Yi 2012: add counters, subtract the
  (capacity+1)-th largest, keep positive) undercounts any item by at
  most n_t/(capacity+1), so with capacity ≥ ⌈q/p⌉ every locally
  (p/q)-frequent item survives with a positive counter;

hence candidates ⊇ all qualifying items, and the exact pass removes
false positives. Shuffle volume: pass A emits ≤ capacity rows per task;
pass B shuffles only rows matching a broadcast set. The same shape LSH
banding gives minhash: a bounded-memory candidate generator whose recall
is a theorem, with exactness restored downstream.

Reference scope: no counterpart in morituri; LLM-pipeline family
(vocabulary pruning, stopword discovery, degenerate-token audits).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def frequent_items(
    df: DataFrame,
    col: str,
    min_num: int,
    min_den: int,
    capacity: int | None = None,
    item_type: str = "string",
) -> DataFrame:
    """→ (item, cnt): exactly the items whose count satisfies
    ``cnt · min_den ≥ min_num · n_total`` (an exact integer comparison —
    no float threshold), computed with bounded per-task memory.

    ``capacity`` defaults to max(⌈min_den/min_num⌉, 16), the smallest
    size for which the recall proof in the module docstring holds; raise
    it to shrink the candidate set (fewer exact-pass rows), never to fix
    correctness."""
    if min_num <= 0 or min_den <= 0:
        raise ValueError(f"min fraction must be positive, got {min_num}/{min_den}")
    if min_num > min_den:
        raise ValueError(f"min fraction {min_num}/{min_den} exceeds 1")
    cap = capacity if capacity is not None else max(math.ceil(min_den / min_num), 16)
    if cap + 1 <= min_den / min_num:
        raise ValueError(
            f"capacity {cap} too small for threshold {min_num}/{min_den}: "
            f"needs capacity + 1 > min_den/min_num for guaranteed recall"
        )

    items = df.select(F.col(col).alias("item"))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE summary folded across the whole task iterator (a per-batch
        # summary would cap the reduction at rows-per-batch, rule 26)
        d: dict = {}
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                d[item] = d.get(item, 0) + int(c)
            if len(d) > cap:
                thr = sorted(d.values(), reverse=True)[cap]
                d = {k: v - thr for k, v in d.items() if v > thr}
        yield pd.DataFrame({"item": pd.Series(list(d.keys()), dtype="object")})

    candidates = items.mapInPandas(mg, f"item {item_type}").distinct()
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(int(min_den)) >= F.lit(int(min_num)) * F.col("_n"))
        .select("item", "cnt")
    )
