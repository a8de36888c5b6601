"""Greedy sequence packing — fill token-budget bins per stratum.

LLM training shards documents into fixed token-budget packs (sequences of
~4k tokens); the packer is inherently sequential per stream (a running
fill that RESETS at the budget), which no window expression can state —
the canonical case for an Arrow kernel (`applyInPandas` per stratum)
rather than per-row Python.

Semantics (deterministic, SQL-replayable by a linear recursive CTE):
rows ordered by ``order_col`` within each ``part_col`` group; the first
row always opens pack 0 (even when alone over budget); a later row whose
token count no longer fits starts the next pack with its own count as the
fill. Packs can exceed the budget only by a single oversized document.

Scale shape: one shuffle on the stratum key; each group's pack assignment
is a single pass over its Arrow batch. Strata are the parallelism unit —
for a corpus with few huge strata, pre-split them (e.g. on
``hash(doc_id) % k`` sub-strata) and the packs stay budget-valid because
packing never crosses group boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def pack_greedy(
    df: DataFrame,
    token_col: str,
    budget: int,
    part_col: str,
    order_col: str,
) -> DataFrame:
    """Adds ``pack_id`` (0-based per ``part_col`` group)."""
    import pandas as pd

    schema = StructType(df.schema.fields + [StructField("pack_id", LongType(), False)])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        fill = 0
        pid = 0
        out = []
        for t in pdf[token_col].astype("int64"):
            if fill > 0 and fill + t > budget:
                pid += 1
                fill = int(t)
            else:
                fill += int(t)
            out.append(pid)
        pdf["pack_id"] = pd.Series(out, dtype="int64")
        return pdf

    return df.groupBy(part_col).applyInPandas(fn, schema)
