"""Funnel conversion — ordered multi-step sequence matching per key.

The product-analytics classic: given events tagged with funnel steps
(view → cart → buy), find per key the earliest time each step was
completed IN ORDER (step k counts only strictly after the completed
step k−1) and how deep the funnel was entered. Training-data uses:
multi-stage pipeline progress audits (crawled → parsed → dedup'd →
packed per shard), interaction-sequence mining.

Spark-first shape: one map-side-combinable conditional-min aggregate
per stage, each joined back on the key to gate the next stage's
condition — stages-many shuffles keyed by the SAME key column (AQE
coalesces; no windows, no per-key sorts, no row explosion). Strictly
sequential semantics (ts must EXCEED the previous stage's completion)
pin tie behavior exactly for the SQL replay.

Reference scope: no counterpart in morituri; §2.6 analytics-family
extension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    step_col: str = "step",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (key, t_1..t_N, stage): per key, ``t_k`` = earliest ``ts_col``
    of ``steps[k-1]`` strictly after ``t_{k-1}`` (t_1 is the plain
    minimum of step 1), NULL once the chain breaks; ``stage`` = number
    of completed steps. Keys with no step-1 event are absent.
    """
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    k = F.col(key_col)
    out = (
        events.where(F.col(step_col) == F.lit(steps[0]))
        .groupBy(k.alias("key"))
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(step_col) == F.lit(step))
            .select(k.alias("key"), F.col(ts_col).alias("_ts"))
            .join(out.select("key", F.col(f"t_{i - 1}").alias("_prev")), "key")
            .where(F.col("_prev").isNotNull() & (F.col("_ts") > F.col("_prev")))
            .groupBy("key")
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
        out = out.join(nxt, "key", "left")
    stage = None
    for i in range(1, len(steps) + 1):
        c = F.when(F.col(f"t_{i}").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        stage = c if stage is None else stage + c
    return out.select("key", *[f"t_{i}" for i in range(1, len(steps) + 1)],
                      stage.alias("stage"))
