"""Rolling range-frame aggregates — sliding-window counts/sums per key.

The RANGE-frame member of the window family (window_topk ranks, lead/lag
diffs, session_window gaps — this one slides a VALUE-range frame): for
every event, aggregate the key's events inside the trailing range
(e.g. "requests in the previous hour", "tokens in the last 1M positions").
Rate limiting audits, burst detection, trailing-volume features.

Spark-first shape: ONE window with ``rangeBetween(-(range-1), 0)`` over
an integer order column — a single shuffle keyed by the partition key,
no self-join (the naive band self-join both shuffles twice and explodes
pairs). RANGE frames include ALL peer rows at equal order values, which
is exactly the SQL standard's semantics — engine-exact on integers.

Timestamps: rule 12 — NTZ can't cast to BIGINT; callers derive the
integer axis with the tz-free second diff
``timestampdiff(SECOND, date_trunc('SECOND', epoch), date_trunc('SECOND', ts))``
which matches DuckDB's ``date_diff('second', ...)`` boundary-exactly.

Reference scope: no counterpart in morituri; §2.6 window-family
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_counts(
    df: DataFrame,
    key_col: str,
    order_col: str,
    range_width: int,
    value_col: str | None = None,
) -> DataFrame:
    """→ input columns + ``rolling_n`` (and ``rolling_sum`` when
    ``value_col`` is given): per row, the count (and sum) of the key's
    rows with order value in ``[order - range_width + 1, order]`` — a
    trailing closed range on an integer axis, peers at equal order
    values always included (SQL RANGE semantics).
    """
    if range_width < 1:
        raise ValueError(f"range_width must be >= 1, got {range_width}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-(int(range_width) - 1), 0)
    )
    out = df.withColumn("rolling_n", F.count(F.lit(1)).over(w))
    if value_col is not None:
        out = out.withColumn("rolling_sum", F.sum(value_col).over(w))
    return out
