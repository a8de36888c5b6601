"""As-of (nearest-event) join — a union + windowed gap-fill, one shuffle.

Spark has no native ASOF JOIN; the naive formulations are a range join
(O(n·m) candidate explosion) or a per-key collect. The scalable shape is:
tag both sides, union them, and run ONE window over (key, ts) where the
right side's values forward-fill via ``last(..., ignorenulls=True)`` —
each left row then carries the most recent right row with ``ts <=``
its own (backward as-of, inclusive ties, right-before-left tiebreak).

Cost at 100 TB: a single hash shuffle on the key + per-partition sort —
identical to any windowed aggregation; no row multiplication, no skew
beyond what the key distribution already has (salt upstream if one key
dominates). DuckDB's native ASOF JOIN provides the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at or before
    their timestamp (nulls where no prior right row exists). Right-side
    value columns keep their names; they must not collide with left's.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys and c != ts_col]
    rcols = [c for c in right.columns if c not in keys and c != ts_col]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    l_tag = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_l"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    r_tag = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c) for c in rcols],
    )
    u = l_tag.unionByName(r_tag)
    # right (_is_l=0) sorts before left at equal ts → ties are inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward-fill ONE struct of the whole right row, not each column
    # independently: per-column last(..., ignorenulls=True) would splice a
    # NULL value column from an OLDER right row into the matched row,
    # diverging from ASOF semantics (the matched row travels whole, nulls
    # included). The struct is non-null exactly on right rows, so one fill
    # carries every right column together.
    r_struct = F.when(
        F.col("_is_l") == 0, F.struct(*[F.col(c) for c in rcols])
    )
    filled = u.select(
        *keys,
        "_ts",
        "_is_l",
        *[F.col(c) for c in lcols],
        F.last(r_struct, ignorenulls=True).over(w).alias("_r"),
    )
    return (
        filled.where(F.col("_is_l") == 1)
        .select(
            *keys,
            F.col("_ts").alias(ts_col),
            *[F.col(c) for c in lcols],
            *[F.col(f"_r.{c}").alias(c) for c in rcols],
        )
    )
