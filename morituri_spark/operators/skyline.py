"""2D skyline (Pareto front) — dominance filtering without a global sort.

Multi-criteria selection over (cost, quality)-style pairs: keep exactly
the rows no other row dominates, where q dominates p iff q.x ≤ p.x and
q.y ≥ p.y with at least one strict (minimize x, maximize y — flip signs
upstream for other orientations). Ties: identical (x, y) rows do not
dominate each other, so duplicates of a skyline point all survive.

Training-data/geo uses: pick the quality-vs-cost frontier of dedup
candidates, the resolution-vs-error frontier of simplified geometries,
the best-quality-per-token-budget documents in a mixture.

Spark-first shape (the classic single-partition running-max window is a
scale-killer): bucket x by a fixed width, then
  1. ONE map-side-combinable aggregate to (bucket, x) groups with the
     group max y — dominance only ever needs the max y at each x;
  2. a per-bucket running max over the aggregated rows (window
     partitioned BY BUCKET — parallel across buckets, linear within);
  3. a bucket-level prefix max over the TINY per-bucket summary (one
     window over ≤ #buckets rows) broadcast-joined back.
A row survives iff its y equals its x-group max AND beats both the
in-bucket running max over strictly smaller x and the prefix max over
all earlier buckets (earlier bucket ⇒ strictly smaller x, so ≥ there
means dominated). Shuffle volume: one exchange keyed by (bucket, x)
group, one keyed by bucket for the window — both on aggregated rows,
never a global single-partition sort. Exact for integer inputs.

Reference scope: no counterpart in morituri; generic analytics-operator
extension (SURVEY §2.6 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_width: int = 1024,
) -> DataFrame:
    """→ the input rows (all columns) on the Pareto front of
    (minimize ``x_col``, maximize ``y_col``). ``bucket_width`` is the
    x range per pruning bucket — any positive value is correct; pick
    roughly (x spread / cores·4) so bucket windows parallelize.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    x, y = F.col(x_col), F.col(y_col)
    b = F.floor(x / F.lit(bucket_width)).alias("_b")
    pts = df.select("*", b, x.alias("_x"), y.alias("_y"))

    # per distinct x: the only dominance-relevant y is the max
    gm = pts.groupBy("_b", "_x").agg(F.max("_y").alias("_gm"))
    run = Window.partitionBy("_b").orderBy("_x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    gm = gm.select(
        "_b", "_x", "_gm", F.max("_gm").over(run).alias("_run")
    )
    # bucket summary: max y per bucket, prefix over earlier buckets
    bsum = gm.groupBy("_b").agg(F.max("_gm").alias("_bm"))
    pre = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bsum = bsum.select("_b", F.max("_bm").over(pre).alias("_pre"))
    gate = (
        gm.join(F.broadcast(bsum), "_b")
        .where(
            (F.col("_run").isNull() | (F.col("_gm") > F.col("_run")))
            & (F.col("_pre").isNull() | (F.col("_gm") > F.col("_pre")))
        )
        .select("_b", "_x", "_gm")
    )
    out = pts.join(
        gate,
        (pts["_b"] == gate["_b"])
        & (pts["_x"] == gate["_x"])
        & (pts["_y"] == gate["_gm"]),
        "left_semi",
    )
    return out.drop("_b", "_x", "_y")
