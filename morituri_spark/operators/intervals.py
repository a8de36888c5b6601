"""Interval union — total covered span from overlapping intervals.

The classic gaps-and-islands operator: given per-key intervals
[start, end) on an integer axis (seconds, token offsets, byte ranges),
merge the overlapping/touching ones into maximal islands and report
per-key coverage. Sessionization (operators/sessions.py) cuts by GAP
between instants; this unions explicit EXTENTS — the tool for "how many
seconds of audio/video per user are covered by at least one annotated
clip", GPU-hour accounting from overlapping job spans, or deduplicating
annotated token spans before packing.

Spark-first shape: one window per key ordered by (start, end) — a
running max of the cumulative end marks island breaks (strictly-greater
start ⇒ new island; touching intervals merge), a running sum of break
flags numbers the islands, then one aggregate per (key, island). A
single shuffle keyed by the partition key; integer arithmetic
throughout, so the oracle replays it verbatim. Per rule 20 no salting:
per-key interval lists at any realistic shape sort in-memory; a
pathological mega-key would be handled by splitting on island breaks
found via a pre-pass, not by default.

Reference scope: no counterpart in morituri; general OLAP/set-op family
(SURVEY.md §2.6 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_islands(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """→ (key, island, island_start, island_end, n_intervals): maximal
    merged intervals per key. Intervals are half-open [start, end) on an
    integer axis; touching intervals (next.start == prev.end) MERGE.
    Rows with end <= start are rejected (raise-on-bad-data, the S5
    format_error convention).
    """
    k, s, e = F.col(key_col), F.col(start_col), F.col(end_col)
    checked = df.select(
        k.alias("key"),
        s.cast("long").alias("_s"),
        F.when(e.cast("long") > s.cast("long"), e.cast("long"))
        .otherwise(F.raise_error(F.format_string(
            "interval_islands: end <= start for key=%s", k.cast("string")
        )))
        .alias("_e"),
    )
    w = Window.partitionBy("key").orderBy("_s", "_e")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = checked.select(
        "key", "_s", "_e",
        F.max("_e").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("_prev_max_e"),
    ).select(
        "key", "_s", "_e",
        F.when(
            F.col("_prev_max_e").isNull() | (F.col("_s") > F.col("_prev_max_e")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_break"),
    )
    islands = staged.select(
        "key", "_s", "_e",
        F.sum("_break").over(wrun).alias("island"),
    )
    return islands.groupBy("key", "island").agg(
        F.min("_s").alias("island_start"),
        F.max("_e").alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """→ (key, covered, n_islands, n_intervals): total axis units covered
    by at least one interval, per key — Σ island lengths, all exact
    integers."""
    isl = interval_islands(df, key_col, start_col, end_col)
    return isl.groupBy("key").agg(
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_intervals").alias("n_intervals"),
    )
