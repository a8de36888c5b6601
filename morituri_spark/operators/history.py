"""Type-2 slowly-changing-dimension history: collapse a change-event
log into validity intervals.

A training-data / warehouse pipeline versions dimension rows (document
metadata, source quality labels, zone attributes) by change events; the
SCD2 build turns the event log into ``[valid_from, valid_to)`` interval
rows — one per value RUN — so any as-of instant resolves to exactly one
row per key. This module builds those intervals; point-in-time lookup
is then operators/asof.py's job.

Semantics (per key, events ordered by ``ts_col``; ``(key, ts)`` unique
is the caller's contract):

- consecutive events whose tracked columns are ALL null-safe-equal
  merge into one run (a redelivered unchanged snapshot opens no new
  version);
- each run yields one row: tracked values, ``valid_from`` = first ts of
  the run, ``valid_to`` = first ts of the next run (NULL = open),
  ``version`` = 1-based run index, ``is_current`` = open interval.

Scale shape: two ordered windows over the SAME (key → ts) sort — the
run-edge filter and the lead() that closes intervals — so the only
exchange is the per-key hash partition; the second window re-sorts the
(much smaller) run-edge relation WITHOUT re-shuffling (hash
partitioning is preserved through the filter). No joins, no
driver-side state; key count is the parallelism axis.

Reference scope: no counterpart in morituri; warehouse-history
extension family (SURVEY.md §2), sibling of operators/asof.py
(point-in-time lookup) and io/lineage.py (batch-level versioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    val_cols: tuple = ("v",),
) -> DataFrame:
    """→ (key, *val_cols, valid_from, valid_to, version, is_current):
    one row per maximal run of unchanged tracked values.

    Null-safe change detection: a tracked column moving NULL → NULL is
    NOT a change; NULL → value and value → NULL are. The first event of
    every key always opens version 1.
    """
    vs = list(val_cols)
    if not vs:
        raise ValueError("val_cols must name at least one tracked column")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # run edge: first row per key, or any tracked column differing from
    # its predecessor (null-safe)
    changed = F.row_number().over(w) == 1
    for v in vs:
        changed = changed | ~F.col(v).eqNullSafe(F.lag(v).over(w))
    edges = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        *[F.col(v) for v in vs],
        changed.alias("_edge"),
    ).where("_edge")
    w2 = Window.partitionBy("key").orderBy("ts")
    out = edges.select(
        "key",
        *vs,
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )
    return out.select(
        "key",
        *vs,
        "valid_from",
        "valid_to",
        "version",
        F.col("valid_to").isNull().alias("is_current"),
    )


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str = "key",
    op_col: str = "op",
    seq_col: str = "seq",
    val_cols: tuple = ("v",),
) -> DataFrame:
    """MERGE-INTO semantics as one plan: apply a CDC change batch
    (``op`` ∈ {'U' upsert, 'D' delete}, ordered per key by ``seq_col``)
    to a snapshot → the post-merge table (key, *val_cols).

    Per key, only the LATEST change wins (max ``seq``; ``(key, seq)``
    unique is the caller's contract): latest 'U' replaces-or-inserts
    the row, latest 'D' removes it, keys without changes pass through.

    Scale shape: the latest-change reduction is ONE map-side-combinable
    ``max_by`` over a total (seq) order (rule 25 — no ranking window),
    then a single full-outer hash join on the key against the snapshot
    with the decision a plain CASE. No driver state; both sides stream.
    """
    vs = list(val_cols)
    if not vs:
        raise ValueError("val_cols must name at least one tracked column")
    latest = changes.groupBy(F.col(key_col).alias("_k")).agg(
        F.max_by(
            F.struct(
                F.col(op_col).alias("op"),
                *[F.col(v).alias(v) for v in vs],
            ),
            F.col(seq_col),
        ).alias("_c")
    )
    snap = snapshot.select(
        F.col(key_col).alias("key"), *[F.col(v) for v in vs]
    )
    joined = snap.join(latest, snap["key"] == latest["_k"], "full_outer")
    keep = F.col("_c").isNull() | (F.col("_c.op") == "U")
    return (
        joined.where(keep)
        .select(
            F.coalesce(F.col("key"), F.col("_k")).alias("key"),
            *[
                F.when(F.col("_c").isNotNull(), F.col(f"_c.{v}"))
                .otherwise(F.col(v))
                .alias(v)
                for v in vs
            ],
        )
    )
