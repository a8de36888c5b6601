"""Bucketed table layout: pay the join shuffle once, at write time.

At 100 TB the expensive join is rarely run once — the same fact-to-fact
join recurs in every pipeline run (streets ⋈ zlevels, points ⋈ per-cell
stats, orders ⋈ customers). Hive-style bucketing hashes both sides into the
same number of buckets on the join key and sorts within each bucket at
WRITE time; every later join between co-bucketed tables plans as a
SortMergeJoin with **no Exchange on either side** — the 100 TB shuffle is
amortized across all downstream runs.

The reference has no analog (its converter holds whole datasets in RAM —
comm2osm.cpp drives one-shot conversions); this is the Spark-native answer
to the same repeated-join workload at cluster scale.

Notes for production:
  * the session's in-memory catalog scopes table METADATA to the session;
    at scale the catalog is a real metastore (or an Iceberg/Delta catalog)
    and the layout survives restarts. Data files themselves live at
    ``path`` either way.
  * ``repartition(n_buckets, key)`` before the write yields ONE file per
    bucket, so bucket-sorted reads need no re-sort; without it Spark still
    elides the Exchange but re-sorts multi-file buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` bucketed + sorted by ``key`` as managed/external table."""
    keys = [key] if isinstance(key, str) else list(key)
    out = df.repartition(n_buckets, *[F.col(k) for k in keys])
    writer = (
        out.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables; the plan carries no shuffle Exchange.

    A ``merge`` hint pins the sort-merge strategy so a small side is not
    silently broadcast — the point of the layout is the exchange-free
    big-big plan, and the hint makes the choice explicit and testable.
    """
    left = spark.table(left_table)
    right = spark.table(right_table).hint("merge")
    return left.join(right, on, how)


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan (test/bench
    evidence that a layout actually elided the shuffle)."""
    import contextlib
    import io

    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # each operator gets one numbered detail section: "(5) Exchange"
    return len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), flags=re.M))
